"""Train the streaming-VAD MLP on synthetic speech/noise and write the
checked-in weights (vita_tpu/serve/vad_weights.npz).

Pure numpy (Adam + BCE); runs in seconds on CPU. Regenerate with:
    python tools/train_vad.py [--n 8000] [--epochs 400]
"""

import argparse

import numpy as np

from vita_tpu.serve.vad_model import (
    FEATURE_DIM,
    WEIGHTS_PATH,
    synth_noise,
    synth_speech,
    vad_features,
)

HIDDEN = 24


def make_dataset(rng, n):
    xs, ys = [], []
    for i in range(n):
        if i % 2 == 0:
            xs.append(vad_features(synth_speech(rng)))
            ys.append(1.0)
        else:
            xs.append(vad_features(synth_noise(rng)))
            ys.append(0.0)
    return np.stack(xs), np.asarray(ys, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8000)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=WEIGHTS_PATH)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    x, y = make_dataset(rng, args.n)
    xv, yv = make_dataset(rng, 1000)
    mu, sigma = x.mean(0), x.std(0) + 1e-6
    xn, xvn = (x - mu) / sigma, (xv - mu) / sigma

    w1 = rng.standard_normal((FEATURE_DIM, HIDDEN)).astype(np.float32) * 0.2
    b1 = np.zeros(HIDDEN, np.float32)
    w2 = rng.standard_normal(HIDDEN).astype(np.float32) * 0.2
    b2 = np.float32(0.0)
    params = [w1, b1, w2, b2]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    lr, beta1, beta2, eps = 3e-3, 0.9, 0.999, 1e-8

    def forward(xb):
        h = np.tanh(xb @ params[0] + params[1])
        z = h @ params[2] + params[3]
        return h, 1.0 / (1.0 + np.exp(-z))

    t = 0
    for epoch in range(args.epochs):
        order = rng.permutation(len(xn))
        for i in range(0, len(xn), 256):
            idx = order[i : i + 256]
            xb, yb = xn[idx], y[idx]
            h, p_ = forward(xb)
            dz = (p_ - yb) / len(xb)
            grads = [
                xb.T @ ((dz[:, None] * params[2][None, :]) * (1 - h**2)),
                np.sum((dz[:, None] * params[2][None, :]) * (1 - h**2), 0),
                h.T @ dz,
                np.float32(np.sum(dz)),
            ]
            t += 1
            for j, g in enumerate(grads):
                m[j] = beta1 * m[j] + (1 - beta1) * g
                v[j] = beta2 * v[j] + (1 - beta2) * g**2
                mh = m[j] / (1 - beta1**t)
                vh = v[j] / (1 - beta2**t)
                params[j] = params[j] - lr * mh / (np.sqrt(vh) + eps)
        if (epoch + 1) % 100 == 0:
            _, pv = forward(xvn)
            acc = np.mean((pv > 0.5) == (yv > 0.5))
            print(f"epoch {epoch+1}: val acc {acc:.4f}")

    _, pv = forward(xvn)
    acc = float(np.mean((pv > 0.5) == (yv > 0.5)))
    np.savez(
        args.out, mu=mu, sigma=sigma,
        w1=params[0], b1=params[1], w2=params[2], b2=params[3],
        val_acc=np.float32(acc), seed=np.int32(args.seed),
    )
    print(f"wrote {args.out} (val acc {acc:.4f})")


if __name__ == "__main__":
    main()
