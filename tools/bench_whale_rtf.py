"""Audio-encode RTF on the real chip (BASELINE.md row 4: "report RTF").

Measures both encode paths at production Whale geometry (24L/1024, the
reference's audio_config — vita/model/multimodal_encoder/whale/init_model.py):

- batch:     whale.forward over a whole utterance, the reference serving
             behavior (encode starts only after VAD end-of-speech,
             web_demo/web_interactive_demo.py:864-865). RTF here bounds
             how much encode latency lands in TTFT.
- streaming: whale.streaming_step at the duplex frame-block cadence
             (serve.streaming_audio). Per-step wall time vs the 0.64 s of
             audio a 64-frame block covers = the live-session RTF; the
             flush step is the only encode left in TTFT.

Timing follows the axon rules (CLAUDE.md): chain N data-dependent calls,
end with ONE host readback, difference two N to cancel the tunnel RTT.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_whale_rtf.py
Prints one JSON line.
"""

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--utterance-s", type=float, default=10.0,
                   help="batch utterance length in seconds (100 frames/s)")
    p.add_argument("--frame-block", type=int, default=64)
    p.add_argument("--left-context", type=int, default=1024)
    p.add_argument("--n-small", type=int, default=8)
    p.add_argument("--n-large", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vita_tpu.models import whale
    from vita_tpu.parallel.distributed import enable_compile_cache

    enable_compile_cache()

    cfg = whale.WhaleConfig.vita(dtype=jnp.bfloat16)
    params = whale.init_params(jax.random.PRNGKey(0), cfg)
    n_frames = int(args.utterance_s * 100)

    import functools

    # ---- batch path: chain via a data dependence on the previous output
    # params ride as arguments — closing over them would inline ~0.4 GB
    # of weights as constants into the remote compile request (HTTP 413)
    @functools.partial(jax.jit, static_argnames=("n",))
    def batch_chain(p, speech, n):
        def body(s, _):
            feats, valid = whale.forward(p, cfg, s, jnp.array([n_frames]))
            # fold a scalar of the output back in: serializes the chain
            # without changing magnitude (executes N real encodes)
            return s + 0.0 * feats.mean(), None

        s, _ = jax.lax.scan(body, speech, None, length=n)
        return s.sum()

    speech = jax.random.normal(jax.random.PRNGKey(1), (1, n_frames, 80))

    def timed(fn, n):
        t0 = time.time()
        float(fn(n))  # host readback = the only real sync on axon
        return time.time() - t0

    run_batch = lambda n: batch_chain(params, speech, n)
    timed(run_batch, args.n_small)  # compile + warm
    timed(run_batch, args.n_large)
    t_small = timed(run_batch, args.n_small)
    t_large = timed(run_batch, args.n_large)
    per_utt = (t_large - t_small) / (args.n_large - args.n_small)
    rtf_batch = per_utt / args.utterance_s  # <1 means faster than realtime

    # ---- streaming path: the state carries the data dependence naturally
    state0 = whale.streaming_init(cfg, 1, args.frame_block, args.left_context)
    block = jax.random.normal(
        jax.random.PRNGKey(2), (1, args.frame_block, cfg.input_dim)
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def stream_chain(p, state, n):
        def body(s, _):
            feats, valid, s = whale.streaming_step(p, cfg, s, block)
            return s, feats.mean()

        s, means = jax.lax.scan(body, state, None, length=n)
        return means.sum()

    run_stream = lambda n: stream_chain(params, state0, n)
    timed(run_stream, args.n_small)
    timed(run_stream, args.n_large)
    t_small = timed(run_stream, args.n_small)
    t_large = timed(run_stream, args.n_large)
    per_step = (t_large - t_small) / (args.n_large - args.n_small)
    block_s = args.frame_block / 100.0
    rtf_stream = per_step / block_s

    # flush latency: ONE dispatched step + readback, what end-of-speech
    # actually waits for in the duplex loop (includes the tunnel RTT —
    # that is what the user experiences)
    @jax.jit
    def one_step(p, state):
        feats, valid, s = whale.streaming_step(p, cfg, state, block)
        return feats.mean()

    float(one_step(params, state0))  # compile
    t0 = time.time()
    float(one_step(params, state0))
    flush_ms = (time.time() - t0) * 1e3

    print(json.dumps({
        "metric": "whale_encode_rtf",
        "geometry": "24L-1024 bf16",
        "utterance_s": args.utterance_s,
        "rtf_batch": round(rtf_batch, 5),
        "batch_encode_ms_per_utt": round(per_utt * 1e3, 3),
        "rtf_streaming": round(rtf_stream, 5),
        "stream_ms_per_block": round(per_step * 1e3, 3),
        "frame_block": args.frame_block,
        "flush_ms_incl_rtt": round(flush_ms, 2),
    }))


if __name__ == "__main__":
    main()
