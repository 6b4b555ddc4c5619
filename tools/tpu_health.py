"""One-shot TPU tunnel health probe. Prints one JSON line.

The axon tunnel fails in degrees (seen 2026-08-17/18): device enumeration
can succeed while fresh compiles hang for minutes or the remote-compile
helper 500s on large programs. Run this BEFORE queueing expensive on-chip
benches; gate on `"ok": true` and sane `compile_s`.

Grades three layers:
  1. device     — jax.devices() enumerates a TPU
  2. compile    — a fresh (never-cached) tiny matmul compiles + runs;
                  odd prime dims defeat both the persistent cache and any
                  earlier in-process jit cache
  3. bandwidth  — a chained 0.5 GB matvec readback, sanity vs HBM specs

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_health.py
       [--deadline 300]
"""

import argparse
import json
import random
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deadline", type=float, default=300.0,
                   help="seconds after which the probe reports not-ok "
                        "(run under `timeout` for a hard bound)")
    args = p.parse_args()

    out = {"metric": "tpu_health", "ok": False}
    t_start = time.time()
    try:
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        out["device"] = str(devs[0])
        out["n_devices"] = len(devs)

        # layer 2: fresh compile. random odd dims -> unique program
        m = 2 * random.randrange(101, 499) + 1
        n = 2 * random.randrange(101, 499) + 1
        x = jnp.ones((m, n), jnp.bfloat16)
        t0 = time.time()
        y = float((x @ x.T).sum())  # readback = the only real sync on axon
        out["compile_s"] = round(time.time() - t0, 1)
        out["compile_result_ok"] = abs(y - m * m * n) / (m * m * n) < 1e-2

        # layer 3: bandwidth sanity on a 0.5 GB stream (already-compiled
        # dot shape after the first call; difference 2 vs 6 chained calls
        # to drop the tunnel RTT)
        w = jnp.ones((16384, 16384), jnp.bfloat16)  # 0.54 GB
        v = jnp.ones((1, 16384), jnp.bfloat16)

        def chain(k):
            t0 = time.time()
            r = v
            for _ in range(k):
                r = r @ w
            _ = float(r[0, 0])
            return time.time() - t0

        chain(1)  # compile + warm
        # min over repeats: single 50-100 ms tunnel jitter spikes otherwise
        # make chain(2) > chain(6) and the difference negative (observed
        # 2026-08-18: stream_gbps -656 on a chip whose compiles were fine)
        per = (min(chain(6) for _ in range(3))
               - min(chain(2) for _ in range(3))) / 4
        out["stream_gbps"] = round(w.size * 2 / max(per, 1e-9) / 1e9, 1)
        out["elapsed_s"] = round(time.time() - t_start, 1)
        out["ok"] = bool(
            out["compile_result_ok"]
            and out["elapsed_s"] < args.deadline
            and out["stream_gbps"] > 10.0  # tunnel alive, any real HBM rate
        )
    except Exception as e:  # noqa: BLE001 — a sick tunnel throws anything
        out["error"] = str(e)[:200]
        out["elapsed_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
