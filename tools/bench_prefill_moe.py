"""On-chip microbench: prefill MoE dispatch mode at serving chunk sizes.

Times one full-width Mixtral layer stack (2 layers, production geometry:
4096d, ffn 14336, 8 experts top-2) prefilling T tokens with
moe_mode in {dense, gmm, sort}. Dense computes all E experts (E/k = 4x
the needed FLOPs); gmm runs only the routed pairs as grouped MXU tiles;
sort scatters into capacity bins. The winner becomes the Engine/Generator
prefill default (TTFT lever: BASELINE p50 TTFT < 500 ms).

Timing per CLAUDE.md: chain N calls, end with one readback, difference
two N values to subtract the axon tunnel RTT.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from vita_tpu.models import mixtral
from vita_tpu.parallel.distributed import enable_compile_cache

N_LAYERS = 2
N_SMALL, N_LARGE = 16, 64


def time_mode(params, cfg, x, cache_len):
    @jax.jit
    def prefill(params, ids, tok):
        # feed the previous call's token into the ids so chained calls
        # carry a data dependency (CLAUDE.md: only the final readback
        # synchronizes on axon; unchained dispatches would not be timed)
        ids = ids.at[0, 0].set(jnp.maximum(tok[0], 1))
        cache = mixtral.init_kv_cache(cfg, 1, cache_len)
        logits, cache, _ = mixtral.forward(
            params, cfg, input_ids=ids, cache=cache
        )
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    tok = prefill(params, x, jnp.ones((1,), jnp.int32))
    _ = int(tok[0])  # compile + warm

    def run(n):
        t = tok
        t0 = time.time()
        for _ in range(n):
            t = prefill(params, x, t)
        _ = int(t[0])
        return time.time() - t0

    run(N_SMALL)
    t_small = run(N_SMALL)
    t_large = run(N_LARGE)
    return (t_large - t_small) / (N_LARGE - N_SMALL)


def main():
    import argparse
    import json
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true",
                    help="write bench_results/prefill_moe.json (merged "
                         "into bench.py extras as recorded_prefillmoe_*)")
    args = ap.parse_args()

    enable_compile_cache()
    base = mixtral.MixtralConfig(
        n_layers=N_LAYERS, moe_mode="dense", dtype=jnp.bfloat16
    )
    params = mixtral.init_params(jax.random.PRNGKey(0), base)

    out = {"metric": "prefill_moe_mode", "layers": N_LAYERS}
    for t_len in (256, 512, 1024):
        ids = jnp.ones((1, t_len), jnp.int32)
        row = {}
        for mode in ("dense", "gmm", "sort"):
            cfg = dataclasses.replace(base, moe_mode=mode)
            try:
                dt = time_mode(params, cfg, ids, t_len)
                row[mode] = dt * 1000
                out[f"{mode}_ms_t{t_len}"] = round(dt * 1000, 2)
            except Exception as e:  # noqa: BLE001 - report and continue
                row[mode] = f"FAIL {type(e).__name__}: {e}"[:120]
        print(f"T={t_len}: " + "  ".join(
            f"{m}={v:.2f}ms" if isinstance(v, float) else f"{m}={v}"
            for m, v in row.items()), flush=True)

    measured = any(k.endswith("_ms_t1024") for k in out)
    if args.save and measured:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_results",
            "prefill_moe.json")
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
