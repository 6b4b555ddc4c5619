"""Validate the 2L->32L decode extrapolation at 4x the measured depth.

Every `*_32L_extrapolated` number in BENCH_r*.json scales a 2-layer
measurement by active-HBM-bytes (layer-proportional + one head read).
Nothing pinned that model until now (VERDICT r3 weak item 2). The int4
expert path at FULL width fits 8 layers in one v5e chip's HBM
(~0.7 GB/layer experts + bf16 attention + embed/head), so we can measure
2L and 8L directly and check the byte-model's 8L *prediction* against the
8L *measurement* — if they agree, the same model applied to 32L is
defensible.

Prints one JSON line; --save writes bench_results/extrap_check.json which
bench.py merges as recorded_extrap_* extras.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_extrap_check.py --save
"""

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral
from vita_tpu.parallel.distributed import enable_compile_cache

enable_compile_cache()

CHUNK = 8
N_SMALL, N_LARGE = 2, 8  # chunks
CACHE_LEN = 512
PREFILL = 128


def active_bytes_per_step(params, cfg) -> float:
    """HBM bytes one decode step must stream: all non-expert weights minus
    the embed table (one row gathered) + top_k/n_experts of the expert
    arrays (incl. int4 payload + scales) — bench.py's accounting."""
    moe = params["layers"]["moe"]
    expert = sum(
        v.size * v.dtype.itemsize
        for k, v in moe.items() if k != "router"
    )
    total = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    embed = params["embed"].size * params["embed"].dtype.itemsize
    return total - expert - embed + expert * cfg.top_k / cfg.n_experts


def measure_per_step(params, cfg) -> float:
    from vita_tpu.sampling import decode_chunk

    max_len = CACHE_LEN
    tok = jnp.ones((1,), jnp.int32)
    args = (jnp.ones(1, bool), jnp.zeros(1), jnp.zeros(1, jnp.int32),
            jnp.ones(1))

    def run(n):
        # fresh cache per run: decode_chunk DONATES the kv arrays, so a
        # shared cache would be dead after the first call
        cache0 = mixtral.init_kv_cache(
            dataclasses.replace(cfg, moe_mode="dense"), batch=1,
            max_len=max_len,
        )
        cache = {"k": cache0["k"], "v": cache0["v"], "pos": None}
        t, p = tok, jnp.asarray([PREFILL], jnp.int32)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for _ in range(n):
            c = {"k": cache["k"], "v": cache["v"], "pos": p}
            c, toks, t, key = decode_chunk(
                params, c, t, p, *args, key, llm_cfg=cfg, chunk_len=CHUNK,
                sampling_mode="greedy",
            )
            cache = c
            p = p + CHUNK
        _ = int(np.asarray(toks)[0, 0])
        return time.time() - t0

    run(1)  # compile + warm
    run(N_SMALL)
    a = min(run(N_SMALL) for _ in range(3))
    b = min(run(N_LARGE) for _ in range(3))
    return (b - a) / ((N_LARGE - N_SMALL) * CHUNK)


def build(n_layers, dtype="int4"):
    cfg = mixtral.MixtralConfig(
        n_layers=n_layers, moe_mode="dense", dtype=jnp.bfloat16
    )
    if dtype == "bf16":
        # bf16 full width: resident experts are 2.8 GB/layer, so 4 layers
        # (~11.5 GB total) is the deepest that fits one v5e chip — the
        # VERDICT-suggested 8L bf16 run cannot fit RESIDENT HBM (22.5 GB
        # of experts), only its *active* bytes are 6.3 GB
        shapes = jax.eval_shape(
            lambda key: mixtral.init_params(key, cfg), jax.random.PRNGKey(0)
        )
        mk = jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        ))
        return dataclasses.replace(cfg, moe_mode="gather"), mk()
    # materialize the QUANTIZED tree directly: initializing the bf16 8L
    # model first (22 GB of experts) would OOM the 16 GB chip before
    # quantization, and HBM-streaming time is value-independent — shapes
    # and dtypes are what we are timing
    shapes = jax.eval_shape(
        lambda key: mixtral.quantize_moe_for_decode(
            mixtral.init_params(key, cfg), bits=4
        ),
        jax.random.PRNGKey(0),
    )
    mk = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    ))
    return dataclasses.replace(cfg, moe_mode="gather_q4"), mk()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--deep-layers", type=int, default=0,
                    help="default: 8 for int4, 4 for bf16 (resident-HBM fit)")
    ap.add_argument("--dtype", default="int4", choices=["int4", "bf16"])
    flags = ap.parse_args()
    if not flags.deep_layers:
        flags.deep_layers = 8 if flags.dtype == "int4" else 4

    out = {"metric": "decode_extrapolation_check",
           "moe_mode": "gather_q4" if flags.dtype == "int4" else "gather",
           "backend": jax.default_backend()}

    cfg2, p2 = build(2, flags.dtype)
    per2 = measure_per_step(p2, cfg2)
    bytes2 = active_bytes_per_step(p2, cfg2)
    head = 51760 * 4096 * 2
    layer_bytes = (bytes2 - head) / 2
    out["step_ms_2L"] = round(per2 * 1e3, 3)
    del p2

    deep = flags.deep_layers
    cfgd, pd = build(deep, flags.dtype)
    perd = measure_per_step(pd, cfgd)
    bytesd = active_bytes_per_step(pd, cfgd)
    out[f"step_ms_{deep}L_measured"] = round(perd * 1e3, 3)

    # the SAME byte-model bench.py uses for its 32L numbers
    pred = per2 * (layer_bytes * deep + head) / bytes2
    out[f"step_ms_{deep}L_predicted_from_2L"] = round(pred * 1e3, 3)
    out["prediction_error_frac"] = round(perd / pred - 1.0, 4)
    out["within_10pct"] = bool(abs(perd / pred - 1.0) <= 0.10)
    out[f"tokens_per_s_{deep}L_measured"] = round(1.0 / perd, 2)
    out["active_gb_2L"] = round(bytes2 / 1e9, 3)
    out[f"active_gb_{deep}L"] = round(bytesd / 1e9, 3)
    # the headline implication: the corrected(measured) 32L projection
    pred32 = per2 * (layer_bytes * 32 + head) / bytes2
    out[f"tokens_per_s_32L_{flags.dtype}_extrapolated"] = round(1.0 / pred32, 2)

    print(json.dumps(out))
    if flags.save:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_results",
            "extrap_check.json" if flags.dtype == "int4"
            else "extrap_check_bf16.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
