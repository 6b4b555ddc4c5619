"""Isolate decode-chunk cost components on the real chip.

Times (chained, single readback): linear-cache chunk vs paged-cache chunk
vs paged with dense-MoE, batch 1, 2 full-width layers. Prints one JSON line
per variant."""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral
from vita_tpu.ops.paged_attention import PagePool, init_page_pool, pages_needed
from vita_tpu.parallel.distributed import enable_compile_cache
from vita_tpu.sampling import decode_chunk

enable_compile_cache()

CHUNK = 8
N_SMALL, N_LARGE = 2, 8  # chunks


def time_chunks(fn, make_cache, tok, pos):
    def run(n):
        cache, t, p = make_cache(), tok, pos
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        for _ in range(n):
            cache, toks, t, key = fn(cache, t, p, key)
            p = p + CHUNK
        _ = int(np.asarray(toks)[0, 0])
        return time.time() - t0

    run(1)  # compile+warm
    run(N_SMALL)
    a = run(N_SMALL)
    b = run(N_LARGE)
    return (b - a) / ((N_LARGE - N_SMALL) * CHUNK)


def main():
    cfg = mixtral.MixtralConfig(n_layers=2, moe_mode="dense", dtype=jnp.bfloat16)
    gather = dataclasses.replace(cfg, moe_mode="gather")
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    max_len, page = 1024, 64
    s = 128
    tok = jnp.ones((1,), jnp.int32)
    pos = jnp.asarray([s], jnp.int32)
    active = jnp.ones((1,), bool)
    zf, zi, of = jnp.zeros(1), jnp.zeros(1, jnp.int32), jnp.ones(1)

    results = {}

    def linear_fn(decode_cfg):
        def fn(cache, t, p, key):
            return decode_chunk(
                params, cache, t, p, active, zf, zi, of, key,
                llm_cfg=decode_cfg, chunk_len=CHUNK, sampling_mode="greedy",
            )
        return fn

    def make_linear():
        c = mixtral.init_kv_cache(cfg, 1, max_len)
        return {"k": c["k"], "v": c["v"], "pos": jnp.array(pos)}

    results["linear_gather_ms"] = time_chunks(
        linear_fn(gather), make_linear, tok, pos
    ) * 1e3

    table = jnp.arange(16, dtype=jnp.int32)[None, :]

    def make_paged():
        pool = init_page_pool(2, cfg.n_kv_heads, 16, page, cfg.head_dim, jnp.bfloat16)
        return {"k_pages": pool["k_pages"], "v_pages": pool["v_pages"],
                "table": jnp.array(table), "pos": jnp.array(pos)}

    for name, dcfg in (("paged_gather", gather), ("paged_dense", cfg)):
        results[name + "_ms"] = time_chunks(linear_fn(dcfg), make_paged, tok, pos) * 1e3

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
