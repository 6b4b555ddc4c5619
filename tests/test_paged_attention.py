"""Paged-attention kernel vs dense masked attention, page writes, allocator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vita_tpu.ops.paged_attention import (
    PagePool,
    init_page_pool,
    install_prefill_pages,
    pages_needed,
    paged_attention,
    write_kv_rows,
)

L, HKV, HQ, D, PAGE, POOL = 2, 2, 4, 16, 8, 12


def _dense_ref(q, k, v, length, scale):
    # q [Hq, d]; k/v [S, Hkv, d] valid up to length
    group = q.shape[0] // k.shape[1]
    kk = np.repeat(k, group, axis=1)  # [S, Hq, d]
    vv = np.repeat(v, group, axis=1)
    s = np.einsum("hd,shd->hs", q, kk) * scale
    s[:, length:] = -np.inf
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hs,shd->hd", p, vv)


def _scatter_linear_kv(pool, tables, k_all, v_all, lengths):
    """Write [B, S, Hkv, d] rows into pages one row at a time."""
    kp, vp = pool["k_pages"], pool["v_pages"]
    b = k_all.shape[0]
    for layer in range(L):
        for t in range(k_all.shape[1]):
            active = jnp.asarray(lengths) > t
            kp, vp = write_kv_rows(
                kp, vp, jnp.int32(layer), tables,
                jnp.full((b,), t, jnp.int32),
                jnp.asarray(k_all[:, t] * (layer + 1)),
                jnp.asarray(v_all[:, t] * (layer + 1)),
                active=active,
            )
    return kp, vp


@pytest.mark.parametrize("lengths", [[5, 1], [8, 13], [17, 0]])
def test_paged_matches_dense(lengths):
    b = len(lengths)
    rng = np.random.default_rng(0)
    smax = max(max(lengths), 1)
    k_all = rng.normal(size=(b, smax, HKV, D)).astype(np.float32)
    v_all = rng.normal(size=(b, smax, HKV, D)).astype(np.float32)
    q = rng.normal(size=(b, HQ, D)).astype(np.float32)

    pool = init_page_pool(L, HKV, POOL, PAGE, D)
    alloc = PagePool(POOL)
    tables = np.zeros((b, 4), np.int32)
    for i, ln in enumerate(lengths):
        pages = alloc.alloc(pages_needed(max(ln, 1), PAGE))
        tables[i, : len(pages)] = pages
    tables = jnp.asarray(tables)

    with pltpu.force_tpu_interpret_mode():
        kp, vp = _scatter_linear_kv(pool, tables, k_all, v_all, lengths)
        for layer in range(L):
            out = paged_attention(
                jnp.asarray(q), kp, vp, tables,
                jnp.asarray(lengths, jnp.int32), jnp.int32(layer),
            )
            out = np.asarray(out)
            for i, ln in enumerate(lengths):
                if ln == 0:
                    np.testing.assert_array_equal(out[i], 0.0)
                    continue
                want = _dense_ref(
                    q[i], k_all[i, :ln] * (layer + 1), v_all[i, :ln] * (layer + 1),
                    ln, D**-0.5,
                )
                np.testing.assert_allclose(out[i], want, rtol=2e-4, atol=2e-4)


def test_install_prefill_pages_matches_row_writes():
    rng = np.random.default_rng(1)
    s = 2 * PAGE
    k_lin = rng.normal(size=(L, 1, s, HKV, D)).astype(np.float32)
    v_lin = rng.normal(size=(L, 1, s, HKV, D)).astype(np.float32)
    pool = init_page_pool(L, HKV, POOL, PAGE, D)
    page_ids = jnp.asarray([3, 7], jnp.int32)
    kp, vp = install_prefill_pages(
        pool["k_pages"], pool["v_pages"], jnp.asarray(k_lin), jnp.asarray(v_lin),
        page_ids,
    )
    kp = np.asarray(kp)
    for layer in range(L):
        for t in range(s):
            pid, row = int(page_ids[t // PAGE]), t % PAGE
            np.testing.assert_allclose(kp[layer, :, pid, row], k_lin[layer, 0, t])


def test_page_pool_allocator():
    p = PagePool(6)
    a = p.alloc(4)
    assert len(a) == 4 and p.free_count == 2
    assert p.alloc(3) is None  # insufficient => None, nothing consumed
    assert p.free_count == 2
    b = p.alloc(2)
    assert p.free_count == 0
    p.release(a)
    assert p.free_count == 4
    c = p.alloc(4)
    assert sorted(c) == sorted(a)
    assert pages_needed(1, 8) == 1 and pages_needed(8, 8) == 1 and pages_needed(9, 8) == 2


def test_paged_decode_chunk_matches_linear():
    """Greedy decode over the paged pool == decode over the linear cache."""
    from vita_tpu.models import mixtral, vita
    from vita_tpu.sampling import decode_chunk

    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    llm = params["llm"]
    lcfg = cfg.llm
    max_len, page = 32, 8
    prompt = jnp.asarray([[1, 7, 9, 11]], jnp.int32)
    s = prompt.shape[1]

    cache = mixtral.init_kv_cache(lcfg, 1, max_len)
    valid = jnp.arange(max_len)[None] < s
    logits, cache, _ = mixtral.forward(
        llm, lcfg, input_ids=prompt, attn_valid=valid, cache=cache
    )
    tok0 = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

    zeros_i, ones_f = jnp.zeros(1, jnp.int32), jnp.ones(1)
    args = (tok0, jnp.asarray([s], jnp.int32), jnp.ones(1, bool),
            jnp.zeros(1), zeros_i, ones_f, jax.random.PRNGKey(0))

    pool = init_page_pool(lcfg.n_layers, lcfg.n_kv_heads, 6, page, lcfg.head_dim)
    alloc = PagePool(6)
    pages = alloc.alloc(pages_needed(s + 7, page))
    tables = jnp.zeros((1, 4), jnp.int32).at[0, : len(pages)].set(jnp.asarray(pages))
    n_pp = pages_needed(s, page)
    k_src = jnp.copy(cache["k"][:, :, : n_pp * page])
    v_src = jnp.copy(cache["v"][:, :, : n_pp * page])

    lin_cache = {"k": cache["k"], "v": cache["v"], "pos": jnp.asarray([s], jnp.int32)}
    _, lin_toks, _, _ = decode_chunk(
        llm, lin_cache, *args, llm_cfg=lcfg, chunk_len=6
    )
    with pltpu.force_tpu_interpret_mode():
        kp, vp = install_prefill_pages(
            pool["k_pages"], pool["v_pages"], k_src, v_src,
            jnp.asarray(pages[:n_pp], jnp.int32),
        )
        pcache = {"k_pages": kp, "v_pages": vp, "table": tables,
                  "pos": jnp.asarray([s], jnp.int32)}
        _, paged_toks, _, _ = decode_chunk(
            llm, pcache, *args, llm_cfg=lcfg, chunk_len=6
        )
    np.testing.assert_array_equal(np.asarray(lin_toks), np.asarray(paged_toks))


# ----------------------------------------------------------------------
# int8 KV pages (VERDICT r4 item 8 — capacity lever, vLLM-class
# kv_cache_dtype): pages quantize per (row, head) with f32 scales,
# dequant folds into the attention scores/probabilities.
# ----------------------------------------------------------------------
def test_int8_pool_matches_fp_within_tolerance():
    rng = np.random.default_rng(0)
    b = 2
    pool_f = init_page_pool(L, HKV, POOL, PAGE, D, dtype=jnp.float32)
    pool_q = init_page_pool(L, HKV, POOL, PAGE, D, quantized=True)
    assert pool_q["k_pages"].dtype == jnp.int8
    assert pool_q["k_scale"].shape == (L, HKV, POOL, 1, PAGE)
    tables = jnp.asarray(
        rng.permutation(POOL)[: b * 4].reshape(b, 4).astype(np.int32)
    )
    kf, vf = pool_f["k_pages"], pool_f["v_pages"]
    kq, vq = pool_q["k_pages"], pool_q["v_pages"]
    ks, vs = pool_q["k_scale"], pool_q["v_scale"]
    n = 20
    for pos in range(n):
        k_new = jnp.asarray(rng.standard_normal((b, HKV, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((b, HKV, D)), jnp.float32)
        p = jnp.full((b,), pos, jnp.int32)
        kf, vf = write_kv_rows(kf, vf, jnp.int32(1), tables, p, k_new, v_new)
        kq, vq, ks, vs = write_kv_rows(
            kq, vq, jnp.int32(1), tables, p, k_new, v_new,
            k_scale=ks, v_scale=vs,
        )
    q = jnp.asarray(rng.standard_normal((b, HQ, D)), jnp.float32)
    lengths = jnp.full((b,), n, jnp.int32)
    of = paged_attention(q, kf, vf, tables, lengths, jnp.int32(1))
    oq = paged_attention(q, kq, vq, tables, lengths, jnp.int32(1),
                         k_scale=ks, v_scale=vs)
    cos = float(jnp.sum(of * oq) / (jnp.linalg.norm(of) * jnp.linalg.norm(oq)))
    assert cos > 0.999
    assert float(jnp.max(jnp.abs(of - oq))) < 0.05


def test_int8_install_prefill_matches_row_writes():
    """Prefill-install quantization must agree with the incremental
    write_kv_rows quantization (same per-row/per-head scale scheme)."""
    rng = np.random.default_rng(1)
    s = 2 * PAGE
    pool_a = init_page_pool(L, HKV, POOL, PAGE, D, quantized=True)
    pool_b = init_page_pool(L, HKV, POOL, PAGE, D, quantized=True)
    k_lin = jnp.asarray(rng.standard_normal((L, 1, s, HKV, D)), jnp.float32)
    v_lin = jnp.asarray(rng.standard_normal((L, 1, s, HKV, D)), jnp.float32)
    ids = jnp.asarray([3, 7], jnp.int32)
    ka, va, ksa, vsa = install_prefill_pages(
        pool_a["k_pages"], pool_a["v_pages"], k_lin, v_lin, ids,
        k_scale=pool_a["k_scale"], v_scale=pool_a["v_scale"],
    )
    kb, vb = pool_b["k_pages"], pool_b["v_pages"]
    ksb, vsb = pool_b["k_scale"], pool_b["v_scale"]
    table = jnp.asarray([[3, 7]], jnp.int32)
    for t in range(s):
        kb, vb, ksb, vsb = write_kv_rows(
            kb, vb, jnp.int32(0), table, jnp.asarray([t], jnp.int32),
            k_lin[0, :, t], v_lin[0, :, t], k_scale=ksb, v_scale=vsb,
        )
    np.testing.assert_array_equal(np.asarray(ka[0]), np.asarray(kb[0]))
    np.testing.assert_allclose(
        np.asarray(ksa[0]), np.asarray(ksb[0]), rtol=1e-6
    )


def test_int8_engine_end_to_end(tiny_vita):
    """Engine(kv_int8=True): runs all surfaces (prefill install, decode
    write+read, prefix-reuse extract), conserves pages, and matches the
    bf16 engine's greedy stream on a short horizon (quantization noise on
    the tiny model does not flip early greedy choices)."""
    from vita_tpu.serve.engine import Engine, Request

    cfg, params = tiny_vita
    prompt = np.arange(2, 18, dtype=np.int32)

    def toks(kv_int8):
        eng = Engine(params, cfg, n_slots=2, max_len=64, kv_int8=kv_int8,
                     decode_moe_mode="dense")
        req = Request(input_ids=prompt, max_new_tokens=12, eos_id=-1)
        eng.submit(req)
        eng.run_until_idle()
        assert eng.alloc.free_count == eng.total_pages
        return req.tokens

    a, b = toks(True), toks(False)
    assert sum(x == y for x, y in zip(a, b)) >= 10  # near-identical stream


def test_int8_engine_prefix_reuse(tiny_vita):
    """Session KV reuse extracts + dequantizes cached int8 pages: turn 2
    reuses rows and still decodes."""
    from vita_tpu.serve.engine import Engine, Request

    cfg, params = tiny_vita
    eng = Engine(params, cfg, n_slots=2, max_len=128, kv_int8=True,
                 page_size=8, prefill_chunk=16, prompt_buckets=(32, 64),
                 decode_moe_mode="dense")
    base = np.arange(2, 34, dtype=np.int32)
    r1 = Request(input_ids=base, max_new_tokens=4, eos_id=-1, session_key="s")
    eng.submit(r1)
    eng.run_until_idle()
    t2 = np.concatenate([base, np.asarray(r1.tokens, np.int32),
                         np.array([3, 4, 5], np.int32)])
    r2 = Request(input_ids=t2, max_new_tokens=4, eos_id=-1, session_key="s")
    eng.submit(r2)
    eng.run_until_idle()
    assert eng._reused_prefix_rows > 0
    assert len(r2.tokens) == 4


def test_int8_composes_with_pipeline_mesh(tiny_vita):
    """kv_int8 x PP: the S-wave ring carries the scale arrays alongside
    the pipe-sharded pool; tokens match the single-chip int8 engine."""
    import dataclasses as _dc

    from vita_tpu.models import vita as _vita
    from vita_tpu.parallel.mesh import make_mesh
    from vita_tpu.serve.engine import Engine, Request

    cfg, _ = tiny_vita
    cfg4 = _dc.replace(cfg, llm=_dc.replace(cfg.llm, n_layers=4))
    params4 = _vita.init_params(jax.random.PRNGKey(0), cfg4)
    mesh = make_mesh(shape=(1, 1, 1, 1, 2, 1), devices=jax.devices()[:2])
    prompt = np.arange(2, 18, dtype=np.int32)

    def toks(m):
        eng = Engine(params4, cfg4, n_slots=2, max_len=64, kv_int8=True,
                     decode_moe_mode="dense", mesh=m)
        req = Request(input_ids=prompt, max_new_tokens=10, eos_id=-1)
        eng.submit(req)
        eng.run_until_idle()
        return req.tokens

    assert toks(mesh) == toks(None)


@pytest.fixture(scope="module")
def tiny_vita():
    from vita_tpu.models import vita

    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params
