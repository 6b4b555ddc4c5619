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
