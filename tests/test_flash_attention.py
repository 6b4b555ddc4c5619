"""Flash attention vs the XLA reference implementation (fwd + grads).

Runs in Pallas interpret mode on CPU (tests) — the same kernel compiles
natively on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vita_tpu.ops.attention import causal_mask_bias, mha_xla, padding_mask_bias
from vita_tpu.ops.flash_attention import flash_mha


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _ref(q, k, v, kv_len=None, causal=False, q_offset=0):
    bias = 0.0
    if causal:
        bias = causal_mask_bias(q.shape[1], k.shape[1], q_offset)
    if kv_len is not None:
        valid = jnp.arange(k.shape[1])[None, :] < kv_len[:, None]
        bias = bias + padding_mask_bias(valid)
    return mha_xla(q, k, v, bias=None if isinstance(bias, float) else bias)


def _flash(*args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return flash_mha(*args, **kw)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    b, s, h, d = 2, 256, 4, 64
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    out = _flash(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = _ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_gqa():
    b, s, hq, hkv, d = 1, 128, 8, 2, 32
    q = _rand((b, s, hq, d), 0)
    k = _rand((b, s, hkv, d), 1)
    v = _rand((b, s, hkv, d), 2)
    out = _flash(q, k, v, causal=True, block_q=64, block_k=64)
    ref = _ref(q, jnp.repeat(k, 4, 2), jnp.repeat(v, 4, 2), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_padding():
    b, s, h, d = 2, 192, 2, 32
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    kv_len = jnp.array([192, 70])
    out = _flash(q, k, v, kv_len=kv_len, causal=True, block_q=64, block_k=64)
    ref = _ref(q, k, v, kv_len=kv_len, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_uneven_blocks():
    """Sequence not divisible by block size (tail masking via kv_len)."""
    b, s, h, d = 1, 160, 2, 32
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8)
    out = _flash(q, k, v, kv_len=jnp.array([s]), causal=False, block_q=64, block_k=64)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_decode_offset():
    """Single-query decode against a longer KV with q_offset."""
    b, h, d, skv = 1, 4, 32, 128
    q = _rand((b, 1, h, d), 9)
    k, v = _rand((b, skv, h, d), 10), _rand((b, skv, h, d), 11)
    pos = 57
    out = _flash(q, k, v, kv_len=jnp.array([pos + 1]), q_offset=pos,
                 causal=True, block_q=8, block_k=64)
    ref = _ref(q, k, v, kv_len=jnp.array([pos + 1]), causal=True, q_offset=pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients(causal):
    b, s, h, d = 1, 128, 2, 32
    q, k, v = _rand((b, s, h, d), 12), _rand((b, s, h, d), 13), _rand((b, s, h, d), 14)
    kv_len = jnp.array([100])

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, kv_len=kv_len, causal=causal, block_q=64, block_k=64)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = _ref(q, k, v, kv_len=kv_len, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_flash_gqa_gradients():
    b, s, hq, hkv, d = 1, 64, 4, 2, 32
    q = _rand((b, s, hq, d), 15)
    k, v = _rand((b, s, hkv, d), 16), _rand((b, s, hkv, d), 17)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, causal=True, block_q=32, block_k=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, jnp.repeat(k, 2, 2), jnp.repeat(v, 2, 2), causal=True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_mixtral_flash_backend_matches_xla():
    """Full model forward with attn_backend='flash' equals the XLA path."""
    import dataclasses

    from vita_tpu.models import mixtral as mx

    cfg = mx.MixtralConfig.tiny()
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 5, 9, 2, 7, 3, 4, 8]], jnp.int32)
    valid = jnp.array([[True] * 6 + [False] * 2])
    ref, _, _ = mx.forward(params, cfg, input_ids=ids, attn_valid=valid)

    cfg_f = dataclasses.replace(cfg, attn_backend="flash")
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = mx.forward(params, cfg_f, input_ids=ids, attn_valid=valid)
    np.testing.assert_allclose(
        np.asarray(out[:, :6]), np.asarray(ref[:, :6]), rtol=2e-3, atol=2e-3
    )


def test_mixtral_flash_backend_decode():
    """Flash path prefill+decode with cache matches XLA full forward."""
    import dataclasses

    from vita_tpu.models import mixtral as mx

    cfg = mx.MixtralConfig.tiny()
    cfg_f = dataclasses.replace(cfg, attn_backend="flash")
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 5, 9, 2, 7]], jnp.int32)
    full, _, _ = mx.forward(params, cfg, input_ids=ids)

    with pltpu.force_tpu_interpret_mode():
        cache = mx.init_kv_cache(cfg_f, batch=1, max_len=8)
        lp, cache, _ = mx.forward(params, cfg_f, input_ids=ids[:, :4], cache=cache)
        lt, cache, _ = mx.forward(params, cfg_f, input_ids=ids[:, 4:5], cache=cache)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[:, :4]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lt[:, 0]), np.asarray(full[:, 4]), rtol=2e-3, atol=2e-3)


def test_flash_with_lse_matches_xla():
    """(out, lse) variant: out equals flash_mha, lse equals the XLA
    logsumexp of the scaled+masked logits; grads flow through BOTH
    outputs (the dlse cotangent folds into the bwd delta term) — the
    building block of ring attention's cross-shard merge."""
    from vita_tpu.ops.flash_attention import flash_mha_with_lse

    b, s, h, d = 2, 128, 4, 32
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    kv_len = jnp.array([s, s - 37])
    scale = d**-0.5

    def ref_out_lse(q, k, v):
        logits = jnp.einsum("bshd,bthd->bhst", q, k) * scale
        k_pos = jnp.arange(s)[None, None, None, :]
        mask = (k_pos < kv_len[:, None, None, None]) & (
            k_pos <= jnp.arange(s)[None, None, :, None]
        )
        logits = jnp.where(mask, logits, -1e30)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        p = jnp.exp(logits - lse[..., None])
        return jnp.einsum("bhst,bthd->bshd", p, v), lse

    with pltpu.force_tpu_interpret_mode():
        out, lse = flash_mha_with_lse(q, k, v, kv_len=kv_len, causal=True)
    out_r, lse_r = ref_out_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r),
                               rtol=2e-5, atol=2e-5)

    # loss using BOTH outputs — exercises the dlse path
    def loss_flash(q, k, v):
        o, l = flash_mha_with_lse(q, k, v, kv_len=kv_len, causal=True)
        return jnp.sum(o**2) + jnp.sum(jnp.sin(l))

    def loss_ref(q, k, v):
        o, l = ref_out_lse(q, k, v)
        return jnp.sum(o**2) + jnp.sum(jnp.sin(l))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)
