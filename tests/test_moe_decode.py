"""MoE decode-gather kernel vs the dense-exact path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vita_tpu.models import mixtral as mx
from vita_tpu.ops.moe import init_moe_params, moe_ffn


@pytest.mark.parametrize("t", [1, 4])
def test_gather_matches_dense(t):
    params = init_moe_params(jax.random.PRNGKey(0), n_experts=4, d_model=64, d_ff=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, 64))
    dense, aux_d = moe_ffn(params, x, top_k=2, mode="dense")
    with pltpu.force_tpu_interpret_mode():
        gather, aux_g = moe_ffn(params, x, top_k=2, mode="gather", )
    np.testing.assert_allclose(np.asarray(gather), np.asarray(dense), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(aux_d), float(aux_g), rtol=1e-6)


def test_gather_blocked_ffn_dim():
    """d_ff not divisible by default block: uses min(block, f)."""
    params = init_moe_params(jax.random.PRNGKey(2), n_experts=3, d_model=32, d_ff=96)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32))
    dense, _ = moe_ffn(params, x, top_k=2, mode="dense")
    with pltpu.force_tpu_interpret_mode():
        gather, _ = moe_ffn(params, x, top_k=2, mode="gather")
    np.testing.assert_allclose(np.asarray(gather), np.asarray(dense), rtol=2e-4, atol=2e-4)


def test_mixtral_gather_decode_matches_dense():
    cfg = mx.MixtralConfig.tiny()
    cfg_g = dataclasses.replace(cfg, moe_mode="gather")
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    ref, _, _ = mx.forward(params, cfg, input_ids=ids)
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = mx.forward(params, cfg_g, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_unstacked_layers_match_stacked():
    cfg = mx.MixtralConfig.tiny()
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    un = mx.unstack_layers(params)
    ids = jnp.array([[1, 5, 9, 2]], jnp.int32)
    a, _, _ = mx.forward(params, cfg, input_ids=ids)
    b, _, _ = mx.forward(un, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    # with cache
    cache = mx.init_kv_cache(cfg, 1, 8)
    a2, ca, _ = mx.forward(params, cfg, input_ids=ids, cache=cache)
    b2, cb, _ = mx.forward(un, cfg, input_ids=ids, cache=cache)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca["k"]), np.asarray(cb["k"]), rtol=1e-5, atol=1e-5)


def test_int8_gather_close_to_dense():
    from vita_tpu.ops.moe import init_moe_params, moe_ffn
    from vita_tpu.ops.moe_decode import moe_ffn_decode_q, quantize_expert_weights

    params = init_moe_params(jax.random.PRNGKey(0), n_experts=4, d_model=64, d_ff=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    dense, _ = moe_ffn(params, x, top_k=2, mode="dense")
    qp = quantize_expert_weights(params)
    with pltpu.force_tpu_interpret_mode():
        q_out, _ = moe_ffn_decode_q(qp, x, top_k=2)
    a = np.asarray(dense).ravel()
    b = np.asarray(q_out).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999, cos
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert rel < 0.05, rel


def test_mixtral_int8_decode_mode():
    cfg = mx.MixtralConfig.tiny()
    cfg_q = dataclasses.replace(cfg, moe_mode="gather_q")
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    un = mx.unstack_layers(params)
    qparams = mx.quantize_moe_for_decode(un)
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    ref, _, _ = mx.forward(params, cfg, input_ids=ids)
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = mx.forward(qparams, cfg_q, input_ids=ids)
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(out, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos
