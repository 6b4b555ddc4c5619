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


def test_int4_pack_roundtrip():
    from vita_tpu.ops.moe_decode import _pack_int4, _unpack_int4

    rng = np.random.default_rng(0)
    for axis in (0, 1):
        q = jnp.asarray(rng.integers(-7, 8, (8, 16)), jnp.int8)
        packed = _pack_int4(q, axis)
        assert packed.shape[axis] == q.shape[axis] // 2
        back = _unpack_int4(packed, axis)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q, np.float32))


def test_int4_gather_close_to_dense():
    from vita_tpu.ops.moe_decode import quantize_expert_weights_int4

    params = init_moe_params(jax.random.PRNGKey(4), n_experts=4, d_model=64, d_ff=256)
    q = quantize_expert_weights_int4(params)
    # packed shapes: gate/up along D (axis -2), down along D (axis -1)
    assert q["w_gate"].shape == (4, 32, 256) and q["w_gate"].dtype == jnp.int8
    assert q["w_down"].shape == (4, 256, 32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64))
    dense, _ = moe_ffn(params, x, top_k=2, mode="dense")
    with pltpu.force_tpu_interpret_mode():
        q4, _ = moe_ffn(q, x, top_k=2, mode="gather_q4")

    # kernel-exactness: dequantize the packed weights and run the dense
    # path on THEM — must match the kernel closely (isolates kernel bugs
    # from quantization noise)
    from vita_tpu.ops.moe_decode import _unpack_int4

    def dq(pk, scale, pack_axis):
        w = _unpack_int4(pk, pack_axis).astype(jnp.float32)  # [E, A, B]
        e, a, b = w.shape
        ng = scale.shape[1]
        return (w.reshape(e, ng, a // ng, b) * scale[:, :, None, :]).reshape(e, a, b)

    deq = {
        "router": q["router"],
        "w_gate": dq(q["w_gate"], q["w_gate_scale"], 1),
        "w_up": dq(q["w_up"], q["w_up_scale"], 1),
        "w_down": dq(q["w_down"], q["w_down_scale"], 2),
    }
    ref, _ = moe_ffn(deq, x, top_k=2, mode="dense")
    np.testing.assert_allclose(np.asarray(q4), np.asarray(ref), rtol=2e-2, atol=2e-2)

    # quantization noise at this tiny width still keeps high agreement
    a, b = np.asarray(dense).ravel(), np.asarray(q4).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.97, cos


def test_mixtral_int4_decode_mode():
    cfg = mx.MixtralConfig.tiny()
    cfg_q = dataclasses.replace(cfg, moe_mode="gather_q4")
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    qparams = mx.quantize_moe_for_decode(params, bits=4)
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    ref, _, _ = mx.forward(params, cfg, input_ids=ids)
    with pltpu.force_tpu_interpret_mode():
        got, _, _ = mx.forward(qparams, cfg_q, input_ids=ids)
    a, b = np.asarray(ref).ravel(), np.asarray(got).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.97, cos  # tiny width; >=0.999 at full width (bench)


def test_int4_kernel_per_channel_blocked_f():
    """The Pallas q4 kernel with DEFAULT per-channel quantization and
    F > block_f (every production shape): the single w_down scale group
    must serve every F block — deriving a per-block group count divides
    to zero and broke the BlockSpec (regression, found on real TPU)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from vita_tpu.ops.moe import init_moe_params
    from vita_tpu.ops.moe_decode import (
        gather_expert_ffn,
        gather_expert_ffn_q4,
        quantize_expert_weights_int4,
    )

    e, d, f, t = 2, 128, 1024, 3  # f > DEFAULT block_f? kernel blocks at 512
    params = init_moe_params(jax.random.PRNGKey(0), e, d, f)
    qp = quantize_expert_weights_int4(params)  # group=0: ONE F scale group
    assert qp["w_down_scale"].shape[1] == 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d)) * 0.3, jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, size=(t, 2)), jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        got = gather_expert_ffn_q4(x, idx, qp, block_f=512)
    want = gather_expert_ffn(
        x, idx, params["w_gate"], params["w_up"], params["w_down"]
    )
    # int4 quantization error bounds the diff; direction must agree
    cos = np.sum(np.asarray(got) * np.asarray(want)) / (
        np.linalg.norm(got) * np.linalg.norm(want)
    )
    assert cos > 0.97


# ---------------------------------------------------------------------------
# masked active-expert (DMA-deduped) batched-decode kernels
# ---------------------------------------------------------------------------
def test_active_expert_plan_unique_and_padded():
    from vita_tpu.ops.moe_decode import _active_expert_plan

    topk_i = jnp.array([[2, 0], [2, 3], [0, 2]], jnp.int32)  # unique {0,2,3}
    topk_w = jnp.full((3, 2), 0.5, jnp.float32)
    act, m = _active_expert_plan(topk_w, topk_i, n_experts=8)
    act = np.asarray(act)
    m = np.asarray(m)
    assert act.shape == (6,)
    assert list(act[:3]) == [0, 2, 3]
    # padding repeats the LAST unique id (adjacent -> DMA elided) ...
    assert all(act[3:] == 3)
    # ... and its mask rows are zero (no double count)
    assert np.all(m[3:] == 0.0)
    # reconstruction: sum of per-expert masks recovers each token's weights
    assert np.allclose(m.sum(0), 1.0)
    # token 1 routes to experts 2 and 3
    assert m[1, 1] == 0.5 and m[2, 1] == 0.5 and m[0, 1] == 0.0


@pytest.mark.parametrize("t", [5, 8, 16])
def test_masked_ffn_matches_dense(t):
    from vita_tpu.ops.moe import load_balancing_loss, route_topk
    from vita_tpu.ops.moe_decode import masked_expert_ffn

    params = init_moe_params(jax.random.PRNGKey(0), n_experts=4, d_model=64, d_ff=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, 64), jnp.float32)
    dense, _ = moe_ffn(params, x, top_k=2, mode="dense")
    logits = jnp.einsum("td,de->te", x, params["router"].astype(jnp.float32))
    topk_w, topk_i, _ = route_topk(logits, 2)
    with pltpu.force_tpu_interpret_mode():
        out = masked_expert_ffn(
            x, topk_w, topk_i,
            params["w_gate"], params["w_up"], params["w_down"], n_experts=4,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), rtol=2e-4, atol=2e-4)


def test_masked_ffn_flat_stacked_indices():
    """Flat layer*E+e ids (the decode path's stacked-weight view) must
    address the right rows."""
    from vita_tpu.ops.moe import route_topk
    from vita_tpu.ops.moe_decode import masked_expert_ffn

    e, d, f, layers = 4, 32, 96, 2
    key = jax.random.PRNGKey(0)
    wg = jax.random.normal(key, (layers * e, d, f), jnp.float32) * 0.05
    wu = jax.random.normal(jax.random.PRNGKey(1), (layers * e, d, f)) * 0.05
    wd = jax.random.normal(jax.random.PRNGKey(2), (layers * e, f, d)) * 0.05
    x = jax.random.normal(jax.random.PRNGKey(3), (4, d))
    topk_i = jnp.array([[0, 2], [1, 3], [2, 0], [3, 1]], jnp.int32) + e  # layer 1
    topk_w = jnp.array(
        [[0.7, 0.3], [0.6, 0.4], [0.5, 0.5], [0.8, 0.2]], jnp.float32
    )
    from vita_tpu.ops.moe_decode import _gather_ffn_xla

    eo = _gather_ffn_xla(x, topk_i, wg, wu, wd)
    want = jnp.sum(eo * topk_w[..., None], axis=1)
    with pltpu.force_tpu_interpret_mode():
        got = masked_expert_ffn(x, topk_w, topk_i, wg, wu, wd, n_experts=e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_masked_int8_close_to_dense():
    from vita_tpu.ops.moe import route_topk
    from vita_tpu.ops.moe_decode import masked_expert_ffn_q, quantize_expert_weights

    params = init_moe_params(jax.random.PRNGKey(0), n_experts=4, d_model=64, d_ff=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    dense, _ = moe_ffn(params, x, top_k=2, mode="dense")
    logits = jnp.einsum("td,de->te", x, params["router"].astype(jnp.float32))
    topk_w, topk_i, _ = route_topk(logits, 2)
    qp = quantize_expert_weights(params)
    with pltpu.force_tpu_interpret_mode():
        out = masked_expert_ffn_q(x, topk_w, topk_i, qp, n_experts=4)
    a, b = np.asarray(dense).ravel(), np.asarray(out).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.999, cos


def test_masked_int4_matches_q4_gather():
    """Kernel-exactness: the masked q4 kernel must match the per-row q4
    gather on the SAME quantized weights (isolates kernel bugs from
    int4 quantization noise, like test_int4_gather_close_to_dense)."""
    from vita_tpu.ops.moe import route_topk
    from vita_tpu.ops.moe_decode import (
        gather_expert_ffn_q4,
        masked_expert_ffn_q4,
        quantize_expert_weights_int4,
    )

    params = init_moe_params(jax.random.PRNGKey(0), n_experts=4, d_model=64, d_ff=256)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    logits = jnp.einsum("td,de->te", x, params["router"].astype(jnp.float32))
    topk_w, topk_i, _ = route_topk(logits, 2)
    qp = quantize_expert_weights_int4(params)
    eo = gather_expert_ffn_q4(x, topk_i, qp)
    want = jnp.sum(eo * topk_w[..., None].astype(x.dtype), axis=1)
    with pltpu.force_tpu_interpret_mode():
        out = masked_expert_ffn_q4(x, topk_w, topk_i, qp, n_experts=4)
    a, b = np.asarray(want).ravel(), np.asarray(out).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.9999, cos
