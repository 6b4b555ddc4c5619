"""Ring attention (parallel/ring_attention.py): the sequence-parallel ring
schedule over the 'seq' mesh axis must equal unsharded attention exactly —
forward and gradients, causal masking across shard boundaries, right-padding
lengths — and compose with 'model' head sharding and the full Mixtral
forward. Runs on the simulated 8-device CPU mesh (the off-TPU XLA twin
computes each block's (out, lse); on TPU the same island runs the Pallas
flash-with-lse kernel)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import mixtral
from vita_tpu.parallel.mesh import make_mesh
from vita_tpu.parallel.ring_attention import ring_flash_mha

B, S, HQ, HKV, D = 2, 32, 4, 2, 8


@pytest.fixture(scope="module")
def qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, HQ, D))
    k = jax.random.normal(ks[1], (B, S, HKV, D))
    v = jax.random.normal(ks[2], (B, S, HKV, D))
    return q, k, v


def ref_attn(q, k, v, lengths, causal):
    rep = q.shape[2] // k.shape[2]
    kr = jnp.repeat(k, rep, axis=2)
    vr = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bshd,bthd->bhst", q, kr) * (q.shape[-1] ** -0.5)
    k_pos = jnp.arange(S)[None, None, None, :]
    mask = k_pos < lengths[:, None, None, None]
    if causal:
        mask = mask & (k_pos <= jnp.arange(S)[None, None, :, None])
    logits = jnp.where(mask, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", p, vr)


@pytest.mark.parametrize("seq_axis,model_axis", [(4, 1), (2, 2), (8, 1)])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(qkv, seq_axis, model_axis, causal):
    q, k, v = qkv
    mesh = make_mesh((1, 8 // (seq_axis * model_axis), 1, model_axis, 1,
                      seq_axis))
    lengths = jnp.array([S, S - 7])
    got = ring_flash_mha(q, k, v, lengths, causal=causal, mesh=mesh)
    want = ref_attn(q, k, v, lengths, causal)
    # rows past a batch row's length attend only its valid prefix in both
    # impls; compare everything
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_grads_match_reference(qkv):
    q, k, v = qkv
    mesh = make_mesh((1, 2, 1, 1, 1, 4))
    lengths = jnp.array([S, S - 5])
    mask = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.float32)

    def loss_ring(q, k, v):
        o = ring_flash_mha(q, k, v, lengths, causal=True, mesh=mesh)
        return jnp.sum((o * mask[:, :, None, None]) ** 2)

    def loss_ref(q, k, v):
        o = ref_attn(q, k, v, lengths, True)
        return jnp.sum((o * mask[:, :, None, None]) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_ring_rejects_bad_shapes(qkv):
    q, k, v = qkv
    mesh = make_mesh((1, 2, 1, 1, 1, 4))
    with pytest.raises(ValueError, match="divisible"):
        ring_flash_mha(q[:, : S - 2], k[:, : S - 2], v[:, : S - 2],
                       jnp.array([S - 2, S - 2]), mesh=mesh)
    with pytest.raises(ValueError, match="Sq == Skv"):
        ring_flash_mha(q[:, : S // 2], k, v, jnp.array([S, S]), mesh=mesh)


def test_mixtral_forward_seq_parallel_matches_unsharded():
    """Full tiny Mixtral: seq-sharded mesh (ring attention via the
    'flash' backend dispatch) == unsharded xla backend, loss and grads."""
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    valid = jnp.arange(32)[None, :] < jnp.array([[32], [25]])

    mesh = make_mesh((1, 2, 1, 1, 1, 4))
    cfg_sp = dataclasses.replace(cfg, attn_backend="flash")

    def loss(p, use_mesh):
        logits, _, aux = mixtral.forward(
            p, cfg_sp if use_mesh else cfg, input_ids=ids, attn_valid=valid,
            mesh=mesh if use_mesh else None,
        )
        m = valid.astype(jnp.float32)[:, :, None]
        return jnp.mean((logits.astype(jnp.float32) * m) ** 2) + 0.02 * aux

    l_ref = float(loss(params, False))
    l_sp = float(loss(params, True))
    np.testing.assert_allclose(l_sp, l_ref, rtol=1e-5)

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_sp = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
