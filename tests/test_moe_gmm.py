"""Grouped-matmul training MoE (ops/moe_gmm.py): the dropless gmm mode must
match dense mode exactly (same routing, no capacity loss), the kernels must
match einsums in interpret mode (fwd + both grads + transpose_rhs), and the
sorted layout must be collision-free with every expert covered."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vita_tpu.ops import moe
from vita_tpu.ops.moe_gmm import TILE_M, gmm, moe_ffn_gmm, sorted_layout


@pytest.fixture(scope="module")
def setup():
    e, d, f, t = 4, 64, 128, 37
    params = moe.init_moe_params(jax.random.PRNGKey(0), e, d, f)
    x = jax.random.normal(jax.random.PRNGKey(1), (t, d))
    return params, x, e


def test_gmm_mode_matches_dense(setup):
    params, x, e = setup
    out_d, aux_d = moe.moe_ffn(params, x, top_k=2, mode="dense")
    out_g, aux_g = moe.moe_ffn(params, x, top_k=2, mode="gmm")
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(aux_g), float(aux_d), rtol=1e-6)


def test_gmm_mode_grads_match_dense(setup):
    params, x, e = setup

    def loss(p, x, mode):
        out, aux = moe.moe_ffn(p, x, top_k=2, mode=mode)
        return jnp.sum(out.astype(jnp.float32) ** 2) + 0.02 * aux

    gd = jax.grad(loss, argnums=(0, 1))(params, x, "dense")
    gg = jax.grad(loss, argnums=(0, 1))(params, x, "gmm")
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


def test_gmm_empty_expert_grads_zero(setup):
    """An expert no token routes to must get exactly zero grad (the wgrad
    kernel visits its block with an all-zero tile, never garbage)."""
    params, x, e = setup
    t = x.shape[0]
    rng = np.random.default_rng(2)
    # route every (token, slot) pair to experts 0/1 only
    topk_idx = jnp.asarray(
        np.stack([np.zeros(t), np.ones(t)], axis=1), jnp.int32
    )
    topk_w = jnp.asarray(rng.uniform(0.2, 0.8, size=(t, 2)), jnp.float32)

    def loss(p):
        out = moe_ffn_gmm(p, x, topk_w, topk_idx)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    for name in ("w_gate", "w_up", "w_down"):
        dead = np.asarray(g[name][2:])  # experts 2,3 unused
        np.testing.assert_array_equal(dead, np.zeros_like(dead))
        live = np.asarray(g[name][:1])
        assert np.abs(live).max() > 0


def test_sorted_layout_properties():
    rng = np.random.default_rng(0)
    e, t, k = 5, 41, 2
    topk = jnp.asarray(rng.integers(0, e, size=(t, k)), jnp.int32)
    dest, tok_s, order, gids, r = sorted_layout(topk, e)
    dest = np.asarray(dest)
    assert len(set(dest.tolist())) == t * k  # no collisions
    assert dest.max() < r and r % TILE_M == 0
    g = np.asarray(gids)
    assert (np.diff(g) >= 0).all()  # non-decreasing
    assert set(range(e)) <= set(g.tolist())  # every expert covered (>=1 tile)
    # each pair's destination tile belongs to its expert
    fe_s = np.asarray(topk).reshape(-1)[np.asarray(order)]
    np.testing.assert_array_equal(g[dest // TILE_M], fe_s)


@pytest.mark.slow
def test_gmm_kernel_interpret_matches_einsum():
    """The Pallas kernels themselves (not the XLA fallback): fwd, dgrad via
    transpose_rhs, and the consecutive-run wgrad, in interpreter mode."""
    # gids must cover every group (sorted_layout guarantees >= 1 tile per
    # expert precisely because unvisited wgrad output blocks are undefined)
    e, r, k_dim, n_dim = 3, 4 * TILE_M, 128, 256
    rng = np.random.default_rng(1)
    x = np.asarray(rng.standard_normal((r, k_dim)), np.float32)
    x[TILE_M : 2 * TILE_M] = 0.0  # expert 1's only tile: all-zero rows
    x = jnp.asarray(x)
    w = jnp.asarray(rng.standard_normal((e, k_dim, n_dim)), jnp.float32) * 0.1
    gids = jnp.asarray([0, 1, 2, 2], jnp.int32)
    row_g = np.repeat([0, 1, 2, 2], TILE_M)

    def ref(x, w):
        return jnp.einsum("rk,rkn->rn", x, w[row_g])

    with pltpu.force_tpu_interpret_mode():
        y = gmm(x, w, gids)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, w)),
                                   rtol=1e-5, atol=1e-5)

        def loss(x, w):
            return jnp.sum(gmm(x, w, gids) ** 2)

        dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(lambda x, w: jnp.sum(ref(x, w) ** 2),
                          argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    # expert 1 untouched -> zero grad, not garbage
    np.testing.assert_array_equal(np.asarray(dw[1]), np.zeros((k_dim, n_dim)))


@pytest.mark.slow
def test_gmm_kernel_interpret_big_schedule(monkeypatch):
    """The k-blocked big-R schedule (training sizes) must match the
    weights-once small-R schedule; force it via the R threshold."""
    from vita_tpu.ops import moe_gmm

    e, r, k_dim, n_dim = 3, 4 * TILE_M, 128, 256
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((r, k_dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((e, k_dim, n_dim)), jnp.float32) * 0.1
    gids = jnp.asarray([0, 1, 2, 2], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        y_small = gmm(x, w, gids)
        monkeypatch.setattr(moe_gmm, "SMALL_R_MAX", 0)
        y_big = gmm(x, w, gids)
    np.testing.assert_allclose(np.asarray(y_big), np.asarray(y_small),
                               rtol=1e-5, atol=1e-5)


def test_gmm_train_step_runs():
    """Full train step with moe_mode='gmm' (XLA fallback on CPU): finite
    loss matching the dense-mode step."""
    import dataclasses

    from vita_tpu.models import mixtral

    cfg = mixtral.MixtralConfig.tiny(n_experts=2, top_k=2, moe_mode="dense")
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)

    def loss(p, c):
        logits, _, aux = mixtral.forward(p, c, input_ids=ids)
        return jnp.mean(logits.astype(jnp.float32) ** 2) + 0.02 * aux

    l_dense = float(loss(params, cfg))
    cfg_g = dataclasses.replace(cfg, moe_mode="gmm")
    l_gmm = float(loss(params, cfg_g))
    np.testing.assert_allclose(l_gmm, l_dense, rtol=1e-5)
    # grads flow through gmm_scan's custom VJP (the scan path reads flat
    # uint weight views; grads must land on the stacked params) and match
    # dense-mode grads
    g_dense = jax.grad(loss)(params, cfg)
    g_gmm = jax.grad(loss)(params, cfg_g)
    flat_d, tree_d = jax.tree.flatten(g_dense)
    flat_g, tree_g = jax.tree.flatten(g_gmm)
    assert tree_d == tree_g
    for a, b in zip(flat_d, flat_g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
