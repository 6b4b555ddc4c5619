"""Sort-based ragged MoE dispatch: exactness vs capacity/dense, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.ops.moe import init_moe_params, moe_ffn


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.PRNGKey(0), 4, 32, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 32))
    return params, x


def test_sort_matches_capacity_exactly(setup):
    """Same dropping semantics: identical output at tight capacity."""
    params, x = setup
    for cf in (0.5, 1.0, 1.25):
        a, aux_a = moe_ffn(params, x, 2, mode="capacity", capacity_factor=cf)
        b, aux_b = moe_ffn(params, x, 2, mode="sort", capacity_factor=cf)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(aux_a), float(aux_b), rtol=1e-6)


def test_sort_matches_dense_at_generous_capacity(setup):
    params, x = setup
    dense, _ = moe_ffn(params, x, 2, mode="dense")
    sort, _ = moe_ffn(params, x, 2, mode="sort", capacity_factor=4.0)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sort), rtol=1e-4, atol=1e-4)


def test_sort_grads_match_dense(setup):
    """No dropping => gradients agree with the dense path."""
    params, x = setup

    def loss(p, mode, cf):
        out, aux = moe_ffn(p, x, 2, mode=mode, capacity_factor=cf)
        return jnp.sum(out**2) + aux

    gd = jax.grad(loss)(params, "dense", 0.0)
    gs = jax.grad(loss)(params, "sort", 4.0)
    for k in gd:
        np.testing.assert_allclose(
            np.asarray(gd[k]), np.asarray(gs[k]), rtol=2e-4, atol=2e-4
        )


def test_sort_runs_under_mesh(setup):
    """jit over the 8-device mesh with expert-sharded weights."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params, x = setup
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "expert"))
    specs = {
        "router": P(None, None),
        "w_gate": P("expert", None, None),
        "w_up": P("expert", None, None),
        "w_down": P("expert", None, None),
    }
    with mesh:
        sharded = {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in params.items()
        }
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        out, _ = jax.jit(
            lambda p, xx: moe_ffn(p, xx, 2, mode="sort", capacity_factor=2.0)
        )(sharded, xs)
    ref, _ = moe_ffn(params, x, 2, mode="sort", capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestMoeChunk:
    """chunk=N: rematerialized scan over token chunks (ops.moe.moe_ffn).

    The memory lever for memory-constrained training (MixtralConfig.
    moe_chunk / train CLI --moe-chunk): expert outputs must be unchanged
    for the dropless modes, the aux loss becomes the valid-token-weighted
    mean of chunk-local aux losses, and grads through the output path
    must match the unchunked dispatch."""

    def test_output_exact_dropless(self, setup):
        params, x = setup
        for mode in ("dense", "gmm"):
            a, _ = moe_ffn(params, x, 2, mode=mode)
            b, _ = moe_ffn(params, x, 2, mode=mode, chunk=8)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_ignored_when_not_divisible_or_large(self, setup):
        params, x = setup  # T=24
        a, aux_a = moe_ffn(params, x, 2, mode="dense")
        for chunk in (7, 24, 100):  # 24 % 7 != 0; chunk >= T
            b, aux_b = moe_ffn(params, x, 2, mode="dense", chunk=chunk)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert float(aux_a) == float(aux_b)

    def test_grads_match_through_output_path(self, setup):
        """Aux excluded (chunk-local by design); output grads must agree."""
        params, x = setup

        def loss(p, chunk):
            out, _ = moe_ffn(p, x, 2, mode="dense", chunk=chunk)
            return jnp.sum(out**2)

        g0 = jax.grad(loss)(params, 0)
        g8 = jax.grad(loss)(params, 8)
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(g0[k]), np.asarray(g8[k]), rtol=2e-4, atol=2e-4
            )

    def test_chunk_local_aux_weighted_by_mask(self, setup):
        """aux == sum_c(aux_c * n_valid_c) / n_valid; padding excluded."""
        params, x = setup
        mask = jnp.asarray([1.0] * 20 + [0.0] * 4)
        _, aux = moe_ffn(params, x, 2, mode="dense", token_mask=mask, chunk=8)
        auxs, ns = [], []
        for c in range(3):
            xc, mc = x[c * 8:(c + 1) * 8], mask[c * 8:(c + 1) * 8]
            _, a = moe_ffn(params, xc, 2, mode="dense", token_mask=mc)
            auxs.append(float(a))
            ns.append(float(mc.sum()))
        want = sum(a * n for a, n in zip(auxs, ns)) / sum(ns)
        np.testing.assert_allclose(float(aux), want, rtol=1e-5)

    def test_forward_config_knob(self):
        """MixtralConfig.moe_chunk threads to every training layer path."""
        from vita_tpu.models import mixtral

        cfg = mixtral.MixtralConfig.tiny(moe_mode="gmm")
        params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0,
                                 cfg.vocab_size)
        ref, _, _ = mixtral.forward(params, cfg, input_ids=ids)
        import dataclasses
        cfg_c = dataclasses.replace(cfg, moe_chunk=8)
        got, _, _ = mixtral.forward(params, cfg_c, input_ids=ids)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-4
        )
