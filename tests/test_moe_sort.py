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
