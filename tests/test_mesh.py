"""Mesh construction sanity on the simulated 8-device CPU backend."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from vita_tpu.parallel.mesh import AXES, make_mesh, shard


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_default_mesh_all_fsdp():
    m = make_mesh()
    assert m.shape["fsdp"] == jax.device_count()
    assert tuple(m.axis_names) == AXES


def test_mesh_shape_validation():
    with pytest.raises(ValueError):
        make_mesh(shape=(3, 1, 1, 1))
    with pytest.raises(ValueError):
        make_mesh(shape=(2, 2, 2))


def test_sharded_matmul_runs(mesh8):
    x = jnp.ones((8, 16))
    w = jnp.ones((16, 32))
    xs = jax.device_put(x, shard(mesh8, "fsdp", None))
    ws = jax.device_put(w, shard(mesh8, None, "model"))
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    assert out.shape == (8, 32)
    assert float(out[0, 0]) == 16.0


def test_expert_parallel_capacity_moe_on_mesh(mesh8):
    """Capacity-mode MoE with experts sharded on the 'expert' axis must
    match the unsharded dense path (GSPMD all-to-all dispatch)."""
    import dataclasses

    from vita_tpu.models import mixtral as mx

    cfg = mx.MixtralConfig.tiny(n_experts=4)
    cfg_cap = dataclasses.replace(
        cfg, moe_mode="capacity", moe_capacity_factor=float(cfg.n_experts)
    )
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    specs = mx.param_specs(cfg)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, jax.sharding.NamedSharding(mesh8, s)),
        params, specs,
    )
    ids = jnp.array([[1, 5, 9, 2]] * 2, jnp.int32)
    out, _, _ = jax.jit(lambda p, i: mx.forward(p, cfg_cap, input_ids=i))(sharded, ids)
    ref, _, _ = mx.forward(params, cfg, input_ids=ids)
    import numpy as np
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_remat_training_grads_match(mesh8):
    """jax.checkpoint'd layers give identical gradients."""
    import dataclasses

    import numpy as np

    from vita_tpu.models import mixtral as mx

    cfg = mx.MixtralConfig.tiny()
    cfg_r = dataclasses.replace(cfg, remat=True)
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[1, 5, 9, 2]], jnp.int32)

    def loss(p, c):
        logits, _, _ = mx.forward(p, c, input_ids=ids)
        return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-6

    g1 = jax.grad(lambda p: loss(p, cfg))(params)
    g2 = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
