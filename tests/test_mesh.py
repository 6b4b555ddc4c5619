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
