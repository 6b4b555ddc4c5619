"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-device sharding logic is validated without TPU hardware by forcing
the host platform to expose 8 virtual devices (SURVEY.md §4).
"""

import os

# Override unconditionally: the session env may pin JAX_PLATFORMS to the
# real TPU, and jax may already be imported by sitecustomize — so update
# both the env (read by the CPU client at backend init) and jax.config
# (read at first device use, which hasn't happened yet at conftest time).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    With ~320 tests compiling hundreds of XLA:CPU programs in one process,
    the LLVM JIT eventually segfaults inside backend_compile_and_load on
    the next large program (reproducibly at the stage-3 train-step compile
    in test_stage_chaining.py; the same test passes in isolation). Bounding
    resident compiled code per module keeps the suite under the limit."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def mesh8():
    from vita_tpu.parallel.mesh import make_mesh

    return make_mesh(shape=(1, 2, 2, 2))
