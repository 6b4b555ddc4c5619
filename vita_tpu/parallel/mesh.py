"""Device mesh construction and the framework's named sharding axes.

One mesh serves training and serving (SURVEY.md §5.8): GSPMD partitioning
over these axes replaces the reference's three separate mechanisms —
DeepSpeed ZeRO sharded-DP (script/deepspeed/zero3.json), vLLM explicit
tensor-parallel layers (web_demo/vllm_tools/vllm_file/mixtral.py:461-476),
and its TP-sharded FusedMoE (same file :375-423).

Axes:
  data   — batch data parallelism (maps to DCN between slices).
  fsdp   — parameter/optimizer sharding (ZeRO-3 equivalent), ICI.
  expert — MoE expert parallelism (all_to_all dispatch), ICI.
  model  — tensor parallelism of attention heads / MLP columns, ICI.
  pipe   — pipeline stages (GPipe microbatch schedule, parallel/pipeline.py;
           the reference's vLLM PP plumbing, vllm_file/mixtral.py:592-628).
  seq    — sequence parallelism: activations' sequence dim sharded, exact
           attention via the ring schedule (parallel/ring_attention.py).
           A capability the reference lacks (SURVEY §2.2: SP absent).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA, FSDP, EXPERT, MODEL, PIPE, SEQ = (
    "data", "fsdp", "expert", "model", "pipe", "seq"
)
AXES: Tuple[str, ...] = (DATA, FSDP, EXPERT, MODEL, PIPE, SEQ)


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 6-axis framework mesh.

    ``shape`` is (data, fsdp, expert, model[, pipe[, seq]]) sizes; its
    product must equal the device count (pipe/seq default to 1 when a
    shorter tuple is given). Default: all devices on the fsdp axis (pure
    ZeRO-3 style), which is the right default for training a MoE that
    fits memory when parameter-sharded.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n, 1, 1)
    shape = tuple(int(s) for s in shape)
    while 4 <= len(shape) < 6:
        shape = shape + (1,)
    if len(shape) != 6:
        raise ValueError(f"mesh shape must have 4-6 axes {AXES}, got {shape}")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """Mesh over the first n local devices (CPU-simulated in tests)."""
    return make_mesh(devices=jax.devices()[:n], shape=(1, n, 1, 1))
