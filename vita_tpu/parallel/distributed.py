"""Multi-host setup: jax.distributed over DCN + global mesh construction.

Replaces the reference's torchrun/NCCL multi-node launch
(script/train/finetuneTask_nodes.sh:6-33 — 6 nodes x 8 GPUs with
hand-tuned NCCL env). On TPU pods: call `initialize()` once per host (the
coordinator address comes from the TPU environment or explicit args), then
`global_mesh(shape)` builds the (data, fsdp, expert, model) mesh across
all processes; `data` naturally maps to the DCN (inter-slice) dimension
and the inner axes to ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from vita_tpu.parallel.mesh import AXES, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed init (no-op for single-process runs).

    On Cloud TPU the arguments are auto-detected; explicit args support
    DCN clusters launched by generic schedulers (the torchrun analog:
    MASTER_ADDR/RANK/WORLD_SIZE env vars are honored as a fallback).
    """
    if num_processes == 1:
        return  # explicit single-process: never fall back to env vars
    if num_processes is None and coordinator_address is None:
        world = int(os.environ.get("WORLD_SIZE", "1"))
        if world <= 1:
            return
        if "RANK" not in os.environ:
            raise RuntimeError(
                f"WORLD_SIZE={world} is set but RANK is not: every host "
                "would claim process_id 0 and the coordinator would hang; "
                "set RANK per host (torchrun semantics) or pass process_id"
            )
        coordinator_address = os.environ.get("MASTER_ADDR", "127.0.0.1") + ":" + os.environ.get(
            "MASTER_PORT", "8476"
        )
        num_processes = world
        process_id = int(os.environ["RANK"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # jax 0.9 raises 'distributed.initialize should only be called
        # once.'; older versions said 'already initialized'
        msg = str(e)
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


def global_mesh(shape: Optional[Sequence[int]] = None):
    """Mesh over all global devices (call after initialize())."""
    return make_mesh(shape=shape, devices=jax.devices())


def enable_compile_cache(path: str = "~/.cache/vita_tpu_xla") -> None:
    """Persistent XLA compilation cache — first compiles on the TPU tunnel
    take minutes; the cache makes warm starts instant."""
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
