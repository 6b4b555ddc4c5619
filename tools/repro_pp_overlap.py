"""Repro + bisection harness for the off-TPU overlapped-PP corruption.

The serving engine serializes pipeline-parallel program executions
off-TPU (serve/engine.py `_pp_sync`). This script is the seeded repro
that justifies it (VERDICT r4 item 5): it runs the PP engine on the
simulated CPU mesh with the serialization DISABLED and compares token
streams against the serialized run.

Measured bisection (2026-08-19, jax 0.9.0, CPU backend, 8 virtual
devices, tiny 4-layer model, greedy):

  pipe=2, 2 slots, ticks=4, inflight=2:          0/30 corrupted
  pipe=4, 4 slots, ticks=4, inflight=2:         20/20 corrupted
  pipe=4, 4 slots, ticks=1, inflight=1:         10/10  -> NOT multi-tick,
                                                          NOT inflight depth
  pipe=4, 4 slots, no donation:                  5/10  -> donation not the
                                                          only mechanism
  pipe=4, 1 request (no concurrent programs),
      donation on, >=2 engine lifecycles:         4/10 at ticks=4,
                                                  6/6 at ticks=1
      (always clean on the FIRST lifecycle; corruption at a
      chunk-boundary token on later lifecycles)
  pipe=4, 1 request, fresh process per run:       0/4
  pipe=4, 1 request, no donation:                 0/6

Conclusion — two independent mechanisms, both specific to the
host-emulated multi-device runtime:
  (a) concurrent PP program executions (prefill x prefill, prefill x
      decode) interleave their emulated ppermute/psum rendezvous
      (4-request corruption that survives disabling donation);
  (b) donated-pool buffers from a completed engine lifecycle are reused
      by the next engine's allocations while asynchronously dispatched
      work still references them (1-request corruption that requires
      donation AND a prior in-process lifecycle, and always spares the
      first).
On real TPU hardware each program's collectives compile to per-execution
ICI transfers (no cross-program rendezvous), and the TPU runtime
sequences donated-buffer reuse against in-flight executions — neither
mechanism applies; the async pipelined dispatch path stays enabled
there. Regression guard: tests/test_pp_engine.py::
test_pp_sync_two_lifecycles_token_identical runs the exact corrupting
scenario WITH the serialization and must stay token-identical.

Usage:
  PYTHONPATH=/root/repo python tools/repro_pp_overlap.py \
      --iters 10 --pipe 4 --slots 4 [--reqs 1] [--no-donate] \
      [--ticks N] [--inflight N] [--prefills N]
"""

import argparse
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import dataclasses

import numpy as np

from vita_tpu.models import vita
from vita_tpu.parallel.mesh import make_mesh
from vita_tpu.serve.engine import Engine, Request


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ticks", type=int, default=4)
    ap.add_argument("--inflight", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--mode", default="dense")
    ap.add_argument("--pipe", type=int, default=4)
    ap.add_argument("--reqs", type=int, default=0)
    ap.add_argument("--prefills", type=int, default=2)
    args = ap.parse_args()

    if args.no_donate:
        import functools

        import vita_tpu.parallel.pp_serving as pps

        fn = pps.pp_decode_chunk.__wrapped__
        pps.pp_decode_chunk = functools.partial(
            jax.jit(fn, static_argnames=("llm_cfg", "chunk_len",
                                         "sampling_mode", "mesh")),
        )

    cfg = vita.VITAConfig.tiny()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, n_layers=4)
    )
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(shape=(1, 1, 1, 1, args.pipe, 1),
                     devices=jax.devices()[: args.pipe])
    n_reqs = args.reqs or args.slots
    prompts = [np.array([1, 50 + i, 60, 70, 80, 90], np.int32)
               for i in range(n_reqs)]

    def run(sync: bool):
        eng = Engine(params, cfg, n_slots=args.slots, max_len=128, seed=0,
                     decode_moe_mode=args.mode, mesh=mesh,
                     decode_ticks=args.ticks, decode_inflight=args.inflight,
                     max_concurrent_prefills=args.prefills)
        eng._pp_sync = sync
        reqs = [Request(input_ids=p, max_new_tokens=args.tokens, eos_id=-1)
                for p in prompts]
        for r in reqs:
            eng.submit(r)
        eng.run_until_idle()
        return [r.tokens for r in reqs]

    ref = run(True)
    bad = 0
    for it in range(args.iters):
        got = run(False)
        if got != ref:
            bad += 1
            for i, (a, b) in enumerate(zip(ref, got)):
                if a != b:
                    d = next(j for j in range(min(len(a), len(b)))
                             if a[j] != b[j])
                    print(f"iter {it} slot {i}: first diff at token {d}: "
                          f"{a[d]} vs {b[d]}")
    print(f"{bad}/{args.iters} runs corrupted (pipe={args.pipe} "
          f"reqs={n_reqs} ticks={args.ticks} inflight={args.inflight} "
          f"donate={not args.no_donate})")


if __name__ == "__main__":
    main()
