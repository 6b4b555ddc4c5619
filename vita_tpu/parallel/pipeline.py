"""Pipeline parallelism: GPipe microbatch schedule over the ``pipe`` mesh axis.

TPU-native equivalent of the reference's vLLM pipeline-parallel plumbing
(web_demo/vllm_tools/vllm_file/mixtral.py:36,592-628,712-724 — `make_layers`
stage partition + `IntermediateTensors` send/recv). Instead of p2p tensor
queues between worker processes, stages are devices along one mesh axis and
activations move with `lax.ppermute` over ICI inside a single jitted
`shard_map` program; XLA overlaps the permute with the next step's compute.

Design:
  - The transform wraps only the homogeneous layer stack (the model keeps
    its scan-stacked [L, ...] parameter layout; stage s owns the contiguous
    slice [s*L/S, (s+1)*L/S) — the same array simply gains a "pipe" leading
    sharding, so no per-backend model code).
  - `shard_map(..., axis_names={"pipe"})` is manual over the pipe axis only;
    fsdp/expert/model stay GSPMD-automatic *inside each stage*, so PP
    composes with ZeRO-3 sharding, TP and EP unchanged.
  - Classic GPipe schedule: M microbatches, S stages, M+S-1 steps, bubble
    fraction (S-1)/(M+S-1). Each step every stage applies its local layers
    (a lax.scan) and ppermutes the activation to the next stage. Reverse-mode
    autodiff works through the whole thing (ppermute transposes to the
    reversed permute), giving 1F1B-cost backward for free from XLA's
    scheduler.
  - Bubble steps compute on zero activations; their outputs and aux-loss
    contributions are masked out, so gradients through garbage are exactly
    zero (the cotangent of a dropped scatter / untaken branch is zero).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE = "pipe"


def stage_reshape(stacked: Any, n_stages: int) -> Any:
    """[L, ...] leaf pytree -> [S, L/S, ...]; free when dim0 is pipe-sharded."""
    def r(x):
        if x.shape[0] % n_stages:
            raise ValueError(
                f"layer count {x.shape[0]} not divisible by pipe_stages={n_stages}"
            )
        return x.reshape((n_stages, x.shape[0] // n_stages) + x.shape[1:])

    return jax.tree.map(r, stacked)


def pipeline_layer_stack(
    mesh: Mesh,
    layer_body: Callable[[Any, jnp.ndarray, Any], Tuple[jnp.ndarray, jnp.ndarray]],
    stacked_params: Any,
    x: jnp.ndarray,  # [B, S_seq, D]
    consts: Any,  # pytree of [B, ...] per-sample arrays (positions, masks, ...)
    n_stages: int,
    n_microbatches: int,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``layer_body`` over the full layer stack as an S-stage GPipe.

    ``layer_body(lp, x_mb, consts_mb) -> (x_mb, aux_scalar)`` applies ONE
    layer to one microbatch (consts_mb are the [B_mb, ...] slices of
    ``consts``). Returns (x_out [B, S_seq, D], aux_total summed over layers
    and equal-weight averaged over microbatches).

    NOTE: the MoE load-balance aux is NONLINEAR in its batch statistics
    (E * sum f_e * p_e with per-batch means), so the per-microbatch
    average is not bit-identical to the unpipelined whole-batch aux —
    the standard GPipe property; logits and their grads ARE exact
    (tests/test_pipeline.py). With ragged token masks the difference
    grows with mask skew across microbatches.
    """
    if PIPE not in mesh.shape:
        raise ValueError(f"mesh has no '{PIPE}' axis: {dict(mesh.shape)}")
    if mesh.shape[PIPE] != n_stages:
        raise ValueError(
            f"pipe axis size {mesh.shape[PIPE]} != pipe_stages {n_stages}"
        )
    b = x.shape[0]
    m = n_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")
    bm = b // m

    params_staged = stage_reshape(stacked_params, n_stages)
    x_mb = x.reshape((m, bm) + x.shape[1:])
    # stage 0 consumes microbatch t at step t; pad the feed to M+S-1 steps
    pad = jnp.zeros((n_stages - 1,) + x_mb.shape[1:], x_mb.dtype)
    xs_feed = jnp.concatenate([x_mb, pad], axis=0)
    consts_mb = jax.tree.map(
        lambda c: c.reshape((m, bm) + c.shape[1:]), consts
    )

    def stage_fn(lp_local, xs_feed, consts_mb):
        # lp_local leaves: [1, L/S, ...] — exactly one stage per pipe device
        lp_local = jax.tree.map(lambda a: a[0], lp_local)
        stage = jax.lax.axis_index(PIPE)
        nstg = jax.lax.axis_size(PIPE)

        body = jax.checkpoint(layer_body) if remat else layer_body
        vary = lambda a: jax.lax.pcast(a, (PIPE,), to="varying")

        def run_stage(x0, cmb):
            def f(carry, lp):
                xx, aux = carry
                xx, a = body(lp, xx, cmb)
                return (xx, aux + a), None

            (y, aux), _ = jax.lax.scan(
                f, (x0, vary(jnp.zeros((), jnp.float32))), lp_local
            )
            return y, aux

        def step(carry, x_in):
            t, state, outputs, aux_sum = carry
            # microbatch this stage processes now; valid in [0, m)
            j = t - stage
            valid = (j >= 0) & (j < m)
            jc = jnp.clip(j, 0, m - 1)
            cmb = jax.tree.map(
                lambda c: jax.lax.dynamic_index_in_dim(c, jc, keepdims=False),
                consts_mb,
            )
            x0 = jnp.where(stage == 0, x_in, state)
            y, aux = run_stage(x0, cmb)
            aux_sum = aux_sum + jnp.where(valid, aux, 0.0)
            # the LAST stage finishes microbatch t-(S-1) at step t
            out_j = t - (nstg - 1)
            out_j = jnp.where(out_j < 0, m, out_j)  # negative -> dropped
            outputs = outputs.at[out_j].set(y, mode="drop")
            state_next = jax.lax.ppermute(
                y, PIPE, [(i, i + 1) for i in range(nstg - 1)]
            )
            return (t + 1, state_next, outputs, aux_sum), None

        zero_state = vary(jnp.zeros(x_mb.shape[1:], x_mb.dtype))
        outputs0 = vary(jnp.zeros((m,) + x_mb.shape[1:], x_mb.dtype))
        aux0 = vary(jnp.zeros((), jnp.float32))
        (t, state, outputs, aux_sum), _ = jax.lax.scan(
            step, (0, zero_state, outputs0, aux0), xs_feed
        )
        # every stage accumulated aux for its own layers over all m
        # microbatches; psum gives the stack total (also makes the value
        # pipe-invariant as out_specs P() requires)
        aux_total = jax.lax.psum(aux_sum, PIPE)
        return outputs[None], aux_total

    out, aux_total = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(PIPE), P(), P()),
        out_specs=(P(PIPE), P()),
        axis_names={PIPE},
    )(params_staged, xs_feed, consts_mb)
    # out is [S, M, Bm, ...] pipe-sharded on dim0; the finished activations
    # live on the last stage — slicing inserts the broadcast over pipe.
    x_out = out[n_stages - 1].reshape(x.shape)
    # match the unpipelined convention: layer_body aux values are summed
    # over layers; microbatches each saw bm rows of the batch, so average
    # the per-microbatch sums
    return x_out, aux_total / m
