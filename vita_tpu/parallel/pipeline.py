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


def pipeline_prefill_kv(
    mesh: Mesh,
    layer_body: Callable,  # (lp, x [B,T,D], consts_w, kv_zeros) -> (x, k, v)
    stacked_params: Any,  # [L, ...] leaf pytree (pipe-sharded on dim 0)
    x: jnp.ndarray,  # [W, B, T, D] wave-major prompt embeddings
    consts: Any,  # pytree of [W, B, ...] per-wave arrays
    kv_template: jnp.ndarray,  # [B, T_max, H_kv, Dh] zeros (write target)
    n_stages: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GPipe prefill that also MATERIALIZES the per-layer KV cache in the
    wave-major, layer-sharded layout `pipeline_decode_greedy` consumes:
    stage s keeps [L/S, W, B, T_max, H, Dh] rows for its own layers only,
    filled as each wave (= microbatch) passes through. This is what makes
    pipeline-parallel serving end-to-end: prefill AND decode of a model
    whose weights exceed one chip's HBM, without ever gathering the cache.

    ``layer_body(lp, x, consts_w, kv_zeros)`` applies ONE layer to one
    wave and returns (x_out, k_cache_slice, v_cache_slice) — the cache
    slices are the kv_zeros template with the prompt rows written (the
    attention block's normal cache-write path at cache_pos=0).

    Returns (x_out [W, B, T, D], cache_k, cache_v [L, W, B, T_max, H, Dh]).
    """
    if PIPE not in mesh.shape:
        raise ValueError(f"mesh has no '{PIPE}' axis: {dict(mesh.shape)}")
    if mesh.shape[PIPE] != n_stages:
        raise ValueError(
            f"pipe axis size {mesh.shape[PIPE]} != n_stages {n_stages}"
        )
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"layer count {n_layers} not divisible by pipe stages {n_stages}"
        )
    w_waves = x.shape[0]
    pad = jnp.zeros((n_stages - 1,) + x.shape[1:], x.dtype)
    xs_feed = jnp.concatenate([x, pad], axis=0)  # stage 0 eats wave t at t

    def stage_fn(lp_local, xs_feed, consts, kv_template):
        stage = jax.lax.axis_index(PIPE)
        nstg = jax.lax.axis_size(PIPE)
        vary = lambda a: jax.lax.pcast(a, (PIPE,), to="varying")
        l_local = jax.tree.leaves(lp_local)[0].shape[0]

        def run_stage(x0, cw):
            def f(xx, lp):
                xx, k, v = layer_body(lp, xx, cw, kv_template)
                return xx, (k, v)

            return jax.lax.scan(f, x0, lp_local)  # (y, (k [L/S,...], v))

        def step(carry, x_in):
            t, state, ck, cv, outputs = carry
            j = t - stage
            valid = (j >= 0) & (j < w_waves)
            jc = jnp.clip(j, 0, w_waves - 1)
            cw = jax.tree.map(
                lambda c: jax.lax.dynamic_index_in_dim(c, jc, keepdims=False),
                consts,
            )
            x0 = jnp.where(stage == 0, x_in, state)
            y, (k, v) = run_stage(x0, cw)
            # merge-write wave jc: invalid steps must not clobber a wave's
            # real rows (the post-window clamp lands on wave W-1)
            old_k = jax.lax.dynamic_index_in_dim(ck, jc, axis=1, keepdims=False)
            old_v = jax.lax.dynamic_index_in_dim(cv, jc, axis=1, keepdims=False)
            ck = jax.lax.dynamic_update_index_in_dim(
                ck, jnp.where(valid, k, old_k), jc, axis=1
            )
            cv = jax.lax.dynamic_update_index_in_dim(
                cv, jnp.where(valid, v, old_v), jc, axis=1
            )
            out_j = t - (nstg - 1)
            out_j = jnp.where(out_j < 0, w_waves, out_j)  # drop
            outputs = outputs.at[out_j].set(y, mode="drop")
            state = jax.lax.ppermute(
                y, PIPE, [(i, i + 1) for i in range(nstg - 1)]
            )
            return (t + 1, state, ck, cv, outputs), None

        kv_shape = (l_local, w_waves) + kv_template.shape
        init = (
            jnp.int32(0),
            vary(jnp.zeros(x.shape[1:], x.dtype)),
            vary(jnp.zeros(kv_shape, kv_template.dtype)),
            vary(jnp.zeros(kv_shape, kv_template.dtype)),
            vary(jnp.zeros((w_waves,) + x.shape[1:], x.dtype)),
        )
        (t, state, ck, cv, outputs), _ = jax.lax.scan(step, init, xs_feed)
        # the finished activations live on the last stage; psum-mask makes
        # them replicated (out_specs P())
        x_out = jax.lax.psum(
            jnp.where(stage == nstg - 1, outputs, jnp.zeros_like(outputs)),
            PIPE,
        )
        return x_out, ck, cv

    return jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(PIPE), P(), P(), P()),
        out_specs=(P(), P(PIPE), P(PIPE)),
        axis_names={PIPE},
    )(stacked_params, xs_feed, consts, kv_template)


def pipeline_decode_greedy(
    mesh: Mesh,
    stage_fn: Callable,  # (lp_local, ck_w, cv_w, x, positions, kv_valid, cache_pos) -> (y, nk, nv)
    finish_fn: Callable,  # (head_params, y [B,1,D]) -> (tok [B] i32, emb [B,1,D])
    stacked_params: Any,  # [L, ...] leaf pytree (pipe-sharded on dim 0)
    head_params: Any,  # replicated: final norm / lm_head / embed table
    cache_k: jnp.ndarray,  # [L, W, B, T_max, H_kv, Dh] (pipe-sharded on L)
    cache_v: jnp.ndarray,
    x0: jnp.ndarray,  # [W, B, 1, D] first-token embeddings per wave
    pos0: jnp.ndarray,  # [W, B] int32 — rows already cached (prefill length)
    n_tokens: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ring-schedule pipeline-parallel DECODE: S waves in flight.

    The decode-path half of the reference's vLLM PP plumbing
    (web_demo/vllm_tools/vllm_file/mixtral.py:592-628 — `IntermediateTensors`
    p2p between stage workers; the reference never deployed it). TPU-native
    design: W == S independent decode groups ("waves") ride a `ppermute`
    ring over the pipe axis inside one jitted shard_map. At every substep
    each stage applies its L/S local layers to the wave it currently holds,
    so all stages stay busy (no GPipe bubble in steady state) and one token
    completes per substep. Wave w's token i is processed by stage s at
    substep t = w + i*S + s; the last stage samples greedily and the new
    token's embedding rides the ring wrap (S-1 -> 0) straight back into
    stage 0 for the next substep. KV cache is sharded on the LAYER dim:
    each stage holds [L/S, W, B, T] rows for its own layers only — this is
    what lets a model whose weights exceed one chip's HBM decode across a
    pipe axis without weight replication.

    Per-token latency equals the unpipelined depth (S * stage time) plus S
    ICI hops; throughput is S times the single-wave rate. Warmup/drain
    bubbles of S-1 substeps are paid once per call, not per token.

    Returns (tokens [W, n_tokens, B] int32, cache_k, cache_v) — caches
    updated in place at each wave's positions, so calls chain.
    """
    if PIPE not in mesh.shape:
        raise ValueError(f"mesh has no '{PIPE}' axis: {dict(mesh.shape)}")
    n_stages = mesh.shape[PIPE]
    w_waves, b = pos0.shape
    if w_waves != n_stages:
        raise ValueError(
            f"wave count {w_waves} must equal pipe stages {n_stages}"
        )
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(
            f"layer count {n_layers} not divisible by pipe stages {n_stages}"
        )
    t_max = cache_k.shape[3]
    total = n_stages * n_tokens + n_stages - 1
    feed = jnp.concatenate(
        [x0, jnp.zeros((total - n_stages,) + x0.shape[1:], x0.dtype)], axis=0
    )

    def ring_fn(lp_local, head, ck, cv, feed, pos0):
        stage = jax.lax.axis_index(PIPE)
        nstg = jax.lax.axis_size(PIPE)
        vary = lambda a: jax.lax.pcast(a, (PIPE,), to="varying")

        def step(carry, x_in):
            t, state, ck, cv, outs = carry
            j = t - stage
            valid = (j >= 0) & (j < nstg * n_tokens)
            jc = jnp.maximum(j, 0)
            wave = jc % nstg
            itok = jc // nstg
            # stage 0 takes the feed for a wave's first token; everything
            # else consumes what the ring delivered last substep
            x_cur = jnp.where((stage == 0) & (itok == 0), x_in, state)
            pos_w = jnp.take(pos0, wave, axis=0) + itok  # [B]
            # invalid substeps write at t_max -> scatter mode='drop'
            cache_pos = jnp.where(valid, pos_w, t_max)
            positions = pos_w[:, None]
            kv_valid = jnp.arange(t_max)[None, :] <= pos_w[:, None]
            ck_w = jax.lax.dynamic_index_in_dim(ck, wave, axis=1, keepdims=False)
            cv_w = jax.lax.dynamic_index_in_dim(cv, wave, axis=1, keepdims=False)
            y, nk, nv = stage_fn(
                lp_local, ck_w, cv_w, x_cur, positions, kv_valid, cache_pos
            )
            # invalid substeps dropped their writes, so nk == ck_w there;
            # unconditional write-back is safe
            ck = jax.lax.dynamic_update_index_in_dim(ck, nk, wave, axis=1)
            cv = jax.lax.dynamic_update_index_in_dim(cv, nv, wave, axis=1)

            # only the LAST stage pays the lm_head read: inside shard_map
            # the predicate is a per-device scalar, so lax.cond skips the
            # branch at runtime on the other S-1 stages (an unconditional
            # finish would add a full head read per STAGE-step — ~12%
            # extra HBM traffic at S=8 full width)
            def _finish(yy):
                return finish_fn(head, yy)

            def _skip(yy):
                return (
                    vary(jnp.zeros(yy.shape[:1], jnp.int32)),
                    jnp.zeros_like(yy),
                )

            tok, emb = jax.lax.cond(stage == nstg - 1, _finish, _skip, y)
            # the LAST stage finishes wave (t-(S-1)) mod S token (t-(S-1))//S
            jf = jnp.maximum(t - (nstg - 1), 0)
            w_f, i_f = jf % nstg, jf // nstg
            fin_valid = (t >= nstg - 1) & (i_f < n_tokens)
            i_f = jnp.where(fin_valid, i_f, n_tokens)  # out of range -> drop
            outs = outs.at[w_f, i_f].set(tok, mode="drop")
            ring_out = jnp.where(stage == nstg - 1, emb, y)
            state = jax.lax.ppermute(
                ring_out, PIPE, [(i, (i + 1) % nstg) for i in range(nstg)]
            )
            return (t + 1, state, ck, cv, outs), None

        init = (
            jnp.int32(0),
            vary(jnp.zeros(x0.shape[1:], x0.dtype)),
            ck,
            cv,
            vary(jnp.zeros((w_waves, n_tokens, b), jnp.int32)),
        )
        (t, state, ck, cv, outs), _ = jax.lax.scan(step, init, feed)
        # every stage accumulated ITS OWN argmax garbage; only the last
        # stage's entries are the real tokens
        toks = jax.lax.psum(
            jnp.where(stage == nstg - 1, outs, jnp.zeros_like(outs)), PIPE
        )
        return toks, ck, cv

    return jax.shard_map(
        ring_fn,
        mesh=mesh,
        in_specs=(P(PIPE), P(), P(PIPE), P(PIPE), P(), P()),
        out_specs=(P(), P(PIPE), P(PIPE)),
        axis_names={PIPE},
    )(stacked_params, head_params, cache_k, cache_v, feed, pos0)
