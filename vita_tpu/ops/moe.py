"""Mixture-of-Experts: top-k routing, SwiGLU experts, two execution paths.

Routing semantics match the Mixtral backbone the reference serves
(softmax over all experts -> top-k -> renormalize the k weights), and the
Switch-style load-balancing auxiliary loss matches the reference's patched
forward (reference: vita/model/language_model/vita_mixtral.py:20-98,101-218).

Execution paths:
  - "dense": every expert runs on every token, outputs weighted by the
    (zeroed) router weights. Exact — no token dropping — and the layout is
    three big batched einsums, so small/test configs and low-batch decode
    map straight onto the MXU. O(E/k) extra FLOPs.
  - "capacity": GShard-style static dispatch/combine einsums with per-expert
    capacity C = ceil(T*k/E * capacity_factor). Static shapes, shardable
    over the 'expert' mesh axis (the dispatch einsum lowers to all-to-all
    under GSPMD). Tokens overflowing an expert's capacity lose that
    expert's contribution (standard dropping semantics).

This replaces the reference's external FusedMoE CUDA kernel
(web_demo/vllm_tools/vllm_file/mixtral.py:375-423).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MoEParamsSpec:
    n_experts: int
    d_model: int
    d_ff: int


def init_moe_params(rng, n_experts: int, d_model: int, d_ff: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    scale_in = d_model**-0.5
    scale_ff = d_ff**-0.5
    return {
        "router": jax.random.normal(k1, (d_model, n_experts), dtype) * scale_in,
        # Stacked expert weights, leading axis = expert (shard over 'expert').
        "w_gate": jax.random.normal(k2, (n_experts, d_model, d_ff), dtype) * scale_in,
        "w_up": jax.random.normal(k3, (n_experts, d_model, d_ff), dtype) * scale_in,
        "w_down": jax.random.normal(k4, (n_experts, d_ff, d_model), dtype) * scale_ff,
    }


def route_topk(
    router_logits: jnp.ndarray, top_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(topk_weights [T,k], topk_idx [T,k], probs [T,E]) — Mixtral semantics.

    Softmax in fp32 over all experts, take top-k, renormalize the k chosen
    weights to sum to 1.
    """
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topk_w, topk_i = jax.lax.top_k(probs, top_k)
    topk_w = topk_w / jnp.sum(topk_w, axis=-1, keepdims=True)
    return topk_w, topk_i, probs


def load_balancing_loss(
    probs: jnp.ndarray,  # [T, E] softmax router probs
    topk_idx: jnp.ndarray,  # [T, k]
    n_experts: int,
    token_mask: Optional[jnp.ndarray] = None,  # [T] 1 for real tokens
) -> jnp.ndarray:
    """Switch-Transformer aux loss: E * sum_e f_e * P_e.

    f_e = fraction of (token, slot) routings hitting expert e;
    P_e = mean router probability of expert e. Padding tokens are excluded
    via ``token_mask`` (the reference's attention_mask-aware variant,
    vita_mixtral.py:60-93).
    """
    sel = jax.nn.one_hot(topk_idx, n_experts, dtype=jnp.float32)  # [T, k, E]
    if token_mask is not None:
        m = token_mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        f = jnp.sum(sel * m[:, None, None], axis=(0, 1)) / (denom * sel.shape[1])
        p = jnp.sum(probs * m[:, None], axis=0) / denom
    else:
        f = jnp.mean(jnp.sum(sel, axis=1), axis=0) / sel.shape[1]
        p = jnp.mean(probs, axis=0)
    return n_experts * jnp.sum(f * p)


def _expert_ffn(params, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU applied per expert: x [E, C, D] -> [E, C, D]."""
    gate = jnp.einsum("ecd,edf->ecf", x, params["w_gate"])
    up = jnp.einsum("ecd,edf->ecf", x, params["w_up"])
    hidden = jax.nn.silu(gate) * up
    return jnp.einsum("ecf,efd->ecd", hidden, params["w_down"])


def moe_ffn(
    params,
    x: jnp.ndarray,  # [T, D] flattened tokens
    top_k: int = 2,
    mode: str = "dense",
    capacity_factor: float = 1.25,
    token_mask: Optional[jnp.ndarray] = None,
    flat: Optional[dict] = None,
    group_off=None,
    chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (output [T, D], aux_loss scalar).

    ``flat``/``group_off`` (gmm mode only): scan-safe stacked-weight views
    — see ops.moe_gmm.gmm_scan.

    ``chunk`` (training modes only): run the MoE as a ``lax.scan`` over
    token chunks of this size with ``jax.checkpoint`` on the body. The
    backward pass then rematerializes ONE chunk's expert intermediates at
    a time instead of holding the full token volume's (at stage-3 shapes
    those are the multi-GB buffers that set the training step's HBM
    high-water), at ~1/3 extra MoE FLOPs. Semantics deltas, both bounded
    by chunk size: the aux load-balancing loss becomes the valid-token-
    weighted mean of chunk-LOCAL aux losses (f_e/P_e statistics over each
    chunk rather than the whole batch), and sort/capacity-mode expert
    capacity is computed per chunk. Expert outputs are unchanged for the
    dropless modes (dense/gmm). Ignored when T <= chunk, when T does not
    divide by it, or for the gather decode modes (tiny T)."""
    t, d = x.shape
    if (chunk and 0 < chunk < t and t % chunk == 0
            and mode in ("dense", "sort", "gmm", "capacity")):
        xs = x.reshape(-1, chunk, d)
        tms = (jnp.ones((xs.shape[0], chunk), jnp.float32)
               if token_mask is None
               else token_mask.reshape(-1, chunk))

        @jax.checkpoint
        def _chunk_body(_, inp):
            xc, tc = inp
            out, aux = moe_ffn(
                params, xc, top_k, mode=mode,
                capacity_factor=capacity_factor, token_mask=tc,
                flat=flat, group_off=group_off,
            )
            return None, (out, aux, tc.astype(jnp.float32).sum())

        _, (outs, auxs, ns) = jax.lax.scan(_chunk_body, None, (xs, tms))
        aux = jnp.sum(auxs * ns) / jnp.maximum(jnp.sum(ns), 1.0)
        return outs.reshape(t, d), aux
    e = params["w_gate"].shape[0]
    router_logits = jnp.einsum(
        "td,de->te", x.astype(jnp.float32), params["router"].astype(jnp.float32)
    )
    topk_w, topk_i, probs = route_topk(router_logits, top_k)
    aux = load_balancing_loss(probs, topk_i, e, token_mask)

    if mode == "dense":
        # weights [T, E]: zero except the top-k picks.
        w_full = (
            jnp.zeros((t, e), jnp.float32)
            .at[jnp.arange(t)[:, None], topk_i]
            .add(topk_w)
        )
        xe = jnp.broadcast_to(x, (e, t, d))
        out_e = _expert_ffn(params, xe)  # [E, T, D]
        out = jnp.einsum("te,etd->td", w_full.astype(x.dtype), out_e)
        return out.astype(x.dtype), aux

    if mode in ("gather_q", "gather_q4"):
        # int8/int4 weight-only decode paths (params must be pre-quantized
        # via ops.moe_decode.quantize_expert_weights[_int4] /
        # mixtral.quantize_moe_for_decode). The masked wrappers dedupe the
        # expert-weight DMA across the batch (per-row gather at T=1 cost)
        # and fall back to the per-row kernels off-TPU / at large T.
        from vita_tpu.ops.moe_decode import masked_expert_ffn_q, masked_expert_ffn_q4

        fn = masked_expert_ffn_q4 if mode == "gather_q4" else masked_expert_ffn_q
        out = fn(x, topk_w, topk_i, params, n_experts=e)
        return out.astype(x.dtype), aux

    if mode == "gather":
        # Pallas decode path: stream only the selected experts' weights,
        # each unique expert read ONCE for the whole batch.
        # Routing math identical to 'dense'; aux loss still computed here.
        from vita_tpu.ops.moe_decode import masked_expert_ffn

        out = masked_expert_ffn(
            x, topk_w, topk_i,
            params["w_gate"], params["w_up"], params["w_down"], n_experts=e,
        )
        return out.astype(x.dtype), aux

    if mode == "gmm":
        # Megablox-style grouped matmul (ops/moe_gmm.py): tokens sorted by
        # expert + tile-padded, then the three expert matmuls run as plain
        # MXU tiles with scalar-prefetched per-tile weight indices. Exact
        # (dropless) — matches 'dense' combination with no capacity loss;
        # the training-at-scale path that replaces the sort-mode dispatch
        # scatter with straight-line matmuls (SURVEY hard part #1).
        from vita_tpu.ops.moe_gmm import moe_ffn_gmm

        out = moe_ffn_gmm(params, x, topk_w, topk_i, flat=flat,
                          group_off=group_off)
        return out.astype(x.dtype), aux

    if mode == "sort":
        # Sort-based ragged dispatch (training at scale): flat (token, slot)
        # pairs sort by expert, land in a [E, C, D] buffer by scatter, run
        # the per-expert SwiGLU batched, and gather back. Token-dropping
        # semantics are identical to 'capacity' (same flat (t, k) order
        # within each expert), but data movement is O(T*k*D) scatter/gather
        # instead of the O(T*E*C*D) one-hot dispatch/combine einsums —
        # at stage-3 shapes (T=73k, E=8, C=22.9k) those einsums move ~10^9
        # elements per layer (VERDICT round-1 weak item 4).
        capacity = int(max(top_k, np_ceil(t * top_k / e * capacity_factor)))
        fe = topk_i.reshape(-1)  # [T*k] expert per (token, slot)
        order = jnp.argsort(fe, stable=True)
        fe_s = fe[order]
        tok_s = order // top_k
        counts = jnp.bincount(fe, length=e)  # [E]
        starts = jnp.cumsum(counts) - counts  # exclusive prefix
        pos = jnp.arange(t * top_k) - starts[fe_s]  # slot within expert
        keep = pos < capacity
        # dropped entries write OUT OF RANGE (scatter 'drop' mode) — writing
        # at a clamped position would zero a legitimate slot
        pos_c = jnp.where(keep, pos, capacity)

        expert_in = jnp.zeros((e, capacity, d), x.dtype).at[fe_s, pos_c].set(
            x[tok_s], mode="drop"
        )
        expert_out = _expert_ffn(params, expert_in)  # [E, C, D]
        gather_pos = jnp.where(keep, pos, 0)
        y = expert_out[fe_s, gather_pos] * keep[:, None].astype(x.dtype)  # [T*k, D]
        w_s = topk_w.reshape(-1)[order].astype(x.dtype)
        out = jnp.zeros((t, d), x.dtype).at[tok_s].add(y * w_s[:, None])
        return out.astype(x.dtype), aux

    if mode == "capacity":
        capacity = int(max(top_k, np_ceil(t * top_k / e * capacity_factor)))
        # Position of each (token, slot) within its expert's buffer.
        sel = jax.nn.one_hot(topk_i, e, dtype=jnp.int32)  # [T, k, E]
        sel_flat = sel.reshape(t * top_k, e)
        pos = jnp.cumsum(sel_flat, axis=0) - 1  # [T*k, E]
        pos = jnp.sum(pos * sel_flat, axis=-1).reshape(t, top_k)  # [T, k]
        keep = pos < capacity
        disp = (
            jax.nn.one_hot(topk_i, e, dtype=x.dtype)[..., None]
            * jax.nn.one_hot(jnp.where(keep, pos, 0), capacity, dtype=x.dtype)[:, :, None, :]
            * keep[..., None, None].astype(x.dtype)
        )  # [T, k, E, C]
        dispatch = jnp.sum(disp, axis=1)  # [T, E, C] 0/1
        combine = jnp.sum(disp * topk_w[..., None, None].astype(x.dtype), axis=1)
        expert_in = jnp.einsum("tec,td->ecd", dispatch, x)
        expert_out = _expert_ffn(params, expert_in)
        out = jnp.einsum("tec,ecd->td", combine, expert_out)
        return out.astype(x.dtype), aux

    raise ValueError(f"unknown moe mode {mode!r}")


def np_ceil(v: float) -> int:
    return int(-(-v // 1))
