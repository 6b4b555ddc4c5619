"""Pallas MoE decode kernel: compute only the selected experts.

XLA's einsum MoE paths read every expert's weights each step; batch-1
decode only needs the top-k (2 of 8 for Mixtral) — a 4x cut in HBM
traffic for the dominant weight stream. This kernel uses scalar-prefetched
expert indices to DMA just the chosen experts' weight blocks
(ffn-dim-blocked), computing SwiGLU per (token, k) pair and accumulating
the down-projection in VMEM scratch.

Equivalent role to the reference's FusedMoE CUDA kernel on the serving
path (web_demo/vllm_tools/vllm_file/mixtral.py:375-423), designed TPU-
first instead of translated.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vita_tpu.ops.moe import route_topk

DEFAULT_BLOCK_F = 256


def _gather_ffn_kernel(
    idx_ref,  # SMEM [T*k] selected expert per grid row
    x_ref,  # [1, 8, D] token activation (sublane-tiled; row 0 is data)
    wg_ref,  # [1, D, bf] gate block of the selected expert
    wu_ref,  # [1, D, bf] up block
    wd_ref,  # [1, bf, D] down block
    out_ref,  # [1, 8, D] (row 0 is data)
    acc_ref,  # scratch [8, D] f32
):
    fi = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(fi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [8, D]; rows are copies, extra FLOPs are negligible
    gate = jax.lax.dot_general(
        x, wg_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [8, bf]
    up = jax.lax.dot_general(
        x, wu_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = jax.nn.silu(gate) * up
    acc_ref[...] += jax.lax.dot_general(
        h.astype(wd_ref.dtype), wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _use_xla_fallback() -> bool:
    """True off-TPU unless a Pallas interpreter context is active — same
    rule as ops.paged_attention, so the gather paths (and the engines
    built on them) run on CPU meshes in tests."""
    from jax._src import config as _jax_config

    interpret_forced = (
        _jax_config.pallas_tpu_interpret_mode_context_manager.value is not None
    )
    return jax.default_backend() != "tpu" and not interpret_forced


def _gather_ffn_xla(x, topk_idx, w_gate, w_up, w_down) -> jnp.ndarray:
    """Reference/fallback path: gather the selected experts' weights and
    run the SwiGLU with plain einsums (reads everything — correctness
    twin of the Pallas kernel for non-TPU backends)."""
    wg = jnp.take(w_gate, topk_idx, axis=0)  # [T, k, D, F]
    wu = jnp.take(w_up, topk_idx, axis=0)
    wd = jnp.take(w_down, topk_idx, axis=0)  # [T, k, F, D]
    gate = jnp.einsum("td,tkdf->tkf", x, wg)
    up = jnp.einsum("td,tkdf->tkf", x, wu)
    h = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    out = jnp.einsum("tkf,tkfd->tkd", h.astype(wd.dtype), wd)
    return out.astype(x.dtype)


def gather_expert_ffn(
    x: jnp.ndarray,  # [T, D]
    topk_idx: jnp.ndarray,  # [T, k] int32
    w_gate: jnp.ndarray,  # [E, D, F]
    w_up: jnp.ndarray,  # [E, D, F]
    w_down: jnp.ndarray,  # [E, F, D]
    block_f: int = DEFAULT_BLOCK_F,
) -> jnp.ndarray:
    """Per-(token, k) expert FFN outputs [T, k, D] — only selected experts
    are read from HBM."""
    if _use_xla_fallback():
        return _gather_ffn_xla(x, topk_idx, w_gate, w_up, w_down)
    t, d = x.shape
    k = topk_idx.shape[1]
    e, _, f = w_gate.shape
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf

    flat_idx = topk_idx.reshape(t * k).astype(jnp.int32)
    # sublane-tiled activations: [T*k, 8, D] (row 0 carries the data)
    x_rep = jnp.broadcast_to(jnp.repeat(x, k, axis=0)[:, None, :], (t * k, 8, d))

    out = pl.pallas_call(
        _gather_ffn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t * k, nf),
            in_specs=[
                pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
                pl.BlockSpec((1, d, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, d, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, bf, d), lambda r, fi, idx: (idx[r], fi, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t * k, 8, d), x.dtype),
    )(flat_idx, x_rep, w_gate, w_up, w_down)
    return out[:, 0].reshape(t, k, d)


# ---------------------------------------------------------------------------
# int8 weight-only experts (2x less HBM traffic on the dominant stream)
# ---------------------------------------------------------------------------
def quantize_expert_weights(params) -> dict:
    """Per-output-channel symmetric int8 quantization of the expert mats.

    Replaces the reference's optional bitsandbytes 4/8-bit path
    (vita/train/train.py:217-237) with a TPU-native weight-only scheme:
    int8 values stream from HBM (half the bytes of bf16), dequantized in
    VMEM right before the MXU matmul. Router stays full precision.
    """
    @jax.jit
    def _q_one(w):
        wf = w.astype(jnp.float32)  # [E, A, B]
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    out = {"router": params["router"]}
    for name in ("w_gate", "w_up", "w_down"):
        w = params[name]
        if w.ndim == 4:  # [L, E, A, B] — quantize per layer to bound the
            # fp32 temporaries (a whole-stack fp32 cast would OOM HBM)
            qs = [_q_one(w[l]) for l in range(w.shape[0])]
            out[name] = jnp.stack([q for q, _ in qs])
            out[name + "_scale"] = jnp.stack([sc for _, sc in qs])
        else:
            out[name], out[name + "_scale"] = _q_one(w)
    return out


def _gather_ffn_kernel_q(
    idx_ref,
    x_ref,  # [1, 8, D]
    wg_ref,  # [1, D, bf] int8
    wgs_ref,  # [1, 1, bf] f32 scales
    wu_ref, wus_ref,
    wd_ref,  # [1, bf, D] int8
    wds_ref,  # [1, 1, D] f32
    out_ref,  # [1, 8, D]
    acc_ref,  # [8, D] f32
):
    fi = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(fi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [8, D]
    wg = wg_ref[0].astype(jnp.bfloat16)
    wu = wu_ref[0].astype(jnp.bfloat16)
    gate = jax.lax.dot_general(
        x, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wgs_ref[0]
    up = jax.lax.dot_general(
        x, wu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wus_ref[0]
    h = jax.nn.silu(gate) * up
    wd = wd_ref[0].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * wds_ref[0]

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def gather_expert_ffn_q(
    x: jnp.ndarray,  # [T, D]
    topk_idx: jnp.ndarray,  # [T, k]
    qparams: dict,
    block_f: int = 512,  # int8 blocks are half-size: 512 fits VMEM
) -> jnp.ndarray:
    if _use_xla_fallback():
        deq = lambda name: (
            qparams[name].astype(jnp.bfloat16)
            * qparams[name + "_scale"].astype(jnp.bfloat16)
        )
        return _gather_ffn_xla(
            x, topk_idx, deq("w_gate"), deq("w_up"), deq("w_down")
        )
    t, d = x.shape
    k = topk_idx.shape[1]
    e, _, f = qparams["w_gate"].shape
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf

    flat_idx = topk_idx.reshape(t * k).astype(jnp.int32)
    x_rep = jnp.broadcast_to(jnp.repeat(x, k, axis=0)[:, None, :], (t * k, 8, d))

    out = pl.pallas_call(
        _gather_ffn_kernel_q,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t * k, nf),
            in_specs=[
                pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
                pl.BlockSpec((1, d, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, d, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, bf, d), lambda r, fi, idx: (idx[r], fi, 0)),
                pl.BlockSpec((1, 1, d), lambda r, fi, idx: (idx[r], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t * k, 8, d), x.dtype),
    )(flat_idx, x_rep, qparams["w_gate"], qparams["w_gate_scale"],
      qparams["w_up"], qparams["w_up_scale"],
      qparams["w_down"], qparams["w_down_scale"])
    return out[:, 0].reshape(t, k, d)


def moe_ffn_decode_q(qparams: dict, x: jnp.ndarray, top_k: int = 2):
    """int8 weight-only decode MoE: route in fp32, compute with dequantized
    selected experts. Returns (out [T, D], aux=0)."""
    router_logits = jnp.einsum(
        "td,de->te", x.astype(jnp.float32), qparams["router"].astype(jnp.float32)
    )
    topk_w, topk_i, _ = route_topk(router_logits, top_k)
    expert_out = gather_expert_ffn_q(x, topk_i, qparams)
    out = jnp.sum(expert_out * topk_w[..., None].astype(x.dtype), axis=1)
    return out.astype(x.dtype), jnp.zeros((), jnp.float32)


# ---------------------------------------------------------------------------
# int4 weight-only experts (4x less HBM traffic on the dominant stream)
# ---------------------------------------------------------------------------
def _pack_int4(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pack int4 values ([-7,7] in an int8 array) two-per-byte by pairing
    the two HALVES along ``axis`` (row a with row a + n/2) — unpacking is
    then a plain concat, no sublane interleave."""
    lo, hi = jnp.split(q.astype(jnp.int32), 2, axis=axis)
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def _unpack_int4(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse of _pack_int4 -> bfloat16 values."""
    p32 = p.astype(jnp.int32)
    u = p32 & 0xF
    lo = (u ^ 8) - 8  # sign-extend the low nibble
    hi = p32 >> 4  # arithmetic shift recovers the high nibble
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.bfloat16)


def quantize_expert_weights_int4(params, group: int = 0) -> dict:
    """Symmetric int4 quantization (the next lever after int8 — replaces
    bitsandbytes' 4-bit option, train.py:217-237). ``group=0`` (default)
    scales per output channel; group>0 adds one scale per ``group``
    contracted rows (measured on-chip: group-128 improves logits cosine
    only 0.989->0.990 on random weights while costing +0.57 ms/tok in
    scale DMAs + VPU multiplies, so per-channel is the default). Gate/up
    pack along their input axis (D, never blocked by the kernel); down
    packs along its output axis (D) so F-blocking works."""
    @functools.partial(jax.jit, static_argnames=("pack_axis", "group"))
    def _q_one(w, pack_axis, group):
        wf = w.astype(jnp.float32)  # [E, A, B]
        e, a, b = wf.shape
        g = group if group and a % group == 0 else a
        wg = wf.reshape(e, a // g, g, b)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=2, keepdims=True) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(wg / scale), -7, 7).reshape(e, a, b).astype(jnp.int8)
        return _pack_int4(q, pack_axis), scale[:, :, 0].astype(jnp.float32)

    out = {"router": params["router"]}
    # w_down groups along F, which the kernel BLOCKS (block_f=512): its
    # per-block scale tile needs >= 8 sublanes (Mosaic), so group <= 64
    axes = {
        "w_gate": (-2, group),
        "w_up": (-2, group),
        "w_down": (-1, min(group, 64) if group else 0),
    }
    for name, (ax, g) in axes.items():
        w = params[name]
        if w.ndim == 4:  # [L, E, A, B] — per layer to bound fp32 temporaries
            qs = [_q_one(w[l], pack_axis=ax, group=g) for l in range(w.shape[0])]
            out[name] = jnp.stack([q for q, _ in qs])
            out[name + "_scale"] = jnp.stack([sc for _, sc in qs])
        else:
            out[name], out[name + "_scale"] = _q_one(w, pack_axis=ax, group=g)
    return out


def _apply_group_scale(w: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """w [A, B] bf16 * scale [A/g, B] broadcast over each g-row group."""
    a, b = w.shape
    ng = scale.shape[0]
    g = a // ng
    return (w.reshape(ng, g, b) * scale[:, None, :].astype(jnp.bfloat16)).reshape(a, b)


def _gather_ffn_kernel_q4(
    idx_ref,
    x_ref,  # [1, 8, D]
    wg_ref,  # [1, D/2, bf] int8 (packed along D)
    wgs_ref,  # [1, D/g, bf] f32 group scales
    wu_ref, wus_ref,
    wd_ref,  # [1, bf, D/2] int8 (packed along D)
    wds_ref,  # [1, bf/g, D] f32 group scales (blocked with F)
    out_ref,  # [1, 8, D]
    acc_ref,  # [8, D] f32
    *,
    fold_dg: bool,  # per-channel gate/up scales: fold AFTER the dot
    fold_fg: bool,  # per-channel down scales: fold into the accumulate
):
    fi = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(fi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [8, D]
    # With the DEFAULT per-channel quantization the scale lives on the
    # OUTPUT axis of each matmul and commutes with the contraction:
    # x @ (w * s_col) == (x @ w) * s_col. Folding it after the dot scales
    # the tiny [8, bf] activations instead of the full [D, bf] weight
    # tile — D/8 fewer VPU multiplies on the unpack path (measured
    # 1.85 -> faster full decode step on v5e). Grouped scales (group>0,
    # on the contracted axis) do not commute; keep the pre-multiply.
    if fold_dg:
        wg = _unpack_int4(wg_ref[0], 0)  # [D, bf] bf16, exact int values
        wu = _unpack_int4(wu_ref[0], 0)
    else:
        wg = _apply_group_scale(_unpack_int4(wg_ref[0], 0), wgs_ref[0])
        wu = _apply_group_scale(_unpack_int4(wu_ref[0], 0), wus_ref[0])
    gate = jax.lax.dot_general(
        x, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    up = jax.lax.dot_general(
        x, wu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if fold_dg:
        gate = gate * wgs_ref[0]  # [8, bf] * [1, bf]
        up = up * wus_ref[0]
    h = jax.nn.silu(gate) * up
    if fold_fg:
        wd = _unpack_int4(wd_ref[0], 1)  # [bf, D]
        acc_ref[...] += jax.lax.dot_general(
            h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * wds_ref[0]  # [8, D] * [1, D]
    else:
        wd = _apply_group_scale(_unpack_int4(wd_ref[0], 1), wds_ref[0])
        acc_ref[...] += jax.lax.dot_general(
            h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def gather_expert_ffn_q4(
    x: jnp.ndarray,  # [T, D]
    topk_idx: jnp.ndarray,  # [T, k]
    qparams: dict,
    block_f: int = 512,
) -> jnp.ndarray:
    if _use_xla_fallback():
        wg = jax.vmap(_apply_group_scale)(
            _unpack_int4(qparams["w_gate"], -2), qparams["w_gate_scale"]
        )
        wu = jax.vmap(_apply_group_scale)(
            _unpack_int4(qparams["w_up"], -2), qparams["w_up_scale"]
        )
        # w_down packs/groups along its OUTPUT axis (D): unpack on -1, then
        # apply the [F/g, D] scales over the F rows
        wd = jax.vmap(_apply_group_scale)(
            _unpack_int4(qparams["w_down"], -1), qparams["w_down_scale"]
        )
        return _gather_ffn_xla(x, topk_idx, wg, wu, wd)
    t, d = x.shape
    k = topk_idx.shape[1]
    e, _, f = qparams["w_gate"].shape  # [E, D/2, F]
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf

    flat_idx = topk_idx.reshape(t * k).astype(jnp.int32)
    x_rep = jnp.broadcast_to(jnp.repeat(x, k, axis=0)[:, None, :], (t * k, 8, d))
    n_dg = qparams["w_gate_scale"].shape[1]  # D/group
    # w_down scales are blocked along F together with the weights. With
    # per-channel quantization (group=0 -> ONE group spanning F) the same
    # [1, D] scale row serves every F block; deriving a per-block count
    # would be 0 whenever f > bf (every production shape) and break the
    # BlockSpec — map all blocks to group row 0 instead.
    ng_f = qparams["w_down_scale"].shape[1]
    if ng_f == 1:
        wds_spec = pl.BlockSpec((1, 1, d), lambda r, fi, idx: (idx[r], 0, 0))
    else:
        n_fg_per_block = ng_f * bf // f  # bf/group
        wds_spec = pl.BlockSpec(
            (1, n_fg_per_block, d), lambda r, fi, idx: (idx[r], fi, 0)
        )

    out = pl.pallas_call(
        functools.partial(
            _gather_ffn_kernel_q4, fold_dg=n_dg == 1, fold_fg=ng_f == 1
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t * k, nf),
            in_specs=[
                pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
                pl.BlockSpec((1, d // 2, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, n_dg, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, d // 2, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, n_dg, bf), lambda r, fi, idx: (idx[r], 0, fi)),
                pl.BlockSpec((1, bf, d // 2), lambda r, fi, idx: (idx[r], fi, 0)),
                wds_spec,
            ],
            out_specs=pl.BlockSpec((1, 8, d), lambda r, fi, idx: (r, 0, 0)),
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((t * k, 8, d), x.dtype),
    )(flat_idx, x_rep, qparams["w_gate"], qparams["w_gate_scale"],
      qparams["w_up"], qparams["w_up_scale"],
      qparams["w_down"], qparams["w_down_scale"])
    return out[:, 0].reshape(t, k, d)


# ---------------------------------------------------------------------------
# Batched decode: active-expert masked kernels (DMA-deduped)
# ---------------------------------------------------------------------------
# The per-(token, k) gather kernels above re-DMA an expert's weights for
# every pair that selects it, so batched decode stops scaling once the
# selected-pair count passes the expert count (measured: 1.23x aggregate
# at 4 slots). These kernels instead iterate (f-block OUTER, active expert
# INNER): each UNIQUE selected expert's weights stream from HBM exactly
# once per step regardless of batch — Pallas elides the copy when the
# block index repeats between consecutive grid steps, so the act list is
# sorted and padded by REPEATING its last id. All T tokens are computed
# against each active expert (wasted FLOPs are free: decode is HBM-bound)
# and the routing weights + padding-row zeroing fold in afterwards via a
# tiny [A, T] x [A, T, D] einsum. Equivalent role to vLLM's batched
# FusedMoE path (web_demo/vllm_tools/vllm_file/mixtral.py:375-423).

MASKED_MAX_T = 16
_MASKED_TP = 16  # token rows padded to one bf16 sublane tile
# measured on v5e (tools/bench_masked_moe.py, bench_results/masked_moe.json):
# masked wins 1.7-4.5x once the selected-pair count approaches the expert
# count (t>=4 for bf16/int8, t>=8 for int4 whose per-row kernel is already
# byte-light); below that the per-row gather's smaller launch wins
MASKED_MIN_T = 4
MASKED_MIN_T_Q4 = 8


def _sorted_pair_gather(x, topk_idx, run):
    """Run a per-(token, k)-row gather kernel with the flattened pairs
    sorted by expert id, then inverse-permute back to [T, k, D].

    Duplicate experts across a batch land on adjacent grid rows so the
    Pallas pipeline elides the repeated weight-block fetch (the masked
    kernels do this structurally; this recovers the win for batch sizes
    outside their [MASKED_MIN_T, MASKED_MAX_T] window). Outputs are
    bit-identical to the unsorted call — each pair's FFN is computed
    against the same weights either way."""
    t, k = topk_idx.shape
    flat = topk_idx.reshape(t * k)
    order = jnp.argsort(flat, stable=True)
    inv = jnp.argsort(order)
    x_rows = jnp.repeat(x, k, axis=0)[order]
    out = run(x_rows, flat[order][:, None])  # [T*k, 1, D]
    return out.reshape(t * k, -1)[inv].reshape(t, k, x.shape[-1])


def _gather_combine(eo, topk_w, x):
    out = jnp.sum(eo * topk_w[..., None].astype(x.dtype), axis=1)
    return out.astype(x.dtype)


def _active_expert_plan(topk_w, topk_idx, n_experts: int):
    """(act [A] int32, m [A, T] f32) for A = min(T*k, n_experts).

    ``act`` lists each unique selected expert once (ascending), padded by
    repeating the LAST unique id (adjacent twin -> weight DMA elided);
    ``m[a, t]`` carries token t's routing weight for expert act[a], zeroed
    on padding rows so the repeated id is not double-counted."""
    t, k = topk_idx.shape
    a_len = min(t * k, n_experts)
    flat = topk_idx.reshape(-1).astype(jnp.int32)
    c = jnp.sort(flat)
    first = jnp.concatenate([jnp.ones((1,), bool), c[1:] != c[:-1]])
    pos = jnp.cumsum(first) - 1  # unique rank of each sorted element
    u = pos[-1] + 1
    act = (
        jnp.zeros((a_len,), jnp.int32)
        .at[jnp.minimum(pos, a_len - 1)]
        .set(c, mode="drop")
    )
    act = jnp.where(jnp.arange(a_len) < u, act, c[-1])
    valid = (jnp.arange(a_len) < u).astype(jnp.float32)
    m = (
        jnp.einsum(
            "tk,atk->at",
            topk_w.astype(jnp.float32),
            (topk_idx[None, :, :] == act[:, None, None]).astype(jnp.float32),
        )
        * valid[:, None]
    )
    return act, m


def _masked_ffn_kernel(
    act_ref,  # SMEM [A] active expert ids (sorted unique + pad)
    x_ref,  # [Tp, D] all tokens (constant block — fetched once)
    wg_ref,  # [1, D, bf] gate block of expert act[a]
    wu_ref,  # [1, D, bf]
    wd_ref,  # [1, bf, D]
    out_ref,  # [1, Tp, D] per-expert unweighted FFN output
    acc_ref,  # scratch [A, Tp, D] f32 (per-expert rows: f-blocks interleave)
):
    fi = pl.program_id(0)
    a = pl.program_id(1)
    nf = pl.num_programs(0)

    @pl.when(fi == 0)
    def _init():
        acc_ref[pl.ds(a, 1)] = jnp.zeros_like(acc_ref[pl.ds(a, 1)])

    x = x_ref[...]  # [Tp, D]
    gate = jax.lax.dot_general(
        x, wg_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    up = jax.lax.dot_general(
        x, wu_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = jax.nn.silu(gate) * up
    acc_ref[pl.ds(a, 1)] += jax.lax.dot_general(
        h.astype(wd_ref.dtype), wd_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None]

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[...] = acc_ref[pl.ds(a, 1)].astype(out_ref.dtype)


def masked_expert_ffn(
    x: jnp.ndarray,  # [T, D]
    topk_w: jnp.ndarray,  # [T, k] routing weights
    topk_idx: jnp.ndarray,  # [T, k] int32 (flat layer*E+e ids allowed)
    w_gate: jnp.ndarray,  # [E_rows, D, F]
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,  # [E_rows, F, D]
    n_experts: int,  # true expert count (bounds unique ids per call)
    block_f: int = DEFAULT_BLOCK_F,
) -> jnp.ndarray:
    """Weighted MoE FFN output [T, D]; each unique selected expert's
    weights are read from HBM once for the whole batch."""
    t, d = x.shape
    if _use_xla_fallback() or t > MASKED_MAX_T or t < MASKED_MIN_T:
        # gather_expert_ffn picks the Pallas per-row kernel on TPU and the
        # XLA twin elsewhere; sort pairs by expert on TPU so duplicate
        # experts across the batch fetch their weight blocks once
        run = lambda xr, ir: gather_expert_ffn(xr, ir, w_gate, w_up, w_down,
                                               block_f=block_f)
        if _use_xla_fallback() or t < 2:
            eo = run(x, topk_idx)
        else:
            eo = _sorted_pair_gather(x, topk_idx, run)
        return _gather_combine(eo, topk_w, x)
    k = topk_idx.shape[1]
    _, _, f = w_gate.shape
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf
    act, m = _active_expert_plan(topk_w, topk_idx, n_experts)
    a_len = act.shape[0]
    tp = _MASKED_TP
    x_pad = jnp.zeros((tp, d), x.dtype).at[:t].set(x)

    y = pl.pallas_call(
        _masked_ffn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nf, a_len),
            in_specs=[
                pl.BlockSpec((tp, d), lambda fi, a, act: (0, 0)),
                pl.BlockSpec((1, d, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, d, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, bf, d), lambda fi, a, act: (act[a], fi, 0)),
            ],
            out_specs=pl.BlockSpec((1, tp, d), lambda fi, a, act: (a, 0, 0)),
            scratch_shapes=[pltpu.VMEM((a_len, tp, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((a_len, tp, d), x.dtype),
    )(act, x_pad, w_gate, w_up, w_down)
    out = jnp.einsum("at,atd->td", m, y[:, :t].astype(jnp.float32))
    return out.astype(x.dtype)


def _masked_ffn_kernel_q(
    act_ref,
    x_ref,  # [Tp, D]
    wg_ref,  # [1, D, bf] int8
    wgs_ref,  # [1, 1, bf] f32 per-channel scales
    wu_ref, wus_ref,
    wd_ref,  # [1, bf, D] int8
    wds_ref,  # [1, 1, D] f32
    out_ref,  # [1, Tp, D]
    acc_ref,  # [A, Tp, D] f32
):
    fi = pl.program_id(0)
    a = pl.program_id(1)
    nf = pl.num_programs(0)

    @pl.when(fi == 0)
    def _init():
        acc_ref[pl.ds(a, 1)] = jnp.zeros_like(acc_ref[pl.ds(a, 1)])

    x = x_ref[...]
    wg = wg_ref[0].astype(jnp.bfloat16)
    wu = wu_ref[0].astype(jnp.bfloat16)
    gate = jax.lax.dot_general(
        x, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wgs_ref[0]
    up = jax.lax.dot_general(
        x, wu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wus_ref[0]
    h = jax.nn.silu(gate) * up
    wd = wd_ref[0].astype(jnp.bfloat16)
    acc_ref[pl.ds(a, 1)] += (
        jax.lax.dot_general(
            h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * wds_ref[0]
    )[None]

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[...] = acc_ref[pl.ds(a, 1)].astype(out_ref.dtype)


def masked_expert_ffn_q(
    x: jnp.ndarray,
    topk_w: jnp.ndarray,
    topk_idx: jnp.ndarray,
    qparams: dict,
    n_experts: int,
    block_f: int = 512,
) -> jnp.ndarray:
    t, d = x.shape
    if _use_xla_fallback() or t > MASKED_MAX_T or t < MASKED_MIN_T:
        run = lambda xr, ir: gather_expert_ffn_q(xr, ir, qparams,
                                                 block_f=block_f)
        if _use_xla_fallback() or t < 2:
            eo = run(x, topk_idx)
        else:
            eo = _sorted_pair_gather(x, topk_idx, run)
        return _gather_combine(eo, topk_w, x)
    _, _, f = qparams["w_gate"].shape
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf
    act, m = _active_expert_plan(topk_w, topk_idx, n_experts)
    a_len = act.shape[0]
    tp = _MASKED_TP
    x_pad = jnp.zeros((tp, d), x.dtype).at[:t].set(x)

    y = pl.pallas_call(
        _masked_ffn_kernel_q,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nf, a_len),
            in_specs=[
                pl.BlockSpec((tp, d), lambda fi, a, act: (0, 0)),
                pl.BlockSpec((1, d, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, d, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, bf, d), lambda fi, a, act: (act[a], fi, 0)),
                pl.BlockSpec((1, 1, d), lambda fi, a, act: (act[a], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tp, d), lambda fi, a, act: (a, 0, 0)),
            scratch_shapes=[pltpu.VMEM((a_len, tp, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((a_len, tp, d), x.dtype),
    )(act, x_pad, qparams["w_gate"], qparams["w_gate_scale"],
      qparams["w_up"], qparams["w_up_scale"],
      qparams["w_down"], qparams["w_down_scale"])
    out = jnp.einsum("at,atd->td", m, y[:, :t].astype(jnp.float32))
    return out.astype(x.dtype)


def _masked_ffn_kernel_q4(
    act_ref,
    x_ref,  # [Tp, D]
    wg_ref,  # [1, D/2, bf] int4-packed
    wgs_ref,  # [1, 1, bf] f32 per-channel scales
    wu_ref, wus_ref,
    wd_ref,  # [1, bf, D/2]
    wds_ref,  # [1, 1, D]
    out_ref,
    acc_ref,
):
    fi = pl.program_id(0)
    a = pl.program_id(1)
    nf = pl.num_programs(0)

    @pl.when(fi == 0)
    def _init():
        acc_ref[pl.ds(a, 1)] = jnp.zeros_like(acc_ref[pl.ds(a, 1)])

    x = x_ref[...]
    # per-channel scales commute with the contraction: fold after the dot
    # (same reasoning as _gather_ffn_kernel_q4's fold_dg/fold_fg fast path)
    wg = _unpack_int4(wg_ref[0], 0)
    wu = _unpack_int4(wu_ref[0], 0)
    gate = jax.lax.dot_general(
        x, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wgs_ref[0]
    up = jax.lax.dot_general(
        x, wu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * wus_ref[0]
    h = jax.nn.silu(gate) * up
    wd = _unpack_int4(wd_ref[0], 1)
    acc_ref[pl.ds(a, 1)] += (
        jax.lax.dot_general(
            h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * wds_ref[0]
    )[None]

    @pl.when(fi == nf - 1)
    def _finish():
        out_ref[...] = acc_ref[pl.ds(a, 1)].astype(out_ref.dtype)


def masked_expert_ffn_q4(
    x: jnp.ndarray,
    topk_w: jnp.ndarray,
    topk_idx: jnp.ndarray,
    qparams: dict,
    n_experts: int,
    block_f: int = 512,
) -> jnp.ndarray:
    t, d = x.shape
    # grouped scales (non-default, measured slower) keep the per-row path
    grouped = (
        qparams["w_gate_scale"].shape[1] != 1
        or qparams["w_down_scale"].shape[1] != 1
    )
    if (_use_xla_fallback() or t > MASKED_MAX_T or t < MASKED_MIN_T_Q4
            or grouped):
        run = lambda xr, ir: gather_expert_ffn_q4(xr, ir, qparams,
                                                  block_f=block_f)
        if _use_xla_fallback() or t < 2:
            eo = run(x, topk_idx)
        else:
            eo = _sorted_pair_gather(x, topk_idx, run)
        return _gather_combine(eo, topk_w, x)
    _, _, f = qparams["w_gate"].shape  # [E, D/2, F]
    bf = min(block_f, f)
    nf = (f + bf - 1) // bf
    act, m = _active_expert_plan(topk_w, topk_idx, n_experts)
    a_len = act.shape[0]
    tp = _MASKED_TP
    x_pad = jnp.zeros((tp, d), x.dtype).at[:t].set(x)

    y = pl.pallas_call(
        _masked_ffn_kernel_q4,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nf, a_len),
            in_specs=[
                pl.BlockSpec((tp, d), lambda fi, a, act: (0, 0)),
                pl.BlockSpec((1, d // 2, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, d // 2, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, 1, bf), lambda fi, a, act: (act[a], 0, fi)),
                pl.BlockSpec((1, bf, d // 2), lambda fi, a, act: (act[a], fi, 0)),
                pl.BlockSpec((1, 1, d), lambda fi, a, act: (act[a], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tp, d), lambda fi, a, act: (a, 0, 0)),
            scratch_shapes=[pltpu.VMEM((a_len, tp, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((a_len, tp, d), x.dtype),
    )(act, x_pad, qparams["w_gate"], qparams["w_gate_scale"],
      qparams["w_up"], qparams["w_up_scale"],
      qparams["w_down"], qparams["w_down_scale"])
    out = jnp.einsum("at,atd->td", m, y[:, :t].astype(jnp.float32))
    return out.astype(x.dtype)
