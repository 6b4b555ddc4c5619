"""Pallas TPU flash attention: blocked online-softmax, fwd + bwd, GQA-native.

Replaces the reference's external flash-attn 2 CUDA dependency
(vita/train/train.py:261, internvit/flash_attention.py) with a TPU-native
kernel: O(S) memory (no [S, S] score materialization), fp32 accumulators,
bf16-friendly.

GQA is native: K/V stay at [B*Hkv, S, D] in HBM and the BlockSpec index
maps send every q head of a group to the same kv head
(``kv_head = qh // rep``) — each kv byte crosses HBM once per group
instead of being materialized ``rep`` times (for VITA's 32q/8kv that is
4x less KV traffic, the dominant decode stream after the experts).

Supported masking: ``causal`` (with ``q_offset`` for decode against a
longer KV) and per-batch ``kv_len`` padding. This covers every attention
pattern in the framework (LLM causal+padding, Whale/ViT bidirectional
+padding) without streaming a full bias tensor from HBM.

Layout: kernel works on q [B*Hq, Sq, D] vs kv [B*Hkv, Skv, D]; the public
API takes [B, S, H, D] like ops.attention.mha. Grid is (bh, q_block,
kv_block) with the kv axis innermost-sequential, accumulating into VMEM
scratch (flash-2 style). The dK/dV kernel runs on a (b*kv_head, kv_block,
group*q_block) grid so a kv block accumulates gradients from all q heads
of its group before being written once.

Backward follows the flash-2 formulation: fwd saves per-row logsumexp;
bwd recomputes block scores, with delta = rowsum(do * o):
    p  = exp(s - lse);  dv += p^T do;  ds = p * (dp - delta)
    dk += ds^T q;       dq += ds k
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024


def _blocks(n: int, b: int) -> int:
    return (n + b - 1) // b


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
def _fwd_kernel(
    kv_len_ref,  # SMEM [B] valid kv length per batch row
    q_off_ref,  # SMEM [B] absolute position of q row 0, per batch row
    q_ref,  # [1, bq, D]
    k_ref,  # [1, bk, D]
    v_ref,  # [1, bk, D]
    o_ref,  # [1, bq, D]
    lse_ref,  # [1, bq]
    acc_ref,  # scratch [bq, D] f32
    m_ref,  # scratch [bq, 1] f32
    l_ref,  # scratch [bq, 1] f32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    hq: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    b = pl.program_id(0) // hq
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]

    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_off
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    run_block = True
    if causal:
        # whole block is masked out when its first k exceeds the last q
        run_block = (ki * block_k) <= (qi * block_q + block_q - 1 + q_off)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= q_pos
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[...]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = m_ref[...] + jnp.log(l_safe)
        lse_row = jnp.where(l[:, 0] == 0.0, NEG_INF, lse[:, 0])  # [bq]
        # lse lives as [bh, 8, sq] (sublane-tiled for TPU layout rules);
        # row 0 carries the data, rows 1..7 are padding.
        lse_ref[0] = jnp.broadcast_to(lse_row[None, :], (8, lse_row.shape[0]))


def _flash_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q, block_k, hq, hkv):
    bh, sq, d = q.shape
    skv = k.shape[1]
    rep = hq // hkv
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    grid = (bh, _blocks(sq, block_q), _blocks(skv, block_k))

    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        hq=hq,
    )

    def kv_row(bh_idx):
        return (bh_idx // hq) * hkv + (bh_idx % hq) // rep

    if causal:
        # Masked-out kv blocks (block start beyond the q block's last row)
        # are clamped to the last needed block so consecutive grid steps
        # map to the same block (compute is already predicated off via
        # run_block). Measured neutral on v5e at S<=8192 — current Mosaic
        # still prefetches the repeated block — but it is correct, free,
        # and positions the kernel for DMA elision.
        def kv_index(b, i, j, kv_len_ref, q_off_ref):
            # clamp at 0: q_offset can be NEGATIVE (ring attention passes
            # fully-future KV blocks whose compute is predicated off) and
            # a negative block index would be an out-of-bounds fetch
            last_needed = (i * block_q + block_q - 1 + q_off_ref[b // hq]) // block_k
            return (kv_row(b), jnp.clip(last_needed, 0, j), 0)
    else:
        def kv_index(b, i, j, *_):
            return (kv_row(b), j, 0)

    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), kv_index),
                pl.BlockSpec((1, block_k, d), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, block_q), lambda b, i, j, *_: (b, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, sq), jnp.float32),
        ],
    )(kv_len, q_offset, q, k, v)
    return o, lse


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------
def _bwd_dq_kernel(
    kv_len_ref, q_off_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, causal, scale, block_q, block_k, hq,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    b = pl.program_id(0) // hq
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_off
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    run_block = True
    if causal:
        run_block = (ki * block_k) <= (qi * block_q + block_q - 1 + q_off)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= q_pos
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0][:, None])  # [bq, bk]
        dp = jax.lax.dot_general(
            do_ref[0], v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, 0][:, None]) * scale
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    kv_len_ref, q_off_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, causal, scale, block_q, block_k, hkv, nq,
):
    # grid: (b*hkv, kv_block, group*q_block) — the innermost axis sweeps
    # all q blocks of every q head sharing this kv head, so dk/dv for the
    # block accumulate across the whole GQA group and are written once.
    ki = pl.program_id(1)
    t = pl.program_id(2)
    nt = pl.num_programs(2)
    qi = t % nq

    @pl.when(t == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    b = pl.program_id(0) // hkv
    kv_len = kv_len_ref[b]
    q_off = q_off_ref[b]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_off
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    run_block = True
    if causal:
        # skip q blocks entirely above the diagonal
        run_block = (qi * block_q + block_q - 1 + q_off) >= (ki * block_k)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= q_pos
        s = jnp.where(mask, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0][:, None])  # [bq, bk]
        do = do_ref[0]
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0, 0][:, None]) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(t == nt - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(res, g, causal, scale, block_q, block_k, hq, hkv,
               dlse_row=None):
    q, k, v, o, lse, kv_len, q_offset = res
    do = g
    bh, sq, d = q.shape
    skv = k.shape[1]
    rep = hq // hkv
    bq = min(block_q, sq)
    bk = min(block_k, skv)
    nq = _blocks(sq, bq)

    delta_row = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse_row is not None:
        # lse-output cotangent: d s_ij += p_ij * dlse_i, and the kernels
        # compute ds = p * (dp - delta), so fold it into delta. Rows whose
        # lse is -inf (fully masked) contribute nothing (p = 0 everywhere).
        delta_row = delta_row - dlse_row.astype(jnp.float32)
    delta = jnp.broadcast_to(delta_row[:, None, :], (bh, 8, delta_row.shape[1]))

    def kv_row(bh_idx):
        return (bh_idx // hq) * hkv + (bh_idx % hq) // rep

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, scale=scale, block_q=bq, block_k=bk,
            hq=hq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nq, _blocks(skv, bk)),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, bk, d), lambda b, i, j, *_: (kv_row(b), j, 0)),
                pl.BlockSpec((1, bk, d), lambda b, i, j, *_: (kv_row(b), j, 0)),
                pl.BlockSpec((1, bq, d), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, 8, bq), lambda b, i, j, *_: (b, 0, i)),
                pl.BlockSpec((1, 8, bq), lambda b, i, j, *_: (b, 0, i)),
            ],
            out_specs=[pl.BlockSpec((1, bq, d), lambda b, i, j, *_: (b, i, 0))],
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, sq, d), q.dtype)],
    )(kv_len, q_offset, q, k, v, do, lse, delta)[0]

    # q-side rows for the dkv grid: bkv -> batch b = bkv // hkv, local kv
    # head = bkv % hkv; group member g = t // nq; q row index in [B*Hq).
    def q_row(bkv, t):
        return (bkv // hkv) * hq + (bkv % hkv) * rep + t // nq

    qspec = pl.BlockSpec((1, bq, d), lambda b, j, t, *_: (q_row(b, t), t % nq, 0))
    lspec = pl.BlockSpec((1, 8, bq), lambda b, j, t, *_: (q_row(b, t), 0, t % nq))

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, causal=causal, scale=scale, block_q=bq, block_k=bk,
            hkv=hkv, nq=nq,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k.shape[0], _blocks(skv, bk), rep * nq),
            in_specs=[
                qspec,
                pl.BlockSpec((1, bk, d), lambda b, j, t, *_: (b, j, 0)),
                pl.BlockSpec((1, bk, d), lambda b, j, t, *_: (b, j, 0)),
                qspec,
                lspec,
                lspec,
            ],
            out_specs=[
                pl.BlockSpec((1, bk, d), lambda b, j, t, *_: (b, j, 0)),
                pl.BlockSpec((1, bk, d), lambda b, j, t, *_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((k.shape[0], skv, d), k.dtype),
            jax.ShapeDtypeStruct((k.shape[0], skv, d), v.dtype),
        ],
    )(kv_len, q_offset, q, k, v, do, lse, delta)
    return dq, dk, dv


# ----------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash_core(q, k, v, kv_len, q_offset, causal, scale, block_q, block_k, hq, hkv):
    o, _ = _flash_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q, block_k, hq, hkv)
    return o


def _flash_core_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q, block_k, hq, hkv):
    o, lse = _flash_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q, block_k, hq, hkv)
    return o, (q, k, v, o, lse, kv_len, q_offset)


def _flash_core_bwd(causal, scale, block_q, block_k, hq, hkv, res, g):
    dq, dk, dv = _flash_bwd(res, g, causal, scale, block_q, block_k, hq, hkv)
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10)
)
def _flash_core_lse(q, k, v, kv_len, q_offset, causal, scale, block_q,
                    block_k, hq, hkv):
    """Like _flash_core but also returns the per-row log-sum-exp
    [bh, 8, sq] (row 0 carries data). Differentiable in q/k/v INCLUDING
    the lse output — the dlse cotangent folds into the bwd kernels' delta
    term (d s_ij += p_ij * dlse_i, and ds = p*(dp - delta), so
    delta' = delta - dlse). Fully-masked rows have lse = -inf; their
    cotangent must be zero (softmax partials there are 0/0)."""
    return _flash_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q,
                      block_k, hq, hkv)


def _flash_core_lse_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q,
                        block_k, hq, hkv):
    o, lse = _flash_fwd(q, k, v, kv_len, q_offset, causal, scale, block_q,
                        block_k, hq, hkv)
    return (o, lse), (q, k, v, o, lse, kv_len, q_offset)


def _flash_core_lse_bwd(causal, scale, block_q, block_k, hq, hkv, res, g):
    do, dlse = g
    q, k, v, o, lse, kv_len, q_offset = res
    dq, dk, dv = _flash_bwd(
        (q, k, v, o, lse, kv_len, q_offset), do, causal, scale, block_q,
        block_k, hq, hkv, dlse_row=dlse[:, 0, :],
    )
    return dq, dk, dv, None, None


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def _prep_flash_call(q, k, v, kv_len, q_offset, scale, block_q, block_k):
    """Shared wrapper prologue: validation, kv_len/q_offset normalization,
    block sizing, [B*H, S, D] packing. Returns the positional operand
    tuple for _flash_core / _flash_core_lse plus (b, sq, hq, d)."""
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    skv = k.shape[1]
    if hq % hkv != 0:
        raise ValueError(f"q heads ({hq}) must be a multiple of kv heads ({hkv})")
    scale = scale if scale is not None else d**-0.5

    if kv_len is None:
        kv_len = jnp.full((b,), skv, jnp.int32)
    kv_len = kv_len.astype(jnp.int32)
    q_offset = jnp.asarray(q_offset, jnp.int32)
    if q_offset.ndim == 0:
        q_offset = jnp.full((b,), q_offset, jnp.int32)

    # pad sequence dims to block multiples (k padding is masked via kv_len;
    # padded q rows are sliced away by the caller)
    bq_eff = min(block_q, max(sq, 8))
    bk_eff = min(block_k, max(skv, 8))
    sq_pad = _blocks(sq, bq_eff) * bq_eff
    skv_pad = _blocks(skv, bk_eff) * bk_eff

    def to_bh(x, target_len):
        h = x.shape[2]
        x = x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)
        if x.shape[1] < target_len:
            x = jnp.pad(x, ((0, 0), (0, target_len - x.shape[1]), (0, 0)))
        return x

    operands = (to_bh(q, sq_pad), to_bh(k, skv_pad), to_bh(v, skv_pad),
                kv_len, q_offset)
    return operands, float(scale), bq_eff, bk_eff, hkv, (b, sq, hq, d)


def flash_mha(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,  # [B] valid kv lengths
    q_offset: int | jnp.ndarray = 0,  # absolute q-row-0 position: scalar or [B]
    causal: bool = False,
    scale: Optional[float] = None,
    bias: None = None,  # API compat; arbitrary bias unsupported
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention with native GQA. Returns [B, Sq, Hq, D]."""
    if bias is not None:
        raise NotImplementedError(
            "flash backend supports causal+kv_len masking, not arbitrary bias"
        )
    operands, scale, bq_eff, bk_eff, hkv, (b, sq, hq, d) = _prep_flash_call(
        q, k, v, kv_len, q_offset, scale, block_q, block_k
    )
    o = _flash_core(*operands, causal, scale, bq_eff, bk_eff, hq, hkv)
    return o[:, :sq].reshape(b, hq, sq, d).transpose(0, 2, 1, 3)


def flash_mha_with_lse(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,  # [B] valid kv lengths
    q_offset: int | jnp.ndarray = 0,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """flash_mha that also returns the log-sum-exp of the (scaled, masked)
    attention logits per query row: (out [B, Sq, Hq, D], lse [B, Hq, Sq],
    fp32; -inf for fully-masked rows). Differentiable in q/k/v through
    BOTH outputs — the building block for ring attention's online-softmax
    merge across sequence shards (parallel/ring_attention.py)."""
    operands, scale, bq_eff, bk_eff, hkv, (b, sq, hq, d) = _prep_flash_call(
        q, k, v, kv_len, q_offset, scale, block_q, block_k
    )
    o, lse = _flash_core_lse(*operands, causal, scale, bq_eff, bk_eff, hq, hkv)
    out = o[:, :sq].reshape(b, hq, sq, d).transpose(0, 2, 1, 3)
    lse_rows = lse[:, 0, :sq].reshape(b, hq, sq)
    return out, lse_rows
