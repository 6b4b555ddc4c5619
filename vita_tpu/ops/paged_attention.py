"""Pallas paged-attention decode kernel + block-pool KV cache helpers.

TPU-native replacement for vLLM's paged attention + block allocator
(reference serving path: web_demo/vllm_tools/vllm_file/mixtral.py:484-489,
which delegates to vLLM's CUDA paged_attention kernels). Design:

- KV lives in a shared page pool ``[L, Hkv, n_pages, page_size, d]``; each
  request owns a host-allocated list of pages (``PagePool``), so HBM is
  sized by *actual* context lengths, not ``n_slots * max_len``.
- The decode kernel runs one program per (slot, kv_head). Pages stay in
  HBM (``memory_space=ANY``); the kernel walks the slot's page table with
  manually double-buffered async DMAs, so per-step KV traffic is
  proportional to the slot's true length — unlike a dense masked attention
  over a [B, max_len] cache, which streams the whole allocation. GQA is
  native: each program loads the kv head once and attends all ``group``
  q heads of that head against it.
- Page writes (decode rows / prefill installs) are XLA scatters outside
  the kernel — tiny, and in-place under donation.

Decode-only (q length 1 per slot); prefill uses the flash kernel over a
linear scratch then installs pages via ``install_prefill_pages``.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_PAGE_SIZE = 64


def init_page_pool(
    n_layers: int,
    n_kv_heads: int,
    n_pages: int,
    page_size: int,
    head_dim: int,
    dtype=jnp.float32,
    quantized: bool = False,
):
    """Device-side page pool: {'k_pages','v_pages'} [L, Hkv, P, page, d].

    ``quantized=True`` stores int8 pages plus per-row/per-head f32 scales
    ('k_scale'/'v_scale' [L, Hkv, P, 1, page]) — the KV-capacity lever:
    ~1.94x more tokens per byte of pool HBM (beyond-reference; vLLM-class
    fp8/int8 kv_cache_dtype)."""
    shape = (n_layers, n_kv_heads, n_pages, page_size, head_dim)
    if not quantized:
        return {"k_pages": jnp.zeros(shape, dtype),
                "v_pages": jnp.zeros(shape, dtype)}
    sshape = (n_layers, n_kv_heads, n_pages, 1, page_size)
    return {
        "k_pages": jnp.zeros(shape, jnp.int8),
        "v_pages": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(sshape, jnp.float32),
        "v_scale": jnp.zeros(sshape, jnp.float32),
    }


class PagePool:
    """Host-side free-list allocator over the device page pool."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self._free: List[int] = list(range(n_pages))

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """Allocate n pages, or None if the pool can't satisfy the request."""
        if n > len(self._free):
            return None
        got, self._free = self._free[:n], self._free[n:]
        return got

    def release(self, pages: Sequence[int]) -> None:
        self._free.extend(int(p) for p in pages)


def pages_needed(tokens: int, page_size: int) -> int:
    return -(-tokens // page_size)


# ----------------------------------------------------------------------
# kernel
# ----------------------------------------------------------------------
def _paged_attn_kernel(
    layer_ref,  # SMEM [1] layer index
    lengths_ref,  # SMEM [B] valid kv rows per slot (0 => inactive)
    tables_ref,  # SMEM [B, max_pages] page ids per slot
    q_ref,  # VMEM [1, 1, g_pad, d] — this kv head's q group (8-padded rows)
    kp_hbm,  # ANY [L, Hkv, P, page, d]
    vp_hbm,  # ANY
    o_ref,  # VMEM [1, 1, g_pad, d]
    kbuf,  # VMEM [2, page, d] double buffer
    vbuf,  # VMEM [2, page, d]
    sems,  # DMA sems [2, 2]
    *,
    page_size: int,
    scale: float,
    group: int,
):
    slot = pl.program_id(0)
    kvh = pl.program_id(1)
    layer = layer_ref[0]
    length = lengths_ref[slot]
    # clamp to the table width: a speculative chunk can advance a slot's
    # length past its allocation, and reading tables_ref[slot, i] beyond
    # the row would be an out-of-bounds SMEM access
    n_pages = jnp.minimum(
        (length + page_size - 1) // page_size, tables_ref.shape[1]
    )

    n_pool = kp_hbm.shape[2]

    def k_copy(i, b):
        # clamp: table rows may carry an OOB sentinel (= pool size) in
        # unused entries; overshoot steps read a harmless page instead of
        # DMA-ing out of bounds (their outputs are discarded host-side)
        pid = jnp.minimum(tables_ref[slot, i], n_pool - 1)
        return pltpu.make_async_copy(
            kp_hbm.at[layer, kvh, pid], kbuf.at[b], sems.at[0, b]
        )

    def v_copy(i, b):
        pid = jnp.minimum(tables_ref[slot, i], n_pool - 1)
        return pltpu.make_async_copy(
            vp_hbm.at[layer, kvh, pid], vbuf.at[b], sems.at[1, b]
        )

    o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(n_pages > 0)
    def _run():
        k_copy(0, 0).start()
        v_copy(0, 0).start()
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [g_pad, d]

        def body(i, carry):
            m, l, acc = carry
            b = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_pages)
            def _prefetch():
                nb = jax.lax.rem(i + 1, 2)
                k_copy(i + 1, nb).start()
                v_copy(i + 1, nb).start()

            k_copy(i, b).wait()
            k = kbuf[pl.ds(b, 1)][0]  # [page, d]
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [group, page]
            k_pos = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (group, page_size), 1
            )
            s = jnp.where(k_pos < length, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            v_copy(i, b).wait()
            v = vbuf[pl.ds(b, 1)][0]
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        d = q_ref.shape[-1]
        m0 = jnp.full((group, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((group, 1), jnp.float32)
        acc0 = jnp.zeros((group, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)


def _paged_attention_xla(q, k_pages, v_pages, tables, lengths, layer, scale,
                         k_scale=None, v_scale=None):
    """Reference/fallback path (non-TPU backends): gather the slot's pages
    and run dense masked attention. Same math as the kernel; used for CPU
    tests and development where the Mosaic DMA interpreter is unavailable."""
    b, hq, d = q.shape
    _, hkv, _, page_size, _ = k_pages.shape
    group = hq // hkv
    kl = jax.lax.dynamic_index_in_dim(k_pages, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_pages, layer, 0, keepdims=False)
    # pool ids may be OOB sentinels; clamp (rows are masked by lengths)
    t = jnp.clip(tables, 0, kl.shape[1] - 1)
    k = kl[:, t]  # [Hkv, B, maxp, page, d]
    v = vl[:, t]
    s_len = t.shape[1] * page_size
    k = k.reshape(hkv, b, s_len, d)
    v = v.reshape(hkv, b, s_len, d)
    if k_scale is not None:  # int8 pool: dequantize per row/head
        ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
        ks = ks[:, t].reshape(hkv, b, s_len)  # [Hkv,B,maxp,1,page] gathered
        vs = vs[:, t].reshape(hkv, b, s_len)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    qg = q.reshape(b, hkv, group, d).astype(jnp.float32) * scale
    s = jnp.einsum("bhgd,hbsd->bhgs", qg, k.astype(jnp.float32))
    mask = jnp.arange(s_len)[None, :] < lengths[:, None]  # [B, S]
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhgs,hbsd->bhgd", p, v.astype(jnp.float32))
    out = out / jnp.where(l == 0.0, 1.0, l)
    out = jnp.where(lengths[:, None, None, None] > 0, out, 0.0)
    return out.reshape(b, hq, d).astype(q.dtype)


def paged_attention(
    q: jnp.ndarray,  # [B, Hq, d] — one decode token per slot
    k_pages: jnp.ndarray,  # [L, Hkv, P, page, d] (bf16/f32 or int8)
    v_pages: jnp.ndarray,
    tables: jnp.ndarray,  # [B, max_pages] int32
    lengths: jnp.ndarray,  # [B] int32 valid kv rows (incl. current token)
    layer: jnp.ndarray,  # [] or [1] int32
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [L, Hkv, P, 1, page] f32 (int8 pool)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Paged decode attention. Returns [B, Hq, d]."""
    b, hq, d = q.shape
    n_layers, hkv, n_pool, page_size, _ = k_pages.shape
    if hq % hkv:
        raise ValueError(f"q heads ({hq}) not a multiple of kv heads ({hkv})")
    group = hq // hkv
    scale = scale if scale is not None else d**-0.5
    # Off-TPU: use the XLA fallback unless the caller forced the Mosaic
    # interpreter (kernel unit tests) — the interpreter's shared-memory
    # simulation is not reliable under the engine's threaded usage.
    from jax._src import config as _jax_config

    interpret_forced = (
        _jax_config.pallas_tpu_interpret_mode_context_manager.value is not None
    )
    if (
        (jax.default_backend() != "tpu" and not interpret_forced)
        or d % 128
        # int8 pools additionally DMA (1, page) scale rows, whose LAST dim
        # must be lane-aligned — the Pallas int8 path needs page_size=128
        # (DEPLOY.md); other page sizes take the XLA twin
        or (k_scale is not None and page_size % 128)
    ):
        # the Pallas kernel DMAs [page, d] slices which Mosaic requires
        # lane-aligned (d % 128 == 0); small test/demo head dims take the
        # XLA twin on real TPUs too
        return _paged_attention_xla(
            q, k_pages, v_pages, tables.astype(jnp.int32),
            lengths.astype(jnp.int32), jnp.asarray(layer, jnp.int32).reshape(()),
            float(scale), k_scale, v_scale,
        )
    layer = jnp.asarray(layer, jnp.int32).reshape(1)

    # Mosaic needs the last-two block dims (sublane, lane) divisible by
    # (8, 128) or full-size; pad each kv head's q group to 8 rows.
    g_pad = max(8, -(-group // 8) * 8)
    qg = q.reshape(b, hkv, group, d)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    if k_scale is not None:
        kernel = functools.partial(
            _paged_attn_kernel_q, page_size=page_size, scale=float(scale),
            group=g_pad,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(b, hkv),
                in_specs=[
                    pl.BlockSpec((1, 1, g_pad, d), lambda s, h, *_: (s, h, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, g_pad, d), lambda s, h, *_: (s, h, 0, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, page_size, d), jnp.int8),
                    pltpu.VMEM((2, page_size, d), jnp.int8),
                    pltpu.VMEM((2, 1, page_size), jnp.float32),
                    pltpu.VMEM((2, 1, page_size), jnp.float32),
                    pltpu.SemaphoreType.DMA((4, 2)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d), q.dtype),
        )(layer, lengths.astype(jnp.int32), tables.astype(jnp.int32), qg,
          k_pages, v_pages, k_scale, v_scale)
        return out[:, :, :group].reshape(b, hq, d)

    kernel = functools.partial(
        _paged_attn_kernel, page_size=page_size, scale=float(scale), group=g_pad
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((1, 1, g_pad, d), lambda s, h, *_: (s, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, g_pad, d), lambda s, h, *_: (s, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, page_size, d), k_pages.dtype),
                pltpu.VMEM((2, page_size, d), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g_pad, d), q.dtype),
    )(layer, lengths.astype(jnp.int32), tables.astype(jnp.int32), qg, k_pages, v_pages)
    return out[:, :, :group].reshape(b, hq, d)


def _paged_attn_kernel_q(
    layer_ref,  # SMEM [1] layer index
    lengths_ref,  # SMEM [B]
    tables_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [1, 1, g_pad, d]
    kp_hbm,  # ANY [L, Hkv, P, page, d] int8
    vp_hbm,  # ANY int8
    ks_hbm,  # ANY [L, Hkv, P, 1, page] f32
    vs_hbm,  # ANY
    o_ref,  # VMEM [1, 1, g_pad, d]
    kbuf,  # VMEM [2, page, d] int8
    vbuf,
    ksbuf,  # VMEM [2, 1, page] f32
    vsbuf,
    sems,  # DMA sems [4, 2]
    *,
    page_size: int,
    scale: float,
    group: int,
):
    """int8-KV twin of _paged_attn_kernel: pages dequantize in VMEM via
    per-row scales folded into the score/probability matrices (k scales
    scale s columns; v scales fold into p before the pv matmul), so the
    dequantized pages are never materialized."""
    slot = pl.program_id(0)
    kvh = pl.program_id(1)
    layer = layer_ref[0]
    length = lengths_ref[slot]
    n_pages = jnp.minimum(
        (length + page_size - 1) // page_size, tables_ref.shape[1]
    )
    n_pool = kp_hbm.shape[2]

    def copy(src, buf, i, b, sem):
        pid = jnp.minimum(tables_ref[slot, i], n_pool - 1)
        return pltpu.make_async_copy(
            src.at[layer, kvh, pid], buf.at[b], sems.at[sem, b]
        )

    o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(n_pages > 0)
    def _run():
        for sem, (src, buf) in enumerate(
            ((kp_hbm, kbuf), (vp_hbm, vbuf), (ks_hbm, ksbuf), (vs_hbm, vsbuf))
        ):
            copy(src, buf, 0, 0, sem).start()
        q = q_ref[0, 0].astype(jnp.float32) * scale  # [g_pad, d]

        def body(i, carry):
            m, l, acc = carry
            b = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_pages)
            def _prefetch():
                nb = jax.lax.rem(i + 1, 2)
                for sem, (src, buf) in enumerate(
                    ((kp_hbm, kbuf), (vp_hbm, vbuf), (ks_hbm, ksbuf),
                     (vs_hbm, vsbuf))
                ):
                    copy(src, buf, i + 1, nb, sem).start()

            copy(kp_hbm, kbuf, i, b, 0).wait()
            copy(ks_hbm, ksbuf, i, b, 2).wait()
            k = kbuf[pl.ds(b, 1)][0]  # [page, d] int8
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [group, page]
            s = s * ksbuf[pl.ds(b, 1)][0]  # fold k dequant into the scores
            k_pos = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (group, page_size), 1
            )
            s = jnp.where(k_pos < length, s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            copy(vp_hbm, vbuf, i, b, 1).wait()
            copy(vs_hbm, vsbuf, i, b, 3).wait()
            v = vbuf[pl.ds(b, 1)][0]
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = p * vsbuf[pl.ds(b, 1)][0]  # fold v dequant into p
            acc = acc * alpha + jax.lax.dot_general(
                pv, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        d = q_ref.shape[-1]
        m0 = jnp.full((group, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((group, 1), jnp.float32)
        acc0 = jnp.zeros((group, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)


# ----------------------------------------------------------------------
# page writes (XLA scatters)
# ----------------------------------------------------------------------
def _quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(slot, head) symmetric int8: x [B, Hkv, d] -> (q, scale [B, Hkv])."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def write_kv_rows(
    k_pages: jnp.ndarray,  # [L, Hkv, P, page, d]
    v_pages: jnp.ndarray,
    layer: jnp.ndarray,  # int32 scalar
    tables: jnp.ndarray,  # [B, max_pages]
    pos: jnp.ndarray,  # [B] row to write (0-based)
    k_new: jnp.ndarray,  # [B, Hkv, d]
    v_new: jnp.ndarray,
    active: Optional[jnp.ndarray] = None,  # [B] bool; inactive rows dropped
    k_scale: Optional[jnp.ndarray] = None,  # [L, Hkv, P, 1, page] f32
    v_scale: Optional[jnp.ndarray] = None,
):
    """Write one kv row per slot into its page. Out-of-range (inactive)
    writes are dropped via scatter 'drop' mode. With scale arrays (int8
    pool) the rows are quantized per (slot, head) and the scales scattered
    alongside; returns 4 arrays then, 2 otherwise."""
    hkv = k_pages.shape[1]
    page_size = k_pages.shape[3]
    b = pos.shape[0]
    slot_page = pos // page_size  # [B] index into each slot's table
    page_id = jnp.take_along_axis(
        tables, jnp.clip(slot_page, 0, tables.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    row = pos % page_size
    # speculative overshoot PAST the table itself (a request whose
    # allocation fills the whole row leaves no OOB sentinel entries):
    # gather clamping would silently rewrite the slot's LAST page at wrong
    # rows — force-drop instead
    page_id = jnp.where(slot_page < tables.shape[1], page_id, k_pages.shape[2])
    if active is not None:
        page_id = jnp.where(active, page_id, k_pages.shape[2])  # OOB => drop
    # all-advanced adjacent indices of shape [B, Hkv] => update shape
    # [B, Hkv, d], matching k_new (avoids the mixed basic/advanced
    # broadcast-to-front rule)
    li = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (b, hkv))
    hi = jnp.broadcast_to(jnp.arange(hkv)[None, :], (b, hkv))
    pi = jnp.broadcast_to(page_id[:, None], (b, hkv))
    ri = jnp.broadcast_to(row[:, None], (b, hkv))
    if k_scale is not None:
        kq, ks = _quantize_rows(k_new)
        vq, vs = _quantize_rows(v_new)
        zi = jnp.zeros((b, hkv), jnp.int32)
        k_pages = k_pages.at[li, hi, pi, ri].set(kq, mode="drop")
        v_pages = v_pages.at[li, hi, pi, ri].set(vq, mode="drop")
        k_scale = k_scale.at[li, hi, pi, zi, ri].set(ks, mode="drop")
        v_scale = v_scale.at[li, hi, pi, zi, ri].set(vs, mode="drop")
        return k_pages, v_pages, k_scale, v_scale
    k_pages = k_pages.at[li, hi, pi, ri].set(k_new.astype(k_pages.dtype), mode="drop")
    v_pages = v_pages.at[li, hi, pi, ri].set(v_new.astype(v_pages.dtype), mode="drop")
    return k_pages, v_pages


def install_prefill_pages(
    k_pages: jnp.ndarray,  # [L, Hkv, P, page, d]
    v_pages: jnp.ndarray,
    k_lin: jnp.ndarray,  # [L, 1, S, Hkv, d] prefill scratch (S page-multiple)
    v_lin: jnp.ndarray,
    page_ids: jnp.ndarray,  # [S / page] int32 destination pages
    k_scale: Optional[jnp.ndarray] = None,  # [L, Hkv, P, 1, page] (int8 pool)
    v_scale: Optional[jnp.ndarray] = None,
):
    """Scatter a linear prefill cache into the page pool. Out-of-range page
    ids (>= pool size) are dropped — callers pad the id vector with OOB
    entries to keep its shape static. With scale arrays (int8 pool) the
    scratch rows are quantized per (row, head) on the way in; returns 4
    arrays then, 2 otherwise."""
    n_layers, _, s, hkv, d = k_lin.shape
    page_size = k_pages.shape[3]
    n_pp = s // page_size

    def to_pages(x):
        x = x[:, 0].transpose(0, 2, 1, 3)  # [L, Hkv, S, d]
        return x.reshape(n_layers, hkv, n_pp, page_size, d)

    if k_scale is not None:
        def qpages(x):
            p = to_pages(x).astype(jnp.float32)
            sc = jnp.maximum(jnp.max(jnp.abs(p), axis=-1) / 127.0, 1e-8)
            q = jnp.clip(jnp.round(p / sc[..., None]), -127, 127)
            return q.astype(jnp.int8), sc[:, :, :, None, :]  # [L,H,n,1,page]

        kq, ks = qpages(k_lin)
        vq, vs = qpages(v_lin)
        k_pages = k_pages.at[:, :, page_ids].set(kq, mode="drop")
        v_pages = v_pages.at[:, :, page_ids].set(vq, mode="drop")
        k_scale = k_scale.at[:, :, page_ids].set(ks, mode="drop")
        v_scale = v_scale.at[:, :, page_ids].set(vs, mode="drop")
        return k_pages, v_pages, k_scale, v_scale

    k_pages = k_pages.at[:, :, page_ids].set(
        to_pages(k_lin).astype(k_pages.dtype), mode="drop"
    )
    v_pages = v_pages.at[:, :, page_ids].set(
        to_pages(v_lin).astype(v_pages.dtype), mode="drop"
    )
    return k_pages, v_pages
