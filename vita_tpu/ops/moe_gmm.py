"""Grouped matmul (megablox-style) for training-scale MoE dispatch.

`gmm(x, w, group_ids)` multiplies row-tile i of `x` (tokens sorted by
expert, each expert's rows padded to a TILE_M multiple) by
`w[group_ids[i]]` — a tiled MXU matmul whose weight BlockSpec index is
scalar-prefetched per row tile. This is SURVEY hard part #1's grouped-
matmul form: the sorted layout costs O(Tk*D) scatter/gather once, then all
three expert matmuls run as plain dense tiles with zero dispatch einsums
and zero capacity padding beyond tile rounding (<TILE_M rows per expert).

Gradients are exact via custom_vjp:
  y = x @ w[g]          dx = dy @ w[g]^T (transpose_rhs kernel, no copy)
                        dw[e] = sum_{rows of e} x^T dy (wgrad kernel — m is
                        the fastest grid dim, so each (e,k,n) output block
                        is visited in one consecutive run and accumulates
                        in VMEM)

Reference role: the training half of vLLM's FusedMoE
(web_demo/vllm_tools/vllm_file/mixtral.py:375-423); the decode half is
ops/moe_decode.py. Off-TPU an einsum fallback twin runs (tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# TILE_M sets the weight-stream arithmetic intensity: each row tile re-reads
# its group's full [K, N] weight, so intensity = TILE_M flops/byte on the
# weight stream. v5e balance point is ~240 (197 bf16 TFLOP/s / 819 GB/s);
# 512 keeps the kernel MXU-bound (128 measured bandwidth-bound on chip).
TILE_M = 512
TILE_N = 512
TILE_K = 2048

# The big-R schedule above amortizes per-tile weight re-reads against
# compute; below this R the kernel is weight-bandwidth-bound and switches
# to the "weights-once" schedule: grid (n, m) with m FASTEST and the full
# K contraction in one step, so consecutive row tiles of the same expert
# map to the identical weight block and Pallas elides the re-fetch —
# total weight traffic = one pass over w per matmul, the HBM floor.
# Small tiles (SMALL_TILE_M) are then free: padding FLOPs shrink 4x with
# no bandwidth penalty. Crossover measured on v5e (tools/bench_prefill_moe).
SMALL_R_MAX = 16384
SMALL_TILE_M = 128
# weight block [K, tn] budget 4 MB bf16: the scoped VMEM limit is 16 MB
# and the pipeline double-buffers every operand block (w + x + out)
SMALL_W_BLOCK_ELEMS = 2 * 1024 * 1024


def _use_xla_fallback() -> bool:
    from jax._src import config as _jax_config

    interpret_forced = (
        _jax_config.pallas_tpu_interpret_mode_context_manager.value is not None
    )
    return jax.default_backend() != "tpu" and not interpret_forced


def _tiles(dim: int, tile: int) -> Tuple[int, int]:
    t = min(tile, dim)
    if dim % t:
        raise ValueError(f"dim {dim} not divisible by tile {t}")
    return t, dim // t


def _gmm_kernel(gids_ref, x_ref, w_ref, out_ref, acc_ref, *, trans):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if trans:  # w block [1, TN, TK]: contract x's K with w's K
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:  # w block [1, TK, TN]
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk - 1)
    def _finish():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _small_gmm_kernel(gids_ref, x_ref, w_ref, out_ref, *, trans):
    del gids_ref
    if trans:  # w block [1, TN, K]: contract x's K with w's K
        out_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
    else:  # w block [1, K, TN]
        out_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _gmm_small(x, w, gids, transpose_rhs, tile_m):
    """Weights-once schedule for bandwidth-bound (small-R) grouped matmul."""
    r, k_dim = x.shape
    e, n_dim = w.shape[0], (w.shape[1] if transpose_rhs else w.shape[2])
    tm, nm = _tiles(r, tile_m)
    # largest lane-aligned (x128) tn dividing N with a [K, tn] weight
    # block within the VMEM budget
    tn = next(
        (t for t in range(n_dim - n_dim % 128, 127, -128)
         if n_dim % t == 0 and k_dim * t <= SMALL_W_BLOCK_ELEMS),
        n_dim,  # tiny dims (tests): single block
    )
    nn = n_dim // tn
    if transpose_rhs:
        w_spec = pl.BlockSpec((1, tn, k_dim), lambda n, m, g: (g[m], n, 0))
    else:
        w_spec = pl.BlockSpec((1, k_dim, tn), lambda n, m, g: (g[m], 0, n))

    return pl.pallas_call(
        functools.partial(_small_gmm_kernel, trans=transpose_rhs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # m fastest: w block index (g[m], n) repeats across consecutive
            # row tiles of one expert -> fetch elided; weights stream once
            grid=(nn, nm),
            in_specs=[
                pl.BlockSpec((tm, k_dim), lambda n, m, g: (m, 0)),
                w_spec,
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda n, m, g: (m, n)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, n_dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k_dim * n_dim,
            bytes_accessed=(nn * r * k_dim + e * k_dim * n_dim + r * n_dim)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(gids.astype(jnp.int32), x, w)


def _gmm_raw(x, w, gids, transpose_rhs, tile_m=TILE_M):
    r, k_dim = x.shape
    if transpose_rhs:
        e, n_dim, k_w = w.shape
    else:
        e, k_w, n_dim = w.shape
    if k_w != k_dim:
        raise ValueError(f"contraction mismatch: x K={k_dim}, w K={k_w}")

    if _use_xla_fallback():
        row_g = jnp.repeat(gids, tile_m)[:r] if r >= tile_m else (
            jnp.broadcast_to(gids[:1], (r,))
        )
        wr = jnp.take(w, row_g, axis=0)
        eq = "rk,rnk->rn" if transpose_rhs else "rk,rkn->rn"
        return jnp.einsum(eq, x, wr).astype(x.dtype)

    if r <= SMALL_R_MAX or tile_m <= SMALL_TILE_M:
        return _gmm_small(x, w, gids, transpose_rhs, tile_m)

    tm, nm = _tiles(r, tile_m)
    tn, nn = _tiles(n_dim, TILE_N)
    tk, nk = _tiles(k_dim, TILE_K)
    if transpose_rhs:
        w_spec = pl.BlockSpec((1, tn, tk), lambda m, n, k, g: (g[m], n, k))
    else:
        w_spec = pl.BlockSpec((1, tk, tn), lambda m, n, k, g: (g[m], k, n))

    return pl.pallas_call(
        functools.partial(_gmm_kernel, trans=transpose_rhs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nm, nn, nk),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda m, n, k, g: (m, k)),
                w_spec,
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda m, n, k, g: (m, n)),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((r, n_dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k_dim * n_dim,
            bytes_accessed=(r * k_dim + e * k_dim * n_dim + r * n_dim)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(gids.astype(jnp.int32), x, w)


def _wgrad_kernel(gids_ref, a_ref, b_ref, out_ref):
    m = pl.program_id(2)
    first = jnp.logical_or(
        m == 0, gids_ref[jnp.maximum(m - 1, 0)] != gids_ref[m]
    )

    @pl.when(first)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0] += jax.lax.dot_general(
        a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _gmm_wgrad(a, b, gids, n_groups, tile_m=TILE_M):
    """dw [E, K, N] = per-group a^T @ b over the sorted row tiles."""
    r, k_dim = a.shape
    _, n_dim = b.shape

    if _use_xla_fallback():
        row_g = jnp.repeat(gids, tile_m)[:r] if r >= tile_m else (
            jnp.broadcast_to(gids[:1], (r,))
        )
        sel = jax.nn.one_hot(row_g, n_groups, dtype=jnp.float32)  # [R, E]
        return jnp.einsum(
            "re,rk,rn->ekn", sel, a.astype(jnp.float32), b.astype(jnp.float32)
        ).astype(a.dtype)

    tm, nm = _tiles(r, tile_m)
    tn, nn = _tiles(n_dim, TILE_N)
    tk, nk = _tiles(k_dim, TILE_K)

    out = pl.pallas_call(
        _wgrad_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nk, nn, nm),  # m fastest: sorted gids -> each (g,k,n)
            # output block is one consecutive run, accumulated in VMEM
            in_specs=[
                pl.BlockSpec((tm, tk), lambda k, n, m, g: (m, k)),
                pl.BlockSpec((tm, tn), lambda k, n, m, g: (m, n)),
            ],
            out_specs=pl.BlockSpec((1, tk, tn), lambda k, n, m, g: (g[m], k, n)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_groups, k_dim, n_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k_dim * n_dim,
            bytes_accessed=(r * k_dim + r * n_dim) * a.dtype.itemsize
            + n_groups * k_dim * n_dim * 4,
            transcendentals=0,
        ),
    )(gids.astype(jnp.int32), a, b)
    return out.astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gmm(x, w, gids, transpose_rhs=False, tile_m=TILE_M):
    """Grouped matmul: row tile i of ``x`` [R, K] times ``w[gids[i]]``.

    ``w`` is [E, K, N] (or [E, N, K] with ``transpose_rhs``); ``gids`` is
    [R / tile_m] int32, NON-DECREASING (rows sorted by group). Returns
    [R, N]. Differentiable in x and w (custom VJP; dgrad reuses the kernel
    with the transpose flag flipped, wgrad is a consecutive-run
    accumulation kernel). R <= SMALL_R_MAX takes the weights-once schedule
    (bandwidth-bound prefill sizes); larger R the k-blocked one."""
    return _gmm_raw(x, w, gids, transpose_rhs, tile_m)


def _gmm_fwd(x, w, gids, transpose_rhs, tile_m):
    return _gmm_raw(x, w, gids, transpose_rhs, tile_m), (x, w, gids)


def _gmm_bwd(transpose_rhs, tile_m, res, dy):
    x, w, gids = res
    e = w.shape[0]
    dx = _gmm_raw(dy, w, gids, not transpose_rhs, tile_m)
    if transpose_rhs:  # y = x @ w^T -> dw[e] = dy^T x, laid out [E, N, K]
        dw = _gmm_wgrad(dy, x, gids, e, tile_m)
    else:  # dw[e] = x^T dy, [E, K, N]
        dw = _gmm_wgrad(x, dy, gids, e, tile_m)
    return dx.astype(x.dtype), dw.astype(w.dtype), None


gmm.defvjp(_gmm_fwd, _gmm_bwd)


def as_uint_view(w: jnp.ndarray) -> jnp.ndarray:
    """Bitcast a float weight array to a same-width uint view (free).

    Integer primals take float0 tangents in jax, so a custom_vjp can
    accept the uint view as a regular argument and legitimately return no
    cotangent for it — the mechanism behind ``gmm_scan``."""
    target = {2: jnp.uint16, 4: jnp.uint32}[w.dtype.itemsize]
    return jax.lax.bitcast_convert_type(w, target)


def _from_uint(u: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(u, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gmm_scan(x, w, flat_u, gids, group_off, transpose_rhs=False,
             tile_m=TILE_M, n_groups=None, w_dtype=None):
    """Grouped matmul reading a FLAT stacked weight array (scan-safe).

    Inside ``lax.scan`` over stacked layers, feeding the scan-sliced
    per-layer expert weights to a Pallas kernel materializes the slice
    (~2.8 GB/layer at production shape) as the custom-call operand. This
    variant instead computes against ``flat_u`` — the whole stacked array
    reshaped [L*E, K, N] and bitcast to uint (``as_uint_view``), passed
    from OUTSIDE the scan — with per-tile group ids offset by
    ``group_off`` (= layer*E, a traced scalar). ``w`` is the scan-sliced
    [E, K, N] layer weight: its VALUE is never read (the slice is dead
    code and XLA removes the copy), but gradients flow to it, so the scan
    accumulates stacked weight grads the normal, efficient way. Same
    contract as ``gmm`` otherwise. ``n_groups``/``w_dtype`` are static
    (E and the weight dtype) so neither fwd nor bwd ever touches ``w``'s
    value — keeping it fully dead code."""
    return _gmm_raw(
        x, _from_uint(flat_u, w_dtype), gids + group_off, transpose_rhs,
        tile_m,
    )


def _gmm_scan_fwd(x, w, flat_u, gids, group_off, transpose_rhs, tile_m,
                  n_groups, w_dtype):
    del w
    y = _gmm_raw(
        x, _from_uint(flat_u, w_dtype), gids + group_off, transpose_rhs,
        tile_m,
    )
    return y, (x, flat_u, gids, group_off)


def _gmm_scan_bwd(transpose_rhs, tile_m, n_groups, w_dtype, res, dy):
    x, flat_u, gids, group_off = res
    flat = _from_uint(flat_u, w_dtype)
    dx = _gmm_raw(dy, flat, gids + group_off, not transpose_rhs, tile_m)
    if transpose_rhs:
        dw = _gmm_wgrad(dy, x, gids, n_groups, tile_m)
    else:
        dw = _gmm_wgrad(x, dy, gids, n_groups, tile_m)
    return dx.astype(x.dtype), dw.astype(w_dtype), None, None, None


gmm_scan.defvjp(_gmm_scan_fwd, _gmm_scan_bwd)


def sorted_layout(topk_idx: jnp.ndarray, n_experts: int, tile_m: int = TILE_M):
    """Static-shape sorted+padded row layout for the gmm kernels.

    Returns (dest [T*k] row index of each (token, slot) pair in the padded
    buffer, tok_s [T*k] source token of each sorted pair, order [T*k],
    gids [R/tile_m], R). Each expert's rows are padded to a tile_m
    multiple so every row tile belongs to exactly one expert; R is the
    static worst case ceil(Tk/tile_m)*tile_m + E*tile_m. No token is ever
    dropped (dropless, unlike capacity/sort modes)."""
    t, k = topk_idx.shape
    tk_total = t * k
    e = n_experts
    r = -(-tk_total // tile_m) * tile_m + e * tile_m

    fe = topk_idx.reshape(-1)
    order = jnp.argsort(fe, stable=True)
    fe_s = fe[order]
    tok_s = order // k
    counts = jnp.bincount(fe, length=e)
    # every expert gets >= one (all-zero) tile, so the wgrad kernel visits
    # every (e, k, n) output block — an unvisited pallas output block is
    # undefined memory, and an empty expert's grad must be exactly zero
    pad_counts = jnp.maximum(-(-counts // tile_m), 1) * tile_m
    starts_pad = jnp.cumsum(pad_counts) - pad_counts
    starts_raw = jnp.cumsum(counts) - counts
    pos = jnp.arange(tk_total) - starts_raw[fe_s]
    dest = starts_pad[fe_s] + pos

    tile_starts = jnp.arange(r // tile_m) * tile_m
    ends_pad = jnp.cumsum(pad_counts)
    gids = jnp.searchsorted(ends_pad, tile_starts, side="right")
    gids = jnp.clip(gids, 0, e - 1).astype(jnp.int32)
    return dest, tok_s, order, gids, r


def moe_ffn_gmm(params, x, topk_w, topk_idx, flat=None, group_off=None):
    """Dropless grouped-matmul expert FFN: out [T, D].

    params: {'w_gate' [E,D,F], 'w_up', 'w_down' [E,F,D]}. Exact — matches
    dense-mode combination (no capacity dropping). Prefill-sized T uses
    small row tiles (the weights-once schedule makes padding FLOPs the
    only cost, so shrink it); training-sized T amortizes big tiles.

    ``flat``/``group_off``: scan-safe variant — ``flat`` holds uint views
    (``as_uint_view``) of the WHOLE stacked expert arrays reshaped
    [L*E, ...], ``group_off`` = layer*E; see ``gmm_scan``."""
    t, d = x.shape
    k = topk_idx.shape[1]
    e = params["w_gate"].shape[0]
    tile_m = SMALL_TILE_M if t * k <= SMALL_R_MAX else TILE_M
    dest, tok_s, order, gids, r = sorted_layout(topk_idx, e, tile_m)

    if flat is not None:
        off = jnp.asarray(group_off, jnp.int32)
        mm = lambda x, name: gmm_scan(
            x, params[name], flat[name], gids, off, tile_m=tile_m,
            n_groups=e, w_dtype=params[name].dtype,
        )
    else:
        mm = lambda x, name: gmm(x, params[name], gids, tile_m=tile_m)

    xs = jnp.zeros((r, d), x.dtype).at[dest].set(x[tok_s])
    g = mm(xs, "w_gate")
    u = mm(xs, "w_up")
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(x.dtype)
    ys = mm(h, "w_down")

    y = ys[dest]  # [T*k, D] back in sorted pair order
    w_s = topk_w.reshape(-1)[order].astype(x.dtype)
    return jnp.zeros((t, d), x.dtype).at[tok_s].add(y * w_s[:, None])
