"""Ring attention: exact sequence-parallel attention over the 'seq' axis.

Capability the reference does NOT have (SURVEY §2.2 lists SP/CP/ring
attention as absent — its longest context is 9100 tokens on one GPU's
attention). Here the sequence dimension of activations is sharded over the
mesh ``seq`` axis; every non-attention op (norms, MoE, embeddings, loss)
is position-local so GSPMD shards it for free, and attention — the one op
that mixes positions — runs this ring schedule:

  - each device holds Q/K/V shards of s_loc = S/n consecutive positions;
  - n steps: compute flash attention of the local Q block against the
    currently-held KV block (with its global position offset), merge into
    the running output via online-softmax (log-sum-exp) weights, then
    rotate the KV block one device around the ring with `lax.ppermute`
    (ICI neighbour exchange — the canonical TPU pattern);
  - causal masking is exact: a KV block entirely in the future is skipped
    inside the flash kernel via its q_offset predicate.

Peak attention memory per device drops from O(S) to O(S/n) for
activations (the rotating KV ring still passes every block through each
device, one block at a time), enabling context lengths a single chip's
HBM cannot hold — ring + fsdp composes with the existing TP ('model')
head sharding in one shard_map island.

Gradients are native: the ring is a `lax.scan` over `ppermute` steps and
each step uses the differentiable flash-with-lse kernel
(ops/flash_attention.py::flash_mha_with_lse); the lse cotangent folds
into the flash backward's delta term. Off-TPU, an XLA twin computes the
per-block (out, lse) so the simulated-mesh CPU tests cover the exact
sharded program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vita_tpu.parallel.mesh import MODEL, SEQ

_BIG_NEG = -1e30


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _block_attn_lse(q, k, v, kv_len, q_offset, causal, scale):
    """(out [B,s,Hq,D], lse [B,Hq,s]) for one KV block.

    TPU: the Pallas flash kernel (native GQA, lse output). Off-TPU: XLA
    twin with identical masking semantics (q_pos = local + q_offset,
    k_pos local, k_pos < kv_len[, k_pos <= q_pos]) — lse of fully-masked
    rows is a large negative constant, matching the kernel's NEG_INF row
    convention closely enough for the merge (weights underflow to 0)."""
    if _is_tpu():
        from vita_tpu.ops.flash_attention import flash_mha_with_lse

        return flash_mha_with_lse(
            q, k, v, kv_len=kv_len, q_offset=q_offset, causal=causal,
            scale=scale,
        )

    b, s, hq, d = q.shape
    skv, hkv = k.shape[1], k.shape[2]
    rep = hq // hkv
    kr = jnp.repeat(k, rep, axis=2).astype(jnp.float32)
    vr = jnp.repeat(v, rep, axis=2).astype(jnp.float32)
    logits = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32), kr) * scale
    k_pos = jnp.arange(skv)[None, None, None, :]
    mask = k_pos < kv_len[:, None, None, None]
    if causal:
        q_pos = jnp.arange(s)[None, None, :, None] + q_offset[:, None, None, None]
        mask = mask & (k_pos <= q_pos)
    logits = jnp.where(mask, logits, _BIG_NEG)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [B, H, s]
    p = jnp.exp(logits - lse[..., None])
    out = jnp.einsum("bhst,bthd->bshd", p, vr)
    return out.astype(q.dtype), lse


def _ring_island(q, k, v, lengths, *, n, causal, scale, remat):
    """Runs inside shard_map: local shards [B, s_loc, h_loc, d]."""
    idx = jax.lax.axis_index(SEQ)
    s_loc = q.shape[1]
    perm = [(i, (i - 1) % n) for i in range(n)]

    def step(carry, t):
        k_blk, v_blk, o_acc, lse_acc = carry
        src = (idx + t) % n  # whose KV block we currently hold
        kv_off = src * s_loc
        kv_len_blk = jnp.clip(lengths - kv_off, 0, s_loc)
        # maps local k_pos to the global causal test; [B] per kernel API
        q_off = jnp.broadcast_to(
            (idx * s_loc - kv_off).astype(jnp.int32), (q.shape[0],)
        )
        o_t, lse_t = _block_attn_lse(
            q, k_blk, v_blk, kv_len_blk, q_off, causal, scale
        )
        # online-softmax merge; large-negative floor keeps exp/grad finite
        # when a row has seen no keys yet (or never does — padding rows)
        lse_t = jnp.maximum(lse_t, _BIG_NEG)
        new_lse = jnp.logaddexp(lse_acc, lse_t)
        w_old = jnp.exp(lse_acc - new_lse).transpose(0, 2, 1)[..., None]
        w_new = jnp.exp(lse_t - new_lse).transpose(0, 2, 1)[..., None]
        o_acc = o_acc * w_old + o_t.astype(jnp.float32) * w_new
        # skip the last rotation: its result is discarded, and the wasted
        # ICI hop (plus its transpose in backward) costs 1/n of the ring
        # traffic. t is the uniform scan index, so every device takes the
        # same branch.
        k_blk, v_blk = jax.lax.cond(
            t < n - 1,
            lambda kv: (jax.lax.ppermute(kv[0], SEQ, perm),
                        jax.lax.ppermute(kv[1], SEQ, perm)),
            lambda kv: kv,
            (k_blk, v_blk),
        )
        return (k_blk, v_blk, o_acc, new_lse), None

    if remat:
        step = jax.checkpoint(step)
    b, _, hq, d = q.shape
    # constants must be marked device-varying to type-match the carry
    # outputs under shard_map's varying-axis tracking. When this island is
    # NESTED inside another manual region (the pipeline's 'pipe' axis),
    # the enclosing manual axes are varying too and must be included.
    from jax.sharding import AxisType

    vary_axes = {SEQ, MODEL}
    am = jax.sharding.get_abstract_mesh()
    if am is not None and not am.empty:
        vary_axes |= {
            name for name, ty in zip(am.axis_names, am.axis_types)
            if ty == AxisType.Manual
        }
    vary = lambda x: jax.lax.pcast(x, tuple(vary_axes), to="varying")
    init = (
        k, v,
        vary(jnp.zeros((b, s_loc, hq, d), jnp.float32)),
        vary(jnp.full((b, hq, s_loc), _BIG_NEG, jnp.float32)),
    )
    (k_blk, v_blk, o_acc, _), _ = jax.lax.scan(
        step, init, jnp.arange(n, dtype=jnp.int32)
    )
    return o_acc.astype(q.dtype)


def ring_flash_mha(
    q: jnp.ndarray,  # [B, S, Hq, d] — GLOBAL arrays (GSPMD world)
    k: jnp.ndarray,  # [B, S, Hkv, d]
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] valid sequence lengths (right padding)
    causal: bool = True,
    scale: Optional[float] = None,
    mesh: Optional[Mesh] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel exact attention; returns [B, S, Hq, d].

    The sequence dim shards over 'seq' and heads over 'model' in one
    shard_map island; batch dims stay under GSPMD ('data'/'fsdp'). Query
    positions are assumed to start at 0 (the cacheless training/prefill
    path). Equals flash_mha(q, k, v, kv_len=lengths, causal=...) exactly
    (tests/test_ring_attention.py)."""
    if mesh is None:
        raise ValueError("ring_flash_mha requires a mesh with a 'seq' axis")
    n = mesh.shape[SEQ]
    b, s, hq, d = q.shape
    if s % n:
        raise ValueError(f"sequence length {s} not divisible by seq axis {n}")
    if q.shape[1] != k.shape[1]:
        raise ValueError("ring attention requires Sq == Skv (no KV cache)")
    scale = scale if scale is not None else d**-0.5

    from vita_tpu.parallel.sharded_ops import _island_mesh

    spec = P(None, SEQ, MODEL, None)
    island = jax.shard_map(
        lambda q, k, v, l: _ring_island(
            q, k, v, l, n=n, causal=causal, scale=scale, remat=remat
        ),
        mesh=_island_mesh(mesh),
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        axis_names={SEQ, MODEL},
    )
    return island(q, k, v, lengths.astype(jnp.int32))
