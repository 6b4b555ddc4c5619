"""Attention: GQA multi-head attention with pluggable kernel backends.

The functional contract is one `mha` entry point taking [B, S, H, D]
tensors and an additive bias/mask; backends:
  - "xla": plain einsum softmax attention (reference semantics, always
    available, used for golden tests and CPU).
  - "flash": Pallas blocked flash-attention kernel (TPU;
    vita_tpu/ops/flash_attention.py) — numerically equivalent, O(S) memory.

Replaces the reference's external flash-attn dependency
(reference: vita/train/train.py:261, internvit/flash_attention.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free on fully masked rows


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, H_kv, D] -> [B, S, H_kv*n_rep, D] by head repetition (GQA)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def causal_mask_bias(q_len: int, kv_len: int, q_offset: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Additive causal bias [1, 1, q_len, kv_len].

    ``q_offset`` is the absolute position of the first query (for decode
    steps against a longer KV cache).
    """
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    k_pos = jnp.arange(kv_len)[None, :]
    return jnp.where(k_pos <= q_pos, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def padding_mask_bias(kv_valid: jnp.ndarray) -> jnp.ndarray:
    """Additive bias [B, 1, 1, S_kv] from a boolean keep-mask over keys."""
    return jnp.where(kv_valid[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)


def mha_xla(
    q: jnp.ndarray,  # [B, Sq, Hq, D]
    k: jnp.ndarray,  # [B, Skv, Hkv, D]
    v: jnp.ndarray,  # [B, Skv, Hkv, D]
    bias: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B, Hq, Sq, Skv]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference softmax attention. fp32 logits/softmax, input-dtype output."""
    hq, hkv = q.shape[2], k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    k = repeat_kv(k, hq // hkv)
    v = repeat_kv(v, hq // hkv)
    scale = scale if scale is not None else q.shape[-1] ** -0.5

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "xla",
    causal: bool = False,
) -> jnp.ndarray:
    """Dispatching attention entry point.

    ``causal=True`` with backend="flash" uses in-kernel masking (no bias
    materialization); with "xla" the caller should fold causality into
    ``bias`` (see ``causal_mask_bias``).
    """
    if backend == "flash":
        from vita_tpu.ops.flash_attention import flash_mha

        return flash_mha(q, k, v, bias=bias, scale=scale, causal=causal)
    if causal and bias is None:
        bias = causal_mask_bias(q.shape[1], k.shape[1])
    elif causal:
        bias = bias + causal_mask_bias(q.shape[1], k.shape[1])
    return mha_xla(q, k, v, bias=bias, scale=scale)
