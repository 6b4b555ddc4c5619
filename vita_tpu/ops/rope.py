"""Rotary position embeddings (Llama/Mixtral convention, rope_theta=1e6).

Half-split rotation (rotate_half over [d/2:] ++ [:d/2]) computed in fp32;
positions are explicit so the same code serves prefill (0..S-1) and decode
(single absolute position per step).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_tables(
    positions: jnp.ndarray, head_dim: int, theta: float = 1e6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape positions.shape + (head_dim,)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., d/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (..., d)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    positions: jnp.ndarray,
    theta: float = 1e6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding to q, k of shape [B, S, H, D].

    ``positions`` is [B, S] absolute token positions.
    """
    cos, sin = rope_tables(positions, q.shape[-1], theta)  # [B, S, D]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
