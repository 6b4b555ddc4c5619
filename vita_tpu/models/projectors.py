"""Modality projectors: vision MLP and audio CNN-subsampling adapter.

Vision: mlp2x_gelu — Linear(4096,4096) -> GELU -> Linear(4096,4096)
(reference: vita/model/multimodal_projector/builder.py:154-185; deployed
variant vllm_file/mixtral.py:805-818 — input dim equals the pixel-shuffled
ViT output, 4096).

Audio: CNNSubsampling adapter — zero right-pad (k-1), Conv1d(d, 2d, k=5,
stride 2), LayerNorm(eps 1e-3), GELU, Linear(2d, llm_dim); halves the
frame rate to ~12.5 tok/s (reference: whale/adapter.py:68-136, deployed
branch cnn_num=1 with norm='layer'/act gelu per
vllm_file/mixtral.py:821-859, configuration_mixtral_multimodal.py:101).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def init_vision_projector(rng, in_dim: int, llm_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1_w": jax.random.normal(k1, (in_dim, llm_dim), dtype) * in_dim**-0.5,
        "fc1_b": jnp.zeros((llm_dim,), dtype),
        "fc2_w": jax.random.normal(k2, (llm_dim, llm_dim), dtype) * llm_dim**-0.5,
        "fc2_b": jnp.zeros((llm_dim,), dtype),
    }


def vision_projector_specs() -> Params:
    return {
        "fc1_w": P("fsdp", "model"), "fc1_b": P(None),
        "fc2_w": P("model", "fsdp"), "fc2_b": P(None),
    }


def vision_projector(params: Params, feats: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.gelu(feats @ params["fc1_w"] + params["fc1_b"], approximate=False)
    return h @ params["fc2_w"] + params["fc2_b"]


def init_audio_projector(
    rng, in_dim: int, llm_dim: int, kernel: int = 5, dtype=jnp.float32
) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        # conv kernel in HIO layout for lax.conv over time: [k, in, out]
        "conv_w": jax.random.normal(k1, (kernel, in_dim, 2 * in_dim), dtype)
        * (kernel * in_dim) ** -0.5,
        "conv_b": jnp.zeros((2 * in_dim,), dtype),
        "ln_w": jnp.ones((2 * in_dim,), dtype),
        "ln_b": jnp.zeros((2 * in_dim,), dtype),
        "proj_w": jax.random.normal(k2, (2 * in_dim, llm_dim), dtype) * (2 * in_dim) ** -0.5,
        "proj_b": jnp.zeros((llm_dim,), dtype),
    }


def audio_projector_specs() -> Params:
    return {
        "conv_w": P(None, "fsdp", "model"), "conv_b": P(None),
        "ln_w": P(None), "ln_b": P(None),
        "proj_w": P("model", "fsdp"), "proj_b": P(None),
    }


def audio_projector(
    params: Params, feats: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """feats [B, T, D], valid [B, T] -> ([B, (T-1)//2+1, llm_dim], new valid).

    Padding frames are zeroed before the conv (adapter.py:115-117), the
    time axis is right-padded by k-1 zeros, and stride 2 halves it.
    """
    k = params["conv_w"].shape[0]
    x = jnp.where(valid[..., None], feats, 0)
    x = jnp.pad(x, ((0, 0), (0, k - 1), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, params["conv_w"], (2,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
    ) + params["conv_b"]
    x = layer_norm(x, params["ln_w"], params["ln_b"], eps=1e-3)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["proj_w"] + params["proj_b"]
    return x, valid[:, 0::2]
