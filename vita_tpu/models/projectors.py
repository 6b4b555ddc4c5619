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
    # mixed-precision robustness: encoder features may arrive f32 while
    # the adapter weights are bf16 (or vice versa) — weights govern
    x = jnp.where(valid[..., None], feats, 0).astype(params["conv_w"].dtype)
    x = jnp.pad(x, ((0, 0), (0, k - 1), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, params["conv_w"], (2,), "VALID", dimension_numbers=("NHC", "HIO", "NHC")
    ) + params["conv_b"]
    x = layer_norm(x, params["ln_w"], params["ln_b"], eps=1e-3)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ params["proj_w"] + params["proj_b"]
    return x, valid[:, 0::2]


# ---------------------------------------------------------------------------
# vision projector variants (reference multimodal_projector/builder.py:24-185)
# ---------------------------------------------------------------------------
PROJECTOR_KINDS = (
    "linear", "mlp2x_gelu", "mlp3x_gelu", "spp_v1", "spp_v2", "spp_v3",
    "vanilla", "minigpt", "ldp", "identity",
)


def projector_token_reduction(kind: str) -> int:
    """Tokens-per-group divisor: SPP/LDP pool the 2D token grid 2x2;
    vanilla/minigpt merge 4 consecutive tokens (builder.py:24-72,114-151)."""
    return 4 if kind.startswith(("spp", "vanilla", "minigpt", "ldp")) else 1


def _hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hard_swish(x):
    return x * _hard_sigmoid(x)


def _init_linear(rng, din, dout, dtype):
    return {
        "w": jax.random.normal(rng, (din, dout), dtype) * din**-0.5,
        "b": jnp.zeros((dout,), dtype),
    }


def _init_ldp_block(rng, c, stride, dtype):
    ks = jax.random.split(rng, 4)
    sq = max(c // 4, 8)
    del stride  # structure is identical for both strides
    return {
        "dw_w": jax.random.normal(ks[0], (3, 3, 1, c), dtype) * (9**-0.5),
        "ln1_w": jnp.ones((c,), dtype), "ln1_b": jnp.zeros((c,), dtype),
        "se_fc1": _init_linear(ks[1], c, sq, dtype),
        "se_fc2": _init_linear(ks[2], sq, c, dtype),
        "pw_w": jax.random.normal(ks[3], (c, c), dtype) * c**-0.5,
        "ln2_w": jnp.ones((c,), dtype), "ln2_b": jnp.zeros((c,), dtype),
    }


def _ldp_block(p, x, stride):
    """MobileNetV3 InvertedResidual with expand==channels (no expand conv):
    depthwise 3x3 -> LayerNorm2d -> hardswish -> SE(hardsigmoid) -> 1x1
    project -> LayerNorm2d; residual at stride 1 (builder.py:75-102)."""
    b, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x, p["dw_w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    y = layer_norm(y, p["ln1_w"], p["ln1_b"])
    y = _hard_swish(y)
    s = jnp.mean(y, axis=(1, 2))  # squeeze [B, C]
    s = jax.nn.relu(s @ p["se_fc1"]["w"] + p["se_fc1"]["b"])
    s = _hard_sigmoid(s @ p["se_fc2"]["w"] + p["se_fc2"]["b"])
    y = y * s[:, None, None, :]
    y = y @ p["pw_w"]
    y = layer_norm(y, p["ln2_w"], p["ln2_b"])
    if stride == 1:
        y = y + x
    return y


def init_vision_projector_kind(
    rng, in_dim: int, llm_dim: int, kind: str = "mlp2x_gelu", dtype=jnp.float32
) -> Params:
    """Parameters for any registered projector variant. 'mlp2x_gelu' keeps
    the round-1 layout (init_vision_projector) for checkpoint compat."""
    ks = jax.random.split(rng, 8)
    if kind == "mlp2x_gelu":
        return init_vision_projector(rng, in_dim, llm_dim, dtype)
    if kind == "identity":
        return {}
    if kind == "linear":
        return {"lin": _init_linear(ks[0], in_dim, llm_dim, dtype)}
    if kind == "mlp3x_gelu":
        return {
            "fc1": _init_linear(ks[0], in_dim, llm_dim, dtype),
            "fc2": _init_linear(ks[1], llm_dim, llm_dim, dtype),
            "fc3": _init_linear(ks[2], llm_dim, llm_dim, dtype),
        }
    if kind.startswith("spp"):
        if _spp_variant(kind) is None:
            raise ValueError(
                f"unknown spp variant in {kind!r}: expected 'v1'/'v2'/'v3' "
                "(substring match, like the reference builder.py:132-144)"
            )
        # all three linears exist regardless of sub-type (builder.py:117-127)
        return {
            "linear_0": _init_linear(ks[0], in_dim, in_dim, dtype),
            "linear_1": _init_linear(ks[1], in_dim, llm_dim, dtype),
            "linear_2": _init_linear(ks[2], llm_dim, llm_dim, dtype),
        }
    if kind in ("vanilla", "minigpt"):
        return {"lin": _init_linear(ks[0], in_dim * 4, llm_dim, dtype)}
    if kind == "ldp":
        return {
            "fc1": _init_linear(ks[0], in_dim, llm_dim, dtype),
            "fc2": _init_linear(ks[1], llm_dim, llm_dim, dtype),
            "block1": _init_ldp_block(ks[2], llm_dim, 1, dtype),
            "block2": _init_ldp_block(ks[3], llm_dim, 2, dtype),
        }
    raise ValueError(f"unknown projector kind {kind!r} (known: {PROJECTOR_KINDS})")


def _to_grid(x):
    b, n, c = x.shape
    h = int(round(n**0.5))
    if h * h != n:
        raise ValueError(f"projector needs a square token grid, got {n}")
    return x.reshape(b, h, h, c), h


def _spp_variant(kind: str):
    """'v1'/'v2'/'v3' by SUBSTRING (the reference matches 'v1' in
    projector_type, builder.py:132-144 — 'spp_v1_big' is valid there), or
    None for unknown variants (validated at init, not first forward)."""
    for v in ("v1", "v2", "v3"):
        if v in kind:
            return v
    return None


def _avg_pool2(x):  # [B, H, W, C] -> [B, floor(H/2), floor(W/2), C]
    # odd grids FLOOR like the reference's nn.AvgPool2d(2) (builder.py:125)
    # — a hard reshape would crash on e.g. a 27x27 grid
    b, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2]
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def apply_vision_projector(
    params: Params, feats: jnp.ndarray, kind: str = "mlp2x_gelu"
) -> jnp.ndarray:
    """feats [B_groups, T, C] -> [B_groups, T/reduction, llm_dim]."""
    lin = lambda p, x: x @ p["w"] + p["b"]
    if kind == "mlp2x_gelu":
        return vision_projector(params, feats)
    if kind == "identity":
        return feats
    if kind == "linear":
        return lin(params["lin"], feats)
    if kind == "mlp3x_gelu":
        h = jax.nn.gelu(lin(params["fc1"], feats), approximate=False)
        h = jax.nn.gelu(lin(params["fc2"], h), approximate=False)
        return lin(params["fc3"], h)
    if kind.startswith("spp"):
        v = _spp_variant(kind)
        if v == "v1":
            x = lin(params["linear_1"], feats)
            g, _ = _to_grid(x)
            x = _avg_pool2(g).reshape(x.shape[0], -1, x.shape[-1])
            return lin(params["linear_2"], x)
        if v == "v2":
            x = lin(params["linear_2"], lin(params["linear_1"], feats))
            g, _ = _to_grid(x)
            return _avg_pool2(g).reshape(x.shape[0], -1, x.shape[-1])
        if v == "v3":
            x = lin(params["linear_0"], feats)
            g, _ = _to_grid(x)
            x = _avg_pool2(g).reshape(x.shape[0], -1, x.shape[-1])
            return lin(params["linear_2"], lin(params["linear_1"], x))
        raise ValueError(f"unknown spp variant {kind!r}")
    if kind == "minigpt":
        b, n, c = feats.shape
        if n % 4:
            raise ValueError("minigpt merges 4-token groups; tokens % 4 != 0")
        return lin(params["lin"], feats.reshape(b, n // 4, 4 * c))
    if kind == "vanilla":
        b, n, c = feats.shape
        if n % 4:
            raise ValueError("vanilla merges 4-token groups; tokens % 4 != 0")
        x = feats.reshape(b, n // 4, 4, c).transpose(0, 1, 3, 2)
        return lin(params["lin"], x.reshape(b, n // 4, 4 * c))
    if kind == "ldp":
        h = jax.nn.gelu(lin(params["fc1"], feats), approximate=False)
        h = lin(params["fc2"], h)
        g, side = _to_grid(h)
        g = _ldp_block(params["block1"], g, 1)
        g = _ldp_block(params["block2"], g, 2)
        return g.reshape(g.shape[0], -1, g.shape[-1])
    raise ValueError(f"unknown projector kind {kind!r}")
