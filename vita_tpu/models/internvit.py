"""InternViT vision tower, TPU-native.

Behavior-parity target: the reference's InternViT-300M encoder and wrapper
(vita/model/multimodal_encoder/internvit/modeling_intern_vit.py:34-394,
internvit_encoder.py:42-106) with the deployed config
(model_weight_file/config.json vision_config): 24 layers, hidden 1024,
16 heads, mlp 4096, 448px, patch 14, LayerNorm (eps 1e-6), qkv bias,
no qk-norm, learnable per-layer scales (ls1/ls2), erf-GELU.

TPU-first choices:
  - Patch embedding is a patchify-reshape + one matmul (kernel == stride
    conv is exactly that) — lands on the MXU instead of a conv kernel.
  - Layers are stacked and scanned like the LLM.
  - Output is the spliceable feature sequence: last hidden state, CLS
    dropped, values scaled by 0.5, pixel-shuffle x0.5 => 256 tokens of dim
    4096 per 448x448 tile (internvit_encoder.py:55-79).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vita_tpu.ops.attention import mha
from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    mlp_dim: int = 4096
    ln_eps: float = 1e-6
    pixel_shuffle_scale: float = 0.5
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def out_dim(self) -> int:
        # pixel-shuffle x0.5 folds 2x2 spatial neighborhoods into channels.
        return self.hidden * int(1 / self.pixel_shuffle_scale) ** 2

    @property
    def out_tokens(self) -> int:
        return int(self.num_patches * self.pixel_shuffle_scale**2)

    @staticmethod
    def vita_300m(**kw) -> "InternViTConfig":
        return InternViTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "InternViTConfig":
        base = dict(image_size=56, patch_size=14, hidden=32, n_layers=2, n_heads=4, mlp_dim=64)
        base.update(kw)
        return InternViTConfig(**base)


def init_params(rng: jax.Array, cfg: InternViTConfig) -> Params:
    dt = cfg.dtype
    d = cfg.hidden
    pdim = cfg.patch_size * cfg.patch_size * 3
    k = jax.random.split(rng, 12)
    s = d**-0.5
    nl = cfg.n_layers

    def nrm(key, shape, scale):
        return jax.random.normal(key, shape, dt) * scale

    return {
        "patch_embed": {"w": nrm(k[0], (pdim, d), pdim**-0.5), "b": jnp.zeros((d,), dt)},
        "cls": nrm(k[1], (1, 1, d), 0.02),
        "pos_embed": nrm(k[2], (1, cfg.num_patches + 1, d), 0.02),
        "layers": {
            "qkv_w": nrm(k[3], (nl, d, 3 * d), s),
            "qkv_b": jnp.zeros((nl, 3 * d), dt),
            "proj_w": nrm(k[4], (nl, d, d), s),
            "proj_b": jnp.zeros((nl, d), dt),
            "fc1_w": nrm(k[5], (nl, d, cfg.mlp_dim), s),
            "fc1_b": jnp.zeros((nl, cfg.mlp_dim), dt),
            "fc2_w": nrm(k[6], (nl, cfg.mlp_dim, d), cfg.mlp_dim**-0.5),
            "fc2_b": jnp.zeros((nl, d), dt),
            "norm1_w": jnp.ones((nl, d), dt),
            "norm1_b": jnp.zeros((nl, d), dt),
            "norm2_w": jnp.ones((nl, d), dt),
            "norm2_b": jnp.zeros((nl, d), dt),
            "ls1": jnp.ones((nl, d), dt),
            "ls2": jnp.ones((nl, d), dt),
        },
    }


def param_specs(cfg: InternViTConfig) -> Params:
    """Vision tower is small (300M): fsdp-shard the big matrices' input
    dims and put their output dims on 'model' (cheap, and keeps the
    activations' head/channel layout aligned with the LLM's TP axis);
    small leaves replicate."""
    return {
        "patch_embed": {"w": P(None, "fsdp"), "b": P(None)},
        "cls": P(None, None, None),
        "pos_embed": P(None, None, None),
        "layers": {
            "qkv_w": P(None, "fsdp", "model"),
            "qkv_b": P(None, None),
            "proj_w": P(None, "model", "fsdp"),
            "proj_b": P(None, None),
            "fc1_w": P(None, "fsdp", "model"),
            "fc1_b": P(None, None),
            "fc2_w": P(None, "model", "fsdp"),
            "fc2_b": P(None, None),
            "norm1_w": P(None, None), "norm1_b": P(None, None),
            "norm2_w": P(None, None), "norm2_b": P(None, None),
            "ls1": P(None, None), "ls2": P(None, None),
        },
    }


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, (H/p)*(W/p), p*p*3], row-major patch order.

    Channel ordering within a patch matches torch Conv2d flattening
    (C-major: weight[out, in_c, kh, kw]): features ordered (c, kh, kw).
    """
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, gh, gw, c, ph, pw
    return x.reshape(b, gh * gw, c * patch * patch)


def pixel_shuffle(x: jnp.ndarray, scale: float = 0.5) -> jnp.ndarray:
    """InternVL pixel-unshuffle: [B, G, G, C] -> [B, G*s, G*s, C/s^2].

    Exact reshape/permute sequence of internvit_encoder.py:42-53 (the
    reference's variable names call the first spatial dim `w`).
    """
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale), int(c / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale), int(w * scale), int(c / (scale * scale)))
    x = x.transpose(0, 2, 1, 3)
    return x


def _torch_bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] interpolation matrix matching torch F.interpolate
    mode='bicubic', align_corners=False: cubic convolution kernel with
    a = -0.75 and index clamping at the borders (NOT jax.image's Keys
    a=-0.5 + antialiasing — those deviate for every non-448 input)."""
    a = -0.75

    def w(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    m = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        s_pos = (i + 0.5) * scale - 0.5
        base = int(np.floor(s_pos))
        t = s_pos - base
        for k in range(-1, 3):
            m[i, min(max(base + k, 0), src - 1)] += w(k - t)
    return m.astype(np.float32)


def interpolate_pos_embed(pos: jnp.ndarray, src_grid: int, dst_grid: int) -> jnp.ndarray:
    """Bicubic-resize the patch position table [1, src^2+1, D] to dst^2+1
    (reference: modeling_intern_vit.py _get_pos_embed, :92-106 — torch
    bicubic semantics, matched exactly). CLS slot passes through."""
    if src_grid == dst_grid:
        return pos
    cls, patch = pos[:, :1], pos[:, 1:]
    d = patch.shape[-1]
    grid = patch.reshape(src_grid, src_grid, d).astype(jnp.float32)
    m = jnp.asarray(_torch_bicubic_matrix(src_grid, dst_grid))
    grid = jnp.einsum("ys,sxd->yxd", m, jnp.einsum("xs,ysd->yxd", m, grid))
    return jnp.concatenate(
        [cls, grid.reshape(1, dst_grid * dst_grid, d).astype(pos.dtype)], axis=1
    )


def forward(params: Params, cfg: InternViTConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (preprocessed pixels) -> features [B, T, out_dim].

    Square inputs whose side is a multiple of patch_size are accepted; the
    learned position table is bicubically interpolated for non-default
    resolutions (448 is the trained/tiled default).
    """
    b, ih, iw = images.shape[:3]
    if ih != iw or ih % cfg.patch_size:
        raise ValueError(
            f"InternViT expects square images with side % {cfg.patch_size} == 0, got {ih}x{iw}"
        )
    if (ih // cfg.patch_size) % 2:
        raise ValueError(
            f"pixel-shuffle x0.5 needs an EVEN patch grid: side {ih} gives "
            f"grid {ih // cfg.patch_size}; use a multiple of {2 * cfg.patch_size}"
        )
    d = cfg.hidden
    in_grid = ih // cfg.patch_size

    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embed(params["pos_embed"], cfg.grid, in_grid)
    x = x + pos.astype(x.dtype)

    def layer_fn(x, lp):
        h = layer_norm(x, lp["norm1_w"], lp["norm1_b"], cfg.ln_eps)
        qkv = h @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv.reshape(b, -1, 3, cfg.n_heads, d // cfg.n_heads), 3, axis=2)
        attn = mha(q.squeeze(2), k.squeeze(2), v.squeeze(2))
        attn = attn.reshape(b, -1, d) @ lp["proj_w"] + lp["proj_b"]
        x = x + attn * lp["ls1"]
        h = layer_norm(x, lp["norm2_w"], lp["norm2_b"], cfg.ln_eps)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        h = h @ lp["fc2_w"] + lp["fc2_b"]
        x = x + h * lp["ls2"]
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])

    feats = x[:, 1:]  # drop CLS (internvit_encoder.py:36-40, select_layer=-1)
    g = in_grid
    feats = feats.reshape(b, g, g, d)
    feats = pixel_shuffle(feats * cfg.pixel_shuffle_scale, cfg.pixel_shuffle_scale)
    n_tok = int(g * g * cfg.pixel_shuffle_scale**2)
    return feats.reshape(b, n_tok, cfg.out_dim)
