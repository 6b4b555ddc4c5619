"""SigLIP vision tower (+ S2 multiscale wrapper).

Parity targets:
  - SiglipVisionTower (vita/model/multimodal_encoder/siglip/
    siglip_encoder.py:1-149): SigLIP ViT — no CLS token, learned positions,
    tanh-approx GELU, qkv/mlp biases, final post-layernorm; features are
    the last hidden state (all patch tokens).
  - SiglipVisionTowerS2 / s2wrapper (vita/util/s2wrapper/core.py:17-100):
    multiscale forward — run the tower at several scales (resize, split
    into tower-size crops, batch, merge back, channel-concat features).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from vita_tpu.models.internvit import patchify
from vita_tpu.ops.attention import mha
from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden: int = 1152
    n_layers: int = 27
    n_heads: int = 16
    mlp_dim: int = 4304
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def out_tokens(self) -> int:
        return self.num_patches

    @property
    def out_dim(self) -> int:
        return self.hidden

    @staticmethod
    def tiny(**kw) -> "SigLIPConfig":
        base = dict(image_size=56, patch_size=14, hidden=32, n_layers=2, n_heads=4, mlp_dim=64)
        base.update(kw)
        return SigLIPConfig(**base)


def init_params(rng: jax.Array, cfg: SigLIPConfig) -> Params:
    d, dt, nl = cfg.hidden, cfg.dtype, cfg.n_layers
    k = jax.random.split(rng, 10)
    s = d**-0.5
    nrm = lambda key, shape, sc=0.02: jax.random.normal(key, shape, dt) * sc
    return {
        "patch_embed": {
            "w": nrm(k[0], (cfg.patch_size**2 * 3, d)),
            "b": jnp.zeros((d,), dt),
        },
        "pos_embed": nrm(k[1], (cfg.num_patches, d)),
        "layers": {
            "q_w": nrm(k[2], (nl, d, d), s), "q_b": jnp.zeros((nl, d), dt),
            "k_w": nrm(k[3], (nl, d, d), s), "k_b": jnp.zeros((nl, d), dt),
            "v_w": nrm(k[4], (nl, d, d), s), "v_b": jnp.zeros((nl, d), dt),
            "o_w": nrm(k[5], (nl, d, d), s), "o_b": jnp.zeros((nl, d), dt),
            "fc1_w": nrm(k[6], (nl, d, cfg.mlp_dim), s),
            "fc1_b": jnp.zeros((nl, cfg.mlp_dim), dt),
            "fc2_w": nrm(k[7], (nl, cfg.mlp_dim, d), cfg.mlp_dim**-0.5),
            "fc2_b": jnp.zeros((nl, d), dt),
            "ln1_w": jnp.ones((nl, d), dt), "ln1_b": jnp.zeros((nl, d), dt),
            "ln2_w": jnp.ones((nl, d), dt), "ln2_b": jnp.zeros((nl, d), dt),
        },
        "post_ln": {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
    }


def forward(params: Params, cfg: SigLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> last hidden state [B, P, hidden] (no CLS to drop)."""
    b = images.shape[0]
    d, nh = cfg.hidden, cfg.n_heads
    hd = d // nh

    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    x = x + params["pos_embed"].astype(x.dtype)

    def layer_fn(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, -1, nh, hd)
        k = (h @ lp["k_w"] + lp["k_b"]).reshape(b, -1, nh, hd)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, -1, nh, hd)
        x = x + (mha(q, k, v).reshape(b, -1, d) @ lp["o_w"] + lp["o_b"])
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        h = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=True)
        x = x + (h @ lp["fc2_w"] + lp["fc2_b"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return layer_norm(x, params["post_ln"]["w"], params["post_ln"]["b"], cfg.ln_eps)


def s2_multiscale_forward(
    tower_fn,
    images: jnp.ndarray,  # [B, H, W, 3] at the largest scale
    scales: Sequence[int],
    base_size: int,
) -> jnp.ndarray:
    """s2wrapper.forward semantics (vita/util/s2wrapper/core.py:17-100):
    for each scale, resize to scale, chessboard-split into base_size crops,
    run the tower batched, merge crops back spatially, pool to the base
    grid, and channel-concat across scales."""
    b = images.shape[0]
    outs: List[jnp.ndarray] = []
    base_grid = None
    for scale in scales:
        n_split = scale // base_size
        img_s = jax.image.resize(images, (b, scale, scale, 3), "bilinear")
        # split into n_split^2 crops of base_size
        crops = img_s.reshape(b, n_split, base_size, n_split, base_size, 3)
        crops = crops.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * n_split * n_split, base_size, base_size, 3
        )
        feats = tower_fn(crops)  # [B*n^2, P, C]
        p = feats.shape[1]
        g = int(p**0.5)
        if base_grid is None:
            base_grid = g
        # merge crops back into one spatial map [B, n*g, n*g, C]
        feats = feats.reshape(b, n_split, n_split, g, g, -1)
        feats = feats.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_split * g, n_split * g, -1)
        # average-pool down to the base grid
        if n_split > 1:
            feats = feats.reshape(b, base_grid, n_split, base_grid, n_split, -1).mean((2, 4))
        outs.append(feats.reshape(b, base_grid * base_grid, -1))
    return jnp.concatenate(outs, axis=-1)
