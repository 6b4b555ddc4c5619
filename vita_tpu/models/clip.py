"""CLIP vision tower (alternative to InternViT).

Parity target: the reference's CLIPVisionTower wrapper around HF
CLIPVisionModel (vita/model/multimodal_encoder/clip/clip_encoder.py:6-78):
select hidden layer -2, drop CLS. Architecture: ViT with class embedding,
learned positions, pre-LN (`pre_layrnorm`) before the encoder, QuickGELU
activation, qkv/mlp biases.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vita_tpu.models.internvit import patchify
from vita_tpu.ops.attention import mha
from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    mlp_dim: int = 4096
    ln_eps: float = 1e-5
    select_layer: int = -2  # hidden_states index (clip_encoder.py:14)
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
    def tiny(**kw) -> "CLIPConfig":
        base = dict(image_size=56, patch_size=14, hidden=32, n_layers=3, n_heads=4, mlp_dim=64)
        base.update(kw)
        return CLIPConfig(**base)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def init_params(rng: jax.Array, cfg: CLIPConfig) -> Params:
    d = cfg.hidden
    dt = cfg.dtype
    nl = cfg.n_layers
    k = jax.random.split(rng, 10)
    s = d**-0.5
    nrm = lambda key, shape, sc=0.02: jax.random.normal(key, shape, dt) * sc
    return {
        "patch_embed": {"w": nrm(k[0], (cfg.patch_size**2 * 3, d))},  # CLIP conv: no bias
        "cls": nrm(k[1], (d,)),
        "pos_embed": nrm(k[2], (cfg.num_patches + 1, d)),
        "pre_ln": {"w": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
        "layers": {
            "q_w": nrm(k[3], (nl, d, d), s), "q_b": jnp.zeros((nl, d), dt),
            "k_w": nrm(k[4], (nl, d, d), s), "k_b": jnp.zeros((nl, d), dt),
            "v_w": nrm(k[5], (nl, d, d), s), "v_b": jnp.zeros((nl, d), dt),
            "o_w": nrm(k[6], (nl, d, d), s), "o_b": jnp.zeros((nl, d), dt),
            "fc1_w": nrm(k[7], (nl, d, cfg.mlp_dim), s),
            "fc1_b": jnp.zeros((nl, cfg.mlp_dim), dt),
            "fc2_w": nrm(k[8], (nl, cfg.mlp_dim, d), cfg.mlp_dim**-0.5),
            "fc2_b": jnp.zeros((nl, d), dt),
            "ln1_w": jnp.ones((nl, d), dt), "ln1_b": jnp.zeros((nl, d), dt),
            "ln2_w": jnp.ones((nl, d), dt), "ln2_b": jnp.zeros((nl, d), dt),
        },
    }


def forward(params: Params, cfg: CLIPConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> features at select_layer, CLS dropped: [B, P, hidden]."""
    b = images.shape[0]
    d = cfg.hidden
    nh = cfg.n_heads
    hd = d // nh

    x = patchify(images.astype(cfg.dtype), cfg.patch_size) @ params["patch_embed"]["w"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(x.dtype)
    x = layer_norm(x, params["pre_ln"]["w"], params["pre_ln"]["b"], cfg.ln_eps)

    # hidden_states[-2] == input to the last layer: run n_layers-1+select+1 layers
    n_run = cfg.n_layers + 1 + cfg.select_layer if cfg.select_layer < 0 else cfg.select_layer

    def layer_fn(carry, lp):
        x, i = carry

        def apply(x):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, -1, nh, hd)
            k = (h @ lp["k_w"] + lp["k_b"]).reshape(b, -1, nh, hd)
            v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, -1, nh, hd)
            a = mha(q, k, v).reshape(b, -1, d) @ lp["o_w"] + lp["o_b"]
            x = x + a
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            h = quick_gelu(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
            return x + h

        x = jnp.where(i < n_run, apply(x), x)
        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(layer_fn, (x, jnp.zeros((), jnp.int32)), params["layers"])
    return x[:, 1:]  # drop CLS (clip_encoder.py feature_select)
