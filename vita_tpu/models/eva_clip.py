"""EVA02-CLIP vision tower (alternative tower, completing the factory).

Parity target: the reference's in-tree EVA ViT (vita/model/
multimodal_encoder/eva_clip/eva_vit.py) as configured by
Eva2LargePlusEncoder (:945-974): EVA02-CLIP-L-14-336 — 24 layers, width
1024, 16 heads (head 64), mlp_ratio 8/3 with naive SwiGLU, sub-LayerNorm
(inner LN in attention output and FFN hidden), 2D axial rotary embeddings
on q/k patch tokens (CLS excluded), q/v biases (no k bias), learned
absolute positions on top. Output = all patch features (CLS dropped,
:973).

The reference file requires xformers/timm (absent here), so verification
is structural/property-based rather than golden; the math follows the
EVA02 published formulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models.internvit import patchify
from vita_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EVAConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden: int = 1024
    # EVA02-L has depth 24, but the reference tower SKIPS the final block
    # (eva_vit.py:791-792 `if i == len(self.blocks) - 1: continue`), so the
    # effective — and our — layer count is 23; weight import drops the dead
    # last block (utils.hf_import.eva_params_from_reference).
    n_layers: int = 23
    n_heads: int = 16
    mlp_ratio: float = 8 / 3  # SwiGLU hidden = round(hidden * ratio)
    ln_eps: float = 1e-6
    rope_pt_seq_len: int = 16  # pretraining grid side for rope freq interp
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden * self.mlp_ratio)

    @property
    def out_tokens(self) -> int:
        return self.num_patches

    @property
    def out_dim(self) -> int:
        return self.hidden

    @staticmethod
    def tiny(**kw) -> "EVAConfig":
        base = dict(image_size=56, patch_size=14, hidden=32, n_layers=2,
                    n_heads=4, rope_pt_seq_len=4)
        base.update(kw)
        return EVAConfig(**kw and base or base)


def vision_rope_tables(cfg: EVAConfig) -> Tuple[np.ndarray, np.ndarray]:
    """2D axial rotary tables over the patch grid: half the head dim
    rotates with the row coordinate, half with the column; frequencies are
    scaled by pt_seq_len/ft_seq_len (the reference's intp_freq)."""
    hd = cfg.head_dim
    dim_side = hd // 2  # per-axis rotary dim
    freqs = 1.0 / (10000 ** (np.arange(0, dim_side, 2, dtype=np.float64) / dim_side))
    g = cfg.grid
    t = np.arange(g, dtype=np.float64) * (cfg.rope_pt_seq_len / g)
    angles_1d = np.outer(t, freqs)  # [g, dim_side/2]
    angles_1d = np.repeat(angles_1d, 2, axis=-1)  # interleaved pairs

    row = np.broadcast_to(angles_1d[:, None, :], (g, g, angles_1d.shape[-1]))
    col = np.broadcast_to(angles_1d[None, :, :], (g, g, angles_1d.shape[-1]))
    ang = np.concatenate([row, col], axis=-1).reshape(g * g, hd)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rotate_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1) pairs -> (-x1, x0), interleaved layout."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    out = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return out.reshape(x.shape)


def apply_vision_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, D] patch tokens (no CLS)."""
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x * c + _rotate_pairs(x) * s).astype(x.dtype)


def init_params(rng: jax.Array, cfg: EVAConfig) -> Params:
    d, dt, nl = cfg.hidden, cfg.dtype, cfg.n_layers
    mh = cfg.mlp_hidden
    k = jax.random.split(rng, 12)
    s = d**-0.5
    nrm = lambda key, shape, sc=0.02: jax.random.normal(key, shape, dt) * sc
    return {
        "patch_embed": {"w": nrm(k[0], (cfg.patch_size**2 * 3, d)), "b": jnp.zeros((d,), dt)},
        "cls": nrm(k[1], (d,)),
        "pos_embed": nrm(k[2], (cfg.num_patches + 1, d)),
        "layers": {
            "q_w": nrm(k[3], (nl, d, d), s), "q_b": jnp.zeros((nl, d), dt),
            "k_w": nrm(k[4], (nl, d, d), s),  # no k bias (EVA)
            "v_w": nrm(k[5], (nl, d, d), s), "v_b": jnp.zeros((nl, d), dt),
            "inner_ln_w": jnp.ones((nl, d), dt), "inner_ln_b": jnp.zeros((nl, d), dt),
            "o_w": nrm(k[6], (nl, d, d), s), "o_b": jnp.zeros((nl, d), dt),
            # SwiGLU gate/value carry biases (eva_vit.py:244-245 nn.Linear)
            "w1": nrm(k[7], (nl, d, mh), s), "w1_b": jnp.zeros((nl, mh), dt),
            "w2": nrm(k[8], (nl, d, mh), s), "w2_b": jnp.zeros((nl, mh), dt),
            "ffn_ln_w": jnp.ones((nl, mh), dt), "ffn_ln_b": jnp.zeros((nl, mh), dt),
            "w3": nrm(k[9], (nl, mh, d), mh**-0.5), "w3_b": jnp.zeros((nl, d), dt),
            "ln1_w": jnp.ones((nl, d), dt), "ln1_b": jnp.zeros((nl, d), dt),
            "ln2_w": jnp.ones((nl, d), dt), "ln2_b": jnp.zeros((nl, d), dt),
        },
    }


def forward(params: Params, cfg: EVAConfig, images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 3] -> patch features [B, P, hidden] (CLS dropped)."""
    b = images.shape[0]
    d, nh, hd = cfg.hidden, cfg.n_heads, cfg.head_dim
    cos, sin = (jnp.asarray(t) for t in vision_rope_tables(cfg))

    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = x @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, d)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(x.dtype)

    def layer_fn(x, lp):
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        t = h.shape[1]
        q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, t, nh, hd)
        kk = (h @ lp["k_w"]).reshape(b, t, nh, hd)
        v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, t, nh, hd)
        # rope on patch tokens only; CLS keeps its unrotated projection
        q = jnp.concatenate([q[:, :1], apply_vision_rope(q[:, 1:], cos, sin)], axis=1)
        kk = jnp.concatenate([kk[:, :1], apply_vision_rope(kk[:, 1:], cos, sin)], axis=1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kk,
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        attn = layer_norm(attn, lp["inner_ln_w"], lp["inner_ln_b"], cfg.ln_eps)  # subln
        x = x + (attn @ lp["o_w"] + lp["o_b"])

        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        hidden = jax.nn.silu(h @ lp["w1"] + lp["w1_b"]) * (h @ lp["w2"] + lp["w2_b"])
        hidden = layer_norm(hidden, lp["ffn_ln_w"], lp["ffn_ln_b"], cfg.ln_eps)  # subln
        x = x + (hidden @ lp["w3"] + lp["w3_b"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x[:, 1:]  # all patch features, CLS dropped (eva_vit.py:973)
