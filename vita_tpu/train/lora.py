"""LoRA: low-rank adapters over the LLM's linear weights.

Parity target: the reference's LoRA setup — adapters on all LLM linear
layers except the towers/projectors (find_all_linear_names,
vita/train/train.py:122-138,265-283), trained with the base frozen, then
merged for deployment (script/merge_lora_weights.py:8-28).

Functional design: LoRA params are a separate pytree mirroring a subset of
the base; ``apply_lora`` materializes merged weights W + (alpha/r) B A on
the fly (cheap: done once per step under jit, fused by XLA), so the model
code needs no changes. ``merge_lora`` folds adapters into the base for
checkpoint export.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# LLM weight leaves that receive adapters (all attention + expert matrices
# + the router gate — the reference's find_all_linear_names matches every
# backbone nn.Linear incl. block_sparse_moe.gate, train.py:122-138).
LORA_TARGETS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"), ("attn", "wo"),
    ("moe", "w_gate"), ("moe", "w_up"), ("moe", "w_down"),
    ("moe", "router"),
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    alpha: float = 16.0
    # matching the reference defaults lora_r=128? train.py uses
    # lora_r/lora_alpha args; 8/16 are the common small defaults.

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora(rng: jax.Array, llm_params: Params, cfg: LoRAConfig) -> Params:
    """A/B factors for each target leaf. A ~ N(0, 1/r), B = 0 (so the
    adapter starts as identity)."""
    layers = llm_params["layers"]
    out: Params = {"layers": {"attn": {}, "moe": {}}}
    keys = jax.random.split(rng, len(LORA_TARGETS))
    for key, (grp, name) in zip(keys, LORA_TARGETS):
        w = layers[grp][name]
        *lead, d_in, d_out = w.shape
        a = jax.random.normal(key, (*lead, cfg.rank, d_out), w.dtype) * (cfg.rank**-0.5)
        b = jnp.zeros((*lead, d_in, cfg.rank), w.dtype)
        out["layers"][grp][name] = {"a": a, "b": b}
    return out


def apply_lora(llm_params: Params, lora: Params, cfg: LoRAConfig) -> Params:
    """Merged-view params: W' = W + scale * B @ A (per stacked layer)."""
    merged = dict(llm_params)
    layers = dict(llm_params["layers"])
    for grp, name in LORA_TARGETS:
        ad = lora["layers"][grp][name]
        w = layers[grp][name]
        delta = jnp.einsum("...ir,...ro->...io", ad["b"], ad["a"]) * cfg.scale
        grp_d = dict(layers[grp])
        grp_d[name] = w + delta.astype(w.dtype)
        layers[grp] = grp_d
    merged["layers"] = layers
    return merged


def merge_lora(params: Params, lora: Params, cfg: LoRAConfig) -> Params:
    """Fold adapters into a full parameter pytree (deploy-time merge,
    script/merge_lora_weights.py semantics). `params` is the full VITA
    pytree; only params['llm'] is touched."""
    out = dict(params)
    out["llm"] = apply_lora(params["llm"], lora, cfg)
    return out


def lora_loss_fn(base_params, lora, vita_cfg, lora_cfg, batch, aux_coef,
                 loss_fn, mesh=None):
    """Wrap a loss over (frozen base, trainable lora). ``mesh`` threads
    through to the forward (required for pipeline parallelism)."""
    merged = dict(base_params)
    merged["llm"] = apply_lora(base_params["llm"], lora, lora_cfg)
    return loss_fn(merged, vita_cfg, batch, aux_coef, mesh)
