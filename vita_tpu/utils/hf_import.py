"""Import HF-format checkpoints into vita_tpu parameter pytrees.

The name mapping is the interop spec the reference itself uses when moving
weights between its two stacks (web_demo/vllm_tools/vllm_file/mixtral.py:
1197-1221); here it maps HF state_dict names -> our stacked-layer pytree.

Works from either a live torch state_dict-like mapping (tensors or numpy
arrays) or safetensors files. All weights are transposed to our
[d_in, d_out] einsum layout and per-layer tensors are stacked on a leading
L axis for the scan-based forward.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np

from vita_tpu.models.mixtral import MixtralConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def mixtral_params_from_hf(
    state: Mapping[str, Any],
    cfg: MixtralConfig,
    prefix: str = "model.",
    dtype=np.float32,
) -> Dict[str, Any]:
    """Convert an HF MixtralForCausalLM state dict to our param pytree."""
    g = lambda name: _np(state[name]).astype(dtype)

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [g(fmt.format(l=l)) for l in range(cfg.n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    def stack_experts(fmt: str) -> np.ndarray:
        # [L, E, d_in, d_out]
        return np.stack(
            [
                np.stack([g(fmt.format(l=l, e=e)).T for e in range(cfg.n_experts)])
                for l in range(cfg.n_layers)
            ]
        )

    p = prefix
    return {
        "embed": g(f"{p}embed_tokens.weight"),
        "layers": {
            "attn": {
                "wq": stack(p + "layers.{l}.self_attn.q_proj.weight"),
                "wk": stack(p + "layers.{l}.self_attn.k_proj.weight"),
                "wv": stack(p + "layers.{l}.self_attn.v_proj.weight"),
                "wo": stack(p + "layers.{l}.self_attn.o_proj.weight"),
            },
            "moe": {
                "router": stack(p + "layers.{l}.block_sparse_moe.gate.weight"),
                "w_gate": stack_experts(p + "layers.{l}.block_sparse_moe.experts.{e}.w1.weight"),
                "w_up": stack_experts(p + "layers.{l}.block_sparse_moe.experts.{e}.w3.weight"),
                "w_down": stack_experts(p + "layers.{l}.block_sparse_moe.experts.{e}.w2.weight"),
            },
            "ln_attn": np.stack(
                [g(f"{p}layers.{l}.input_layernorm.weight") for l in range(cfg.n_layers)]
            ),
            "ln_moe": np.stack(
                [
                    g(f"{p}layers.{l}.post_attention_layernorm.weight")
                    for l in range(cfg.n_layers)
                ]
            ),
        },
        "ln_final": g(f"{p}norm.weight"),
        "lm_head": g("lm_head.weight").T,
    }


def load_safetensors_state(paths) -> Dict[str, np.ndarray]:
    """Flat name->array mapping from one or more .safetensors files."""
    from safetensors.numpy import load_file

    state: Dict[str, np.ndarray] = {}
    for path in paths if isinstance(paths, (list, tuple)) else [paths]:
        state.update(load_file(str(path)))
    return state
