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


def internvit_params_from_hf(state: Mapping[str, Any], n_layers: int, dtype=np.float32):
    """Convert InternVisionModel weights (shipped modeling_intern_vit.py
    names) to our pytree. Conv patch embedding becomes a [p*p*3, D] matmul
    (torch conv weight flattening order (in_c, kh, kw) matches patchify)."""
    g = lambda n: _np(state[n]).astype(dtype)
    pw = g("embeddings.patch_embedding.weight")  # [D, 3, p, p]
    d = pw.shape[0]

    def stack(fmt, transpose=True):
        mats = [g(fmt.format(l=l)) for l in range(n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    L = "encoder.layers.{l}."
    return {
        "patch_embed": {
            "w": pw.reshape(d, -1).T,
            "b": g("embeddings.patch_embedding.bias"),
        },
        "cls": g("embeddings.class_embedding"),
        "pos_embed": g("embeddings.position_embedding"),
        "layers": {
            "qkv_w": stack(L + "attn.qkv.weight"),
            "qkv_b": stack(L + "attn.qkv.bias", transpose=False),
            "proj_w": stack(L + "attn.proj.weight"),
            "proj_b": stack(L + "attn.proj.bias", transpose=False),
            "fc1_w": stack(L + "mlp.fc1.weight"),
            "fc1_b": stack(L + "mlp.fc1.bias", transpose=False),
            "fc2_w": stack(L + "mlp.fc2.weight"),
            "fc2_b": stack(L + "mlp.fc2.bias", transpose=False),
            "norm1_w": stack(L + "norm1.weight", transpose=False),
            "norm1_b": stack(L + "norm1.bias", transpose=False),
            "norm2_w": stack(L + "norm2.weight", transpose=False),
            "norm2_b": stack(L + "norm2.bias", transpose=False),
            "ls1": stack(L + "ls1", transpose=False),
            "ls2": stack(L + "ls2", transpose=False),
        },
    }


def whale_params_from_hf(
    state: Mapping[str, Any],
    n_layers: int,
    cmvn_mean=None,
    cmvn_istd=None,
    dtype=np.float32,
):
    """Convert WhaleAudioModel weights (shipped modeling_whale.py names) to
    our pytree. CMVN stats live outside the HF checkpoint (loaded from the
    ckpt dir's global_cmvn in the reference, builder.py:44-59) and are
    passed explicitly."""
    g = lambda n: _np(state[n]).astype(dtype)

    def stack(fmt, transpose=True):
        mats = [g(fmt.format(l=l)) for l in range(n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    L = "encoder.layers.{l}."
    conv1 = g("subsampling.conv_in.0.weight")  # [D, 1, 3, 3]
    conv2 = g("subsampling.conv_in.2.weight")  # [D, D, 3, 3]
    return {
        "cmvn": {
            "mean": np.zeros((80,), np.float32) if cmvn_mean is None else np.asarray(cmvn_mean),
            "istd": np.ones((80,), np.float32) if cmvn_istd is None else np.asarray(cmvn_istd),
        },
        "sub": {
            "conv1_w": conv1.transpose(2, 3, 1, 0),  # OIHW -> HWIO
            "conv1_b": g("subsampling.conv_in.0.bias"),
            "conv2_w": conv2.transpose(2, 3, 1, 0),
            "conv2_b": g("subsampling.conv_in.2.bias"),
            "out_w": g("subsampling.out.weight").T,
            "out_b": g("subsampling.out.bias"),
        },
        "embed": {
            "w": g("embeddings.embedding.0.weight").T,
            "b": g("embeddings.embedding.0.bias"),
            "ln_w": g("embeddings.embedding.1.weight"),
            "ln_b": g("embeddings.embedding.1.bias"),
        },
        "layers": {
            "q_w": stack(L + "attn.linear_q.weight"),
            "q_b": stack(L + "attn.linear_q.bias", transpose=False),
            "k_w": stack(L + "attn.linear_k.weight"),
            "k_b": stack(L + "attn.linear_k.bias", transpose=False),
            "v_w": stack(L + "attn.linear_v.weight"),
            "v_b": stack(L + "attn.linear_v.bias", transpose=False),
            "out_w": stack(L + "attn.linear_out.weight"),
            "out_b": stack(L + "attn.linear_out.bias", transpose=False),
            "pos_w": stack(L + "attn.linear_pos.weight"),
            "pos_bias_u": stack(L + "attn.pos_bias_u", transpose=False),
            "pos_bias_v": stack(L + "attn.pos_bias_v", transpose=False),
            "ffn1_w": stack(L + "feed_forward.w_1.weight"),
            "ffn1_b": stack(L + "feed_forward.w_1.bias", transpose=False),
            "ffn2_w": stack(L + "feed_forward.w_2.weight"),
            "ffn2_b": stack(L + "feed_forward.w_2.bias", transpose=False),
            "norm1_w": stack(L + "norm1.weight", transpose=False),
            "norm1_b": stack(L + "norm1.bias", transpose=False),
            "norm2_w": stack(L + "norm2.weight", transpose=False),
            "norm2_b": stack(L + "norm2.bias", transpose=False),
        },
        "ln_final": {"w": g("encoder.layer_norm.weight"), "b": g("encoder.layer_norm.bias")},
    }


def eva_params_from_reference(state: Mapping[str, Any], n_layers: int,
                              dtype=np.float32):
    """Convert the reference EVA ViT weights (eva_clip/eva_vit.py
    EVAVisionTransformer, subln+naiveswiglu+rope geometry as built by
    Eva2LargePlusEncoder :945-974) to our models/eva_clip.py pytree.
    Rope freq buffers are regenerated (vision_rope_tables), not imported.

    ``n_layers`` is the EFFECTIVE depth: the reference forward skips the
    final block (eva_vit.py:791-792), so a depth-24 checkpoint imports as
    n_layers=23 and blocks.23.* is intentionally dropped here.
    """
    g = lambda n: _np(state[n]).astype(dtype)
    pw = g("patch_embed.proj.weight")  # [D, 3, p, p]
    d = pw.shape[0]

    def stack(fmt, transpose=True):
        mats = [g(fmt.format(l=l)) for l in range(n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    L = "blocks.{l}."
    return {
        "patch_embed": {"w": pw.reshape(d, -1).T, "b": g("patch_embed.proj.bias")},
        "cls": g("cls_token").reshape(-1),
        "pos_embed": g("pos_embed")[0],
        "layers": {
            "q_w": stack(L + "attn.q_proj.weight"),
            "q_b": stack(L + "attn.q_bias", transpose=False),
            "k_w": stack(L + "attn.k_proj.weight"),
            "v_w": stack(L + "attn.v_proj.weight"),
            "v_b": stack(L + "attn.v_bias", transpose=False),
            "inner_ln_w": stack(L + "attn.inner_attn_ln.weight", transpose=False),
            "inner_ln_b": stack(L + "attn.inner_attn_ln.bias", transpose=False),
            "o_w": stack(L + "attn.proj.weight"),
            "o_b": stack(L + "attn.proj.bias", transpose=False),
            "w1": stack(L + "mlp.w1.weight"),
            "w1_b": stack(L + "mlp.w1.bias", transpose=False),
            "w2": stack(L + "mlp.w2.weight"),
            "w2_b": stack(L + "mlp.w2.bias", transpose=False),
            "ffn_ln_w": stack(L + "mlp.ffn_ln.weight", transpose=False),
            "ffn_ln_b": stack(L + "mlp.ffn_ln.bias", transpose=False),
            "w3": stack(L + "mlp.w3.weight"),
            "w3_b": stack(L + "mlp.w3.bias", transpose=False),
            "ln1_w": stack(L + "norm1.weight", transpose=False),
            "ln1_b": stack(L + "norm1.bias", transpose=False),
            "ln2_w": stack(L + "norm2.weight", transpose=False),
            "ln2_b": stack(L + "norm2.bias", transpose=False),
        },
    }


def _tree_paths(tree, prefix=""):
    """Flatten a param pytree to sorted ('a.b.c', leaf) pairs."""
    out = []
    if isinstance(tree, Mapping):
        for k in sorted(tree):
            out += _tree_paths(tree[k], f"{prefix}{k}.")
    else:
        out.append((prefix[:-1], tree))
    return out


def vision_projector_from_hf(state: Mapping[str, Any], prefix="",
                             dtype=np.float32, kind="mlp2x_gelu",
                             template=None):
    """mlp2x_gelu maps the reference's linear_1/linear_2 layout; every
    other projector variant round-trips its native leaves under
    'native.<path>' keys (no reference layout exists for them), filled
    into ``template`` (an init_vision_projector_kind pytree)."""
    g = lambda n: _np(state[prefix + n]).astype(dtype)
    if kind == "mlp2x_gelu":
        return {
            "fc1_w": g("linear_1.weight").T, "fc1_b": g("linear_1.bias"),
            "fc2_w": g("linear_2.weight").T, "fc2_b": g("linear_2.bias"),
        }
    if kind == "identity":
        return {}  # parameter-free
    if template is None:
        raise ValueError(f"loading projector kind {kind!r} needs a template")

    def fill(tree, p=""):
        if isinstance(tree, Mapping):
            return {k: fill(v, f"{p}{k}.") for k, v in tree.items()}
        return g(f"native.{p[:-1]}").reshape(np.shape(tree))

    return fill(template)


def audio_projector_from_hf(state: Mapping[str, Any], prefix="", dtype=np.float32):
    g = lambda n: _np(state[prefix + n]).astype(dtype)
    return {
        "conv_w": g("conv1d.weight").transpose(2, 1, 0),  # [2D, D, k] -> [k, D, 2D]
        "conv_b": g("conv1d.bias"),
        "ln_w": g("norm.weight"), "ln_b": g("norm.bias"),
        "proj_w": g("linear.weight").T, "proj_b": g("linear.bias"),
    }


def clip_params_from_hf(state: Mapping[str, Any], n_layers: int, dtype=np.float32):
    """HF CLIPVisionModel -> vita_tpu.models.clip pytree."""
    g = lambda n: _np(state["vision_model." + n]).astype(dtype)

    def stack(fmt, transpose=True):
        mats = [g(fmt.format(l=l)) for l in range(n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    L = "encoder.layers.{l}."
    pw = g("embeddings.patch_embedding.weight")  # [D, 3, p, p]
    return {
        "patch_embed": {"w": pw.reshape(pw.shape[0], -1).T},
        "cls": g("embeddings.class_embedding"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "pre_ln": {"w": g("pre_layrnorm.weight"), "b": g("pre_layrnorm.bias")},
        "layers": {
            "q_w": stack(L + "self_attn.q_proj.weight"),
            "q_b": stack(L + "self_attn.q_proj.bias", False),
            "k_w": stack(L + "self_attn.k_proj.weight"),
            "k_b": stack(L + "self_attn.k_proj.bias", False),
            "v_w": stack(L + "self_attn.v_proj.weight"),
            "v_b": stack(L + "self_attn.v_proj.bias", False),
            "o_w": stack(L + "self_attn.out_proj.weight"),
            "o_b": stack(L + "self_attn.out_proj.bias", False),
            "fc1_w": stack(L + "mlp.fc1.weight"),
            "fc1_b": stack(L + "mlp.fc1.bias", False),
            "fc2_w": stack(L + "mlp.fc2.weight"),
            "fc2_b": stack(L + "mlp.fc2.bias", False),
            "ln1_w": stack(L + "layer_norm1.weight", False),
            "ln1_b": stack(L + "layer_norm1.bias", False),
            "ln2_w": stack(L + "layer_norm2.weight", False),
            "ln2_b": stack(L + "layer_norm2.bias", False),
        },
    }


def siglip_params_from_hf(state: Mapping[str, Any], n_layers: int, dtype=np.float32):
    """HF SiglipVisionModel -> vita_tpu.models.siglip pytree."""
    g = lambda n: _np(state["vision_model." + n]).astype(dtype)

    def stack(fmt, transpose=True):
        mats = [g(fmt.format(l=l)) for l in range(n_layers)]
        return np.stack([m.T if transpose else m for m in mats])

    L = "encoder.layers.{l}."
    pw = g("embeddings.patch_embedding.weight")
    return {
        "patch_embed": {
            "w": pw.reshape(pw.shape[0], -1).T,
            "b": g("embeddings.patch_embedding.bias"),
        },
        "pos_embed": g("embeddings.position_embedding.weight"),
        "layers": {
            "q_w": stack(L + "self_attn.q_proj.weight"),
            "q_b": stack(L + "self_attn.q_proj.bias", False),
            "k_w": stack(L + "self_attn.k_proj.weight"),
            "k_b": stack(L + "self_attn.k_proj.bias", False),
            "v_w": stack(L + "self_attn.v_proj.weight"),
            "v_b": stack(L + "self_attn.v_proj.bias", False),
            "o_w": stack(L + "self_attn.out_proj.weight"),
            "o_b": stack(L + "self_attn.out_proj.bias", False),
            "fc1_w": stack(L + "mlp.fc1.weight"),
            "fc1_b": stack(L + "mlp.fc1.bias", False),
            "fc2_w": stack(L + "mlp.fc2.weight"),
            "fc2_b": stack(L + "mlp.fc2.bias", False),
            "ln1_w": stack(L + "layer_norm1.weight", False),
            "ln1_b": stack(L + "layer_norm1.bias", False),
            "ln2_w": stack(L + "layer_norm2.weight", False),
            "ln2_b": stack(L + "layer_norm2.bias", False),
        },
        "post_ln": {"w": g("post_layernorm.weight"), "b": g("post_layernorm.bias")},
    }


def mixtral_params_to_hf(params, cfg, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Export our Mixtral pytree back to HF state_dict names (the inverse
    of mixtral_params_from_hf) — checkpoint interop for the released VITA
    weights and eval harnesses."""
    g = lambda x: np.asarray(x, np.float32)
    out: Dict[str, np.ndarray] = {
        f"{prefix}embed_tokens.weight": g(params["embed"]),
        f"{prefix}norm.weight": g(params["ln_final"]),
        "lm_head.weight": g(params["lm_head"]).T,
    }
    import jax as _jax

    layers = params["layers"]
    stacked = not isinstance(layers, (list, tuple))
    for l in range(cfg.n_layers):
        lp = (
            _jax.tree.map(lambda x: x[l], layers) if stacked else layers[l]
        )
        L = f"{prefix}layers.{l}."
        out[L + "self_attn.q_proj.weight"] = g(lp["attn"]["wq"]).T
        out[L + "self_attn.k_proj.weight"] = g(lp["attn"]["wk"]).T
        out[L + "self_attn.v_proj.weight"] = g(lp["attn"]["wv"]).T
        out[L + "self_attn.o_proj.weight"] = g(lp["attn"]["wo"]).T
        out[L + "block_sparse_moe.gate.weight"] = g(lp["moe"]["router"]).T
        for e in range(cfg.n_experts):
            E = L + f"block_sparse_moe.experts.{e}."
            out[E + "w1.weight"] = g(lp["moe"]["w_gate"][e]).T
            out[E + "w3.weight"] = g(lp["moe"]["w_up"][e]).T
            out[E + "w2.weight"] = g(lp["moe"]["w_down"][e]).T
        out[L + "input_layernorm.weight"] = g(lp["ln_attn"])
        out[L + "post_attention_layernorm.weight"] = g(lp["ln_moe"])
    return out


# ---------------------------------------------------------------------------
# export (inverse mappings): full-stack HF interop
# ---------------------------------------------------------------------------
def _unstack(arr, l, transpose=True):
    m = np.asarray(arr[l], np.float32)
    return m.T if transpose else m


def internvit_params_to_hf(params, n_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of internvit_params_from_hf (modeling_intern_vit.py names)."""
    g = lambda x: np.asarray(x, np.float32)
    pw = g(params["patch_embed"]["w"]).T  # [D, p*p*3]
    d = pw.shape[0]
    side = int(round((pw.shape[1] // 3) ** 0.5))
    out = {
        "embeddings.patch_embedding.weight": pw.reshape(d, 3, side, side),
        "embeddings.patch_embedding.bias": g(params["patch_embed"]["b"]),
        "embeddings.class_embedding": g(params["cls"]),
        "embeddings.position_embedding": g(params["pos_embed"]),
    }
    lay = params["layers"]
    names = [
        ("attn.qkv.weight", "qkv_w", True), ("attn.qkv.bias", "qkv_b", False),
        ("attn.proj.weight", "proj_w", True), ("attn.proj.bias", "proj_b", False),
        ("mlp.fc1.weight", "fc1_w", True), ("mlp.fc1.bias", "fc1_b", False),
        ("mlp.fc2.weight", "fc2_w", True), ("mlp.fc2.bias", "fc2_b", False),
        ("norm1.weight", "norm1_w", False), ("norm1.bias", "norm1_b", False),
        ("norm2.weight", "norm2_w", False), ("norm2.bias", "norm2_b", False),
        ("ls1", "ls1", False), ("ls2", "ls2", False),
    ]
    for l in range(n_layers):
        for hf, ours, tr in names:
            out[f"encoder.layers.{l}.{hf}"] = _unstack(lay[ours], l, tr)
    return out


def whale_params_to_hf(params, n_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of whale_params_from_hf (modeling_whale.py names). CMVN is
    NOT part of the HF state dict (it ships in the feature extractor)."""
    g = lambda x: np.asarray(x, np.float32)
    out = {
        "subsampling.conv_in.0.weight": g(params["sub"]["conv1_w"]).transpose(3, 2, 0, 1),
        "subsampling.conv_in.0.bias": g(params["sub"]["conv1_b"]),
        "subsampling.conv_in.2.weight": g(params["sub"]["conv2_w"]).transpose(3, 2, 0, 1),
        "subsampling.conv_in.2.bias": g(params["sub"]["conv2_b"]),
        "subsampling.out.weight": g(params["sub"]["out_w"]).T,
        "subsampling.out.bias": g(params["sub"]["out_b"]),
        "embeddings.embedding.0.weight": g(params["embed"]["w"]).T,
        "embeddings.embedding.0.bias": g(params["embed"]["b"]),
        "embeddings.embedding.1.weight": g(params["embed"]["ln_w"]),
        "embeddings.embedding.1.bias": g(params["embed"]["ln_b"]),
        "encoder.layer_norm.weight": g(params["ln_final"]["w"]),
        "encoder.layer_norm.bias": g(params["ln_final"]["b"]),
    }
    lay = params["layers"]
    names = [
        ("attn.linear_q.weight", "q_w", True), ("attn.linear_q.bias", "q_b", False),
        ("attn.linear_k.weight", "k_w", True), ("attn.linear_k.bias", "k_b", False),
        ("attn.linear_v.weight", "v_w", True), ("attn.linear_v.bias", "v_b", False),
        ("attn.linear_out.weight", "out_w", True), ("attn.linear_out.bias", "out_b", False),
        ("attn.linear_pos.weight", "pos_w", True),
        ("attn.pos_bias_u", "pos_bias_u", False),
        ("attn.pos_bias_v", "pos_bias_v", False),
        ("feed_forward.w_1.weight", "ffn1_w", True),
        ("feed_forward.w_1.bias", "ffn1_b", False),
        ("feed_forward.w_2.weight", "ffn2_w", True),
        ("feed_forward.w_2.bias", "ffn2_b", False),
        ("norm1.weight", "norm1_w", False), ("norm1.bias", "norm1_b", False),
        ("norm2.weight", "norm2_w", False), ("norm2.bias", "norm2_b", False),
    ]
    for l in range(n_layers):
        for hf, ours, tr in names:
            out[f"encoder.layers.{l}.{hf}"] = _unstack(lay[ours], l, tr)
    return out


def vision_projector_to_hf(params, kind="mlp2x_gelu") -> Dict[str, np.ndarray]:
    g = lambda x: np.asarray(x, np.float32)
    if kind == "mlp2x_gelu":
        return {
            "linear_1.weight": g(params["fc1_w"]).T, "linear_1.bias": g(params["fc1_b"]),
            "linear_2.weight": g(params["fc2_w"]).T, "linear_2.bias": g(params["fc2_b"]),
        }
    # non-reference variants: serialize native leaves by path
    return {f"native.{p}": g(v) for p, v in _tree_paths(params)}


def audio_projector_to_hf(params) -> Dict[str, np.ndarray]:
    g = lambda x: np.asarray(x, np.float32)
    return {
        "conv1d.weight": g(params["conv_w"]).transpose(2, 1, 0),
        "conv1d.bias": g(params["conv_b"]),
        "norm.weight": g(params["ln_w"]), "norm.bias": g(params["ln_b"]),
        "linear.weight": g(params["proj_w"]).T, "linear.bias": g(params["proj_b"]),
    }


def vita_params_to_hf(params, cfg) -> Dict[str, np.ndarray]:
    """Full-stack export to the deployed HF layout (the reverse of
    checkpoint._load_hf_vita_weights; remap spec per the reference's
    tables at web_demo/vllm_tools/vllm_file/mixtral.py:1189-1329)."""
    tower = getattr(cfg, "vision_tower", "internvit")
    if tower != "internvit":
        raise ValueError(
            f"HF deploy export supports the internvit tower only (the "
            f"reference's deployed layout); got vision_tower={tower!r} — "
            "use the native save_vita_checkpoint format for alt towers"
        )
    out: Dict[str, np.ndarray] = {}
    for k, v in mixtral_params_to_hf(params["llm"], cfg.llm, prefix="model.").items():
        out["language_model." + k] = v
    for k, v in internvit_params_to_hf(params["vision"], cfg.vision.n_layers).items():
        out["vision_tower." + k] = v
    for k, v in vision_projector_to_hf(
        params["vision_proj"], kind=getattr(cfg, "vision_projector", "mlp2x_gelu")
    ).items():
        out["vision_projector." + k] = v
    for k, v in whale_params_to_hf(params["audio"], cfg.audio.n_layers).items():
        out["audio_model." + k] = v
    for k, v in audio_projector_to_hf(params["audio_proj"]).items():
        out["audio_projector." + k] = v
    return out
