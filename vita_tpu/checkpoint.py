"""Checkpointing: orbax-native save/restore + HF-format import.

Two formats:
  - native: orbax PyTree checkpoint + a config.json — used by the trainer
    (async save of the sharded pytree; SURVEY.md §5.4's TPU equivalent of
    the reference's DeepSpeed-gather + HF save paths, train.py:166-202).
  - HF deploy format: the reference's released checkpoint layout
    (model_weight_file/config.json + safetensors shards with
    language_model/vision_tower/audio_model prefixes,
    vllm_file/mixtral.py:1189-1329 name tables) — imported via
    vita_tpu.utils.hf_import.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_async_ckptr = None


def _checkpointer():
    """Process-wide async checkpointer: saves overlap the next train steps
    (SURVEY.md §5.4's orbax-async target; the reference blocks training on
    DeepSpeed gather+write)."""
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_checkpoint(
    path: str, params, step: int = 0, extra: Optional[Dict] = None, block: bool = False
) -> None:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(os.path.join(path, f"step_{step}"), args_lib_save(params), force=True)
    if block:
        ckptr.wait_until_finished()
    if extra:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step, **extra}, f)


def wait_for_checkpoints() -> None:
    """Block until in-flight async saves complete (call before exit)."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def args_lib_save(params):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(params)


def _committed_steps(path: str):
    """Step numbers of fully-committed checkpoints (in-flight async saves
    leave '*.orbax-checkpoint-tmp' directories, which must be ignored)."""
    out = []
    for d in os.listdir(path):
        if not d.startswith("step_") or "orbax-checkpoint-tmp" in d:
            continue
        try:
            out.append(int(d.split("_", 1)[1]))
        except ValueError:
            continue
    return sorted(out)


def load_checkpoint(path: str, step: Optional[int] = None, target=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    wait_for_checkpoints()  # a just-written step must be complete
    if step is None:
        steps = _committed_steps(path)
        if not steps:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        step = steps[-1]
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"), target)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    wait_for_checkpoints()
    steps = _committed_steps(path)
    return max(steps) if steps else None


def load_vita_checkpoint(path: str):
    """Load a VITA checkpoint dir -> (VITAConfig, params).

    Accepts the native orbax layout (config.json written by us) or the
    reference's deployed HF layout (composite config.json + safetensors).
    """
    from vita_tpu.models import internvit, mixtral, vita, whale

    cfg_path = os.path.join(path, "config.json")
    with open(cfg_path) as f:
        raw = json.load(f)

    if raw.get("format") == "vita_tpu":
        cfg = _config_from_json(raw)
        params = load_checkpoint(os.path.join(path, "ckpt"))
        return cfg, params

    # HF deploy format (model_weight_file/config.json layout)
    text = raw.get("text_config", raw)
    vis = raw.get("vision_config", {})
    aud = raw.get("audio_config", {})
    cfg = vita.VITAConfig(
        llm=mixtral.MixtralConfig(
            vocab_size=text.get("vocab_size", 51760),
            d_model=text.get("hidden_size", 4096),
            n_layers=text.get("num_hidden_layers", 32),
            n_heads=text.get("num_attention_heads", 32),
            n_kv_heads=text.get("num_key_value_heads", 8),
            d_ff=text.get("intermediate_size", 14336),
            n_experts=text.get("num_local_experts", 8),
            top_k=text.get("num_experts_per_tok", 2),
            rope_theta=text.get("rope_theta", 1e6),
            rms_eps=text.get("rms_norm_eps", 1e-5),
            dtype=jnp.bfloat16,
        ),
        vision=internvit.InternViTConfig(
            image_size=vis.get("image_size", 448),
            patch_size=vis.get("patch_size", 14),
            hidden=vis.get("hidden_size", 1024),
            n_layers=vis.get("num_hidden_layers", 24),
            n_heads=vis.get("num_attention_heads", 16),
            mlp_dim=vis.get("intermediate_size", 4096),
            dtype=jnp.bfloat16,
        ),
        audio=whale.WhaleConfig(
            input_dim=aud.get("input_dim", 80),
            hidden=aud.get("hidden_size", 1024),
            n_layers=aud.get("num_hidden_layers", 24),
            n_heads=aud.get("num_attention_heads", 16),
            ffn_dim=aud.get("intermediate_size", 4096),
            dtype=jnp.bfloat16,
        ),
        vision_fusion=raw.get("vision_fusion", "patch"),
        vision_projector=raw.get("mm_projector_type", "mlp2x_gelu"),
    )
    params = _load_hf_vita_weights(path, cfg)
    return cfg, params


def _config_from_json(raw: Dict[str, Any]):
    from vita_tpu.models import internvit, mixtral, vita, whale

    def build(cls, d):
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields and k != "dtype"}
        dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(d.get("dtype"), jnp.float32)
        return cls(dtype=dt, **kw)

    return vita.VITAConfig(
        llm=build(mixtral.MixtralConfig, raw["llm"]),
        vision=build(internvit.InternViTConfig, raw["vision"]),
        audio=build(whale.WhaleConfig, raw["audio"]),
        vision_fusion=raw.get("vision_fusion", "patch"),
        vision_projector=raw.get("vision_projector", "mlp2x_gelu"),
    )


def config_to_json(cfg) -> Dict[str, Any]:
    def dump(c):
        d = dataclasses.asdict(c)
        d["dtype"] = "bfloat16" if c.dtype == jnp.bfloat16 else "float32"
        return d

    return {
        "format": "vita_tpu",
        "llm": dump(cfg.llm),
        "vision": dump(cfg.vision),
        "audio": dump(cfg.audio),
        "vision_fusion": cfg.vision_fusion,
        "vision_projector": cfg.vision_projector,
    }


def save_vita_checkpoint(path: str, cfg, params, step: int = 0) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_json(cfg), f, indent=1)
    save_checkpoint(os.path.join(path, "ckpt"), params, step=step)


def _load_hf_vision_proj(state, cfg):
    """Projector import for any registered kind: mlp2x uses the reference
    linear_1/linear_2 layout; other kinds fill an init template from their
    native.<path> keys (see hf_import.vision_projector_from_hf)."""
    import jax as _jax

    from vita_tpu.models import projectors
    from vita_tpu.utils.hf_import import vision_projector_from_hf

    kind = getattr(cfg, "vision_projector", "mlp2x_gelu")
    template = None
    if kind != "mlp2x_gelu":
        template = projectors.init_vision_projector_kind(
            _jax.random.PRNGKey(0), cfg.vision_proj_in_dim, cfg.llm.d_model,
            kind=kind,
        )
    return vision_projector_from_hf(state, kind=kind, template=template)


def _load_hf_vita_weights(path: str, cfg):
    """Import the deployed HF checkpoint's safetensors into our pytree."""
    import glob

    from vita_tpu.utils.hf_import import (
        audio_projector_from_hf,
        internvit_params_from_hf,
        load_safetensors_state,
        mixtral_params_from_hf,
        vision_projector_from_hf,
        whale_params_from_hf,
    )

    shards = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no safetensors under {path}")
    state = load_safetensors_state(shards)

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}

    cmvn_mean = cmvn_istd = None
    fe_path = os.path.join(path, "feature_extractor", "preprocessor_config.json")
    if os.path.exists(fe_path):
        with open(fe_path) as f:
            fe = json.load(f)
        cmvn_mean = np.asarray(fe.get("cmvn_means"), np.float32)
        cmvn_istd = np.asarray(fe.get("cmvn_istds"), np.float32)

    params = {
        "llm": mixtral_params_from_hf(
            sub("language_model."), cfg.llm, prefix="model.", dtype=np.float32
        ),
        "vision": internvit_params_from_hf(sub("vision_tower."), cfg.vision.n_layers),
        "vision_proj": _load_hf_vision_proj(sub("vision_projector."), cfg),
        "audio": whale_params_from_hf(
            sub("audio_model."), cfg.audio.n_layers, cmvn_mean, cmvn_istd
        ),
        "audio_proj": audio_projector_from_hf(sub("audio_projector.")),
    }
    to_dtype = lambda x: jnp.asarray(x, cfg.llm.dtype)
    return jax.tree.map(to_dtype, params)


# ---------------------------------------------------------------------------
# stage-chaining load paths (reference: vita/model/builder.py:14-306,
# vita/model/vita_arch.py:63-108)
# ---------------------------------------------------------------------------
def load_adapter_into(params, adapter_path: str):
    """Stage 2 consuming stage 1's adapter-only checkpoint
    (--pretrain_mm_mlp_adapter, vita_arch.py:63-69): restore the subset
    pytree saved by Trainer.save_trainable_only and overlay it onto a full
    parameter tree (dtype-cast to the destination)."""
    subset = load_checkpoint(adapter_path)
    out = dict(params)
    for key, sub in subset.items():
        if key not in params:
            raise KeyError(f"adapter checkpoint has unknown component {key!r}")
        out[key] = jax.tree.map(
            lambda dst, src: jnp.asarray(src, dst.dtype), params[key], sub
        )
        n = sum(x.size for x in jax.tree.leaves(sub))
        print(f"[load] adapter overlay: {key} ({n/1e6:.2f}M params)")
    return out


def load_lora_vita_checkpoint(base_path: str, lora_path: str,
                              rank: int = 8, alpha: float = 16.0,
                              merge: bool = True):
    """LoRA-ckpt + base load path (builder.py:100-175): load the base
    checkpoint, then fold the trained adapters in (``merge=True``, the
    builder's merge_and_unload) or return them separately for runtime
    application."""
    from vita_tpu.train.lora import LoRAConfig, merge_lora

    cfg, params = load_vita_checkpoint(base_path)
    lora = load_checkpoint(lora_path)
    lcfg = LoRAConfig(rank=rank, alpha=alpha)
    if merge:
        return cfg, merge_lora(params, lora, lcfg)
    return cfg, params, lora, lcfg


def load_whale_torch_checkpoint(params, path: str, strict: bool = False):
    """Init the audio encoder from a standalone torch ``final.pt``
    (vita_arch.py:93-108): shape-checked partial merge at the state-dict
    level — entries whose name+shape match our expected layout load,
    everything else is reported and the current weights kept."""
    import torch

    from vita_tpu.utils.hf_import import _np, whale_params_from_hf, whale_params_to_hf

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]

    audio = params["audio"]
    n_layers = jax.tree.leaves(audio["layers"])[0].shape[0]
    expected = whale_params_to_hf(audio, n_layers)  # current values, HF names
    merged_state, loaded, skipped = {}, 0, []
    for k, ref in expected.items():
        v = sd.get(k)
        if v is not None and tuple(_np(v).shape) == tuple(ref.shape):
            merged_state[k] = v
            loaded += 1
        else:
            skipped.append(k)
            merged_state[k] = ref
    unknown = [k for k in sd if k not in expected]
    if skipped or unknown:
        msg = (f"[load] whale final.pt: {loaded} loaded, "
               f"{len(skipped)} kept (first: {skipped[:3]}), "
               f"{len(unknown)} unknown keys ignored")
        if strict:
            raise ValueError(msg)
        print(msg)

    candidate = whale_params_from_hf(
        merged_state, n_layers,
        cmvn_mean=np.asarray(audio["cmvn"]["mean"], np.float32),
        cmvn_istd=np.asarray(audio["cmvn"]["istd"], np.float32),
    )
    out = dict(params)
    out["audio"] = jax.tree.map(
        lambda dst, src: jnp.asarray(src, dst.dtype), audio, candidate
    )
    return out


def export_hf_vita_checkpoint(path: str, cfg, params) -> None:
    """Full-stack export to the deployed HF layout (composite config +
    safetensors + feature-extractor CMVN) — the reverse of
    load_vita_checkpoint's HF branch, so weights round-trip to torch
    tooling (remap spec: vllm_file/mixtral.py:1189-1329)."""
    from safetensors.numpy import save_file

    from vita_tpu.utils.hf_import import vita_params_to_hf

    os.makedirs(path, exist_ok=True)
    state = vita_params_to_hf(params, cfg)
    # safetensors writes the raw buffer: transposed VIEWS serialize garbage
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, os.path.join(path, "model.safetensors"))

    conf = {
        "architectures": ["MixtralForConditionalGeneration"],
        "model_type": "mixtral-multimodal",
        "vision_fusion": cfg.vision_fusion,
        "mm_projector_type": cfg.vision_projector,
        "image_token_index": 51000,
        "audio_token_index": 51001,
        "text_config": {
            "vocab_size": cfg.llm.vocab_size,
            "hidden_size": cfg.llm.d_model,
            "num_hidden_layers": cfg.llm.n_layers,
            "num_attention_heads": cfg.llm.n_heads,
            "num_key_value_heads": cfg.llm.n_kv_heads,
            "intermediate_size": cfg.llm.d_ff,
            "num_local_experts": cfg.llm.n_experts,
            "num_experts_per_tok": cfg.llm.top_k,
            "rope_theta": cfg.llm.rope_theta,
            "rms_norm_eps": cfg.llm.rms_eps,
        },
        "vision_config": {
            "image_size": cfg.vision.image_size,
            "patch_size": cfg.vision.patch_size,
            "hidden_size": cfg.vision.hidden,
            "num_hidden_layers": cfg.vision.n_layers,
            "num_attention_heads": cfg.vision.n_heads,
            "intermediate_size": cfg.vision.mlp_dim,
        },
        "audio_config": {
            "input_dim": cfg.audio.input_dim,
            "hidden_size": cfg.audio.hidden,
            "num_hidden_layers": cfg.audio.n_layers,
            "num_attention_heads": cfg.audio.n_heads,
            "intermediate_size": cfg.audio.ffn_dim,
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(conf, f, indent=1)

    fe_dir = os.path.join(path, "feature_extractor")
    os.makedirs(fe_dir, exist_ok=True)
    cmvn = params["audio"]["cmvn"]
    with open(os.path.join(fe_dir, "preprocessor_config.json"), "w") as f:
        json.dump({
            "feature_extractor_type": "WhaleFeatureExtractor",
            "feature_size": 80, "sampling_rate": 16000,
            "cmvn_means": np.asarray(cmvn["mean"], np.float32).tolist(),
            "cmvn_istds": np.asarray(cmvn["istd"], np.float32).tolist(),
        }, f)
