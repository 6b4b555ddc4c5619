"""Training step: loss, freeze masks, grouped learning rates, pjit sharding.

Replaces the reference's DeepSpeed/HF-Trainer stack (vita/train/train.py,
vita_trainer.py) with a pure-functional jitted step over the
(data, fsdp, expert, model) mesh: GSPMD parameter sharding is the ZeRO-3
equivalent; optimizer state inherits the param shardings.

Feature parity targets:
  - CE loss with IGNORE_INDEX masking + MoE aux loss
    (router_aux_loss_coef, vita_mixtral.py:197-215)
  - stage-wise freeze masks (train.py:265-319: freeze backbone / towers /
    adapters independently)
  - per-group LRs: separate mm_projector_lr (vita_trainer.py:171-283)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vita_tpu.constants import IGNORE_INDEX
from vita_tpu.models import vita


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    projector_lr: Optional[float] = None  # mm_projector_lr; None = same
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    aux_loss_coef: float = 0.02
    warmup_steps: int = 100
    total_steps: int = 10000
    # stage presets (train.py flags):
    train_llm: bool = True
    train_vision: bool = False
    train_audio: bool = False
    train_vision_proj: bool = True
    train_audio_proj: bool = True

    @staticmethod
    def stage1_pretrain_mlp() -> "TrainConfig":
        # projector alignment only, lr 5e-4 (script/train/pretrain_mlp.sh)
        return TrainConfig(learning_rate=5e-4, train_llm=False, train_audio_proj=False)

    @staticmethod
    def stage2_finetune() -> "TrainConfig":
        # + audio adapter, lr 2e-5 (script/train/finetune.sh)
        return TrainConfig(learning_rate=2e-5, projector_lr=5e-4)

    @staticmethod
    def stage3_task() -> "TrainConfig":
        return TrainConfig(learning_rate=2e-5)


def trainable_mask(params, tc: TrainConfig):
    """Pytree of bools: which top-level component trains (freeze flags)."""
    flags = {
        "llm": tc.train_llm,
        "vision": tc.train_vision,
        "audio": tc.train_audio,
        "vision_proj": tc.train_vision_proj,
        "audio_proj": tc.train_audio_proj,
    }
    return {
        k: jax.tree.map(lambda _: flags[k], v) for k, v in params.items()
    }


def lr_group_labels(params):
    """'projector' for the two adapters, 'base' elsewhere (grouped LRs)."""
    return {
        k: jax.tree.map(lambda _: "projector" if k.endswith("_proj") else "base", v)
        for k, v in params.items()
    }


def make_optimizer(tc: TrainConfig, params) -> optax.GradientTransformation:
    def schedule(base_lr):
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, tc.warmup_steps, max(tc.total_steps, tc.warmup_steps + 1)
        )

    def adamw(lr):
        # decay excludes 1-D leaves (norm scales, biases) like the
        # reference HF-Trainer optimizer groups (vita_trainer.py:171-283)
        decay_mask = jax.tree.map(lambda p: p.ndim > 1, params)
        return optax.chain(
            optax.clip_by_global_norm(tc.grad_clip),
            optax.adamw(schedule(lr), b1=tc.b1, b2=tc.b2,
                        weight_decay=tc.weight_decay, mask=decay_mask),
        )

    base = adamw(tc.learning_rate)
    if tc.projector_lr is None:
        opt = base
    else:
        opt = optax.multi_transform(
            {"base": base, "projector": adamw(tc.projector_lr)},
            lr_group_labels(params),
        )
    mask = trainable_mask(params, tc)
    inv_mask = jax.tree.map(lambda m: not m, mask)
    # masked() passes non-selected leaves through untouched, so frozen
    # params must additionally have their updates zeroed.
    return optax.chain(
        optax.masked(opt, mask),
        optax.masked(optax.set_to_zero(), inv_mask),
    )


def loss_fn(
    params,
    cfg: vita.VITAConfig,
    batch: Dict[str, jnp.ndarray],
    aux_coef: float,
    mesh=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch: input_ids [B,S], labels [B,S], image_mask/audio_mask [B,S],
    attn_valid [B,S], images [N,H,W,3]?, speech [B,T,80]?, speech_lengths."""
    # multi-clip audio batches carry (clip_idx, row_idx) addressing — the
    # Collator's audio_select_clip/_row (per-sample clips stacked on the
    # speech leading axis)
    audio_select = None
    if "audio_select_clip" in batch:
        audio_select = (batch["audio_select_clip"], batch["audio_select_row"])
    logits, _, aux = vita.forward(
        params, cfg,
        batch["input_ids"],
        image_mask=batch.get("image_mask"),
        audio_mask=batch.get("audio_mask"),
        images=batch.get("images"),
        speech=batch.get("speech"),
        speech_lengths=batch.get("speech_lengths"),
        audio_select=audio_select,
        attn_valid=batch.get("attn_valid"),
        token_mask=batch.get("attn_valid"),
        mesh=mesh,
    )
    # shift: predict t+1 from t
    logits = logits[:, :-1]
    labels = batch["labels"][:, 1:]
    mask = labels != IGNORE_INDEX
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1)
    ce = jnp.sum(nll * mask) / denom
    total = ce + aux_coef * aux
    return total, {"loss": total, "ce": ce, "aux": aux, "tokens": denom}


def make_train_step(
    cfg: vita.VITAConfig, tc: TrainConfig,
    optimizer: optax.GradientTransformation, mesh=None,
) -> Callable:
    """``mesh`` is only needed for pipeline parallelism
    (cfg.llm.pipe_stages > 1); plain GSPMD sharding needs no mesh here."""
    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, tc.aux_loss_coef, mesh
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step

