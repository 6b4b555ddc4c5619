"""VITA omni-modal model: encoders + projectors + Mixtral, fused.

One model stack for train and serve (vs. the reference's two —
vita/model/vita_arch.py for training and web_demo/vllm_tools for serving).

Fusion design (TPU-first, static shapes): the host expands every media
placeholder to its exact feature count (vita_tpu.tokenization), so fusing
is a vectorized cumsum-gather — position p with image_mask takes image
feature number ``cumsum(image_mask)[p]-1`` — instead of the reference's
data-dependent per-sample Python splice loop (vita_arch.py:237-321). The
same masks build the labels (feature positions -> IGNORE_INDEX), matching
vita_arch.py:279-321 semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vita_tpu.constants import IGNORE_INDEX
from vita_tpu.models import clip, eva_clip, internvit, mixtral, projectors, siglip, whale

# Vision tower registry (the build_vision_tower dispatch of
# multimodal_encoder/builder.py:12-38, applied to the fused model).
_TOWER_MODULES = {
    "internvit": internvit,
    "clip": clip,
    "siglip": siglip,
    "eva": eva_clip,
}

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VITAConfig:
    llm: mixtral.MixtralConfig = dataclasses.field(default_factory=mixtral.MixtralConfig)
    vision: Any = dataclasses.field(default_factory=internvit.InternViTConfig)
    audio: whale.WhaleConfig = dataclasses.field(default_factory=whale.WhaleConfig)
    audio_adapter_kernel: int = 5
    vision_tower: str = "internvit"  # registry key into _TOWER_MODULES
    # 'patch': every tile projects independently (InternVL-style).
    # 'framecat': tiles come in 5-tuples [2x2-mosaic, f1..f4]; the tuple's
    # tower features are channel-concatenated (dim -> 5C) before the
    # projector — VITA's signature video scheme
    # (vita/model/vita_arch.py:136-149, ...neg_frameCat.py:442-556).
    vision_fusion: str = "patch"  # 'patch' | 'framecat'
    # projector variant registry (multimodal_projector/builder.py:154-185);
    # mlp2x_gelu is the shipped default
    vision_projector: str = "mlp2x_gelu"

    @property
    def vision_proj_in_dim(self) -> int:
        return self.vision.out_dim * (5 if self.vision_fusion == "framecat" else 1)

    @property
    def image_tokens_per_group(self) -> int:
        """LLM tokens per <image> sentinel (tower tokens / projector
        reduction — SPP/LDP/vanilla/minigpt merge 4 tokens into 1)."""
        return self.vision.out_tokens // projectors.projector_token_reduction(
            self.vision_projector
        )

    @property
    def image_group_tiles(self) -> int:
        """Tiles consumed per <image> sentinel group (5 for framecat)."""
        return 5 if self.vision_fusion == "framecat" else 1

    @property
    def tower_module(self):
        try:
            return _TOWER_MODULES[self.vision_tower]
        except KeyError:
            raise ValueError(
                f"unknown vision_tower {self.vision_tower!r}; "
                f"known: {sorted(_TOWER_MODULES)}"
            ) from None

    @staticmethod
    def vita_8x7b(**kw) -> "VITAConfig":
        return VITAConfig(
            llm=mixtral.MixtralConfig.vita_8x7b(),
            vision=internvit.InternViTConfig.vita_300m(dtype=jnp.bfloat16),
            audio=whale.WhaleConfig.vita(dtype=jnp.bfloat16),
            **kw,
        )

    @staticmethod
    def tiny(**kw) -> "VITAConfig":
        """All three submodels tiny, dims consistent for fusion tests."""
        llm = mixtral.MixtralConfig.tiny()
        return VITAConfig(
            llm=llm,
            vision=internvit.InternViTConfig.tiny(),
            audio=whale.WhaleConfig.tiny(),
            **kw,
        )


def init_params(rng: jax.Array, cfg: VITAConfig) -> Params:
    k = jax.random.split(rng, 5)
    d_llm = cfg.llm.d_model
    return {
        "llm": mixtral.init_params(k[0], cfg.llm),
        "vision": cfg.tower_module.init_params(k[1], cfg.vision),
        "vision_proj": projectors.init_vision_projector_kind(
            k[2], cfg.vision_proj_in_dim, d_llm, kind=cfg.vision_projector,
            dtype=cfg.llm.dtype,
        ),
        "audio": whale.init_params(k[3], cfg.audio),
        "audio_proj": projectors.init_audio_projector(
            k[4], cfg.audio.hidden, d_llm, cfg.audio_adapter_kernel, cfg.llm.dtype
        ),
    }


def param_specs(cfg: VITAConfig) -> Params:
    from jax.sharding import PartitionSpec

    if hasattr(cfg.tower_module, "param_specs"):
        tower_specs = cfg.tower_module.param_specs(cfg.vision)
    else:
        # alternative towers are small (<=1B): replicate
        shapes = jax.eval_shape(
            lambda: cfg.tower_module.init_params(jax.random.PRNGKey(0), cfg.vision)
        )
        tower_specs = jax.tree.map(lambda _: PartitionSpec(), shapes)
    if cfg.vision_projector == "mlp2x_gelu":
        proj_specs = projectors.vision_projector_specs()
    else:  # variant projectors are small: replicate
        shapes = jax.eval_shape(
            lambda: projectors.init_vision_projector_kind(
                jax.random.PRNGKey(0), cfg.vision_proj_in_dim, cfg.llm.d_model,
                kind=cfg.vision_projector,
            )
        )
        proj_specs = jax.tree.map(lambda _: PartitionSpec(), shapes)
    return {
        "llm": mixtral.param_specs(cfg.llm),
        "vision": tower_specs,
        "vision_proj": proj_specs,
        "audio": whale.param_specs(cfg.audio),
        "audio_proj": projectors.audio_projector_specs(),
    }


def encode_images(params: Params, cfg: VITAConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [N_tiles, H, W, 3] -> LLM-space features [N_groups, T, D].

    N_groups == N_tiles for 'patch' fusion; for 'framecat' every 5
    consecutive tiles [mosaic, f1..f4] channel-concatenate after the tower
    (dim C -> 5C, same token count) before projecting
    (vita_arch.py:136-149 encode_images_frameCat)."""
    feats = cfg.tower_module.forward(params["vision"], cfg.vision, images)
    if cfg.vision_fusion == "framecat":
        n, t, c = feats.shape
        if n % 5:
            raise ValueError(f"framecat needs tiles in 5-tuples, got {n}")
        # [G, 5, T, C] -> [G, T, 5, C] -> [G, T, 5C]: token t's feature is
        # the concatenation [mosaic_t, f1_t, f2_t, f3_t, f4_t]
        feats = feats.reshape(n // 5, 5, t, c).transpose(0, 2, 1, 3)
        feats = feats.reshape(n // 5, t, 5 * c)
    return projectors.apply_vision_projector(
        params["vision_proj"], feats, kind=cfg.vision_projector
    )


def encode_audio(
    params: Params, cfg: VITAConfig, speech: jnp.ndarray, lengths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """speech [B, T, 80], lengths [B] -> (features [B, T'', D], valid [B, T''])."""
    feats, valid = whale.forward(params["audio"], cfg.audio, speech, lengths)
    return projectors.audio_projector(params["audio_proj"], feats, valid)


def merge_embeddings(
    token_embeds: jnp.ndarray,  # [B, S, D]
    image_mask: jnp.ndarray,  # [B, S] bool
    audio_mask: jnp.ndarray,  # [B, S] bool
    image_feats: Optional[jnp.ndarray] = None,  # [B, N_img, D] (padded)
    audio_feats: Optional[jnp.ndarray] = None,  # [B, N_aud, D] (padded)
    audio_select: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Vectorized scatter of media features into placeholder slots.

    The k-th True position (in sequence order) of each mask receives the
    k-th feature row. Counts must line up (host guarantees via
    expand_media_sentinels); excess mask positions clamp to the last
    feature (never happens for well-formed inputs).

    ``audio_select`` = (clip_idx [B,S], row_idx [B,S]) addresses
    ``audio_feats`` as [n_clips, T'', D] directly — required when one
    prompt carries several audio clips (multi-turn audio history), where
    each clip's valid feature rows are a prefix of its padded row block and
    a plain cumsum gather would pick up inter-clip padding.
    """
    out = token_embeds
    if image_feats is not None:
        idx = jnp.cumsum(image_mask, axis=1) - 1  # [B, S]
        idx = jnp.clip(idx, 0, image_feats.shape[1] - 1)
        gathered = jnp.take_along_axis(
            image_feats, idx[..., None], axis=1
        ).astype(out.dtype)
        out = jnp.where(image_mask[..., None], gathered, out)
    if audio_feats is not None:
        if audio_select is not None:
            clip_idx, row_idx = audio_select
            gathered = audio_feats[
                jnp.clip(clip_idx, 0, audio_feats.shape[0] - 1),
                jnp.clip(row_idx, 0, audio_feats.shape[1] - 1),
            ].astype(out.dtype)
        else:
            idx = jnp.cumsum(audio_mask, axis=1) - 1
            idx = jnp.clip(idx, 0, audio_feats.shape[1] - 1)
            gathered = jnp.take_along_axis(
                audio_feats, idx[..., None], axis=1
            ).astype(out.dtype)
        out = jnp.where(audio_mask[..., None], gathered, out)
    return out


def build_labels(
    input_ids: jnp.ndarray,
    media_mask: jnp.ndarray,
    answer_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Next-token labels: IGNORE at media slots and non-answer positions
    (prompt/padding), else the token id (vita_arch.py:279-321 semantics)."""
    keep = answer_mask & ~media_mask
    return jnp.where(keep, input_ids, IGNORE_INDEX)


def fuse_embeddings(
    params: Params,
    cfg: VITAConfig,
    input_ids: jnp.ndarray,  # [B, S] sentinel-free ids (0 at media slots)
    image_mask: Optional[jnp.ndarray] = None,  # [B, S]
    audio_mask: Optional[jnp.ndarray] = None,
    images: Optional[jnp.ndarray] = None,  # [N_tiles_total, H, W, 3], batch-major
    tiles_per_sample: Optional[int] = None,  # static tiles per batch row
    speech: Optional[jnp.ndarray] = None,  # [B, T, 80] (or [n_clips, T, 80])
    speech_lengths: Optional[jnp.ndarray] = None,  # [B] / [n_clips]
    audio_select: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    audio_encoded: Optional[jnp.ndarray] = None,  # [n_clips, T', whale_hidden]
    audio_encoded_lengths: Optional[jnp.ndarray] = None,  # [n_clips]
) -> jnp.ndarray:
    """Token embeddings with media features merged in: [B, S, D].

    The encoder+merge half of the forward pass, exposed separately so the
    serving engine can run it once per request and then feed the LLM in
    prefill chunks (inputs_embeds slices).

    ``audio_select`` (clip_idx, row_idx — tokenization.audio_select_arrays)
    switches the audio merge to multi-clip addressing: ``speech`` rows are
    then clips of ONE batch row (multi-turn audio history).

    ``audio_encoded`` bypasses the Whale encoder with features already
    produced by the streaming path (serve.streaming_audio — encoded live
    during speech); only the CNN adapter runs here. Mutually exclusive
    with ``speech``."""
    b, s = input_ids.shape
    embeds = jnp.take(params["llm"]["embed"], input_ids, axis=0)

    image_feats = audio_feats = None
    if images is not None:
        del tiles_per_sample  # groups-per-sample follows from N_tiles / b
        feats = encode_images(params, cfg, images)  # [N_groups, T, D]
        image_feats = feats.reshape(b, -1, feats.shape[-1])
    if speech is not None:
        audio_feats, _ = encode_audio(params, cfg, speech, speech_lengths)
    elif audio_encoded is not None:
        valid = (
            jnp.arange(audio_encoded.shape[1])[None, :]
            < audio_encoded_lengths[:, None]
        )
        audio_feats, _ = projectors.audio_projector(
            params["audio_proj"], audio_encoded.astype(cfg.audio.dtype), valid
        )

    if image_mask is None:
        image_mask = jnp.zeros((b, s), bool)
    if audio_mask is None:
        audio_mask = jnp.zeros((b, s), bool)
    return merge_embeddings(
        embeds, image_mask, audio_mask, image_feats, audio_feats,
        audio_select=audio_select,
    )


def forward(
    params: Params,
    cfg: VITAConfig,
    input_ids: jnp.ndarray,  # [B, S] sentinel-free ids (0 at media slots)
    image_mask: Optional[jnp.ndarray] = None,  # [B, S]
    audio_mask: Optional[jnp.ndarray] = None,
    images: Optional[jnp.ndarray] = None,  # [N_tiles_total, H, W, 3], batch-major
    tiles_per_sample: Optional[int] = None,  # static tiles per batch row
    speech: Optional[jnp.ndarray] = None,  # [B, T, 80]
    speech_lengths: Optional[jnp.ndarray] = None,  # [B]
    attn_valid: Optional[jnp.ndarray] = None,  # [B, S_kv]
    cache: Optional[Params] = None,
    token_mask: Optional[jnp.ndarray] = None,
    audio_select: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    mesh=None,  # required when cfg.llm.pipe_stages > 1
) -> Tuple[jnp.ndarray, Optional[Params], jnp.ndarray]:
    """Full multimodal forward. Returns (logits, new_cache, moe_aux)."""
    embeds = fuse_embeddings(
        params, cfg, input_ids, image_mask, audio_mask,
        images, tiles_per_sample, speech, speech_lengths,
        audio_select=audio_select,
    )
    return mixtral.forward(
        params["llm"], cfg.llm,
        inputs_embeds=embeds, attn_valid=attn_valid, cache=cache,
        token_mask=token_mask, mesh=mesh,
    )
