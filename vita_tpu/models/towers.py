"""Vision-tower factory — the build_vision_tower equivalent.

The reference dispatches on substrings of the tower name
(vita/model/multimodal_encoder/builder.py:12-59): InternViT (the shipped
one), CLIP, SigLIP, SigLIP+S2. Here each tower exposes the same functional
surface: (config, init_params, forward [B,H,W,3] -> [B, T, out_dim]).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable


from vita_tpu.models import clip as clip_mod
from vita_tpu.models import eva_clip as eva_mod
from vita_tpu.models import internvit as internvit_mod
from vita_tpu.models import siglip as siglip_mod


@dataclasses.dataclass(frozen=True)
class Tower:
    name: str
    cfg: Any
    init: Callable
    forward: Callable  # (params, images) -> [B, T, out_dim]
    out_dim: int


def build_vision_tower(name: str, tiny: bool = False, **overrides) -> Tower:
    """name matching mirrors the reference factory: 'internvit' (default),
    'clip', 'siglip', 'siglip-s2'."""
    lname = name.lower()
    if "internvit" in lname or "intern_vit" in lname:
        cfg = (
            internvit_mod.InternViTConfig.tiny(**overrides)
            if tiny
            else internvit_mod.InternViTConfig.vita_300m(**overrides)
        )
        return Tower(
            "internvit", cfg, functools.partial(internvit_mod.init_params, cfg=cfg),
            lambda p, x: internvit_mod.forward(p, cfg, x), cfg.out_dim,
        )
    if "siglip" in lname and "s2" in lname:
        cfg = siglip_mod.SigLIPConfig.tiny(**overrides) if tiny else siglip_mod.SigLIPConfig(**overrides)
        scales = (cfg.image_size, cfg.image_size * 2)

        def fwd(p, x):
            return siglip_mod.s2_multiscale_forward(
                lambda crops: siglip_mod.forward(p, cfg, crops),
                x, scales=scales, base_size=cfg.image_size,
            )

        return Tower(
            "siglip-s2", cfg, functools.partial(siglip_mod.init_params, cfg=cfg),
            fwd, cfg.out_dim * len(scales),
        )
    if "siglip" in lname:
        cfg = siglip_mod.SigLIPConfig.tiny(**overrides) if tiny else siglip_mod.SigLIPConfig(**overrides)
        return Tower(
            "siglip", cfg, functools.partial(siglip_mod.init_params, cfg=cfg),
            lambda p, x: siglip_mod.forward(p, cfg, x), cfg.out_dim,
        )
    if "eva" in lname:
        cfg = eva_mod.EVAConfig.tiny(**overrides) if tiny else eva_mod.EVAConfig(**overrides)
        return Tower(
            "eva-clip", cfg, functools.partial(eva_mod.init_params, cfg=cfg),
            lambda p, x: eva_mod.forward(p, cfg, x), cfg.out_dim,
        )
    if "clip" in lname:
        cfg = clip_mod.CLIPConfig.tiny(**overrides) if tiny else clip_mod.CLIPConfig(**overrides)
        return Tower(
            "clip", cfg, functools.partial(clip_mod.init_params, cfg=cfg),
            lambda p, x: clip_mod.forward(p, cfg, x), cfg.out_dim,
        )
    raise ValueError(f"unknown vision tower {name!r}")
