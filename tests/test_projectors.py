"""Vision projector variants (multimodal_projector/builder.py:24-185):
registry, token reduction, merge-layout goldens, end-to-end generate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import projectors, vita

IN, OUT, B, N = 24, 16, 2, 16  # 4x4 token grid


@pytest.mark.parametrize("kind", projectors.PROJECTOR_KINDS)
def test_projector_shapes(kind):
    p = projectors.init_vision_projector_kind(
        jax.random.PRNGKey(0), IN, OUT, kind=kind
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, IN))
    y = projectors.apply_vision_projector(p, x, kind=kind)
    red = projectors.projector_token_reduction(kind)
    want_dim = IN if kind == "identity" else OUT
    assert y.shape == (B, N // red, want_dim)
    assert np.isfinite(np.asarray(y)).all()


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown projector"):
        projectors.init_vision_projector_kind(jax.random.PRNGKey(0), IN, OUT, kind="bogus")


def test_linear_matches_manual():
    p = projectors.init_vision_projector_kind(jax.random.PRNGKey(0), IN, OUT, kind="linear")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, N, IN))
    y = projectors.apply_vision_projector(p, x, kind="linear")
    want = np.asarray(x) @ np.asarray(p["lin"]["w"]) + np.asarray(p["lin"]["b"])
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-6)


def test_minigpt_vs_vanilla_layouts():
    """minigpt concatenates 4 consecutive tokens' features; vanilla
    interleaves per-channel (builder.py:24-72 view/permute orders)."""
    p = projectors.init_vision_projector_kind(jax.random.PRNGKey(0), IN, OUT, kind="minigpt")
    x = np.arange(B * N * IN, dtype=np.float32).reshape(B, N, IN) / 1000.0
    ym = projectors.apply_vision_projector(p, jnp.asarray(x), kind="minigpt")
    w, b = np.asarray(p["lin"]["w"]), np.asarray(p["lin"]["b"])
    want_m = x.reshape(B, N // 4, 4 * IN) @ w + b
    np.testing.assert_allclose(np.asarray(ym), want_m, rtol=1e-4)

    yv = projectors.apply_vision_projector(p, jnp.asarray(x), kind="vanilla")
    want_v = x.reshape(B, N // 4, 4, IN).transpose(0, 1, 3, 2).reshape(B, N // 4, 4 * IN) @ w + b
    np.testing.assert_allclose(np.asarray(yv), want_v, rtol=1e-4)
    assert not np.allclose(np.asarray(ym), np.asarray(yv))


def test_spp_v1_matches_manual_pool():
    p = projectors.init_vision_projector_kind(jax.random.PRNGKey(0), IN, OUT, kind="spp_v1")
    x = np.random.default_rng(0).normal(size=(1, N, IN)).astype(np.float32)
    y = projectors.apply_vision_projector(p, jnp.asarray(x), kind="spp_v1")
    h = x @ np.asarray(p["linear_1"]["w"]) + np.asarray(p["linear_1"]["b"])
    g = h.reshape(1, 4, 4, OUT)
    pooled = g.reshape(1, 2, 2, 2, 2, OUT).mean(axis=(2, 4)).reshape(1, 4, OUT)
    want = pooled @ np.asarray(p["linear_2"]["w"]) + np.asarray(p["linear_2"]["b"])
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_generate_with_variant_projector():
    """The fused model runs end-to-end with a reducing projector: one
    <image> sentinel expands to out_tokens/4 slots."""
    from vita_tpu.constants import IMAGE_TOKEN_INDEX
    from vita_tpu.generate import GenerationConfig, Generator
    from vita_tpu.tokenization import media_masks

    cfg = vita.VITAConfig.tiny(vision_projector="spp_v1")
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    n_tok = cfg.image_tokens_per_group
    assert n_tok == cfg.vision.out_tokens // 4

    ids = [1, 3] + [IMAGE_TOKEN_INDEX] * n_tok + [7]
    safe, im, am = media_masks(np.array(ids))
    sz = cfg.vision.image_size
    images = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (1, sz, sz, 3)))
    g = Generator(params, cfg, max_len=64, chunk_len=2)
    out = g.generate(safe, image_mask=im, audio_mask=am, images=images,
                     gen=GenerationConfig(max_new_tokens=3, eos_id=-1))
    assert len(out) == 3
