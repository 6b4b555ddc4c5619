"""Fusion-layer tests: embedding merge, label building, end-to-end tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.constants import AUDIO_TOKEN_INDEX, IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vita_tpu.generate import GenerationConfig, Generator
from vita_tpu.models import vita
from vita_tpu.tokenization import expand_media_sentinels, media_masks


@pytest.fixture(scope="module")
def tiny_cfg():
    return vita.VITAConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return vita.init_params(jax.random.PRNGKey(0), tiny_cfg)


def test_merge_embeddings_orders_features_correctly():
    d = 4
    tok = jnp.zeros((1, 6, d))
    img_mask = jnp.array([[False, True, True, False, False, False]])
    aud_mask = jnp.array([[False, False, False, False, True, False]])
    img_feats = jnp.arange(2 * d, dtype=jnp.float32).reshape(1, 2, d) + 100
    aud_feats = jnp.full((1, 1, d), -7.0)
    out = vita.merge_embeddings(tok, img_mask, aud_mask, img_feats, aud_feats)
    np.testing.assert_array_equal(np.asarray(out[0, 1]), np.asarray(img_feats[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.asarray(img_feats[0, 1]))
    np.testing.assert_array_equal(np.asarray(out[0, 4]), np.asarray(aud_feats[0, 0]))
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.zeros(d))


def test_build_labels_masks_media_and_prompt():
    ids = jnp.array([[5, 6, 7, 8, 9]])
    media = jnp.array([[False, True, True, False, False]])
    answer = jnp.array([[False, False, False, True, True]])
    labels = vita.build_labels(ids, media, answer)
    np.testing.assert_array_equal(
        np.asarray(labels[0]), [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 8, 9]
    )


def test_multimodal_forward_shapes(tiny_cfg, tiny_params):
    """image + audio prompt through the full tiny stack."""
    img_tokens = tiny_cfg.vision.out_tokens  # tiny: 4
    ids = [1, 7] + [IMAGE_TOKEN_INDEX] * img_tokens + [9] + [AUDIO_TOKEN_INDEX] * 3 + [2]
    safe, im, am = media_masks(np.array(ids))
    images = jnp.zeros((1, tiny_cfg.vision.image_size, tiny_cfg.vision.image_size, 3))
    # audio clip long enough to produce >= 3 adapter frames
    speech = jnp.zeros((1, 50, 80))
    logits, _, aux = vita.forward(
        tiny_params, tiny_cfg,
        jnp.asarray(safe)[None], jnp.asarray(im)[None], jnp.asarray(am)[None],
        images=images, speech=speech, speech_lengths=jnp.array([50]),
    )
    assert logits.shape == (1, len(ids), tiny_cfg.llm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_media_embedding_changes_output(tiny_cfg, tiny_params):
    """Different image pixels must change logits after the image slots."""
    img_tokens = tiny_cfg.vision.out_tokens
    ids = [1] + [IMAGE_TOKEN_INDEX] * img_tokens + [5]
    safe, im, am = media_masks(np.array(ids))
    args = (jnp.asarray(safe)[None], jnp.asarray(im)[None], jnp.asarray(am)[None])
    sz = tiny_cfg.vision.image_size
    l1, _, _ = vita.forward(tiny_params, tiny_cfg, *args, images=jnp.zeros((1, sz, sz, 3)))
    l2, _, _ = vita.forward(tiny_params, tiny_cfg, *args, images=jnp.ones((1, sz, sz, 3)))
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))
    # but the BOS position (before any media) is unchanged
    np.testing.assert_allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]), rtol=1e-5, atol=1e-5)


def test_generate_text_only(tiny_cfg, tiny_params):
    g = Generator(tiny_params, tiny_cfg, max_len=32)
    out = g.generate(np.array([1, 5, 9], np.int32), gen=GenerationConfig(max_new_tokens=5))
    assert 1 <= len(out) <= 5
    assert all(0 <= t < tiny_cfg.llm.vocab_size for t in out)


def test_generate_multimodal_matches_full_forward(tiny_cfg, tiny_params):
    """Greedy generate must equal argmax over a manual full forward pass."""
    img_tokens = tiny_cfg.vision.out_tokens
    ids = [1, 3] + [IMAGE_TOKEN_INDEX] * img_tokens + [7]
    safe, im, am = media_masks(np.array(ids))
    sz = tiny_cfg.vision.image_size
    images = jax.random.normal(jax.random.PRNGKey(5), (1, sz, sz, 3))

    logits, _, _ = vita.forward(
        tiny_params, tiny_cfg,
        jnp.asarray(safe)[None], jnp.asarray(im)[None], jnp.asarray(am)[None],
        images=images,
    )
    expected_first = int(jnp.argmax(logits[0, -1]))

    g = Generator(tiny_params, tiny_cfg, max_len=64)
    out = g.generate(
        safe, image_mask=im, audio_mask=am, images=np.asarray(images),
        gen=GenerationConfig(max_new_tokens=3),
    )
    assert out[0] == expected_first


def test_generate_cache_capacity_guard(tiny_cfg, tiny_params):
    g = Generator(tiny_params, tiny_cfg, max_len=8)
    with pytest.raises(ValueError, match="cache capacity"):
        g.generate(np.arange(1, 6, dtype=np.int32), gen=GenerationConfig(max_new_tokens=10))


def test_generate_stop_sequences(tiny_cfg, tiny_params):
    from vita_tpu.generate import ends_with_stop, stop_sequences_from_keywords

    seqs = stop_sequences_from_keywords(["</s>"], lambda s: [1, 42, 43], bos_id=1)
    assert seqs == ((42, 43),)
    assert ends_with_stop([5, 42, 43], seqs)
    assert not ends_with_stop([42, 43, 5], seqs)

    # generation stops as soon as the stop sequence is produced
    g = Generator(tiny_params, tiny_cfg, max_len=64)
    free = g.generate(np.array([1, 5, 9], np.int32),
                      gen=GenerationConfig(max_new_tokens=8, eos_id=-1))
    assert len(free) >= 2
    stop = (tuple(free[:2]),)
    out = g.generate(np.array([1, 5, 9], np.int32),
                     gen=GenerationConfig(max_new_tokens=8, eos_id=-1, stop_sequences=stop))
    assert out == free[:2]


def test_generate_top_p(tiny_cfg, tiny_params):
    g = Generator(tiny_params, tiny_cfg, max_len=32)
    out = g.generate(np.array([1, 5], np.int32),
                     gen=GenerationConfig(max_new_tokens=4, temperature=1.0, top_p=0.8, eos_id=-1),
                     seed=3)
    assert len(out) == 4


def test_vita_with_alternative_tower():
    """The fused model accepts a non-default vision tower (SigLIP)."""
    import dataclasses

    from vita_tpu.models import siglip

    cfg = vita.VITAConfig.tiny()
    cfg = dataclasses.replace(cfg, vision=siglip.SigLIPConfig.tiny(), vision_tower="siglip")
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    n_tok = cfg.vision.out_tokens
    ids = [1] + [IMAGE_TOKEN_INDEX] * n_tok + [5]
    safe, im, am = media_masks(np.array(ids))
    sz = cfg.vision.image_size
    logits, _, _ = vita.forward(
        params, cfg,
        jnp.asarray(safe)[None], jnp.asarray(im)[None], jnp.asarray(am)[None],
        images=jnp.zeros((1, sz, sz, 3)),
    )
    assert logits.shape == (1, len(ids), cfg.llm.vocab_size)
    # sharding specs exist for the alt tower (replicated fallback)
    specs = vita.param_specs(cfg)
    assert len(jax.tree.leaves(specs["vision"], is_leaf=lambda x: hasattr(x, "index"))) > 0


def test_vita_unknown_tower_raises():
    import dataclasses

    cfg = dataclasses.replace(vita.VITAConfig.tiny(), vision_tower="resnet")
    with pytest.raises(ValueError, match="unknown vision_tower"):
        vita.init_params(jax.random.PRNGKey(0), cfg)


def test_internvit_dynamic_resolution():
    """Non-default (but patch-aligned) input sizes work via pos-embed
    interpolation; wrong sizes raise a clear error."""
    from vita_tpu.models import internvit as iv

    cfg = iv.InternViTConfig.tiny()  # trained at 56 (grid 4)
    params = iv.init_params(jax.random.PRNGKey(0), cfg)
    out = iv.forward(params, cfg, jnp.zeros((1, 84, 84, 3)))  # grid 6
    assert out.shape == (1, 9, cfg.out_dim)  # (6*0.5)^2 tokens
    with pytest.raises(ValueError, match="square images"):
        iv.forward(params, cfg, jnp.zeros((1, 84, 70, 3)))
