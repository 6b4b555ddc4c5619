"""Encoder towers + projectors vs golden vectors from the reference.

Goldens in tests/goldens/*.npz were produced by running the reference's
shipped torch modeling files (web_demo/vllm_tools/model_weight_file/
modeling_intern_vit.py / modeling_whale.py, and the projector math of
vllm_file/mixtral.py:805-859) with seeded random weights on fixed inputs.
Each .npz stores the torch state_dict + input + expected output, so the
tests run standalone.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import internvit as iv
from vita_tpu.models import projectors as pj
from vita_tpu.models import whale as wh
from vita_tpu.utils.hf_import import (
    audio_projector_from_hf,
    internvit_params_from_hf,
    vision_projector_from_hf,
    whale_params_from_hf,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def _state(z, prefix):
    return {k[len(prefix):]: v for k, v in z.items() if k.startswith(prefix)}


def test_internvit_golden():
    z = np.load(GOLDEN_DIR / "internvit_tiny.npz")
    cfg = iv.InternViTConfig.tiny()
    params = jax.tree.map(jnp.asarray, internvit_params_from_hf(_state(z, "sd_"), cfg.n_layers))
    img_nhwc = z["image"].transpose(0, 2, 3, 1)
    out = iv.forward(params, cfg, jnp.asarray(img_nhwc))
    np.testing.assert_allclose(np.asarray(out), z["expected"], rtol=1e-4, atol=1e-5)


def test_internvit_output_geometry():
    cfg = iv.InternViTConfig.vita_300m()
    assert cfg.num_patches == 1024  # 32x32 grid at 448/14
    assert cfg.out_tokens == 256  # pixel-shuffle x0.5
    assert cfg.out_dim == 4096


def test_whale_golden():
    z = np.load(GOLDEN_DIR / "whale_tiny.npz")
    cfg = wh.WhaleConfig.tiny()
    params = jax.tree.map(jnp.asarray, whale_params_from_hf(_state(z, "sd_"), cfg.n_layers))
    out, valid = wh.forward(params, cfg, jnp.asarray(z["feats"]), jnp.asarray(z["lengths"]))
    v = np.asarray(valid)
    np.testing.assert_array_equal(v, z["valid"])
    got = np.asarray(out) * v[..., None]
    want = z["expected"] * v[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_whale_subsampled_length():
    # mask-slicing arithmetic [2::2][2::2] equals conv arithmetic
    for t in range(8, 500, 7):
        sliced = len(range(t)[2::2][2::2])
        assert wh.subsampled_length(t) == sliced


def test_whale_padding_invariance():
    """Extra padded frames must not change valid-frame outputs."""
    cfg = wh.WhaleConfig.tiny()
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 60, 80))
    lengths = jnp.array([60])
    out1, v1 = wh.forward(params, cfg, x, lengths)
    xpad = jnp.concatenate([x, jnp.full((1, 20, 80), 7.0)], axis=1)
    out2, v2 = wh.forward(params, cfg, xpad, lengths)
    n = int(v1.sum())
    np.testing.assert_allclose(
        np.asarray(out1[:, :n]), np.asarray(out2[:, :n]), rtol=1e-4, atol=1e-5
    )


def test_projectors_golden():
    z = np.load(GOLDEN_DIR / "projectors_tiny.npz")
    vp = jax.tree.map(jnp.asarray, vision_projector_from_hf(_state(z, "vsd_")))
    vout = pj.vision_projector(vp, jnp.asarray(z["vis_x"]))
    np.testing.assert_allclose(np.asarray(vout), z["vis_expected"], rtol=1e-4, atol=1e-5)

    ap = jax.tree.map(jnp.asarray, audio_projector_from_hf(_state(z, "asd_")))
    aout, avalid = pj.audio_projector(
        ap, jnp.asarray(z["aud_x"]), jnp.asarray(z["aud_mask"]).astype(bool)
    )
    np.testing.assert_allclose(np.asarray(aout), z["aud_expected"], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(avalid), z["aud_mask"][:, 0::2].astype(bool))


def test_audio_pipeline_token_rate():
    """whale + adapter token count matches the serving formula
    (audio_token_count): T fbank frames -> ((T-1)//2-1)//2 -> (x-1)//2+1."""
    from vita_tpu.tokenization import audio_token_count

    cfg = wh.WhaleConfig.tiny()
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    aparams = pj.init_audio_projector(jax.random.PRNGKey(1), cfg.hidden, 48)
    for t in (100, 237, 400):
        x = jnp.zeros((1, t, 80))
        out, valid = wh.forward(params, cfg, x, jnp.array([t]))
        proj, pvalid = pj.audio_projector(aparams, out, valid)
        assert int(pvalid.sum()) == audio_token_count(t), t


def test_pixel_shuffle_matches_reference_permutation():
    """pixel_shuffle must equal the exact torch view/permute sequence
    (internvit_encoder.py:42-53), checked via numpy replication."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 16).astype(np.float32)

    def ref(x, scale=0.5):
        n, w, h, c = x.shape
        y = x.reshape(n, w, int(h * scale), int(c / scale))
        y = y.transpose(0, 2, 1, 3)
        y = y.reshape(n, int(h * scale), int(w * scale), int(c / (scale**2)))
        return y.transpose(0, 2, 1, 3)

    np.testing.assert_array_equal(np.asarray(iv.pixel_shuffle(jnp.asarray(x))), ref(x))


def test_pos_embed_interpolation_matches_torch_bicubic():
    """interpolate_pos_embed must match torch F.interpolate(mode='bicubic',
    align_corners=False) — the reference's _get_pos_embed — not
    jax.image's different cubic kernel."""
    import torch
    import torch.nn.functional as F

    from vita_tpu.models.internvit import interpolate_pos_embed

    rng = np.random.default_rng(0)
    d, src, dst = 8, 32, 16
    pos = rng.standard_normal((1, src * src + 1, d)).astype(np.float32)

    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), src, dst))
    grid = torch.from_numpy(pos[:, 1:]).reshape(1, src, src, d).permute(0, 3, 1, 2)
    want_grid = F.interpolate(grid, size=(dst, dst), mode="bicubic",
                              align_corners=False)
    want = np.concatenate(
        [pos[:, :1],
         want_grid.permute(0, 2, 3, 1).reshape(1, dst * dst, d).numpy()],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # upsampling direction too
    got_up = np.asarray(interpolate_pos_embed(jnp.asarray(pos), src, 40))
    grid_up = F.interpolate(grid, size=(40, 40), mode="bicubic",
                            align_corners=False)
    want_up = np.concatenate(
        [pos[:, :1],
         grid_up.permute(0, 2, 3, 1).reshape(1, 40 * 40, d).numpy()], axis=1)
    np.testing.assert_allclose(got_up, want_up, rtol=2e-5, atol=2e-5)


def test_internvit_rejects_odd_patch_grid():
    from vita_tpu.models import internvit

    cfg = internvit.InternViTConfig.tiny()
    params = internvit.init_params(jax.random.PRNGKey(0), cfg)
    side = cfg.patch_size * 3  # odd grid: passes %patch check, breaks shuffle
    with pytest.raises(ValueError, match="EVEN patch grid"):
        internvit.forward(params, cfg, jnp.zeros((1, side, side, 3)))


def test_load_wav_24bit(tmp_path):
    import struct
    import wave

    from vita_tpu.data.audio import load_wav

    t = np.arange(1600)
    sig = (0.25 * np.sin(2 * np.pi * 200 * t / 16000))
    q = np.round(sig * (2**23 - 1)).astype(np.int32)
    raw = b"".join(struct.pack("<i", v)[:3] for v in q)
    p = tmp_path / "s24.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(raw)
    out = load_wav(str(p))
    np.testing.assert_allclose(out, sig, atol=2e-6)
