"""Host preprocessing: tiling grids, frameCat structure, Kaldi fbank.

Tile counts below were captured from the reference's dynamic_preprocess
(data_utils_video_audio_neg_patch.py:1214-1255 and ...neg_frameCat.py:
1231-1303) on the same shapes; both schemes were verified pixel-exact
against the reference at build time.
"""

import numpy as np
import pytest

from vita_tpu.data.audio import fbank, mel_banks, resample
from vita_tpu.data.image import (
    candidate_grids,
    closest_grid,
    dynamic_tile,
    dynamic_tile_framecat,
    normalize,
    sample_video_frames,
)


@pytest.mark.parametrize(
    "w,h,expected_tiles",
    [(800, 600, 13), (448, 448, 1), (1920, 1080, 9), (300, 900, 4), (640, 640, 5), (1024, 200, 6)],
)
def test_dynamic_tile_counts(w, h, expected_tiles):
    img = np.zeros((h, w, 3), np.uint8)
    tiles = dynamic_tile(img, 1, 12, 448, use_thumbnail=True)
    assert len(tiles) == expected_tiles
    assert all(t.shape == (448, 448, 3) for t in tiles)


@pytest.mark.parametrize(
    "w,h,expected_tiles", [(800, 600, 20), (1920, 1080, 10), (500, 500, 5), (300, 900, 10)]
)
def test_framecat_tile_counts(w, h, expected_tiles):
    img = np.zeros((h, w, 3), np.uint8)
    tiles = dynamic_tile_framecat(img, 1, 12, 448)
    assert len(tiles) == expected_tiles
    assert len(tiles) % 5 == 0  # [big, tl, tr, bl, br] groups


def test_closest_grid_prefers_matching_aspect():
    grids = candidate_grids(1, 12)
    assert closest_grid(896, 448, grids, 448) == (2, 1)
    assert closest_grid(448, 896, grids, 448) == (1, 2)


def test_normalize_range():
    tiles = [np.full((448, 448, 3), 128, np.uint8)]
    x = normalize(tiles)
    assert x.shape == (1, 448, 448, 3)
    assert abs(float(x.mean())) < 1.0


def test_fbank_frame_count():
    # snip_edges arithmetic: 1 + (T - 400)//160
    wav = np.zeros(16000, np.float32)  # 1 s
    feats = fbank(wav)
    assert feats.shape == (1 + (16000 - 400) // 160, 80)
    assert fbank(np.zeros(300, np.float32)).shape == (0, 80)


def test_fbank_deterministic_without_dither():
    rng = np.random.RandomState(0)
    wav = rng.randn(8000).astype(np.float32) * 0.1
    np.testing.assert_array_equal(fbank(wav), fbank(wav))


def test_fbank_responds_to_frequency():
    """A 1 kHz tone must put its energy in the right mel bins."""
    t = np.arange(16000) / 16000
    for freq, expect_low in ((200.0, True), (6000.0, False)):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.5
        feats = fbank(wav)
        peak_bin = int(np.argmax(feats.mean(axis=0)))
        assert (peak_bin < 30) == expect_low, (freq, peak_bin)


def test_mel_banks_cover_spectrum():
    banks = mel_banks(80, 512, 16000, 20.0, 0.0)
    assert banks.shape == (80, 256)
    # every bin has some support; interior fft bins are covered
    assert (banks.sum(axis=1) > 0).all()
    assert (banks.sum(axis=0)[5:250] > 0).all()


def test_resample_preserves_duration():
    wav = np.random.RandomState(0).randn(44100).astype(np.float32)
    out = resample(wav, 44100, 16000)
    assert abs(len(out) - 16000) <= 2


def test_sample_video_frames_limits():
    idx = sample_video_frames(3000, fps=30.0, sample_fps=1.0, max_frames=16, min_frames=4)
    assert len(idx) == 16  # 100 s video clamps to max
    idx = sample_video_frames(60, fps=30.0, sample_fps=1.0, max_frames=16, min_frames=4)
    assert len(idx) == 4  # 2 s video clamps to min
    assert idx.max() < 60


def test_native_fbank_matches_numpy():
    """C++ fbank (native/fbank.cc via ctypes) == numpy oracle."""
    from vita_tpu.native import fbank_native, native_available

    if not native_available():
        pytest.skip("g++ build unavailable")
    rng = np.random.RandomState(0)
    wav = (rng.randn(16000) * 0.1).astype(np.float32)
    a = fbank(wav)
    b = fbank_native(wav)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
