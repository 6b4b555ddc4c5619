"""Camera buffer for duplex video context (serve.camera): ring semantics,
frameCat grouping/padding, and an engine-driven audio+video query.

Reference behavior: the interactive demo buffers the last 8 webcam frames
and attaches them to each VAD query (web_interactive_demo.py:706-720).
"""

import jax
import numpy as np
import pytest

from vita_tpu.models import vita
from vita_tpu.serve.camera import CameraBuffer, synthetic_camera_frames


def test_camera_buffer_ring_and_patch_tiles():
    cam = CameraBuffer(max_frames=8)
    assert cam.snapshot_tiles("patch") == (None, 0)
    frames = synthetic_camera_frames(12, 24)
    for f in frames:
        cam.push(f)
    tiles, groups = cam.snapshot_tiles("patch")
    assert len(tiles) == 8 and groups == 8  # only the last 8 kept
    np.testing.assert_array_equal(tiles[-1], frames[-1])
    np.testing.assert_array_equal(tiles[0], frames[4])


def test_camera_buffer_framecat_grouping_and_padding():
    cam = CameraBuffer(max_frames=8)
    for f in synthetic_camera_frames(6, 24):
        cam.push(f)
    tiles, groups = cam.snapshot_tiles("framecat")
    # 6 frames pad (repeat last) to 8 -> two 5-tuples [mosaic, f1..f4]
    assert groups == 2 and len(tiles) == 10
    assert all(t.shape == (24, 24, 3) for t in tiles)
    np.testing.assert_array_equal(tiles[9], tiles[8])  # padded repeat

    cam2 = CameraBuffer()
    cam2.push(synthetic_camera_frames(1, 24)[0])
    tiles2, groups2 = cam2.snapshot_tiles("framecat")
    assert groups2 == 1 and len(tiles2) == 5  # 1 frame pads to a quad


def test_camera_rejects_bad_frames():
    cam = CameraBuffer()
    with pytest.raises(ValueError, match="uint8"):
        cam.push(np.zeros((8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="uint8"):
        cam.push(np.zeros((8, 8), np.uint8))


def test_engine_video_plus_encoded_audio_query():
    """The duplex camera query shape: <image>+<audio> with PRE-ENCODED
    audio features and buffered frames, through the real engine."""
    from vita_tpu.data.image import normalize
    from vita_tpu.models import whale
    from vita_tpu.serve.engine import Engine, Request
    from vita_tpu.tokenization import (
        expand_media_sentinels,
        media_masks,
        tokenize_multimodal,
    )

    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    sz = cfg.vision.image_size

    cam = CameraBuffer(max_frames=8)
    for f in synthetic_camera_frames(8, sz):
        cam.push(f)
    tiles, groups = cam.snapshot_tiles(cfg.vision_fusion)
    images = normalize(tiles)
    img_counts = [groups * cfg.image_tokens_per_group]

    t_raw = 80
    import jax.numpy as jnp

    feats = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (t_raw, 80)),
                       np.float32)
    enc, valid = whale.forward(params["audio"], cfg.audio, feats[None],
                               jnp.array([t_raw]))
    t_sub = int(np.asarray(valid)[0].sum())
    encoded = np.asarray(enc, np.float32)[0, :t_sub]

    ids = tokenize_multimodal("<image>\n<audio>", lambda s: [3 + b for b in s.encode()],
                              bos_id=1)
    expanded = expand_media_sentinels(ids, img_counts, [(t_sub - 1) // 2 + 1])
    safe, im, am = media_masks(np.array(expanded))

    eng = Engine(params, cfg, n_slots=1, max_len=4096, decode_chunk_len=2)
    req = Request(input_ids=safe, image_mask=im, audio_mask=am, images=images,
                  audio_encoded=encoded, audio_encoded_length=t_sub,
                  max_new_tokens=4, eos_id=-1)
    eng.submit(req)
    eng.run_until_idle()
    assert len(req.tokens) == 4
