"""Streaming whale encoder: chunked outputs match the full forward under
the equivalent chunk-causal attention mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import whale as wh


def _chunk_plan(total_frames, chunk_frames):
    """Replicate the streaming tail arithmetic: per-step output counts."""
    tail = 0
    outs = []
    consumed_raw = 0
    while consumed_raw + chunk_frames <= total_frames:
        t_total = tail + chunk_frames
        t_out = wh.subsampled_length(t_total)
        outs.append(int(t_out))
        consumed = 4 * t_out
        tail = t_total - consumed
        consumed_raw += chunk_frames
    return outs


def test_streaming_matches_full_with_chunk_mask():
    cfg = wh.WhaleConfig.tiny()
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    b, chunk, n_chunks = 1, 64, 4
    total = chunk * n_chunks
    speech = jax.random.normal(jax.random.PRNGKey(1), (b, total, 80))

    # streaming pass
    state = wh.streaming_init(cfg, b, chunk, left_context=256)
    stream_outs = []
    for i in range(n_chunks):
        seg = speech[:, i * chunk : (i + 1) * chunk]
        feats, valid, state = wh.streaming_step(params, cfg, state, seg)
        n = int(valid[0].sum())
        stream_outs.append(np.asarray(feats[:, :n]))
    stream_cat = np.concatenate(stream_outs, axis=1)

    # full forward over the consumed frames with the equivalent mask
    outs = _chunk_plan(total, chunk)
    t_stream = sum(outs)
    consumed_raw_frames = 4 * t_stream + 3  # inputs covered by t_stream outputs
    full_t = int(wh.subsampled_length(total))
    # chunk-causal mask on the full output length: q in chunk i sees kv <= end_i
    bounds = np.cumsum(outs)
    mask = np.zeros((full_t, full_t), bool)
    for qi in range(full_t):
        ci = int(np.searchsorted(bounds, qi, side="right"))
        end = bounds[min(ci, len(bounds) - 1)]
        mask[qi, :end] = True
    full, valid = wh.forward(
        params, cfg, speech, jnp.array([total]), attn_chunk_mask=jnp.asarray(mask)
    )
    full_np = np.asarray(full)[:, :t_stream]

    assert stream_cat.shape == full_np.shape
    np.testing.assert_allclose(stream_cat, full_np, rtol=2e-3, atol=2e-3)


def test_streaming_state_shapes_static():
    """State pytree shapes are identical across steps (jit-stable)."""
    cfg = wh.WhaleConfig.tiny()
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    state = wh.streaming_init(cfg, 1, 32, left_context=64)
    shapes0 = {k: getattr(v, "shape", None) for k, v in state.items()}
    step = jax.jit(lambda p, s, c: wh.streaming_step(p, cfg, s, c))
    for i in range(3):
        chunk = jnp.ones((1, 32, 80)) * (i + 1)
        feats, valid, state = step(params, state, chunk)
    shapes1 = {k: getattr(v, "shape", None) for k, v in state.items()}
    assert shapes0 == shapes1


def test_streaming_bounded_context_limits_attention():
    """With a tiny left_context, early audio must stop influencing
    late outputs (bounded memory)."""
    cfg = wh.WhaleConfig.tiny()
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    chunk, n_chunks = 64, 6

    def run(first_chunk_scale):
        state = wh.streaming_init(cfg, 1, chunk, left_context=16)
        outs = []
        for i in range(n_chunks):
            seg = jax.random.normal(jax.random.PRNGKey(i + 10), (1, chunk, 80))
            if i == 0:
                seg = seg * first_chunk_scale
            feats, valid, state = wh.streaming_step(params, cfg, state, seg)
            outs.append(np.asarray(feats[:, : int(valid[0].sum())]))
        return outs

    a = run(1.0)
    b = run(5.0)
    # first chunk differs
    assert not np.allclose(a[0], b[0])
    # last chunk is identical: the perturbed audio fell out of the window
    np.testing.assert_allclose(a[-1], b[-1], rtol=1e-4, atol=1e-4)


def test_whale_flash_backend_matches_xla():
    """Fused flash whale attention (augmented-key fold of the no-rel-shift
    XL terms) == the XLA path, incl. padded rows masked by lengths."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg = wh.WhaleConfig.tiny()
    cfg_f = dataclasses.replace(cfg, attn_backend="flash")
    params = wh.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 120, 80))
    lengths = jnp.asarray([120, 70])
    ref, v1 = wh.forward(params, cfg, x, lengths)
    with pltpu.force_tpu_interpret_mode():
        got, v2 = wh.forward(params, cfg_f, x, lengths)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)[..., None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, rtol=2e-4, atol=2e-4
    )
