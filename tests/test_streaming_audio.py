"""Streaming audio frontend (serve.streaming_audio): incremental fbank is
bit-identical to batch, the StreamingWhaleEncoder glue reproduces the
chunk-causal full forward (incl. the partial-flush chunk_len path), the
VAD frontend's frame accounting matches the emitted segment, and the
engine's pre-encoded audio path is token-identical to the speech path.

The reference never wired its streaming encoder into serving — it encodes
whole utterances after VAD end (web_demo/web_interactive_demo.py:864-865);
these tests pin the behavior that lets us overlap encode with speech.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.data.audio import SAMPLE_RATE, fbank
from vita_tpu.models import vita, whale
from vita_tpu.serve.streaming_audio import (
    StreamingAudioFrontend,
    StreamingFbank,
    StreamingWhaleEncoder,
)
from vita_tpu.serve.vad import CHUNK_SAMPLES, StreamingVAD, VADConfig, energy_vad_prob


@pytest.fixture(scope="module")
def tiny():
    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_streaming_fbank_matches_batch():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(int(1.7 * SAMPLE_RATE)).astype(np.float32) * 0.1
    want = fbank(wav)

    sf = StreamingFbank()
    parts = []
    pos = 0
    for size in [3000, 117, 4000, 801, 2560, 10000]:
        parts.append(sf.feed(wav[pos : pos + size]))
        pos += size
    parts.append(sf.feed(wav[pos:]))
    got = np.concatenate(parts, axis=0)

    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    assert sf.frames_emitted == want.shape[0]


def _plan(total, block):
    """Per-step output counts incl. the final partial flush (mirrors the
    tail arithmetic in whale.streaming_step / StreamingWhaleEncoder)."""
    tail, outs, pos = 0, [], 0
    steps = list(range(total // block)) + ([1] if total % block else [])
    n_full = total // block
    for i, _ in enumerate(steps):
        n = block if i < n_full else total - n_full * block
        t_total = tail + n
        t_out = max(int(whale.subsampled_length(t_total)), 0)
        outs.append(t_out)
        tail = min(t_total - 4 * t_out, whale.TAIL_MAX)
        pos += n
    return outs


def test_streaming_encoder_matches_chunk_causal_forward(tiny):
    """feed()/finish() over arbitrary frame deliveries == the full forward
    under the equivalent chunk-causal mask; exercises the partial flush."""
    cfg, params = tiny
    block = 64
    total = 3 * block + 37  # forces a partial final block through chunk_len
    frames = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (total, 80)), np.float32
    )

    enc = StreamingWhaleEncoder(
        params["audio"], cfg.audio, frame_block=block, left_context=256
    )
    # deliveries deliberately unaligned with the block size
    for lo, hi in [(0, 10), (10, 70), (70, 71), (71, 200), (200, total)]:
        enc.feed(frames[lo:hi])
    assert enc.flush_steps_remaining() <= 1
    got = enc.finish()

    outs = _plan(total, block)
    t_stream = sum(outs)
    bounds = np.cumsum(outs)
    full_t = int(whale.subsampled_length(total))
    mask = np.zeros((full_t, full_t), bool)
    for qi in range(full_t):
        ci = int(np.searchsorted(bounds, qi, side="right"))
        end = bounds[min(ci, len(bounds) - 1)]
        mask[qi, :end] = True
    want, _ = whale.forward(
        params["audio"], cfg.audio, frames[None], jnp.array([total]),
        attn_chunk_mask=jnp.asarray(mask),
    )
    want = np.asarray(want)[0, :t_stream]

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_streaming_encoder_emits_all_subsampled_frames(tiny):
    """Total emitted features == subsampled_length(total raw frames) for
    many lengths (the tail arithmetic must not drop or invent frames) —
    keeps audio_token_count parity with the batch path."""
    cfg, params = tiny
    for total in [3, 7, 64, 65, 100, 127, 128, 200]:
        enc = StreamingWhaleEncoder(params["audio"], cfg.audio, frame_block=64)
        enc.feed(np.zeros((total, 80), np.float32))
        feats = enc.finish()
        assert feats.shape[0] == max(int(whale.subsampled_length(total)), 0), total


def _speechlike(n_chunks, freq=180.0, level=0.25):
    t = np.arange(n_chunks * CHUNK_SAMPLES) / SAMPLE_RATE
    return np.sin(2 * np.pi * freq * t).astype(np.float32) * level


def test_frontend_end_to_end(tiny):
    """VAD glue: the frontend's utterance matches re-encoding the emitted
    segment from scratch, frame accounting is exact, and end-of-speech
    owes at most the final chunk's frames + one flush step."""
    cfg, params = tiny
    vad = StreamingVAD(VADConfig(min_silence_ms=500, min_dialog_s=1.0),
                       prob_fn=energy_vad_prob)
    fe = StreamingAudioFrontend(params["audio"], cfg.audio, vad=vad,
                                frame_block=64, left_context=256)

    dispatches = {"n": 0}
    orig = fe.encoder._dispatch

    def counting(block, n_valid):
        dispatches["n"] += 1
        return orig(block, n_valid)

    fe.encoder._dispatch = counting

    silence = [np.zeros(CHUNK_SAMPLES, np.float32)] * 4
    speech = _speechlike(10)
    chunks = [*silence,
              *np.split(speech, 10),
              *[np.zeros(CHUNK_SAMPLES, np.float32)] * 6]
    utts = []
    last_call_dispatches = 0
    for c in chunks:
        before = dispatches["n"]
        out = fe.process(c)
        if out is not None:
            utts.append(out)
            last_call_dispatches = dispatches["n"] - before

    assert len(utts) == 1
    utt = utts[0]
    # frame accounting: num_frames is exactly the batch fbank of the
    # emitted segment (drives audio_token_count parity)
    assert utt.num_frames == fbank(utt.wav).shape[0]
    from vita_tpu.tokenization import audio_token_count

    assert utt.token_count == audio_token_count(utt.num_frames)

    # the end-of-speech call did at most: one block completed by the final
    # chunk's frames + the partial flush
    assert last_call_dispatches <= 2

    # features == a fresh encoder fed the batch fbank of the same segment
    enc = StreamingWhaleEncoder(params["audio"], cfg.audio,
                                frame_block=64, left_context=256)
    enc.feed(fbank(utt.wav))
    want = enc.finish()
    np.testing.assert_allclose(utt.features, want, rtol=1e-6, atol=1e-6)

    # a second utterance reuses the (reset) state cleanly
    speech2 = _speechlike(8, freq=240.0)
    for c in [*np.split(speech2, 8), *[np.zeros(CHUNK_SAMPLES, np.float32)] * 6]:
        out = fe.process(c)
        if out is not None:
            utts.append(out)
    assert len(utts) == 2
    assert utts[1].num_frames == fbank(utts[1].wav).shape[0]


def test_frontend_short_utterance_dropped_resets(tiny):
    cfg, params = tiny
    vad = StreamingVAD(VADConfig(min_silence_ms=500, min_dialog_s=5.0),
                       prob_fn=energy_vad_prob)
    fe = StreamingAudioFrontend(params["audio"], cfg.audio, vad=vad)
    chunks = [*np.split(_speechlike(4), 4),
              *[np.zeros(CHUNK_SAMPLES, np.float32)] * 6]
    assert all(fe.process(c) is None for c in chunks)  # ~1 s << 5 s minimum
    assert fe.encoder.frames_fed == 0  # state was reset, not leaked


def test_engine_audio_encoded_matches_speech_path(tiny):
    """A Request carrying pre-encoded Whale features (batch forward output)
    must produce tokens identical to the raw-fbank speech path: only the
    CNN adapter runs at prefill and it zero-masks invalid rows, so the
    two representations are numerically interchangeable."""
    from vita_tpu.serve.engine import Engine, Request
    from vita_tpu.tokenization import (
        AUDIO_TOKEN_INDEX,
        audio_token_count,
        expand_media_sentinels,
        media_masks,
    )

    cfg, params = tiny
    t_raw = 95
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (t_raw, 80)), np.float32
    )
    ids = [1, 3, AUDIO_TOKEN_INDEX, 7]
    expanded = expand_media_sentinels(ids, [], [audio_token_count(t_raw)])
    safe, _, am = media_masks(np.array(expanded))

    eng = Engine(params, cfg, n_slots=1, max_len=128, decode_chunk_len=2)
    r_speech = Request(input_ids=safe, audio_mask=am, speech=feats,
                       speech_length=t_raw, max_new_tokens=5, eos_id=-1)
    eng.submit(r_speech)
    eng.run_until_idle()

    enc, valid = whale.forward(
        params["audio"], cfg.audio, feats[None], jnp.array([t_raw])
    )
    t_sub = int(np.asarray(valid)[0].sum())
    assert t_sub == int(whale.subsampled_length(t_raw))
    encoded = np.asarray(enc, np.float32)[0, :t_sub]

    r_enc = Request(input_ids=safe, audio_mask=am, audio_encoded=encoded,
                    audio_encoded_length=t_sub, max_new_tokens=5, eos_id=-1)
    eng.submit(r_enc)
    eng.run_until_idle()

    assert r_enc.tokens == r_speech.tokens


def test_history_merge_carries_encoded_clips(tiny):
    """ChatSession history keeps pre-encoded turns and merge() returns them
    clip-ordered alongside the current turn (streaming duplex multi-turn)."""
    from vita_tpu.serve.history import ChatSession, HistoryTurn

    cfg, params = tiny
    s = ChatSession(limit=4)
    e1 = np.full((11, cfg.audio.hidden), 1.0, np.float32)
    e2 = np.full((7, cfg.audio.hidden), 2.0, np.float32)
    m1 = s.merge("<audio>", encoded=e1, encoded_length=11)
    assert m1.encoded_lengths == [11]
    s.add(HistoryTurn(prompt="<audio>", response="first answer",
                      encoded=e1, encoded_length=11))
    m2 = s.merge("<audio>", encoded=e2, encoded_length=7)
    assert m2.encoded_lengths == [11, 7]
    assert m2.encodeds[0] is e1 and m2.encodeds[1] is e2
    assert m2.prompt.count("<audio>") == 2
