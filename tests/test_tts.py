"""Local TTS (serve.tts): synthesis properties, worker stale-drop/pause
protocol, and duration-paced streaming with stale-turn skipping.

Protocol parity target: the reference tts_worker + text_streamer
(web_demo/web_interactive_demo.py:419-601,743-772).
"""

import queue
import time
import wave

import numpy as np
import pytest

from vita_tpu.serve.tts import (
    FormantSynthesizer,
    PacedStreamer,
    TTSChunk,
    TTSWorker,
    normalize_tts_text,
    write_wav,
)


def test_normalize_tts_text():
    assert normalize_tts_text("<1>Hello, World!</s>") == "hello, world!"
    # uncommon punctuation dropped, common kept
    assert normalize_tts_text('He said «ok» — fine.') == "he said ok fine."
    # spoken math
    assert "sine" in normalize_tts_text("sin(x) + cos(y)")
    assert normalize_tts_text("2^10 big") == "2 to the power 10 big"
    assert normalize_tts_text("<2>") == ""


def test_synthesizer_output_properties():
    s = FormantSynthesizer()
    a = s.synthesize("hello world.")
    assert a.dtype == np.float32 and a.ndim == 1
    assert a.size > 0.5 * s.sr  # a short sentence is still audible-length
    assert np.max(np.abs(a)) <= 1.0
    assert np.isfinite(a).all()
    # deterministic per text; different text differs
    np.testing.assert_array_equal(a, FormantSynthesizer().synthesize("hello world."))
    b = FormantSynthesizer().synthesize("a totally different sentence!")
    assert a.shape != b.shape or not np.allclose(a, b)
    # longer text -> longer audio
    assert FormantSynthesizer().synthesize("one two three four five.").size > a.size
    assert FormantSynthesizer().synthesize("<1></s>").size == 0


def test_write_wav_roundtrip(tmp_path):
    path = str(tmp_path / "x.wav")
    audio = FormantSynthesizer().synthesize("test clip.")
    write_wav(path, audio)
    with wave.open(path, "rb") as f:
        assert f.getframerate() == 16000
        assert f.getnchannels() == 1
        assert f.getnframes() == audio.size
        raw = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    np.testing.assert_allclose(raw / 32767.0, audio, atol=1.0 / 32000)


def _drain(worker, n, timeout=30.0):
    got = []
    t0 = time.time()
    while len(got) < n and time.time() - t0 < timeout:
        try:
            got.append(worker.outputs.get(timeout=0.1))
        except queue.Empty:
            pass
    return got


def test_worker_synthesizes_in_order():
    w = TTSWorker()
    try:
        w.submit(1, "first sentence.")
        w.submit(1, "second one here.")
        a, b = _drain(w, 2)
        assert a.llm_id == b.llm_id == 1
        assert a.text == "first sentence." and b.text == "second one here."
        assert a.duration_s == pytest.approx(a.audio.size / 16000)
    finally:
        w.stop()


def test_worker_turn_change_emits_pause():
    """A new llm_id mid-stream produces a PAUSE chunk before the new
    turn's audio (reference :565-575 puts a 0.2 s |PAUSE|)."""
    w = TTSWorker()
    try:
        w.submit(1, "old turn sentence.")
        w.submit(2, "new turn sentence.")
        chunks = _drain(w, 3)
        kinds = [(c.llm_id, c.is_pause) for c in chunks]
        assert kinds == [(1, False), (2, True), (2, False)]
        assert chunks[1].duration_s == pytest.approx(0.2)
    finally:
        w.stop()


def test_streamer_paces_by_duration_and_drops_stale():
    """Chunks from a superseded turn are skipped (not played); played
    chunks sleep pace_factor x duration."""
    q: "queue.Queue[TTSChunk]" = queue.Queue()
    current = {"id": 2}
    sleeps = []
    played = []
    s = PacedStreamer(
        q, current_llm_id=lambda: current["id"],
        on_play=lambda c: played.append(c.text),
        pace_factor=1.5, sleep=sleeps.append,
    )
    try:
        audio = np.zeros(16000, np.float32)
        q.put(TTSChunk(1, "stale sentence", audio, 1.0))  # old turn
        q.put(TTSChunk(2, "", None, 0.2))  # pause marker
        q.put(TTSChunk(2, "live sentence", audio, 1.0))
        t0 = time.time()
        while (len(played) < 1 or s.skipped_stale < 1) and time.time() - t0 < 10:
            time.sleep(0.01)
        assert played == ["live sentence"]
        assert s.skipped_stale == 1
        # pause slept 0.2, live chunk slept 1.5 * 1.0
        assert sleeps == [pytest.approx(0.2), pytest.approx(1.5)]
    finally:
        s.stop()


def test_worker_streamer_integration_interrupt():
    """End-to-end: turn 1 queued, interrupt switches current to turn 2 —
    turn 1 chunks synthesized before the switch are dropped at playback."""
    w = TTSWorker()
    current = {"id": 1}
    played = []
    s = PacedStreamer(
        w.outputs, current_llm_id=lambda: current["id"],
        on_play=lambda c: played.append((c.llm_id, c.text)),
        pace_factor=0.0,  # fast test
    )
    try:
        w.submit(1, "turn one says something.")
        w.drain()
        time.sleep(0.5)  # let it synthesize + play
        current["id"] = 2  # interrupt lands
        w.submit(1, "turn one late chunk.")  # synthesized but stale
        w.submit(2, "turn two answer.")
        w.drain()
        t0 = time.time()
        while len(played) < 2 and time.time() - t0 < 20:
            time.sleep(0.05)
        assert played[0] == (1, "turn one says something.")
        assert played[-1] == (2, "turn two answer.")
        assert all(p != (1, "turn one late chunk.") for p in played)
        assert s.skipped_stale >= 1
    finally:
        w.stop()
        s.stop()
