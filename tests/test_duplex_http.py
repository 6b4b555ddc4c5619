"""Browser duplex demo transport (VERDICT r3 missing item 1): recorded PCM
chunks POSTed over HTTP must drive the full duplex stack — VAD events,
monitor-engine queries, streamed text, interrupt role-swap, noise
rejection, TTS wav events — exactly what a live microphone page produces.
Reference artifact: web_demo/web_interactive_demo.py:683-908 (mic loop
:776-865)."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from vita_tpu.models import vita
from vita_tpu.serve.duplex_http import DuplexWebApp, make_handler
from vita_tpu.serve.vad import CHUNK_SAMPLES, SAMPLE_RATE


@pytest.fixture(scope="module")
def tiny():
    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _mk_app(cfg, params, **kw):
    from vita_tpu.cli import ByteTokenizer

    tok = ByteTokenizer()
    kw.setdefault("max_new_tokens", 24)
    kw.setdefault("max_len", 1024)
    kw.setdefault("warm", True)
    return DuplexWebApp(params, cfg, tok.encode, tok.decode, tok.bos_id, -1,
                        **kw)


def _session_pcm():
    from vita_tpu.serve.duplex_demo import synth_session

    return np.concatenate(synth_session())


@pytest.mark.slow
def test_duplex_over_http_end_to_end(tiny):
    cfg, params = tiny
    app = _mk_app(cfg, params)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    events = []
    stop = threading.Event()

    def sse_reader():
        req = urllib.request.urlopen(base + "/events", timeout=60)
        buf = b""
        while not stop.is_set():
            line = req.readline()
            if not line:
                break
            if line.startswith(b"data: "):
                events.append(json.loads(line[6:]))

    rt = threading.Thread(target=sse_reader, daemon=True)
    rt.start()

    # the page itself serves
    page = urllib.request.urlopen(base + "/", timeout=10).read().decode()
    assert "getUserMedia" in page and "/audio" in page and "EventSource" in page

    # a camera frame (webcam path)
    import io

    from PIL import Image

    jpg = io.BytesIO()
    Image.fromarray(
        np.zeros((120, 160, 3), np.uint8) + 64
    ).save(jpg, format="JPEG")
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/camera", data=jpg.getvalue(),
                               method="POST"), timeout=10)
    assert json.loads(r.read())["frames"] == 1

    # stream the recorded session as the browser would: ~256 ms int16 chunks
    pcm = _session_pcm()
    i16 = (np.clip(pcm, -1, 1) * 32767).astype("<i2")
    step = CHUNK_SAMPLES
    deadline = time.time() + 300
    for i in range(0, len(i16), step):
        urllib.request.urlopen(
            urllib.request.Request(base + "/audio",
                                   data=i16[i:i + step].tobytes(),
                                   method="POST"), timeout=30)
        # pace roughly like the reference's real-time mic (much faster is
        # fine; the engines run in threads)
        if time.time() > deadline:
            break
        # give the second utterance's interrupt time to land
        if app.n_utterances == 1:
            time.sleep(0.02)

    assert app.drain_audio(timeout=240)
    # wait for both queries, the interrupt, and the surviving answer's TTS
    # (tail flush fires when the promoted turn finishes)
    t0 = time.time()
    while time.time() - t0 < 240:
        kinds = {e["type"] for e in events}
        if app.n_utterances >= 2 and {"interrupt", "tts"} <= kinds:
            break
        time.sleep(0.2)

    # stats endpoint must serve and agree with the app counters (queried
    # while the server is still up)
    st = json.loads(urllib.request.urlopen(base + "/stats", timeout=30).read())
    assert st["utterances"] == app.n_utterances

    stop.set()
    server.shutdown()
    app.close()

    kinds = [e["type"] for e in events]
    assert app.n_utterances >= 2  # VAD segmented both utterances
    assert "vad" in kinds and "utterance" in kinds
    assert "text" in kinds  # streamed tokens reached the page
    # the second real utterance interrupts the first answer (role swap)
    assert "interrupt" in kinds
    # TTS wavs were synthesized and shipped for autoplay
    tts = [e for e in events if e["type"] == "tts"]
    assert tts and all(e["wav_b64"] for e in tts)
    import base64

    wav = base64.b64decode(tts[0]["wav_b64"])
    assert wav[:4] == b"RIFF" and len(wav) > 1000


def test_feed_pcm_chunking_and_events(tiny):
    """App-level (no HTTP): odd-sized PCM pushes chunk correctly and the
    VAD start/end events fire."""
    cfg, params = tiny
    app = _mk_app(cfg, params, tts=False, warm=False, streaming_encode=False)
    q = app.subscribe()
    try:
        from vita_tpu.serve.vad_model import synth_speech

        rng = np.random.default_rng(3)
        speech = np.concatenate(
            [synth_speech(rng, CHUNK_SAMPLES) for _ in range(14)]
        )
        silence = np.zeros(int(2.0 * SAMPLE_RATE), np.float32)
        stream = np.concatenate([silence, speech, silence])
        # deliberately odd split sizes — internal buffer must re-chunk
        for i in range(0, len(stream), 1234):
            app.feed_pcm(stream[i:i + 1234])
        assert app.drain_audio(timeout=240)
        t0 = time.time()
        while app.n_utterances == 0 and time.time() - t0 < 120:
            time.sleep(0.05)
        assert app.n_utterances == 1
        kinds = []
        while not q.empty():
            kinds.append(q.get()["type"])
        assert "vad" in kinds and "utterance" in kinds
    finally:
        app.unsubscribe(q)
        app.close()
