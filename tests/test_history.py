"""Multi-turn history: merge rules (reference merge_current_and_history,
web_interactive_demo.py:604-680), multi-clip audio fusion, and session
replay through the serving app (VERDICT round-1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.constants import AUDIO_TOKEN_INDEX, IMAGE_TOKEN_INDEX
from vita_tpu.conversation import TEMPLATES, Dialog
from vita_tpu.models import vita
from vita_tpu.serve.history import ChatSession, HistoryTurn, merge_current_and_history
from vita_tpu.tokenization import (
    audio_select_arrays,
    audio_token_count,
    expand_media_sentinels,
    media_masks,
    tokenize_multimodal,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_merge_empty_history_matches_dialog():
    m = merge_current_and_history([], "hello")
    want = Dialog(TEMPLATES["mixtral_two"]).user("hello").assistant().render("lang")
    assert m.prompt == want and m.modality == "lang"


def test_merge_replay_keeps_rounds_and_media():
    img = np.zeros((1, 8, 8, 3), np.float32)
    hist = [
        HistoryTurn("<image>\nwhat is this?", "<3>a cat", images=img,
                    image_slot_counts=(4,)),
        HistoryTurn("and its color?", "<3>black"),
    ]
    m = merge_current_and_history(hist, "how many legs?")
    # both rounds present, in order, under one system prompt
    assert m.prompt.count("user:") == 3 and m.prompt.count("bot:") == 3
    assert "a cat" in m.prompt and "black" in m.prompt
    assert m.prompt.index("a cat") < m.prompt.index("black")
    assert m.prompt.endswith("bot:")
    # turn-1 image survives into the merged request (replay mode)
    assert m.images is not None and m.images.shape[0] == 1
    assert m.image_slot_counts == (4,)
    assert m.modality == "video"  # interactive rule: any image -> video prompt


def test_merge_skip_history_vision():
    img = np.zeros((2, 8, 8, 3), np.float32)
    hist = [HistoryTurn("<image>\nlook", "<3>ok", images=img, image_slot_counts=(8,))]
    m = merge_current_and_history(hist, "and now?", skip_history_vision=True)
    assert "<image>" not in m.prompt
    assert m.images is None and m.image_slot_counts == ()
    assert m.modality == "lang"


def test_merge_image_tokens_to_front():
    img = np.zeros((1, 8, 8, 3), np.float32)
    hist = [HistoryTurn("a <image> b", "<3>r1", images=img, image_slot_counts=(4,))]
    cur_img = np.ones((1, 8, 8, 3), np.float32)
    m = merge_current_and_history(
        hist, "c <image> d", images=cur_img, image_slot_counts=(4,),
        image_tokens_to_front=True,
    )
    # both placeholders moved to the very start of the first user msg
    first_user = m.prompt.split("user:")[1]
    assert first_user.startswith("<image><image>")
    assert m.prompt.count("<image>") == 2
    # media order preserved: history image first
    np.testing.assert_array_equal(m.images[0], img[0])
    np.testing.assert_array_equal(m.images[1], cur_img[0])


def test_merge_drops_noise_turns():
    hist = [
        HistoryTurn("<audio>", "<2>noise", speech=np.zeros((40, 80), np.float32),
                    speech_length=40),
        HistoryTurn("<audio>", "<1>real answer", speech=np.ones((40, 80), np.float32),
                    speech_length=40),
    ]
    m = merge_current_and_history(hist, "next")
    assert "noise" not in m.prompt and "real answer" in m.prompt
    assert len(m.speeches) == 1  # the rejected turn's audio is gone


def test_multiclip_audio_fusion_rows(tiny):
    """With two clips, each audio slot reads ITS clip's feature row —
    padding between clips never leaks in."""
    cfg, params = tiny
    clips = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(1), (60, 80)),
        jax.random.normal(jax.random.PRNGKey(2), (60, 80)),
    ])
    lens = jnp.asarray([60, 28], jnp.int32)
    counts = [audio_token_count(60), audio_token_count(28)]
    n1, n2 = counts

    ids = [1, 5] + [AUDIO_TOKEN_INDEX] * n1 + [7] + [AUDIO_TOKEN_INDEX] * n2 + [9]
    safe, im, am = media_masks(np.array(ids))
    ci, ri = audio_select_arrays(am, counts)

    embeds = vita.fuse_embeddings(
        params, cfg, jnp.asarray(safe)[None],
        image_mask=jnp.asarray(im)[None], audio_mask=jnp.asarray(am)[None],
        speech=clips, speech_lengths=lens,
        audio_select=(jnp.asarray(ci)[None], jnp.asarray(ri)[None]),
    )
    feats, _ = vita.encode_audio(params, cfg, clips, lens)
    pos = np.flatnonzero(am)
    # clip 1 slots j -> feats[0, j]; clip 2 slots j -> feats[1, j]
    for j in range(n1):
        np.testing.assert_allclose(
            np.asarray(embeds[0, pos[j]]), np.asarray(feats[0, j]), rtol=1e-5
        )
    for j in range(n2):
        np.testing.assert_allclose(
            np.asarray(embeds[0, pos[n1 + j]]), np.asarray(feats[1, j]), rtol=1e-5
        )


def test_generator_multiclip_matches_forward(tiny):
    cfg, params = tiny
    from vita_tpu.generate import GenerationConfig, Generator

    c1 = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (50, 80)))
    c2 = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (30, 80)))
    n1, n2 = audio_token_count(50), audio_token_count(30)
    ids = [1, 5] + [AUDIO_TOKEN_INDEX] * n1 + [7] + [AUDIO_TOKEN_INDEX] * n2
    safe, im, am = media_masks(np.array(ids))

    g = Generator(params, cfg, max_len=128, chunk_len=2,
                  frame_buckets=(64,), prompt_buckets=(64,))
    out = g.generate(safe, image_mask=im, audio_mask=am,
                     speech=[c1, c2], speech_length=[50, 30],
                     gen=GenerationConfig(max_new_tokens=3, eos_id=-1))

    # manual forward with the same padded shapes
    from vita_tpu.generate import stack_speech_clips

    clips, lens, counts = stack_speech_clips([c1, c2], [50, 30], (64,))
    pad = np.zeros(64, bool)
    pad[: len(am)] = am
    ci, ri = audio_select_arrays(pad, counts)
    ids_p = np.zeros(64, np.int32)
    ids_p[: len(safe)] = safe
    im_p = np.zeros(64, bool)
    im_p[: len(im)] = im
    logits, _, _ = vita.forward(
        params, cfg, jnp.asarray(ids_p)[None],
        image_mask=jnp.asarray(im_p)[None], audio_mask=jnp.asarray(pad)[None],
        speech=jnp.asarray(clips), speech_lengths=jnp.asarray(lens),
        audio_select=(jnp.asarray(ci)[None], jnp.asarray(ri)[None]),
        attn_valid=jnp.arange(64)[None] < len(safe),
    )
    want = int(jnp.argmax(logits[0, len(safe) - 1]))
    assert out[0] == want


def test_serving_app_session_replays_image(tiny):
    """Image sent in turn 1 is still fused in turn 3 (replay mode)."""
    import base64
    import io

    from PIL import Image

    from vita_tpu.serve.engine import Engine
    from vita_tpu.serve.http_server import ServingApp

    cfg, params = tiny
    eng = Engine(params, cfg, n_slots=1, max_len=2048, decode_chunk_len=2)
    enc = lambda s: [1] + [3 + b for b in s.encode()]
    dec = lambda ids: bytes(t - 3 for t in ids if 3 <= t < 259).decode(errors="ignore")
    app = ServingApp(eng, cfg, enc, dec, bos_id=1, eos_id=2,
                     image_size=cfg.vision.image_size)

    buf = io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(buf, "PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    r1, rec1, _rel_rec1 = app.build_request(
        {"prompt": "what is this?", "image_b64": img_b64, "session_id": "s1"}
    )
    assert r1.images is not None
    rec1("<3>a grey square")
    _rel_rec1()  # merge->generate->record is lock-serialized per session
    r2, rec2, _rel_rec2 = app.build_request({"prompt": "sure?", "session_id": "s1"})
    rec2("<3>yes")
    _rel_rec2()
    r3, _, _rel3 = app.build_request({"prompt": "describe it again", "session_id": "s1"})
    # turn-1 image replayed into turn 3
    assert r3.images is not None and r3.images.shape[0] == 1
    assert int(np.sum(r3.image_mask)) == cfg.vision.out_tokens
    # prior responses are in the prompt ids
    text = dec([int(t) for t in r3.input_ids])
    assert "a grey square" in text and "yes" in text
    # and the request actually runs end-to-end (the app's engine thread
    # is the only driver — stepping ourselves would race its donations)
    import time

    done = []
    r3.on_finish = lambda toks, reason: done.append(reason)
    eng.submit(r3)
    for _ in range(600):
        if done:
            break
        time.sleep(0.1)
    assert done and len(r3.tokens) > 0
    _rel3()
    app.thread.stop()


def test_serving_app_video_request(tiny, tmp_path):
    """video_b64 routes through the video pipeline: frames sampled and
    fused like the CLI path, video modality prompt, runs end-to-end
    (reference: web_ability_demo.py:145-243 handles video uploads)."""
    import base64
    import time

    import cv2

    from vita_tpu.serve.engine import Engine
    from vita_tpu.serve.http_server import ServingApp

    cfg, params = tiny
    sz = cfg.vision.image_size
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (sz, sz))
    for i in range(50):  # 5 s at 10 fps -> >=5 sampled frames at 1 fps
        w.write(np.full((sz, sz, 3), (i * 5) % 255, np.uint8))
    w.release()
    vid_b64 = base64.b64encode(open(path, "rb").read()).decode()

    eng = Engine(params, cfg, n_slots=1, max_len=4096, decode_chunk_len=2)
    enc = lambda s: [1] + [3 + b for b in s.encode()]
    dec = lambda ids: bytes(t - 3 for t in ids if 3 <= t < 259).decode(errors="ignore")
    app = ServingApp(eng, cfg, enc, dec, bos_id=1, eos_id=2, image_size=sz)
    try:
        req, record, release = app.build_request(
            {"prompt": "what happens?", "video_b64": vid_b64}
        )
        n_frames = req.images.shape[0]
        assert n_frames >= 4  # 1 fps sampling of a 5 s clip (min_frames=4)
        assert req.images.shape[1:] == (sz, sz, 3)
        assert int(np.sum(req.image_mask)) == n_frames * cfg.vision.out_tokens
        release()

        done = []
        req.on_finish = lambda toks, reason: done.append(reason)
        eng.submit(req)
        for _ in range(600):
            if done:
                break
            time.sleep(0.1)
        assert done and len(req.tokens) > 0

        # image + video together is a client error, not a crash
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, "PNG")
        png_b64 = base64.b64encode(buf.getvalue()).decode()
        with pytest.raises(ValueError, match="mutually exclusive"):
            app.build_request({"prompt": "x", "video_b64": vid_b64,
                               "image_b64": png_b64})
    finally:
        app.thread.stop()


def test_openai_chat_completions_request(tiny):
    """OpenAI-compatible adapter: multi-turn messages render through the
    mixtral_two template, data-URL image parts route into the vision
    pipeline, and the request runs end-to-end."""
    import base64
    import io
    import time

    from PIL import Image

    from vita_tpu.serve.engine import Engine
    from vita_tpu.serve.http_server import ServingApp

    cfg, params = tiny
    eng = Engine(params, cfg, n_slots=1, max_len=2048, decode_chunk_len=2)
    enc = lambda s: [1] + [3 + b for b in s.encode()]
    dec = lambda ids: bytes(t - 3 for t in ids if 3 <= t < 259).decode(errors="ignore")
    app = ServingApp(eng, cfg, enc, dec, bos_id=1, eos_id=2,
                     image_size=cfg.vision.image_size)

    buf = io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(buf, "PNG")
    data_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    req = app.build_openai_request({
        "messages": [
            {"role": "user", "content": "hello"},
            {"role": "assistant", "content": "hi there"},
            {"role": "user", "content": [
                {"type": "text", "text": "what is in this picture?"},
                {"type": "image_url", "image_url": {"url": data_url}},
            ]},
        ],
        "max_tokens": 6,
    })
    assert req.images is not None
    assert int(np.sum(req.image_mask)) == cfg.vision.out_tokens
    text = dec([int(t) for t in req.input_ids])
    assert "hi there" in text and "what is in this picture?" in text
    assert req.max_new_tokens == 6

    done = []
    req.on_finish = lambda toks, reason: done.append(reason)
    eng.submit(req)
    for _ in range(600):
        if done:
            break
        time.sleep(0.1)
    assert done and len(req.tokens) == 6

    # malformed: media in a non-final message rejected
    with pytest.raises(ValueError, match="final user message"):
        app.build_openai_request({
            "messages": [
                {"role": "user", "content": [
                    {"type": "image_url", "image_url": {"url": data_url}}]},
                {"role": "assistant", "content": "x"},
                {"role": "user", "content": "y"},
            ]})
    # must end with a user message
    with pytest.raises(ValueError, match="end with a user"):
        app.build_openai_request({"messages": [
            {"role": "assistant", "content": "x"}]})
    app.thread.stop()


def test_openai_chat_completions_http_stream(tiny):
    """Full HTTP round-trip of /v1/chat/completions: non-stream JSON shape
    and stream=true SSE chunks ending in [DONE]."""
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from vita_tpu.serve.engine import Engine
    from vita_tpu.serve.http_server import ServingApp, make_handler

    cfg, params = tiny
    eng = Engine(params, cfg, n_slots=1, max_len=2048, decode_chunk_len=2)
    enc = lambda s: [1] + [3 + b for b in s.encode()]
    dec = lambda ids: bytes(t - 3 for t in ids if 3 <= t < 259).decode(errors="ignore")
    app = ServingApp(eng, cfg, enc, dec, bos_id=1, eos_id=2,
                     image_size=cfg.vision.image_size)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(body):
        return urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=300)

    r = post({"messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 4})
    out = _json.loads(r.read())
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["finish_reason"] == "length"
    assert out["usage"]["completion_tokens"] == 4

    r = post({"messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 4, "stream": True})
    assert r.headers.get("Content-Type") == "text/event-stream"
    events = [l for l in r.read().decode().split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    first = _json.loads(events[0][6:])
    assert first["object"] == "chat.completion.chunk"
    assert first["choices"][0]["delta"].get("role") == "assistant"
    last = _json.loads(events[-2][6:])
    assert last["choices"][0]["finish_reason"] == "length"

    srv.shutdown()
    app.thread.stop()


def test_openai_stop_sequences(tiny):
    """`stop` truncates at the earliest stop sequence (which is not
    returned), cancels the request, and reports finish_reason=stop —
    KeywordsStoppingCriteria's role (vita/util/mm_utils.py:121-155)."""
    import json as _json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from vita_tpu.serve.engine import Engine
    from vita_tpu.serve.http_server import ServingApp, make_handler

    cfg, params = tiny
    eng = Engine(params, cfg, n_slots=1, max_len=2048, decode_chunk_len=2)
    enc = lambda s: [1] + [3 + b for b in s.encode()]
    # every id maps to a printable char so the random model's greedy
    # output yields enough text to pick a stop substring from
    dec = lambda ids: "".join(chr(33 + (t % 90)) for t in ids)
    app = ServingApp(eng, cfg, enc, dec, bos_id=1, eos_id=2,
                     image_size=cfg.vision.image_size)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    def post(body):
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}), timeout=300)
        return r

    base = {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 24}
    full = _json.loads(post(base).read())["choices"][0]["message"]["content"]
    assert len(full) > 6
    stop = full[4:7]  # a substring the greedy run deterministically emits

    out = _json.loads(post({**base, "stop": stop}).read())
    choice = out["choices"][0]
    assert choice["finish_reason"] == "stop"
    assert stop not in choice["message"]["content"]
    assert choice["message"]["content"] == full[:full.find(stop)]

    # streaming: concatenated deltas match the truncated text
    r = post({**base, "stop": [stop], "stream": True})
    events = [l for l in r.read().decode().split("\n\n") if l.startswith("data: ")]
    deltas = "".join(
        _json.loads(e[6:])["choices"][0]["delta"].get("content", "")
        for e in events if e != "data: [DONE]"
    )
    assert deltas == full[:full.find(stop)]
    last = [e for e in events if e != "data: [DONE]"][-1]
    assert _json.loads(last[6:])["choices"][0]["finish_reason"] == "stop"

    srv.shutdown()
    app.thread.stop()
