"""Interactive-duplex loop latency on the real chip (BASELINE config 5).

Drives the REAL duplex stack — two Engines under DuplexController, the
streaming Whale encoder, sentence-chunked TTS via FormantSynthesizer —
with simulated mic segments, and records the latencies that define VITA's
headline interactivity (reference gates: VAD min-dialog 1.5 s and
sentence-punct TTS flush, web_demo/web_interactive_demo.py:827-829,
572-574; <500 ms TTFT budget, BASELINE.md):

  - speech_end_to_first_text_ms: VAD end-of-speech -> first streamed text
    char (prompt build + fbank/streamed encode + prefill + first token +
    readback; everything the user waits through).
  - speech_end_to_first_tts_wav_ms: ... -> first synthesized sentence wav.
  - interrupt_to_role_swap_ms: second utterance's speech end -> old
    generator cancelled + roles swapped (DuplexController._promote done).
  - reject_to_monitor_return_ms: a '<2>'-classified response -> request
    cancelled, monitor kept (web_interactive_demo.py:368-370).

Geometry matches the other engine benches: full-width Mixtral at 2
layers + tiny towers (bf16, gather decode, decode_ticks=1 as the duplex
stack configures). A 32L-extrapolated first-text column is derived from
the recorded warm-TTFT extrapolation (bench_results/engine_ttft.json):
the duplex-loop overhead above engine TTFT is layer-independent host
work, so first_text_32L = overhead + ttft * (ttft_32L_extrap/ttft_2L).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
tools/bench_duplex_latency.py [--save]
Writes bench_results/duplex_latency.json (merged by bench.py as
recorded_duplex_*).
"""

import argparse
import json
import os
import threading
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=48)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny LLM geometry (CPU validation; do not --save)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from vita_tpu.models import internvit, mixtral, projectors, vita, whale
    from vita_tpu.parallel.distributed import enable_compile_cache
    from vita_tpu.serve.duplex import DuplexController, DuplexConfig
    from vita_tpu.serve.engine import Engine, EngineThread, Request
    from vita_tpu.serve.streaming_audio import StreamingWhaleEncoder
    from vita_tpu.serve.tts import FormantSynthesizer
    from vita_tpu.tokenization import (
        expand_media_sentinels,
        media_masks,
        tokenize_multimodal,
    )

    enable_compile_cache()

    if args.tiny:
        llm = mixtral.MixtralConfig.tiny(n_layers=2, moe_mode="dense")
    else:
        llm = mixtral.MixtralConfig(n_layers=2, moe_mode="dense",
                                    dtype=jax.numpy.bfloat16)
    cfg = vita.VITAConfig(
        llm=llm, vision=internvit.InternViTConfig.tiny(),
        audio=whale.WhaleConfig.tiny(),
    )
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    params = {
        "llm": mixtral.init_params(jax.random.PRNGKey(0), llm),
        "vision": internvit.init_params(ks[0], cfg.vision),
        "vision_proj": projectors.init_vision_projector_kind(
            ks[1], cfg.vision_proj_in_dim, llm.d_model, dtype=llm.dtype
        ),
        "audio": whale.init_params(ks[2], cfg.audio),
        "audio_proj": projectors.init_audio_projector(
            ks[3], cfg.audio.hidden, llm.d_model, dtype=llm.dtype
        ),
    }

    # duplex construction mirrors serve/duplex_http.py: decode_ticks=1 for
    # smooth streaming + fast barge-in
    engines = [
        Engine(params, cfg, n_slots=2, max_len=1024, seed=i,
               decode_moe_mode="gather", decode_ticks=1)
        for i in range(2)
    ]

    # byte-level decode; the reject round below overrides it
    decode_plain = lambda ids: "".join(chr(32 + (t % 90)) for t in ids)
    state = {"decode": decode_plain}

    stamps = {}
    synth = FormantSynthesizer()

    def on_text(chunk):
        stamps.setdefault("first_text", time.time())

    def on_tts(sentence):
        t0 = time.time()
        synth.synthesize("hello there.")  # fixed text: synth cost only
        stamps.setdefault("first_tts_wav", time.time())
        stamps.setdefault("tts_synth_s", time.time() - t0)

    ctl = DuplexController(
        engines, decode=lambda ids: state["decode"](ids),
        on_text=on_text, on_tts=on_tts,
        config=DuplexConfig(max_new_tokens=args.max_new_tokens,
                            temperature=0.0, eos_id=-1),
    )
    promote_orig = ctl._promote

    def promote_timed(req):
        promote_orig(req)
        stamps.setdefault("promoted_" + str(req.request_id), time.time())

    ctl._promote = promote_timed

    # --- build one audio query (streamed encode: encoder runs DURING
    # speech, so speech-end latency excludes the bulk of the encode) ---
    enc = StreamingWhaleEncoder(params["audio"], cfg.audio)
    rng = np.random.default_rng(0)

    def make_query(seed):
        feats = rng.standard_normal((300, cfg.audio.input_dim)).astype(
            np.float32
        )
        enc.reset()
        enc.feed(feats)  # during-speech work (not counted after speech end)
        t_speech_end = time.time()
        encoded = enc.finish()
        ids = tokenize_multimodal("<audio>", lambda s: [9, 9 + seed], bos_id=1)
        n_aud = (len(encoded) - 1) // 2 + 1
        expanded = expand_media_sentinels(ids, [], [n_aud])
        safe, _, am = media_masks(np.array(expanded))
        req = ctl.new_request(
            safe, audio_mask=am, audio_encoded=encoded,
            audio_encoded_length=len(encoded),
        )
        return req, t_speech_end

    # --- warm both engines (compiles must not pollute the timeline) ---
    t0 = time.time()
    for e in engines:
        w, _ = make_query(0)
        w.max_new_tokens = 9
        e.submit(w)
        e.run_until_idle()
    warm_s = time.time() - t0
    print(json.dumps({"warm_s": round(warm_s, 1)}), flush=True)

    threads = [EngineThread(e) for e in engines]
    for t in threads:
        t.start()

    results = {}
    try:
        # --- turn 1: speech end -> first text / first tts wav ---
        req1, t_end = make_query(1)
        ctl.submit_query(req1)
        deadline = time.time() + 120
        while "first_tts_wav" not in stamps and time.time() < deadline:
            time.sleep(0.002)
        results["speech_end_to_first_text_ms"] = round(
            (stamps["first_text"] - t_end) * 1e3, 1
        )
        results["speech_end_to_first_tts_wav_ms"] = round(
            (stamps["first_tts_wav"] - t_end) * 1e3, 1
        )
        results["engine_ttft_ms"] = round(req1.ttft_s * 1e3, 1)
        results["tts_synth_ms"] = round(stamps["tts_synth_s"] * 1e3, 1)

        # --- turn 2 mid-generation: interrupt -> role swap ---
        assert ctl.current is req1 and not req1.cancelled, "turn1 not live"
        req2, t_end2 = make_query(2)
        ctl.submit_query(req2)
        # stamp req2's OWN first token (the global on_text also fires for
        # the old generator's tail, so it cannot time the new turn)
        gate_cb = req2.on_token

        def req2_cb(t, _o=gate_cb):
            stamps.setdefault("req2_first_token", time.time())
            _o(t)

        req2.on_token = req2_cb
        key = "promoted_" + str(req2.request_id)
        deadline = time.time() + 120
        while key not in stamps and time.time() < deadline:
            time.sleep(0.002)
        results["interrupt_to_role_swap_ms"] = round(
            (stamps[key] - t_end2) * 1e3, 1
        )
        assert req1.cancelled, "interrupt did not cancel the old generator"
        while "req2_first_token" not in stamps and time.time() < deadline:
            time.sleep(0.002)
        results["interrupt_to_first_text_ms"] = round(
            (stamps["req2_first_token"] - t_end2) * 1e3, 1
        )
        # let turn 2 finish so the reject round sees an idle monitor
        while ctl.current is req2 and not req2.finish_time:
            time.sleep(0.01)

        # --- reject round: decode override classifies the response '<2>'
        # (latency is content-independent; greedy output is deterministic)
        state["decode"] = lambda ids: "<2>" + decode_plain(ids[1:])
        req3, t_end3 = make_query(3)
        ctl.submit_query(req3)
        deadline = time.time() + 120
        while not req3.cancelled and time.time() < deadline:
            time.sleep(0.002)
        t_rej = time.time()
        results["reject_to_monitor_return_ms"] = round(
            (t_rej - t_end3) * 1e3, 1
        )
        results["rejected_noise"] = ctl.rejected_noise
        results["interrupts"] = ctl.interrupts
        assert ctl.rejected_noise == 1 and ctl.interrupts == 1
    finally:
        for t in threads:
            t.stop()
        for t in threads:
            t.join(timeout=10)

    # --- 32L extrapolation: loop overhead above engine TTFT is host work
    # (layer-independent); scale the TTFT term by the recorded warm-TTFT
    # extrapolation factor (bench_results/engine_ttft.json) ---
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ttft_path = os.path.join(root, "bench_results", "engine_ttft.json")
    try:
        with open(ttft_path) as f:
            rec = json.load(f)
        factor = (rec["ttft_warm_media_32L_extrapolated_ms"]
                  / rec["ttft_warm_ms"])
    except (OSError, KeyError, ZeroDivisionError):
        factor = None
    if factor:
        overhead = (results["speech_end_to_first_text_ms"]
                    - results["engine_ttft_ms"])
        ft32 = overhead + results["engine_ttft_ms"] * factor
        results["first_text_32L_extrapolated_ms"] = round(ft32, 1)
        results["ttft_extrap_factor"] = round(factor, 2)
        results["within_500ms_budget_32L"] = bool(ft32 < 500.0)

    out = {"metric": "duplex_latency", "layers": 2,
           "decode_moe_mode": "gather", **results}
    print(json.dumps(out))
    if args.save:
        path = os.path.join(root, "bench_results", "duplex_latency.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
