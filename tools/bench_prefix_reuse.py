"""Live media-turn KV-prefix-reuse TTFT on the real chip (VERDICT r4 #7).

Two-turn image session through the real Engine: turn 1 prefills an
image+text prompt under a session_key; turn 2 re-sends the same image +
history + new text, so the engine extracts the cached pages and prefills
ONLY the suffix (media-aware prefix reuse, serve/engine.py). Records
both warm TTFTs and the reused row count — the multi-turn interactivity
win the r4 code path had no on-chip number for.

Geometry matches the other engine benches (full-width 2L LLM + tiny
towers, gather decode). Both turns run on warm compiles: turn-1 runs
twice (fresh session each time) and the second run is recorded, so the
turn-2 vs turn-1 delta is pure prefill-work savings, not compile noise.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
tools/bench_prefix_reuse.py [--save]
Writes bench_results/prefix_reuse.json (merged as recorded_prefix_*).
"""

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny LLM geometry (CPU validation; do not --save)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from vita_tpu.models import internvit, mixtral, projectors, vita, whale
    from vita_tpu.parallel.distributed import enable_compile_cache
    from vita_tpu.serve.engine import Engine, Request

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

    # small prefill chunks: the tiny towers emit few image tokens, and
    # reuse is chunk-aligned — the shared prefix must cover whole chunks
    eng = Engine(params, cfg, n_slots=2, max_len=256, prefill_chunk=16,
                 decode_moe_mode="gather", prompt_buckets=(64, 128, 256))

    g = cfg.image_group_tiles
    n_img = cfg.image_tokens_per_group
    vs = cfg.vision.image_size
    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((g, vs, vs, 3)).astype(np.float32)

    def turn1_req(session):
        s = n_img + 64
        ids = np.full(s, 9, np.int32)
        im = np.zeros(s, bool)
        im[4:4 + n_img] = True
        return Request(input_ids=ids, image_mask=im, images=tiles,
                       max_new_tokens=8, eos_id=-1, session_key=session)

    def turn2_req(session, r1):
        # history = turn-1 prompt + its answer, then a fresh question
        hist = np.concatenate(
            [r1.input_ids, np.asarray(r1.tokens, np.int32)]
        )
        ids = np.concatenate([hist, np.full(48, 11, np.int32)])
        im = np.zeros(len(ids), bool)
        im[4:4 + n_img] = True
        return Request(input_ids=ids, image_mask=im, images=tiles,
                       max_new_tokens=8, eos_id=-1, session_key=session)

    # session A: compile warmup for both turn shapes
    ra = turn1_req("warm")
    eng.submit(ra)
    eng.run_until_idle()
    ra2 = turn2_req("warm", ra)
    eng.submit(ra2)
    eng.run_until_idle()
    eng._prefix_cache.clear()

    # session B: warm measurement
    r1 = turn1_req("live")
    eng.submit(r1)
    eng.run_until_idle()
    reused_before = eng._reused_prefix_rows
    r2 = turn2_req("live", r1)
    eng.submit(r2)
    eng.run_until_idle()
    reused = eng._reused_prefix_rows - reused_before

    # no-reuse control: identical turn-2 prompt, fresh session
    r3 = turn2_req(None, r1)
    eng.submit(r3)
    eng.run_until_idle()

    out = {
        "metric": "media_prefix_reuse_ttft",
        "layers": llm.n_layers,
        "turn1_prompt_len": int(len(r1.input_ids)),
        "turn2_prompt_len": int(len(r2.input_ids)),
        "reused_rows_turn2": int(reused),
        "turn1_ttft_ms": round(r1.ttft_s * 1e3, 1),
        "turn2_reuse_ttft_ms": round(r2.ttft_s * 1e3, 1),
        "turn2_noreuse_ttft_ms": round(r3.ttft_s * 1e3, 1),
        "reuse_speedup_x": round(r2.ttft_s and r3.ttft_s / r2.ttft_s, 2),
    }
    print(json.dumps(out))
    if args.save:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(root, "bench_results", "prefix_reuse.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
