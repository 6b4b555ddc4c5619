"""Aggregate decode throughput vs concurrency through the real Engine.

Batch-1 MoE decode is weight-streaming-bound (see BASELINE.md roofline
accounting), so adding concurrent decodes is nearly free until the top-2
routing of the batch covers all 8 experts: the same weight stream serves
every active slot. This measures what the continuous-batching engine
actually delivers: aggregate tokens/s at 1..N concurrent decoding
requests, full-width 2-layer geometry on the real chip. Reference role:
vLLM's continuous batching throughput story (web_demo/vllm_tools/
vllm_file/mixtral.py:375-423 — FusedMoE exists for exactly this
batched-decode regime).

Usage: bench_engine_batch.py [--slots 1 2 4 8 16] [--moe-mode gather]
Writes bench_results/engine_batch[_<mode>].json (merged into bench.py
extras as recorded_batch_*).
"""

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[1, 2, 4, 8],
                    help="concurrency levels to sweep (max sets n_slots)")
    ap.add_argument("--moe-mode", default="gather",
                    choices=["gather", "gather_q", "gather_q4", "dense"])
    ap.add_argument("--tokens", type=int, default=160)
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8 KV pool (capacity lever) — measures its "
                         "throughput cost vs the bf16 pool")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vita_tpu.models import internvit, mixtral, projectors, vita, whale
    from vita_tpu.parallel.distributed import enable_compile_cache
    from vita_tpu.serve.engine import Engine, Request

    enable_compile_cache()

    llm = mixtral.MixtralConfig(n_layers=2, moe_mode="dense", dtype=jnp.bfloat16)
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

    n_slots = max(args.slots)
    # int8 pools need page_size=128 for the Pallas kernel path (the scale
    # row DMA must be lane-aligned; ops/paged_attention.py dispatcher)
    eng = Engine(params, cfg, n_slots=n_slots, max_len=512,
                 decode_moe_mode=args.moe_mode, prompt_buckets=(128,),
                 kv_int8=args.kv_int8,
                 page_size=128 if args.kv_int8 else 64)

    results = {}
    for n in args.slots:
        stamps = []
        reqs = [
            Request(input_ids=np.arange(2 + i, 102 + i, dtype=np.int32),
                    max_new_tokens=args.tokens, eos_id=-1,
                    on_token=lambda _t, s=stamps: s.append(time.time()))
            for i in range(n)
        ]
        for r in reqs:
            eng.submit(r)
        eng.run_until_idle()
        total = len(stamps)
        skip = max(total // 4, 16 * n)  # drop compile/ramp chunks
        agg = (total - 1 - skip) / (stamps[-1] - stamps[skip])
        results[f"agg_tokens_per_s_{n}slot_2L"] = round(agg, 1)
        print(json.dumps({"slots": n, "agg_tokens_per_s": round(agg, 1)}),
              flush=True)

    base = results.get("agg_tokens_per_s_1slot_2L")
    if base:
        for n in args.slots:
            if n > 1:
                results[f"batch{n}_scaling_x"] = round(
                    results[f"agg_tokens_per_s_{n}slot_2L"] / base, 2
                )
    out = {"metric": "engine_batched_decode", "moe_mode": args.moe_mode,
           "kv_int8": args.kv_int8, **results}
    print(json.dumps(out))
    suffix = "" if args.moe_mode == "gather" else f"_{args.moe_mode}"
    if args.kv_int8:
        suffix += "_kvint8"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results",
        f"engine_batch{suffix}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
