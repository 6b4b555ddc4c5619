"""Product-path decode benchmark: wall-clock tok/s through the real Engine.

Unlike bench.py (device-side chained steps), this measures what a user of
the serving engine actually gets: paged KV pool, chunked prefill, on-device
chunked sampling, host readback per chunk. Full-width Mixtral geometry at
reduced depth (2 layers; the 87 GB model exceeds one v5e), tiny towers
(text-only request touches only the LLM).

Usage: python tools/bench_engine.py [--decode-moe-mode gather] [--tokens 256]
Prints one JSON line.
"""

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--decode-moe-mode", default="gather")
    p.add_argument("--tokens", type=int, default=256)
    p.add_argument("--chunk-len", type=int, default=8)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--page-size", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vita_tpu.models import internvit, mixtral, vita, whale
    from vita_tpu.parallel.distributed import enable_compile_cache
    from vita_tpu.serve.engine import Engine, Request

    enable_compile_cache()

    cfg = vita.VITAConfig(
        llm=mixtral.MixtralConfig(
            n_layers=args.layers, moe_mode="dense", dtype=jnp.bfloat16
        ),
        vision=internvit.InternViTConfig.tiny(),
        audio=whale.WhaleConfig.tiny(),
    )
    params = vita.init_params(jax.random.PRNGKey(0), cfg)

    eng = Engine(
        params, cfg, n_slots=4, max_len=1024,
        decode_moe_mode=args.decode_moe_mode,
        page_size=args.page_size, decode_chunk_len=args.chunk_len,
        prompt_buckets=(128,),
    )

    prompt = np.arange(2, 102, dtype=np.int32)
    stamps = []

    def on_token(_):
        stamps.append(time.time())

    t0 = time.time()
    req = Request(input_ids=prompt, max_new_tokens=args.tokens, eos_id=-1,
                  on_token=on_token)
    eng.submit(req)
    eng.run_until_idle()
    total = time.time() - t0

    n = len(stamps)
    skip = max(n // 8, args.chunk_len)  # drop warmup/compile chunks
    steady = (stamps[-1] - stamps[skip]) / (n - 1 - skip)
    full32_ms = steady * 1000 * 32 / args.layers  # layer-dominated scale-up
    print(json.dumps({
        "metric": "engine_wall_decode_tokens_per_s",
        "value": round(1.0 / steady, 2),
        "unit": f"tok/s ({args.layers}L fullwidth, product path)",
        "decode_steady_ms_per_tok": round(steady * 1000, 3),
        "tokens_per_s_32L_equivalent": round(1000.0 / full32_ms, 2),
        "ttft_s_incl_compile": round(req.ttft_s, 2),
        "total_s": round(total, 2),
        "tokens": n,
        "decode_moe_mode": args.decode_moe_mode,
        "chunk_len": args.chunk_len,
        "page_size": args.page_size,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
