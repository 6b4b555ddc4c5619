"""Aggregate decode throughput vs concurrency through the real Engine.

Batch-1 MoE decode is weight-streaming-bound (see BASELINE.md roofline
accounting), so adding concurrent decodes is nearly free until the top-2
routing of the batch covers all 8 experts: the same weight stream serves
every active slot. This measures what the continuous-batching engine
actually delivers: aggregate tokens/s at 1, 2 and 4 concurrent decoding
requests, full-width 2-layer geometry on the real chip. Reference role:
vLLM's continuous batching throughput story (web_demo/vllm_tools/).

Writes bench_results/engine_batch.json (merged into bench.py extras as
recorded_batch_*).
"""

import json
import os
import time


def main() -> None:
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

    eng = Engine(params, cfg, n_slots=8, max_len=512,
                 decode_moe_mode="gather", prompt_buckets=(128,))

    results = {}
    for n in (1, 2, 4, 8):
        stamps = []
        reqs = [
            Request(input_ids=np.arange(2 + i, 102 + i, dtype=np.int32),
                    max_new_tokens=160, eos_id=-1,
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

    results["batch4_scaling_x"] = round(
        results["agg_tokens_per_s_4slot_2L"]
        / results["agg_tokens_per_s_1slot_2L"], 2
    )
    results["batch8_scaling_x"] = round(
        results["agg_tokens_per_s_8slot_2L"]
        / results["agg_tokens_per_s_1slot_2L"], 2
    )
    out = {"metric": "engine_batched_decode", **results}
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_results", "engine_batch.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    print("wrote", path)


if __name__ == "__main__":
    main()
