"""Concurrency criterion (VERDICT r1 item 4 done-check): a decoding
request's p50 inter-token latency while ANOTHER request prefills must stay
within 2x of idle, and the paged pool must show the memory win.

Runs on the real chip: full-width 2-layer geometry, request A decodes; a
long-prompt request B arrives mid-stream and prefills in chunks. Prints one
JSON line with idle vs during-prefill inter-token p50 and the page-pool
accounting.
"""

import argparse
import json
import os
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--save", action="store_true",
                   help="write bench_results/engine_concurrency.json (merged "
                        "into bench.py extras as recorded_conc_*)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry on CPU (logic validation; do not "
                        "--save)")
    flags = p.parse_args()
    import jax

    if flags.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vita_tpu.models import internvit, mixtral, projectors, vita, whale
    from vita_tpu.ops.paged_attention import pages_needed
    from vita_tpu.parallel.distributed import enable_compile_cache
    from vita_tpu.serve.engine import Engine, Request

    enable_compile_cache()

    if flags.tiny:
        llm = mixtral.MixtralConfig.tiny(n_layers=2)
    else:
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

    max_len = 2048
    eng = Engine(params, cfg, n_slots=4, max_len=max_len,
                 decode_moe_mode="gather", page_size=64,
                 prefill_chunk=256, decode_chunk_len=8,
                 prompt_buckets=(128, 1024))

    # warm all programs: a short request AND a long prefill
    warm = Request(input_ids=np.arange(2, 102, dtype=np.int32),
                   max_new_tokens=24, eos_id=-1)
    eng.submit(warm)
    eng.run_until_idle()
    warm2 = Request(input_ids=np.arange(2, 902, dtype=np.int32),
                    max_new_tokens=24, eos_id=-1)
    eng.submit(warm2)
    eng.run_until_idle()
    # warm the 2-active decode bucket too (it compiles its own program)
    w3 = Request(input_ids=np.arange(2, 102, dtype=np.int32),
                 max_new_tokens=48, eos_id=-1)
    w4 = Request(input_ids=np.arange(2, 102, dtype=np.int32),
                 max_new_tokens=24, eos_id=-1)
    eng.submit(w3)
    eng.step()
    eng.submit(w4)
    eng.run_until_idle()

    stamps_a = []
    a = Request(input_ids=np.arange(2, 102, dtype=np.int32),
                max_new_tokens=400, eos_id=-1,
                on_token=lambda _: stamps_a.append(time.time()))
    eng.submit(a)
    # let A reach steady state
    while len(a.tokens) < 120:
        eng.step()
    t_b_submit = time.time()
    b = Request(input_ids=np.arange(2, 902, dtype=np.int32),  # 900-token prompt
                max_new_tokens=16, eos_id=-1)
    eng.submit(b)
    while b.first_token_time == 0.0:
        eng.step()
    t_b_first = time.time()
    eng.run_until_idle()

    gaps = np.diff(np.asarray(stamps_a))
    times = np.asarray(stamps_a)[1:]
    # tokens surface in per-chunk bursts: the latency signal lives in the
    # CHUNK-boundary gaps (>1 ms), not the ~0 intra-burst deltas
    sel_idle = (times > times[20]) & (times < t_b_submit) & (gaps > 1e-3)
    sel_during = (times > t_b_submit) & (times < t_b_first) & (gaps > 1e-3)
    idle = gaps[sel_idle]
    during = gaps[sel_during]
    out = {
        "metric": "decode_chunk_gap_during_prefill_over_idle",
        "idle_p50_ms": round(float(np.percentile(idle, 50)) * 1e3, 2),
        "during_prefill_p50_ms": round(float(np.percentile(during, 50)) * 1e3, 2),
        "during_prefill_p90_ms": round(float(np.percentile(during, 90)) * 1e3, 2),
        "ratio_p50": round(float(np.percentile(during, 50) / np.percentile(idle, 50)), 2),
        "b_prefill_chunks": -(-900 // 256),
        "b_ttft_s": round(b.ttft_s, 2),
        # flat scalar keys: bench.py _load_recorded only merges top-level
        # int/float values into the recorded_conc_* extras, so the page
        # accounting must not hide inside a nested dict
        "pool_total_pages": eng.total_pages,
        "pool_pages_a": pages_needed(100 + 400, eng.page_size),
        "pool_pages_b": pages_needed(900 + 16, eng.page_size),
        "pool_linear_equivalent_pages": 4 * pages_needed(max_len, eng.page_size),
    }

    # -- pool-pressure concurrency (VERDICT r4 item 6 done-check) ----------
    # A pool that holds only TWO worst-case reservations must still run all
    # four requests simultaneously under lazy growth (admission reserves
    # prompt pages only; decode pages grow per chunk; pressure evicts
    # caches then preempts the newest slot). The r4 engine's worst-case
    # admission gate would have capped concurrency at
    # floor(pool / worst_case) — that is the "linear equivalent" slots.
    del eng
    prompt_len, max_new = 100, 160
    worst = pages_needed(prompt_len + max_new, 64)  # 5 pages of 64
    pool = 2 * worst  # two worst cases; four requests contend
    eng2 = Engine(params, cfg, n_slots=4, max_len=max_len,
                  decode_moe_mode="gather", page_size=64,
                  prefill_chunk=256, decode_chunk_len=8,
                  total_pages=pool, prompt_buckets=(128, 1024))
    reqs = [Request(input_ids=np.arange(2, 2 + prompt_len, dtype=np.int32),
                    max_new_tokens=max_new, eos_id=-1) for _ in range(4)]
    t0 = time.time()
    for r in reqs:
        eng2.submit(r)
    max_active = 0
    while any(r.finish_time == 0.0 for r in reqs):
        eng2.step()
        max_active = max(max_active, eng2.active_count())
        if time.time() - t0 > 600:
            raise RuntimeError("pressure section stalled")
    pressure_wall = time.time() - t0
    out.update({
        "pressure_pool_pages": pool,
        "pressure_worstcase_pages_per_req": worst,
        "pressure_linear_equivalent_slots": pool // worst,
        "pressure_max_active_slots": max_active,
        "pressure_preemptions": int(eng2.stats()["preemptions"]),
        "pressure_all_finished": int(all(len(r.tokens) == max_new
                                         for r in reqs)),
        "pressure_wall_s": round(pressure_wall, 2),
    })
    print(json.dumps(out))
    if flags.save:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_results",
            "engine_concurrency.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
