"""Per-row gather vs masked active-expert MoE decode kernels on the chip.

Full Mixtral width (d=4096, f=14336, E=8), stacked-flat 2L view (16 weight
rows) — the exact decode-path geometry. Sweeps batch T and prints one JSON
line with ms per MoE call for each kernel/precision, plus the dedupe
speedup. Timing follows the repo rule: chain N calls, one readback,
difference two N.
"""

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=4096)
    p.add_argument("--f", type=int, default=14336)
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--batches", nargs="*", type=int, default=[1, 2, 4, 8, 16])
    p.add_argument("--modes", nargs="*", default=["bf16", "q", "q4"])
    p.add_argument("--save", action="store_true",
                   help="write bench_results/masked_moe.json")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vita_tpu.ops import moe_decode as md
    from vita_tpu.parallel.distributed import enable_compile_cache

    enable_compile_cache()
    e_rows = args.layers * args.experts
    d, f = args.d, args.f
    key = jax.random.PRNGKey(0)

    def timed(fn, *a, n_small=6, n_large=18):
        out = fn(*a)
        _ = np.asarray(out)[0, 0]  # compile + sync

        def run(n):
            t0 = time.time()
            r = None
            for _ in range(n):
                r = fn(*a)
            _ = np.asarray(r)[0, 0]
            return time.time() - t0

        run(n_small)
        ts = min(run(n_small) for _ in range(2))
        tl = min(run(n_large) for _ in range(2))
        return (tl - ts) / (n_large - n_small)

    results = {"metric": "masked_moe_decode", "d": d, "f": f,
               "experts": args.experts, "layers_flat": args.layers}

    # bf16 stacked-flat weights (one allocation serves every mode)
    wg = (jax.random.normal(key, (e_rows, d, f), jnp.float32) * 0.02).astype(jnp.bfloat16)
    wu = (jax.random.normal(jax.random.PRNGKey(1), (e_rows, d, f), jnp.float32) * 0.02).astype(jnp.bfloat16)
    wd = (jax.random.normal(jax.random.PRNGKey(2), (e_rows, f, d), jnp.float32) * 0.02).astype(jnp.bfloat16)
    base = {"router": jnp.zeros((d, e_rows), jnp.bfloat16),
            "w_gate": wg, "w_up": wu, "w_down": wd}
    qp = md.quantize_expert_weights(base) if "q" in args.modes else None
    qp4 = md.quantize_expert_weights_int4(base) if "q4" in args.modes else None

    gather_j = jax.jit(md.gather_expert_ffn)
    masked_j = jax.jit(functools.partial(md.masked_expert_ffn,
                                         n_experts=args.experts))
    gq_j = jax.jit(md.gather_expert_ffn_q)
    mq_j = jax.jit(functools.partial(md.masked_expert_ffn_q,
                                     n_experts=args.experts))
    gq4_j = jax.jit(md.gather_expert_ffn_q4)
    mq4_j = jax.jit(functools.partial(md.masked_expert_ffn_q4,
                                      n_experts=args.experts))

    rng = np.random.default_rng(0)
    for t in args.batches:
        x = (jax.random.normal(jax.random.PRNGKey(3), (t, d), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
        # layer-1 flat ids, random routing (the realistic duplicate mix)
        ti = jnp.asarray(
            np.stack([rng.choice(args.experts, 2, replace=False) for _ in range(t)])
            + args.experts, jnp.int32)
        tw = jnp.full((t, 2), 0.5, jnp.bfloat16)

        if "bf16" in args.modes:
            g_ms = timed(lambda: gather_j(x, ti, wg, wu, wd)) * 1e3
            m_ms = timed(lambda: masked_j(x, tw, ti, wg, wu, wd)) * 1e3
            results[f"bf16_gather_ms_t{t}"] = round(g_ms, 3)
            results[f"bf16_masked_ms_t{t}"] = round(m_ms, 3)
            results[f"bf16_speedup_t{t}"] = round(g_ms / m_ms, 2)
        if qp is not None:
            g_ms = timed(lambda: gq_j(x, ti, qp)) * 1e3
            m_ms = timed(lambda: mq_j(x, tw, ti, qp)) * 1e3
            results[f"q_gather_ms_t{t}"] = round(g_ms, 3)
            results[f"q_masked_ms_t{t}"] = round(m_ms, 3)
            results[f"q_speedup_t{t}"] = round(g_ms / m_ms, 2)
        if qp4 is not None:
            g_ms = timed(lambda: gq4_j(x, ti, qp4)) * 1e3
            m_ms = timed(lambda: mq4_j(x, tw, ti, qp4)) * 1e3
            results[f"q4_gather_ms_t{t}"] = round(g_ms, 3)
            results[f"q4_masked_ms_t{t}"] = round(m_ms, 3)
            results[f"q4_speedup_t{t}"] = round(g_ms / m_ms, 2)
        print(json.dumps({k: v for k, v in results.items()
                          if k.endswith(f"_t{t}")}), flush=True)

    # numeric sanity at t=4 vs the per-row path (same math, f32 combine)
    t = 4
    x = (jax.random.normal(jax.random.PRNGKey(3), (t, d), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    ti = jnp.asarray(
        np.stack([rng.choice(args.experts, 2, replace=False) for _ in range(t)])
        + args.experts, jnp.int32)
    tw = jnp.full((t, 2), 0.5, jnp.bfloat16)
    if "bf16" in args.modes:
        eo = gather_j(x, ti, wg, wu, wd)
        want = np.asarray(jnp.sum(eo * tw[..., None].astype(x.dtype), axis=1),
                          np.float32)
        got = np.asarray(masked_j(x, tw, ti, wg, wu, wd), np.float32)
        cos = float((want.ravel() @ got.ravel())
                    / (np.linalg.norm(want) * np.linalg.norm(got) + 1e-9))
        results["bf16_cos_vs_gather_t4"] = round(cos, 6)

    print(json.dumps(results), flush=True)
    if args.save:
        import os

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_results", "masked_moe.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"saved {path}")


if __name__ == "__main__":
    main()
