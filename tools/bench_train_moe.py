"""Training-step MoE path comparison on the real chip.

Times fwd+bwd of a Mixtral train step at stage-3 token volume (batch 8 x
seq 4096, reduced to 2 full-width layers — the 32L model needs the v5e-8
slice) for the requested MoE modes. 'capacity' is omitted by default:
its [T, E, C] one-hot dispatch tensor at these shapes is ~10 GB per
layer and OOMs a single chip — which is exactly why 'sort' exists.

`--ladder` walks token-volume shapes downward per mode and records the
LARGEST shape the remote compile helper accepts (the r4/r5 helper 500s
on big fwd+bwd programs; this charts the floor instead of silently
shipping a toy number). `--attn xla` bisects whether the flash-attention
backward Pallas kernels are the crash trigger.

`--split-layers` dispatches the step as PER-LAYER programs instead of
one fused graph: one compiled layer-forward and one layer-(fwd+bwd)
program shared by every layer (plus a tiny head/embed pair), chained
asynchronously from the host exactly like the engine's decode chain.
Each program holds ONE layer's buffers, so the remote helper's
program-size ceiling caps the per-LAYER token volume, not the step's —
and the gmm mode runs the direct per-layer kernel path (no scan-sliced
stacked weights, no uint views), sidestepping whatever the helper
rejects about the fused gmm_scan bwd. This is also how a pipeline
runtime actually dispatches training, so the number is a legitimate
step throughput, not a microbench.

Prints one JSON line per measurement.
"""

import argparse
import json
import time

LADDER = [(8, 4096), (4, 4096), (8, 2048), (4, 2048), (8, 1024),
          (2, 2048), (4, 1024), (2, 1024)]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--modes", nargs="*", default=["dense", "sort"])
    p.add_argument("--attn", default="flash", choices=["flash", "xla"],
                   help="xla isolates whether the flash-attention bwd "
                        "Pallas kernels are what crashes the remote "
                        "compile helper on large programs")
    p.add_argument("--ladder", action="store_true",
                   help="walk token-volume shapes downward per mode and "
                        "record the largest that compiles (the VERDICT r4 "
                        "fallback: characterize the floor)")
    p.add_argument("--accum", type=int, default=1,
                   help="grad-accumulation microbatches INSIDE the jitted "
                        "step (lax.scan): the compiled program is one "
                        "microbatch's fwd+bwd, so the helper's program-"
                        "size limit stops capping the step's token volume "
                        "— this is also the reference's real regime "
                        "(micro-bs 8 x grad-accum 2, "
                        "finetuneTask_nodes.sh:48-51)")
    p.add_argument("--moe-chunk", type=int, default=0,
                   help="with --split-layers: run each layer's MoE as a "
                        "lax.scan over token chunks of this size with "
                        "jax.checkpoint on the body — the bwd then "
                        "rematerializes one chunk's expert intermediates "
                        "at a time instead of holding the full token "
                        "volume's (the multi-GB buffers that OOM the "
                        "chip at >=16k tokens), unlocking the stage-3 "
                        "shape (8x4096) on one chip at ~33%% extra MoE "
                        "fwd FLOPs. The aux load-balancing loss becomes "
                        "the mean of chunk-LOCAL aux losses (and sort-"
                        "mode capacity is per chunk); expert/output "
                        "grads are unchanged (verified vs whole-T gmm)")
    p.add_argument("--debug-compile", action="store_true",
                   help="with --split-layers: compile/run each program "
                        "separately with progress prints to stderr")
    p.add_argument("--split-layers", action="store_true",
                   help="dispatch per-layer programs (shared compiles) "
                        "instead of one fused step graph; saves to "
                        "train_moe_split.json")
    p.add_argument("--save", action="store_true",
                   help="write bench_results/train_moe.json (merged into "
                        "bench.py extras as recorded_train_*)")
    p.add_argument("--save-as", default=None, metavar="NAME.json",
                   help="with --save: write bench_results/NAME.json "
                        "instead of the default file (keeps runs at "
                        "different layer counts / dispatches from "
                        "clobbering each other)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry (CPU validation; do not --save)")
    args = p.parse_args()

    import dataclasses

    import jax

    if args.tiny:
        # CPU validation run (the axon plugin is absent off the TPU host)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vita_tpu.models import mixtral
    from vita_tpu.parallel.distributed import enable_compile_cache

    enable_compile_cache()

    # vocab shrunk: the full 51760-row fp32 logits tensor alone is ~7 GB at
    # this token volume and OOMs the single chip; expert cost is unchanged.
    # moe_chunk reaches BOTH dispatches: the fused step via the config knob
    # (MixtralConfig.moe_chunk -> every training layer path) and the
    # split-layer harness via its hand-built layer_step below
    if args.tiny:
        base = mixtral.MixtralConfig.tiny(
            n_layers=args.layers, remat=True, attn_backend=args.attn,
            moe_chunk=args.moe_chunk,
        )
    else:
        base = mixtral.MixtralConfig(
            n_layers=args.layers, vocab_size=8192, dtype=jnp.bfloat16,
            remat=True, attn_backend=args.attn, moe_chunk=args.moe_chunk,
        )
    params = mixtral.init_params(jax.random.PRNGKey(0), base)
    e_flops = 3 * 2 * base.d_model * base.d_ff  # per token per expert (fwd)

    def measure(mode, batch, seq):
        """(step_s, moe_tflops) or raises on compile/OOM failure."""
        cfg = dataclasses.replace(base, moe_mode=mode)
        ids = jax.random.randint(
            jax.random.PRNGKey(1), (batch, seq), 0, base.vocab_size
        )
        labels = jnp.roll(ids, -1, axis=1)

        def loss_fn(p, mb_ids, mb_labels):
            logits, _, aux = mixtral.forward(p, cfg, input_ids=mb_ids)
            lse = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ce = -jnp.take_along_axis(
                lse, mb_labels[..., None], axis=-1
            ).mean()
            return ce + cfg.router_aux_loss_coef * aux

        accum = args.accum
        if batch % accum:
            raise ValueError(f"batch {batch} % accum {accum}")

        # return only a scalar: holding a full 5.6 GB grad tree across
        # iterations would double-buffer grads and OOM the chip
        @jax.jit
        def step(p):
            if accum == 1:
                g = jax.grad(loss_fn)(p, ids, labels)
                return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                           for x in jax.tree.leaves(g))
            # grad accumulation: real training's regime AND the lever that
            # takes the step's token volume past the compile helper's
            # program-size ceiling. The grad tree rides the scan carry in
            # bf16 (a f32 carry would not fit next to the bf16 params).
            mb_ids = ids.reshape(accum, batch // accum, seq)
            mb_labels = labels.reshape(accum, batch // accum, seq)

            def body(g, xs):
                gi = jax.grad(loss_fn)(p, xs[0], xs[1])
                return jax.tree.map(
                    lambda a, b: a + b.astype(a.dtype), g, gi
                ), None

            g0 = jax.tree.map(jnp.zeros_like, p)
            g, _ = jax.lax.scan(body, g0, (mb_ids, mb_labels))
            return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                       for x in jax.tree.leaves(g))

        def run(n):
            t0 = time.time()
            s = None
            for _ in range(n):
                s = step(p_arg)
            _ = float(s)
            return time.time() - t0

        p_arg = params
        run(1)  # compile
        a, b = run(1), run(3)
        per_step = (b - a) / 2
        experts_used = base.n_experts if mode == "dense" else base.top_k
        flops = 3 * batch * seq * experts_used * e_flops * args.layers
        return per_step, flops / per_step / 1e12

    def measure_split(mode, batch, seq):
        """Per-layer-program step: (step_s, moe_tflops) or raises.

        Layer weights are initialized per layer (never stacked), so the
        gmm mode hits the direct `ops.moe_gmm.gmm` kernel path with real
        [E,D,F] arrays — the scan-era uint-view machinery (the programs
        the compile helper 500s on) never enters the graph.
        """
        from vita_tpu.models.mixtral import _attention_block, rms_norm
        from vita_tpu.ops.moe import moe_ffn

        cfg = dataclasses.replace(base, moe_mode=mode)
        nl = args.layers
        cfg1 = dataclasses.replace(cfg, n_layers=1)
        # per-layer init with eager leaf-by-leaf slicing: the [1, ...]
        # stacked original is freed the moment its slice exists, so the
        # transient HBM peak is one layer + ~one matrix, not 2x the
        # resident weights (a 16 GB chip holds 2 full-width layers plus
        # grads with little slack)
        lps, hp, embed = [], None, None
        for li in range(nl):
            p1 = mixtral.init_params(jax.random.PRNGKey(10 + li), cfg1)
            if li == 0:
                hp = {"ln_final": p1["ln_final"], "lm_head": p1["lm_head"]}
                embed = p1["embed"]
            stk = p1.pop("layers")
            del p1
            flat, td = jax.tree.flatten(stk)
            del stk
            sliced = []
            for i in range(len(flat)):
                sliced.append(flat[i][0])
                flat[i] = None
            lps.append(jax.tree.unflatten(td, sliced))

        ids = jax.random.randint(
            jax.random.PRNGKey(1), (batch, seq), 0, base.vocab_size
        )
        labels = jnp.roll(ids, -1, axis=1)
        positions = jnp.broadcast_to(jnp.arange(seq)[None, :], (batch, seq))
        valid = jnp.ones((batch, seq), bool)
        d = cfg.d_model

        def moe_whole(lp_moe, h2d):
            return moe_ffn(
                lp_moe, h2d, cfg.top_k,
                mode=mode, capacity_factor=cfg.moe_capacity_factor,
            )

        mc = args.moe_chunk
        if mc:
            if (batch * seq) % mc:
                raise ValueError(f"tokens {batch * seq} % moe_chunk {mc}")

            def moe_block(lp_moe, h2d):
                # equal-size chunks => mean of per-chunk aux means is exact
                hc = h2d.reshape(-1, mc, d)

                @jax.checkpoint
                def body(_, xc):
                    out, aux = moe_whole(lp_moe, xc)
                    return None, (out, aux)

                _, (outs, auxs) = jax.lax.scan(body, None, hc)
                return outs.reshape(h2d.shape), auxs.mean()
        else:
            moe_block = moe_whole

        def layer_step(lp, x):
            h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
            attn_out, _, _ = _attention_block(
                lp["attn"], cfg, h, positions, valid, None, None, None
            )
            x = x + attn_out
            h = rms_norm(x, lp["ln_moe"], cfg.rms_eps)
            moe_out, aux = moe_block(lp["moe"], h.reshape(batch * seq, d))
            return x + moe_out.reshape(batch, seq, d), aux

        def layer_bwd_fn(lp, x, ct):
            (_, aux), vjp = jax.vjp(layer_step, lp, x)
            g_lp, g_x = vjp(
                (ct, jnp.asarray(cfg.router_aux_loss_coef, aux.dtype))
            )
            # reduce the per-layer grad tree to a scalar INSIDE the
            # program: the full tree never round-trips through HBM as a
            # program output (a real optimizer would consume it here)
            ss = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(g_lp))
            return ss, g_x

        def head_bwd_fn(hp, x, mb_labels):
            def head_ce(hp, x2d, lab1d):
                h = rms_norm(x2d, hp["ln_final"], cfg.rms_eps)
                logits = h @ hp["lm_head"]
                lse = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                return -jnp.take_along_axis(
                    lse, lab1d[:, None], axis=-1
                ).mean()

            def head_loss(hp, x):
                if not mc:
                    return head_ce(hp, x.reshape(-1, d),
                                   mb_labels.reshape(-1))
                # chunk the CE over tokens like the MoE: the full-T fp32
                # logits+softmax buffers (~GBs at 32k tokens) otherwise set
                # this program's HBM peak. Equal chunks => mean of chunk
                # means is the exact global CE mean.
                xc = x.reshape(-1, mc, d)
                lc = mb_labels.reshape(-1, mc)

                @jax.checkpoint
                def body(_, inp):
                    return None, head_ce(hp, inp[0], inp[1])

                _, ces = jax.lax.scan(body, None, (xc, lc))
                return ces.mean()

            loss, (g_hp, g_x) = jax.value_and_grad(
                head_loss, argnums=(0, 1)
            )(hp, x)
            ss = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(g_hp))
            return loss, ss, g_x

        def embed_bwd_fn(ct):
            g = jnp.zeros(
                (base.vocab_size, d), jnp.float32
            ).at[ids.reshape(-1)].add(ct.reshape(-1, d).astype(jnp.float32))
            return jnp.sum(jnp.square(g))

        fwd_p = jax.jit(layer_step)
        # ct is consumed by each layer's bwd (the returned g_x replaces
        # it) — donating it halves the live cotangent buffers
        bwd_p = jax.jit(layer_bwd_fn, donate_argnums=(2,))
        head_p = jax.jit(head_bwd_fn, donate_argnums=(1,))
        emb_fwd_p = jax.jit(lambda e: jnp.take(e, ids, axis=0))
        emb_bwd_p = jax.jit(embed_bwd_fn, donate_argnums=(0,))

        def step():
            x = emb_fwd_p(embed)
            xs = []
            for li in range(nl):
                xs.append(x)
                x, _ = fwd_p(lps[li], x)
            _, total, ct = head_p(hp, x, labels)
            del x
            for li in reversed(range(nl)):
                ssl, ct = bwd_p(lps[li], xs[li], ct)
                xs[li] = None  # free the residual input as soon as used
                total = total + ssl
            return total + emb_bwd_p(ct)

        def run(n):
            t0 = time.time()
            s = None
            for _ in range(n):
                s = step()
            _ = float(s)
            return time.time() - t0

        if args.debug_compile:
            import sys

            x = emb_fwd_p(embed)
            _ = float(x[0, 0, 0])  # host readback = the only axon sync
            print("emb_fwd ok", file=sys.stderr, flush=True)
            y, _aux = fwd_p(lps[0], x)
            _ = float(y[0, 0, 0])
            print("layer_fwd ok", file=sys.stderr, flush=True)
            _, ss, ct = head_p(hp, y, labels)
            _ = float(ss)
            print("head_bwd ok", file=sys.stderr, flush=True)
            ssl, ct = bwd_p(lps[0], x, ct)
            _ = float(ssl)
            print("layer_bwd ok", file=sys.stderr, flush=True)
            _ = float(emb_bwd_p(ct))
            print("emb_bwd ok", file=sys.stderr, flush=True)
            del x, y, ct

        run(1)  # compile (5 programs, shared across layers)
        a, b = run(1), run(3)
        per_step = (b - a) / 2
        experts_used = base.n_experts if mode == "dense" else base.top_k
        flops = 3 * batch * seq * experts_used * e_flops * nl
        return per_step, flops / per_step / 1e12

    results = {}
    shapes = LADDER if args.ladder else [(args.batch, args.seq)]
    meas = measure_split if args.split_layers else measure
    for mode in args.modes:
        for batch, seq in shapes:
            try:
                per_step, tflops = meas(mode, batch, seq)
            except Exception as e:  # compile 500 / OOM — step down
                line = {"mode": mode, "batch": batch, "seq": seq,
                        "error": str(e)[:100]}
                print(json.dumps(line), flush=True)
                results.setdefault(f"{mode}_failed_shapes", []).append(
                    f"{batch}x{seq}"
                )
                # a genuine OOM must not cascade into the next rung: drop
                # the cached executables (and with them the exception
                # frames' array references) before retrying smaller
                import gc

                jax.clear_caches()
                gc.collect()
                continue
            results[f"{mode}_step_s"] = round(per_step, 3)
            results[f"{mode}_moe_tflops"] = round(tflops, 1)
            results[f"{mode}_batch"] = batch
            results[f"{mode}_seq"] = seq
            print(json.dumps({"mode": mode, "batch": batch, "seq": seq,
                              "step_s": round(per_step, 3),
                              "moe_tflops": round(tflops, 1)}), flush=True)
            break  # largest compiling shape recorded; stop the ladder

    if "dense_step_s" in results and "sort_step_s" in results:
        results["sort_speedup_vs_dense"] = round(
            results["dense_step_s"] / results["sort_step_s"], 2
        )
    out = {
        "metric": "moe_train_step", "attn": args.attn,
        "layers": args.layers, "grad_accum": args.accum,
        "dispatch": "per_layer_programs" if args.split_layers else "fused",
        **({"moe_chunk": args.moe_chunk} if args.moe_chunk else {}),
        **{k: v for k, v in results.items()},
    }
    print(json.dumps(out))
    measured = any(k.endswith("_moe_tflops") for k in results)
    if args.save and not measured:
        print("not saving: no mode produced a throughput number "
              "(compile/tunnel failure?)")
    if args.save and measured:
        import os

        fname = args.save_as or ("train_moe_split.json" if args.split_layers
                                 else "train_moe.json")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_results", fname)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # split-dispatch runs must be one fresh process per shape (the
        # stacked-init slicing peak OOMs if other arrays linger), so each
        # mode arrives in its own process — merge into the existing file
        # instead of clobbering the other mode's measurement
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
            except (OSError, ValueError):
                prev = {}
            merged = {k: v for k, v in prev.items()
                      if not k.endswith("_failed_shapes")}
            merged.update(out)
            out = merged
        with open(path, "w") as f:
            json.dump(out, f)
        print("wrote", path)


if __name__ == "__main__":
    main()
