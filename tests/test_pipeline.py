"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
'pipe' mesh axis must be numerically identical to the unpipelined scan, for
forward, gradients, and a full multimodal train step — including composed
with fsdp sharding. Reference role: the vLLM PP plumbing the reference
carries (web_demo/vllm_tools/vllm_file/mixtral.py:592-628,712-724)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vita_tpu.models import mixtral
from vita_tpu.parallel.mesh import make_mesh


def _cfg(**kw):
    # top_k == n_experts: routing weights are a full softmax (no selection
    # discontinuity), so PP-vs-scan comparisons measure the schedule, not
    # near-tie top-k flips under reordered f32 accumulation
    return mixtral.MixtralConfig.tiny(
        n_layers=4, moe_mode="dense", n_experts=2, top_k=2, **kw
    )


def test_pipeline_transform_exact():
    """The raw transform on a smooth layer body is exact (fwd + grads)."""
    from vita_tpu.parallel.pipeline import pipeline_layer_stack

    L, D, B, S = 8, 16, 8, 6
    W = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D))
    scale = jax.random.normal(jax.random.PRNGKey(2), (B, S, 1))

    def body(w, xx, consts):
        return jnp.tanh(xx @ w) * consts, jnp.sum(xx**2)

    def ref(W, x):
        out, aux = x, 0.0
        for i in range(L):
            out, a = body(W[i], out, scale)
            aux = aux + a
        return out, aux

    mesh = make_mesh(shape=(1, 2, 1, 1, 4), devices=jax.devices()[:8])

    def pp(W, x):
        return pipeline_layer_stack(mesh, body, W, x, scale, 4, 4)

    r_out, r_aux = ref(W, x)
    p_out, p_aux = jax.jit(pp)(W, x)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(r_out), atol=1e-6)
    # per-microbatch aux sums average to 1/M of the full-batch sum
    np.testing.assert_allclose(float(p_aux), float(r_aux) / 4, rtol=1e-6)

    g_r = jax.grad(lambda W: jnp.sum(ref(W, x)[0] ** 2))(W)
    g_p = jax.jit(jax.grad(lambda W: jnp.sum(pp(W, x)[0] ** 2)))(W)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-5)


def _pipe_mesh(pipe=4, fsdp=1):
    n = pipe * fsdp
    return make_mesh(shape=(1, fsdp, 1, 1, pipe), devices=jax.devices()[:n])


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, cfg.vocab_size)
    return cfg, params, ids


def test_pp_forward_matches_scan(setup):
    cfg, params, ids = setup
    ref, _, aux_ref = mixtral.forward(params, cfg, input_ids=ids)

    mesh = _pipe_mesh(pipe=4)
    cfg_pp = dataclasses.replace(cfg, pipe_stages=4, pipe_microbatches=2)
    specs = mixtral.param_specs(cfg_pp)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    got, _, aux_pp = jax.jit(
        lambda p, i: mixtral.forward(p, cfg_pp, input_ids=i, mesh=mesh)
    )(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # uniform (absent) token mask -> per-microbatch aux means average exactly
    np.testing.assert_allclose(float(aux_pp), float(aux_ref), rtol=1e-4)


def test_pp_grads_match(setup):
    cfg, params, ids = setup
    labels = jnp.roll(ids, -1, axis=1)

    def loss(p, c, mesh=None):
        logits, _, aux = mixtral.forward(p, c, input_ids=ids, mesh=mesh)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1).mean()
        return nll + 0.02 * aux

    g_ref = jax.grad(loss)(params, cfg)

    mesh = _pipe_mesh(pipe=2, fsdp=2)  # PP composed with fsdp sharding
    cfg_pp = dataclasses.replace(cfg, pipe_stages=2, pipe_microbatches=4)
    specs = mixtral.param_specs(cfg_pp)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    g_pp = jax.jit(jax.grad(lambda p: loss(p, cfg_pp, mesh)))(sharded)
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_pp, _ = jax.tree.flatten(g_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


def test_pp_remat_matches(setup):
    cfg, params, ids = setup
    mesh = _pipe_mesh(pipe=4)
    cfg_pp = dataclasses.replace(cfg, pipe_stages=4, pipe_microbatches=2)
    cfg_rm = dataclasses.replace(cfg_pp, remat=True)
    specs = mixtral.param_specs(cfg_pp)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )

    def loss(p, c):
        logits, _, _ = mixtral.forward(p, c, input_ids=ids, mesh=mesh)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(lambda p: loss(p, cfg_pp)))(sharded)
    g2 = jax.jit(jax.grad(lambda p: loss(p, cfg_rm)))(sharded)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_pp_errors(setup):
    cfg, params, ids = setup
    mesh = _pipe_mesh(pipe=4)
    with pytest.raises(ValueError, match="mesh"):
        mixtral.forward(
            params, dataclasses.replace(cfg, pipe_stages=4), input_ids=ids
        )
    # n_layers=4 not divisible by 3 stages
    bad = dataclasses.replace(cfg, pipe_stages=3)
    with pytest.raises(ValueError):
        mixtral.forward(params, bad, input_ids=ids, mesh=mesh)
    # cache path rejected
    cfg_pp = dataclasses.replace(cfg, pipe_stages=4)
    cache = mixtral.init_kv_cache(cfg, batch=4, max_len=32)
    with pytest.raises(ValueError, match="cacheless"):
        mixtral.forward(params, cfg_pp, input_ids=ids, cache=cache, mesh=mesh)


def test_pp_full_train_step():
    """Full multimodal train step with PP + fsdp: loss finite and close to
    the unpipelined step's loss on identical inputs."""
    from vita_tpu.constants import IMAGE_TOKEN_INDEX
    from vita_tpu.models import vita
    from vita_tpu.tokenization import media_masks
    from vita_tpu.train.step import TrainConfig, make_optimizer, make_train_step

    cfg = vita.VITAConfig.tiny()
    assert cfg.llm.n_layers % 2 == 0
    cfg_pp = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, pipe_stages=2, pipe_microbatches=2)
    )
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig()
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)

    img_tokens = cfg.vision.out_tokens
    ids = [1, 7] + [IMAGE_TOKEN_INDEX] * img_tokens + [9, 5, 2]
    safe, im, am = media_masks(np.array(ids))
    b, sz = 2, cfg.vision.image_size
    batch = {
        "input_ids": jnp.asarray(np.tile(safe, (b, 1)), jnp.int32),
        "labels": jnp.asarray(np.tile(safe, (b, 1)), jnp.int32),
        "image_mask": jnp.asarray(np.tile(im, (b, 1))),
        "audio_mask": jnp.asarray(np.tile(am, (b, 1))),
        "images": jnp.zeros((b, sz, sz, 3), jnp.float32),
        "speech": jnp.zeros((b, 50, 80), jnp.float32),
        "speech_lengths": jnp.full((b,), 50),
        "attn_valid": jnp.ones((b, len(ids)), bool),
    }

    _, _, m_ref = jax.jit(make_train_step(cfg, tc, opt))(
        params, opt_state, batch
    )

    mesh = make_mesh(shape=(1, 2, 1, 2, 2), devices=jax.devices()[:8])
    specs = vita.param_specs(cfg_pp)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    opt_state_s = opt.init(sharded)
    batch_s = {
        k: jax.device_put(v, NamedSharding(mesh, P()))
        for k, v in batch.items()
    }
    step_pp = jax.jit(make_train_step(cfg_pp, tc, opt, mesh=mesh))
    _, _, m_pp = step_pp(sharded, opt_state_s, batch_s)
    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=5e-3)


def test_pipeline_composes_with_ring_attention_and_tp():
    """pipe=2 x model=2 x seq=2 on mesh8: pp_layer threads the mesh into
    the attention island (nested shard_map via the context abstract
    mesh), so ring attention + TP head sharding run INSIDE the pipeline.
    Logits must equal the unpipelined unsharded pass exactly; the MoE
    aux term is per-microbatch (documented GPipe deviation)."""
    import dataclasses

    cfg = mixtral.MixtralConfig.tiny(attn_backend="flash")
    cfg_pp = dataclasses.replace(cfg, pipe_stages=2, pipe_microbatches=2)
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    mesh = make_mesh((1, 1, 1, 2, 2, 2))

    ref, _, _ = mixtral.forward(params, mixtral.MixtralConfig.tiny(),
                                input_ids=ids)
    got, _, aux = mixtral.forward(params, cfg_pp, input_ids=ids, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(float(aux))


def test_pp_decode_greedy_matches_sequential():
    """Ring-schedule PP decode (pipeline_decode_greedy): S waves decoding
    over a 4-stage pipe produce token-for-token the same greedy
    continuations as the unpipelined single-step decode loop, and the
    updated cache chains into a second call. Reference role: the decode
    half of vLLM's PP plumbing (vllm_file/mixtral.py:592-628), never
    deployed by the reference."""
    cfg = _cfg()  # 4 layers, dense MoE (smooth routing)
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    S, B, T0, MAXLEN, N_NEW = 4, 2, 7, 32, 5
    mesh = _pipe_mesh(pipe=S)

    rng = np.random.default_rng(0)
    prompts = rng.integers(1, cfg.vocab_size, (S, B, T0)).astype(np.int32)

    # reference: per-wave prefill + sequential greedy single-token steps
    ref_tokens = np.zeros((S, N_NEW * 2, B), np.int32)
    for w in range(S):
        cache = mixtral.init_kv_cache(cfg, batch=B, max_len=MAXLEN)
        logits, cache, _ = mixtral.forward(
            params, cfg, input_ids=jnp.asarray(prompts[w]), cache=cache
        )
        tok = jnp.argmax(logits[:, T0 - 1].astype(jnp.float32), -1)
        for i in range(N_NEW * 2):
            logits, cache, _ = mixtral.forward(
                params, cfg, input_ids=tok[:, None].astype(jnp.int32),
                cache=cache,
            )
            tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)
            ref_tokens[w, i] = np.asarray(tok)

    # PP: same prefill (unpipelined), caches stacked wave-major
    pp_cache = mixtral.init_pp_kv_cache(cfg, n_waves=S, batch=B,
                                        max_len=MAXLEN)
    ks, vs, first = [], [], []
    for w in range(S):
        cache = mixtral.init_kv_cache(cfg, batch=B, max_len=MAXLEN)
        logits, cache, _ = mixtral.forward(
            params, cfg, input_ids=jnp.asarray(prompts[w]), cache=cache
        )
        ks.append(cache["k"])
        vs.append(cache["v"])
        first.append(jnp.argmax(logits[:, T0 - 1].astype(jnp.float32), -1))
    pp_cache = {
        "k": jnp.stack(ks, axis=1),
        "v": jnp.stack(vs, axis=1),
        "pos": jnp.full((S, B), T0, jnp.int32),
    }
    first_tokens = jnp.stack(first).astype(jnp.int32)

    run = jax.jit(
        lambda p, c, f: mixtral.pp_decode_greedy(p, cfg, mesh, c, f, N_NEW)
    )
    toks1, pp_cache = run(params, pp_cache, first_tokens)
    np.testing.assert_array_equal(np.asarray(toks1), ref_tokens[:, :N_NEW])

    # chain: continue from the updated cache with the last sampled tokens
    toks2, pp_cache = run(params, pp_cache, toks1[:, -1])
    np.testing.assert_array_equal(np.asarray(toks2), ref_tokens[:, N_NEW:])
    assert np.asarray(pp_cache["pos"]).min() == T0 + 2 * N_NEW


def test_pp_decode_validates():
    cfg = _cfg()
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    mesh = _pipe_mesh(pipe=4)
    cache = mixtral.init_pp_kv_cache(cfg, n_waves=2, batch=1, max_len=8)
    with pytest.raises(ValueError, match="wave count"):
        mixtral.pp_decode_greedy(
            params, cfg, mesh, cache, jnp.zeros((2, 1), jnp.int32), 2
        )


def test_pp_decode_gather_mode_matches_sequential():
    """PP decode with the gather MoE dispatch: each stage reads its LOCAL
    stacked experts through flat [L/S*E] views (kernel never consumes
    scan-sliced weights) — tokens must match the unpipelined gather-mode
    decode exactly."""
    cfg = dataclasses.replace(_cfg(), moe_mode="gather")
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    S, B, T0, MAXLEN, N_NEW = 2, 2, 5, 16, 4
    mesh = _pipe_mesh(pipe=S)

    rng = np.random.default_rng(1)
    prompts = rng.integers(1, cfg.vocab_size, (S, B, T0)).astype(np.int32)

    ref_tokens = np.zeros((S, N_NEW, B), np.int32)
    ks, vs, first = [], [], []
    for w in range(S):
        cache = mixtral.init_kv_cache(cfg, batch=B, max_len=MAXLEN)
        logits, cache, _ = mixtral.forward(
            params, cfg, input_ids=jnp.asarray(prompts[w]), cache=cache
        )
        tok = jnp.argmax(logits[:, T0 - 1].astype(jnp.float32), -1)
        ks.append(cache["k"])
        vs.append(cache["v"])
        first.append(tok)
        for i in range(N_NEW):
            logits, cache, _ = mixtral.forward(
                params, cfg, input_ids=tok[:, None].astype(jnp.int32),
                cache=cache,
            )
            tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)
            ref_tokens[w, i] = np.asarray(tok)

    pp_cache = {
        "k": jnp.stack(ks, axis=1),
        "v": jnp.stack(vs, axis=1),
        "pos": jnp.full((S, B), T0, jnp.int32),
    }
    toks, _ = jax.jit(
        lambda p, c, f: mixtral.pp_decode_greedy(p, cfg, mesh, c, f, N_NEW)
    )(params, pp_cache, jnp.stack(first).astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(toks), ref_tokens)


def test_pp_generate_end_to_end_matches_sequential():
    """pp_generate = GPipe prefill (materializing the layer-sharded KV
    cache in-ring) + S-wave ring decode: greedy tokens must equal the
    unpipelined prefill + single-step decode loop, wave for wave."""
    cfg = _cfg()
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    S, B, T0, MAXLEN, N_NEW = 2, 2, 6, 16, 5
    cfg_pp = dataclasses.replace(cfg, pipe_stages=S)
    mesh = _pipe_mesh(pipe=S)

    rng = np.random.default_rng(7)
    prompts = rng.integers(1, cfg.vocab_size, (S, B, T0)).astype(np.int32)

    ref_tokens = np.zeros((S, N_NEW + 1, B), np.int32)
    for w in range(S):
        cache = mixtral.init_kv_cache(cfg, batch=B, max_len=MAXLEN)
        logits, cache, _ = mixtral.forward(
            params, cfg, input_ids=jnp.asarray(prompts[w]), cache=cache
        )
        tok = jnp.argmax(logits[:, T0 - 1].astype(jnp.float32), -1)
        ref_tokens[w, 0] = np.asarray(tok)
        for i in range(N_NEW):
            logits, cache, _ = mixtral.forward(
                params, cfg, input_ids=tok[:, None].astype(jnp.int32),
                cache=cache,
            )
            tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)
            ref_tokens[w, i + 1] = np.asarray(tok)

    got = jax.jit(
        lambda p, pr: mixtral.pp_generate(p, cfg_pp, mesh, pr, N_NEW, MAXLEN)
    )(params, jnp.asarray(prompts))
    np.testing.assert_array_equal(np.asarray(got), ref_tokens)
