"""Mixtral core: golden logits vs HF transformers, cache parity, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import mixtral as mx


@pytest.fixture(scope="module")
def tiny():
    return mx.MixtralConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params(tiny):
    return mx.init_params(jax.random.PRNGKey(0), tiny)


def test_forward_shapes(tiny, tiny_params):
    ids = jnp.array([[1, 5, 9, 2], [3, 4, 0, 0]], jnp.int32)
    logits, cache, aux = mx.forward(tiny_params, tiny, input_ids=ids)
    assert logits.shape == (2, 4, tiny.vocab_size)
    assert cache is None
    assert np.isfinite(float(aux))


def test_causality(tiny, tiny_params):
    """Changing a future token must not change past logits."""
    ids1 = jnp.array([[1, 5, 9, 2]], jnp.int32)
    ids2 = jnp.array([[1, 5, 9, 7]], jnp.int32)
    l1, _, _ = mx.forward(tiny_params, tiny, input_ids=ids1)
    l2, _, _ = mx.forward(tiny_params, tiny, input_ids=ids2)
    np.testing.assert_allclose(l1[:, :3], l2[:, :3], rtol=1e-5, atol=1e-5)
    assert not np.allclose(l1[:, 3], l2[:, 3])


def test_prefill_decode_matches_full_forward(tiny, tiny_params):
    """Cached prefill+decode must produce the same logits as one full pass."""
    ids = jnp.array([[1, 5, 9, 2, 7, 3]], jnp.int32)
    full, _, _ = mx.forward(tiny_params, tiny, input_ids=ids)

    cache = mx.init_kv_cache(tiny, batch=1, max_len=8)
    lp, cache, _ = mx.forward(tiny_params, tiny, input_ids=ids[:, :4], cache=cache)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(full[:, :4]), rtol=2e-4, atol=2e-4)
    step_logits = []
    for t in range(4, 6):
        lt, cache, _ = mx.forward(tiny_params, tiny, input_ids=ids[:, t : t + 1], cache=cache)
        step_logits.append(np.asarray(lt[:, 0]))
    np.testing.assert_allclose(step_logits[0], np.asarray(full[:, 4]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(step_logits[1], np.asarray(full[:, 5]), rtol=2e-4, atol=2e-4)


def test_padding_invariance(tiny, tiny_params):
    """Logits at valid positions must not depend on padded tail tokens."""
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    padded = jnp.array([[1, 5, 9, 111, 222]], jnp.int32)
    valid = jnp.array([[True, True, True, False, False]])
    l1, _, _ = mx.forward(tiny_params, tiny, input_ids=ids)
    l2, _, _ = mx.forward(tiny_params, tiny, input_ids=padded, attn_valid=valid)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2[:, :3]), rtol=1e-5, atol=1e-5)


def test_moe_capacity_mode_approximates_dense(tiny, tiny_params):
    """With generous capacity, capacity mode must equal dense exactly."""
    ids = jnp.array([[1, 5, 9, 2]], jnp.int32)
    dense, _, aux_d = mx.forward(tiny_params, tiny, input_ids=ids)
    import dataclasses

    cfg_cap = dataclasses.replace(tiny, moe_mode="capacity", moe_capacity_factor=float(tiny.n_experts))
    cap, _, aux_c = mx.forward(tiny_params, cfg_cap, input_ids=ids)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(cap), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(aux_d), float(aux_c), rtol=1e-6)


@pytest.mark.parametrize("seq", [7])
def test_golden_logits_vs_hf(seq):
    """Bit-level architecture parity: random tiny HF Mixtral vs ours."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig as HFConfig
    from transformers import MixtralForCausalLM

    from vita_tpu.utils.hf_import import mixtral_params_from_hf

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=1e6,
        rms_norm_eps=1e-5, sliding_window=None, max_position_embeddings=256,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = MixtralForCausalLM(hf_cfg).eval().to(torch.float32)

    cfg = mx.MixtralConfig(
        vocab_size=128, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=64, n_experts=4, top_k=2, rope_theta=1e6,
    )
    params = jax.tree.map(jnp.asarray, mixtral_params_from_hf(hf_model.state_dict(), cfg))

    ids_np = np.array([[1, 17, 42, 99, 5, 64, 2]], np.int64)[:, :seq]
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    ours, _, _ = mx.forward(params, cfg, input_ids=jnp.asarray(ids_np, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4)


def test_sharded_forward_runs(mesh8, tiny, tiny_params):
    """Forward under a 4-axis mesh with declarative param sharding."""
    from vita_tpu.parallel.mesh import shard

    specs = mx.param_specs(tiny)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, jax.sharding.NamedSharding(mesh8, s)),
        tiny_params, specs,
    )
    ids = jnp.array([[1, 5, 9, 2]] * 2, jnp.int32)
    ids = jax.device_put(ids, shard(mesh8, ("data", "fsdp"), None))
    logits, _, _ = jax.jit(lambda p, i: mx.forward(p, tiny, input_ids=i))(sharded, ids)
    ref, _, _ = mx.forward(tiny_params, tiny, input_ids=ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_hf_export_import_roundtrip(tiny, tiny_params):
    """mixtral_params_to_hf is the exact inverse of mixtral_params_from_hf."""
    from vita_tpu.utils.hf_import import mixtral_params_from_hf, mixtral_params_to_hf

    state = mixtral_params_to_hf(tiny_params, tiny)
    back = jax.tree.map(jnp.asarray, mixtral_params_from_hf(state, tiny))
    for a, b in zip(jax.tree.leaves(tiny_params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
