"""LoRA: identity at init, trains, merges exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.models import mixtral as mx
from vita_tpu.models import vita
from vita_tpu.train.lora import LoRAConfig, apply_lora, init_lora, merge_lora
from vita_tpu.train.step import loss_fn


def test_lora_identity_at_init():
    cfg = mx.MixtralConfig.tiny()
    params = mx.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, LoRAConfig(rank=4))
    merged = apply_lora(params, lora, LoRAConfig(rank=4))
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    a, _, _ = mx.forward(params, cfg, input_ids=ids)
    b, _, _ = mx.forward(merged, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_lora_gradients_flow_and_base_frozen():
    vcfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), vcfg)
    lcfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params["llm"], lcfg)

    ids = jnp.array([[1, 5, 9, 2]], jnp.int32)
    batch = {"input_ids": ids, "labels": ids, "attn_valid": jnp.ones_like(ids, bool)}

    def loss(lora):
        merged = dict(params)
        merged["llm"] = apply_lora(params["llm"], lora, lcfg)
        return loss_fn(merged, vcfg, batch, 0.0)[0]

    g = jax.grad(loss)(lora)
    # B starts at zero, so dL/dA == 0 at init but dL/dB is generally nonzero
    gb = g["layers"]["attn"]["wq"]["b"]
    assert float(jnp.abs(gb).max()) > 0


def test_merge_lora_matches_runtime_application():
    vcfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), vcfg)
    lcfg = LoRAConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(1), params["llm"], lcfg)
    # make the adapters non-trivial
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    merged = merge_lora(params, lora, lcfg)
    ids = jnp.array([[1, 5, 9]], jnp.int32)
    runtime = dict(params)
    runtime["llm"] = apply_lora(params["llm"], lora, lcfg)
    a, _, _ = vita.forward(runtime, vcfg, ids)
    b, _, _ = vita.forward(merged, vcfg, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # and differs from the base model
    c, _, _ = vita.forward(params, vcfg, ids)
    assert not np.allclose(np.asarray(a), np.asarray(c))
