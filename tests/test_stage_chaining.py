"""Stage chaining + full HF export (VERDICT round-1 item 8): adapter-only
overlay (vita_arch.py:63-69), whale final.pt partial init (:93-108), LoRA+
base load (builder.py:100-175), and import->export->import identity."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.models import vita


@pytest.fixture()
def tiny():
    cfg = vita.VITAConfig.tiny()
    params = vita.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _bf16(params):
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)


def test_hf_export_import_identity(tmp_path, tiny):
    """Export to the deployed HF layout and re-import: exact round trip
    (bf16 source values are f32-representable, so equality is bitwise)."""
    from vita_tpu.checkpoint import export_hf_vita_checkpoint, load_vita_checkpoint
    from vita_tpu.utils.hf_import import vita_params_to_hf

    cfg, params = tiny
    params = _bf16(params)
    out = str(tmp_path / "hf")
    export_hf_vita_checkpoint(out, cfg, params)

    assert os.path.exists(os.path.join(out, "model.safetensors"))
    fe = json.load(open(os.path.join(out, "feature_extractor",
                                     "preprocessor_config.json")))
    assert len(fe["cmvn_means"]) == 80

    cfg2, params2 = load_vita_checkpoint(out)
    assert cfg2.llm.d_model == cfg.llm.d_model
    assert cfg2.vision.n_layers == cfg.vision.n_layers

    s1 = vita_params_to_hf(params, cfg)
    s2 = vita_params_to_hf(params2, cfg2)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k], err_msg=k)


def test_whale_final_pt_partial_init(tmp_path, tiny):
    import torch

    from vita_tpu.checkpoint import load_whale_torch_checkpoint
    from vita_tpu.utils.hf_import import whale_params_to_hf

    cfg, params = tiny
    src = vita.init_params(jax.random.PRNGKey(7), cfg)  # different weights
    n_layers = cfg.audio.n_layers
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in whale_params_to_hf(src["audio"], n_layers).items()}
    pt = str(tmp_path / "final.pt")
    torch.save(state, pt)

    loaded = load_whale_torch_checkpoint(params, pt)
    # every audio leaf except cmvn now matches the source encoder
    np.testing.assert_allclose(
        np.asarray(loaded["audio"]["layers"]["q_w"]),
        np.asarray(src["audio"]["layers"]["q_w"]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["audio"]["sub"]["conv1_w"]),
        np.asarray(src["audio"]["sub"]["conv1_w"]), rtol=1e-6,
    )
    # LLM untouched
    np.testing.assert_array_equal(
        np.asarray(loaded["llm"]["embed"]), np.asarray(params["llm"]["embed"])
    )

    # shape mismatch: entry skipped, everything else still loads
    state_bad = dict(state)
    state_bad["encoder.layers.0.feed_forward.w_1.weight"] = torch.zeros(3, 3)
    pt2 = str(tmp_path / "final_bad.pt")
    torch.save(state_bad, pt2)
    loaded2 = load_whale_torch_checkpoint(params, pt2)
    np.testing.assert_allclose(
        np.asarray(loaded2["audio"]["layers"]["q_w"]),
        np.asarray(src["audio"]["layers"]["q_w"]), rtol=1e-6,
    )
    # the mismatched entry (layer 0) keeps the destination value; other
    # layers of the same stack still load
    np.testing.assert_allclose(
        np.asarray(loaded2["audio"]["layers"]["ffn1_w"][0]),
        np.asarray(params["audio"]["layers"]["ffn1_w"][0]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded2["audio"]["layers"]["ffn1_w"][1]),
        np.asarray(src["audio"]["layers"]["ffn1_w"][1]), rtol=1e-6,
    )


def test_three_stage_recipe(tmp_path, tiny):
    """stage1 (projector-only) -> adapter ckpt -> overlay into a fresh base
    -> stage2 full save -> stage3 resume from it; driven end-to-end."""
    import dataclasses

    from vita_tpu.checkpoint import (
        load_adapter_into,
        load_vita_checkpoint,
        save_vita_checkpoint,
        wait_for_checkpoints,
    )
    from vita_tpu.data.dataset import Collator
    from vita_tpu.train.step import TrainConfig
    from vita_tpu.train.trainer import RunConfig, Trainer

    cfg, params = tiny
    from vita_tpu.constants import IMAGE_TOKEN_INDEX

    sz, n_tok = cfg.vision.image_size, cfg.vision.out_tokens
    ids = np.array([1] + [IMAGE_TOKEN_INDEX] * n_tok + [5, 6, 7, 2])
    labels = np.where(ids == IMAGE_TOKEN_INDEX, -100, ids)
    labels[0] = -100
    rng = np.random.default_rng(0)
    data = [
        {"input_ids": ids, "labels": labels, "modality": "image",
         "images": rng.normal(size=(1, sz, sz, 3)).astype(np.float32)}
        for _ in range(4)
    ]

    class DS:
        samples = data

        def __len__(self):
            return len(data)

        def __getitem__(self, i):
            return data[i]

        def modality_lengths(self):
            return [5] * len(data)

    stage1 = dataclasses.replace(
        TrainConfig.stage1_pretrain_mlp(), warmup_steps=1, total_steps=4
    )
    run1 = RunConfig(output_dir=str(tmp_path / "s1"), batch_size=2, num_epochs=1)
    t1 = Trainer(cfg, stage1, run1, params)
    t1.train(DS(), Collator(pad_id=0, buckets=(8,)))
    t1.save_trainable_only("adapters")
    wait_for_checkpoints()

    # stage 2: fresh base + adapter overlay
    base = vita.init_params(jax.random.PRNGKey(0), cfg)
    chained = load_adapter_into(base, str(tmp_path / "s1" / "adapters"))
    np.testing.assert_allclose(
        np.asarray(chained["vision_proj"]["fc1_w"]),
        np.asarray(t1.params["vision_proj"]["fc1_w"]), rtol=1e-6,
    )
    assert not np.allclose(
        np.asarray(chained["vision_proj"]["fc1_w"]),
        np.asarray(base["vision_proj"]["fc1_w"]),
    )

    stage2 = dataclasses.replace(
        TrainConfig.stage2_finetune(), warmup_steps=1, total_steps=4
    )
    run2 = RunConfig(output_dir=str(tmp_path / "s2"), batch_size=2, num_epochs=1)
    t2 = Trainer(cfg, stage2, run2, chained)
    t2.train(DS(), Collator(pad_id=0, buckets=(8,)))
    save_vita_checkpoint(str(tmp_path / "s2full"), cfg, t2.params)
    wait_for_checkpoints()

    # stage 3 consumes the full stage-2 checkpoint
    cfg3, params3 = load_vita_checkpoint(str(tmp_path / "s2full"))
    stage3 = dataclasses.replace(
        TrainConfig.stage3_task(), warmup_steps=1, total_steps=4
    )
    run3 = RunConfig(output_dir=str(tmp_path / "s3"), batch_size=2, num_epochs=1)
    t3 = Trainer(cfg3, stage3, run3, params3)
    log = t3.train(DS(), Collator(pad_id=0, buckets=(8,)))
    assert log and np.isfinite(log[-1]["loss"])


def test_lora_plus_base_load_path(tmp_path, tiny):
    from vita_tpu.checkpoint import (
        load_lora_vita_checkpoint,
        save_checkpoint,
        save_vita_checkpoint,
        wait_for_checkpoints,
    )
    from vita_tpu.train.lora import LoRAConfig, init_lora, merge_lora

    cfg, params = tiny
    save_vita_checkpoint(str(tmp_path / "base"), cfg, params)
    lcfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(jax.random.PRNGKey(3), params["llm"], lcfg)
    # perturb B so the merge is non-trivial (B inits at zero)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    save_checkpoint(str(tmp_path / "lora"), lora)
    wait_for_checkpoints()

    cfg2, merged = load_lora_vita_checkpoint(
        str(tmp_path / "base"), str(tmp_path / "lora"), rank=4, alpha=8.0
    )
    want = merge_lora(params, lora, lcfg)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged["llm"])[0]),
        np.asarray(jax.tree.leaves(want["llm"])[0]), rtol=1e-4, atol=1e-5,
    )
    assert not np.allclose(
        np.asarray(jax.tree.leaves(merged["llm"]["layers"]["attn"])[0]),
        np.asarray(jax.tree.leaves(params["llm"]["layers"]["attn"])[0]),
    )


def test_hf_export_import_nondefault_projector(tmp_path, tiny):
    """A non-mlp2x projector kind must survive the HF round trip: the kind
    rides config.json (mm_projector_type) and the weights serialize under
    native.<path> keys (no reference layout exists for these variants)."""
    import dataclasses

    from vita_tpu.checkpoint import export_hf_vita_checkpoint, load_vita_checkpoint
    from vita_tpu.models import projectors, vita

    cfg, params = tiny
    cfg = dataclasses.replace(cfg, vision_projector="mlp3x_gelu")
    params = dict(params)
    params["vision_proj"] = projectors.init_vision_projector_kind(
        jax.random.PRNGKey(3), cfg.vision_proj_in_dim, cfg.llm.d_model,
        kind="mlp3x_gelu",
    )
    params = _bf16(params)
    out = str(tmp_path / "hf3x")
    export_hf_vita_checkpoint(out, cfg, params)

    cfg2, params2 = load_vita_checkpoint(out)
    assert cfg2.vision_projector == "mlp3x_gelu"
    flat1, tree1 = jax.tree_util.tree_flatten(params["vision_proj"])
    flat2, tree2 = jax.tree_util.tree_flatten(params2["vision_proj"])
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # and the loaded stack actually runs with the restored projector
    ids = np.array([1, 5, 9], np.int32)
    logits, _, _ = vita.forward(params2, cfg2, jnp.asarray(ids)[None])
    assert np.isfinite(np.asarray(logits, np.float32)).all()
