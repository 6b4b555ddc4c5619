"""Trainer: loss decreases, freeze masks hold, checkpoint/resume round-trips."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vita_tpu.data.dataset import Collator, ConversationDataset, DataArgs, DatasetSpec
from vita_tpu.models import vita
from vita_tpu.train.step import (
    TrainConfig,
    loss_fn,
    make_optimizer,
    make_train_step,
    trainable_mask,
)
from vita_tpu.train.trainer import RunConfig, Trainer

BOS, EOS, PAD = 1, 2, 0


def sp_encode(s):
    # ids must stay inside the tiny model's 512 vocab: OOB ids turn into
    # NaN embeddings (jnp.take fill mode)
    return [BOS] + [
        3 if t == "</s>" else 100 + (sum(map(ord, t)) % 400)
        for t in s.replace("</s>", " </s> ").split()
    ]


@pytest.fixture(scope="module")
def tiny_cfg():
    return vita.VITAConfig.tiny()


def lang_batch(cfg, b=2, s=16):
    rng = np.random.RandomState(0)
    ids = rng.randint(3, cfg.llm.vocab_size, (b, s)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "attn_valid": jnp.ones((b, s), bool),
    }


def test_loss_decreases(tiny_cfg):
    params = vita.init_params(jax.random.PRNGKey(0), tiny_cfg)
    tc = TrainConfig(learning_rate=1e-2, warmup_steps=1, total_steps=50)
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(tiny_cfg, tc, opt))
    batch = lang_batch(tiny_cfg)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_freeze_masks_hold(tiny_cfg):
    """Frozen components must not change after a step."""
    params = vita.init_params(jax.random.PRNGKey(0), tiny_cfg)
    tc = TrainConfig(
        learning_rate=1e-2, warmup_steps=1, total_steps=10,
        train_llm=False, train_vision=False, train_audio=False,
        train_vision_proj=True, train_audio_proj=False,
    )
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(tiny_cfg, tc, opt))
    img_tokens = tiny_cfg.vision.out_tokens
    sz = tiny_cfg.vision.image_size
    from vita_tpu.constants import IMAGE_TOKEN_INDEX
    from vita_tpu.tokenization import media_masks

    ids = [1, 7] + [IMAGE_TOKEN_INDEX] * img_tokens + [9, 5]
    safe, im, am = media_masks(np.array(ids))
    batch = {
        "input_ids": jnp.asarray(safe)[None].astype(jnp.int32),
        "labels": jnp.asarray(np.where(im | am, -100, safe))[None].astype(jnp.int32),
        "image_mask": jnp.asarray(im)[None],
        "audio_mask": jnp.asarray(am)[None],
        "images": jnp.ones((1, sz, sz, 3)) * 0.1,
        "attn_valid": jnp.ones((1, len(ids)), bool),
    }
    new_params, new_opt_state = params, opt_state
    for _ in range(3):  # step past the lr warmup (lr == 0 at step 0)
        new_params, new_opt_state, _ = step(new_params, new_opt_state, batch)
    # llm frozen
    same = jax.tree.map(lambda a, b: bool(jnp.allclose(a, b)), params["llm"], new_params["llm"])
    assert all(jax.tree.leaves(same))
    # vision projector trained
    assert not bool(
        jnp.allclose(params["vision_proj"]["fc1_w"], new_params["vision_proj"]["fc1_w"])
    )


@pytest.mark.slow
def test_trainer_end_to_end_with_resume(tiny_cfg, tmp_path):
    from PIL import Image

    img = tmp_path / "i.png"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(img)
    data = [
        {"conversations": [{"from": "human", "value": "<image>\nq"}, {"from": "gpt", "value": "a b"}],
         "image": str(img)},
        {"conversations": [{"from": "human", "value": "hi"}, {"from": "gpt", "value": "yo"}]},
    ] * 3
    chat = tmp_path / "c.json"
    chat.write_text(json.dumps(data))
    ds = ConversationDataset(
        [DatasetSpec(str(chat))], sp_encode, BOS, EOS, pad_id=PAD,
        args=DataArgs(image_size=tiny_cfg.vision.image_size, max_patches=1,
                      use_thumbnail=False),
    )
    params = vita.init_params(jax.random.PRNGKey(0), tiny_cfg)
    run = RunConfig(output_dir=str(tmp_path / "out"), batch_size=2, num_epochs=1,
                    save_every_steps=2)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20)
    tr = Trainer(tiny_cfg, tc, run, params)
    log = tr.train(ds, Collator(pad_id=PAD, buckets=(2048,)))
    assert len(log) == 3  # 6 samples / batch 2
    assert all(np.isfinite(m["loss"]) for m in log)
    saved_step = tr.step - (tr.step % run.save_every_steps)
    assert saved_step > 0

    # resume: a fresh trainer picks up the saved step
    tr2 = Trainer(tiny_cfg, tc, run, vita.init_params(jax.random.PRNGKey(1), tiny_cfg))
    assert tr2.step == saved_step
    # resumed params equal the saved ones, not the fresh init
    a = jax.tree.leaves(tr.params)[0]
    b = jax.tree.leaves(tr2.params)[0]
    if saved_step == tr.step:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_evaluate_perplexity(tiny_cfg, tmp_path):
    import json as _json

    from vita_tpu.data.dataset import Collator, ConversationDataset, DataArgs, DatasetSpec
    from vita_tpu.train.trainer import evaluate

    data = [{"conversations": [{"from": "human", "value": f"q {i}"},
                               {"from": "gpt", "value": f"answer number {i}"}]} for i in range(4)]
    chat = tmp_path / "c.json"
    chat.write_text(_json.dumps(data))
    ds = ConversationDataset([DatasetSpec(str(chat))], sp_encode, BOS, EOS, pad_id=PAD,
                             args=DataArgs(image_size=tiny_cfg.vision.image_size))
    params = vita.init_params(jax.random.PRNGKey(0), tiny_cfg)
    m = evaluate(params, tiny_cfg, ds, Collator(pad_id=PAD, buckets=(512,)), batch_size=2)
    assert m["eval_tokens"] > 0
    assert 1.0 < m["eval_ppl"] < tiny_cfg.llm.vocab_size * 10


@pytest.mark.slow
def test_split_dispatch_train_bench_tiny():
    """The per-layer-program train bench (tools/bench_train_moe.py
    --split-layers) must produce a throughput number on the CPU backend:
    it is the only dispatch whose token volume clears the axon compile
    helper's fused-program ceiling, so its harness (shared per-layer
    fwd/vjp programs, eager leaf-freed init, donated cotangent chain)
    needs CI coverage off-chip."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_train_moe.py"),
         "--tiny", "--split-layers", "--attn", "xla", "--modes", "sort",
         "--batch", "2", "--seq", "64", "--layers", "2",
         # chunked-remat MoE (the lever that fits stage-3 token volume on
         # one chip): scan-over-chunks + jax.checkpoint must survive the
         # per-layer vjp programs off-chip too
         "--moe-chunk", "32"],
        cwd=repo, capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    final = json.loads(lines[-1])
    assert final["dispatch"] == "per_layer_programs"
    assert final["sort_step_s"] > 0
