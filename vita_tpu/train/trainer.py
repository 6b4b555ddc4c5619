"""Training loop: batching, sharded steps, checkpointing, resume, logging.

The TPU-native replacement for the reference's HF-Trainer + DeepSpeed stack
(vita/train/train.py:205-404, vita_trainer.py:155-341): one jitted train
step over the 4-axis mesh; orbax checkpoints of {params, opt_state, step};
auto-resume from the latest step (train.py:384-387 semantics);
modality-grouped batch order; per-step loss logging (logging_steps 1).
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import time
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vita_tpu.data.dataset import Collator, modality_grouped_indices
from vita_tpu.models import vita
from vita_tpu.train.step import TrainConfig, make_optimizer, make_train_step


@dataclasses.dataclass
class RunConfig:
    output_dir: str
    batch_size: int = 8
    num_epochs: int = 1
    save_every_steps: int = 500
    keep_checkpoints: int = 2  # save_total_limit 2
    log_every: int = 1
    seed: int = 42
    resume: bool = True
    loader_workers: int = 4


class Trainer:
    def __init__(
        self,
        cfg: vita.VITAConfig,
        tc: TrainConfig,
        run: RunConfig,
        params,
        mesh=None,
    ):
        self.cfg, self.tc, self.run = cfg, tc, run
        self.optimizer = make_optimizer(tc, params)
        self.mesh = mesh

        if mesh is not None:
            from jax.sharding import NamedSharding

            specs = vita.param_specs(cfg)
            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
            )
        self.params = params
        self.opt_state = self.optimizer.init(params)
        # donate the old params/opt_state buffers: they are dead after the
        # call (immediately rebound) and keeping both generations live
        # doubles peak HBM at stage-3 scale
        self.step_fn = jax.jit(
            make_train_step(cfg, tc, self.optimizer, mesh=mesh),
            donate_argnums=(0, 1),
        )
        self.step = 0
        self.metrics_log: List[Dict[str, float]] = []

        if run.resume:
            self._maybe_resume()

    # -- checkpointing ----------------------------------------------------
    def _ckpt_dir(self) -> str:
        return os.path.join(self.run.output_dir, "ckpt")

    def _maybe_resume(self) -> None:
        from vita_tpu.checkpoint import latest_step, load_checkpoint

        last = latest_step(self._ckpt_dir())
        if last is None:
            return
        state = load_checkpoint(
            self._ckpt_dir(), last,
            target={"params": self.params, "opt_state": self.opt_state},
        )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = last
        print(f"[trainer] resumed from step {last}")

    def save(self) -> None:
        from vita_tpu.checkpoint import save_checkpoint

        save_checkpoint(
            self._ckpt_dir(),
            {"params": self.params, "opt_state": self.opt_state},
            step=self.step,
        )
        self._prune_checkpoints()

    def _prune_checkpoints(self) -> None:
        # no wait: _committed_steps filters in-flight *.orbax-checkpoint-tmp
        # dirs, and the only in-flight step is the newest (never pruned) —
        # blocking here would nullify the async checkpointer
        d = self._ckpt_dir()
        if not os.path.isdir(d):
            return
        from vita_tpu.checkpoint import _committed_steps

        steps = _committed_steps(d)
        for s in steps[: -self.run.keep_checkpoints]:
            import shutil

            shutil.rmtree(os.path.join(d, f"step_{s}"), ignore_errors=True)

    def save_trainable_only(self, name: str = "adapters") -> None:
        """Stage-1-style adapter-only checkpoint (vita_trainer.py:285-311):
        persist just the trainable components (e.g. mm projector)."""
        from vita_tpu.checkpoint import save_checkpoint
        from vita_tpu.train.step import trainable_mask

        mask = trainable_mask(self.params, self.tc)
        subset = {
            k: v for k, v in self.params.items()
            if jax.tree.leaves(mask[k]) and jax.tree.leaves(mask[k])[0]
        }
        save_checkpoint(
            os.path.join(self.run.output_dir, name), subset, step=self.step
        )

    # -- data -------------------------------------------------------------
    def batches(self, dataset, collator: Collator) -> Iterable[Dict[str, np.ndarray]]:
        from vita_tpu.data.loader import PrefetchLoader

        rng = random.Random(self.run.seed + self.step)
        order = modality_grouped_indices(
            dataset.modality_lengths(), self.run.batch_size, rng
        )
        # background sample building + collation overlaps the TPU step
        return PrefetchLoader(
            dataset, order, self.run.batch_size, collator,
            num_workers=self.run.loader_workers, prefetch=2,
        )

    # -- loop -------------------------------------------------------------
    def train(self, dataset, collator: Optional[Collator] = None) -> List[Dict[str, float]]:
        collator = collator or Collator(pad_id=0)
        # resume semantics (train.py:384-387): a resumed run continues the
        # SAME schedule — skip the batches already trained instead of
        # re-running num_epochs full epochs on top (a completed run
        # becomes a no-op). Skipped batches are built then discarded
        # (host-side collation only; the device never sees them).
        resume_skip = self.step
        g = 0
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bs = self.run.batch_size
            put = lambda v: jax.device_put(
                v, NamedSharding(
                    self.mesh,
                    P(("data", "fsdp")) if v.ndim >= 1 and v.shape[0] == bs
                    else P(),
                )
            )
        else:
            put = lambda v: v
        for epoch in range(self.run.num_epochs):
            for batch in self.batches(dataset, collator):
                if g < resume_skip:
                    g += 1
                    continue
                g += 1
                t0 = time.time()
                jbatch = {
                    k: put(jnp.asarray(v))
                    for k, v in batch.items() if k != "tiles_per_sample"
                }
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, jbatch
                )
                self.step += 1
                if self.step % self.run.log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=self.step, epoch=epoch, step_time=time.time() - t0)
                    self.metrics_log.append(m)
                    print(
                        f"[step {self.step}] loss={m['loss']:.4f} ce={m['ce']:.4f} "
                        f"aux={m['aux']:.4f} ({m['step_time']:.2f}s)"
                    )
                if self.step % self.run.save_every_steps == 0:
                    self.save()
        os.makedirs(self.run.output_dir, exist_ok=True)
        with open(os.path.join(self.run.output_dir, "metrics.jsonl"), "a") as f:
            for m in self.metrics_log:
                f.write(json.dumps(m) + "\n")
        from vita_tpu.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        return self.metrics_log


def make_eval_step(cfg: vita.VITAConfig):
    """Jitted eval step: masked token NLL sums for perplexity."""
    from vita_tpu.constants import IGNORE_INDEX

    def step(params, batch):
        logits, _, _ = vita.forward(
            params, cfg,
            batch["input_ids"],
            image_mask=batch.get("image_mask"),
            audio_mask=batch.get("audio_mask"),
            images=batch.get("images"),
            speech=batch.get("speech"),
            speech_lengths=batch.get("speech_lengths"),
            attn_valid=batch.get("attn_valid"),
        )
        logits = logits[:, :-1]
        labels = batch["labels"][:, 1:]
        mask = labels != IGNORE_INDEX
        safe = jnp.where(mask, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask), mask.sum()

    return jax.jit(step)


def evaluate(params, cfg: vita.VITAConfig, dataset, collator: Collator,
             batch_size: int = 8, max_batches: Optional[int] = None) -> Dict[str, float]:
    """Perplexity over a held-out conversation dataset (the reference has
    no eval loop at all — this fills SURVEY §4's gap for numeric evals)."""
    step = make_eval_step(cfg)
    total_nll = 0.0
    total_tok = 0
    n = len(dataset)
    for bi, i in enumerate(range(0, n, batch_size)):
        if max_batches is not None and bi >= max_batches:
            break
        # the tail batch evaluates too (variable batch shape => one extra
        # compile at most; silently dropping samples skews small evals)
        batch = collator([dataset[j] for j in range(i, min(i + batch_size, n))])
        jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "tiles_per_sample"}
        nll, tok = step(params, jbatch)
        total_nll += float(nll)
        total_tok += int(tok)
    if total_tok == 0:
        # no evaluated tokens must not read as a perfect score
        return {"eval_nll": float("nan"), "eval_ppl": float("nan"),
                "eval_tokens": 0}
    ppl = float(np.exp(total_nll / total_tok))
    return {"eval_nll": total_nll / total_tok, "eval_ppl": ppl,
            "eval_tokens": total_tok}
