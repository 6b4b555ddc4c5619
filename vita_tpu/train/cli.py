"""Training entrypoint: `python -m vita_tpu.train.cli`.

Parity surface for the reference's train() launcher (vita/train/train.py:
205-404 + script/train/*.sh): stage presets, freeze flags, dataset specs,
resume, checkpointing.

Example (smoke run, random tiny model, byte tokenizer):
  python -m vita_tpu.train.cli --model tiny-random --stage finetune \
      --data chat.json --output-dir /tmp/run --batch-size 2 --epochs 1
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description="VITA-TPU trainer")
    p.add_argument("--model", required=True, help="checkpoint dir or 'tiny-random'")
    p.add_argument("--data", required=True, nargs="+", help="conversation JSON path(s)")
    p.add_argument("--data-ratio", type=float, default=1.0)
    p.add_argument("--output-dir", required=True)
    p.add_argument(
        "--stage",
        choices=["pretrain_mlp", "finetune", "finetune_task"],
        default="finetune",
    )
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--projector-lr", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--model-max-length", type=int, default=8192)
    p.add_argument("--max-patches", type=int, default=12)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mesh", type=int, nargs="+", default=None,
                   help="mesh shape: data fsdp expert model [pipe [seq]]; "
                        "pipe > 1 enables GPipe pipeline parallelism, "
                        "seq > 1 enables ring-attention sequence "
                        "parallelism (batch seq length must divide by it; "
                        "requires the flash attention backend)")
    p.add_argument("--pipe-microbatches", type=int, default=4,
                   help="GPipe microbatches when the mesh has pipe > 1")
    p.add_argument("--moe-mode", default=None,
                   choices=["dense", "capacity", "sort", "gmm"],
                   help="training MoE dispatch: dense (exact, E/k extra "
                        "FLOPs), capacity/sort (token-dropping), gmm "
                        "(Pallas grouped matmul — exact AND top-k-only "
                        "FLOPs, the fastest at scale)")
    p.add_argument("--moe-chunk", type=int, default=0,
                   help="run each layer's MoE as a rematerialized scan "
                        "over token chunks of this size: caps the step's "
                        "activation HBM high-water at ~1/3 extra MoE "
                        "FLOPs (memory-constrained fine-tuning; "
                        "chunk-local aux loss — see ops.moe.moe_ffn)")
    # stage chaining (reference: --pretrain_mm_mlp_adapter finetune.sh:16 /
    # vita_arch.py:63-69; whale final.pt init vita_arch.py:93-108; LoRA+base
    # builder.py:100-175)
    p.add_argument("--pretrain-mm-adapter", default=None,
                   help="adapter-only checkpoint from a previous stage "
                        "(Trainer.save_trainable_only output) to overlay")
    p.add_argument("--whale-init", default=None,
                   help="standalone audio-encoder final.pt (torch) to "
                        "shape-check-merge into the audio tower")
    p.add_argument("--lora-from", default=None,
                   help="LoRA adapter checkpoint dir to merge into the base "
                        "before training")
    p.add_argument("--lora-rank", type=int, default=8)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    args = p.parse_args(argv)

    import jax

    from vita_tpu.data.dataset import Collator, ConversationDataset, DataArgs, DatasetSpec
    from vita_tpu.models import vita
    from vita_tpu.parallel.mesh import make_mesh
    from vita_tpu.train.step import TrainConfig
    from vita_tpu.train.trainer import RunConfig, Trainer

    if args.model == "tiny-random":
        cfg = vita.VITAConfig.tiny()
        params = vita.init_params(jax.random.PRNGKey(0), cfg)

        from vita_tpu.cli import ByteTokenizer

        tok = ByteTokenizer()
        encode, bos_id, eos_id, pad_id = tok.encode, tok.bos_id, tok.eos_id, 0
    else:
        from vita_tpu.checkpoint import load_vita_checkpoint
        from vita_tpu.cli import load_hf_tokenizer

        cfg, params = load_vita_checkpoint(args.model)
        hf_tok = load_hf_tokenizer(args.model)
        encode = lambda s: hf_tok(s).input_ids
        bos_id, eos_id = hf_tok.bos_token_id, hf_tok.eos_token_id
        pad_id = hf_tok.pad_token_id

    if args.pretrain_mm_adapter:
        from vita_tpu.checkpoint import load_adapter_into

        params = load_adapter_into(params, args.pretrain_mm_adapter)
    if args.whale_init:
        from vita_tpu.checkpoint import load_whale_torch_checkpoint

        params = load_whale_torch_checkpoint(params, args.whale_init)
    if args.lora_from:
        from vita_tpu.checkpoint import load_checkpoint
        from vita_tpu.train.lora import LoRAConfig, merge_lora

        lora = load_checkpoint(args.lora_from)
        params = merge_lora(
            params, lora, LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
        )

    stage = {
        "pretrain_mlp": TrainConfig.stage1_pretrain_mlp,
        "finetune": TrainConfig.stage2_finetune,
        "finetune_task": TrainConfig.stage3_task,
    }[args.stage]()
    if args.learning_rate is not None:
        stage = type(stage)(**{**stage.__dict__, "learning_rate": args.learning_rate})
    if args.projector_lr is not None:
        stage = type(stage)(**{**stage.__dict__, "projector_lr": args.projector_lr})

    ds = ConversationDataset(
        [DatasetSpec(d, args.data_ratio) for d in args.data],
        encode, bos_id, eos_id, pad_id=pad_id,
        args=DataArgs(
            image_size=cfg.vision.image_size,
            max_patches=args.max_patches,
            model_max_length=args.model_max_length,
            use_thumbnail=cfg.vision.image_size >= 448,
            # the dataset's tiling scheme and per-group token count MUST
            # match the model's fusion config or merge_embeddings
            # misaligns (framecat 5-tuples; reducing projectors emit 64)
            vision_fusion=cfg.vision_fusion,
            image_tokens_per_group=cfg.image_tokens_per_group,
        ),
    )
    print(f"[data] {len(ds)} samples from {len(args.data)} file(s)")

    if args.moe_mode or args.moe_chunk:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, llm=_dc.replace(
            cfg.llm,
            moe_mode=args.moe_mode or cfg.llm.moe_mode,
            moe_chunk=args.moe_chunk,
        ))

    mesh = make_mesh(shape=args.mesh) if args.mesh else None
    if mesh is not None and mesh.shape["pipe"] > 1:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, llm=_dc.replace(
            cfg.llm, pipe_stages=mesh.shape["pipe"],
            pipe_microbatches=args.pipe_microbatches))
    if mesh is not None and mesh.shape["seq"] > 1 \
            and cfg.llm.attn_backend != "flash":
        # ring attention's only entry point is the flash-backend dispatch;
        # the xla backend would silently ignore the seq axis (and its
        # [B,S,S] bias defeats the long-context memory win seq exists for)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, llm=_dc.replace(cfg.llm, attn_backend="flash"))
        print("[mesh] seq > 1: switching LLM attention backend to 'flash' "
              "(ring-attention sequence parallelism)")
    run = RunConfig(
        output_dir=args.output_dir,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        save_every_steps=args.save_every,
        resume=not args.no_resume,
    )
    trainer = Trainer(cfg, stage, run, params, mesh=mesh)
    log = trainer.train(ds, Collator(pad_id=pad_id or 0))
    trainer.save()
    # the final async checkpoint write must land before the interpreter
    # exits (per-step saves stay non-blocking; only this last one waits)
    from vita_tpu.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    if log:
        print(f"[done] {len(log)} steps, final loss {log[-1]['loss']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
