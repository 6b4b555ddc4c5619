"""LoRA merge tool: `python -m vita_tpu.train.merge_lora`.

Parity with the reference's standalone merge script
(script/merge_lora_weights.py:8-28): load a base checkpoint + trained
adapters, fold the adapters into the base weights, and save a plain
checkpoint that needs no LoRA machinery at inference.
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description="Merge LoRA adapters into a base checkpoint")
    p.add_argument("--base", required=True, help="base VITA checkpoint dir")
    p.add_argument("--lora", required=True, help="orbax dir holding the adapter pytree")
    p.add_argument("--output", required=True)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--alpha", type=float, default=16.0)
    args = p.parse_args(argv)

    from vita_tpu.checkpoint import (
        load_checkpoint,
        load_vita_checkpoint,
        save_vita_checkpoint,
    )
    from vita_tpu.train.lora import LoRAConfig, merge_lora

    cfg, params = load_vita_checkpoint(args.base)
    lora = load_checkpoint(args.lora)
    merged = merge_lora(params, lora, LoRAConfig(rank=args.rank, alpha=args.alpha))
    save_vita_checkpoint(args.output, cfg, merged)
    print(f"[merge-lora] wrote merged checkpoint to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
