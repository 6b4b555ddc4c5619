#!/bin/bash
# Fresh-process-per-shape split-dispatch train ladder (CLAUDE.md: the
# stacked-init slicing peak OOMs if arrays from a previous shape linger,
# so every attempt gets its own interpreter). Descends the token-volume
# ladder per mode and stops at the first shape that measures; failures
# are logged for manual *_failed_shapes merge. Shapes >=16k tokens get
# --moe-chunk 2048 (rematerialized MoE scan — the HBM lever that fits
# them; see bench_train_moe.py --moe-chunk).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/split_ladder.log
: > "$LOG"
for mode in gmm sort; do
  for shape in "8 4096" "4 4096" "8 2048" "4 2048" "2 2048" "4 1024" "2 1024"; do
    set -- $shape
    b=$1; s=$2
    chunk_args=""
    if [ $((b * s)) -ge 16384 ]; then chunk_args="--moe-chunk 2048"; fi
    echo "=== $mode ${b}x${s} $chunk_args $(date +%T)" >> "$LOG"
    timeout 2400 python tools/bench_train_moe.py --split-layers \
      --modes "$mode" --batch "$b" --seq "$s" $chunk_args --save >> "$LOG" 2>&1
    rc=$?
    echo "--- rc=$rc" >> "$LOG"
    if [ $rc -eq 0 ] && grep -q "\"${mode}_moe_tflops\"" bench_results/train_moe_split.json 2>/dev/null; then
      echo "=== $mode done at ${b}x${s}" >> "$LOG"
      break
    fi
  done
done
echo "=== ladder complete $(date +%T)" >> "$LOG"
