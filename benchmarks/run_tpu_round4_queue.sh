#!/bin/bash
# Round-4 master TPU queue, value-ordered: the at-reference-tolerance
# polish rows first (VERDICT r3 item 1), then the AOT cold-start probe
# (item 3), the DMA-stream ceiling measurement (item 5), and finally the
# carried round-3 data batches V/W/X (item 2).  Each leg is bounded by
# its own timeout; killing this script's process group stops the queue.
set -u
cd "$(dirname "$0")/.."
bash benchmarks/run_tpu_round4d.sh        # 256^2 polish v2
bash benchmarks/run_tpu_round4c.sh        # fem42 + 512^2 polish v2
bash benchmarks/run_tpu_round4b.sh        # AOT serialization probe
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
timeout 3600 python benchmarks/dma_stream_bench.py --mb 256 --reps 8 2>&1 \
  | tee -a "benchmarks/results/tpu_${stamp}_dma_stream.log"
bash benchmarks/run_tpu_round3v.sh        # f32 divergence bisect
bash benchmarks/run_tpu_round3w.sh        # U32 tall-tile sweep
bash benchmarks/run_tpu_round3x.sh        # SA-AMG warm A/B
echo "queue done"
