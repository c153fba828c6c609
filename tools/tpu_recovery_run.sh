#!/bin/bash
# Sequential TPU capture agenda for when the tunnel recovers (round 3).
# ONE python process at a time (the remote compile server queues jobs;
# two processes grind the queue — BENCH_NOTES.md).  Each step logs to
# /tmp/tpurun/<step>.log and continues on failure so one crash doesn't
# lose the rest.  Run:  bash tools/tpu_recovery_run.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpurun

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T))"
  timeout "$TMO" "$@" > "/tmp/tpurun/$name.log" 2>&1
  echo "    exit=$? ($(date +%T))"
}

# 0. quick liveness + stream-mode parity (fast kernels, validates the
#    SMEM-schedule/DMA lowering everything below depends on)
TMO=1800 run stream_check python tools/tpu_attn_stream_check.py

# 1. headline re-capture post-tail-chunks (bench.py writes BENCH json
#    fields + results; includes banded rows)
TMO=3600 run bench python bench.py

# 2. structured >=0.90: banded at hidden 8192 (dense_tile vs window —
#    window streams x once per super-group/window, the x-traffic fix)
TMO=5400 run struct8k python tools/tpu_struct16k_probe.py \
  --hidden 8192 --tag struct8k --modes dense_tile,window

# 3. structured at hidden 16384 (compute-bound regime, projected
#    0.88-0.92; weights ride as jit args so no HTTP 413)
TMO=7200 run struct16k python tools/tpu_struct16k_probe.py \
  --hidden 16384 --modes dense_tile,window

# 4. ctx-16384 fused attention crash isolation, stage by stage in
#    separate processes (a kernel fault kills the worker)
for st in 0 1 2 3 4 5; do
  TMO=3600 run "attn16k_s$st" python tools/tpu_attn16k_probe.py --stage "$st"
done

# 5. if all four stages passed, capture the full ctx sweep row
if grep -q PASS /tmp/tpurun/attn16k_s4.log 2>/dev/null; then
  TMO=7200 run attn_sweep16k python benchmarks/attn_sweep.py --ctxs 16384
fi

echo "=== done; logs in /tmp/tpurun/"
