#!/bin/bash
# Queued real-chip probes (run when the axon tunnel is healthy; each is
# individually time-bounded so a mid-run tunnel wedge can't eat the session).
# Usage: bash scripts/run_chip_probes.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/chip_probes.log}"
: > "$LOG"

run() {
  local name="$1" bound="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$bound" "$@" 2>&1 | tee -a "$LOG"
  echo "=== $name exit=$? ===" | tee -a "$LOG"
}

# tunnel sanity first: a single tiny op, hard 60s bound
run tunnel-sanity 60 python -c "import jax, jax.numpy as jnp; jnp.ones(4).block_until_ready(); print('tunnel ok', jax.devices())" || exit 1

# 0. fused int8 1x1 pallas kernel: compile check + vs XLA prequant
run int8_fused_1x1_probe 900 python scripts/int8_fused_1x1_probe.py

# 1. static/prequant int8 trunk vs dynamic vs bf16 (batch 32 + batch 1)
run int8_static_probe 1200 python scripts/int8_static_probe.py --iters 30

# 2. pipelined vs synchronous serving dispatch (cached features)
run pipeline_serving_probe 1200 python scripts/pipeline_serving_probe.py

# 3. headline bench suite (train + fcache train + serving + batch-1 ms)
run bench 1800 python bench.py

# 4. cnn3d frame-bucket hybrid (zero-run splice <= 12, pad-to-full above)
run cnn3d_bucket_probe 1200 python scripts/cnn3d_bucket_probe.py --batch 8

# 5. HTTP serving with multi-process clients (fp8 cache: the production shape)
run serve_mp_load_bench 1800 python scripts/serve_mp_load_bench.py --seconds 30 --feature_dtype float8_e4m3

# 6. tail flatten: torch-order transpose+matmul vs linear_chw einsum
run flatten_probe 600 python scripts/flatten_probe.py

# 7. serving eval-step component anatomy (pallas + static int8, B=1 and 32)
run serving_step_anatomy 1200 python scripts/serving_step_anatomy.py

# 8. bucketed serving headline (pallas + static int8 + fused 1x1 + buckets)
run bucketed_serving_probe 1200 python scripts/bucketed_serving_probe.py

echo "all probes done -> $LOG"

# 9. (round 5) int8 stem calibration feature-error + accuracy evidence:
#    scripts/int8_stem_accuracy.py trains a 15-epoch checkpoint first (slow,
#    ~25 min with datagen) — run when re-validating the stem quantization
#    (e.g. after swapping in real VGG weights):
# run int8_stem_accuracy 3600 python scripts/int8_stem_accuracy.py
# run fp8_cache_accuracy 1800 python scripts/fp8_cache_accuracy.py
