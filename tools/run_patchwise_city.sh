#!/bin/bash
# Patchwise (non-dense) model at CITY scale — VERDICT r3 next-step #8:
# prove the reference-parity per-anchor family covers the largest
# cities too, not just the dense flagship.  gmfnet at image9: train at
# the dense capstone's anchor budget, then the full test set (~35.2M
# anchors) and BOTH full-scene maps (50.4M anchors) through the
# chunked per-anchor predict path (Pallas gather at B=4096).
# ONE TPU process at a time.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
OUT=${1:-/root/pwruns}
CITY=${2:-image9}
MODEL=${3:-gmfnet}
shift 3 2>/dev/null || shift $# 2>/dev/null
EXTRA=("$@")
mkdir -p "$OUT"

probe_chip() {
  for _ in 1 2 3 4 5 6; do
    if timeout 300 python -c \
      "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); print(float((x @ x).sum()))" \
      > /dev/null 2>&1; then
      return 0
    fi
    echo "--- chip probe failed; backing off 3 min $(date +%T) ---"
    sleep 180
  done
  return 1
}

probe_chip || { echo "=== $CITY/$MODEL SKIPPED (chip unavailable) ==="; exit 1; }
echo "=== patchwise $CITY $MODEL start $(date +%T) ==="
timeout 10000 dmfusion --city "$CITY" --model "$MODEL" --set \
  train_rate=0.00186 verify_rate=0.001 epoch=20 time=1 \
  color.index=1 test_batchsize=4096 color_batchsize=4096 \
  expo_result="$OUT/${CITY}_${MODEL}/" seed=0 "${EXTRA[@]}" \
  > "$OUT/${CITY}_${MODEL}.log" 2>&1
echo "=== patchwise $CITY $MODEL exit $? $(date +%T) ==="
