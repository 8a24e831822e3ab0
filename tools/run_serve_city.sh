#!/bin/bash
# The full product loop on the real chip: train -> export (.dmx) ->
# SERVE (dmfusion-infer classifies the whole scene from the artifact
# alone).  Proves the deployment surface executes on TPU, and records
# the served throughput + OA agreement with the in-process test phase.
# ONE TPU process at a time.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
OUT=${1:-/root/serveruns}
CITY=${2:-image4}
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

echo "=== [1/3] train $CITY $MODEL start $(date +%T) ==="
timeout 4000 dmfusion --city "$CITY" --model "$MODEL" --set \
  train_rate=0.02 verify_rate=0.01 epoch=10 time=1 seed=0 \
  test_batchsize=4096 expo_result="$OUT/${CITY}_${MODEL}/" "${EXTRA[@]}" \
  > "$OUT/train.log" 2>&1
echo "train exit $? $(date +%T)"

# Newest first: a reused $OUT can hold older runs' slots, and the
# lexicographically-first match would silently export STALE weights
# while the log presents them as the just-trained ones (ADVICE r4).
W=$(ls -t "$OUT/${CITY}_${MODEL}/"*/"${MODEL}"__*_output/*_weights.msgpack 2>/dev/null | head -1)
[ -n "$W" ] || { echo "=== no weights produced; see $OUT/train.log ==="; exit 1; }

echo "=== [2/3] export $(date +%T) ==="
# Export is pure lowering — keep it OFF the chip (device=cpu).
timeout 1200 dmfusion-export --city "$CITY" --model "$MODEL" \
  --set device=cpu seed=0 --weights "$W" \
  --out "$OUT/${CITY}_${MODEL}.dmx" 2> "$OUT/export.log"
echo "export exit $? $(date +%T)"

echo "=== [3/3] serve on chip $(date +%T) ==="
timeout 4000 dmfusion-infer --artifact "$OUT/${CITY}_${MODEL}.dmx" \
  --bucket 32768 --out "$OUT/maps" 2> "$OUT/infer.log"
echo "=== serve exit $? $(date +%T) ==="
