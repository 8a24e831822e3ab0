#!/bin/bash
# Sequential end-to-end CLI system runs for the remaining DATA_DICT
# cities (image5/image7/image8) on the one real chip — the same product
# recipe as the image9/image10 capstone runs (240 streamed full-batch
# dense epochs; train_rate sized so the full batch is ~65k anchors,
# within the AOT-proven shape).  ONE TPU process at a time.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
OUT=${1:-/root/cityruns}
mkdir -p "$OUT"

probe_chip() {
  # CLAUDE.md: a killed long-running TPU process can wedge the tunnel
  # lease for 30+ min — probe with a tiny matmul (with backoff) before
  # launching anything expensive.
  for _ in 1 2 3 4 5 6 7 8 9 10; do
    if timeout 120 python -c \
      "import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); print(float((x @ x).sum()))" \
      > /dev/null 2>&1; then
      return 0
    fi
    echo "--- chip probe failed; backing off 3 min $(date +%T) ---"
    sleep 180
  done
  return 1
}

run() {
  city=$1; tr=$2; vr=$3
  probe_chip || { echo "=== $city SKIPPED (chip unavailable) ==="; return 1; }
  echo "=== $city start $(date +%T) ==="
  timeout 5400 dmfusion --city "$city" --model dense_fusion --set \
    train_rate="$tr" verify_rate="$vr" epoch=240 time=1 \
    train.dense_epoch=full color.index=1 \
    expo_result="$OUT/" seed=0 \
    > "$OUT/${city}.log" 2>&1
  echo "=== $city exit $? $(date +%T) ==="
}

run image7 0.02 0.002
run image8 0.00687 0.002
run image5 0.00453 0.002
echo ALL-DONE
