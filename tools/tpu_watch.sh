#!/bin/bash
# Watch for the TPU tunnel to come back; the moment a device probe succeeds,
# kick off the round-3 measurement battery (tools/r3_battery.sh).
# Logs: /tmp/tpu_watch.log ; battery logs: /tmp/r3_tpu/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "watch start $(date -u)" >> $LOG
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); assert d; print(d)" >> $LOG 2>&1; then
    echo "TPU UP $(date -u) — launching battery" >> $LOG
    bash tools/r3_battery.sh >> $LOG 2>&1
    echo "battery finished $(date -u)" >> $LOG
    exit 0
  fi
  echo "still down $(date -u)" >> $LOG
  sleep 240
done
