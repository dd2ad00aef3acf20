#!/bin/bash
# On-chip validation + measurement battery (run after any kernel/step
# change, or whenever the TPU tunnel returns after an outage).  Logs to
# /tmp/r3_tpu/.  Each stage bounded.
#
# The round-3 experiment stages (DYNW / QRED / BF16 / payload-sort A/Bs)
# ran 2026-08-18 and were decided — verdicts in docs/perf_1m.md; the
# losing knobs are removed from the code and from this battery.
set -u
OUT=/tmp/r3_tpu
mkdir -p $OUT
cd "$(dirname "$0")/.."

stage() {  # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a $OUT/battery.log
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))" | tee -a $OUT/battery.log
}

# 1. compiled-kernel equivalence gate on the chip (pallas + pmajor vs cellwise)
stage smoke 3000 env SAND_CRATE_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -x -q --no-header -p no:cacheprovider

# 2. pass cost on the production backend (current W default)
stage pmajor_w 1800 python tools/pmajor_w.py 1000000 100 384

# 3. per-op step profile
stage xprof 1800 python tools/xprof_step.py 1000000

# 4. headline bench
stage bench 1800 python bench.py

# 5. long-horizon stability + droplet check (exact no-cap physics)
stage soak 5400 python tools/soak.py 1000000 2000 250

# 6. mid-size batched datagen demo (wave_machine scale, chunked backend)
stage datagen_mid 3000 python -m sand_crate_tpu datagen configs/wave_machine.yaml --crates 256 --ticks 100 --sample-every 50 --out /tmp/dg_mid

echo "battery done $(date)" | tee -a $OUT/battery.log
