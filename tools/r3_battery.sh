#!/bin/bash
# Round-3 on-chip battery: run the full validation + measurement sequence
# once the TPU tunnel is back. Logs to /tmp/r3_tpu/. Each stage bounded.
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

# 1. compiled-kernel equivalence gate on the chip (pallas + pmajor v2 vs cellwise)
stage smoke 3000 env SAND_CRATE_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -x -q --no-header -p no:cacheprovider

# 2. v2 pass cost + W sweep on the production backend
stage pmajor_w 1800 python tools/pmajor_w.py 1000000 100 256 384 512

# 2b. dynamic-tile A/B (work proportional to actual window need; exact
#     coverage — expected biggest lever after v2 at settled occupancy)
stage pmajor_dynw 1200 env SAND_CRATE_PMAJOR_DYNW=1 python tools/pmajor_w.py 1000000 100 384

# 3. per-window-reduce A/B
stage pmajor_qred 1200 env SAND_CRATE_PMAJOR_QRED=1 python tools/pmajor_w.py 1000000 100 384

# 3b. dynamic tiles + per-tile reduce (the small-carry variant)
stage pmajor_dynw_qred 1200 env SAND_CRATE_PMAJOR_DYNW=1 SAND_CRATE_PMAJOR_QRED=1 python tools/pmajor_w.py 1000000 100 384

# 4. bf16 ceiling A/B (approximate mode - compile + speed only)
stage pmajor_bf16 1200 env SAND_CRATE_PMAJOR_BF16=1 python tools/pmajor_w.py 1000000 100 384

# 5. sort-permute strategies
stage sort_probe 900 python tools/sort_probe.py 1000000

# 6. per-op step profile
stage xprof 1800 python tools/xprof_step.py 1000000

# 6b. payload-operand sort A/B (replaces sort+wide-gather; tools/sort_probe
#     strategy b wired as a production knob in physics.neighbor_stage)
stage xprof_paysort 1800 env SAND_CRATE_SORT_PAYLOAD=1 python tools/xprof_step.py 1000000

# 7. headline bench
stage bench 1800 python bench.py

# 7b. headline bench under dynamic tiles (adopt as default if it wins)
stage bench_dynw 1800 env SAND_CRATE_PMAJOR_DYNW=1 python bench.py

# 8. long-horizon stability + droplet check (exact no-cap physics)
stage soak 5400 python tools/soak.py 1000000 2000 250

# 9. mid-size batched datagen demo (wave_machine scale, chunked backend)
stage datagen_mid 3000 python -m sand_crate_tpu datagen configs/wave_machine.yaml --crates 256 --ticks 100 --sample-every 50 --out /tmp/dg_mid

echo "battery done $(date)" | tee -a $OUT/battery.log
