#!/bin/bash
# Round-3 benchmark artifact marathon (run on the TPU rig, nothing else
# using the chip or heavy CPU concurrently).  Produces:
#   BENCH_MUX_r03.json      - MUX gate bench (batch 16384)
#   BENCH_B65536_r03.json   - NAND at batch 2^16 (BASELINE config 4)
#   SCALING_r03.json        - TPU per-chip batch sweep + virtual-mesh dp scaling
# NAND cold/warm compile numbers land in the driver's BENCH_r03.json; the
# sweep here doubles as the warm-cache seed for it.
set -u
cd "$(dirname "$0")/.."

echo "== NAND batch sweep (gates/sec saturation; seeds the compile cache) =="
SWEEP_JSON="["
first=1
for B in 4096 8192 16384 32768 65536; do
  echo "--- batch $B ---"
  OUT=$(NUFHE_BENCH_BATCH=$B python bench.py 2>/tmp/bench_b${B}_err.json)
  DET=$(grep -o '{"detail".*' /tmp/bench_b${B}_err.json | tail -1)
  echo "$OUT"
  echo "$DET"
  if [ "$B" = "65536" ]; then
    { echo "$OUT"; echo "$DET"; } > BENCH_B65536_r03.json
  fi
  GPS=$(echo "$DET" | python -c "import json,sys; print(json.loads(sys.stdin.read())['detail']['gates_per_sec'])")
  MSB=$(echo "$OUT" | python -c "import json,sys; print(json.loads(sys.stdin.read())['value'])")
  [ $first = 0 ] && SWEEP_JSON="$SWEEP_JSON,"
  SWEEP_JSON="$SWEEP_JSON{\"batch\": $B, \"gates_per_sec\": $GPS, \"ms_per_bit\": $MSB}"
  first=0
done
SWEEP_JSON="$SWEEP_JSON]"

echo "== MUX bench =="
NUFHE_BENCH_GATE=mux python bench.py > /tmp/bench_mux_out.json 2>/tmp/bench_mux_err.json
cat /tmp/bench_mux_out.json > BENCH_MUX_r03.json
grep -o '{"detail".*' /tmp/bench_mux_err.json | tail -1 >> BENCH_MUX_r03.json
cat BENCH_MUX_r03.json

echo "== virtual 8-device CPU mesh dp scaling =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  NUFHE_SCALE_BATCH=256 NUFHE_SCALE_LWE_SIZE=100 \
  python bench_scaling.py > /tmp/scale_out.json 2>/tmp/scale_err.json
cat /tmp/scale_out.json /tmp/scale_err.json

python - <<EOF
import json
sweep = json.loads('''$SWEEP_JSON''')
per_count = [json.loads(l) for l in open('/tmp/scale_err.json')
             if l.strip().startswith('{')]
summary = json.load(open('/tmp/scale_out.json'))
json.dump({
  "tpu_per_chip_batch_sweep": sweep,
  "virtual_mesh_dp": {"per_chip_count": per_count, "summary": summary},
}, open('SCALING_r03.json', 'w'), indent=1)
print("wrote SCALING_r03.json")
EOF
