#!/bin/bash
# Round-5 benchmark artifact marathon (run on the real chip).
# Each bench prints its JSON headline to stdout and detail to stderr;
# artifacts land in the repo root for the judge.
set -u
cd "$(dirname "$0")/.."

run_bench () {  # name, env...
    local name="$1"; shift
    echo "=== $name ($(date +%H:%M:%S)) ==="
    env "$@" python bench.py > "/tmp/${name}.out" 2> "/tmp/${name}.err"
    { cat "/tmp/${name}.out"; cat "/tmp/${name}.err" | grep -v WARNING; } \
        | tee "${name}.json"
}

# headline: rounded-key ('FFT' mode) NAND at batch 2^14
# BENCH_FFT_r05 captured separately (10.07x run)

# exact engine NAND (vs the reference's 0.35 ms/bit NTT number)
run_bench BENCH_r05 NUFHE_BENCH_TRANSFORM=ntt

# MUX, both engines (reference: NTT 0.67, FFT 0.22 ms/bit)
run_bench BENCH_MUX_r05 NUFHE_BENCH_GATE=mux NUFHE_BENCH_TRANSFORM=ntt
run_bench BENCH_FFT_MUX_r05 NUFHE_BENCH_GATE=mux NUFHE_BENCH_TRANSFORM=fft

# batch 2^16 (saturation point)
run_bench BENCH_FFT_B65536_r05 NUFHE_BENCH_TRANSFORM=fft NUFHE_BENCH_BATCH=65536

# labeled opt-in variant: coarse modulus switch level 1 (NOT the default —
# failure-rate cost table in DESIGN.md round 5)
run_bench BENCH_FFT_COARSE_r05 NUFHE_BENCH_TRANSFORM=fft \
    NUFHE_TPU_COARSE_PHASE_BITS=1

# tensor-parallel compile+run proof on real hardware (1-device mesh);
# limbs mode rides the rows engine since round 5
echo "=== TP_r05 ($(date +%H:%M:%S)) ==="
python tools/run_tp.py 1024 2>&1 | grep -v WARNING

echo "=== done ($(date +%H:%M:%S)) ==="
