#!/bin/bash
# Round-4 benchmark artifact marathon (run on the real chip).
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

# headline: rounded-key ('FFT' accuracy class) NAND at batch 2^14
run_bench BENCH_FFT_r04 NUFHE_BENCH_TRANSFORM=fft

# exact engine NAND (vs the reference's 0.35 ms/bit NTT number)
run_bench BENCH_r04 NUFHE_BENCH_TRANSFORM=ntt

# MUX, both engines (reference: NTT 0.67, FFT 0.22 ms/bit)
run_bench BENCH_MUX_r04 NUFHE_BENCH_GATE=mux NUFHE_BENCH_TRANSFORM=ntt
run_bench BENCH_FFT_MUX_r04 NUFHE_BENCH_GATE=mux NUFHE_BENCH_TRANSFORM=fft

# batch 2^16 (saturation point)
run_bench BENCH_FFT_B65536_r04 NUFHE_BENCH_TRANSFORM=fft NUFHE_BENCH_BATCH=65536

# labeled perf-knob variant: coarse modulus switch level 1
# (PerformanceParameters(coarse_phase_bits=1): rotation amounts rounded to
# even, one barrel round skipped; extra phase noise tracked in cv)
run_bench BENCH_FFT_COARSE_r04 NUFHE_BENCH_TRANSFORM=fft \
    NUFHE_TPU_COARSE_PHASE_BITS=1

# tensor-parallel compile+run proof on real hardware (1-device mesh)
echo "=== TP_r04 ($(date +%H:%M:%S)) ==="
python tools/run_tp_r04.py 1024 2>&1 | grep -v WARNING

# ripple vs Kogge-Stone crossover grid
echo "=== adder crossover ($(date +%H:%M:%S)) ==="
python tools/adder_crossover.py 128,1024,4096 8,16 2>&1 | grep -v WARNING

echo "=== done ($(date +%H:%M:%S)) ==="
