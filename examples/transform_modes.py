"""Accuracy/speed modes: transform_type='NTT' (exact external products)
vs 'FFT' (rounded-key engine — smaller/faster key, the accuracy class of
the reference's float64 FFT backend).

Both decrypt correctly; the FFT mode's extra key-quantization noise is
tracked in the ciphertext variance (cv), shown here via the per-gate
noise estimate.  (Reference analogue: nuFHE benchmarks its NTT and FFT
backends separately — 0.35 vs 0.13 ms/bit NAND on its GPU.)
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import nufhe_tpu as nf

size = 16
bits1 = np.random.binomial(1, 0.5, size=size).astype(bool)
bits2 = np.random.binomial(1, 0.5, size=size).astype(bool)

for mode in ("NTT", "FFT"):
    rng = nf.DeterministicRNG(7)
    ctx = nf.Context(rng=rng)
    secret_key, cloud_key = ctx.make_key_pair(transform_type=mode)
    vm = ctx.make_virtual_machine(cloud_key)

    r = vm.gate_xor(ctx.encrypt(secret_key, bits1),
                    ctx.encrypt(secret_key, bits2))
    assert np.array_equal(ctx.decrypt(secret_key, r), bits1 ^ bits2)

    limbs = cloud_key.bootstrap_key.limbs()
    print("%s mode: XOR of %d bits OK; key limbs per slot %d, "
          "per-gate noise std estimate %.2e (torus)"
          % (mode, size, limbs.shape[-2],
             float(np.sqrt(np.asarray(r.current_variances).max()))))
