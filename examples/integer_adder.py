"""Encrypted 8-bit arithmetic: ripple vs Kogge-Stone adders.

Each encrypted integer is a big-endian array of encrypted bits; every
gate call batches all integers (and, in the parallel circuits, all bit
positions) into one bootstrap.  The ripple adder minimizes total
bootstrapped bits (best throughput once the batch saturates the chip);
the Kogge-Stone adder (``parallel=True``) runs O(log2 w) dependent gate
calls instead of O(w) — the latency-optimal shape on TPU.

Run on any backend:
    JAX_PLATFORMS=cpu python examples/integer_adder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the TPU-tunnel sitecustomize can force its platform over the env var;
# jax.config wins, so re-assert an explicit JAX_PLATFORMS choice
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import nufhe_tpu as nf
from nufhe_tpu.models.integer import (
    uint_add, uintarray_to_bitarray, bitarray_to_uintarray)


def main():
    rng = nf.DeterministicRNG(42)
    # Reduced lwe_size keeps this demo quick on CPU; drop the argument
    # for the full 128-bit-secure parameters.
    secret_key, cloud_key = nf.make_key_pair(rng, lwe_size=64)

    a_vals = np.array([17, 250, 200], np.uint8)
    b_vals = np.array([25, 10, 100], np.uint8)

    ca = nf.encrypt(rng, secret_key, uintarray_to_bitarray(a_vals))
    cb = nf.encrypt(rng, secret_key, uintarray_to_bitarray(b_vals))
    answer = nf.empty_ciphertext(cloud_key.params, ca.shape)

    for parallel in (False, True):
        t0 = time.perf_counter()
        uint_add(cloud_key, answer, ca, cb, parallel=parallel)
        got = bitarray_to_uintarray(nf.decrypt(secret_key, answer))
        dt = time.perf_counter() - t0
        name = "kogge-stone" if parallel else "ripple"
        print("%-11s %s + %s = %s  (%.2f s incl. first-call compiles)"
              % (name, a_vals, b_vals, got, dt))
        assert np.array_equal(got, a_vals + b_vals), (got, a_vals + b_vals)
    print("ok")


if __name__ == "__main__":
    main()
