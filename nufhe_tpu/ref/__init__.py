"""Numpy reference layer: exact oracles for every device kernel.

Mirrors the role of the reference's ``*_cpu.py`` modules (SURVEY.md section 4):
a bit-exact, device-free implementation of every operation, used for keygen
(host path) and for exact-equality testing of the JAX/Pallas device ops.
"""

from . import (
    transform_ref,
    ntt_goldilocks,
    fft_ref,
    lwe_ref,
    tlwe_ref,
    tgsw_ref,
    polynomials_ref,
    bootstrap_ref,
)
