"""Minimal example: encrypt two bit arrays, NAND them homomorphically,
decrypt (reference analogue: examples/gate_nand.py)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import nufhe_tpu as nf

size = 32

rng = nf.DeterministicRNG()
ctx = nf.Context(rng=rng)
secret_key, cloud_key = ctx.make_key_pair()
vm = ctx.make_virtual_machine(cloud_key)

bits1 = np.random.binomial(1, 0.5, size=size).astype(bool)
bits2 = np.random.binomial(1, 0.5, size=size).astype(bool)
reference = ~(bits1 & bits2)

ciphertext1 = ctx.encrypt(secret_key, bits1)
ciphertext2 = ctx.encrypt(secret_key, bits2)

result = vm.gate_nand(ciphertext1, ciphertext2)
answer_bits = ctx.decrypt(secret_key, result)

assert np.array_equal(answer_bits, reference)
print("NAND of", size, "encrypted bits: OK")
