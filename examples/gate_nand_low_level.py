"""Low-level API example: no Context/VirtualMachine — key pair, explicit
ciphertext allocation, direct gate call (reference analogue:
examples/gate_nand_low_level.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import nufhe_tpu as nf

size = 32

rng = nf.DeterministicRNG()
secret_key, cloud_key = nf.make_key_pair(rng)

bits1 = np.random.binomial(1, 0.5, size=size).astype(bool)
bits2 = np.random.binomial(1, 0.5, size=size).astype(bool)
reference = ~(bits1 & bits2)

ciphertext1 = nf.encrypt(rng, secret_key, bits1)
ciphertext2 = nf.encrypt(rng, secret_key, bits2)

result = nf.empty_ciphertext(cloud_key.params, ciphertext1.shape)
nf.gate_nand(cloud_key, result, ciphertext1, ciphertext2)

answer_bits = nf.decrypt(secret_key, result)
assert np.array_equal(answer_bits, reference)
print("NAND of", size, "encrypted bits (low-level API): OK")
