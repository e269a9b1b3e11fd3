"""Client/cloud workflow: all key and ciphertext objects are serializable
with a pickle-free versioned container (reference analogue:
examples/serialization.py)."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import nufhe_tpu as nf

# --- client side ---
ctx = nf.Context(rng=nf.SecureRNG())
secret_key, cloud_key = ctx.make_key_pair()

bits1 = np.random.binomial(1, 0.5, size=16).astype(bool)
bits2 = np.random.binomial(1, 0.5, size=16).astype(bool)

cloud_key_bytes = cloud_key.dumps()
ciphertext1_bytes = ctx.encrypt(secret_key, bits1).dumps()
ciphertext2_bytes = ctx.encrypt(secret_key, bits2).dumps()

# --- cloud side (no secret key) ---
cloud_key2 = nf.NuFHECloudKey.loads(cloud_key_bytes)
vm = nf.VirtualMachine(cloud_key2)
result = vm.gate_xor(
    nf.LweSampleArray.loads(ciphertext1_bytes),
    nf.LweSampleArray.loads(ciphertext2_bytes))
result_bytes = result.dumps()

# --- client side ---
answer = ctx.decrypt(secret_key, nf.LweSampleArray.loads(result_bytes))
assert np.array_equal(answer, bits1 ^ bits2)
print("serialized XOR roundtrip: OK")
