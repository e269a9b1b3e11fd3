"""Multi-device gate evaluation via jax.sharding (the TPU-native replacement
for the reference's manual slice/serialize multi-GPU loop,
examples/multi_gpu.py).

Run on CPU with a virtual mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multi_device.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the TPU-tunnel sitecustomize can force its platform over the env var;
# jax.config wins, so re-assert an explicit JAX_PLATFORMS choice
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import nufhe_tpu as nf
from nufhe_tpu.parallel import mesh as pmesh

n_dev = len(jax.devices())
print("devices:", jax.devices())

rng = nf.DeterministicRNG(0)
secret_key, cloud_key = nf.make_key_pair(rng, lwe_size=32)
vm = nf.VirtualMachine(cloud_key)

size = n_dev * 8
bits1 = np.random.binomial(1, 0.5, size=size).astype(bool)
bits2 = np.random.binomial(1, 0.5, size=size).astype(bool)

c1 = nf.encrypt(rng, secret_key, bits1)
c2 = nf.encrypt(rng, secret_key, bits2)

# shard the ciphertext batch over all devices; keys replicate automatically
mesh = pmesh.make_mesh(n_data=n_dev, n_model=1)
pmesh.shard_ciphertext(c1, mesh)
pmesh.shard_ciphertext(c2, mesh)

result = vm.gate_nand(c1, c2)
answer = nf.decrypt(secret_key, result)
assert np.array_equal(answer, ~(bits1 & bits2))
print("multi-device NAND over", size, "bits on", n_dev, "devices: OK")
