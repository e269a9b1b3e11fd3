"""nufhe_tpu: a TPU-native TFHE gate-bootstrapping library.

From-scratch JAX/Pallas implementation of the capability surface of
``nucypher/nufhe``: batched homomorphic boolean gates over encrypted bits
via TFHE gate bootstrapping, with an exact Z/2^32 Nussbaumer transform
engine replacing the reference's Goldilocks NTT / complex FFT (see
DESIGN.md), sharded over TPU meshes for multi-chip scaling.

The export surface mirrors the reference's ``nufhe/__init__.py:18-59``.
"""

__version__ = "0.1.0"

from .api import (
    Context,
    VirtualMachine,
    DeviceID,
    find_devices,
    empty_ciphertext,
    encrypt,
    decrypt,
)
from .keys import (
    NuFHESecretKey,
    NuFHECloudKey,
    make_key_pair,
)
from .params import NuFHEParameters
from .ciphertext import LweSampleArray, concatenate
from .performance import PerformanceParameters
from .rng import DeterministicRNG, SecureRNG
from .models.gates import (
    gate_nand,
    gate_or,
    gate_and,
    gate_xor,
    gate_xnor,
    gate_not,
    gate_copy,
    gate_constant,
    gate_nor,
    gate_andny,
    gate_andyn,
    gate_orny,
    gate_oryn,
    gate_mux,
)
from .models.integer import (
    uint_min,
    uintarray_to_bitarray,
    bitarray_to_uintarray,
)


def clear_computation_cache(*args, **kwds):
    """Drop cached compiled programs.

    API-parity shim for the reference's computation cache
    (``nufhe/computation_cache.py``); here compilation caching is jit's job.
    """
    import jax
    jax.clear_caches()
