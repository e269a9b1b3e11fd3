"""Random number generation.

All randomness is generated on the host (mirroring the reference's design
rationale, ``nufhe/random_numbers.py:18-27``): RNG cost is negligible next to
bootstrapping, and host generation keeps key material bit-reproducible and
device-agnostic.  Results are numpy arrays; callers move them to device.

The call signatures, distributions and *call order* match the reference
(``nufhe/random_numbers.py``) so that a given ``DeterministicRNG`` seed
produces the same key material layout.
"""

import random
from os import urandom

import numpy as np

from .numeric import Torus32, Int32, double_to_t32

_FLOAT = np.dtype("float64")
_MANTISSA_INT = np.dtype("uint64")
_BPF = np.finfo(_FLOAT).nmant + 1
_RECIP_BPF = 2.0 ** (-_BPF)


class DeterministicRNG:
    """Fast, seedable, not cryptographically secure RNG (for testing).

    Reference: ``nufhe/random_numbers.py:46-62``.
    """

    def __init__(self, seed=None):
        self.rng = np.random.RandomState(seed)

    def uniform_bool(self, shape):
        return self.rng.randint(0, 2, size=shape, dtype=Int32)

    def uniform_torus32(self, shape):
        return self.rng.randint(-(2**31), 2**31, size=shape, dtype=Torus32)

    def gauss(self, shape, std_dev):
        return self.rng.normal(size=shape, scale=std_dev)


class SecureRNG:
    """Cryptographically secure RNG backed by the OS entropy source.

    Reference: ``nufhe/random_numbers.py:65-130`` (os.urandom bits,
    Box-Muller transform over open-interval uniform floats).
    """

    def __init__(self):
        self.rng = random.SystemRandom()

    def uniform_bool(self, shape):
        length = int(np.prod(shape, dtype=np.int64))
        nbytes = (length + 7) // 8
        random_bytes = np.frombuffer(urandom(nbytes), np.uint8)
        random_bits = np.unpackbits(random_bytes)[:length]
        return random_bits.reshape(shape).astype(Int32)

    def uniform_torus32(self, shape):
        length = int(np.prod(shape, dtype=np.int64))
        nbytes = length * np.dtype(Int32).itemsize
        return np.frombuffer(urandom(nbytes), Int32).reshape(shape).copy()

    def _uniform_float(self, length):
        # Uniform floats in the open interval (0, 1): draw bpf-1 mantissa
        # bits, map k -> (2k+1) * 2^-bpf.
        nbytes = length * _MANTISSA_INT.itemsize
        mantissa_bits = np.frombuffer(urandom(nbytes), _MANTISSA_INT)
        mantissa_bits = mantissa_bits >> np.uint64(_MANTISSA_INT.itemsize * 8 - (_BPF - 1))
        mantissa_bits = mantissa_bits * np.uint64(2) + np.uint64(1)
        return mantissa_bits * _RECIP_BPF

    def gauss(self, shape, std_dev):
        orig_length = int(np.prod(shape, dtype=np.int64))
        length = orig_length + orig_length % 2

        u1 = self._uniform_float(length // 2)
        u2 = self._uniform_float(length // 2)

        r = (-2 * np.log(u1)) ** 0.5
        theta = 2 * np.pi * u2

        z0 = r * np.cos(theta)
        z1 = r * np.sin(theta)

        result = np.concatenate([z0, z1])[:orig_length]
        return result.reshape(shape) * std_dev


def rand_uniform_bool(rng, shape):
    return rng.uniform_bool(shape)


def rand_uniform_torus32(rng, shape):
    return rng.uniform_torus32(shape)


def rand_gaussian_torus32(rng, message, sigma: float, shape, centered=False):
    """Gaussian torus samples centered on ``message`` with stdev ``sigma``.

    Reference: ``nufhe/random_numbers.py:134-139`` (including the
    mean-subtraction option used for keyswitch key noise).
    """
    rfloats = rng.gauss(shape, sigma)
    if centered:
        rfloats = rfloats - rfloats.mean()
    return (Torus32(message) + double_to_t32(rfloats)).astype(Torus32)
