"""High- and low-level user API.

Mirrors the reference surface (``nufhe/api_low_level.py``,
``nufhe/api_high_level.py``): ``Context`` binds a device and an RNG;
``VirtualMachine`` binds a cloud key and executes ``gate_*`` calls.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .numeric import bool_to_t32, t32_to_bool, Torus32
from .params import NuFHEParameters
from .keys import NuFHESecretKey, NuFHECloudKey, make_key_pair
from .ciphertext import LweSampleArray
from .rng import (
    DeterministicRNG, SecureRNG, rand_gaussian_torus32, rand_uniform_torus32)
from .performance import PerformanceParameters
from .ops import lwe as dlwe
from .models import gates
from .models.gates import get_shape, result_shape


def empty_ciphertext(params: NuFHEParameters, shape):
    """An uninitialized ciphertext of the given message shape.
    Reference: ``nufhe/api_low_level.py:298-302``."""
    return LweSampleArray.empty(params.in_out_params, shape)


def encrypt(rng, key: NuFHESecretKey, message):
    """Encrypt an array of bits.  Reference: ``nufhe/api_low_level.py:266-281``.

    RNG order matches the reference (``nufhe/lwe.py:325-333``): gaussian
    b-noise first, then uniform mask rows.
    """
    message = np.asarray(message)
    params = key.params
    lwe_size = params.in_out_params.size
    noise = params.in_out_params.min_noise

    mus = bool_to_t32(message)
    noises_b = rand_gaussian_torus32(rng, 0, noise, message.shape)
    noises_a = rand_uniform_torus32(rng, message.shape + (lwe_size,))

    a, b, cv = dlwe.lwe_encrypt(
        jnp.asarray(mus, jnp.int32), jnp.asarray(key.lwe_key.key, jnp.int32),
        jnp.asarray(noises_a, jnp.int32), jnp.asarray(noises_b, jnp.int32),
        noise)
    return LweSampleArray(params.in_out_params, a, b, cv)


def decrypt(key: NuFHESecretKey, ciphertext: LweSampleArray):
    """Decrypt to a boolean numpy array.
    Reference: ``nufhe/api_low_level.py:284-295``."""
    phase = dlwe.lwe_decrypt_phase(
        ciphertext.a, ciphertext.b, jnp.asarray(key.lwe_key.key, jnp.int32))
    return t32_to_bool(np.asarray(phase))


class DeviceID:
    """Picklable identifier of a JAX device.
    Reference analogue: ``nufhe/api_high_level.py:85-127``."""

    def __init__(self, platform: str, device_id: int, device_kind: str = ""):
        self.platform = platform
        self.device_id = device_id
        self.device_kind = device_kind

    @classmethod
    def from_device(cls, device):
        return cls(device.platform, device.id, device.device_kind)

    def get_device(self):
        for d in jax.devices(self.platform):
            if d.id == self.device_id:
                return d
        raise ValueError("Device not found: " + str(self))

    @property
    def api_name(self):
        return self.platform.upper()

    @property
    def device_name(self):
        return self.device_kind or "{}:{}".format(self.platform, self.device_id)

    def __str__(self):
        return "DeviceID({}, {}, {})".format(
            self.platform, self.device_id, self.device_kind)


def find_devices(api=None, include_devices=None, exclude_devices=None,
                 include_platforms=None, exclude_platforms=None):
    """List computation devices.  Reference: ``nufhe/api_high_level.py:45-82``.

    :param api: JAX platform name filter (e.g. ``'tpu'``, ``'cpu'``) or None.
    """
    devices = jax.devices(api.lower()) if api else jax.devices()

    def _match(name, masks):
        return masks is None or any(m.lower() in name.lower() for m in masks)

    out = []
    for d in devices:
        name = d.device_kind
        if not _match(name, include_devices):
            continue
        if exclude_devices and _match(name, exclude_devices):
            continue
        if not _match(d.platform, include_platforms):
            continue
        if exclude_platforms and _match(d.platform, exclude_platforms):
            continue
        out.append(DeviceID.from_device(d))
    if not out:
        raise ValueError("No devices found satisfying the given criteria")
    return out


class Context:
    """An execution environment: a device plus an RNG.
    Reference: ``nufhe/api_high_level.py:130-299``."""

    def __init__(self, rng=None, device_id: DeviceID = None, api=None,
                 interactive=False, **filters):
        if rng is None:
            rng = DeterministicRNG()
        if device_id is None:
            candidates = find_devices(api=api, **{
                k: v for k, v in filters.items() if v is not None})
            if interactive and len(candidates) > 1:
                device_id = self._ask_device(candidates)
            else:
                device_id = candidates[0]
        self.rng = rng
        self.device_id = device_id
        self.device = device_id.get_device()

    @staticmethod
    def _ask_device(candidates):
        """Prompt on stdin for one of several matching devices.
        Reference: ``nufhe/api_high_level.py:130-181``."""
        print("Available devices:")
        for i, dev in enumerate(candidates):
            print("  [{}] {} ({})".format(i, dev.device_name, dev.api_name))
        while True:
            choice = input(
                "Choose device [0-{}]: ".format(len(candidates) - 1)).strip()
            try:
                idx = int(choice)
            except ValueError:
                continue
            if 0 <= idx < len(candidates):
                return candidates[idx]

    def make_secret_key(self, **params):
        nufhe_params = NuFHEParameters(**params)
        return NuFHESecretKey.from_rng(nufhe_params, self.rng)

    def make_cloud_key(self, secret_key: NuFHESecretKey):
        return NuFHECloudKey.from_rng(
            secret_key.params, self.rng, secret_key)

    def make_key_pair(self, **params):
        secret_key = self.make_secret_key(**params)
        cloud_key = self.make_cloud_key(secret_key)
        return secret_key, cloud_key

    def encrypt(self, secret_key: NuFHESecretKey, message):
        return encrypt(self.rng, secret_key, message)

    def decrypt(self, secret_key: NuFHESecretKey, ciphertext: LweSampleArray):
        return decrypt(secret_key, ciphertext)

    def make_virtual_machine(self, cloud_key: NuFHECloudKey,
                             perf_params: PerformanceParameters = None):
        return VirtualMachine(cloud_key, perf_params=perf_params,
                              device=self.device)

    def load_ciphertext(self, file_or_bytestring):
        if isinstance(file_or_bytestring, bytes):
            return LweSampleArray.loads(file_or_bytestring)
        return LweSampleArray.load(file_or_bytestring)

    def load_secret_key(self, file_or_bytestring):
        if isinstance(file_or_bytestring, bytes):
            return NuFHESecretKey.loads(file_or_bytestring)
        return NuFHESecretKey.load(file_or_bytestring)

    def load_cloud_key(self, file_or_bytestring):
        if isinstance(file_or_bytestring, bytes):
            return NuFHECloudKey.loads(file_or_bytestring)
        return NuFHECloudKey.load(file_or_bytestring)


class VirtualMachine:
    """Executes gates on ciphertexts with an encapsulated cloud key.

    ``vm.gate_<op>(*args, dest=None)`` mirrors the reference
    (``nufhe/api_high_level.py:302-363``); ``vm.uint_<op>(a, b,
    dest=None, parallel=False)`` extends the same dispatch to the
    encrypted-integer circuits (``models/integer.py``), allocating the
    result shape automatically (comparisons yield one bit per integer).
    """

    def __init__(self, cloud_key: NuFHECloudKey,
                 perf_params: PerformanceParameters = None, device=None):
        if perf_params is None:
            perf_params = PerformanceParameters(cloud_key.params)
        self.params = cloud_key.params
        self.cloud_key = cloud_key
        self.perf_params = perf_params.for_device(device)

    def empty_ciphertext(self, shape):
        return empty_ciphertext(self.params, shape)

    def load_ciphertext(self, file):
        return LweSampleArray.load(file)

    def _gate(self, name, *args, dest: LweSampleArray = None):
        if dest is None:
            shapes = [get_shape(arg) for arg in args]
            dest = self.empty_ciphertext(result_shape(*shapes))
        gate_func = getattr(gates, name)
        gate_func(self.cloud_key, dest, *args, perf_params=self.perf_params)
        return dest

    # these produce one encrypted bit per integer, not a full bit array
    _UINT_BIT_RESULT = frozenset(
        ('uint_gt', 'uint_lt', 'uint_eq', 'int_gt', 'int_lt', 'int_eq'))

    def _uint(self, name, *args, dest: LweSampleArray = None, **kwds):
        from .models import integer
        shape = result_shape(*[get_shape(x) for x in args])
        # the integer circuits size their temporaries from the operand
        # shapes, so broadcasting must happen here, not inside a gate
        args = tuple(x if get_shape(x) == shape else x.broadcast_to(shape)
                     for x in args)
        if name == 'uint_divmod':  # two results: (quotient, remainder)
            q, r = (dest if dest is not None
                    else (self.empty_ciphertext(shape),
                          self.empty_ciphertext(shape)))
            return integer.uint_divmod(
                self.cloud_key, q, r, *args,
                perf_params=self.perf_params, **kwds)
        if dest is None:
            dest = self.empty_ciphertext(
                shape[:-1] + (1,) if name in self._UINT_BIT_RESULT
                else shape)
        func = getattr(integer, name)
        func(self.cloud_key, dest, *args, perf_params=self.perf_params,
             **kwds)
        return dest

    def __getattr__(self, name):
        if name.startswith('gate_'):
            return lambda *args, **kwds: self._gate(name, *args, **kwds)
        if name.startswith(('uint_', 'int_')):
            return lambda *args, **kwds: self._uint(name, *args, **kwds)
        raise AttributeError(name)
