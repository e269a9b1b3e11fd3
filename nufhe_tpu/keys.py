"""Key objects and key generation.

Key material is generated on the host through the exact reference layer
(mirroring the reference's host-side RNG design and its generation order,
so a seeded ``DeterministicRNG`` yields reproducible keys), then prepared
into device-resident forms:

- the bootstrap key: coefficient-domain TGSW samples (serialized form)
  -> transformed mod 2^38, limb-split, negacyclic-expanded int8 tensor
  that lives in HBM for the MXU MAC;
- the keyswitch key: LWE table -> 8-bit-limb int8 matrices.

Reference: ``nufhe/lwe.py`` (LweKey, LweKeyswitchKey), ``nufhe/tlwe.py``,
``nufhe/tgsw.py``, ``nufhe/bootstrap.py:44-92``, ``nufhe/api_low_level.py``.
"""

import io

import numpy as np

from .numeric import Torus32, ErrorFloat
from .params import (
    LweParams, TLweParams, TGswParams, NuFHEParameters)
from .rng import (
    rand_uniform_bool, rand_uniform_torus32, rand_gaussian_torus32)
from .ref import tlwe_ref, tgsw_ref, lwe_ref
from . import serialization


def _is_device_array(x):
    """True for jax arrays (device-resident keygen outputs)."""
    if x is None or isinstance(x, np.ndarray):
        return False
    import jax
    return isinstance(x, jax.Array)


def _keygen_on_device():
    """Default keygen placement: on device whenever an accelerator backend
    is active (the reference generates both cloud-key halves on the GPU,
    ``nufhe/tlwe_gpu.py:111-196``, ``nufhe/lwe_gpu.py:63-124``); the host
    numpy path remains the oracle and the CPU-backend default."""
    import jax
    return jax.default_backend() not in ('cpu',)


class LweKey:
    """Binary LWE secret key.  Reference: ``nufhe/lwe.py:71-106``."""

    def __init__(self, params: LweParams, key):
        self.params = params
        self.key = np.asarray(key, Torus32)

    @classmethod
    def from_rng(cls, params: LweParams, rng):
        return cls(params, rand_uniform_bool(rng, (params.size,)))

    @classmethod
    def from_tlwe_key(cls, params: LweParams, tlwe_key: 'TLweKey'):
        poly_degree = tlwe_key.params.polynomial_degree
        mask_size = tlwe_key.params.mask_size
        assert params.size == poly_degree * mask_size
        return cls(params, tlwe_key.key.ravel())

    def dump(self, file_obj):
        serialization.dump(
            file_obj,
            {"kind": "LweKey",
             "params": [self.params.size, self.params.min_noise,
                        self.params.max_noise]},
            {"key": self.key})

    @classmethod
    def load(cls, file_obj):
        meta, arrays = serialization.load(file_obj)
        size, min_noise, max_noise = meta["params"]
        return cls(LweParams(int(size), float(min_noise), float(max_noise)),
                   arrays["key"])

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.params == other.params
                and np.array_equal(self.key, other.key))


class TLweKey:
    """mask_size binary polynomials.  Reference: ``nufhe/tlwe.py:77-91``."""

    def __init__(self, params: TLweParams, key):
        self.params = params
        self.key = np.asarray(key, np.int32)  # (mask_size, N)

    @classmethod
    def from_rng(cls, params: TLweParams, rng):
        key = rand_uniform_bool(
            rng, (params.mask_size, params.polynomial_degree))
        return cls(params, key)


class TGswKey:
    """Reference: ``nufhe/tgsw.py:70-78``."""

    def __init__(self, params: TGswParams, tlwe_key: TLweKey):
        self.params = params
        self.tlwe_key = tlwe_key

    @classmethod
    def from_rng(cls, params: TGswParams, rng):
        return cls(params, TLweKey.from_rng(params.tlwe_params, rng))


class BootstrapKey:
    """n TGSW encryptions of the LWE key bits.

    Carries the coefficient-domain samples (``bk_coeff``:
    (n, mask_size+1, decomp_length, mask_size+1, N) int32, present after
    keygen) and/or the compact TRANSFORMED form (``limbs``: two-sided
    mod-2^38 radix-2^8 limb splits of the key transforms, int8
    (n, G, O, L, R, KEY_LIMBS, 2)).  Serialization stores the transformed
    form — the analogue of the reference storing
    ``TransformedTGswSampleArray`` (``nufhe/tgsw.py:99-130``,
    ``bootstrap.py:78-86``) — and only its +v SIDE (format 4; the -v side is derived on device,
    ``transform.two_sided_limbs_device``), so a loaded cloud key is
    device-ready: load-time work is a ~41 MB (exact) / ~33 MB (rounded)
    upload plus the on-device derivation + negacyclic expansion.  The full (n, L, C, Q) MAC operand is derived lazily and
    cached in HBM.  Reference: ``nufhe/bootstrap.py:44-92``.
    """

    def __init__(self, in_out_params: LweParams, bk_params: TGswParams,
                 bk_coeff, cv, limbs=None, compact=None):
        self.in_out_params = in_out_params
        self.bk_params = bk_params
        self.accum_params = bk_params.tlwe_params
        self.extract_params = self.accum_params.extracted_lweparams
        self.bk_coeff = bk_coeff
        self.cv = cv
        self._limbs = limbs
        self._compact = compact      # (pos_limbs, delta) one-sided form
        self._device = None

    @classmethod
    def from_rng(cls, rng, lwe_key: LweKey, tgsw_key: TGswKey,
                 on_device=None):
        bk_params = tgsw_key.params
        tlwe_params = bk_params.tlwe_params
        mask_size = tlwe_params.mask_size
        poly_n = tlwe_params.polynomial_degree
        decomp = bk_params.decomp_length
        noise = tlwe_params.min_noise
        n = lwe_key.params.size

        # TGSW encrypt-zero for all (n, mask_size+1, decomp_length) rows;
        # RNG stays on host in both placements (the reference's design,
        # ``nufhe/random_numbers.py:18-27``) with the reference call order
        # (``nufhe/tlwe.py:185-196``): uniform mask noise first, then
        # gaussian body noise — so host and device keygen yield IDENTICAL
        # keys for a seeded DeterministicRNG.
        shape = (n, mask_size + 1, decomp)
        noises1 = rand_uniform_torus32(rng, shape + (mask_size, poly_n))
        noises2 = rand_gaussian_torus32(rng, 0, noise, shape + (poly_n,))
        if on_device is None:
            on_device = _keygen_on_device()
        if on_device:
            # device keygen: binary-key negacyclic products as one int8
            # MXU matmul (exact), gadget add on device; the coefficient
            # samples stay device-resident for the device-side transform
            import jax.numpy as jnp
            from .ops import keygen as dkeygen
            w = jnp.asarray(
                dkeygen.negacyclic_key_matrix(tgsw_key.tlwe_key.key))
            a = dkeygen.bootstrap_key_device(
                w, jnp.asarray(lwe_key.key), jnp.asarray(noises1),
                jnp.asarray(noises2), bk_params.base_powers)
            cv = np.full(shape, noise**2, ErrorFloat)
            return cls(lwe_key.params, bk_params, a, cv)
        a, cv = tlwe_ref.tlwe_encrypt_zero(
            tgsw_key.tlwe_key.key, noises1, noises2, noise)
        # message * gadget onto the diagonal (``nufhe/tgsw.py:142-161``)
        a = tgsw_ref.tgsw_add_message(a, lwe_key.key, bk_params)

        return cls(lwe_key.params, bk_params, a.astype(Torus32), cv)

    def limbs(self):
        """Compact transformed two-sided limb form (the serialized form).

        ``transform_type='NTT'`` params produce the exact 5-limb A/B split;
        ``'FFT'`` params the rounded-key 4-limb split (a tracked
        speed/noise trade — see ``transform.key_limbs_host``).
        A container holding the other format still loads and runs (the
        limb count selects the engine mode), it just keeps the accuracy
        it was written with.
        """
        if self._limbs is None:
            if self._compact is None and _is_device_array(self.bk_coeff):
                self.compact()       # device transform -> compact form first
            if self._compact is not None:
                # format-4 container: rebuild the canonical two-sided form
                # on host (lossless; see transform.one_sided_limbs_host)
                from .ops import transform as dtransform
                pos, delta = self._compact
                self._limbs = dtransform.two_sided_limbs_host(
                    np.asarray(pos),
                    None if delta is None else np.asarray(delta))
            else:
                from .ops import tgsw as dtgsw
                exact = self.accum_params.transform_type != 'FFT'
                self._limbs = dtgsw.bootstrap_key_limbs_host(
                    self.bk_coeff, exact=exact)
        return self._limbs

    def compact(self):
        """One-sided compact form (pos_limbs, delta) — the serialized and
        uploaded payload; the -v side is derived on device at expansion
        (half the container / H2D bytes of the two-sided form).  Device
        keygen keeps this form device-resident (the transform+split runs
        on device too, ``ops.keygen.bootstrap_key_limbs_device``)."""
        if self._compact is None:
            if self._limbs is None and _is_device_array(self.bk_coeff):
                from .ops import keygen as dkeygen
                exact = self.accum_params.transform_type != 'FFT'
                self._compact = dkeygen.bootstrap_key_limbs_device(
                    self.bk_coeff, exact=exact)
            else:
                from .ops import transform as dtransform
                self._compact = dtransform.one_sided_limbs_host(self.limbs())
        return self._compact

    def device(self):
        """The HBM-resident transformed/limb/expanded key for the MXU MAC."""
        if self._device is None:
            from . import _maybe_enable_persistent_compilation_cache
            from .ops import tgsw as dtgsw
            _maybe_enable_persistent_compilation_cache()
            self._device = dtgsw.expand_bootstrap_key_device_compact(
                *self.compact())
        return self._device

    def dump(self, file_obj):
        pos, delta = self.compact()
        arrays = {"limbs_pos": np.asarray(pos), "cv": np.asarray(self.cv)}
        if delta is not None:
            arrays["delta_bits"] = np.packbits(np.asarray(delta).reshape(-1))
        serialization.dump(
            file_obj, {"kind": "BootstrapKey", "format": 4}, arrays)

    @classmethod
    def load(cls, file_obj, in_out_params, bk_params):
        meta, arrays = serialization.load(file_obj)
        assert meta["kind"] == "BootstrapKey"
        if "limbs_pos" in arrays:    # format 4: one-sided compact form
            pos = arrays["limbs_pos"]
            delta = None
            if "delta_bits" in arrays:
                delta = np.unpackbits(
                    arrays["delta_bits"],
                    count=int(np.prod(pos.shape[:-1]))).reshape(
                        pos.shape[:-1])
            return cls(in_out_params, bk_params, None, arrays["cv"],
                       compact=(pos, delta))
        if "limbs" in arrays:        # format 2/3: device-ready transformed key
            limbs = arrays["limbs"]
            if meta.get("format", 2) < 3:
                # format 2 stored plain balanced radix-2^8 limbs; the
                # current engine consumes the A/B split (lossless re-split)
                from .ops import transform as dtransform
                limbs = dtransform.relimb_from_radix8(limbs)
            return cls(in_out_params, bk_params, None, arrays["cv"],
                       limbs=limbs)
        # format 1 (round-1 files): coefficient domain
        return cls(in_out_params, bk_params, arrays["bk_coeff"], arrays["cv"])

    def __eq__(self, other):
        # the transformed limb form is the canonical operational content
        return (self.__class__ == other.__class__
                and self.in_out_params == other.in_out_params
                and self.bk_params == other.bk_params
                and np.array_equal(self.limbs(), other.limbs()))


class LweKeyswitchKey:
    """Keyswitch key: (input_size, decomp_length, base) LWE samples.

    Reference: ``nufhe/lwe.py:254-308``.
    """

    def __init__(self, ks_a, ks_b, ks_cv, log2_base: int):
        self.ks_a = ks_a
        self.ks_b = ks_b
        self.ks_cv = ks_cv
        self.input_size = ks_a.shape[0]
        self.decomp_length = ks_a.shape[1]
        self.output_size = ks_a.shape[-1]
        self.log2_base = log2_base
        self._device = None

    @classmethod
    def from_tgsw_key(cls, rng, ks_decomp_length: int, ks_log2_base: int,
                      lwe_key: LweKey, tgsw_key: TGswKey, on_device=None):
        extract_params = tgsw_key.params.tlwe_params.extracted_lweparams
        in_key = LweKey.from_tlwe_key(extract_params, tgsw_key.tlwe_key)
        out_key = lwe_key

        input_size = in_key.params.size
        output_size = out_key.params.size
        noise = out_key.params.min_noise
        base = 2**ks_log2_base

        # RNG order matches the reference (``nufhe/lwe.py:285-288``):
        # centered gaussian b-noise first, then uniform a-noise.
        noises_b = rand_gaussian_torus32(
            rng, 0, noise, (input_size, ks_decomp_length, base - 1),
            centered=True)
        noises_a = rand_uniform_torus32(
            rng, (input_size, ks_decomp_length, base - 1, output_size))

        if on_device is None:
            on_device = _keygen_on_device()
        if on_device:
            # device build (reference kernel: nufhe/lwe_gpu.py:63-124);
            # identical keys — same host noise draws, exact i32 body sum
            from .ops import keygen as dkeygen
            ks_a, ks_b = dkeygen.make_keyswitch_key_device(
                in_key.key, out_key.key, noises_a, noises_b,
                ks_decomp_length, ks_log2_base)
            ks_cv = np.zeros((input_size, ks_decomp_length, base),
                             ErrorFloat)
            ks_cv[:, :, 1:] = noise**2
            return cls(ks_a, ks_b, ks_cv, ks_log2_base)

        ks_a, ks_b, ks_cv = lwe_ref.make_keyswitch_key(
            in_key.key, out_key.key, noises_a, noises_b,
            ks_decomp_length, ks_log2_base, noise)
        return cls(ks_a, ks_b, ks_cv, ks_log2_base)

    def device(self):
        if self._device is None:
            from . import _maybe_enable_persistent_compilation_cache
            from .ops import lwe as dlwe
            _maybe_enable_persistent_compilation_cache()
            self._device = dlwe.prepare_keyswitch_device(
                self.ks_a, self.ks_b, self.ks_cv, self.log2_base)
        return self._device

    def dump(self, file_obj):
        # format 2: digit-0 slices are trivial zero encryptions by
        # construction (the reference zeroes them too, lwe_gpu.mako:18-56)
        # — don't spend container bytes on them (1/base of the payload).
        # Guard the invariant: a hand-built key with nonzero slice 0
        # must not be silently changed by a dump/load round-trip.
        ks_a, ks_b = np.asarray(self.ks_a), np.asarray(self.ks_b)
        if np.any(ks_a[:, :, 0]) or np.any(ks_b[:, :, 0]):
            raise ValueError(
                "keyswitch key digit-0 slice is not the trivial zero "
                "encryption; refusing the lossy format-2 dump")
        serialization.dump(
            file_obj,
            {"kind": "LweKeyswitchKey", "log2_base": self.log2_base,
             "format": 2},
            {"ks_a_nz": ks_a[:, :, 1:],
             "ks_b_nz": ks_b[:, :, 1:],
             "ks_cv_nz": np.asarray(self.ks_cv)[:, :, 1:]})

    @classmethod
    def load(cls, file_obj):
        meta, arrays = serialization.load(file_obj)
        assert meta["kind"] == "LweKeyswitchKey"
        if meta.get("format", 1) >= 2:
            nz = arrays["ks_a_nz"]
            pad = [(0, 0), (0, 0), (1, 0)]
            ks_a = np.pad(nz, pad + [(0, 0)])
            ks_b = np.pad(arrays["ks_b_nz"], pad)
            ks_cv = np.pad(arrays["ks_cv_nz"], pad)
            return cls(ks_a, ks_b, ks_cv, int(meta["log2_base"]))
        return cls(arrays["ks_a"], arrays["ks_b"], arrays["ks_cv"],
                   int(meta["log2_base"]))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and np.array_equal(np.asarray(self.ks_a),
                                   np.asarray(other.ks_a))
                and np.array_equal(np.asarray(self.ks_b),
                                   np.asarray(other.ks_b)))


def _params_meta(params: NuFHEParameters):
    return list(params._key)


def _params_from_meta(meta):
    (transform_type, tlwe_mask_size, tlwe_polynomial_degree, lwe_size,
     bs_decomp_length, bs_log2_base, ks_decomp_length, ks_log2_base) = meta
    return NuFHEParameters(
        transform_type=transform_type, tlwe_mask_size=int(tlwe_mask_size),
        tlwe_polynomial_degree=int(tlwe_polynomial_degree),
        lwe_size=int(lwe_size), bs_decomp_length=int(bs_decomp_length),
        bs_log2_base=int(bs_log2_base),
        ks_decomp_length=int(ks_decomp_length),
        ks_log2_base=int(ks_log2_base))


class NuFHESecretKey:
    """Reference: ``nufhe/api_low_level.py:90-154``."""

    def __init__(self, params: NuFHEParameters, lwe_key: LweKey):
        self.params = params
        self.lwe_key = lwe_key

    @classmethod
    def from_rng(cls, params: NuFHEParameters, rng):
        return cls(params, LweKey.from_rng(params.in_out_params, rng))

    def dump(self, file_obj):
        serialization.dump(
            file_obj, {"kind": "NuFHESecretKey",
                       "params": _params_meta(self.params)}, {})
        self.lwe_key.dump(file_obj)

    def dumps(self):
        buf = io.BytesIO()
        self.dump(buf)
        return buf.getvalue()

    @classmethod
    def load(cls, file_obj):
        meta, _ = serialization.load(file_obj)
        assert meta["kind"] == "NuFHESecretKey"
        params = _params_from_meta(meta["params"])
        return cls(params, LweKey.load(file_obj))

    @classmethod
    def loads(cls, s: bytes):
        return cls.load(io.BytesIO(s))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.params == other.params
                and self.lwe_key == other.lwe_key)


class NuFHECloudKey:
    """Reference: ``nufhe/api_low_level.py:157-239``."""

    def __init__(self, params: NuFHEParameters,
                 bootstrap_key: BootstrapKey, keyswitch_key: LweKeyswitchKey):
        self.params = params
        self.bootstrap_key = bootstrap_key
        self.keyswitch_key = keyswitch_key

    @classmethod
    def from_rng(cls, params: NuFHEParameters, rng,
                 secret_key: NuFHESecretKey, perf_params=None,
                 on_device=None):
        tgsw_key = TGswKey.from_rng(params.tgsw_params, rng)
        bk = BootstrapKey.from_rng(rng, secret_key.lwe_key, tgsw_key,
                                   on_device=on_device)
        ks = LweKeyswitchKey.from_tgsw_key(
            rng, params.ks_decomp_length, params.ks_log2_base,
            secret_key.lwe_key, tgsw_key, on_device=on_device)
        return cls(params, bk, ks)

    def dump(self, file_obj):
        serialization.dump(
            file_obj, {"kind": "NuFHECloudKey",
                       "params": _params_meta(self.params)}, {})
        self.bootstrap_key.dump(file_obj)
        self.keyswitch_key.dump(file_obj)

    def dumps(self):
        buf = io.BytesIO()
        self.dump(buf)
        return buf.getvalue()

    @classmethod
    def load(cls, file_obj):
        meta, _ = serialization.load(file_obj)
        assert meta["kind"] == "NuFHECloudKey"
        params = _params_from_meta(meta["params"])
        bk = BootstrapKey.load(
            file_obj, params.in_out_params, params.tgsw_params)
        ks = LweKeyswitchKey.load(file_obj)
        return cls(params, bk, ks)

    @classmethod
    def loads(cls, s: bytes):
        return cls.load(io.BytesIO(s))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.params == other.params
                and self.bootstrap_key == other.bootstrap_key
                and self.keyswitch_key == other.keyswitch_key)


def make_key_pair(rng, **params):
    """Create a (secret key, cloud key) pair.
    Reference: ``nufhe/api_low_level.py:242-250``.

    ``on_device=False`` forces the host (numpy oracle) keygen path;
    ``True`` the device path; default auto (device on accelerators).
    Both produce identical keys for a seeded ``DeterministicRNG``.
    """
    on_device = params.pop("on_device", None)
    nufhe_params = NuFHEParameters(**params)
    secret_key = NuFHESecretKey.from_rng(nufhe_params, rng)
    cloud_key = NuFHECloudKey.from_rng(nufhe_params, rng, secret_key,
                                       on_device=on_device)
    return secret_key, cloud_key
