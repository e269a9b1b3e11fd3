"""Per-backend polynomial transform facade.

API parity with the reference facade (``nufhe/polynomial_transform.py``,
``polynomial_transform_ntt.py``, ``polynomial_transform_fft.py``): a uniform
module interface per ``transform_type`` exposing the transformed dtype/length,
reference (host) transforms, and transformed-space arithmetic.

On device both backends are served by the Z/2^32 Nussbaumer engine
(``ops/transform.py``) in its two accuracy modes — 'NTT' selects the exact
engine, 'FFT' the rounded-key engine (a tracked speed/noise trade the
reference's exact-for-TFHE f64 FFT does not make; see
``params.NuFHEParameters``).  These facade backends define
the *reference domain semantics* (u64 Goldilocks field vs complex128) used
by the oracle layer and available to users who need the reference's
transformed representation.
"""

import numpy as np

from .ref import ntt_goldilocks, fft_ref
from .ref import transform_ref


class _NTTTransform:
    """Goldilocks-field NTT domain (reference: polynomial_transform_ntt.py)."""

    name = 'NTT'

    @staticmethod
    def transformed_dtype():
        return np.dtype('uint64')

    @staticmethod
    def transformed_length(n):
        return n

    forward_transform_ref = staticmethod(ntt_goldilocks.forward_transform)
    inverse_transform_ref = staticmethod(ntt_goldilocks.inverse_transform)
    transformed_space_add_ref = staticmethod(ntt_goldilocks.transformed_space_add)
    transformed_space_mul_ref = staticmethod(ntt_goldilocks.transformed_space_mul)
    transformed_space_mul_prepared_ref = staticmethod(
        ntt_goldilocks.transformed_space_mul_prepared)
    prepare_for_mul_ref = staticmethod(ntt_goldilocks.prepare_for_mul)


class _FFTTransform:
    """complex128 tangent-FFT domain (reference: polynomial_transform_fft.py)."""

    name = 'FFT'

    @staticmethod
    def transformed_dtype():
        return np.dtype('complex128')

    @staticmethod
    def transformed_length(n):
        return n // 2

    forward_transform_ref = staticmethod(fft_ref.forward_transform)
    inverse_transform_ref = staticmethod(fft_ref.inverse_transform)
    transformed_space_add_ref = staticmethod(fft_ref.transformed_space_add)
    transformed_space_mul_ref = staticmethod(fft_ref.transformed_space_mul)
    transformed_space_mul_prepared_ref = staticmethod(fft_ref.transformed_space_mul)

    @staticmethod
    def prepare_for_mul_ref(data):
        return data  # identity for FFT (reference: polynomial_transform_fft.py:91-100)


class _DeviceTransform:
    """The native engine's own domain: Z/2^32 Nussbaumer, (L, R) i32 layout."""

    name = 'N32'

    @staticmethod
    def transformed_dtype():
        return np.dtype('uint64')  # host residues mod 2^64

    @staticmethod
    def transformed_length(n):
        assert n == transform_ref.N
        return transform_ref.L * transform_ref.R

    forward_transform_ref = staticmethod(transform_ref.forward)
    inverse_transform_ref = staticmethod(
        lambda data: transform_ref.u64_to_i32(
            transform_ref.inverse_unscaled(data)
            >> np.uint64(transform_ref.INV_SHIFT)))
    transformed_space_add_ref = staticmethod(lambda a, b: a + b)
    transformed_space_mul_ref = staticmethod(transform_ref.smul)
    transformed_space_mul_prepared_ref = staticmethod(transform_ref.smul)

    @staticmethod
    def prepare_for_mul_ref(data):
        return data


_TRANSFORMS = {
    'NTT': _NTTTransform,
    'FFT': _FFTTransform,
    'N32': _DeviceTransform,
}


# --- device-side transformed-domain operations -----------------------------
#
# Parity note vs the reference's per-backend device ops
# (``nufhe/polynomial_transform_ntt.py:29-131``): the reference exposes
# forward/inverse transforms and transformed add/mul as GPU computations.
# The exact Z/2^32 engine exposes the same *capability* with one structural
# difference: 1/64 (the DFT length) is not invertible mod 2^32, so a
# standalone general inverse does not exist — exact products are recovered
# through the engine's two-channel (A/B) mod-2^38 pipeline instead.  Every
# multiplication the scheme (and the reference) actually performs has one
# small-coefficient operand (key bits, gadget digits), which
# ``transformed_mul_device``/``negacyclic_mul_device`` cover exactly.
# (These facade ops are always exact; the gate engine's rounded-key
# 'FFT' accuracy mode applies only to the bootstrap-key external
# products — see ``ops.transform`` and DESIGN.md.)

def forward_device(x):
    """Device forward transform, (..., N) int32 -> (..., L, R) int32.

    Exact mod 2^32 for arbitrary Torus32 polynomials (the DFT is
    add/sub/shift only; int32 wraparound IS the target ring).  For
    small-coefficient inputs (|x| <= 2^25) the values are additionally
    exact as integers, which is what the MAC limb path relies on.
    """
    from .ops import transform as dt
    return dt.forward_i32(x)


def transformed_add_device(ahat, bhat):
    """Pointwise add in the transform domain (exact mod 2^32)."""
    return (ahat + bhat).astype(ahat.dtype)


def transformed_mul_device(ahat_small, b_coeff):
    """Exact negacyclic product where one operand has small coefficients.

    See ``ops.transform.negacyclic_mul_device`` — this is the engine's
    product path (small side transformed on device, arbitrary side carried
    mod 2^38); provided here for facade parity.
    """
    from .ops import transform as dt
    return dt.negacyclic_mul_device(ahat_small, b_coeff)


def get_transform(transform_type):
    """Reference: ``nufhe/polynomial_transform.py:26-30``."""
    if transform_type not in _TRANSFORMS:
        raise ValueError("Unknown transform type: " + str(transform_type))
    return _TRANSFORMS[transform_type]


def transform_supported(transform_type, device=None):
    """Both transform types are supported on every device: the exact engine
    needs neither f64 nor u64 (reference: polynomial_transform.py:38-41
    had to gate FFT on fp64 support)."""
    return transform_type in _TRANSFORMS
