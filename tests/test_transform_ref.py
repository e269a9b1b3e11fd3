"""Oracle-level transform tests.

The key correctness chain (mirrors the reference's
test/test_transform/test_computation.py:71-124 negacyclic-multiply oracle):

  schoolbook mod 2^32  ==  Nussbaumer engine  ==  Goldilocks NTT ref
                                              ==  complex128 FFT ref
"""

import numpy as np
import pytest

from nufhe_tpu.ref import transform_ref as tr
from nufhe_tpu.ref import ntt_goldilocks as gl
from nufhe_tpu.ref import fft_ref
from nufhe_tpu.ref import polynomials_ref

N = tr.N


def test_nussbaumer_matches_schoolbook_full_range(rng):
    a = rng.randint(-2**31, 2**31, N).astype(np.int32)
    b = rng.randint(-2**31, 2**31, N).astype(np.int32)
    assert np.array_equal(tr.negacyclic_mul(a, b), tr.schoolbook_negacyclic(a, b))


def test_nussbaumer_batched_broadcast(rng):
    a = rng.randint(-512, 512, (2, 3, N)).astype(np.int32)
    b = rng.randint(-2**31, 2**31, (3, N)).astype(np.int32)
    got = tr.negacyclic_mul(a, b)
    assert got.shape == (2, 3, N)
    for i in range(2):
        for j in range(3):
            assert np.array_equal(got[i, j], tr.schoolbook_negacyclic(a[i, j], b[j]))


def test_nussbaumer_accumulated_mac(rng):
    a = [rng.randint(-512, 512, N).astype(np.int32) for _ in range(4)]
    b = [rng.randint(-2**31, 2**31, N).astype(np.int32) for _ in range(4)]
    got = tr.negacyclic_mul_accum(a, b)
    want = np.zeros(N, np.int64)
    for ai, bi in zip(a, b):
        want += tr.schoolbook_negacyclic(ai, bi).astype(np.int64)
    want = (want & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    assert np.array_equal(got, want)


def test_forward_linearity(rng):
    a = rng.randint(-512, 512, N).astype(np.int32)
    b = rng.randint(-512, 512, N).astype(np.int32)
    fa, fb = tr.forward(a), tr.forward(b)
    assert np.array_equal(tr.forward(a + b), fa + fb)


def test_goldilocks_roundtrip(rng):
    a = rng.randint(-2**31, 2**31, (2, N)).astype(np.int32)
    tra = gl.forward_transform(a)
    back = gl.inverse_transform(tra)
    assert np.array_equal(back, a)


def test_goldilocks_negacyclic_mul_matches_engine(rng):
    # The reference NTT path's product == our engine, bit-exact.
    a = rng.randint(-512, 512, N).astype(np.int32)
    b = rng.randint(-2**31, 2**31, N).astype(np.int32)
    prod = gl.inverse_transform(
        gl.transformed_space_mul(gl.forward_transform(a), gl.forward_transform(b)))
    assert np.array_equal(prod, tr.negacyclic_mul(a, b))


def test_goldilocks_montgomery_mul_prepared(rng):
    a = rng.randint(-512, 512, N).astype(np.int32)
    b = rng.randint(-2**31, 2**31, N).astype(np.int32)
    fa, fb = gl.forward_transform(a), gl.forward_transform(b)
    direct = gl.transformed_space_mul(fa, fb)
    prepared = gl.transformed_space_mul_prepared(fa, gl.prepare_for_mul(fb))
    assert np.array_equal(direct, prepared)


def test_fft_negacyclic_mul_matches_engine(rng):
    # The reference FFT path's product == our engine for TFHE-bounded operands
    # (decomposition digits x torus values; |product| < 2^52).
    a = rng.randint(-512, 512, N).astype(np.int32)
    b = rng.randint(-2**31, 2**31, N).astype(np.int32)
    prod = fft_ref.inverse_transform(
        fft_ref.transformed_space_mul(
            fft_ref.forward_transform(a), fft_ref.forward_transform(b)))
    assert np.array_equal(prod, tr.negacyclic_mul(a, b))


def test_fft_roundtrip(rng):
    a = rng.randint(-2**31, 2**31, (3, N)).astype(np.int32)
    back = fft_ref.inverse_transform(fft_ref.forward_transform(a))
    assert np.array_equal(back, a)


@pytest.mark.parametrize("invert_powers,minus_one", [
    (False, False), (True, False), (False, True)])
def test_shift_polynomial(rng, invert_powers, minus_one):
    a = rng.randint(-2**31, 2**31, (4, N)).astype(np.int32)
    powers = rng.randint(0, 2 * N, (4,))
    got = polynomials_ref.shift_polynomial(
        a, powers, invert_powers=invert_powers, minus_one=minus_one)
    for i in range(4):
        p = (2 * N - powers[i]) % (2 * N) if invert_powers else powers[i]
        mono = np.zeros(N, np.int32)
        sign = 1 if p < N else -1
        mono[p % N] = sign
        want = tr.schoolbook_negacyclic(mono, a[i])
        if minus_one:
            want = (want - a[i]).astype(np.int32)
        assert np.array_equal(got[i], want)


@pytest.mark.parametrize("exact", [True, False])
def test_one_sided_limb_roundtrip(rng, exact):
    """The compact (format-4) key form: two-sided -> one-sided -> derived
    two-sided is bit-exact, on host AND on device (int32-only path),
    including the vlo = -32 / remainder = -32 boundary slots."""
    from nufhe_tpu.ops import transform as dt

    # dense random mod-2^64 residues, plus forced boundary cases:
    # v = -32 mod 64 exercises both the exact-mode carry and the
    # rounded-mode independent-rounding delta bit
    vals = rng.randint(0, 2**64, (1024,), dtype=np.uint64)
    vals[:64] = (vals[:64] & ~np.uint64(63)) | np.uint64(2**38 - 32)
    vals = vals.reshape(16, 64)

    two = dt.key_limbs_host(vals, exact=exact)
    pos, delta = dt.one_sided_limbs_host(two)
    assert pos.shape == two.shape[:-1]
    assert (delta is None) == exact

    host = dt.two_sided_limbs_host(pos, delta)
    assert np.array_equal(host, two)

    dev = np.asarray(dt.two_sided_limbs_device(pos, delta))
    assert np.array_equal(dev, two)
