"""Device-op vs oracle exact-equality tests (kernel-level, mirrors the
reference's GPU-vs-CPU-reference test pattern, SURVEY.md section 4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.ref import transform_ref as tr
from nufhe_tpu.ref import lwe_ref, tlwe_ref, tgsw_ref, polynomials_ref
from nufhe_tpu.ops import transform as dt
from nufhe_tpu.ops import lwe as dlwe
from nufhe_tpu.ops import tlwe as dtlwe
from nufhe_tpu.ops import tgsw as dtgsw
from nufhe_tpu.ops import bootstrap as dboot
from nufhe_tpu.utils import errors_allclose

N = tr.N


def test_forward_i32_matches_ref(rng):
    a = rng.randint(-512, 512, (3, N)).astype(np.int32)
    got = np.asarray(dt.forward_i32(jnp.asarray(a)))
    want = tr.forward(a)
    assert np.array_equal(
        got.astype(np.uint32), (want & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def test_device_negacyclic_mul(rng):
    a = rng.randint(-512, 512, (2, N)).astype(np.int32)
    b = rng.randint(-2**31, 2**31, (2, N)).astype(np.int32)
    got = np.asarray(dt.negacyclic_mul_device(jnp.asarray(a), b))
    for i in range(2):
        assert np.array_equal(got[i], tr.schoolbook_negacyclic(a[i], b[i]))


def test_lwe_encrypt_decrypt(rng):
    n = 64
    key = rng.randint(0, 2, n).astype(np.int32)
    msgs = rng.randint(-2**31, 2**31, (5,)).astype(np.int32)
    na = rng.randint(-2**31, 2**31, (5, n)).astype(np.int32)
    nb = rng.randint(-100, 100, (5,)).astype(np.int32)

    ra, rb, rcv = lwe_ref.lwe_encrypt(msgs, key, na, nb, 1e-5)
    da, db, dcv = dlwe.lwe_encrypt(
        jnp.asarray(msgs), jnp.asarray(key), jnp.asarray(na), jnp.asarray(nb),
        1e-5)
    assert np.array_equal(np.asarray(da), ra)
    assert np.array_equal(np.asarray(db), rb)
    assert errors_allclose(dcv, rcv)

    phase_ref = lwe_ref.lwe_decrypt_phase(ra, rb, key)
    phase_dev = dlwe.lwe_decrypt_phase(da, db, jnp.asarray(key))
    assert np.array_equal(np.asarray(phase_dev), phase_ref)


def test_lwe_linear_broadcast(rng):
    n = 32
    sa = rng.randint(-2**31, 2**31, (4, n)).astype(np.int32)
    sb = rng.randint(-2**31, 2**31, (4,)).astype(np.int32)
    scv = rng.rand(4).astype(np.float32)
    for p in (-2, -1, 1, 2):
        ra, rb, rcv = lwe_ref.lwe_linear(sa, sb, scv, p)
        da, db, dcv = dlwe.lwe_linear(
            (jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(scv)), p)
        assert np.array_equal(np.asarray(da), ra)
        assert np.array_equal(np.asarray(db), rb)
        assert errors_allclose(dcv, rcv)


def test_keyswitch_device_vs_ref(rng):
    params = NuFHEParameters()
    t, log2b = params.ks_decomp_length, params.ks_log2_base
    in_size, out_size = 128, 50
    base = 2**log2b
    in_key = rng.randint(0, 2, in_size).astype(np.int32)
    out_key = rng.randint(0, 2, out_size).astype(np.int32)
    na = rng.randint(-2**31, 2**31, (in_size, t, base - 1, out_size)).astype(np.int32)
    nb = rng.randint(-1000, 1000, (in_size, t, base - 1)).astype(np.int32)
    ks_a, ks_b, ks_cv = lwe_ref.make_keyswitch_key(
        in_key, out_key, na, nb, t, log2b, 1e-5)

    src_a = rng.randint(-2**31, 2**31, (3, 4, in_size)).astype(np.int32)
    src_b = rng.randint(-2**31, 2**31, (3, 4)).astype(np.int32)
    ra, rb, rcv = lwe_ref.lwe_keyswitch(ks_a, ks_b, ks_cv, src_a, src_b, t, log2b)

    arrays, meta = dlwe.prepare_keyswitch_device(ks_a, ks_b, ks_cv, log2b)
    da, db, dcv = dlwe.lwe_keyswitch(
        arrays, meta, jnp.asarray(src_a), jnp.asarray(src_b))
    assert np.array_equal(np.asarray(da), ra)
    assert np.array_equal(np.asarray(db), rb)
    assert errors_allclose(dcv, rcv)


def test_tlwe_noiseless_trivial_and_extract(rng):
    mu = rng.randint(-2**31, 2**31, (3, N)).astype(np.int32)
    for mask_size in (1, 2):
        ra, rcv = tlwe_ref.tlwe_noiseless_trivial(mu, mask_size)
        da, dcv = dtlwe.tlwe_noiseless_trivial(jnp.asarray(mu), mask_size)
        assert np.array_equal(np.asarray(da), ra)

        tl = rng.randint(-2**31, 2**31, (3, mask_size + 1, N)).astype(np.int32)
        ea, eb = tlwe_ref.tlwe_extract_lwe_samples(tl)
        dea, deb = dtlwe.tlwe_extract_lwe_samples(jnp.asarray(tl))
        assert np.array_equal(np.asarray(dea), ea)
        assert np.array_equal(np.asarray(deb), eb)


@pytest.mark.parametrize("invert_powers,minus_one", [
    (False, False), (True, False), (False, True)])
def test_monomial_shift_device(rng, invert_powers, minus_one):
    src = rng.randint(-2**31, 2**31, (4, 3, N)).astype(np.int32)
    powers = rng.randint(0, 2 * N, (4,)).astype(np.int32)
    want = polynomials_ref.shift_polynomial(
        src, powers, invert_powers=invert_powers, minus_one=minus_one)
    got = dtlwe.monomial_shift(
        jnp.asarray(src), jnp.asarray(powers),
        invert_powers=invert_powers, minus_one=minus_one)
    assert np.array_equal(np.asarray(got), want)


def test_tgsw_decomp_device_vs_ref(rng):
    params = NuFHEParameters()
    tp = params.tgsw_params
    sample = rng.randint(-2**31, 2**31, (3, 2, N)).astype(np.int32)
    want = tgsw_ref.tgsw_polynomial_decomp(sample, tp)
    got = dtgsw.tgsw_polynomial_decomp(
        jnp.asarray(sample), int(tp.offset), tp.decomp_length, tp.bs_log2_base)
    assert np.array_equal(np.asarray(got), want)
    assert np.abs(want).max() <= 2**(tp.bs_log2_base - 1)


@pytest.mark.parametrize("mask_size", [1, 2])
def test_external_mul_device_vs_ref(rng, mask_size):
    params = NuFHEParameters(tlwe_mask_size=mask_size)
    tp = params.tgsw_params
    mask1 = mask_size + 1
    accum = rng.randint(-2**31, 2**31, (2, mask1, N)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (2, mask1, tp.decomp_length, mask1, N)).astype(np.int32)

    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)
    for row in range(2):
        got = np.asarray(dtgsw.tgsw_transformed_external_mul(
            jnp.asarray(accum), bk_dev, row,
            int(tp.offset), tp.decomp_length, tp.bs_log2_base))
        want = tgsw_ref.tgsw_external_mul(accum, bk_coeff, row, tp)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("mask_size", [1, 2])
def test_external_mul_rounded_device_vs_ref(rng, mask_size):
    """Rounded-key ('FFT' mode) external product: Q shrinks to 4 groups and
    the device result is bit-exact against the rounded oracle."""
    params = NuFHEParameters(tlwe_mask_size=mask_size)
    tp = params.tgsw_params
    mask1 = mask_size + 1
    accum = rng.randint(-2**31, 2**31, (2, mask1, N)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (2, mask1, tp.decomp_length, mask1, N)).astype(np.int32)

    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff, exact=False)
    assert bk_dev.shape[-1] == 4 * mask1 * 32
    for row in range(2):
        got = np.asarray(dtgsw.tgsw_transformed_external_mul(
            jnp.asarray(accum), bk_dev, row,
            int(tp.offset), tp.decomp_length, tp.bs_log2_base))
        want = tgsw_ref.tgsw_external_mul_rounded(accum, bk_coeff, row, tp)
        assert np.array_equal(got, want)


def test_t32_to_phase(rng):
    from nufhe_tpu.numeric import t32_to_phase_ref
    x = rng.randint(-2**31, 2**31, (100,)).astype(np.int32)
    want = t32_to_phase_ref(x, 2048)
    got = np.asarray(dboot.t32_to_phase(jnp.asarray(x), 2048))
    assert np.array_equal(got, want)
    assert got.min() >= 0 and got.max() < 2048


def test_polynomial_transform_device_facade(rng):
    """Device transformed-domain ops (facade parity with the reference's
    per-backend device API, nufhe/polynomial_transform_ntt.py:29-131):
    forward exact mod 2^32 on arbitrary Torus32 input, pointwise add,
    and the small-x-any exact product."""
    from nufhe_tpu import polynomial_transform as pt
    from nufhe_tpu.ref import transform_ref as tr

    a = rng.randint(-2**31, 2**31, (3, 1024)).astype(np.int32)
    b = rng.randint(-2**31, 2**31, (3, 1024)).astype(np.int32)

    got = np.asarray(pt.forward_device(jnp.asarray(a)))
    want = (tr.forward(a) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    assert np.array_equal(got.astype(np.uint32), want)

    s = np.asarray(pt.transformed_add_device(
        jnp.asarray(a[:, :64].reshape(3, 2, 32)),
        jnp.asarray(b[:, :64].reshape(3, 2, 32))))
    assert np.array_equal(s, (a[:, :64] + b[:, :64]).reshape(3, 2, 32))

    small = rng.randint(-512, 512, (2, 1024)).astype(np.int32)
    prod = np.asarray(pt.transformed_mul_device(
        jnp.asarray(small), b[:2]))
    want_prod = np.stack([
        tr.schoolbook_negacyclic(small[i], b[i]) for i in range(2)])
    assert np.array_equal(prod, want_prod)


def test_negacyclic_mul_device_batched(rng):
    """The facade product is batched (one native forward + one rhs build +
    one vmapped MAC program for the whole batch), including leading dims."""
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ref import transform_ref as tr

    small = rng.randint(-512, 512, (3, 4, 1024)).astype(np.int32)
    b = rng.randint(-2**31, 2**31, (3, 4, 1024)).astype(np.int32)
    prod = np.asarray(dt.negacyclic_mul_device(jnp.asarray(small), b))
    assert prod.shape == (3, 4, 1024)
    flat_s, flat_b = small.reshape(-1, 1024), b.reshape(-1, 1024)
    want = np.stack([tr.schoolbook_negacyclic(flat_s[i], flat_b[i])
                     for i in range(flat_s.shape[0])]).reshape(3, 4, 1024)
    assert np.array_equal(prod, want)
