"""Flat-layout engine (ops/flat_engine) vs exact oracles, bit-exact."""

import numpy as np
import pytest
import jax.numpy as jnp

from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.ref import transform_ref as tr
from nufhe_tpu.ref import tgsw_ref, polynomials_ref
from nufhe_tpu.ops import transform as dt
from nufhe_tpu.ops import flat_engine as fe

N, R, L = tr.N, tr.R, tr.L


def test_q_layout_roundtrip(rng):
    x = rng.randint(-2**31, 2**31, (3, N)).astype(np.int32)
    q = np.asarray(fe.q_from_n(jnp.asarray(x)))
    # q = j*32 + i holds coefficient n = i*32 + j
    n_idx = (np.arange(N) % R) * R + np.arange(N) // R
    assert np.array_equal(q, x[:, n_idx])
    assert np.array_equal(np.asarray(fe.n_from_q(jnp.asarray(q))), x)


def test_rotate_q_matches_shift(rng):
    src = rng.randint(-2**31, 2**31, (8, N)).astype(np.int32)
    powers = np.concatenate([
        rng.randint(0, 2 * N, 6), [0, 2 * N - 1]]).astype(np.int32)
    for minus_one in (False, True):
        want = polynomials_ref.shift_polynomial(
            src, powers, minus_one=minus_one)
        got_q = fe.rotate_q(
            fe.q_from_n(jnp.asarray(src)), jnp.asarray(powers)[:, None],
            minus_one=minus_one)
        assert np.array_equal(np.asarray(fe.n_from_q(got_q)), want)


def test_rotate_q_multi_poly(rng):
    """Concatenated polynomials in one row: regions must not leak."""
    src = rng.randint(-2**31, 2**31, (4, 2, N)).astype(np.int32)
    powers = rng.randint(0, 2 * N, (4,)).astype(np.int32)
    want = polynomials_ref.shift_polynomial(src, powers, minus_one=True)
    flat = fe.q_from_n(jnp.asarray(src)).reshape(4, 2 * N)
    got = fe.rotate_q(flat, jnp.asarray(powers)[:, None], minus_one=True)
    got = np.asarray(fe.n_from_q(got.reshape(4, 2, N)))
    assert np.array_equal(got, want)


def test_dif_forward_matches_ref(rng):
    dig = rng.randint(-512, 512, (3, N)).astype(np.int32)
    want = tr.forward(dig)                    # (3, L, R) u64, natural t
    got = np.asarray(fe.dif_forward_q(fe.q_from_n(jnp.asarray(dig))))
    got = got.reshape(3, L, R)                # slot p holds t = bitrev(p)
    want_i32 = (want & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int64)
    got_sl = got[:, dt.BITREV_L]              # undo slot order
    assert np.array_equal(
        got_sl.astype(np.uint32).astype(np.int64), want_i32)


def test_transformed_mac_flat_single(rng):
    a = rng.randint(-512, 512, (2, N)).astype(np.int32)
    b = rng.randint(-2**31, 2**31, (2, N)).astype(np.int32)
    got = np.asarray(dt.negacyclic_mul_device(jnp.asarray(a), b))
    for i in range(2):
        assert np.array_equal(got[i], tr.schoolbook_negacyclic(a[i], b[i]))


@pytest.mark.parametrize("mask_size", [1, 2])
def test_external_step_vs_ref(rng, mask_size):
    params = NuFHEParameters(tlwe_mask_size=mask_size)
    tp = params.tgsw_params
    mask1 = mask_size + 1
    accum = rng.randint(-2**31, 2**31, (3, mask1, N)).astype(np.int32)
    powers = rng.randint(0, 2 * N, (3,)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31, (1, mask1, tp.decomp_length, mask1, N)).astype(np.int32)

    from nufhe_tpu.ops import tgsw as dtgsw
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)

    # reference: acc + BK (x) [(X^p - 1) acc]
    shifted = polynomials_ref.shift_polynomial(accum, powers, minus_one=True)
    want = accum + tgsw_ref.tgsw_external_mul(shifted, bk_coeff, 0, tp)

    acc_q = fe.q_from_n(jnp.asarray(accum)).reshape(3, mask1 * N)
    got_q = fe.external_step(
        acc_q, jnp.asarray(powers)[:, None], bk_dev[0],
        mask1=mask1, decomp_length=tp.decomp_length,
        log2_base=tp.bs_log2_base, offset=int(tp.offset),
        mac_dtype=dt.mac_dtype())
    got = np.asarray(fe.n_from_q(got_q.reshape(3, mask1, N)))
    assert np.array_equal(got, want)
