"""Rows-layout engine (ops/rows_engine) vs exact oracles, bit-exact.

The rows engine is the TPU production path (executed via the Pallas kernel,
tests/test_pallas.py); here its math runs under plain jit on CPU.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.ref import tgsw_ref, polynomials_ref
from nufhe_tpu.ops import rows_engine as re_
from nufhe_tpu.ops import tgsw as dtgsw


@pytest.fixture(scope="module")
def setup(rng):
    params = NuFHEParameters()
    tp = params.tgsw_params
    mask1 = 2
    accum = rng.randint(-2**31, 2**31, (4, mask1, 1024)).astype(np.int32)
    powers = rng.randint(0, 2048, (4,)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (1, mask1, tp.decomp_length, mask1, 1024)).astype(np.int32)
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)
    shifted = polynomials_ref.shift_polynomial(accum, powers, minus_one=True)
    want = accum + tgsw_ref.tgsw_external_mul(shifted, bk_coeff, 0, tp)
    return tp, mask1, accum, powers, bk_dev, want


@pytest.mark.parametrize("swar", [False, True])
def test_rows_external_step_vs_ref(setup, swar):
    tp, mask1, accum, powers, bk_dev, want = setup
    acc_r = re_.acc_rows_from_n(jnp.asarray(accum))
    rot = re_.rotate_acc(acc_r, jnp.asarray(powers)[None, :], mask1,
                         minus_one=True)
    digits = re_.gadget_decomp(rot, mask1, tp.decomp_length,
                               tp.bs_log2_base, int(tp.offset))
    delta = re_.transformed_mac(
        digits, bk_dev[0], mask1=mask1, g_total=mask1 * tp.decomp_length,
        mac_dtype=jnp.float32, swar=swar)
    got = np.asarray(re_.acc_n_from_rows(acc_r + delta, mask1))
    assert np.array_equal(got, want)


def test_rows_layout_roundtrip(rng):
    x = rng.randint(-2**31, 2**31, (5, 2, 1024)).astype(np.int32)
    r = re_.acc_rows_from_n(jnp.asarray(x))
    assert np.array_equal(np.asarray(re_.acc_n_from_rows(r, 2)), x)


def test_swar_pack_roundtrip(rng):
    a = rng.randint(-16352, 16353, (64, 7)).astype(np.int32)
    b = rng.randint(-16352, 16353, (64, 7)).astype(np.int32)
    w = re_.pack_pairs(jnp.asarray(a), jnp.asarray(b))
    ga, gb = re_.unpack_pairs(w)
    assert np.array_equal(np.asarray(ga), a)
    assert np.array_equal(np.asarray(gb), b)
    # packed arithmetic identities at the value extremes
    wa = re_.pack_pairs(jnp.asarray(a), jnp.asarray(b))
    s = re_._pk_add(wa, re_.pack_pairs(jnp.asarray(-a), jnp.asarray(-b)))
    za, zb = re_.unpack_pairs(s)
    assert int(np.abs(np.asarray(za)).max()) == 0
    assert int(np.abs(np.asarray(zb)).max()) == 0


def test_swar_limb_split_at_extreme_forward_values(rng):
    """Regression: digits of -512 drive forward-transform values to exactly
    +-2^14, putting the packed odd field at 2^15 (word bit 31 set); the
    packed limb extraction must mask after the arithmetic shift or the odd
    high limb sign-extends (wrong on the non-int8 MAC path)."""
    params = NuFHEParameters()
    tp = params.tgsw_params
    mask1 = 2
    b = 4
    # acc = -offset everywhere decomposes to all digits == -512
    accum = np.full((b, mask1, 1024), -int(tp.offset), np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (1, mask1, tp.decomp_length, mask1, 1024)).astype(np.int32)
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)
    want = accum + tgsw_ref.tgsw_external_mul(accum, bk_coeff, 0, tp)

    acc_rows = re_.acc_rows_from_n(jnp.asarray(accum))
    digits = re_.gadget_decomp(
        acc_rows, mask1, tp.decomp_length, tp.bs_log2_base, int(tp.offset))
    assert int(np.asarray(digits).min()) == -512          # extreme digits
    delta = re_.transformed_mac(
        digits, bk_dev[0], mask1=mask1, g_total=mask1 * tp.decomp_length,
        mac_dtype=jnp.float32)
    got = np.asarray(re_.acc_n_from_rows(acc_rows + delta, mask1))
    assert np.array_equal(got, want)
