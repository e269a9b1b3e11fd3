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


def test_radix8_two_pass_forms_bit_identical(rng):
    """The two-pass radix-8 forward/inverse and the fused decomp+pack are
    pure reassociations: bit-identical to the staged radix-4 forms."""
    b = 24
    n_pk = 2
    dig = rng.randint(-512, 512, (re_.M * 2 * n_pk * re_.R, b)).astype(np.int32)
    dv = dig.reshape(re_.M, n_pk, 2, re_.R, b)
    packed = re_.pack_pairs(
        jnp.asarray(dv[:, :, 0]), jnp.asarray(dv[:, :, 1])).reshape(
        re_.M * n_pk * re_.R, b)
    packed_raw = re_.pack_pairs_raw(
        jnp.asarray(dv[:, :, 0]), jnp.asarray(dv[:, :, 1])).reshape(
        re_.M * n_pk * re_.R, b)
    # the radix-8 form is bias-deferred: identical at the normalized
    # MAC-lhs boundary (see the bias-deferral note in rows_engine)
    assert np.array_equal(
        np.asarray(re_.packed_to_lhs(
            re_.dif_forward_packed(packed, n_pk), n_pk, jnp.int32)),
        np.asarray(re_.packed_to_lhs(
            re_.dif_forward_packed2(packed_raw, n_pk), n_pk, jnp.int32,
            raw=True)))

    stride = 128
    x = rng.randint(-2**31, 2**31, (re_.L * stride, b)).astype(np.int32)
    assert np.array_equal(
        np.asarray(re_.dit_inverse(jnp.asarray(x), stride)),
        np.asarray(re_.dit_inverse2(jnp.asarray(x), stride)))


def test_decomp_pack2_and_fused_delta_path(rng):
    """decomp_pack2 == gadget_decomp + pack_pairs_raw (l=2), and the
    fused dot_out_to_delta external step == the staged radix-4 step."""
    params = NuFHEParameters()
    tp = params.tgsw_params
    b = 16
    rot = rng.randint(-2**31, 2**31, (2 * re_.N, b)).astype(np.int32)
    dig = re_.gadget_decomp(jnp.asarray(rot), 2, tp.decomp_length,
                            tp.bs_log2_base, int(tp.offset))
    dv = np.asarray(dig).reshape(re_.M, 2, 2, re_.R, b)
    want = np.asarray(re_.pack_pairs_raw(
        jnp.asarray(dv[:, :, 0]), jnp.asarray(dv[:, :, 1]))).reshape(
        2 * re_.N, b)
    got = np.asarray(re_.decomp_pack2(
        jnp.asarray(rot), 2, tp.bs_log2_base, int(tp.offset)))
    assert np.array_equal(got, want)

    acc = jnp.asarray(rng.randint(-2**31, 2**31, (2048, b)).astype(np.int32))
    p = jnp.asarray(rng.randint(0, 2048, (1, b)).astype(np.int32))
    rhs = jnp.asarray(rng.randint(
        -128, 128, (re_.L, 2 * 4 * re_.R, 5 * 2 * re_.R)).astype(np.int8))
    kw = dict(mask1=2, decomp_length=tp.decomp_length,
              log2_base=tp.bs_log2_base, offset=int(tp.offset),
              mac_dtype=jnp.float32)
    assert np.array_equal(
        np.asarray(re_.external_step(acc, p, rhs, **kw)),
        np.asarray(re_.external_step(acc, p, rhs, radix8=False, **kw)))
