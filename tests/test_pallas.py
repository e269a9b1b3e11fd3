"""Pallas step-kernel plumbing (interpret mode; runs on the CPU backend).

The fused rows-layout CMUX kernel is the TPU production path; interpret
mode executes the same kernel logic (grid, block specs, aliasing) without
TPU hardware, checked bit-exactly against the reference composition.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.ref import tgsw_ref, polynomials_ref
from nufhe_tpu.ops import rows_engine as re_
from nufhe_tpu.ops import tgsw as dtgsw
from nufhe_tpu.ops.pallas import blind_rotate as pbr


def test_pallas_step_interpret_matches_oracle(rng):
    params = NuFHEParameters()
    tp = params.tgsw_params
    mask1 = 2
    b = 256          # two 128-lane grid cells
    accum = rng.randint(-2**31, 2**31, (b, mask1, 1024)).astype(np.int32)
    powers = rng.randint(0, 2 * 1024, (b,)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (1, mask1, tp.decomp_length, mask1, 1024)).astype(np.int32)
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)

    shifted = polynomials_ref.shift_polynomial(accum, powers, minus_one=True)
    want = accum + tgsw_ref.tgsw_external_mul(shifted, bk_coeff, 0, tp)

    step = pbr.make_external_step_rows(
        mask1, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        lane_tile=128, mac_dtype=jnp.float32, interpret=True)
    acc_rows = re_.acc_rows_from_n(jnp.asarray(accum))
    got_rows = step(acc_rows, jnp.asarray(powers)[None, :], bk_dev[0])
    got = np.asarray(re_.acc_n_from_rows(got_rows, mask1))
    assert np.array_equal(got, want)


def test_pallas_step_interpret_rounded_key(rng):
    """The fused step kernel with the rounded-key ('FFT' mode) rhs: the
    4-group/single-channel engine path inside the Pallas kernel, bit-exact
    vs the rounded oracle."""
    params = NuFHEParameters(transform_type='FFT')
    tp = params.tgsw_params
    mask1 = 2
    b = 128
    accum = rng.randint(-2**31, 2**31, (b, mask1, 1024)).astype(np.int32)
    powers = rng.randint(0, 2 * 1024, (b,)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (1, mask1, tp.decomp_length, mask1, 1024)).astype(np.int32)
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff, exact=False)

    shifted = polynomials_ref.shift_polynomial(accum, powers, minus_one=True)
    want = accum + tgsw_ref.tgsw_external_mul_rounded(shifted, bk_coeff, 0, tp)

    step = pbr.make_external_step_rows(
        mask1, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        lane_tile=128, mac_dtype=jnp.float32, interpret=True)
    acc_rows = re_.acc_rows_from_n(jnp.asarray(accum))
    got_rows = step(acc_rows, jnp.asarray(powers)[None, :], bk_dev[0])
    got = np.asarray(re_.acc_n_from_rows(got_rows, mask1))
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_pallas_chunked_rotation_interpret(rng):
    """The chunked multi-step launch (scalar-prefetch key indexing,
    VMEM-revisited accumulator) equals per-step composition bit-exactly."""
    params = NuFHEParameters()
    tp = params.tgsw_params
    mask1 = 2
    b = 128
    n_steps = 4
    accum = rng.randint(-2**31, 2**31, (b, mask1, 1024)).astype(np.int32)
    powers = rng.randint(0, 2 * 1024, (n_steps, b)).astype(np.int32)
    bk_coeff = rng.randint(
        -2**31, 2**31,
        (n_steps, mask1, tp.decomp_length, mask1, 1024)).astype(np.int32)
    bk_dev = dtgsw.prepare_bootstrap_key_device(bk_coeff)

    step = pbr.make_external_step_rows(
        mask1, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        lane_tile=128, mac_dtype=jnp.float32, interpret=True)
    acc_rows = re_.acc_rows_from_n(jnp.asarray(accum))
    want = acc_rows
    for i in range(n_steps):
        want = step(want, jnp.asarray(powers[i])[None, :], bk_dev[i])

    rot = pbr.make_blind_rotate_chunk(
        mask1, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        chunk=2, lane_tile=128, mac_dtype=jnp.float32, interpret=True)
    bara3 = jnp.asarray(powers).reshape(n_steps, 1, b)
    got = acc_rows
    for c in range(n_steps // 2):
        got = rot(got, bara3, bk_dev, c * 2)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pallas_keyswitch_interpret_matches_xla(rng):
    """The Pallas keyswitch MAC kernel (native int8 MXU path on TPU)
    against the XLA einsum formulation — identical totals, including the
    embedded nonzero-digit count column."""
    from nufhe_tpu.ops import lwe as dlwe
    from nufhe_tpu.ops.pallas import keyswitch as pks

    in_size, l, base, out_size = 64, 8, 4, 20
    rows = in_size * l
    ks_a = rng.randint(-2**31, 2**31, (in_size, l, base, out_size)
                       ).astype(np.int32)
    ks_a[:, :, 0] = 0
    ks_b = rng.randint(-2**31, 2**31, (in_size, l, base)).astype(np.int32)
    ks_b[:, :, 0] = 0
    ks_cv = np.full((in_size, l, base), 3e-9, np.float32)
    ks_cv[:, :, 0] = 0
    arrays, meta = dlwe.prepare_keyswitch_device(ks_a, ks_b, ks_cv, 2)

    bsz = 256
    a2 = jnp.asarray(rng.randint(-2**31, 2**31, (bsz, in_size)
                                 ).astype(np.int32))
    got = np.asarray(pks.keyswitch_mac(
        a2, arrays["ab_limbs"], meta, lane_tile=128, interpret=True))

    # XLA formulation (the CPU-path branch of lwe_keyswitch)
    prec = jnp.int32(2 ** (32 - (1 + 2 * l)))
    dmask = jnp.int32(3)
    shifted = a2 + prec
    digits = jnp.concatenate(
        [((shifted >> (32 - (j + 1) * 2)) & dmask) for j in range(l)],
        axis=-1).astype(jnp.int8)
    total = 0
    for v in range(1, base):
        m = (digits == v).astype(jnp.int8)
        for limb in range(dlwe.KS_LIMBS):
            p = jnp.einsum('br,rn->bn', m, arrays["ab_limbs"][v - 1, limb],
                           preferred_element_type=jnp.int32)
            total = total + (p << (dlwe.KS_LIMB_BITS * limb))
    want = np.asarray(total)
    assert np.array_equal(got, want)
    # the count column equals the number of nonzero digits per sample
    counts = np.asarray((digits != 0).sum(axis=-1))
    assert np.array_equal(got[:, out_size + 1], counts)
