"""Device keygen vs the host numpy oracle — exact equality.

The device path (``ops/keygen.py``) must produce keys BIT-EQUAL to the
host reference path for the same RNG draws (the reference generates its
keys on the GPU: ``nufhe/tlwe_gpu.py:111-196``, ``nufhe/lwe_gpu.py:63-124``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import nufhe_tpu as nf
from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.ref import tlwe_ref, tgsw_ref, lwe_ref
from nufhe_tpu.ops import keygen as dkeygen
from nufhe_tpu.ops import tgsw as dtgsw
from nufhe_tpu.ops import transform as dtransform


def test_tlwe_encrypt_zero_device_matches_ref(rng):
    n_rows, mask_size, decomp, poly_n = 6, 2, 2, 1024
    key = rng.randint(0, 2, (mask_size, poly_n)).astype(np.int32)
    shape = (n_rows, mask_size + 1, decomp)
    noises1 = rng.randint(-2**31, 2**31,
                          shape + (mask_size, poly_n)).astype(np.int32)
    noises2 = rng.randint(-2**31, 2**31, shape + (poly_n,)).astype(np.int32)

    ref_a, _ = tlwe_ref.tlwe_encrypt_zero(key, noises1, noises2, 1e-9)
    w = jnp.asarray(dkeygen.negacyclic_key_matrix(key))
    dev_a = dkeygen.tlwe_encrypt_zero_device(
        w, jnp.asarray(noises1), jnp.asarray(noises2))
    assert np.array_equal(np.asarray(dev_a), ref_a)


def test_bootstrap_key_device_matches_ref(rng):
    params = NuFHEParameters()
    bk_params = params.tgsw_params
    mask_size = bk_params.tlwe_params.mask_size
    poly_n = bk_params.tlwe_params.polynomial_degree
    decomp = bk_params.decomp_length
    n_rows = 5
    key = rng.randint(0, 2, (mask_size, poly_n)).astype(np.int32)
    lwe_bits = rng.randint(0, 2, (n_rows,)).astype(np.int32)
    shape = (n_rows, mask_size + 1, decomp)
    noises1 = rng.randint(-2**31, 2**31,
                          shape + (mask_size, poly_n)).astype(np.int32)
    noises2 = rng.randint(-2**31, 2**31, shape + (poly_n,)).astype(np.int32)

    ref_a, _ = tlwe_ref.tlwe_encrypt_zero(key, noises1, noises2, 1e-9)
    ref_a = tgsw_ref.tgsw_add_message(ref_a, lwe_bits, bk_params)

    w = jnp.asarray(dkeygen.negacyclic_key_matrix(key))
    dev_a = dkeygen.bootstrap_key_device(
        w, jnp.asarray(lwe_bits), jnp.asarray(noises1),
        jnp.asarray(noises2), bk_params.base_powers)
    assert np.array_equal(np.asarray(dev_a), ref_a)


def test_make_keyswitch_key_device_matches_ref(rng):
    input_size, output_size, decomp, log2_base = 64, 48, 8, 2
    base = 2 ** log2_base
    in_key = rng.randint(0, 2, (input_size,)).astype(np.int32)
    out_key = rng.randint(0, 2, (output_size,)).astype(np.int32)
    noises_b = rng.randint(-2**31, 2**31,
                           (input_size, decomp, base - 1)).astype(np.int32)
    noises_a = rng.randint(
        -2**31, 2**31,
        (input_size, decomp, base - 1, output_size)).astype(np.int32)

    ref_a, ref_b, _ = lwe_ref.make_keyswitch_key(
        in_key, out_key, noises_a, noises_b, decomp, log2_base, 1e-9)
    dev_a, dev_b = dkeygen.make_keyswitch_key_device(
        in_key, out_key, noises_a, noises_b, decomp, log2_base)
    assert np.array_equal(np.asarray(dev_a), ref_a)
    assert np.array_equal(np.asarray(dev_b), ref_b)


@pytest.mark.parametrize("exact", [True, False])
def test_bootstrap_key_limbs_device_matches_host(rng, exact):
    # random torus polynomials incl. forced extreme values (carry edges)
    n_rows, mask1, decomp = 2, 2, 2
    bk = rng.randint(-2**31, 2**31,
                     (n_rows, mask1, decomp, mask1, 1024)).astype(np.int32)
    bk.reshape(-1)[:4] = [-2**31, 2**31 - 1, -1, 0]

    host_limbs = dtgsw.bootstrap_key_limbs_host(bk, exact=exact)
    host_pos, host_delta = dtransform.one_sided_limbs_host(host_limbs)
    dev_pos, dev_delta = dkeygen.bootstrap_key_limbs_device(
        jnp.asarray(bk), exact=exact, chunk=8)
    assert np.array_equal(np.asarray(dev_pos), host_pos)
    if exact:
        assert host_delta is None and dev_delta is None
    else:
        assert np.array_equal(np.asarray(dev_delta), host_delta)


@pytest.mark.parametrize("transform_type", ["NTT", "FFT"])
def test_make_key_pair_device_equals_host(transform_type):
    # reduced lwe_size keeps the CPU-backend run fast; the full-size BK
    # transform equality is covered by the limb test above
    kwargs = dict(transform_type=transform_type, lwe_size=40)
    rng1 = nf.DeterministicRNG(123)
    s1, c1 = nf.make_key_pair(rng1, on_device=False, **kwargs)
    rng2 = nf.DeterministicRNG(123)
    s2, c2 = nf.make_key_pair(rng2, on_device=True, **kwargs)
    assert s1 == s2
    assert np.array_equal(np.asarray(c1.keyswitch_key.ks_a),
                          np.asarray(c2.keyswitch_key.ks_a))
    assert np.array_equal(np.asarray(c1.keyswitch_key.ks_b),
                          np.asarray(c2.keyswitch_key.ks_b))
    # the coefficient-domain BK samples are identical...
    assert np.array_equal(np.asarray(c1.bootstrap_key.bk_coeff),
                          np.asarray(c2.bootstrap_key.bk_coeff))
    # ...and so is the transformed compact (serialized) form
    p1, d1 = c1.bootstrap_key.compact()
    p2, d2 = c2.bootstrap_key.compact()
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    if d1 is None:
        assert d2 is None
    else:
        assert np.array_equal(np.asarray(d1), np.asarray(d2))
    # the full cloud keys compare equal through the API-level __eq__
    assert c1 == c2
