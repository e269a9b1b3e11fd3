"""Encrypted integer operator tests (reference: test_gates.py:248-249)."""

import numpy as np
import pytest
import jax

import nufhe_tpu as nf


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    # Same XLA:CPU defect as tests/test_parallel.py: with a large
    # accumulated in-process compilation cache (e.g. after the --heavy
    # full-parameter gate programs), a later CPU compile can segfault in
    # backend_compile_and_load.  Start this module clean.
    jax.clear_caches()
    yield
from nufhe_tpu.models.integer import (
    uintarray_to_bitarray, bitarray_to_uintarray, uint_min)


def test_bit_helpers():
    xs = np.array([3, 200, 255, 0], np.uint8)
    bits = uintarray_to_bitarray(xs)
    assert bits.shape == (4, 8)
    assert np.array_equal(bitarray_to_uintarray(bits), xs)


def test_uint_min():
    rng = nf.DeterministicRNG(7)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([3, 9, 12], np.uint8)
    b_vals = np.array([5, 9, 7], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals)
    b_bits = uintarray_to_bitarray(b_vals)

    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)
    answer = nf.empty_ciphertext(cloud.params, a_bits.shape)

    uint_min(cloud, answer, ca, cb)

    got = bitarray_to_uintarray(nf.decrypt(secret, answer))
    assert np.array_equal(got, np.minimum(a_vals, b_vals))


def test_uint_add_and_compare():
    rng = nf.DeterministicRNG(8)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([3, 250], np.uint8)
    b_vals = np.array([5, 10], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals)
    b_bits = uintarray_to_bitarray(b_vals)

    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)

    from nufhe_tpu.models.integer import uint_add, uint_gt, uint_lt

    answer = nf.empty_ciphertext(cloud.params, a_bits.shape)
    uint_add(cloud, answer, ca, cb)
    got = bitarray_to_uintarray(nf.decrypt(secret, answer))
    assert np.array_equal(got, (a_vals + b_vals))  # uint8 wraps mod 256

    gt = nf.empty_ciphertext(cloud.params, (2, 1))
    uint_gt(cloud, gt, ca, cb)
    assert np.array_equal(
        nf.decrypt(secret, gt)[:, 0], a_vals > b_vals)

    lt = nf.empty_ciphertext(cloud.params, (2, 1))
    uint_lt(cloud, lt, ca, cb)
    assert np.array_equal(
        nf.decrypt(secret, lt)[:, 0], a_vals < b_vals)


def test_uint_max_sub_eq():
    from nufhe_tpu.models.integer import uint_max, uint_sub, uint_eq
    rng = nf.DeterministicRNG(9)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([13, 9], np.uint8)
    b_vals = np.array([5, 9], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals, itemsize=4)
    b_bits = uintarray_to_bitarray(b_vals, itemsize=4)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)

    ans = nf.empty_ciphertext(cloud.params, a_bits.shape)
    uint_max(cloud, ans, ca, cb)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.maximum(a_vals, b_vals) % 16)

    uint_sub(cloud, ans, ca, cb)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, (a_vals - b_vals) % 16)

    eq = nf.empty_ciphertext(cloud.params, a_bits.shape[:-1] + (1,))
    uint_eq(cloud, eq, ca, cb)
    got = nf.decrypt(secret, eq)[..., 0]
    assert np.array_equal(got, a_vals == b_vals)


def test_uint_mul():
    from nufhe_tpu.models.integer import uint_mul
    rng = nf.DeterministicRNG(10)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([13, 9, 7], np.uint8)
    b_vals = np.array([5, 9, 0], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals, itemsize=4)
    b_bits = uintarray_to_bitarray(b_vals, itemsize=4)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)

    ans = nf.empty_ciphertext(cloud.params, a_bits.shape)
    uint_mul(cloud, ans, ca, cb)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, (a_vals * b_vals) % 16)
