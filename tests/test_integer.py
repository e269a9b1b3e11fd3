"""Encrypted integer operator tests (reference: test_gates.py:248-249)."""

import numpy as np
import pytest
import jax

import nufhe_tpu as nf


@pytest.fixture(autouse=True)
def _fresh_caches():
    # Same XLA:CPU defect as tests/test_parallel.py: with a large
    # accumulated in-process compilation cache, a later CPU compile can
    # segfault in backend_compile_and_load.  The integer circuits compile
    # many distinct shapes (more since parallel=None auto-select routes
    # small batches through the Kogge-Stone forms), so clear per TEST.
    jax.clear_caches()
    yield
from nufhe_tpu.models.integer import (
    uintarray_to_bitarray, bitarray_to_uintarray, uint_min)


def test_bit_helpers():
    xs = np.array([3, 200, 255, 0], np.uint8)
    bits = uintarray_to_bitarray(xs)
    assert bits.shape == (4, 8)
    assert np.array_equal(bitarray_to_uintarray(bits), xs)


def test_uint_min(transform_type):
    """The reference's one integer circuit, over BOTH engine modes (the
    rounded-key 'FFT' mode chains ~50 bootstraps here — a real noise-
    accumulation check for the rounded engine)."""
    rng = nf.DeterministicRNG(7)
    secret, cloud = nf.make_key_pair(
        rng, lwe_size=16, transform_type=transform_type)

    a_vals = np.array([3, 9, 12], np.uint8)
    b_vals = np.array([5, 9, 7], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals)
    b_bits = uintarray_to_bitarray(b_vals)

    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)
    answer = nf.empty_ciphertext(cloud.params, a_bits.shape)

    uint_min(cloud, answer, ca, cb, parallel=False)

    got = bitarray_to_uintarray(nf.decrypt(secret, answer))
    assert np.array_equal(got, np.minimum(a_vals, b_vals))


@pytest.mark.slow
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
    uint_add(cloud, answer, ca, cb, parallel=False)
    got = bitarray_to_uintarray(nf.decrypt(secret, answer))
    assert np.array_equal(got, (a_vals + b_vals))  # uint8 wraps mod 256

    gt = nf.empty_ciphertext(cloud.params, (2, 1))
    uint_gt(cloud, gt, ca, cb, parallel=False)
    assert np.array_equal(
        nf.decrypt(secret, gt)[:, 0], a_vals > b_vals)

    lt = nf.empty_ciphertext(cloud.params, (2, 1))
    uint_lt(cloud, lt, ca, cb, parallel=False)
    assert np.array_equal(
        nf.decrypt(secret, lt)[:, 0], a_vals < b_vals)


@pytest.mark.slow
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
    uint_max(cloud, ans, ca, cb, parallel=False)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.maximum(a_vals, b_vals) % 16)

    uint_sub(cloud, ans, ca, cb, parallel=False)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, (a_vals - b_vals) % 16)

    eq = nf.empty_ciphertext(cloud.params, a_bits.shape[:-1] + (1,))
    uint_eq(cloud, eq, ca, cb)
    got = nf.decrypt(secret, eq)[..., 0]
    assert np.array_equal(got, a_vals == b_vals)


@pytest.mark.slow
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
    uint_mul(cloud, ans, ca, cb, parallel=False)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, (a_vals * b_vals) % 16)


@pytest.mark.slow
def test_parallel_prefix_variants():
    """Kogge-Stone adders/comparators agree with plaintext arithmetic.

    The parallel circuits share no code path with the ripple versions
    (associative (g, p) scans over batched gate calls), so each operator
    is decrypt-checked independently, including carry chains that span
    the full width (255 + 1, 0 - 1) and the w=5 odd-width scan.
    """
    # the XLA:CPU accumulated-cache segfault (see _fresh_caches) bites
    # mid-module too: the scan circuits compile many distinct shapes
    jax.clear_caches()
    rng = nf.DeterministicRNG(11)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    from nufhe_tpu.models.integer import (
        uint_add, uint_sub, uint_gt, uint_lt, uint_min, uint_max)

    a_vals = np.array([3, 250, 255, 0, 129], np.uint8)
    b_vals = np.array([5, 10, 1, 1, 129], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals)
    b_bits = uintarray_to_bitarray(b_vals)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)
    n = a_vals.size

    ans = nf.empty_ciphertext(cloud.params, a_bits.shape)
    uint_add(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, a_vals + b_vals)  # uint8 wraps mod 256

    uint_sub(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, a_vals - b_vals)

    uint_min(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.minimum(a_vals, b_vals))

    uint_max(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.maximum(a_vals, b_vals))

    bit = nf.empty_ciphertext(cloud.params, (n, 1))
    uint_gt(cloud, bit, ca, cb, parallel=True)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals > b_vals)
    uint_lt(cloud, bit, ca, cb, parallel=True)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals < b_vals)

    # odd width exercises the leftover lanes of the scan and the eq tree
    jax.clear_caches()
    a5 = np.array([18, 7, 31], np.uint8)
    b5 = np.array([13, 7, 0], np.uint8)
    ca5 = nf.encrypt(rng, secret, uintarray_to_bitarray(a5, itemsize=5))
    cb5 = nf.encrypt(rng, secret, uintarray_to_bitarray(b5, itemsize=5))
    ans5 = nf.empty_ciphertext(cloud.params, (3, 5))
    uint_add(cloud, ans5, ca5, cb5, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans5))
    assert np.array_equal(got, (a5 + b5) % 32)

    from nufhe_tpu.models.integer import uint_eq
    eq5 = nf.empty_ciphertext(cloud.params, (3, 1))
    uint_eq(cloud, eq5, ca5, cb5)
    assert np.array_equal(nf.decrypt(secret, eq5)[:, 0], a5 == b5)


@pytest.mark.slow
def test_uint_mul_parallel():
    from nufhe_tpu.models.integer import uint_mul
    jax.clear_caches()
    rng = nf.DeterministicRNG(12)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([13, 9, 15], np.uint8)
    b_vals = np.array([5, 9, 15], np.uint8)
    a_bits = uintarray_to_bitarray(a_vals, itemsize=4)
    b_bits = uintarray_to_bitarray(b_vals, itemsize=4)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)

    ans = nf.empty_ciphertext(cloud.params, a_bits.shape)
    uint_mul(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_uintarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, (a_vals * b_vals) % 16)


@pytest.mark.slow
def test_vm_uint_dispatch():
    """VirtualMachine.uint_* allocates the right result shapes and routes
    kwargs (parallel=) through to the integer circuits."""
    jax.clear_caches()
    rng = nf.DeterministicRNG(13)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)
    vm = nf.VirtualMachine(cloud)

    a_vals = np.array([9, 4], np.uint8)
    b_vals = np.array([3, 12], np.uint8)
    ca = nf.encrypt(rng, secret, uintarray_to_bitarray(a_vals, itemsize=4))
    cb = nf.encrypt(rng, secret, uintarray_to_bitarray(b_vals, itemsize=4))

    out = vm.uint_add(ca, cb, parallel=True)
    assert out.shape == (2, 4)
    got = bitarray_to_uintarray(nf.decrypt(secret, out))
    assert np.array_equal(got, (a_vals + b_vals) % 16)

    bit = vm.uint_gt(ca, cb)
    assert bit.shape == (2, 1)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals > b_vals)

    # operands broadcast before entering the circuits ((1, w) x (2, w)),
    # and uint_eq accepts the uniform parallel= kwarg
    one = nf.encrypt(rng, secret,
                     uintarray_to_bitarray(np.array([9], np.uint8),
                                           itemsize=4))
    out = vm.uint_sub(one, cb, parallel=True)
    assert out.shape == (2, 4)
    got = bitarray_to_uintarray(nf.decrypt(secret, out))
    assert np.array_equal(got, (9 - b_vals) % 16)
    eq = vm.uint_eq(one, ca, parallel=True)
    assert eq.shape == (2, 1)
    assert np.array_equal(nf.decrypt(secret, eq)[:, 0], a_vals == 9)


@pytest.mark.slow
def test_signed_operators():
    """Two's-complement family: comparisons via the sign-flip reduction,
    negation via the suffix-AND carry scan, add identical to unsigned."""
    from nufhe_tpu.models.integer import (
        int_add, int_neg, int_gt, int_lt, int_min, int_max, int_eq,
        intarray_to_bitarray, bitarray_to_intarray)
    jax.clear_caches()
    rng = nf.DeterministicRNG(14)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([-8, -1, 3, 7, -3], np.int8)
    b_vals = np.array([5, -1, -4, 7, -2], np.int8)
    a_bits = intarray_to_bitarray(a_vals, itemsize=4)
    b_bits = intarray_to_bitarray(b_vals, itemsize=4)
    assert np.array_equal(bitarray_to_intarray(a_bits), a_vals)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)
    n = a_vals.size

    def wrap4(x):  # signed 4-bit wraparound
        return ((np.asarray(x, np.int64) + 8) % 16 - 8).astype(np.int8)

    ans = nf.empty_ciphertext(cloud.params, a_bits.shape)
    int_add(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_intarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, wrap4(a_vals.astype(np.int64) + b_vals))

    int_neg(cloud, ans, ca)
    got = bitarray_to_intarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, wrap4(-a_vals.astype(np.int64)))

    int_min(cloud, ans, ca, cb, parallel=True)
    got = bitarray_to_intarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.minimum(a_vals, b_vals))

    int_max(cloud, ans, ca, cb)
    got = bitarray_to_intarray(nf.decrypt(secret, ans))
    assert np.array_equal(got, np.maximum(a_vals, b_vals))

    bit = nf.empty_ciphertext(cloud.params, (n, 1))
    int_gt(cloud, bit, ca, cb, parallel=True)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals > b_vals)
    int_lt(cloud, bit, ca, cb)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals < b_vals)
    int_eq(cloud, bit, ca, cb)
    assert np.array_equal(nf.decrypt(secret, bit)[:, 0], a_vals == b_vals)

    # VM dispatch covers the signed names too (int_gt is a bit result)
    vm = nf.VirtualMachine(cloud)
    out = vm.int_gt(ca, cb)
    assert out.shape == (n, 1)
    assert np.array_equal(nf.decrypt(secret, out)[:, 0], a_vals > b_vals)


@pytest.mark.slow
def test_uint_divmod():
    """Restoring division (w=4, serial and parallel comparator), including
    the all-ones quotient convention for an encrypted zero divisor."""
    from nufhe_tpu.models.integer import uint_divmod
    jax.clear_caches()
    rng = nf.DeterministicRNG(15)
    secret, cloud = nf.make_key_pair(rng, lwe_size=16)

    a_vals = np.array([13, 7, 9, 5], np.uint8)
    b_vals = np.array([3, 7, 2, 0], np.uint8)
    ca = nf.encrypt(rng, secret, uintarray_to_bitarray(a_vals, itemsize=4))
    cb = nf.encrypt(rng, secret, uintarray_to_bitarray(b_vals, itemsize=4))

    q = nf.empty_ciphertext(cloud.params, (4, 4))
    r = nf.empty_ciphertext(cloud.params, (4, 4))
    uint_divmod(cloud, q, r, ca, cb, parallel=True)
    got_q = bitarray_to_uintarray(nf.decrypt(secret, q))
    got_r = bitarray_to_uintarray(nf.decrypt(secret, r))
    exp_q = np.array([4, 1, 4, 15], np.uint8)   # 5 // 0 -> 15 by convention
    exp_r = np.array([1, 0, 1, 5], np.uint8)
    assert np.array_equal(got_q, exp_q), got_q
    assert np.array_equal(got_r, exp_r), got_r

    # serial comparator path + the single-output wrappers through the VM
    vm = nf.VirtualMachine(cloud)
    d = vm.uint_div(ca, cb)
    assert np.array_equal(
        bitarray_to_uintarray(nf.decrypt(secret, d)), exp_q)
    m = vm.uint_mod(ca, cb)
    assert np.array_equal(
        bitarray_to_uintarray(nf.decrypt(secret, m)), exp_r)
