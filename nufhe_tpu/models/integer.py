"""Encrypted integer operators.

``uint_min`` and the bit<->uint helpers mirror the reference
(``nufhe/operators_integer.py``); the ripple-carry adder and the
comparators extend the family (BASELINE config 3: 8-bit encrypted
adder/comparator circuits built from chained bootstraps).

Integers are big-endian bit arrays (index 0 = MSB), one ciphertext bit per
encrypted bit, with a leading batch axis.
"""

import numpy as np

from ..api import empty_ciphertext
from .gates import (
    gate_constant, gate_xnor, gate_xor, gate_and, gate_mux)


def _uint_to_bits(x, bitsize):
    return np.array([((int(x) >> i) & 1 != 0) for i in reversed(range(bitsize))])


def _bits_to_uint(bits, dtype):
    int_answer = 0
    for i in range(bits.size):
        int_answer = int_answer | (int(bits[i]) << (bits.size - i - 1))
    return dtype(int_answer)


def uintarray_to_bitarray(xs, itemsize=None):
    """Unsigned integer array -> big-endian bit array (extra trailing axis)."""
    xs = np.asarray(xs)
    if itemsize is None:
        itemsize = xs.itemsize * 8
    assert np.issubdtype(xs.dtype, np.unsignedinteger)
    res = np.vstack([_uint_to_bits(x, itemsize) for x in xs.flatten()])
    return res.reshape(xs.shape + (itemsize,))


def bitarray_to_uintarray(xs):
    """Big-endian bit array -> unsigned integer array (drops last axis).
    Widths that are not a power-of-two byte size use the next wider dtype."""
    xs = np.asarray(xs)
    itemsize = xs.shape[-1]
    dtype = next((dt for width, dt in ((8, np.uint8), (16, np.uint16),
                                       (32, np.uint32), (64, np.uint64))
                  if itemsize <= width), None)
    if dtype is None:
        raise ValueError("bit width %d exceeds 64" % itemsize)
    flat = xs.reshape(-1, itemsize)
    ints = [_bits_to_uint(flat[j], dtype) for j in range(flat.shape[0])]
    return np.array(ints).reshape(xs.shape[:-1])


def uint_min(cloud_key, answer, a, b, perf_params=None):
    """Encrypted minimum of two unsigned integers (big-endian bit arrays).

    The reference's example composite circuit: a bit-serial comparator built
    from XNOR + MUX, then a final MUX selecting the smaller operand.
    Reference: ``nufhe/operators_integer.py:64-95``.
    """
    params = cloud_key.params
    itemsize = answer.shape[-1]

    tmp1 = empty_ciphertext(params, a.shape[:-1] + (1,))
    tmp2 = empty_ciphertext(params, a.shape[:-1] + (1,))

    # carry = 0
    gate_constant(cloud_key, tmp1, False)

    # Compare bit i (MSB-first): if (a_i == b_i) keep carry else take a_i.
    for i in reversed(range(itemsize)):
        a_slice = a[:, i:i + 1]
        b_slice = b[:, i:i + 1]
        gate_xnor(cloud_key, tmp2, a_slice, b_slice, perf_params=perf_params)
        gate_mux(cloud_key, tmp1, tmp2, tmp1, a_slice, perf_params=perf_params)

    # carry == 0 -> a is smaller: answer = carry ? b : a
    gate_mux(cloud_key, answer, tmp1, b, a, perf_params=perf_params)
    return answer


def _compare_ladder(cloud_key, x, y, perf_params=None):
    """Bit-serial comparison carry: returns an encrypted bit = [x > y].

    At the highest differing bit position the carry becomes x_i; if all
    bits are equal it stays 0.  (The same XNOR+MUX ladder as ``uint_min``.)
    """
    params = cloud_key.params
    itemsize = x.shape[-1]
    carry = empty_ciphertext(params, x.shape[:-1] + (1,))
    tmp = empty_ciphertext(params, x.shape[:-1] + (1,))
    gate_constant(cloud_key, carry, False)
    for i in reversed(range(itemsize)):
        x_slice = x[..., i:i + 1]
        y_slice = y[..., i:i + 1]
        gate_xnor(cloud_key, tmp, x_slice, y_slice, perf_params=perf_params)
        gate_mux(cloud_key, carry, tmp, carry, x_slice,
                 perf_params=perf_params)
    return carry


def uint_gt(cloud_key, answer, a, b, perf_params=None):
    """answer = encrypted bit [a > b] (shape (..., 1))."""
    carry = _compare_ladder(cloud_key, a, b, perf_params=perf_params)
    from .gates import gate_copy
    gate_copy(cloud_key, answer, carry)
    return answer


def uint_lt(cloud_key, answer, a, b, perf_params=None):
    """answer = encrypted bit [a < b] (shape (..., 1))."""
    carry = _compare_ladder(cloud_key, b, a, perf_params=perf_params)
    from .gates import gate_copy
    gate_copy(cloud_key, answer, carry)
    return answer


def uint_add(cloud_key, answer, a, b, perf_params=None):
    """Encrypted ripple-carry addition (mod 2^itemsize).

    Per bit (LSB to MSB):
        sum_i   = a_i XOR b_i XOR carry
        carry'  = (a_i XOR b_i) ? carry : a_i      (majority via MUX)
    Each bit costs two bootstrapped gates plus one double-bootstrap MUX.
    """
    params = cloud_key.params
    itemsize = answer.shape[-1]

    p = empty_ciphertext(params, a.shape[:-1] + (1,))       # a_i XOR b_i
    s = empty_ciphertext(params, a.shape[:-1] + (1,))       # sum bit
    carry = empty_ciphertext(params, a.shape[:-1] + (1,))
    gate_constant(cloud_key, carry, False)

    for i in reversed(range(itemsize)):  # LSB (last index) to MSB
        a_slice = a[..., i:i + 1]
        b_slice = b[..., i:i + 1]
        gate_xor(cloud_key, p, a_slice, b_slice, perf_params=perf_params)
        gate_xor(cloud_key, s, p, carry, perf_params=perf_params)
        answer[..., i:i + 1] = s
        # carry_out = p ? carry : a_i
        gate_mux(cloud_key, carry, p, carry, a_slice, perf_params=perf_params)
    return answer


def uint_mul(cloud_key, answer, a, b, perf_params=None):
    """Encrypted multiplication a * b (mod 2^itemsize): shift-and-add.

    For each bit j of ``b`` (LSB first) one batched AND masks the shifted
    operand a << j (the single b bit broadcasts over the w-j surviving
    product bits), which a ripple adder accumulates into the top w-j bits
    of the result; carries past the MSB drop (mod 2^w).  Gate count:
    w batched ANDs + ~3/2 w^2 single-bit bootstrapped gates.
    """
    params = cloud_key.params
    w = answer.shape[-1]

    acc = empty_ciphertext(params, answer.shape)
    p = empty_ciphertext(params, a.shape[:-1] + (1,))
    s = empty_ciphertext(params, a.shape[:-1] + (1,))
    carry = empty_ciphertext(params, a.shape[:-1] + (1,))

    # j = 0: acc = a AND b_lsb (no adder needed on a zero accumulator)
    gate_and(cloud_key, acc, a, b[..., w - 1:w], perf_params=perf_params)

    for j in range(1, w):  # b bit at LSB offset j = array index w-1-j
        width = w - j
        masked = empty_ciphertext(params, a.shape[:-1] + (width,))
        gate_and(cloud_key, masked, a[..., j:], b[..., w - 1 - j:w - j],
                 perf_params=perf_params)
        # acc[..., :width] += masked, LSB (index width-1) up to the MSB
        gate_constant(cloud_key, carry, False)
        for i in reversed(range(width)):
            acc_i = acc[..., i:i + 1]
            gate_xor(cloud_key, p, acc_i, masked[..., i:i + 1],
                     perf_params=perf_params)
            gate_xor(cloud_key, s, p, carry, perf_params=perf_params)
            if i > 0:  # carry out of the MSB is dropped
                # carry' = p ? carry : acc_i — BEFORE acc_i is overwritten
                gate_mux(cloud_key, carry, p, carry, acc_i,
                         perf_params=perf_params)
            acc[..., i:i + 1] = s
    from .gates import gate_copy
    gate_copy(cloud_key, answer, acc)
    return answer


def uint_max(cloud_key, answer, a, b, perf_params=None):
    """Encrypted maximum of two unsigned integers (big-endian bit arrays):
    the same comparison ladder as ``uint_min`` with the final selection
    flipped."""
    carry = _compare_ladder(cloud_key, a, b, perf_params=perf_params)
    # carry == 1 -> a > b: answer = carry ? a : b
    gate_mux(cloud_key, answer, carry, a, b, perf_params=perf_params)
    return answer


def uint_eq(cloud_key, answer, a, b, perf_params=None):
    """answer = encrypted bit [a == b] (shape (..., 1)): AND-reduction of
    per-bit XNORs."""
    params = cloud_key.params
    itemsize = a.shape[-1]
    acc = empty_ciphertext(params, a.shape[:-1] + (1,))
    tmp = empty_ciphertext(params, a.shape[:-1] + (1,))
    gate_xnor(cloud_key, acc, a[..., 0:1], b[..., 0:1],
              perf_params=perf_params)
    for i in range(1, itemsize):
        gate_xnor(cloud_key, tmp, a[..., i:i + 1], b[..., i:i + 1],
                  perf_params=perf_params)
        gate_and(cloud_key, acc, acc, tmp, perf_params=perf_params)
    from .gates import gate_copy
    gate_copy(cloud_key, answer, acc)
    return answer


def uint_sub(cloud_key, answer, a, b, perf_params=None):
    """Encrypted subtraction a - b (mod 2^itemsize): ripple over
    a + NOT(b) with carry-in 1.

    Per bit: p = a XOR NOT(b) = XNOR(a, b); sum = p XOR carry;
    carry' = p ? carry : a_i.
    """
    params = cloud_key.params
    itemsize = answer.shape[-1]

    p = empty_ciphertext(params, a.shape[:-1] + (1,))
    s = empty_ciphertext(params, a.shape[:-1] + (1,))
    carry = empty_ciphertext(params, a.shape[:-1] + (1,))
    gate_constant(cloud_key, carry, True)

    for i in reversed(range(itemsize)):  # LSB (last index) to MSB
        a_slice = a[..., i:i + 1]
        b_slice = b[..., i:i + 1]
        gate_xnor(cloud_key, p, a_slice, b_slice, perf_params=perf_params)
        gate_xor(cloud_key, s, p, carry, perf_params=perf_params)
        answer[..., i:i + 1] = s
        gate_mux(cloud_key, carry, p, carry, a_slice, perf_params=perf_params)
    return answer
