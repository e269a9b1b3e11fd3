"""Flat-layout exact transform engine: the blind-rotate step as pure
lane-roll/select/matmul operations on 2D ``(rows, lanes)`` arrays.

This is the Mosaic-friendly formulation of ``ops/transform.py``'s
mathematics, designed so the identical jnp code runs under jit/XLA *and*
inside a Pallas TPU kernel (``ops/pallas``):

- **No gathers, no trailing-dim reshapes, no sublane-padded 3D blocks.**
  Everything is a whole-array ``jnp.roll`` along the lane axis combined with
  iota-mask selects; region-crossing artifacts of flat rolls are repaired by
  a second roll selected on the wrapped lanes.
- **q-layout**: polynomial coefficient ``n = i*32 + j`` lives at lane
  ``q = j*32 + i`` (j = Nussbaumer slot, i = S' lane).  In this layout the
  negacyclic monomial rotation X^p factors into lane-local block rotations
  (X^{32k} = rotate the i-axis, X^{k} = roll whole j-blocks + carry), so the
  barrel shifter is 11 rounds of static rolls + per-row selects.
- **DIF forward / DIT inverse**: the forward DFT over S' is
  decimation-in-frequency (natural input, bit-reversed slot output) and the
  inverse is decimation-in-time (bit-reversed slot input, natural output),
  so *no bit-reversal permutation exists anywhere* — the bootstrap key's
  L axis is simply stored in bit-reversed slot order
  (``ops/transform.py::build_mac_rhs(bitrev_order=True)``).
- twiddles Y^{c*m} (m = butterfly index) are applied via the binary
  decomposition of m: sub-round b rolls by Y^{c*2^b} and selects on bit b
  of the lane's m — whole-array ops only.

Validated bit-exactly against ``ref/transform_ref.py`` (tests/test_flat.py).
Reference analogue: the fused single-kernel bootstrap
``nufhe/blind_rotate.mako`` (shared-memory NTT + MAC + accumulation).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ref import transform_ref as tr

N = tr.N
M = tr.M
R = tr.R
L = tr.L
LOG_L = tr.LOG_L
INV_SHIFT = tr.INV_SHIFT
SHIFT_GROUPS_PAD = 5     # MAC output groups [B, A0..A3] (all live; Q = 320)


def _lane(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)


def _roll(x, k):
    """Cyclic roll right by k along the lane axis."""
    return jnp.roll(x, k, axis=-1)


def roll_region(x, k, region):
    """Cyclic roll right by k *within* each `region`-lane region.

    Lanes whose (lane % region) < k would receive the neighbouring region's
    data from a flat roll; they are repaired with the (k - region) roll,
    which reads the same region's top.
    """
    k = k % region
    if k == 0:
        return x
    return jnp.where((_lane(x) % region) >= k,
                     _roll(x, k), _roll(x, k - region))


def rot_block(x, e):
    """Negacyclic rotation by Y^e within each 32-lane block (e static,
    any integer; Y^32 = -1)."""
    e = e % (2 * R)
    if e >= R:
        x, e = -x, e - R
    if e == 0:
        return x
    return jnp.where((_lane(x) % R) >= e,
                     _roll(x, e), -_roll(x, e - R))


def q_from_n(x):
    """(..., 1024) coefficient order n = i*32+j -> q-layout q = j*32+i.
    XLA-level transpose; used only at blind-rotate entry/exit."""
    v = x.reshape(x.shape[:-1] + (R, M))
    return jnp.swapaxes(v, -1, -2).reshape(x.shape)


n_from_q = q_from_n  # the (i, j) swap is an involution


def rotate_q(x, p, minus_one=False, region=N):
    """X^p * x in q-layout, per-row power.

    :param x: (rows, C*1024) int32, C concatenated polynomials in q-layout.
    :param p: (rows, 1) int32 in [0, 2N); broadcasts over lanes.
    :param minus_one: compute (X^p - 1) * x.
    """
    lane = _lane(x)
    j_idx = (lane % region) // R
    out = x
    # bits 0..4: X^(2^b): roll whole j-blocks within each polynomial,
    # wrapped blocks get the i-axis carry rotation (X^{32} with sign).
    for b in range(5):
        k = 1 << b
        rolled = roll_region(out, R * k, region)
        fixed = jnp.where(j_idx < k, rot_block(rolled, 1), rolled)
        bit = ((p >> b) & 1) != 0
        out = jnp.where(bit, fixed, out)
    # bits 5..9: X^(32*2^b) = negacyclic i-axis rotation
    for b in range(5, 10):
        k = 1 << (b - 5)
        bit = ((p >> b) & 1) != 0
        out = jnp.where(bit, rot_block(out, k), out)
    # bit 10: X^1024 = -1
    bit = ((p >> 10) & 1) != 0
    out = jnp.where(bit, -out, out)
    if minus_one:
        out = out - x
    return out.astype(jnp.int32)


def _twiddle(x, step, h, region):
    """Apply Y^(step * m) per lane, m = ((lane % region) // R) % h.
    Binary decomposition of m: sub-round b rolls by Y^(step * 2^b) and
    selects on bit b of m."""
    if h <= 1:
        return x
    m = ((_lane(x) % region) // R) % h
    for b in range(h.bit_length() - 1):
        e = (step * (1 << b)) % (2 * R)
        if e == 0:
            continue
        x = jnp.where((m >> b) & 1 != 0, rot_block(x, e), x)
    return x


def dif_forward_q(dig, n_poly=1):
    """Forward L-point DIF DFT over S' of zero-padded strided blocks.

    :param dig: (rows, n_poly*1024) int32 q-layout polynomials
        (|values| <= 2^25 for int32 exactness).
    :returns: (rows, n_poly*2048) int32; within each 2048-lane region, slot
        p (32 lanes each) holds a-hat[bitrev_6(p)].
    """
    # stage h=32 on the zero-padded input: lo' = A + 0; hi' = Y^m (A - 0)
    hi = _twiddle(dig, 1, M, region=N)
    parts = []
    for g in range(n_poly):
        sl = slice(g * N, (g + 1) * N)
        parts += [dig[..., sl], hi[..., sl]]
    x = jnp.concatenate(parts, axis=-1)          # (rows, n_poly*2048)
    # stages h = 16..1
    for h in (16, 8, 4, 2, 1):
        d = h * R
        step = L // (2 * h)
        lane = _lane(x)
        is_lo = (lane % (2 * d)) < d
        partner = _roll(x, -d)                   # value at +d (valid at lo)
        tw = _twiddle(x - partner, step, h, region=2 * N)
        x = jnp.where(is_lo, x + partner, _roll(tw, d))
    return x


def dit_inverse_q(x, n_poly=1):
    """Inverse (unscaled) L-point DIT DFT over S' + fold, per 2048-region.

    :param x: (rows, n_poly*2048) int32, bit-reversed slot order (as
        produced by the MAC over ``dif_forward_q`` outputs).
    :returns: (rows, n_poly*1024) int32 q-layout (holds L * c values).
    """
    for s in range(LOG_L):
        mmax = 1 << s
        d = mmax * R
        step = -(1 << (LOG_L - s - 1))
        lane = _lane(x)
        is_lo = (lane % (2 * d)) < d
        tw = _twiddle(_roll(x, -d), step, mmax, region=2 * N)
        x = jnp.where(is_lo, x + tw, _roll(x - tw, d))
    # fold C_j = P_j + Y * P_{j+M} within each region
    parts = []
    for g in range(n_poly):
        first = x[..., g * 2 * N: g * 2 * N + N]
        second = x[..., g * 2 * N + N: (g + 1) * 2 * N]
        parts.append(first + rot_block(second, 1))
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def normalize_dual(a, b_):
    """(A, B) inverse outputs -> exact c = A + (B >> 6) mod 2^32.
    B is divisible by 2^6 over Z (B = 64c - 2^6*A), so the arithmetic
    shift is exact division; A's i32 wraparound is mod-2^32 by design.
    Rounded-key mode (b_ is None): c = A directly."""
    if b_ is None:
        return a.astype(jnp.int32)
    return (a + (b_ >> INV_SHIFT)).astype(jnp.int32)


def gadget_decomp_flat(rot, mask1, decomp_length, log2_base, offset):
    """(rows, mask1*1024) -> (rows, G*1024) signed digits, G-major
    g = mask*decomp_length + j."""
    base_half = 1 << (log2_base - 1)
    mask = (1 << log2_base) - 1
    shifted = rot + jnp.int32(offset)
    parts = []
    for m in range(mask1):
        sl = shifted[..., m * N:(m + 1) * N]
        for j in range(decomp_length):
            sh = 32 - (j + 1) * log2_base
            parts.append(((sl >> sh) & mask) - base_half)
    return jnp.concatenate(parts, axis=-1).astype(jnp.int32)


def external_mul_flat(sample_q, rhs_row, *, mask1, decomp_length, log2_base,
                      offset, mac_dtype=jnp.int8, axis_name=None):
    """BK_row (x) decomp(sample): the transformed external product.

    Pure jnp on 2D arrays — runs identically under jit/XLA and inside a
    Pallas kernel (except ``axis_name``, XLA-only).

    :param sample_q: (rows, mask1*1024) int32, q-layout TLWE sample.
    :param rhs_row: (L, C_local, Q) int8, C = G_local*2R, Q = 5*mask1*R,
        slot-ordered (bitrev) L axis; from ``transform.build_mac_rhs``.
    :param axis_name: tensor-parallel mesh axis: the local rhs holds a
        contiguous g-block slice; each shard transforms only its digit
        slice and the dual-channel MAC outputs are psum-reduced before the
        inverse transform.
    :returns: (rows, mask1*1024) int32 q-layout product.
    """
    g_total = mask1 * decomp_length
    c_size, q_size = rhs_row.shape[-2], rhs_row.shape[-1]
    o_r = mask1 * R

    digits = gadget_decomp_flat(
        sample_q, mask1, decomp_length, log2_base, offset)
    if axis_name is not None:
        g_local = c_size // (2 * R)
        start = jax.lax.axis_index(axis_name) * (g_local * N)
        digits = jax.lax.dynamic_slice_in_dim(
            digits, start, g_local * N, axis=-1)
        g_total = g_local
    return transformed_mac_flat(
        digits, rhs_row, mask1=mask1, g_total=g_total, mac_dtype=mac_dtype,
        axis_name=axis_name)


def transformed_mac_flat(digits, rhs_row, *, mask1, g_total,
                         mac_dtype=jnp.int8, axis_name=None):
    """sum_g digits_g * key_g: DIF forward, per-slot MXU matmuls,
    dual-channel recombination, DIT inverse, normalization.

    :param digits: (rows, g_total*1024) int32 q-layout, |values| <= 2^9.
    :returns: (rows, mask1*1024) int32 q-layout exact product mod 2^32.
    """
    c_size, q_size = rhs_row.shape[-2], rhs_row.shape[-1]
    o_r = mask1 * R
    xt = dif_forward_q(digits, n_poly=g_total)   # (rows, G*2048)

    a0 = ((xt + 128) & 255) - 128
    a1 = (xt - a0) >> 8
    a0 = a0.astype(mac_dtype)
    a1 = a1.astype(mac_dtype)

    from .transform import mac_accum_dtype
    lo_parts = [[] for _ in range(mask1)]
    hi_parts = [[] for _ in range(mask1)]
    for t in range(L):
        lhs_chunks = []
        for g in range(g_total):
            sl = slice(g * 2 * N + t * R, g * 2 * N + t * R + R)
            lhs_chunks += [a0[..., sl], a1[..., sl]]
        lhs_t = jnp.concatenate(lhs_chunks, axis=-1)      # (rows, C)
        rhs_t = rhs_row[t].astype(mac_dtype)              # (C, Q), pre-signed
        out_t = jax.lax.dot_general(
            lhs_t, rhs_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=mac_accum_dtype(mac_dtype)
            ).astype(jnp.int32)
        n_groups = q_size // o_r       # 5 = exact (A/B), 4 = rounded-key
        ps = [out_t[..., s * o_r:(s + 1) * o_r] for s in range(n_groups)]
        if n_groups == 5:
            # groups [B, A0, A1, A2, A3] -> (A, B): A wraps freely mod 2^32
            lo_t = (ps[1] + (ps[2] << 8)) + ((ps[3] << 16) + (ps[4] << 24))
            hi_t = ps[0]
        else:
            # rounded-key: groups [A0..A3], no B channel
            lo_t = (ps[0] + (ps[1] << 8)) + ((ps[2] << 16) + (ps[3] << 24))
            hi_t = None
        for o in range(mask1):
            lo_parts[o].append(lo_t[..., o * R:(o + 1) * R])
            if hi_t is not None:
                hi_parts[o].append(hi_t[..., o * R:(o + 1) * R])

    lo = jnp.concatenate(
        [piece for o in range(mask1) for piece in lo_parts[o]], axis=-1)
    hi = (jnp.concatenate(
        [piece for o in range(mask1) for piece in hi_parts[o]], axis=-1)
        if hi_parts[0] else None)
    if axis_name is not None:
        lo = jax.lax.psum(lo, axis_name)
        if hi is not None:
            hi = jax.lax.psum(hi, axis_name)

    inv_lo = dit_inverse_q(lo, n_poly=mask1)
    inv_hi = dit_inverse_q(hi, n_poly=mask1) if hi is not None else None
    return normalize_dual(inv_lo, inv_hi)


def external_step(acc_q, p, rhs_row, *, mask1, decomp_length, log2_base,
                  offset, mac_dtype=jnp.int8, axis_name=None):
    """One full CMUX step: ACC += BK_row (x) decomp((X^p - 1) ACC)."""
    rot = rotate_q(acc_q, p, minus_one=True)
    delta = external_mul_flat(
        rot, rhs_row, mask1=mask1, decomp_length=decomp_length,
        log2_base=log2_base, offset=offset, mac_dtype=mac_dtype,
        axis_name=axis_name)
    return (acc_q + delta).astype(jnp.int32)
