"""Rows-layout exact transform engine: polynomial dimensions on the ROW
(sublane) axis, ciphertext batch on the LANE axis.

Why: on TPU, lane-axis rolls are shuffle ops (~2.5x the cost of an add
pass), while row-axis rolls by multiples of the sublane tile are pure
vector-register reindexing the Mosaic compiler fuses into consumers
(measured ~free: 30 rounds of roll+select+add cost the same as 30 rounds
of add alone).  Every structural move in the blind-rotate step — butterfly
partner fetches (multiples of 32 rows), monomial j-block rotations,
interleaves and compactions — lands on the row axis, and dimension
regroupings become metadata-only reshapes on 8-row boundaries.  The batch
occupies exactly one 128-lane tile per grid cell.

Data layouts (rows x batch-lanes), all row strides multiples of 8:

  acc     (mask1*1024, b): row = j*64 + o*32 + i     (j = Nussbaumer slot,
                            o = TLWE polynomial, i = S' lane)
  digits  (G*1024, b):     row = j*(G*32) + g*32 + i, g = o*l + dig
  fwd out (L*G*32, b):     row = t*(G*32) + g*32 + u  (slot-major; t is in
                            DIF bit-reversed order, matching the key)
  MAC lhs (L, C, b):       C = limb*(G*32) + g*32 + u  [metadata reshape]
  MAC out (L, Q, b):       Q = s*(mask1*32) + o*32 + k
  inverse (L*128, b):      row = t*128 + ch*64 + o*32 + k  (ch = A/B)

The mathematics is identical to ``ops/flat_engine`` (same DIF/DIT, same
two-channel (A/B) inverse, same int8 limb MAC, bit-exact vs
``ref/transform_ref``); only the axis assignment differs.  The MAC is one
batched ``dot_general`` over all L slots: (L, C, Q) x (L, C, b) ->
(L, Q, b), contracting the row axis — batch stays on lanes throughout.

Reference analogue: ``nufhe/blind_rotate.mako`` (fused persistent kernel).
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
# output groups in the MAC Q axis: [B, A0, A1, A2, A3] (see
# transform.build_mac_rhs for the A/B channel split)
SHIFT_GROUPS = 5


def _mask(x, *expr):
    """(n_rows, 1) bool row mask, built in-trace from a column iota (cost is
    negligible: 1 lane wide; it broadcasts inside the consuming select).
    Pallas kernels cannot close over materialized array constants, so masks
    are lax-built; identical subexpressions are shared by CSE."""
    r = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    kind = expr[0]
    if kind == 'geq_mod':          # (row % blk) >= e
        _, blk, e = expr
        return (r % blk) >= e
    if kind == 'lt_mod':           # (row % region) < k
        _, region, k = expr
        return (r % region) < k
    if kind == 'mbit':             # bit b of ((row // stride) % h)
        _, stride, h, b = expr
        return ((r // stride) % h >> b) & 1 != 0
    if kind == 'mbit_and_geq':     # mbit AND (row % blk) >= e
        _, stride, h, b, blk, e = expr
        return (((((r // stride) % h) >> b) & 1) != 0) & ((r % blk) >= e)
    if kind == 'jlt':              # ((row % region) // stride) < k
        _, region, stride, k = expr
        return ((r % region) // stride) < k
    raise ValueError(expr)


def _rows(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)


def _roll(x, k):
    return jnp.roll(x, k, axis=0)


def roll_region(x, k, region):
    """Cyclic roll down by k within each `region`-row region."""
    k = k % region
    if k == 0:
        return x
    return jnp.where(_mask(x, 'geq_mod', region, k),
                     _roll(x, k), _roll(x, k - region))


def rot_block(x, e, blk=R):
    """Negacyclic rotation by Y^e within each blk-row block (Y^blk = -1).

    ``e`` is always STATIC in this engine (twiddles, carries and the
    barrel's per-round amounts are compile-time constants; only the
    SELECTION between rounds is data-dependent), so the rotation lowers
    as one partial negate + slice-concat — [-tail_e | head_(blk-e)] per
    block — instead of roll+negate+select (round-5 "t10": measured
    1.307 -> 1.242 ms/step on the rounded engine, bit-exact)."""
    e = e % (2 * blk)
    neg = e >= blk
    if neg:
        e -= blk
    if e == 0:
        return -x if neg else x
    b = x.shape[-1]
    v = x.reshape(-1, blk, b)
    tail = v[:, blk - e:]
    head = v[:, :blk - e]
    out = (jnp.concatenate([tail, -head], axis=1) if neg
           else jnp.concatenate([-tail, head], axis=1))
    return out.reshape(x.shape)


def rotate_acc(x, p, mask1, minus_one=False, skip_low_bits=0):
    """X^p * x per batch lane; x: (mask1*1024, b) acc layout, p: (1, b).

    The acc spans exactly one region (mask1*N rows), so the j-block roll is
    a plain cyclic whole-array roll, and the Y-carry of wrapped j-blocks
    touches only the first k*stride rows — computed on that slice alone
    instead of a full-array masked rot_block.

    :param skip_low_bits: barrel rounds statically skipped because the
        caller guarantees p is a multiple of 2^skip_low_bits (the coarse
        modulus switch, ``PerformanceParameters(coarse_phase_bits=...)``).
    """
    stride = mask1 * R                       # rows per j-block
    region = mask1 * N
    assert x.shape[0] == region, (x.shape, region)
    out = x
    for b in range(skip_low_bits, 5):        # X^(2^b): j-block rolls + carry
        k = 1 << b
        rolled = _roll(out, stride * k)
        carry = rot_block(rolled[:k * stride], 1)
        fixed = jnp.concatenate([carry, rolled[k * stride:]], axis=0)
        bit = ((p >> b) & 1) != 0
        out = jnp.where(bit, fixed, out)
    for b in range(5, 10):                   # X^(32*2^b): i-axis rotations
        k = 1 << (b - 5)
        bit = ((p >> b) & 1) != 0
        out = jnp.where(bit, rot_block(out, k), out)
    bit = ((p >> 10) & 1) != 0               # X^1024 = -1
    out = jnp.where(bit, -out, out)
    if minus_one:
        out = out - x
    return out.astype(jnp.int32)


def gadget_decomp(rot, mask1, decomp_length, log2_base, offset):
    """acc rows (j, o, i) -> digit rows (j, (o, dig), i): per-digit
    extraction + metadata-only interleave."""
    b = rot.shape[-1]
    base_half = 1 << (log2_base - 1)
    mask = (1 << log2_base) - 1
    shifted = rot + jnp.int32(offset)
    digs = []
    for d in range(decomp_length):
        sh = 32 - (d + 1) * log2_base
        digs.append((((shifted >> sh) & mask) - base_half)
                    .reshape(M, mask1, 1, R, b))
    out = jnp.concatenate(digs, axis=2)      # (j, o, dig, i, b)
    return out.reshape(M * mask1 * decomp_length * R, b).astype(jnp.int32)


# --- SWAR-packed forward transform -----------------------------------------
#
# Two independent polynomials ride one int32 word: w = f_a + f_b * 2^16 with
# biased 16-bit fields f = v + 2^14.  Value bounds: digits reach -512 and
# negacyclic sign flips make +2^14 attainable, so intermediate DFT values
# satisfy |v| <= 2^14 (tight: operand fields per stage are bounded by
# 2^14 + 512*2^s and only final-stage OUTPUT fields hit exactly 2^15 —
# they are never operands of a further packed add).  Hence:
#   add:  w1 + w2 - 2^14*(1 + 2^16)            (field sums < 2^16: no carry;
#                                               fields >= 2^14: no borrow)
#   sub:  w1 + (2^15*(1 + 2^16) - w2) - 2^14*(1 + 2^16)
#   neg:  2^15*(1 + 2^16) - w                  (fields <= 2^15: no borrow)
# Rolls and selects act positionwise on packed words.  This halves the
# VPU data volume of the forward transform (the hot VMEM-bound loop).
#
# BIAS-DEFERRED ("raw") radix-8 form (the round-4 default,
# ``dif_forward_packed2``): every stage value is an i32-LINEAR function of
# the packed inputs, so the per-op bias re-normalization constants of the
# _pk_add/_pk_sub forms (1-2 extra VPU ops each; Mosaic does NOT constant-
# fold them — measured) commute out entirely.  The pipeline computes with
# plain +/- on fields biased by 512 (f = digit + 512, straight from the
# decomposition masks), tracks each output's STATIC accumulated bias
# (only the two all-sum output groups reach 32*512 = 2^14; every other
# group's bias cancels in a difference), and applies ONE normalization
# folded into ``packed_to_lhs``'s existing constant add (a per-row-slice
# vector — zero extra passes).  Intermediate raw words may transiently
# "borrow" across the 16-bit field boundary; the final bit pattern equals
# the biased form's minus the tracked constants (exact i32 linearity), so
# the normalized fields land in [0, 2^16) exactly as before — the result
# is BIT-IDENTICAL to the biased form (asserted by the engine tests and
# measured 4% faster per CMUX step; see DESIGN.md round 4).
# The radix-4 staged form (``dif_forward_packed``) keeps the biased
# convention with its invariants above.

def _wrap32(v):
    """Python int -> two's-complement int32 value."""
    return ((v + 2**31) % 2**32) - 2**31


_B14 = 1 << 14
_PK_RENORM = _wrap32(_B14 * (1 + (1 << 16)))      # per-field bias 2^14
_PK_NEG = _wrap32((_B14 * 2) * (1 + (1 << 16)))   # per-field 2^15


def _pk_add(w1, w2):
    return w1 + w2 - jnp.int32(_PK_RENORM)


def _pk_sub(w1, w2):
    return (w1 + (jnp.int32(_PK_NEG) - w2)) - jnp.int32(_PK_RENORM)


def _pk_neg(w):
    return jnp.int32(_PK_NEG) - w


def _pk_rot_block(w, e, blk=R):
    """Negacyclic rotation of packed words within blk-row blocks."""
    e = e % (2 * blk)
    neg = e >= blk
    if neg:
        e -= blk
    if e == 0:
        return _pk_neg(w) if neg else w
    hi = _roll(w, e)
    lo = _roll(w, e - blk)
    if neg:
        hi, lo = _pk_neg(hi), lo
    else:
        lo = _pk_neg(lo)
    return jnp.where(_mask(w, 'geq_mod', blk, e), hi, lo)


def dif_forward_packed(dig_pk, n_pk):
    """DIF forward of packed polynomial pairs; same dataflow as
    ``dif_forward`` on half the words.

    Twiddles use the sliced-by-m form (see ``dif_forward``): each stage
    rotates static per-butterfly-index slices once instead of running
    log2(h) whole-array masked sub-rounds.

    :param dig_pk: (M*n_pk*R, b) int32 packed digit pairs (biased fields).
    :returns: (L*n_pk*R, b) int32 packed transform pairs.
    """
    stride = n_pk * R
    b = dig_pk.shape[-1]
    v = dig_pk.reshape(M, stride, b)
    hi0 = jnp.concatenate(
        [_pk_rot_block(v[m].reshape(-1, b), m).reshape(1, stride, b)
         for m in range(M)], axis=0).reshape(M * stride, b)
    x = jnp.concatenate([dig_pk, hi0], axis=0)
    # radix-4 merged DIF stage pairs (h, h/2): per group of 2h slices
    # [x0 x1 x2 x3] (quarters of h/2), with step1 = L/(2h), step2 = 2*step1:
    #   s0 = x0+x2, s1 = x1+x3,
    #   d0 = Y^(step1 j)(x0-x2), d1 = Y^(step1 (j+h/2))(x1-x3)
    #   z = [s0+s1, Y^(step2 j)(s0-s1), d0+d1, Y^(step2 j)(d0-d1)]
    for h in (16, 4):
        step1 = L // (2 * h)
        hh = h // 2
        v = x.reshape(-1, 4, hh, stride, b)
        zs = []
        for j in range(hh):
            x0 = v[:, 0, j].reshape(-1, b)
            x1 = v[:, 1, j].reshape(-1, b)
            x2 = v[:, 2, j].reshape(-1, b)
            x3 = v[:, 3, j].reshape(-1, b)
            s0 = _pk_add(x0, x2)
            s1 = _pk_add(x1, x3)
            d0 = _pk_rot_block(_pk_sub(x0, x2), step1 * j)
            d1 = _pk_rot_block(_pk_sub(x1, x3), step1 * (j + hh))
            zs.append(jnp.concatenate(
                [z.reshape(-1, 1, 1, stride, b)
                 for z in (_pk_add(s0, s1),
                           _pk_rot_block(_pk_sub(s0, s1), 2 * step1 * j),
                           _pk_add(d0, d1),
                           _pk_rot_block(_pk_sub(d0, d1), 2 * step1 * j))],
                axis=1))
        x = (jnp.concatenate(zs, axis=2) if hh > 1 else zs[0]).reshape(-1, b)
    # final stage h = 1
    v = x.reshape(-1, 2, stride, b)
    x = jnp.stack([_pk_add(v[:, 0], v[:, 1]),
                   _pk_sub(v[:, 0], v[:, 1])], axis=1).reshape(-1, b)
    return x


def pack_pairs(a, b_):
    """Two small-int arrays (|v| < 2^14) -> packed biased words."""
    return ((a + jnp.int32(_B14))
            + ((b_ + jnp.int32(_B14)) << 16)).astype(jnp.int32)


# raw-field bias of freshly packed digits (f = digit + 512 per field)
_BP_RAW = 512 * (1 + (1 << 16))


def pack_pairs_raw(a, b_):
    """Two digit arrays in [-512, 512) -> RAW packed words (fields
    f = v + 512, the bias-deferred convention of ``dif_forward_packed2``)."""
    return ((a + jnp.int32(512)) + ((b_ + jnp.int32(512)) << 16)
            ).astype(jnp.int32)


def decomp_pack2(rot, mask1, log2_base, offset):
    """Fused gadget decomposition + SWAR pair packing for decomp_length=2,
    RAW convention (fields f = digit + base/2, no 2^14 re-bias — see the
    bias-deferred note in the module header).

    The SWAR pairing for l=2 puts digits (g=2o, g=2o+1) = (dig 0, dig 1 of
    polynomial o) into one word — BOTH extracted from the same shifted
    value — and the packed row layout (j, pair=o, i) coincides with the acc
    row layout (j, o, i).  So the whole decomp+pack is elementwise on
    ``rot`` (5 VPU ops: the high field lands at bit 16 via one masked
    left-shift of the source word); the digits array of the generic path
    is never materialized.

    :param rot: (mask1*1024, b) int32 acc-layout rows (j, o, i).
    :returns: (mask1*1024, b) int32 RAW packed digit pairs, rows
        (j, pair, i) with pair = o; equals
        ``pack_pairs_raw(gadget_decomp(...)[pairs])``.
    """
    shifted = rot + jnp.int32(offset)
    sh0 = 32 - log2_base
    sh1 = 32 - 2 * log2_base
    mask = (1 << log2_base) - 1
    f0 = (shifted >> sh0) & jnp.int32(mask)
    # ((s >> sh1) & mask) << 16 == (s << (16 - sh1)) & (mask << 16)
    f1s = (shifted << (16 - sh1)) & jnp.int32(mask << 16) if sh1 <= 16 \
        else ((shifted >> (sh1 - 16)) & jnp.int32(mask << 16))
    out = f0 + f1s
    base_half = 1 << (log2_base - 1)
    if base_half != 512:    # normalize to the standard raw bias (f = d+512)
        out = out + jnp.int32(_wrap32((512 - base_half) * (1 + (1 << 16))))
    return out.astype(jnp.int32)


def _pk_rot_raw(w, e, bias2=0, blk=R):
    """Negacyclic rotation of RAW packed words whose per-field bias is b
    (``bias2`` = the packed constant 2*b*(1+2^16)): the wrap negation of a
    raw word is K - w with K = 2b per field (value -v at the same bias b).
    Zero-bias operands (every difference in the forward) use plain -w."""
    e = e % (2 * blk)
    neg = e >= blk
    if neg:
        e -= blk

    def negate(x):
        return (jnp.int32(_wrap32(bias2)) - x) if bias2 else -x
    if e == 0:
        return negate(w) if neg else w
    # static-e slice-concat form (see rot_block)
    b = w.shape[-1]
    v = w.reshape(-1, blk, b)
    tail = v[:, blk - e:]
    head = v[:, :blk - e]
    out = (jnp.concatenate([tail, negate(head)], axis=1) if neg
           else jnp.concatenate([negate(tail), head], axis=1))
    return out.reshape(w.shape)


def dif_forward_packed2(dig_pk, n_pk):
    """Two-pass radix-8 DIF forward of RAW packed pairs: merged head
    (h = 32, 16, 8 — the zero-padded initial stage folded in) and merged
    tail (h = 4, 2, 1), all adds/subs plain 1-op i32 (bias-deferred; see
    the module header).  Output rows carry a STATIC per-row bias: the two
    all-sum groups (grp 0 and 4, tail output slice 0) accumulate
    32*512 = 2^14 per field (i.e. exactly the biased convention); every
    other row's bias cancels in a difference and is zero —
    ``packed_to_lhs`` folds the normalization into its constant add.

    :param dig_pk: (M*n_pk*R, b) int32 RAW packed digit pairs
        (``decomp_pack2`` / ``pack_pairs_raw``).
    :returns: (L*n_pk*R, b) int32 packed transform pairs (per-row bias as
        above); ``packed_to_lhs(..., raw=True)`` consumes them.
    """
    stride = n_pk * R
    b = dig_pk.shape[-1]
    A = dig_pk.reshape(M, stride, b)

    # head pass: slots (grp, j), grp in 0..7, j in 0..7.  Per j the four
    # inputs a,b,c,d = A[j], A[j+8], A[j+16], A[j+24] combine through the
    # three radix-2 stages h=32 (trivial lo/Y^m hi on zero-padded input),
    # h=16 and h=8; common subexpressions are the stage-16 values.
    # Bias bookkeeping (per field, units of 512): inputs 1; sums double;
    # differences cancel to 0; rotations preserve (wrap negation uses the
    # doubled-bias constant).
    groups = [[None] * 8 for _ in range(8)]
    for j in range(8):
        a = A[j]
        bb = A[j + 8]
        c = A[j + 16]
        d = A[j + 24]
        c16 = _pk_rot_raw(c, 16, 2 * _BP_RAW)
        d16 = _pk_rot_raw(d, 16, 2 * _BP_RAW)
        p = a + c                          # B0_j         (bias 2)
        q = bb + d                         # B0_{j+8}     (2)
        m_ = a - c                         # Y^{-2j} B0d_j (0)
        n_ = bb - d                        # (0)
        r = a + c16                        # (2)
        s_ = a - c16                       # (0)
        t = bb + d16                       # (2)
        u = bb - d16                       # (0)
        groups[0][j] = p + q               # (4)
        groups[1][j] = _pk_rot_raw(p - q, 4 * j)
        n16 = _pk_rot_raw(n_, 16)
        groups[2][j] = _pk_rot_raw(m_ + n16, 2 * j)
        groups[3][j] = _pk_rot_raw(m_ - n16, 6 * j)
        t8 = _pk_rot_raw(t, 8, 4 * _BP_RAW)
        groups[4][j] = _pk_rot_raw(r + t8, j, 8 * _BP_RAW)   # (4)
        groups[5][j] = _pk_rot_raw(r - t8, 5 * j)
        u24 = _pk_rot_raw(u, 24)
        groups[6][j] = _pk_rot_raw(s_ + u24, 3 * j)
        groups[7][j] = _pk_rot_raw(s_ - u24, 7 * j)
    x = jnp.concatenate(
        [g.reshape(1, stride, b) for grp in groups for g in grp],
        axis=0).reshape(L * stride, b)

    # tail pass: radix-8 over groups of 8 consecutive slices
    # (h=4: step 8; h=2: step 16; h=1: trivial twiddle).  Per-row bias
    # f(grp) = 4 for grp in {0, 4} else 0 is shared by all 8 slices, so
    # differences stay bias-free and only the all-sum output (slice 0)
    # reaches 8*f(grp) = 32 (= 2^14 per field).
    v = x.reshape(-1, 8, stride, b)
    xs = [v[:, m].reshape(-1, b) for m in range(8)]
    s = [xs[m] + xs[m + 4] for m in range(4)]
    d = [_pk_rot_raw(xs[m] - xs[m + 4], 8 * m) for m in range(4)]
    ss0 = s[0] + s[2]
    ss1 = s[1] + s[3]
    sd0 = s[0] - s[2]
    sd1 = _pk_rot_raw(s[1] - s[3], 16)
    ds0 = d[0] + d[2]
    ds1 = d[1] + d[3]
    dd0 = d[0] - d[2]
    dd1 = _pk_rot_raw(d[1] - d[3], 16)
    outs = [ss0 + ss1, ss0 - ss1,
            sd0 + sd1, sd0 - sd1,
            ds0 + ds1, ds0 - ds1,
            dd0 + dd1, dd0 - dd1]
    return jnp.concatenate(
        [o.reshape(-1, 1, stride, b) for o in outs],
        axis=1).reshape(L * stride, b)


def unpack_pairs(w):
    """Packed biased words -> (a, b) int32 values."""
    f_a = w & jnp.int32(0xFFFF)
    f_b = (w >> 16) & jnp.int32(0xFFFF)
    return (f_a - jnp.int32(_B14)).astype(jnp.int32), \
        (f_b - jnp.int32(_B14)).astype(jnp.int32)


def dif_forward(dig, g_total):
    """DIF DFT over S' of zero-padded strided blocks, slot-major rows.

    Twiddles are SLICED BY m: the butterfly index m is static (row-index
    bits), so instead of log2(h) whole-array masked roll sub-rounds per
    stage, each stage reshapes to (blk, 2, m, stride, b) on 8-row-aligned
    boundaries (metadata-only) and applies ONE negacyclic rotation per
    m-slice — ~1 data pass per stage (measured ~3x faster than the
    per-bit form on v5e).

    :param dig: (M*g_total*R, b) int32, rows (j, g, i).
    :returns: (L*g_total*R, b) int32, rows (t, g, u), t bit-reversed.
    """
    stride = g_total * R
    b = dig.shape[-1]
    # stage h=32 on zero-padded input: lo' = A; hi' = Y^j A
    v = dig.reshape(M, stride, b)
    hi0 = jnp.concatenate(
        [rot_block(v[m].reshape(-1, b), m).reshape(1, stride, b)
         for m in range(M)], axis=0).reshape(M * stride, b)
    x = jnp.concatenate([dig, hi0], axis=0)  # (L*stride, b); t-group halves
    # after this concat rows are (half, j, g, i) = slot order for h=32 split
    for h in (16, 8, 4, 2, 1):
        step = L // (2 * h)
        v = x.reshape(-1, 2, h, stride, b)
        lo = v[:, 0]
        hi = v[:, 1]
        diff = lo - hi
        if h > 1:
            tw = jnp.concatenate(
                [rot_block(diff[:, m].reshape(-1, b), step * m)
                 .reshape(-1, 1, stride, b) for m in range(h)], axis=1)
        else:
            tw = diff
        x = jnp.stack([lo + hi, tw], axis=1).reshape(-1, b)
    return x


def dit_inverse(x, stride):
    """DIT inverse (unscaled) + fold; x rows (t, [inner]) with t-group size
    ``stride`` rows, t in bit-reversed order; returns (M*stride, b).

    Twiddles are sliced by the (static) butterfly index m — one negacyclic
    rotation per m-slice per stage instead of per-bit whole-array masked
    sub-rounds (see ``dif_forward``); measured ~3x faster on v5e.

    The final stage (mmax = M) pairs slots (j, j+M) — exactly the fold
    pairs — so it is fused with the fold:
      C_j = P_j + Y P_{j+M} = (lo + tw) + Y (lo - tw)
    on half-size data instead of a full stage plus a fold pass.
    """
    nrows, b = x.shape
    # radix-4 merged stage pairs (s, s+1): each pair materializes the
    # array once instead of twice.  DIT pair identities (m = 2^s,
    # c1 = -2^(5-s), c2 = c1/2; T = Y^(c1 j), U_j = Y^(c2 j)):
    #   y0 = x0 + T x1, y1 = x0 - T x1, y2 = x2 + T x3, y3 = x2 - T x3
    #   z = [y0 + U_j y2, y1 + U_{j+m} y3, y0 - U_j y2, y1 - U_{j+m} y3]
    for s in (0, 2):
        m4 = 1 << s
        c1 = -(1 << (LOG_L - s - 1))
        c2 = c1 // 2
        v = x.reshape(-1, 4, m4, stride, b)
        zs = []
        for j in range(m4):
            x0 = v[:, 0, j].reshape(-1, b)
            x1 = v[:, 1, j].reshape(-1, b)
            x2 = v[:, 2, j].reshape(-1, b)
            x3 = v[:, 3, j].reshape(-1, b)
            t1 = rot_block(x1, c1 * j) if (c1 * j) % (2 * R) else x1
            t3 = rot_block(x3, c1 * j) if (c1 * j) % (2 * R) else x3
            y0 = x0 + t1
            y1 = x0 - t1
            u2 = rot_block(x2 + t3, c2 * j)
            u3 = rot_block(x2 - t3, c2 * (j + m4))
            zs.append(jnp.concatenate(
                [z.reshape(-1, 1, 1, stride, b)
                 for z in (y0 + u2, y1 + u3, y0 - u2, y1 - u3)], axis=1))
        x = (jnp.concatenate(zs, axis=2) if m4 > 1 else zs[0]).reshape(
            nrows, b)
    # stage 4 (mmax = 16), radix-2
    mmax = 16
    step = -(1 << (LOG_L - 4 - 1))
    v = x.reshape(-1, 2, mmax, stride, b)
    lo = v[:, 0]
    hi = v[:, 1]
    tw = jnp.concatenate(
        [rot_block(hi[:, m].reshape(-1, b), step * m)
         .reshape(-1, 1, stride, b) for m in range(mmax)], axis=1)
    x = jnp.stack([lo + tw, lo - tw], axis=1).reshape(nrows, b)
    # final stage (mmax = M) fused with the fold
    half = M * stride
    lo = x[:half]
    hi2 = x[half:].reshape(M, stride, b)
    tw = jnp.concatenate(
        [rot_block(hi2[m], -m).reshape(1, stride, b)
         for m in range(M)], axis=0).reshape(half, b)
    s_plus = lo + tw
    s_minus = lo - tw
    return s_plus + rot_block(s_minus, 1)


def dit_inverse2(x, stride):
    """Two-pass radix-8 DIT inverse + fold: merged stages (0, 1, 2) and
    (3, 4, 5)+fold.  Bit-identical to ``dit_inverse`` (same exact i32
    sums mod 2^32, reassociated), with two materializations of the array
    instead of four.

    :param x: (L*stride, b) int32 rows (t, [inner]), t bit-reversed.
    :returns: (M*stride, b) int32.
    """
    nrows, b = x.shape

    # pass 1: stages 0 (mmax=1, trivial twiddle), 1 (c=-16), 2 (c=-8)
    v = x.reshape(-1, 8, stride, b)
    a = [v[:, i].reshape(-1, b) for i in range(8)]
    b0 = a[0] + a[1]
    b1 = a[0] - a[1]
    b2 = a[2] + a[3]
    b3 = a[2] - a[3]
    b4 = a[4] + a[5]
    b5 = a[4] - a[5]
    b6 = a[6] + a[7]
    b7 = a[6] - a[7]
    c0 = b0 + b2
    c2 = b0 - b2
    t = rot_block(b3, -16)
    c1 = b1 + t
    c3 = b1 - t
    c4 = b4 + b6
    c6 = b4 - b6
    t = rot_block(b7, -16)
    c5 = b5 + t
    c7 = b5 - t
    d0 = c0 + c4
    d4 = c0 - c4
    t = rot_block(c5, -8)
    d1 = c1 + t
    d5 = c1 - t
    t = rot_block(c6, -16)
    d2 = c2 + t
    d6 = c2 - t
    t = rot_block(c7, -24)
    d3 = c3 + t
    d7 = c3 - t
    x = jnp.concatenate(
        [d.reshape(-1, 1, stride, b) for d in
         (d0, d1, d2, d3, d4, d5, d6, d7)], axis=1).reshape(nrows, b)

    # pass 2: stages 3 (c=-4), 4 (c=-2), 5 (c=-1) and the fold
    # C_q = P_q + Y P_{q+M}; slots q = zi*8 + j, twiddle index m = q mod mmax
    v = x.reshape(8, 8, stride, b)
    outs = [[None] * 8 for _ in range(4)]
    for j in range(8):
        w = [v[z, j] for z in range(8)]
        t = rot_block(w[1], -4 * j)
        e0 = w[0] + t
        e1 = w[0] - t
        t = rot_block(w[3], -4 * j)
        e2 = w[2] + t
        e3 = w[2] - t
        t = rot_block(w[5], -4 * j)
        e4 = w[4] + t
        e5 = w[4] - t
        t = rot_block(w[7], -4 * j)
        e6 = w[6] + t
        e7 = w[6] - t
        t = rot_block(e2, -2 * j)
        f0 = e0 + t
        f2 = e0 - t
        t = rot_block(e3, -2 * (j + 8))
        f1 = e1 + t
        f3 = e1 - t
        t = rot_block(e6, -2 * j)
        f4 = e4 + t
        f6 = e4 - t
        t = rot_block(e7, -2 * (j + 8))
        f5 = e5 + t
        f7 = e5 - t
        t = rot_block(f4, -j)
        g0 = f0 + t
        g4 = f0 - t
        t = rot_block(f5, -(j + 8))
        g1 = f1 + t
        g5 = f1 - t
        t = rot_block(f6, -(j + 16))
        g2 = f2 + t
        g6 = f2 - t
        t = rot_block(f7, -(j + 24))
        g3 = f3 + t
        g7 = f3 - t
        outs[0][j] = g0 + rot_block(g4, 1)
        outs[1][j] = g1 + rot_block(g5, 1)
        outs[2][j] = g2 + rot_block(g6, 1)
        outs[3][j] = g3 + rot_block(g7, 1)
    return jnp.concatenate(
        [o.reshape(1, stride, b) for grp in outs for o in grp],
        axis=0).reshape(M * stride, b)


def _combine_groups(ps_slices):
    """Shift-group combine: the 5 dot-output groups [B, A0, A1, A2, A3]
    -> the (A, B) channel pair.  A = A0 + (A1<<8) + (A2<<16) + (A3<<24)
    rides i32 with FREE wraparound (the MAC value is only needed mod 2^38
    = 2^6 * 2^32 and A carries weight 2^6); B (the a0 x vlo products,
    |B| <= 2^18 per slot) passes through untouched and stays exact in i32
    through the 64x growth of the inverse (<= 2^24).

    Rounded-key ('FFT') mode: 4 groups [A0..A3], no B channel — the
    second element of the returned pair is None."""
    if len(ps_slices) == 4:
        a0, a1, a2, a3 = ps_slices
        return (a0 + (a1 << 8)) + ((a2 << 16) + (a3 << 24)), None
    b_, a0, a1, a2, a3 = ps_slices
    a = (a0 + (a1 << 8)) + ((a2 << 16) + (a3 << 24))
    return a, b_


def dot_out_to_delta(out, mask1, acc=None, base=None):
    """Raw MAC dot output (L, Q, b) -> acc-layout delta (mask1*1024, b).

    Same mathematics as ``_combine_groups`` + ``dit_inverse2`` + fold +
    ``normalize_dual``, but the group combine is fused into the first
    inverse pass (computed per slot-slice as it is read) and the
    normalization into the second (emitted per fold output) — neither the
    dual-channel array nor the folded array is ever materialized.

    Q-group counts select the channel mode: 5 = fused exact (A/B ride the
    inverse together, stride 2*o_r), 4 = A channel alone (rounded-key
    engine, or the A leg of the channel-sequential exact path), 1 = the
    B channel alone (the second leg; pass its A result as ``base`` to get
    the exact delta ``base + (B_inv >> 6)``).

    :param acc: optional (mask1*1024, b) int32 accumulator ADDED per
        output slice as it is emitted (the CMUX acc update; fusing it here
        removes the separate full-array add pass — measured -0.02 ms/step).
    :param base: optional (mask1*1024, b) int32 added per output slice
        with this call's folded outputs arithmetic-shifted by INV_SHIFT
        (the B-channel extraction; only valid with a 1-group ``out``).
    """
    b = out.shape[-1]
    o_r = mask1 * R
    q = out.shape[-2]
    n_groups = q // o_r       # 5 = exact (A/B), 4 = A-only, 1 = B-only
    two_ch = n_groups == SHIFT_GROUPS
    assert base is None or n_groups == 1
    stride = (2 * o_r) if two_ch else o_r

    v0 = out.reshape(8, 8, q, b)

    def combine(i):
        # slots {i, 8+i, ..., 56+i} -> (8*stride, b) rows (slot[, ch], o, k)
        o_sl = v0[:, i]
        if n_groups == 1:
            return o_sl.reshape(8 * stride, b)
        a_ch, b_ch = _combine_groups(
            [jax.lax.slice_in_dim(o_sl, s * o_r, (s + 1) * o_r, axis=1)
             for s in range(n_groups)])
        if not two_ch:
            return a_ch.reshape(8 * stride, b)
        x = jnp.concatenate(
            [a_ch.reshape(8, 1, o_r, b), b_ch.reshape(8, 1, o_r, b)], axis=1)
        return x.reshape(8 * stride, b)

    # pass 1: stages 0, 1, 2 (combine fused into the slot-slice reads)
    a = [combine(i) for i in range(8)]
    b0 = a[0] + a[1]
    b1 = a[0] - a[1]
    b2 = a[2] + a[3]
    b3 = a[2] - a[3]
    b4 = a[4] + a[5]
    b5 = a[4] - a[5]
    b6 = a[6] + a[7]
    b7 = a[6] - a[7]
    c0 = b0 + b2
    c2 = b0 - b2
    t = rot_block(b3, -16)
    c1 = b1 + t
    c3 = b1 - t
    c4 = b4 + b6
    c6 = b4 - b6
    t = rot_block(b7, -16)
    c5 = b5 + t
    c7 = b5 - t
    d0 = c0 + c4
    d4 = c0 - c4
    t = rot_block(c5, -8)
    d1 = c1 + t
    d5 = c1 - t
    t = rot_block(c6, -16)
    d2 = c2 + t
    d6 = c2 - t
    t = rot_block(c7, -24)
    d3 = c3 + t
    d7 = c3 - t
    x = jnp.concatenate(
        [d.reshape(-1, 1, stride, b) for d in
         (d0, d1, d2, d3, d4, d5, d6, d7)], axis=1).reshape(L * stride, b)

    # pass 2: stages 3, 4, 5 + fold, normalization fused into the outputs
    v = x.reshape(8, 8, stride, b)
    outs = [[None] * 8 for _ in range(4)]
    for j in range(8):
        w = [v[z, j] for z in range(8)]
        t = rot_block(w[1], -4 * j)
        e0 = w[0] + t
        e1 = w[0] - t
        t = rot_block(w[3], -4 * j)
        e2 = w[2] + t
        e3 = w[2] - t
        t = rot_block(w[5], -4 * j)
        e4 = w[4] + t
        e5 = w[4] - t
        t = rot_block(w[7], -4 * j)
        e6 = w[6] + t
        e7 = w[6] - t
        t = rot_block(e2, -2 * j)
        f0 = e0 + t
        f2 = e0 - t
        t = rot_block(e3, -2 * (j + 8))
        f1 = e1 + t
        f3 = e1 - t
        t = rot_block(e6, -2 * j)
        f4 = e4 + t
        f6 = e4 - t
        t = rot_block(e7, -2 * (j + 8))
        f5 = e5 + t
        f7 = e5 - t
        t = rot_block(f4, -j)
        g0 = f0 + t
        g4 = f0 - t
        t = rot_block(f5, -(j + 8))
        g1 = f1 + t
        g5 = f1 - t
        t = rot_block(f6, -(j + 16))
        g2 = f2 + t
        g6 = f2 - t
        t = rot_block(f7, -(j + 24))
        g3 = f3 + t
        g7 = f3 - t
        for zi, (ga, gb) in enumerate(((g0, g4), (g1, g5),
                                       (g2, g6), (g3, g7))):
            c = ga + rot_block(gb, 1)   # fold: ([ch,] o, k) rows x b
            q_idx = zi * 8 + j
            if two_ch:
                d_ = normalize_dual(c[:o_r], c[o_r:])
            elif base is not None:
                # B-channel leg: exact extraction against the A result
                # (same arithmetic as normalize_dual, slice-fused)
                d_ = (jax.lax.slice_in_dim(
                    base, q_idx * o_r, (q_idx + 1) * o_r, axis=0)
                    + (c.reshape(o_r, b) >> INV_SHIFT)).astype(jnp.int32)
            else:
                d_ = c.astype(jnp.int32)
            if acc is not None:
                # output slot q lands at acc rows [q*o_r, (q+1)*o_r):
                # fuse the CMUX accumulator add
                d_ = (d_.reshape(o_r, b)
                      + jax.lax.slice_in_dim(
                          acc, q_idx * o_r, (q_idx + 1) * o_r, axis=0)
                      ).astype(jnp.int32)
            outs[zi][j] = d_
    return jnp.concatenate(
        [o.reshape(1, o_r, b) for grp in outs for o in grp],
        axis=0).reshape(mask1 * N, b)


def normalize_dual(a, b_):
    """(A, B) inverse outputs -> exact c = A + (B >> 6) mod 2^32.
    B is divisible by 2^6 over Z (B = 64c - 2^6*A), so the arithmetic
    shift is exact division; A's i32 wraparound is mod-2^32 by design.
    Rounded-key mode (b_ is None): c = A directly."""
    if b_ is None:
        return a.astype(jnp.int32)
    return (a + (b_ >> INV_SHIFT)).astype(jnp.int32)


def packed_to_lhs(xt_pk, n_pk, mac_dtype, raw=False):
    """Packed forward-transform words -> MAC lhs (L, C, b): split the
    balanced radix-2^8 limbs directly on the packed biased fields (one
    packed add yields both limb bytes of both fields) and interleave to
    the ``build_mac_rhs`` C-order (g = (pair, field), limb, u-lane) via
    metadata-only reshapes.

    ``raw=True`` consumes the bias-deferred ``dif_forward_packed2``
    output: the normalization to the biased convention (2^14 per field on
    every row EXCEPT the two already-biased all-sum groups) folds into
    this function's constant add as a per-row-slice vector — zero extra
    passes."""
    b = xt_pk.shape[-1]
    stride = 2 * n_pk * R
    if raw:
        rrow = jax.lax.broadcasted_iota(jnp.int32, (xt_pk.shape[0], 1), 0)
        grp = rrow // (8 * n_pk * R)
        out_sl = (rrow // (n_pk * R)) % 8
        already = ((grp == 0) | (grp == 4)) & (out_sl == 0)
        norm = _wrap32(_B14 * (1 + (1 << 16)))
        u = xt_pk + jnp.where(already, jnp.int32(0x00800080),
                              jnp.int32(_wrap32(0x00800080 + norm)))
    else:
        u = xt_pk + jnp.int32(0x00800080)
    sh = (L, n_pk, 1, 1, R, b)
    ev_a0 = ((u & 0xFF) - jnp.int32(128)).reshape(sh)
    od_a0 = (((u >> 16) & 0xFF) - jnp.int32(128)).reshape(sh)
    ev_a1 = (((u >> 8) & 0xFF) - jnp.int32(64)).reshape(sh)
    od_a1 = (((u >> 24) & 0xFF) - jnp.int32(64)).reshape(sh)
    lhs = jnp.concatenate([
        jnp.concatenate([ev_a0, ev_a1], axis=3),
        jnp.concatenate([od_a0, od_a1], axis=3)], axis=2)
    return lhs.reshape(L, 2 * stride, b).astype(mac_dtype)


def transformed_mac(digits, rhs, *, mask1, g_total, mac_dtype=jnp.int8,
                    axis_name=None, slot_axis_name=None, swar=True,
                    packed=None, radix8=True, acc=None, channel_split=False):
    """sum_g digits_g * key_g, rows layout.

    :param digits: (M*g_total*R, b) int32 rows (j, g, i), |values| <= 2^9
        (may be None when ``packed`` is given).
    :param rhs: (L_local, C_local, Q) int8 from ``transform.build_mac_rhs``
        (limb axes inside g-blocks on C; negacyclic signs baked in).
    :param axis_name: decomposition-limb tensor parallelism: rhs holds a
        contiguous g-block C-slice; dual-channel MAC outputs are psum-ed.
    :param slot_axis_name: slot (L) tensor parallelism — the TPU-native
        equivalent of splitting NTT stages across chips: rhs holds a
        contiguous slot slice of the key, each shard MACs only its slots,
        and the per-slot dual channels are all_gather-ed before the (cheap,
        replicated) inverse transform.  Mutually exclusive with
        ``axis_name``.
    :param swar: pack polynomial pairs two-per-int32 through the forward
        transform (bit-exact; halves the forward's VPU data volume).
    :param packed: pre-packed digit pairs ((M*(g_total//2)*R, b) int32,
        e.g. from ``decomp_pack2``) — skips the pack step entirely.
    :param radix8: use the two-pass radix-8 forms of the forward/inverse
        (bit-identical; fewer VMEM materializations).
    :param acc: optional accumulator fused into the inverse's output
        emission (non-sharded radix-8 path only); when given the RESULT
        INCLUDES acc (i.e. it is the updated accumulator, not the delta).
    :param channel_split: exact engine only (5-group rhs, non-sharded
        radix-8 path): run the A and B channels as two SEQUENTIAL
        dot+inverse legs (rhs sliced by shift group) instead of one fused
        dual-channel pipeline.  Bit-identical (the channels never
        interact until the final extraction); halves the peak live set of
        the inverse, trading one extra dot launch — a VMEM/register-
        pressure lever for large lane tiles (see DESIGN.md round 5).
    :returns: (mask1*1024, b) int32 acc-layout product (rows (j, o, i)),
        plus ``acc`` when given.
    """
    b = (digits if packed is None else packed).shape[-1]
    c_size, q_size = rhs.shape[-2], rhs.shape[-1]
    o_r = mask1 * R
    stride = g_total * R

    if packed is not None or (swar and g_total % 2 == 0):
        # SWAR: forward-transform polynomial pairs packed two-per-word
        # (adjacent g's pair up: (2k, 2k+1) -> low/high 16-bit fields),
        # then split MAC limbs directly on the packed words:
        # with biased field f = v + 2^14 (f <= 2^15, so f + 128 stays
        # inside its 16-bit field), the balanced radix-2^8 limbs are
        #   a0 = ((f + 128) & 255) - 128        (2^14 = 0 mod 256)
        #   a1 = ((f + 128) >> 8) - 64
        # i.e. one packed add yields both limb bytes of both fields.
        n_pk = g_total // 2
        if packed is None:
            dv = digits.reshape(M, n_pk, 2, R, b)
            pack = pack_pairs_raw if radix8 else pack_pairs
            packed = pack(dv[:, :, 0], dv[:, :, 1]).reshape(
                M * n_pk * R, b)
        fwd = dif_forward_packed2 if radix8 else dif_forward_packed
        xt_pk = fwd(packed, n_pk)
        lhs = packed_to_lhs(xt_pk, n_pk, mac_dtype, raw=radix8)
    else:
        xt = dif_forward(digits, g_total)    # (L*stride, b)
        a0 = ((xt + 128) & 255) - 128
        a1 = (xt - a0) >> 8
        # lhs C-order (g, limb, u) matching build_mac_rhs
        lhs = jnp.concatenate([
            a0.reshape(L, g_total, 1, R, b),
            a1.reshape(L, g_total, 1, R, b)], axis=2)
        lhs = lhs.reshape(L, 2 * stride, b).astype(mac_dtype)

    if slot_axis_name is not None:
        l_local = rhs.shape[0]
        start = jax.lax.axis_index(slot_axis_name) * l_local
        lhs = jax.lax.dynamic_slice_in_dim(lhs, start, l_local, axis=0)
        lo3, hi3 = _mac_dot(lhs, rhs, mask1, mac_dtype)
        # gather the slot slices: leading axis is slot-major, so shard
        # concatenation restores the full (L, ., .) order
        lo3 = jax.lax.all_gather(
            lo3, slot_axis_name, axis=0, tiled=True)
        if hi3 is not None:
            hi3 = jax.lax.all_gather(
                hi3, slot_axis_name, axis=0, tiled=True)
    elif axis_name is not None:
        lo3, hi3 = _mac_dot(lhs, rhs, mask1, mac_dtype)
        if hi3 is None:
            lo3 = jax.lax.psum(lo3, axis_name)
        else:
            lo3, hi3 = jax.lax.psum((lo3, hi3), axis_name)
    else:
        if (radix8 and channel_split
                and rhs.shape[-1] // o_r == SHIFT_GROUPS):
            # channel-sequential exact path: A leg (groups 1..4) through
            # its own dot+inverse, then the B leg (group 0) with the A
            # result and extraction shift fused into its emission
            rhs_a = jax.lax.slice_in_dim(rhs, o_r, rhs.shape[-1], axis=2)
            rhs_b = jax.lax.slice_in_dim(rhs, 0, o_r, axis=2)
            a_f = dot_out_to_delta(
                _mac_dot_raw(lhs, rhs_a, mac_dtype), mask1)
            # NOTE there is no way to force the legs to sequence:
            # lax.optimization_barrier does not lower in Pallas TPU
            # (NotImplementedError, measured round 5), so the scheduler
            # is free to interleave both dot+inverse pipelines
            return dot_out_to_delta(
                _mac_dot_raw(lhs, rhs_b, mac_dtype), mask1,
                acc=acc, base=a_f)
        out = _mac_dot_raw(lhs, rhs, mac_dtype)
        if radix8:
            # fused path: group combine rides the first inverse pass,
            # normalization/extraction the second (and the CMUX acc add
            # when ``acc`` is given) — no channel materialization
            return dot_out_to_delta(out, mask1, acc=acc)
        o_r_ = mask1 * R
        lo3, hi3 = _combine_groups(
            [jax.lax.slice_in_dim(out, s * o_r_, (s + 1) * o_r_, axis=1)
             for s in range(out.shape[1] // o_r_)])

    return mac_out_to_delta(lo3, hi3, mask1, radix8=radix8)


def mac_out_to_delta(lo3, hi3, mask1, radix8=True):
    """(A, B) channel MAC accumulators (L, mask1*R, b) -> acc-layout delta
    (mask1*1024, b): DIT inverse + fold + A/B extraction.  Rounded-key
    mode (hi3 is None): single-channel inverse, delta = A directly."""
    b = lo3.shape[-1]
    o_r = mask1 * R
    inv = dit_inverse2 if radix8 else dit_inverse
    if hi3 is None:
        folded = inv(lo3.reshape(L * o_r, b), o_r)   # (M*o_r, b) rows (j,o,k)
        return folded.astype(jnp.int32).reshape(mask1 * N, b)
    # inverse input rows (t, ch, o, k)
    x = jnp.concatenate([
        lo3.reshape(L, 1, o_r, b), hi3.reshape(L, 1, o_r, b)], axis=1)
    x = x.reshape(L * 2 * o_r, b)
    folded = inv(x, 2 * o_r)                 # (M * 2*o_r, b) rows (j, ch, o, k)
    v = folded.reshape(M, 2, o_r, b)
    delta = normalize_dual(v[:, 0], v[:, 1]) # (M, o_r, b)
    return delta.reshape(mask1 * N, b)


def _mac_dot_raw(lhs, rhs, mac_dtype):
    """(L, C, b) x (L, C, Q) -> (L, Q, b) int32 MAC dot output.

    The rhs carries the negacyclic signs baked in (``build_mac_rhs``), so
    this is a direct dot: int8 x int8 -> int32 on the TPU MXU (exact:
    |products| <= 2^14, 256-term sums <= 2^22), f32 x f32 -> f32 elsewhere.
    out rows: Q = s*o_r + o*R + k, SHIFT_GROUPS = 5 output groups
    [B, A0, A1, A2, A3] (see ``transform.build_mac_rhs``).
    """
    from .transform import mac_accum_dtype
    out = jax.lax.dot_general(
        rhs.astype(mac_dtype), lhs,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=mac_accum_dtype(mac_dtype))
    if out.dtype != jnp.int32:
        out = out.astype(jnp.int32)
    return out


def _mac_dot(lhs, rhs, mask1, mac_dtype):
    """MAC dot + shift-group combine -> (A, B) channels (L, mask1*R, b)."""
    o_r = mask1 * R
    out = _mac_dot_raw(lhs, rhs, mac_dtype)
    return _combine_groups(
        [jax.lax.slice_in_dim(out, s * o_r, (s + 1) * o_r, axis=1)
         for s in range(out.shape[1] // o_r)])


def external_step(acc, p, rhs, *, mask1, decomp_length, log2_base, offset,
                  mac_dtype=jnp.int8, axis_name=None,
                  slot_axis_name=None, radix8=True, skip_low_bits=0,
                  channel_split=False):
    """One CMUX step in rows layout: ACC += BK (x) decomp((X^p - 1) ACC).

    :param acc: (mask1*1024, b) int32 rows (j, o, i).
    :param p: (1, b) int32 in [0, 2N), a multiple of 2^skip_low_bits.
    """
    rot = rotate_acc(acc, p, mask1, minus_one=True,
                     skip_low_bits=skip_low_bits)
    if axis_name is None and decomp_length == 2 and radix8:
        # l=2 fast path: decomposition + SWAR packing fused, elementwise
        # on ``rot`` (raw convention, radix-8 forward only) — the digits
        # array is never materialized; with no slot sharding the CMUX
        # accumulator add fuses into the inverse's output emission
        packed = decomp_pack2(rot, mask1, log2_base, offset)
        if slot_axis_name is None:
            return transformed_mac(
                None, rhs, mask1=mask1, g_total=mask1 * decomp_length,
                mac_dtype=mac_dtype, packed=packed, radix8=radix8,
                acc=acc, channel_split=channel_split).astype(jnp.int32)
        delta = transformed_mac(
            None, rhs, mask1=mask1, g_total=mask1 * decomp_length,
            mac_dtype=mac_dtype, slot_axis_name=slot_axis_name,
            packed=packed, radix8=radix8)
        return (acc + delta).astype(jnp.int32)
    digits = gadget_decomp(rot, mask1, decomp_length, log2_base, offset)
    if axis_name is not None:
        g_total = rhs.shape[-2] // (2 * R)
        b = digits.shape[-1]
        start = jax.lax.axis_index(axis_name) * g_total
        dv = digits.reshape(M, mask1 * decomp_length, R, b)
        dv = jax.lax.dynamic_slice_in_dim(dv, start, g_total, axis=1)
        digits = dv.reshape(M * g_total * R, b)
    else:
        g_total = mask1 * decomp_length
    delta = transformed_mac(
        digits, rhs, mask1=mask1, g_total=g_total, mac_dtype=mac_dtype,
        axis_name=axis_name, slot_axis_name=slot_axis_name, radix8=radix8,
        channel_split=channel_split and axis_name is None
        and slot_axis_name is None)
    return (acc + delta).astype(jnp.int32)


# --- layout conversion (XLA level, once per blind rotate) ---

def acc_rows_from_n(x):
    """(B, mask1, N) coefficient order -> (mask1*1024, B) rows (j, o, i)."""
    bsz, mask1, n = x.shape
    v = x.reshape(bsz, mask1, R, M)          # [b, o, i, j]
    v = jnp.transpose(v, (3, 1, 2, 0))       # [j, o, i, b]
    return v.reshape(mask1 * n, bsz)


def acc_n_from_rows(x, mask1):
    """Inverse of ``acc_rows_from_n``."""
    bsz = x.shape[-1]
    v = x.reshape(M, mask1, R, bsz)
    v = jnp.transpose(v, (3, 1, 2, 0))       # [b, o, i, j]
    return v.reshape(bsz, mask1, N)
