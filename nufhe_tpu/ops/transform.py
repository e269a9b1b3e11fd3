"""Device (JAX) implementation of the exact negacyclic transform engine.

Same mathematics as ``ref/transform_ref.py`` (Nussbaumer, N=1024, m=r=32,
L=64), engineered for TPU:

- the forward transform of *decomposed* polynomials (digits in [-512, 512))
  is exact in plain int32: six butterfly stages whose twiddles are negacyclic
  shifts.  Twiddle amounts depend linearly on the butterfly index m, so each
  stage is a handful of *static* slice/concat rolls plus index-mask selects —
  pure VPU data movement, **no gathers** (XLA:TPU lowers per-element gathers
  ~30x slower than static slicing);
- the transform-domain MAC is ONE batched matmul per bootstrap-key row:
  ``(B, L, C) x (L, C, Q) -> (B, L, Q)`` with C = G*2R (acc limbs x
  decomposition rows x lane) and Q = 5*O*R (shift groups x output polys x
  lane), int8 operands with int32 accumulation (exact: |products| <= 2^14,
  256-term sums <= 2^22) — this is what rides the MXU;
- the unscaled inverse transform runs on a two-channel i32 representation
  of the mod-2^38 MAC values, split at the key: V = 2^6*A + B with
  A = sum(digit * (key >> 6)) carried freely-wrapping mod 2^32 (2^38 =
  2^6 * 2^32, so wrapping A is invisible mod 2^38) and B =
  sum(a0-limb * balanced(key mod 64)) carried exactly (|B| <= 2^18 per
  slot, <= 2^24 after the 64x inverse growth — inside i32).  No carry
  logic or masking appears anywhere; the single extraction
  c = A + (B >> 6) is exact because 2^6 | B (B = 64c - 2^6*A over Z).

Every function here operates on plain jnp *values* (static slices, concats,
selects, dot_general), so the identical code path can execute under jit/XLA
or inside a Pallas kernel on VMEM-resident blocks.

Replaces: reference NTT/FFT kernels (``nufhe/transform/ntt.mako``,
``fft.mako``) and the u64 field arithmetic (``arithmetic.mako``).
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
INV_SHIFT = tr.INV_SHIFT  # inverse transform is unscaled by 2^6

# Limb formats.  Both MAC operands are 8-bit int8 (f32-exact fallback).
# Key side: the mod-2^38 value is split at the INV_SHIFT boundary,
# v = 2^6*vhi + vlo with vlo = balanced(v mod 64) in [-32, 31] and
# vhi carried mod 2^32 as 4 balanced radix-2^8 limbs (limb index 1..4 of
# the stored array; index 0 is vlo).  Acc side: 2 limbs cover the
# forward-transformed digits (|.| <= 2^14).
KEY_LIMB_BITS = 8
KEY_LIMBS = 5             # vlo + 4 vhi limbs
ACC_LIMB_BITS = 8
ACC_LIMBS = 2
# Output shift groups on the MAC Q axis: group 0 is the exact B channel
# (a0 x vlo products, weight 2^0); groups 1..4 are the A channel's
# radix-2^8 pieces (weight 2^(8(s-1)) toward A, overall weight 2^6*2^(8(s-1)))
SHIFT_GROUPS = 5
# Approximate (rounded-key) mode — the transform_type='FFT' engine: the
# key spectrum is rounded to multiples of 2^6 at key preparation
# (vhi = round(v/64), a per-slot error in [-32, 31]), the B channel
# disappears entirely, and the four vhi limbs ARE the four output groups
# (A carried mod 2^32; delta = A_inv directly, no extraction shift).
# This is a tracked speed/noise trade the reference does NOT make: the
# reference's f64 FFT is exact for TFHE magnitudes (53-bit significand vs
# <2^52 products, implementation_details.rst:66), while this mode injects
# a measured ~4.3e-6 torus^2 per gate — ~15% extra variance over the
# 500-step bootstrap noise, dominated by a one-time coherent coupling of
# the structured test vector with the fixed key-rounding pattern; tracked
# with 1.5x headroom in ref.bootstrap_ref.blind_rotate_variance
# (exact=False) and statistically pinned by
# tests/test_gates.py::test_gate_noise_within_tracked_variance.
KEY_LIMBS_APPROX = 4
SHIFT_GROUPS_APPROX = 4


def _yshift(p, e):
    """Multiply by Y^e in S' = Z[Y]/(Y^R+1): rotate right along the last
    axis by e with sign flip on wraparound.  Static slices only.
    Mirrors ``ref/transform_ref.yshift``."""
    e = e % (2 * R)
    neg, e = e >= R, e % R
    if e != 0:
        p = jnp.concatenate([-p[..., R - e:], p[..., :R - e]], axis=-1)
    return -p if neg else p


def _bitrev_l(x):
    """Bit-reverse the L axis of (..., L, R): reshape L into LOG_L binary
    axes, reverse their order, reshape back.  A static transpose."""
    lead = x.ndim - 2
    x = x.reshape(x.shape[:-2] + (2,) * LOG_L + (R,))
    perm = (tuple(range(lead))
            + tuple(lead + LOG_L - 1 - i for i in range(LOG_L))
            + (lead + LOG_L,))
    x = jnp.transpose(x, perm)
    return x.reshape(x.shape[:lead] + (L, R))


def dft_stages(x, inverse):
    """L-point Cooley-Tukey DFT over S' with root Y (or Y^-1), on (..., L, R)
    int32 (exact mod 2^32 by wraparound).

    Twiddles Y^(c*m) with c static per stage and m the butterfly index are
    applied via the binary decomposition of m: sub-round b rolls the whole
    tensor by Y^(c*2^b) and selects it where bit b of m is set.  All ops are
    static; structure mirrors ``ref/transform_ref._dft_l``.
    """
    x = _bitrev_l(x)
    base = -1 if inverse else 1
    for s in range(LOG_L):
        mmax = 1 << s
        nblk = L // (2 * mmax)
        c = base * (1 << (LOG_L - s - 1))
        v = x.reshape(x.shape[:-2] + (nblk, 2, mmax, R))
        lo = v[..., 0, :, :]
        hi = v[..., 1, :, :]
        for b in range(s):
            rolled = _yshift(hi, c * (1 << b))
            mbit = (np.arange(mmax) >> b) & 1
            mbit = jnp.asarray(mbit.astype(bool)).reshape(mmax, 1)
            hi = jnp.where(mbit, rolled, hi)
        x = jnp.stack([lo + hi, lo - hi], axis=-3)
        x = x.reshape(x.shape[:-4] + (L, R))
    return x


def forward_i32(x):
    """Forward transform of small-integer polynomials (exact in int32).

    :param x: (..., N) int32 with |values| <= 2^25 (six doubling stages stay
        inside int32); the bootstrap uses digits in [-512, 512).
    :returns: (..., L, R) int32, |values| <= 32 * |x|.
    """
    blocks = x.reshape(x.shape[:-1] + (R, M))       # [i, j]
    A = jnp.swapaxes(blocks, -1, -2)                # [j, i] = A_j vectors
    padded = jnp.concatenate(
        [A, jnp.zeros(A.shape[:-2] + (L - M, R), x.dtype)], axis=-2)
    return dft_stages(padded, inverse=False)





# --- key preparation (host limb split + device negacyclic expansion) ---


def _limb_split_38(v, exact=True):
    """A/B split of centered int64 values in [-2^37, 2^37): limb 0 is
    vlo = balanced(v mod 64) in [-32, 31]; limbs 1..4 are balanced
    radix-2^8 digits of vhi = (v - vlo) >> 6, valid mod 2^32 (the top
    digit is truncated — the A channel wraps freely).

    ``exact=False`` (the rounded-key / 'FFT' mode): vlo is DROPPED — the
    value is rounded to vhi = round(v / 64) and only the 4 vhi limbs are
    emitted (the per-slot error in [-32, 31] becomes tracked key noise —
    a speed/noise trade the reference's exact-for-TFHE f64 FFT path does
    not make; see the module header)."""
    if exact:
        vlo = ((v + 32) & 63) - 32
        limbs = [vlo.astype(np.int8)]
        v = (v - vlo) >> 6
        n_rest = KEY_LIMBS - 1
    else:
        limbs = []
        v = (v + 32) >> 6                    # round to nearest multiple of 64
        n_rest = KEY_LIMBS_APPROX
    for _ in range(n_rest):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0.astype(np.int8))
        v = (v - l0) >> KEY_LIMB_BITS
    return np.stack(limbs, axis=-1)


def relimb_from_radix8(old):
    """Convert format-2 (round-2 containers) plain balanced radix-2^8
    two-sided key limbs to the current A/B form.  The 5-digit balanced
    split reconstructs the centered mod-2^38 value exactly (|v| < 2^37),
    so this is a lossless host-side re-split.

    :param old: int8 (..., KEY_LIMBS, 2) in the old format.
    :returns: int8 (..., KEY_LIMBS, 2) in the A/B format.
    """
    old = np.asarray(old)
    v = np.zeros(old.shape[:-2] + (2,), np.int64)
    for j in reversed(range(KEY_LIMBS)):
        v = (v << KEY_LIMB_BITS) + old[..., j, :].astype(np.int64)
    return np.stack(
        [_limb_split_38(v[..., 0]), _limb_split_38(v[..., 1])], axis=-1)


def key_limbs_host(bhat_u64, exact=True):
    """Host-side: split key transforms (residues mod 2^64, needed mod 2^38)
    into the A/B limb form (vlo + 4 vhi limbs, see ``_limb_split_38``) —
    TWO-SIDED: limbs of +v and of (-v mod 2^38).

    The negacyclic expansion needs sgn(u, k) * v per rhs entry.  Negating a
    limb vector at runtime would produce +128 (unrepresentable in int8)
    whenever a limb is -128; storing separate plain decompositions of +v
    and -v sidesteps that entirely — every stored digit is in [-128, 127]
    and nothing is negated after this point, enabling the direct int8 MXU
    MAC with int32 accumulation.

    :param bhat_u64: numpy uint64, output of ``ref.transform_ref.forward``.
    :param exact: False = rounded-key ('FFT') mode — 4 vhi limbs per side,
        vlo dropped as key noise (see ``_limb_split_38``).
    :returns: numpy int8 (..., KEY_LIMBS, 2) (exact) or
        (..., KEY_LIMBS_APPROX, 2); [..., 0] = limbs(+v),
        [..., 1] = limbs(-v mod 2^38), each side rounded independently.
    """
    r = bhat_u64 & np.uint64(2**38 - 1)
    v = r.astype(np.int64)
    v = v - ((v >> 37) << 38)                    # center into [-2^37, 2^37)
    w = ((np.uint64(2**38) - r) & np.uint64(2**38 - 1)).astype(np.int64)
    w = w - ((w >> 37) << 38)
    return np.stack([_limb_split_38(v, exact), _limb_split_38(w, exact)],
                    axis=-1)


def one_sided_limbs_host(limbs):
    """Compact (serialized / uploaded) form of the two-sided limb split:
    the +v side only, plus — rounded mode only — ONE correction bit per
    slot.  The -v side is fully derivable (``two_sided_limbs_device``):

    - exact mode: v = vlo + 64*vhi reconstructs v mod 2^38 losslessly, so
      the negative side is wlo = -vlo (with the single boundary case
      vlo = -32 -> wlo = -32, carry 1) and whi = -vhi + carry mod 2^32;
    - rounded mode: the two sides were rounded INDEPENDENTLY
      (q± = floor((±v + 32)/64)), which differ from plain negation by
      delta = [v = -32 mod 64]: q- = -q+ + delta.  delta is recovered here
      as (q+ + q-) mod 2^32 from the stored sides.

    Halves the container and the host->device transfer vs the two-sided
    form (the reference ships its full transformed key,
    ``nufhe/tgsw.py:99-130``; there is no analogue of this compaction).

    :param limbs: int8 (..., KEY_LIMBS[_APPROX], 2) from
        :func:`key_limbs_host`.
    :returns: (pos, delta): ``pos`` int8 (..., KEY_LIMBS[_APPROX]);
        ``delta`` uint8 0/1 of ``pos.shape[:-1]`` (rounded mode) or None.
    """
    limbs = np.asarray(limbs)
    pos = np.ascontiguousarray(limbs[..., 0])
    if limbs.shape[-2] == KEY_LIMBS:
        return pos, None
    w = (np.arange(KEY_LIMBS_APPROX, dtype=np.int64) * KEY_LIMB_BITS)
    qp = (limbs[..., 0].astype(np.int64) << w).sum(-1)
    qn = (limbs[..., 1].astype(np.int64) << w).sum(-1)
    delta64 = (qp + qn) & np.int64(0xFFFFFFFF)
    if delta64.size and delta64.max() > 1:
        raise ValueError("inconsistent two-sided limbs (delta not 0/1)")
    return pos, delta64.astype(np.uint8)


def _neg_side_digits(whi, n_digs, xp):
    """Balanced radix-2^8 digits of ``whi`` (mod 2^32 semantics); ``xp``
    is numpy (int64 host path) or jnp (int32 device path — wraparound is
    the mod-2^32 arithmetic, and digits 0..3 depend only on the low 32
    bits, so both agree bit-exactly)."""
    digs = []
    w = whi
    for _ in range(n_digs):
        d = ((w + 128) & 255) - 128
        digs.append(d.astype(xp.int8))
        w = (w - d) >> KEY_LIMB_BITS
    return digs


def two_sided_limbs_device(pos, delta=None):
    """Device inverse of :func:`one_sided_limbs_host`: rebuild the
    (..., KL, 2) int8 two-sided form from the +v side, in pure int32
    (TPU-native; the i32 wraparound IS the required mod-2^32 arithmetic).
    Bit-equal to :func:`key_limbs_host` — asserted by
    ``tests/test_transform_ref.py``.

    :param pos: (..., KEY_LIMBS[_APPROX]) int8 (host or device).
    :param delta: (...,) 0/1 array (rounded mode), else None.
    """
    pos = jnp.asarray(pos)
    exact = pos.shape[-1] == KEY_LIMBS
    p32 = pos.astype(jnp.int32)
    if exact:
        vlo = p32[..., 0]
        digs = p32[..., 1:]
        boundary = vlo == -32
        carry = jnp.where(boundary, jnp.int32(1), jnp.int32(0))
        wlo = jnp.where(boundary, jnp.int32(-32), -vlo)
    else:
        if delta is None:
            raise ValueError("rounded-mode compact limbs need delta bits")
        digs = p32
        carry = jnp.asarray(delta).astype(jnp.int32)
    n_digs = digs.shape[-1]
    vhi = jnp.zeros(digs.shape[:-1], jnp.int32)
    for j in range(n_digs):
        vhi = vhi + (digs[..., j] << (KEY_LIMB_BITS * j))
    neg = ([wlo.astype(jnp.int8)] if exact else []) + \
        _neg_side_digits(carry - vhi, n_digs, jnp)
    return jnp.stack([pos, jnp.stack(neg, axis=-1)], axis=-1)


def two_sided_limbs_host(pos, delta=None):
    """Host (numpy) twin of :func:`two_sided_limbs_device` — used to
    materialize the canonical two-sided form from a compact (format-4)
    container without touching the device."""
    pos = np.asarray(pos)
    exact = pos.shape[-1] == KEY_LIMBS
    p64 = pos.astype(np.int64)
    if exact:
        vlo = p64[..., 0]
        digs = p64[..., 1:]
        boundary = vlo == -32
        carry = boundary.astype(np.int64)
        wlo = np.where(boundary, np.int64(-32), -vlo)
    else:
        if delta is None:
            raise ValueError("rounded-mode compact limbs need delta bits")
        digs = p64
        carry = np.asarray(delta).astype(np.int64)
    n_digs = digs.shape[-1]
    w = (np.arange(n_digs, dtype=np.int64) * KEY_LIMB_BITS)
    vhi = (digs << w).sum(-1)
    neg = ([wlo.astype(np.int8)] if exact else []) + \
        _neg_side_digits(carry - vhi, n_digs, np)
    return np.stack([pos, np.stack(neg, axis=-1)], axis=-1)


def mac_dtype():
    """MAC operand dtype: int8 on TPU (native MXU int8 x int8 -> int32,
    2x bf16 peak, no output cast), f32 elsewhere (exact for 8-bit operands:
    |products| <= 2^14, 256-term sums <= 2^22 < 2^24)."""
    return jnp.int8 if jax.default_backend() == 'tpu' else jnp.float32


def mac_accum_dtype(dtype):
    """Accumulator/preferred element type for the MAC dot."""
    return jnp.int32 if jnp.issubdtype(dtype, jnp.integer) else jnp.float32


def _bitrev6(t):
    out = 0
    for b in range(LOG_L):
        out |= ((t >> b) & 1) << (LOG_L - 1 - b)
    return out


BITREV_L = np.array([_bitrev6(t) for t in range(L)])


def build_mac_rhs(limbs, bitrev_order=True, n_groups=None):
    """Device-side: compact two-sided transformed-key limbs -> the MAC rhs
    operand with the negacyclic signs BAKED IN (pure int8; the matmul is a
    direct int8 x int8 -> int32 contraction, no runtime sign mask).

    rhs[..., p, c, q] with c = g*(2R) + i*R + u, q = s*(O*R) + o*R + k
    holds a limb piece of sgn(u, k) * bhat[g, o, t(p)] at rotation (k-u)%R,
    where sgn = +1 if k >= u else -1 — realized by selecting the limbs of
    +v (k >= u) or of -v mod 2^38 (k < u), both plain decompositions
    (see ``key_limbs_host``).  Expansion is R static rolls (matrix row u is
    the limb vector rotated by u) plus a static k-mask select — no gathers.

    Group mapping (v = 2^6*vhi + vlo, d = a0 + 2^8*a1; the product
    d*v = 2^6*A-part + B-part):
      s = 0 (B, weight 2^0):      i=0 -> vlo;          i=1 -> 0
      s = 1 (A_0, weight 2^6):    i=0 -> vhi_0;        i=1 -> 4*vlo
                                  (a1*vlo has weight 2^8 = 2^6*4; the
                                  factor 4 is baked in: 4*vlo in [-128,124])
      s = 2..4 (A_{s-1}):         i=0 -> vhi_{s-1};    i=1 -> vhi_{s-2}
    The a1*vhi_3 product (overall weight 2^6*2^32 = 0 mod 2^38) is dropped
    — the A channel is only needed mod 2^32.

    Rounded-key ('FFT') inputs self-describe: 4 limbs per side means the
    vlo/B channel does not exist, so the groups are simply
      s = 0..3 (A_s):  i=0 -> vhi_s;  i=1 -> vhi_{s-1} (s=0: 0)
    (a1 x vhi_3 dropped — A is only needed mod 2^32) and Q = 4*O*R.

    :param limbs: (..., G, O, L, R, KEY_LIMBS[_APPROX], 2) int8 device
        array; the limb count selects the exact (5) or rounded-key (4)
        group mapping.
    :param bitrev_order: store slot p = key frequency bitrev_6(p), matching
        the DIF-forward/DIT-inverse dataflow of ``ops/flat_engine`` (no
        bit-reversal permutation anywhere on the hot path).
    :param n_groups: shift groups in Q; default = the limb count
        (exact: 5 = SHIFT_GROUPS, B + 4 A pieces, Q = 320;
        rounded: 4 = SHIFT_GROUPS_APPROX, Q = 256).
    :returns: (..., L, G*2R, n_groups*O*R) int8.
    """
    exact = limbs.shape[-2] == KEY_LIMBS
    if n_groups is None:
        n_groups = limbs.shape[-2]
    g, o_sz = limbs.shape[-6], limbs.shape[-5]
    lead = limbs.shape[:-6]
    if bitrev_order:
        limbs = jnp.take(limbs, jnp.asarray(BITREV_L), axis=-4)
    pos = jnp.moveaxis(limbs[..., 0], -1, -2)        # (..., G,O,L,j,r)
    neg = jnp.moveaxis(limbs[..., 1], -1, -2)
    k_idx = np.arange(R)
    # rows[..., u, k, j] = limbs[sgn(u,k)][..., (k-u)%R, j]
    rows = jnp.stack(
        [jnp.where(jnp.asarray(k_idx >= u),
                   jnp.roll(pos, u, axis=-1), jnp.roll(neg, u, axis=-1))
         for u in range(R)], axis=-3)                # (..., G,O,L,u,j,k)
    rows = jnp.moveaxis(rows, -2, -1)                # (..., G,O,L,u,k,j)
    zero = jnp.zeros(lead + (g, o_sz, L, R, R), jnp.int8)

    def limb(i, s):
        if not exact:                   # rounded-key: groups ARE the A limbs
            if i == 0:
                return rows[..., s]     # a0 x vhi_s
            return rows[..., s - 1] if s >= 1 else zero   # a1 x vhi_{s-1}
        if s == 0:                      # B group: a0 x vlo only
            return rows[..., 0] if i == 0 else zero
        if i == 0:                      # a0 x vhi_{s-1}
            return rows[..., s]
        if s == 1:                      # a1 x vlo at A-weight 2^0, factor 4
            return rows[..., 0] * jnp.int8(4)
        return rows[..., s - 1]         # a1 x vhi_{s-2}

    # arr axes: [i, s] + lead + [G, O, L, u, k]
    arr = jnp.stack(
        [jnp.stack([limb(i, s) for s in range(n_groups)], axis=0)
         for i in range(ACC_LIMBS)], axis=0)
    nl = len(lead)
    i_ax, s_ax = 0, 1
    g_ax, o_ax, l_ax, u_ax, k_ax = (2 + nl, 3 + nl, 4 + nl, 5 + nl, 6 + nl)
    # target: lead + [L, (G, i, u), (S, O, k)]
    perm = (tuple(range(2, 2 + nl))
            + (l_ax, g_ax, i_ax, u_ax, s_ax, o_ax, k_ax))
    arr = jnp.transpose(arr, perm)
    return arr.reshape(
        lead + (L, g * ACC_LIMBS * R, n_groups * o_sz * R))


def negacyclic_mul_device(a, b_coeff):
    """Standalone exact BATCHED negacyclic product on device (the facade
    analogue of the reference's batched device transformed-domain ops,
    ``nufhe/polynomial_transform_ntt.py:29-131``).

    a: (..., N) int32 small digits (|a| <= 2^9); b_coeff: (..., N) int32
    arbitrary torus values (key side, transformed on host).  The whole
    batch runs through ONE native host forward call, ONE ``build_mac_rhs``
    expansion and ONE vmapped device MAC program.
    """
    from . import flat_engine as fe
    from .. import native

    a = jnp.asarray(a)
    lead = a.shape[:-1]
    af = a.reshape((-1, N))
    bf = np.asarray(b_coeff).reshape((-1, N))
    bh = native.forward_u64(bf)                      # (B, L, R) u64
    limbs = key_limbs_host(bh)[:, None, None]        # (B, G=1, O=1, L, R, KL, 2)
    rhs = build_mac_rhs(jnp.asarray(limbs))          # (B, L, 2R, 5R)
    sq = fe.q_from_n(af)                             # (B, N)

    def one(sq_i, rhs_i):
        out = fe.transformed_mac_flat(
            sq_i[None], rhs_i, mask1=1, g_total=1, mac_dtype=mac_dtype())
        return fe.n_from_q(out)[0]

    out = jax.vmap(one)(sq, rhs)
    return out.reshape(lead + (N,))
