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
- the unscaled inverse transform runs on a redundant two-channel i32
  representation of mod-2^38 values (lo 19 bits / hi 19 bits, lazily
  carried); i32 wraparound keeps everything exact mod 2^32 (and hi is only
  needed mod 2^19), so no carry logic appears inside butterflies; a single
  normalization at extraction recovers the exact product mod 2^32.

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

# Limb formats.  Both MAC operands are 8-bit (int8 or bf16-exact):
# key side: 5 balanced radix-2^8 limbs cover mod-2^38 values;
# acc side: 2 limbs cover the forward-transformed digits (|.| <= 2^14).
KEY_LIMB_BITS = 8
KEY_LIMBS = 5
ACC_LIMB_BITS = 8
ACC_LIMBS = 2
SHIFT_GROUPS = 5          # output shift groups s: value = sum_s 2^(8s) P_s
_LO_BITS = 19             # dual-channel split of mod-2^38 values


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


def mac_lhs(ahat, dtype=None):
    """Split forward-transformed digits into the MAC lhs operand.

    :param ahat: (..., G, L, R) int32, |values| <= 2^14.
    :returns: (..., L, C) bf16 (exact: |limbs| <= 128) with
        C = G*ACC_LIMBS*R, flat index
        c = g*(2R) + i*R + u  (G leading so tensor-parallel shards slice
        contiguous g-blocks).
    """
    if dtype is None:
        dtype = mac_dtype()
    a0 = ((ahat + 128) & 255) - 128                 # [-128, 127]
    a1 = (ahat - a0) >> ACC_LIMB_BITS               # [-64, 64]
    al = jnp.stack([a0, a1], axis=-2)               # (..., G, L, i, R)
    al = jnp.moveaxis(al, -4, -3)                   # (..., L, G, i, R)
    g = ahat.shape[-3]
    return al.reshape(al.shape[:-3] + (g * ACC_LIMBS * R,)).astype(dtype)


def external_product_mac(lhs, rhs_unsigned):
    """The MXU MAC: out[..., l, q] = sum_c lhs[..., l, c] * rhs[l, c, q].

    bf16 x bf16 with f32 accumulation — exact integer arithmetic: operands
    are 8-bit integers (|.| <= 128), products <= 2^14, partial sums over
    C <= 512 terms stay below 2^24.  ``rhs_unsigned`` is int8 from
    ``build_mac_rhs``; signs applied here.
    """
    rhs = rhs_unsigned.astype(mac_dtype()) * sign_mask(
        rhs_unsigned.shape[-2], rhs_unsigned.shape[-1])
    if rhs.ndim == 3:
        out = jnp.einsum('...lc,lcq->...lq', lhs, rhs,
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum('...lc,...lcq->...lq', lhs, rhs,
                         preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def recombine_dual(out, mask1):
    """Shift-group partials -> dual-channel mod-2^38 accumulators.

    :param out: (..., L, Q) int32 MAC output, Q = SHIFT_GROUPS*O*R with flat
        q = s*(O*R) + o*R + k; partials |P_s| <= 2^22.
    :returns: (lo, hi): (..., O, L, R) int32 channels of
        V = sum_s 2^(8s) P_s, V = lo + 2^19 hi; lo exact (|lo| < 3*2^19),
        hi correct mod 2^19 (wraparound-safe).
    """
    v = out.reshape(out.shape[:-2] + (L, SHIFT_GROUPS, mask1, R))
    v = jnp.moveaxis(v, -2, -4)                     # (..., O, L, S, R)
    lo = None
    hi = None
    for s in range(SHIFT_GROUPS):
        p = v[..., s, :]
        shift = KEY_LIMB_BITS * s
        if shift < _LO_BITS:
            rem = _LO_BITS - shift
            hi_c = p >> rem
            lo_c = (p & ((1 << rem) - 1)) << shift
            lo = lo_c if lo is None else lo + lo_c
        else:
            hi_c = p << (shift - _LO_BITS)
        hi = hi_c if hi is None else hi + hi_c
    return lo, hi


def inverse_dual(lo, hi):
    """Unscaled inverse transform + fold + extraction.

    :param lo, hi: (..., L, R) int32 dual-channel mod-2^38 values.
    :returns: (..., N) int32: the exact negacyclic product mod 2^32
        (i.e. (value >> 6) mod 2^32).
    """
    lo = dft_stages(lo, inverse=True)
    hi = dft_stages(hi, inverse=True)
    # fold C_j = P_j + Y * P_{j+M}
    lo = lo[..., :M, :] + _yshift(lo[..., M:, :], 1)
    hi = hi[..., :M, :] + _yshift(hi[..., M:, :], 1)
    # normalize: V = lo + 2^19 hi  (mod 2^38); result = (V >> 6) mod 2^32
    carry = lo >> _LO_BITS
    lo_n = lo - (carry << _LO_BITS)          # in [0, 2^19)
    hi_n = (hi + carry) & ((1 << _LO_BITS) - 1)
    res = (lo_n >> INV_SHIFT) | (hi_n << (_LO_BITS - INV_SHIFT))
    # reorder: res[j, i] over (M, R); output index is i*M + j
    out = jnp.swapaxes(res, -1, -2)
    return out.reshape(out.shape[:-2] + (N,)).astype(jnp.int32)


# --- key preparation (host limb split + device negacyclic expansion) ---


def key_limbs_host(bhat_u64):
    """Host-side: split key transforms (residues mod 2^64, needed mod 2^38)
    into KEY_LIMBS balanced radix-2^8 limbs.

    :param bhat_u64: numpy uint64, output of ``ref.transform_ref.forward``.
    :returns: numpy int8 (..., KEY_LIMBS), exact: |limbs| <= 128.
    """
    v = (bhat_u64 & np.uint64(2**38 - 1)).astype(np.int64)
    v = v - ((v >> 37) << 38)  # center into [-2^37, 2^37)
    limbs = []
    for _ in range(KEY_LIMBS):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0.astype(np.int8))
        v = (v - l0) >> KEY_LIMB_BITS
    return np.stack(limbs, axis=-1)


def mac_dtype():
    """MAC operand dtype: bf16 on TPU (MXU-native), f32 elsewhere (the CPU
    backend has no bf16 dot).  Both are exact for 8-bit integer operands
    with f32 accumulation."""
    return jnp.bfloat16 if jax.default_backend() == 'tpu' else jnp.float32


def sign_mask(c_size: int, q_size: int):
    """The negacyclic sign pattern sgn(u, k) = +1 if k >= u else -1, tiled
    over the (C, Q) MAC operand layout (u = c mod R, k = q mod R).

    Signs are applied at matmul time (bf16) rather than baked into the
    stored int8 rhs: limb value -128 negates to +128, which int8 cannot
    hold but bf16 represents exactly.
    """
    u = np.arange(c_size) % R
    k = np.arange(q_size) % R
    sgn = np.where(k[None, :] >= u[:, None], 1.0, -1.0).astype(np.float32)
    return jnp.asarray(sgn, mac_dtype())


def build_mac_rhs(limbs):
    """Device-side: compact transformed-key limbs -> the MAC rhs operand
    (unsigned-rotation form; apply ``sign_mask`` at matmul time).

    rhs[..., t, c, q] with c = g*(2R) + i*R + u, q = s*(O*R) + o*R + k is
    limbs[g, o, t, (k-u)%R, s-i] (zero outside 0 <= s-i < KEY_LIMBS), so
    that sign_mask * rhs is the (u -> k) negacyclic-multiplication matrix
    of bhat[g, o, t] limb (s - i).  Expansion is R static rolls (matrix row
    u is the limb vector rotated by u) — no gathers.

    :param limbs: (..., G, O, L, R, KEY_LIMBS) int8 device array.
    :returns: (..., L, G*2R, SHIFT_GROUPS*O*R) int8.
    """
    g, o_sz = limbs.shape[-5], limbs.shape[-4]
    lead = limbs.shape[:-5]
    # rows[..., u, k, j] = limbs[..., (k-u)%R, j]
    rows = jnp.stack([jnp.roll(jnp.moveaxis(limbs, -1, -2), u, axis=-1)
                      for u in range(R)], axis=-3)   # (..., G,O,L,u,j,k)
    rows = jnp.moveaxis(rows, -2, -1)                # (..., G,O,L,u,k,j)
    zero = jnp.zeros(lead + (g, o_sz, L, R, R), jnp.int8)

    def limb(i, s):
        j = s - i
        if 0 <= j < KEY_LIMBS:
            return rows[..., j]
        return zero

    # arr axes: [i, s] + lead + [G, O, L, u, k]
    arr = jnp.stack(
        [jnp.stack([limb(i, s) for s in range(SHIFT_GROUPS)], axis=0)
         for i in range(ACC_LIMBS)], axis=0)
    nl = len(lead)
    i_ax, s_ax = 0, 1
    g_ax, o_ax, l_ax, u_ax, k_ax = (2 + nl, 3 + nl, 4 + nl, 5 + nl, 6 + nl)
    # target: lead + [L, (G, i, u), (S, O, k)]
    perm = (tuple(range(2, 2 + nl))
            + (l_ax, g_ax, i_ax, u_ax, s_ax, o_ax, k_ax))
    arr = jnp.transpose(arr, perm)
    return arr.reshape(
        lead + (L, g * ACC_LIMBS * R, SHIFT_GROUPS * o_sz * R))


def negacyclic_mul_device(a, b_coeff):
    """Standalone exact negacyclic product on device (tests/API parity).

    a: (..., N) int32 small digits (|a| <= 2^9); b_coeff: (..., N) int32
    arbitrary torus values (key side, transformed on host).
    """
    ahat = forward_i32(a)[..., None, :, :]           # G = 1
    lhs = mac_lhs(ahat)
    bh = tr.forward(np.asarray(b_coeff))             # (..., L, R) u64
    limbs = key_limbs_host(bh)[..., None, None, :, :, :]  # (..., G=1,O=1,L,R,KL)
    rhs = build_mac_rhs(jnp.asarray(limbs))
    out = external_product_mac(lhs, rhs)
    lo, hi = recombine_dual(out, mask1=1)
    return inverse_dual(lo[..., 0, :, :], hi[..., 0, :, :])
