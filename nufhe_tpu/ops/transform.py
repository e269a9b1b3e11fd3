"""Device (JAX) implementation of the exact negacyclic transform engine.

Same mathematics as ``ref/transform_ref.py`` (Nussbaumer, N=1024, m=r=32,
L=64), engineered for TPU:

- the forward transform of *decomposed* polynomials (digits in [-512, 512))
  is exact in plain int32: six butterfly stages whose twiddles are negacyclic
  shifts, compiled to static gathers + sign flips (VPU data movement);
- the key-side transform is precomputed on the host mod 2^38 and stored as
  **balanced radix-2^10 limbs**, so the transform-domain MAC becomes a small
  number of bf16 matmuls with f32 accumulation that are *exactly* integer
  (products <= 2^17, sums <= 2^23 < 2^24) — this is what rides the MXU;
- the unscaled inverse transform runs on a redundant two-channel i32
  representation of mod-2^38 values (lo 19 bits / hi 19 bits, lazily
  carried), so no carry logic appears inside butterflies; a single
  normalization at extraction recovers the exact product mod 2^32.

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

# Limb formats.  bf16 has an 8-bit mantissa: integers with |v| <= 2^8 are
# exact, so every limb is balanced radix-2^8 (|limb| <= 128).
# key side: 5 limbs cover +-2^39 > 2^38; accumulator side: 2 limbs cover 2^15.
KEY_LIMB_BITS = 8
KEY_LIMBS = 5
ACC_LIMB_BITS = 8
ACC_LIMBS = 2
# limb pairs kept in the MAC: shift = 8*(i+j) < 38  (9 pairs, 5 shift groups)
MAC_PAIRS = tuple(
    (i, j, ACC_LIMB_BITS * i + KEY_LIMB_BITS * j)
    for i in range(ACC_LIMBS) for j in range(KEY_LIMBS)
    if ACC_LIMB_BITS * i + KEY_LIMB_BITS * j < 38)

_LO_BITS = 19  # dual-channel split of mod-2^38 values


def _bitrev(t, bits):
    out = 0
    for b in range(bits):
        out |= ((t >> b) & 1) << (bits - 1 - b)
    return out


def _build_stage_tables(inverse):
    """Per-stage flat gather tables for the L-point DFT over S'.

    Each stage maps flat (L*R,) -> (L*R,):
        new[f] = old[I1[f]] + S2[f] * old[I2[f]]
    (first term always has sign +1).  The initial bit-reversal permutation is
    folded into stage 0's indices.  Structure identical to
    ``ref/transform_ref._dft_l``.
    """
    base = -1 if inverse else 1
    stages = []
    for s in range(LOG_L):
        mmax = 1 << s
        istep = mmax * 2
        i1 = np.zeros(L * R, np.int32)
        i2 = np.zeros(L * R, np.int32)
        s2 = np.zeros(L * R, np.int32)
        for t in range(L):
            pos = t % istep
            if pos < mmax:
                i_slot, j_slot, m, sigma = t, t + mmax, pos, 1
            else:
                i_slot, j_slot, m, sigma = t - mmax, t, pos - mmax, -1
            e = (base * m * (1 << (LOG_L - s - 1))) % (2 * R)
            p1, p2 = i_slot, j_slot
            if s == 0:  # fold bit-reversal into the reads
                p1, p2 = _bitrev(p1, LOG_L), _bitrev(p2, LOG_L)
            for k in range(R):
                f = t * R + k
                i1[f] = p1 * R + k
                q = (k - e) % (2 * R)
                i2[f] = p2 * R + (q % R)
                s2[f] = sigma * (1 if q < R else -1)
        stages.append((i1, i2, s2))
    return stages


_FWD_STAGES = _build_stage_tables(inverse=False)
_INV_STAGES = _build_stage_tables(inverse=True)

# fold C_j = P_j + Y * P_{j+M}; flat tables over (M*R,) reading (L*R,)
_FOLD_I1 = np.zeros(M * R, np.int32)
_FOLD_I2 = np.zeros(M * R, np.int32)
_FOLD_S2 = np.zeros(M * R, np.int32)
for _j in range(M):
    for _k in range(R):
        _f = _j * R + _k
        _FOLD_I1[_f] = _j * R + _k
        _q = (_k - 1) % (2 * R)
        _FOLD_I2[_f] = (_j + M) * R + (_q % R)
        _FOLD_S2[_f] = 1 if _q < R else -1


def _apply_stages(flat, stages):
    """flat: (..., L*R) int32; applies the butterfly stage tables."""
    for i1, i2, s2 in stages:
        flat = jnp.take(flat, i1, axis=-1) + jnp.take(flat, i2, axis=-1) * s2
    return flat


def forward_i32(x):
    """Forward transform of small-integer polynomials (exact in int32).

    :param x: (..., N) int32 with |values| <= 2^25 (so six doubling stages
        stay inside int32); the bootstrap uses digits in [-512, 512).
    :returns: (..., L, R) int32.
    """
    blocks = x.reshape(x.shape[:-1] + (R, M))       # [i, j]
    A = jnp.swapaxes(blocks, -1, -2)                # [j, i] = A_j vectors
    padded = jnp.concatenate(
        [A, jnp.zeros(A.shape[:-2] + (L - M, R), x.dtype)], axis=-2)
    flat = padded.reshape(padded.shape[:-2] + (L * R,))
    flat = _apply_stages(flat, _FWD_STAGES)
    return flat.reshape(flat.shape[:-1] + (L, R))


def acc_limbs(ahat):
    """Split forward-transformed digits into 2 balanced radix-2^8 bf16 limbs.

    :param ahat: (..., L, R) int32, |values| <= 2^14.
    :returns: (..., L, R, ACC_LIMBS) bfloat16 (exact: |limbs| <= 128).
    """
    a0 = ((ahat + 128) & 255) - 128
    a1 = (ahat - a0) >> ACC_LIMB_BITS
    return jnp.stack([a0, a1], axis=-1).astype(jnp.bfloat16)


def key_limbs_host(bhat_u64):
    """Host-side: split key transforms (residues mod 2^64, needed mod 2^38)
    into KEY_LIMBS balanced radix-2^8 limbs.

    :param bhat_u64: numpy uint64, output of ``ref.transform_ref.forward``.
    :returns: numpy int16 (..., KEY_LIMBS), exact: |limbs| <= 128.
    """
    v = (bhat_u64 & np.uint64(2**38 - 1)).astype(np.int64)
    v = v - ((v >> 37) << 38)  # center into [-2^37, 2^37)
    limbs = []
    for _ in range(KEY_LIMBS):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0.astype(np.int16))
        v = (v - l0) >> KEY_LIMB_BITS
    return np.stack(limbs, axis=-1)


def _dual_channel_from_partials(partials):
    """Combine shift-grouped MAC partials into (lo, hi) i32 channels.

    value = sum_s partials[s] * 2^s  (mod 2^38), represented as
    lo + 2^19 * hi with lazy carries.
    """
    lo = None
    hi = None
    for shift, p in partials:
        if shift < _LO_BITS:
            rem = _LO_BITS - shift
            hi_c = p >> rem
            lo_c = (p & ((1 << rem) - 1)) << shift
        else:
            hi_c = p << (shift - _LO_BITS)
            lo_c = None
        lo = lo_c if lo is None else (lo if lo_c is None else lo + lo_c)
        hi = hi_c if hi is None else hi + hi_c
    return lo, hi


def inverse_dual(lo, hi):
    """Unscaled inverse transform + fold + extraction.

    :param lo, hi: (..., L, R) int32 dual-channel mod-2^38 values
        (|channel| <= 2^22 so six doubling stages stay exact).
    :returns: (..., N) int32: the exact negacyclic product mod 2^32
        (i.e. (value >> 6) mod 2^32).
    """
    lo = lo.reshape(lo.shape[:-2] + (L * R,))
    hi = hi.reshape(hi.shape[:-2] + (L * R,))
    lo = _apply_stages(lo, _INV_STAGES)
    hi = _apply_stages(hi, _INV_STAGES)
    # fold
    lo = jnp.take(lo, _FOLD_I1, axis=-1) + jnp.take(lo, _FOLD_I2, axis=-1) * _FOLD_S2
    hi = jnp.take(hi, _FOLD_I1, axis=-1) + jnp.take(hi, _FOLD_I2, axis=-1) * _FOLD_S2
    # normalize: V = lo + 2^19 hi  (mod 2^38); result = (V >> 6) mod 2^32
    carry = lo >> _LO_BITS
    lo_n = lo - (carry << _LO_BITS)          # in [0, 2^19)
    hi_n = (hi + carry) & ((1 << _LO_BITS) - 1)
    res = (lo_n >> INV_SHIFT) | (hi_n << (_LO_BITS - INV_SHIFT))
    # reorder: res is C_j[i] over flat (j*R + i); output index is i*M + j
    out = res.reshape(res.shape[:-1] + (M, R))
    out = jnp.swapaxes(out, -1, -2)
    return out.reshape(out.shape[:-2] + (N,)).astype(jnp.int32)


def mac_partials(ahat_l, key_l):
    """Transform-domain multiply-accumulate, limb-decomposed.

    :param ahat_l: (..., G, L, R, ACC_LIMBS) bf16 — forward-transformed,
        limb-split decomposition digits; G = (mask_size+1)*decomp_length.
    :param key_l: (G, O, L, R, R, KEY_LIMBS) bf16 — negacyclic-expanded,
        limb-split key row: key_l[g, o, t, u, k] is the (u, k) entry of the
        S'-multiplication matrix of bhat[g, o, t].
    :returns: list of (shift, (..., O, L, R) int32 partials), shift-grouped.
    """
    outs = {}
    for i, j, shift in MAC_PAIRS:
        p = jnp.einsum(
            '...gtu,gotuk->...otk',
            ahat_l[..., i], key_l[..., j],
            preferred_element_type=jnp.float32).astype(jnp.int32)
        outs[shift] = outs.get(shift, 0) + p
    return sorted(outs.items())


def external_mac(ahat_l, key_l):
    """Full transform-domain MAC -> dual-channel accumulators."""
    return _dual_channel_from_partials(mac_partials(ahat_l, key_l))


# --- host-side helpers for key preparation ---

_NEGA_IDX = np.zeros((R, R), np.int64)
_NEGA_SGN = np.zeros((R, R), np.int64)
for _u in range(R):
    for _k in range(R):
        _NEGA_IDX[_u, _k] = (_k - _u) % R
        _NEGA_SGN[_u, _k] = 1 if _k >= _u else -1


def expand_key_limbs_host(limbs):
    """(..., R, KEY_LIMBS) int16 -> (..., R(u), R(k), KEY_LIMBS) bf16 matrices.

    mat[u, k] = sgn(u, k) * limbs[(k - u) mod R]: the matrix of
    "negacyclic convolution by this vector" used by the MAC einsum.
    """
    expanded = limbs[..., _NEGA_IDX, :] * _NEGA_SGN[..., None].astype(np.int16)
    return expanded


def negacyclic_mul_device(a, b_coeff):
    """Standalone exact negacyclic product on device (for tests/API parity).

    a: (..., N) int32 small digits (|a| <= 2^14 after transform);
    b_coeff: (..., N) int32 arbitrary torus values (key side, transformed on
    host).
    """
    ahat = forward_i32(a)
    al = acc_limbs(ahat)
    bh = tr.forward(np.asarray(b_coeff))
    kl = key_limbs_host(bh)
    ke = jnp.asarray(
        expand_key_limbs_host(kl).astype(np.float32), jnp.bfloat16)
    partials = {}
    for i, j, shift in MAC_PAIRS:
        p = jnp.einsum(
            '...tu,...tuk->...tk', al[..., i], ke[..., j],
            preferred_element_type=jnp.float32).astype(jnp.int32)
        partials[shift] = partials.get(shift, 0) + p
    lo, hi = _dual_channel_from_partials(sorted(partials.items()))
    return inverse_dual(lo, hi)
