"""Device (JAX) LWE operations.

Replaces the reference's reikna Computations (``nufhe/lwe_gpu.py``): the
cheap elementwise/reduction ops are plain jnp (XLA fuses them); the
keyswitch — the one memory/compute-heavy op — is reformulated as exact
int8 matmuls on the MXU (digit one-hot masks x 8-bit key limbs, i32
accumulation; every partial sum stays below 2^20 so the arithmetic is
exact integer arithmetic).
"""

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..numeric import Torus32, ErrorFloat

KS_LIMB_BITS = 8
KS_LIMBS = 4


class KeyswitchMeta(NamedTuple):
    """Static (hashable) keyswitch configuration."""
    base: int
    decomp_length: int
    log2_base: int
    input_size: int
    output_size: int


def lwe_encrypt(messages, key, noises_a, noises_b, noise: float):
    """b = message + noise_b + a.s; a = uniform noise.

    Reference kernel: ``nufhe/lwe_gpu.py:186-243``.
    """
    a = noises_a.astype(jnp.int32)
    b = (messages + noises_b + jnp.sum(a * key, axis=-1, dtype=jnp.int32)
         ).astype(jnp.int32)
    cv = jnp.full(b.shape, noise**2, ErrorFloat)
    return a, b, cv


def lwe_decrypt_phase(a, b, key):
    """phase = b - a.s.  Reference kernel: ``nufhe/lwe_gpu.py:246-284``."""
    return (b - jnp.sum(a * key, axis=-1, dtype=jnp.int32)).astype(jnp.int32)


def lwe_linear(source, p, add_to=None):
    """result (+)= p * source, on (a, b, cv) triples.

    Reference kernel: ``nufhe/lwe_gpu.py:287-316``.
    """
    sa, sb, scv = source
    p32 = jnp.int32(p)
    ra, rb = p32 * sa, p32 * sb
    rcv = jnp.float32(p) ** 2 * scv
    if add_to is not None:
        aa, ab, acv = add_to
        ra, rb, rcv = aa + ra, ab + rb, acv + rcv
    return ra.astype(jnp.int32), rb.astype(jnp.int32), rcv.astype(ErrorFloat)


def lwe_noiseless_trivial(mus, lwe_size: int):
    """(0, mu).  Reference kernel: ``nufhe/lwe_gpu.py:319-344``."""
    mus = jnp.asarray(mus, jnp.int32)
    a = jnp.zeros(mus.shape + (lwe_size,), jnp.int32)
    cv = jnp.zeros(mus.shape, ErrorFloat)
    return a, mus, cv


# --- keyswitch ---

# module-level so repeated key preparations (fresh keygen + serialized
# load in one process) reuse one trace cache instead of recompiling
_to_i8 = jax.jit(lambda x: x.astype(jnp.int8))


def _ks_n_pad(output_size):
    # room for out_size 'a' columns, the 'b' column, and the scaled-cv
    # column at index output_size + 1
    return -(-(output_size + 2) // 128) * 128


@jax.jit
def _ks_pack_device(ks_a, ks_b, ks_cv, cv_scale):
    """Device twin of the host KS packing: per nonzero digit value, the
    (rows, out+1) [a | b] table split into KS_LIMBS balanced radix-2^8
    limbs, 128-lane padded, int8 (the MXU-native operand type), in
    L-MAJOR row order (r = j * input_size + i — lets the Pallas kernel
    build its one-hot masks with contiguous lane blocks).  Column
    output_size + 1 of limb plane 0 carries an all-ones marker so the
    nonzero-digit COUNT rides the same one-hot MACs as the data; the
    keyswitch variance table is CONSTANT (alpha^2) on nonzero digits, so
    cv = count * cv_scale exactly (within f32 ulp of the oracle's
    sequential sum).  The i32 digit loop equals the host int64 loop
    bit-exactly (digits 0..3 of an i32 value depend only on its low 32
    bits)."""
    input_size, decomp_length, base, output_size = ks_a.shape
    rows = input_size * decomp_length
    n_pad = _ks_n_pad(output_size)

    ab = jnp.concatenate([ks_a, ks_b[..., None]], axis=-1)
    ab = ab.transpose(2, 1, 0, 3).reshape(base, rows, output_size + 1)[1:]
    v = ab.astype(jnp.int32)
    limbs = []
    for _ in range(KS_LIMBS):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0)
        v = (v - l0) >> KS_LIMB_BITS
    limbs = jnp.stack(limbs, axis=1)     # (base-1, KS_LIMBS, rows, out+1)
    padded = jnp.pad(
        limbs, [(0, 0), (0, 0), (0, 0), (0, n_pad - output_size - 1)])
    del ks_cv, cv_scale
    padded = padded.at[:, 0, :, output_size + 1].set(1)
    return padded.astype(jnp.int8)


def prepare_keyswitch_device(ks_a, ks_b, ks_cv, log2_base: int):
    """Host/device -> device preparation of the keyswitch key for the MXU
    path.

    Packs, for each nonzero digit value v, the (input_size * decomp_length,
    output_size + 1) table of [a | b] entries split into KS_LIMBS balanced
    radix-2^8 limbs (int8), plus the variance table (f32).  Device-resident
    inputs (``ops.keygen.make_keyswitch_key_device``) are packed on device
    with no host round-trip; numpy inputs are packed on host and uploaded
    compactly as int8.

    :returns: dict of device arrays.
    """
    input_size, decomp_length, base, output_size = ks_a.shape
    rows = input_size * decomp_length
    n_pad = _ks_n_pad(output_size)

    # the embedded count column assumes a CONSTANT variance table on
    # nonzero digits (it is: every entry is the same fresh-encryption
    # alpha^2); asserted here so a future non-constant table fails loudly
    # instead of silently tracking the wrong bound
    cv_host = np.asarray(jax.device_get(ks_cv))
    nz = cv_host[:, :, 1:]
    cv_scale = float(nz.max())
    assert cv_scale <= 0 or nz.min() >= cv_scale * (1 - 1e-6), \
        "keyswitch cv table is not constant; count-based cv needs rework"

    if isinstance(ks_a, jax.Array):
        ab_limbs = _ks_pack_device(ks_a, ks_b, jnp.asarray(ks_cv),
                                   jnp.float32(cv_scale))
    else:
        ab = np.concatenate([ks_a, ks_b[..., None]], axis=-1)
        ab = ab.transpose(2, 1, 0, 3).reshape(base, rows, output_size + 1)
        ab = ab[1:]  # digit 0 rows are trivial zero encryptions

        v = ab.astype(np.int64)
        limbs = []
        for _ in range(KS_LIMBS):
            l0 = ((v + 128) & 255) - 128
            limbs.append(l0.astype(np.int16))
            v = (v - l0) >> KS_LIMB_BITS
        limbs = np.stack(limbs, axis=1)  # (base-1, KS_LIMBS, rows, out+1)

        padded = np.zeros(limbs.shape[:-1] + (n_pad,), np.int8)
        padded[..., :output_size + 1] = limbs
        padded[:, 0, :, output_size + 1] = 1
        # upload and keep the compact int8 form (MXU-native operand)
        ab_limbs = _to_i8(jnp.asarray(padded))

    arrays = dict(
        ab_limbs=ab_limbs,
        cv_scale=jnp.float32(cv_scale),
    )
    meta = KeyswitchMeta(
        base=base, decomp_length=decomp_length, log2_base=log2_base,
        input_size=input_size, output_size=output_size)
    return arrays, meta


def keyswitch_digits(source_a, decomp_length: int, log2_base: int):
    """aijs = ((a + prec_offset) >> (32 - (j+1)*log2_base)) & (base-1).

    Reference: ``nufhe/lwe_gpu.mako:66-93`` semantics (arithmetic shifts).
    """
    prec_offset = jnp.int32(2**(32 - (1 + log2_base * decomp_length)))
    shifts = (32 - (np.arange(1, decomp_length + 1)) * log2_base).astype(np.int32)
    shifted = (source_a[..., None] + prec_offset).astype(jnp.int32)
    return (shifted >> shifts) & jnp.int32(2**log2_base - 1)


def lwe_keyswitch(ks_arrays, ks_meta: KeyswitchMeta, source_a, source_b,
                  source_cv=None):
    """result = (0, b) - sum_{l,j} KS[l, j, digit_{l,j}] via exact matmuls.

    :param ks_arrays, ks_meta: output of ``prepare_keyswitch_device``.
    :param source_a: (batch..., input_size) i32; ``source_b``: (batch...,).
    :param source_cv: optional (batch...,) input variances, added to the
        keyswitch noise (the reference drops them, ``nufhe/lwe.py:319``;
        keeping them makes cv a usable noise-budget signal).
    :returns: (a, b, cv) in the output LWE space.
    """
    base = ks_meta.base
    out_size = ks_meta.output_size
    in_size = ks_meta.input_size
    batch_shape = source_b.shape
    log2b = ks_meta.log2_base
    decomp_length = ks_meta.decomp_length

    a2 = source_a.reshape((-1, in_size))
    bsz = a2.shape[0]

    lane_tile = None
    if jax.default_backend() == 'tpu':
        # 1024 measured 5.10 vs 5.60 ms at batch 2^14 (fewer grid cells,
        # larger dots); 2048 needs an i32 digits scratch over VMEM budget
        for t in (1024, 512, 256, 128):
            if bsz % t == 0:
                lane_tile = t
                break
    if lane_tile is not None:
        # native int8 MXU path: the XLA einsum formulation runs int8 dots
        # at the bf16 rate (trace-measured 0.75 ms per einsum, 12 of them
        # = 9.0 of the op's 10.4 ms at batch 2^14); the Pallas kernel
        # halves the MAC time and keeps the one-hot masks in VMEM
        from .pallas import keyswitch as pks
        total = pks.keyswitch_mac(a2, ks_arrays["ab_limbs"], ks_meta,
                                  lane_tile=lane_tile)
    else:
        # l-major digits (r = j*in_size + i), matching the packed rows;
        # int8 one-hot x int8 limb with exact i32 accumulation (products
        # <= 127, 8192-term sums <= 2^20)
        prec = jnp.int32(2 ** (32 - (1 + log2b * decomp_length)))
        dmask = jnp.int32(2 ** log2b - 1)
        shifted = a2 + prec
        digits = jnp.concatenate(
            [((shifted >> (32 - (j + 1) * log2b)) & dmask)
             for j in range(decomp_length)], axis=-1).astype(jnp.int8)
        total = 0
        for v in range(1, base):
            mask_i8 = (digits == v).astype(jnp.int8)
            for limb in range(KS_LIMBS):
                p = jnp.einsum(
                    'br,rn->bn', mask_i8, ks_arrays["ab_limbs"][v - 1, limb],
                    preferred_element_type=jnp.int32)
                total = total + (p << (KS_LIMB_BITS * limb))

    result_a = (-total[:, :out_size]).reshape(batch_shape + (out_size,))
    result_b = (source_b.reshape(-1) - total[:, out_size]).astype(jnp.int32)
    # the nonzero-digit count rides column out_size+1 (limb plane 0 only),
    # and the variance table is constant on nonzero digits, so
    # cv = count * alpha^2 — equal to the oracle's per-entry sum
    result_cv = (total[:, out_size + 1].astype(ErrorFloat)
                 * ks_arrays["cv_scale"]).reshape(batch_shape)
    if source_cv is not None:
        result_cv = (result_cv + source_cv.astype(ErrorFloat)
                     ).astype(ErrorFloat)
    return (result_a.astype(jnp.int32),
            result_b.reshape(batch_shape),
            result_cv)
