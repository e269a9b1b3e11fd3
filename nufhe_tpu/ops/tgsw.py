"""Device (JAX) TGSW operations (reference kernels: ``nufhe/tgsw_gpu.py``)."""

import numpy as np
import jax
import jax.numpy as jnp

from . import transform as dt


def tgsw_polynomial_decomp(sample, offset, decomp_length: int, log2_base: int):
    """Gadget decomposition into signed digits in [-base/2, base/2).

    digits[..., mask, j, :] = (((x + offset) >> (32 - (j+1)*log2_base))
                               & (base-1)) - base/2
    Reference: ``nufhe/tgsw_gpu.py:31-54``.

    :param sample: (..., mask_size+1, N) int32.
    :returns: (..., mask_size+1, decomp_length, N) int32.
    """
    shifts = (32 - (np.arange(1, decomp_length + 1)) * log2_base).astype(np.int32)
    shifted = (sample[..., None, :] + jnp.int32(offset)).astype(jnp.int32)
    return (((shifted >> shifts[:, None]) & jnp.int32(2**log2_base - 1))
            - jnp.int32(2**(log2_base - 1)))


def prepare_bootstrap_key_device(bk_coeff):
    """Host->device preparation of the bootstrap key for the MXU MAC.

    Forward-transforms each TGSW row polynomial (host, exact u64), reduces
    mod 2^38, splits into balanced radix-2^8 limbs, and expands each
    transformed vector into its S'-multiplication (negacyclic 32x32) matrix.

    :param bk_coeff: (n, mask_size+1, decomp_length, mask_size+1, N) int32
        numpy array (coefficient-domain TGSW bootstrap key).
    :returns: (n, G, O, L, R, R, KEY_LIMBS) bf16 device array,
        G = (mask_size+1)*decomp_length, O = mask_size+1.
    """
    from ..ref import transform_ref as tr

    n_rows, mask1, decomp, mask1_o, poly_n = bk_coeff.shape
    bhat = tr.forward(bk_coeff)                       # (..., L, R) u64
    limbs = dt.key_limbs_host(bhat)                   # (..., L, R, KL) i16
    expanded = dt.expand_key_limbs_host(limbs)        # (..., L, R, R, KL) i16
    expanded = expanded.reshape(
        n_rows, mask1 * decomp, mask1_o, dt.L, dt.R, dt.R, dt.KEY_LIMBS)
    return jnp.asarray(expanded.astype(np.float32), jnp.bfloat16)


def tgsw_transformed_external_mul(accum_a, bk_dev, bk_row_idx,
                                  offset, decomp_length: int, log2_base: int):
    """One external product: returns BK_row (x) decomp(accum).

    Decompose -> forward transform (exact i32) -> limb MAC on the MXU ->
    dual-channel inverse -> exact delta mod 2^32.
    Reference: ``nufhe/tgsw_gpu.py:110-169``.

    :param accum_a: (batch..., mask_size+1, N) int32.
    :param bk_dev: output of ``prepare_bootstrap_key_device``.
    :returns: (batch..., mask_size+1, N) int32.
    """
    mask1 = accum_a.shape[-2]
    digits = tgsw_polynomial_decomp(accum_a, offset, decomp_length, log2_base)
    g = mask1 * decomp_length
    digits = digits.reshape(digits.shape[:-3] + (g,) + digits.shape[-1:])

    ahat = dt.forward_i32(digits)              # (..., G, L, R)
    al = dt.acc_limbs(ahat)                    # (..., G, L, R, 2)

    row = jax.lax.dynamic_index_in_dim(bk_dev, bk_row_idx, 0, keepdims=False)
    lo, hi = dt.external_mac(al, row)
    return dt.inverse_dual(lo, hi)             # (..., O, N)
