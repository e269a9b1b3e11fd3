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


def bootstrap_key_limbs_host(bk_coeff):
    """Host part of bootstrap-key preparation: exact forward transform
    (u64 numpy) + mod-2^38 reduction + balanced radix-2^8 limb split.

    :param bk_coeff: (n, mask_size+1, decomp_length, mask_size+1, N) int32.
    :returns: (n, G, O, L, R, KEY_LIMBS) int8 numpy array (compact: the
        32x-larger negacyclic expansion happens on device, because the
        host->device link is far slower than HBM).
    """
    from ..ref import transform_ref as tr

    n_rows, mask1, decomp, mask1_o, poly_n = bk_coeff.shape
    bhat = tr.forward(bk_coeff)                       # (..., L, R) u64
    limbs = dt.key_limbs_host(bhat)                   # (..., L, R, KL) i16
    return limbs.reshape(
        n_rows, mask1 * decomp, mask1_o, dt.L, dt.R, dt.KEY_LIMBS
    ).astype(np.int8)


@jax.jit
def expand_key_limbs_device(limbs):
    """Device part: (..., R, KL) i8 -> (..., R(u), R(k), KL) bf16, the
    S'-multiplication (negacyclic 32x32) matrices of each transformed vector.
    """
    idx = jnp.asarray(dt._NEGA_IDX.astype(np.int32))
    sgn = jnp.asarray(dt._NEGA_SGN.astype(np.float32), jnp.bfloat16)
    taken = jnp.take(limbs.astype(jnp.bfloat16), idx.reshape(-1), axis=-2)
    taken = taken.reshape(limbs.shape[:-2] + (dt.R, dt.R, limbs.shape[-1]))
    return taken * sgn[..., None]


def prepare_bootstrap_key_device(bk_coeff):
    """Full host->device preparation of the bootstrap key for the MXU MAC.

    :param bk_coeff: (n, mask_size+1, decomp_length, mask_size+1, N) int32
        numpy array (coefficient-domain TGSW bootstrap key).
    :returns: (n, G, O, L, R, R, KEY_LIMBS) bf16 device array,
        G = (mask_size+1)*decomp_length, O = mask_size+1.
    """
    limbs = bootstrap_key_limbs_host(bk_coeff)
    return expand_key_limbs_device(jnp.asarray(limbs))


def tgsw_transformed_external_mul(accum_a, bk_dev, bk_row_idx,
                                  offset, decomp_length: int, log2_base: int,
                                  axis_name=None):
    """One external product: returns BK_row (x) decomp(accum).

    Decompose -> forward transform (exact i32) -> limb MAC on the MXU ->
    dual-channel inverse -> exact delta mod 2^32.
    Reference: ``nufhe/tgsw_gpu.py:110-169``.

    :param accum_a: (batch..., mask_size+1, N) int32.
    :param bk_dev: output of ``prepare_bootstrap_key_device``.  When running
        under ``shard_map`` with the decomposition axis G sharded over mesh
        axis ``axis_name``, this is the local G-slice.
    :param axis_name: mesh axis for tensor-parallel external products: each
        shard MACs its G-slice and the dual-channel accumulators are
        ``psum``-reduced before the inverse transform.
    :returns: (batch..., mask_size+1, N) int32.
    """
    mask1 = accum_a.shape[-2]
    digits = tgsw_polynomial_decomp(accum_a, offset, decomp_length, log2_base)
    g = mask1 * decomp_length
    digits = digits.reshape(digits.shape[:-3] + (g,) + digits.shape[-1:])

    if axis_name is not None:
        g_local = bk_dev.shape[1]
        start = jax.lax.axis_index(axis_name) * g_local
        digits = jax.lax.dynamic_slice_in_dim(digits, start, g_local, axis=-2)

    ahat = dt.forward_i32(digits)              # (..., G_local, L, R)
    al = dt.acc_limbs(ahat)                    # (..., G_local, L, R, 2)

    row = jax.lax.dynamic_index_in_dim(bk_dev, bk_row_idx, 0, keepdims=False)
    lo, hi = dt.external_mac(al, row)
    if axis_name is not None:
        lo = jax.lax.psum(lo, axis_name)
        hi = jax.lax.psum(hi, axis_name)
    return dt.inverse_dual(lo, hi)             # (..., O, N)
