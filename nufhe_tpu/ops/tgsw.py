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


def bootstrap_key_limbs_host(bk_coeff, exact=True):
    """Host part of bootstrap-key preparation: exact forward transform
    (u64 numpy) + mod-2^38 reduction + two-sided A/B limb split (limbs of
    +v and of -v mod 2^38; see ``transform.key_limbs_host``).

    :param bk_coeff: (n, mask_size+1, decomp_length, mask_size+1, N) int32.
    :param exact: False = rounded-key ('FFT') mode: 4 vhi limbs per side,
        the 6-bit vlo remainder becomes key noise.
    :returns: (n, G, O, L, R, KEY_LIMBS[_APPROX], 2) int8 numpy array
        (compact; the negacyclic sign-baking expansion into MAC-rhs layout
        happens on device).
    """
    from .. import native

    n_rows, mask1, decomp, mask1_o, poly_n = bk_coeff.shape
    flat = np.asarray(bk_coeff).reshape(-1, poly_n)
    limbs = native.bootstrap_key_limbs(flat, exact)   # (., L, R, KL, 2) i8
    return limbs.reshape(
        n_rows, mask1 * decomp, mask1_o, dt.L, dt.R, limbs.shape[-2], 2)


# Module-level jit wrapper: the fresh-keygen prep and the serialized-key
# load path share one in-process trace cache (a per-call jax.jit() wrapper
# would recompile the expansion on every load).
_build_mac_rhs = jax.jit(dt.build_mac_rhs)


def expand_bootstrap_key_device(limbs, chunk: int = 125):
    """Compact transformed limbs -> the HBM-resident MAC operand.

    :param limbs: (n, G, O, L, R, KEY_LIMBS[_APPROX], 2) int8 (host or
        device); the limb count selects the exact (Q = 5*O*R) or
        rounded-key (Q = 4*O*R) rhs mapping.
    :returns: (n, L, C, Q) int8 device array — per-row MAC rhs with the
        negacyclic signs baked in (direct int8 MXU operand), C = G*2R.
    """
    # one H2D transfer for the whole compact form; per-chunk inputs are
    # device-side slices (the tunneled host->device link has high per-
    # transfer latency, so ten small uploads cost more than one large one)
    limbs = jnp.asarray(limbs)
    parts = [_build_mac_rhs(limbs[i:i + chunk])
             for i in range(0, limbs.shape[0], chunk)]
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return jax.block_until_ready(out)


_two_sided_limbs = jax.jit(dt.two_sided_limbs_device)


def expand_bootstrap_key_device_compact(pos, delta=None, chunk: int = 125):
    """One-sided compact upload path: the H2D transfer moves HALF the
    bytes of the two-sided form; the -v side is derived on device in
    int32 (``transform.two_sided_limbs_device``), then expanded as usual.

    :param pos: (n, G, O, L, R, KEY_LIMBS[_APPROX]) int8 (host or device).
    :param delta: (n, G, O, L, R) 0/1 rounding-correction bits (rounded
        mode) or None (exact mode).
    """
    pos = jnp.asarray(pos)
    if delta is not None:
        delta = jnp.asarray(delta)
    return expand_bootstrap_key_device(
        _two_sided_limbs(pos, delta), chunk=chunk)


def prepare_bootstrap_key_device(bk_coeff, chunk: int = 50, exact=True):
    """Full host->device preparation of the bootstrap key for the MXU MAC
    (host transform + limb split, then on-device expansion).

    :param bk_coeff: (n, mask_size+1, decomp_length, mask_size+1, N) int32
        numpy array (coefficient-domain TGSW bootstrap key).
    :param exact: False = rounded-key ('FFT') mode.
    :returns: see :func:`expand_bootstrap_key_device`.
    """
    return expand_bootstrap_key_device(
        bootstrap_key_limbs_host(bk_coeff, exact=exact), chunk=chunk)


def tgsw_transformed_external_mul(accum_a, bk_dev, bk_row_idx,
                                  offset, decomp_length: int, log2_base: int,
                                  axis_name=None):
    """One external product: returns BK_row (x) decomp(accum).

    Decompose -> gather-free DIF forward transform (exact i32) -> ONE
    batched int8 matmul per slot on the MXU (int32 accumulation, exact
    integer) -> dual-channel DIT inverse -> exact result mod 2^32.
    Implementation: ``ops/flat_engine.external_mul_flat``.
    Reference: ``nufhe/tgsw_gpu.py:110-169``.

    :param accum_a: (batch..., mask_size+1, N) int32.
    :param bk_dev: output of ``prepare_bootstrap_key_device``.  When running
        under ``shard_map`` with the decomposition axis sharded over mesh
        axis ``axis_name``, this is the local C-slice (whole g-blocks).
    :param axis_name: mesh axis for tensor-parallel external products: each
        shard MACs its g-block slice and the dual-channel MAC outputs are
        ``psum``-reduced before the inverse transform.
    :returns: (batch..., mask_size+1, N) int32.
    """
    from . import flat_engine as fe

    mask1 = accum_a.shape[-2]
    lead = accum_a.shape[:-2]
    sample_q = fe.q_from_n(accum_a).reshape((-1, mask1 * fe.N))
    row = jax.lax.dynamic_index_in_dim(bk_dev, bk_row_idx, 0, keepdims=False)
    out = fe.external_mul_flat(
        sample_q, row, mask1=mask1, decomp_length=decomp_length,
        log2_base=log2_base, offset=int(offset), mac_dtype=dt.mac_dtype(),
        axis_name=axis_name)
    out = out.reshape(lead + (mask1, fe.N))
    return fe.n_from_q(out)
