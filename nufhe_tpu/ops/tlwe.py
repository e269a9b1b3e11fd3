"""Device (JAX) TLWE operations (reference kernels: ``nufhe/tlwe_gpu.py``)."""

import jax.numpy as jnp

from ..numeric import ErrorFloat


def tlwe_noiseless_trivial(mu, mask_size: int):
    """(0,...,0, mu).  Reference: ``nufhe/tlwe_gpu.py:32-74``."""
    mu = jnp.asarray(mu, jnp.int32)
    shape = mu.shape[:-1]
    n = mu.shape[-1]
    zeros = jnp.zeros(shape + (mask_size, n), jnp.int32)
    a = jnp.concatenate([zeros, mu[..., None, :]], axis=-2)
    cv = jnp.zeros(shape, ErrorFloat)
    return a, cv


def tlwe_extract_lwe_samples(tlwe_a):
    """LWE extraction with negacyclic coefficient reversal.

    a_out[k*N] = mask[k, 0]; a_out[k*N + j] = -mask[k, N-j] (j > 0);
    b_out = body[0].  Reference: ``nufhe/tlwe_gpu.py:77-108``.
    """
    mask_size = tlwe_a.shape[-2] - 1
    n = tlwe_a.shape[-1]
    mask = tlwe_a[..., :mask_size, :]
    a = jnp.concatenate([mask[..., :1], -mask[..., :0:-1]], axis=-1)
    a = a.reshape(tlwe_a.shape[:-2] + (mask_size * n,)).astype(jnp.int32)
    b = tlwe_a[..., mask_size, 0]
    return a, b


def monomial_shift(source, powers, minus_one=False, invert_powers=False):
    """result = X^p * source (optionally (X^p - 1) * source) in Z[X]/(X^N+1),
    with a per-batch-element power.

    Replaces the reference's ``ShiftTorusPolynomial`` kernel
    (``nufhe/polynomials_gpu.py:31-86``).  Implemented as a barrel shifter:
    log2(2N) rounds of [fixed negacyclic roll, per-row select] — static
    slice/concat data movement on the VPU instead of a per-element gather
    (which XLA:TPU lowers catastrophically slowly).

    :param source: (batch..., C..., N) int32 polynomials.
    :param powers: (batch...,) int32 in [0, 2N).
    """
    n = source.shape[-1]
    log2n = n.bit_length() - 1
    batch_ndim = powers.ndim
    p = powers.astype(jnp.int32) % (2 * n)
    if invert_powers:
        p = (2 * n - p) % (2 * n)
    p_exp = p.reshape(p.shape + (1,) * (source.ndim - batch_ndim))

    out = source
    for b in range(log2n):
        k = 1 << b
        rolled = jnp.concatenate(
            [-out[..., n - k:], out[..., :n - k]], axis=-1)
        bit = ((p_exp >> b) & 1).astype(jnp.bool_)
        out = jnp.where(bit, rolled, out)
    # the top bit of p in [0, 2N) is multiplication by X^N = -1
    bit = ((p_exp >> log2n) & 1).astype(jnp.bool_)
    out = jnp.where(bit, -out, out)
    if minus_one:
        out = out - source
    return out.astype(jnp.int32)
