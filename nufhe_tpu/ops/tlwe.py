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
    (``nufhe/polynomials_gpu.py:31-86``).  Implemented as a signed gather.

    :param source: (batch..., C..., N) int32 polynomials.
    :param powers: (batch...,) int32 in [0, 2N).
    """
    n = source.shape[-1]
    batch_ndim = powers.ndim
    p = powers.astype(jnp.int32) % (2 * n)
    if invert_powers:
        p = (2 * n - p) % (2 * n)

    j = jnp.arange(n, dtype=jnp.int32)
    p_exp = p.reshape(p.shape + (1,) * (source.ndim - batch_ndim))
    q = (j - p_exp) % (2 * n)
    sign = jnp.where(q >= n, jnp.int32(-1), jnp.int32(1))
    idx = q % n
    idx_b = jnp.broadcast_to(idx, source.shape)
    out = jnp.take_along_axis(source, idx_b, axis=-1) * sign
    if minus_one:
        out = out - source
    return out.astype(jnp.int32)
