"""Probe: gather-based vs barrel-shift rotation; static-gather butterfly cost.

Chained (data-dependent) iterations amortize the D2H sync honestly.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


_SYNC = None


def sync_overhead():
    """One D2H round-trip (the only reliable fence on the tunneled TPU)."""
    global _SYNC
    if _SYNC is None:
        f = jax.jit(lambda v: v + 1)
        x = jnp.zeros((8, 128), jnp.int32)
        np.asarray(f(x).ravel()[0])
        best = float('inf')
        for _ in range(6):
            t0 = time.time()
            np.asarray(f(x).ravel()[0])
            best = min(best, time.time() - t0)
        _SYNC = best
    return _SYNC


def timed_chain(fn, x, iters=3, inner=16):
    """fn: x -> x (same shape/dtype). Chained to serialize execution;
    returns seconds per call with the single D2H sync subtracted."""
    ov = sync_overhead()
    y = fn(x)
    np.asarray(y.ravel()[0])
    best = float('inf')
    for _ in range(iters):
        y = x
        t0 = time.time()
        for _ in range(inner):
            y = fn(y)
        np.asarray(y.ravel()[0])
        best = min(best, (time.time() - t0 - ov) / inner)
    return best


def barrel_shift(source, powers, minus_one=False):
    """X^p * source via log2(2N) fixed rolls + per-row selects."""
    n = source.shape[-1]
    log2n = n.bit_length() - 1
    p = powers.astype(jnp.int32) % (2 * n)
    p_exp = p.reshape(p.shape + (1,) * (source.ndim - powers.ndim))
    out = source
    for b in range(log2n):
        k = 1 << b
        rolled = jnp.concatenate([-out[..., n - k:], out[..., :n - k]], axis=-1)
        bit = ((p_exp >> b) & 1).astype(jnp.bool_)
        out = jnp.where(bit, rolled, out)
    bit = ((p_exp >> log2n) & 1).astype(jnp.bool_)
    out = jnp.where(bit, -out, out)
    if minus_one:
        out = out - source
    return out.astype(jnp.int32)


def main(batch):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import tlwe as dtlwe

    ov = sync_overhead()
    print(f"sync overhead: {ov*1000:.2f} ms")
    rs = np.random.RandomState(0)
    acc = jnp.asarray(rs.randint(-2**31, 2**31, (batch, 2, 1024)).astype(np.int32))
    powers = jnp.asarray(rs.randint(0, 2048, (batch,)).astype(np.int32))

    f_gather = jax.jit(lambda a: dtlwe.monomial_shift(a, powers, minus_one=True))
    t = timed_chain(f_gather, acc, inner=4)
    print(f"monomial_shift (gather):  {t*1000:8.2f} ms")

    f_barrel = jax.jit(lambda a: barrel_shift(a, powers, minus_one=True))
    t = timed_chain(f_barrel, acc, inner=16)
    print(f"monomial_shift (barrel):  {t*1000:8.2f} ms")

    # equality check
    ga = f_gather(acc)
    ba = f_barrel(acc)
    print("barrel == gather:", bool(jnp.array_equal(ga, ba)))

    # forward transform (static-table gathers), chained via reshape
    digits = jnp.asarray(rs.randint(-512, 512, (batch, 4, 1024)).astype(np.int32))
    f_fwd = jax.jit(
        lambda d: dt.forward_i32(d).reshape(d.shape[:-1] + (2048,))[..., :1024])
    t = timed_chain(f_fwd, digits, inner=16)
    print(f"forward_i32 (chained):    {t*1000:8.2f} ms")

    # inverse_dual chained
    lohi = jnp.asarray(rs.randint(-2**21, 2**21, (batch, 2, 2, 64, 32)).astype(np.int32))
    f_inv = jax.jit(lambda z: jnp.tile(
        dt.inverse_dual(z[:, 0], z[:, 1]), (1, 1, 4)
    ).reshape(batch, 2, 2, 64, 32) & jnp.int32(2**21 - 1))
    t = timed_chain(f_inv, lohi, inner=16)
    print(f"inverse_dual (chained):   {t*1000:8.2f} ms")

    # MAC matmul alone, chained via zero-feedback
    row8 = jnp.asarray(rs.randint(-128, 128, (64, 256, 320)).astype(np.int8))
    al0 = jnp.asarray(
        rs.randint(-128, 128, (batch, 64, 256)).astype(np.float32),
        dt.mac_dtype())

    @jax.jit
    def f_mac(al):
        out = dt.external_product_mac(al, row8)
        s = (out.sum() * 0).astype(al.dtype)
        return al + s
    t = timed_chain(f_mac, al0, inner=8)
    print(f"external_mac (chained):   {t*1000:8.2f} ms")


if __name__ == "__main__" and False:
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)


def bench_fused_step(batch):
    """Full external-product step with the current ops (post barrel-shift)."""
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import tgsw as dtgsw
    from nufhe_tpu.ops import tlwe as dtlwe
    from nufhe_tpu.params import NuFHEParameters

    params = NuFHEParameters()
    tp = params.tgsw_params
    rs = np.random.RandomState(0)
    ov = sync_overhead()

    acc = jnp.asarray(rs.randint(-2**31, 2**31, (batch, 2, 1024)).astype(np.int32))
    powers = jnp.asarray(rs.randint(0, 2048, (batch,)).astype(np.int32))
    limbs = rs.randint(-128, 128, (1, 4, 2, 64, 32, 5)).astype(np.int8)
    row = jax.jit(dt.build_mac_rhs)(jnp.asarray(limbs))
    jax.block_until_ready(row)

    @jax.jit
    def step(a):
        sh = dtlwe.monomial_shift(a, powers, minus_one=True)
        d = dtgsw.tgsw_transformed_external_mul(
            sh, row, 0, int(tp.offset), tp.decomp_length, tp.bs_log2_base)
        return (a + d).astype(jnp.int32)

    t = timed_chain(step, acc, inner=16)
    print(f"fused step: {t*1000:8.2f} ms  (x500 = {t*500*1000:.0f} ms -> "
          f"{t*500/batch*1000:.5f} ms/bit, x{0.35/(t*500/batch*1000):.1f} vs baseline)")


if __name__ == "__main__":
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    if sys.argv[1:2] == ["step"]:
        bench_fused_step(b)
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
