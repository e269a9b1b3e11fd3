"""Probe the cost structure of the dual-channel DIT inverse (timing only).

Variants (same data volume, intentionally wrong math except `base`):
  base     - current rows_engine.dit_inverse
  notw     - all twiddles removed (pure butterflies): twiddle-op cost
  align    - misaligned twiddle rolls rounded to 8-row multiples: the
             sublane-misalignment cost
  noroll   - butterflies without partner rolls (adds+selects only): the
             absolute pass floor
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.microbench import timed_chain, sync_overhead
from nufhe_tpu.ops import rows_engine as re_

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
LT = min(512, BATCH)
LOG_L = re_.LOG_L
M, R, L = re_.M, re_.R, re_.L


def _mask(x, blk, e):
    r = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return (r % blk) >= e


def make_inverse(tw_mode, partner_rolls=True):
    def twiddle(x, step, h, stride):
        if h <= 1 or tw_mode == 'none':
            return x
        for b in range(h.bit_length() - 1):
            e = (step * (1 << b)) % (2 * R)
            if e == 0:
                continue
            neg = e >= R
            e_r = e - R if neg else e
            if tw_mode == 'align':
                e_r = (e_r // 8) * 8
            hi_roll = re_._roll(x, e_r) if e_r else x
            lo_roll = re_._roll(x, e_r - R)
            if neg:
                hi_roll, lo_roll = -hi_roll, lo_roll
            else:
                lo_roll = -lo_roll
            if e_r == 0:
                x = jnp.where(re_._mask(x, 'mbit', stride, h, b), hi_roll, x)
            else:
                x = jnp.where(
                    re_._mask(x, 'mbit_and_geq', stride, h, b, R, e_r),
                    hi_roll,
                    jnp.where(re_._mask(x, 'mbit', stride, h, b), lo_roll, x))
        return x

    def inverse(x, stride):
        for s in range(LOG_L - 1):
            mmax = 1 << s
            d = mmax * stride
            step = -(1 << (LOG_L - s - 1))
            is_lo = re_._mask(x, 'lt_mod', 2 * d, d)
            part = re_._roll(x, -d) if partner_rolls else x
            tw = twiddle(part, step, mmax, stride)
            x = jnp.where(is_lo, x + tw,
                          re_._roll(x - tw, d) if partner_rolls else x - tw)
        half = M * stride
        lo = x[:half]
        tw = twiddle(x[half:], -1, M, stride)
        s_plus = lo + tw
        s_minus = lo - tw
        if tw_mode == 'none':
            return s_plus + s_minus
        return s_plus + re_.rot_block(s_minus, 1)
    return inverse


def make_kernel(body):
    def kernel(acc_ref, out_ref):
        out_ref[:, :] = body(acc_ref[:, :])

    def f(a):
        return pl.pallas_call(
            kernel, grid=(BATCH // LT,),
            in_specs=[pl.BlockSpec((2048, LT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, LT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2048, BATCH), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(a)
    return jax.jit(f)


def run(nm, inverse):
    o_r = 2 * R

    def body(a):
        x = jnp.concatenate([a, a, a, a], axis=0)    # (8192, b)
        folded = inverse(x, 2 * o_r)
        v = folded.reshape(M, 2, o_r, a.shape[-1])
        delta = re_.normalize_dual(v[:, 0], v[:, 1])
        return delta.reshape(2 * re_.N, a.shape[-1])

    f = make_kernel(body)
    t = timed_chain(f, acc)
    print(f"{nm:10s}: {t*1000:8.3f} ms")
    return t


rs = np.random.RandomState(0)
acc = jnp.asarray(rs.randint(-2**31, 2**31, (2048, BATCH)).astype(np.int32))
print(f"sync: {sync_overhead()*1000:.1f} ms   batch {BATCH} lt {LT}")
run("base", make_inverse('full'))
run("notw", make_inverse('none'))
run("align", make_inverse('align'))
run("noroll", make_inverse('none', partner_rolls=False))


# --- per-m sliced twiddles: each stage = static slices, one rotation each ---

def yrot2(z2d, e):
    """Negacyclic Y^e on 32-row k-blocks of a 2D (rows, b) array."""
    return re_.rot_block(z2d, e)


def dit_inverse_sliced(x, stride):
    nrows, b = x.shape
    for s in range(LOG_L - 1):
        mmax = 1 << s
        step = -(1 << (LOG_L - s - 1))
        v = x.reshape(-1, 2, mmax, stride, b)
        lo = v[:, 0]
        hi = v[:, 1]
        if mmax == 1:
            tw = hi
        else:
            tws = []
            for m in range(mmax):
                e = (step * m) % (2 * R)
                hm = hi[:, m].reshape(-1, b)
                tws.append(yrot2(hm, e).reshape(hi.shape[0], 1,
                                                stride, b))
            tw = jnp.concatenate(tws, axis=1)
        x = jnp.stack([lo + tw, lo - tw], axis=1).reshape(nrows, b)
    half = M * stride
    lo = x[:half]
    hi2 = x[half:].reshape(M, stride, b)
    tws = []
    for m in range(M):
        e = (-m) % (2 * R)
        tws.append(yrot2(hi2[m], e).reshape(1, stride, b))
    tw = jnp.concatenate(tws, axis=0).reshape(half, b)
    s_plus = lo + tw
    s_minus = lo - tw
    return s_plus + re_.rot_block(s_minus, 1)


if __name__ == "__main__" and True:
    # exactness vs base on small input
    rs2 = np.random.RandomState(1)
    small = jnp.asarray(rs2.randint(-2**31, 2**31, (8192, 128)).astype(np.int32))
    a_ref = jax.jit(lambda v: re_.dit_inverse(v, 128))(small)
    a_new = jax.jit(lambda v: dit_inverse_sliced(v, 128))(small)
    print("sliced exact:", bool((np.asarray(a_ref) == np.asarray(a_new)).all()))
    run("sliced", dit_inverse_sliced)
