"""Probe MXU/VPU overlap: interleave the forward transform of one digit
half with the MAC dot of the other, so the MXU contraction can co-issue
with VPU transform work instead of serializing after it.

Variants:
  serial  - current transformed_mac (fwd all -> one dot -> inverse)
  split   - fwd(half A) -> dot(A) ; fwd(half B) -> dot(B) ; inverse(A+B)
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
from nufhe_tpu.ops import transform as dt
from nufhe_tpu.params import NuFHEParameters

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
LT = min(512, BATCH)
M, R, L = re_.M, re_.R, re_.L

params = NuFHEParameters()
tp = params.tgsw_params
dl, l2b, off = tp.decomp_length, tp.bs_log2_base, int(tp.offset)
mask1 = 2
g_total = mask1 * dl

rs = np.random.RandomState(0)
from nufhe_tpu.ops import tgsw as dtgsw
bk_coeff = rs.randint(-2**31, 2**31, (1, 2, dl, 2, 1024)).astype(np.int32)
row = dtgsw.prepare_bootstrap_key_device(bk_coeff)[0]
acc = jnp.asarray(rs.randint(-2**31, 2**31, (2048, BATCH)).astype(np.int32))
powers = jnp.asarray(rs.randint(0, 2048, (1, BATCH)).astype(np.int32))
c_size, q_size = row.shape[-2], row.shape[-1]


def fwd_half(digits_half, b):
    """SWAR forward + limb interleave of ONE packed g-pair (n_pk=1):
    digits_half rows (j, g2, i) with g2 = 2 polys."""
    dv = digits_half.reshape(M, 1, 2, R, b)
    packed = re_.pack_pairs(dv[:, :, 0], dv[:, :, 1]).reshape(M * R, b)
    xt_pk = re_.dif_forward_packed(packed, 1)
    ev, od = re_.unpack_pairs(xt_pk)
    ev = ev.reshape(L, 1, 1, R, b)
    od = od.reshape(L, 1, 1, R, b)
    xt = jnp.concatenate([ev, od], axis=2).reshape(L * 2 * R, b)
    a0 = ((xt + 128) & 255) - 128
    a1 = (xt - a0) >> 8
    lhs = jnp.concatenate([
        a0.reshape(L, 2, 1, R, b), a1.reshape(L, 2, 1, R, b)], axis=2)
    return lhs.reshape(L, 2 * 2 * R, b).astype(dt.mac_dtype())


def mac_split(acc_in, p, rhs):
    b = acc_in.shape[-1]
    rot = re_.rotate_acc(acc_in, p, mask1, minus_one=True)
    digits = re_.gadget_decomp(rot, mask1, dl, l2b, off)
    # digits rows (j, g, i) with g = 4; split g into halves (g01 | g23)
    dv = digits.reshape(M, g_total, R, b)
    half_c = c_size // 2
    pref = dt.mac_accum_dtype(dt.mac_dtype())

    lhs_a = fwd_half(dv[:, 0:2].reshape(M * 2 * R, b), b)
    out_a = jax.lax.dot_general(
        rhs[:, :half_c].astype(dt.mac_dtype()), lhs_a,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=pref)

    lhs_b = fwd_half(dv[:, 2:4].reshape(M * 2 * R, b), b)
    out_b = jax.lax.dot_general(
        rhs[:, half_c:].astype(dt.mac_dtype()), lhs_b,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=pref)

    out = (out_a + out_b).astype(jnp.int32)
    # reuse the group-combine + inverse from _mac_dot's tail
    o_r = mask1 * R
    lo = None
    hi = None
    for s in range(5):
        ps = jax.lax.slice_in_dim(out, s * o_r, (s + 1) * o_r, axis=1)
        shift = 8 * s
        if shift < 19:
            rem = 19 - shift
            hi_c = ps >> rem
            lo_c = (ps & ((1 << rem) - 1)) << shift
            lo = lo_c if lo is None else lo + lo_c
        else:
            hi_c = ps << (shift - 19)
        hi = hi_c if hi is None else hi + hi_c
    x = jnp.concatenate([
        lo.reshape(L, 1, o_r, b), hi.reshape(L, 1, o_r, b)], axis=1)
    x = x.reshape(L * 2 * o_r, b)
    folded = re_.dit_inverse(x, 2 * o_r)
    v = folded.reshape(M, 2, o_r, b)
    delta = re_.normalize_dual(v[:, 0], v[:, 1])
    return (acc_in + delta.reshape(mask1 * 1024, b)).astype(jnp.int32)


def mac_serial(acc_in, p, rhs):
    return re_.external_step(acc_in, p, rhs, mask1=mask1, decomp_length=dl,
                             log2_base=l2b, offset=off,
                             mac_dtype=dt.mac_dtype())


def make(body):
    def kernel(p_ref, acc_ref, rhs_ref, out_ref):
        out_ref[:, :] = body(acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :])

    def f(a):
        return pl.pallas_call(
            kernel, grid=(BATCH // LT,),
            in_specs=[
                pl.BlockSpec((1, LT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2048, LT), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, c_size, q_size), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, LT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2048, BATCH), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(powers, a, row)
    return jax.jit(f)


print(f"sync: {sync_overhead()*1000:.1f} ms  batch {BATCH} lt {LT}")
f_serial = make(mac_serial)
f_split = make(mac_split)
small = acc[:, :LT]
r1 = np.asarray(jax.jit(lambda a: mac_serial(a, powers[:, :LT], row))(small))
r2 = np.asarray(jax.jit(lambda a: mac_split(a, powers[:, :LT], row))(small))
print("split exact:", np.array_equal(r1, r2))
t1 = timed_chain(f_serial, acc)
t2 = timed_chain(f_split, acc)
print(f"serial: {t1*1e3:.3f} ms   split: {t2*1e3:.3f} ms")
