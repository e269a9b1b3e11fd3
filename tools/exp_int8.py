"""Experiment: int8 vs bf16 MAC dot on the MXU (pallas + XLA level)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.microbench import timed_chain, sync_overhead

L, C, Q = 64, 256, 384
BT = 512
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

rs = np.random.RandomState(0)
rhs_i8 = jnp.asarray(rs.randint(-127, 128, (L, C, Q)).astype(np.int8))
rhs_bf = rhs_i8.astype(jnp.bfloat16)


def mac_bf16(lhs_i32, rhs):
    lhs = lhs_i32.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        rhs, lhs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)


def mac_int8(lhs_i32, rhs):
    lhs = lhs_i32.astype(jnp.int8)
    out = jax.lax.dot_general(
        rhs, lhs, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    return out


def make_pallas(macfn, rhs):
    def kernel(x_ref, rhs_ref, out_ref):
        out = macfn(x_ref[:, :, :], rhs_ref[:, :, :])
        # fold Q back to C width so the fn is chainable: sum 384->256 pad
        o = out[:, :C, :] + jnp.concatenate(
            [out[:, C:, :], jnp.zeros((L, 2 * C - Q, BT), jnp.int32)], axis=1)
        out_ref[:, :, :] = o & 255

    def f(x):
        return pl.pallas_call(
            kernel, grid=(BATCH // BT,),
            in_specs=[
                pl.BlockSpec((L, C, BT), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, C, Q), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((L, C, BT), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, C, BATCH), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, rhs)
    return jax.jit(f)


x0 = jnp.asarray(rs.randint(-100, 100, (L, C, BATCH)).astype(np.int32))

# correctness: int8 vs exact
lhs_small = x0[:, :, :BT]
ref = np.einsum('lcq,lcb->lqb',
                np.asarray(rhs_i8, np.int64), np.asarray(lhs_small, np.int64))
got8 = np.asarray(jax.jit(mac_int8)(lhs_small, rhs_i8))
gotb = np.asarray(jax.jit(mac_bf16)(lhs_small, rhs_bf))
print("int8 exact:", np.array_equal(ref, got8),
      " bf16 exact:", np.array_equal(ref, gotb))

print("sync:", sync_overhead() * 1000, "ms")
flop = 2 * L * C * Q * BATCH
for nm, macfn, rhs in [("bf16", mac_bf16, rhs_bf), ("int8", mac_int8, rhs_i8)]:
    try:
        f = make_pallas(macfn, rhs)
        t = timed_chain(f, x0)
        print(f"pallas {nm}: {t*1e3:.3f} ms  {flop/t/1e12:.1f} TOP/s")
    except Exception as e:
        print(f"pallas {nm} FAILED: {type(e).__name__}: {str(e)[:300]}")
