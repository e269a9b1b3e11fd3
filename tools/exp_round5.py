"""Round-5 step-variant A/B experiments (bit-exact asserted, in-program).

The t10 slice-concat rotation changed the engine's cost balance, so the
round-3/4 dead-end verdicts on rotate_acc restructures are re-examined in
the NEW engine (they were measured against the roll+select forms):

t11  whole-array cyclic rolls as explicit slice-concat (the j-round
     ``_roll``; jnp.roll should already lower this way — measures whether
     Mosaic agrees).
t12  j-rounds without the full-array roll: rolled[:ks] = out[-ks:] and
     rolled[ks:] = out[:-ks] are pure slices, so each round becomes
     rot_block on ks rows + TWO slice-wheres emitted directly in the
     rolled layout — the ``fixed`` array and the full-array select
     disappear.
t13  i-rounds with the data-dependent select fused into the two concat
     halves of the (static) rot_block: out[:e] = where(bit, -tail, x[:e]),
     out[e:] = where(bit, head, x[e:]) — one materialization per round
     instead of two.
t14  t12 + t13 combined.

Usage: [NUFHE_BENCH_TRANSFORM=fft] [NUFHE_R5_TRICKS=t12,t14]
       python tools/exp_round5.py [batch] [lane_tile]
"""

import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import timed_chain, sync_overhead, _setup, _exact  # noqa: E402


def main(batch=16384, lane_tile=2048, n_steps=100):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import rows_engine as re_

    tp, _, acc, powers, row = _setup(batch)
    dl, l2b, off = tp.decomp_length, tp.bs_log2_base, int(tp.offset)
    c_size, q_size = row.shape[-2], row.shape[-1]
    mask1 = 2
    mac = dt.mac_dtype()
    mode = "exact" if _exact() else "rounded-key"
    rs = np.random.RandomState(1)
    bk = jnp.asarray(np.broadcast_to(
        np.asarray(row)[None], (n_steps,) + row.shape).copy())
    bara_t = jnp.asarray(
        rs.randint(0, 2048, (n_steps, batch)).astype(np.int32))

    # --- candidate rotate_acc variants ---------------------------------

    def roll_cc(x, k):
        k = k % x.shape[0]
        if k == 0:
            return x
        return jnp.concatenate([x[-k:], x[:-k]], axis=0)

    def rotate_acc_t11(x, p, mask1_, minus_one=False, skip_low_bits=0):
        stride = mask1_ * re_.R
        region = mask1_ * re_.N
        assert x.shape[0] == region
        out = x
        for b in range(skip_low_bits, 5):
            k = 1 << b
            rolled = roll_cc(out, stride * k)
            carry = re_.rot_block(rolled[:k * stride], 1)
            fixed = jnp.concatenate([carry, rolled[k * stride:]], axis=0)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, fixed, out)
        for b in range(5, 10):
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, re_.rot_block(out, k), out)
        bit = ((p >> 10) & 1) != 0
        out = jnp.where(bit, -out, out)
        if minus_one:
            out = out - x
        return out.astype(jnp.int32)

    def rotate_acc_t12(x, p, mask1_, minus_one=False, skip_low_bits=0,
                       fused_i=False):
        stride = mask1_ * re_.R
        region = mask1_ * re_.N
        assert x.shape[0] == region
        out = x
        for b in range(skip_low_bits, 5):
            ks = (1 << b) * stride
            bit = ((p >> b) & 1) != 0
            # rolled = [out[-ks:] | out[:-ks]]; only the wrapped block
            # needs the Y-carry — emit the two slice-wheres directly
            head = jnp.where(bit, re_.rot_block(out[-ks:], 1), out[:ks])
            tail = jnp.where(bit, out[:-ks], out[ks:])
            out = jnp.concatenate([head, tail], axis=0)
        for b in range(5, 10):
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            if fused_i:
                blk = re_.R
                v = out.reshape(-1, blk, out.shape[-1])
                lo = jnp.where(bit, -v[:, blk - k:], v[:, :k])
                hi = jnp.where(bit, v[:, :blk - k], v[:, k:])
                out = jnp.concatenate([lo, hi], axis=1).reshape(out.shape)
            else:
                out = jnp.where(bit, re_.rot_block(out, k), out)
        bit = ((p >> 10) & 1) != 0
        out = jnp.where(bit, -out, out)
        if minus_one:
            out = out - x
        return out.astype(jnp.int32)

    def rotate_acc_t13(x, p, mask1_, minus_one=False, skip_low_bits=0):
        stride = mask1_ * re_.R
        region = mask1_ * re_.N
        assert x.shape[0] == region
        out = x
        for b in range(skip_low_bits, 5):
            k = 1 << b
            rolled = re_._roll(out, stride * k)
            carry = re_.rot_block(rolled[:k * stride], 1)
            fixed = jnp.concatenate([carry, rolled[k * stride:]], axis=0)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, fixed, out)
        for b in range(5, 10):
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            blk = re_.R
            v = out.reshape(-1, blk, out.shape[-1])
            lo = jnp.where(bit, -v[:, blk - k:], v[:, :k])
            hi = jnp.where(bit, v[:, :blk - k], v[:, k:])
            out = jnp.concatenate([lo, hi], axis=1).reshape(out.shape)
        bit = ((p >> 10) & 1) != 0
        out = jnp.where(bit, -out, out)
        if minus_one:
            out = out - x
        return out.astype(jnp.int32)

    # --- harness (same shape as exp_round4.tricks) ----------------------

    def make(step_body):
        def kernel(p_ref, acc_ref, rhs_ref, out_ref):
            out_ref[:, :] = step_body(
                acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :])

        def step(a, p, r):
            return pl.pallas_call(
                kernel, grid=(batch // lane_tile,),
                in_specs=[
                    pl.BlockSpec((1, lane_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2048, lane_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((re_.L, c_size, q_size), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((2048, lane_tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2048, batch), jnp.int32),
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(p, a, r)

        @jax.jit
        def rot(a, bk_, bara_):
            def body(i, a_):
                p = jax.lax.dynamic_index_in_dim(bara_, i, 0, keepdims=True)
                r = jax.lax.dynamic_index_in_dim(bk_, i, 0, keepdims=False)
                return step(a_, p, r)
            return jax.lax.fori_loop(0, n_steps, body, a)

        return lambda a: rot(a, bk, bara_t)

    def step_with(rot_fn):
        def body(a, p, r):
            rot = rot_fn(a, p, mask1, minus_one=True)
            packed = re_.decomp_pack2(rot, mask1, l2b, off)
            lhs = re_.packed_to_lhs(
                re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
            out = re_._mac_dot_raw(lhs, r, mac)
            return re_.dot_out_to_delta(out, mask1, acc=a)
        return body

    print(f"mode={mode} batch={batch} lane_tile={lane_tile} "
          f"n_steps={n_steps} sync={sync_overhead()*1000:.1f} ms", flush=True)

    f0 = make(step_with(re_.rotate_acc))
    ref_out = np.asarray(f0(acc))
    t = timed_chain(f0, acc, iters=3, inner=2)
    print(f"{'baseline (t10 engine)':28s}: {t/n_steps*1e3:8.4f} ms/step",
          flush=True)

    variants = [
        ("t11 concat whole-roll", step_with(rotate_acc_t11)),
        ("t12 sliced j-rounds", step_with(rotate_acc_t12)),
        ("t13 fused i-selects", step_with(rotate_acc_t13)),
        ("t14 = t12+t13", step_with(
            lambda *a, **k: rotate_acc_t12(*a, fused_i=True, **k))),
    ]
    sel = os.environ.get("NUFHE_R5_TRICKS")
    for name, body in variants:
        if sel and not any(s in name for s in sel.split(",")):
            continue
        f = make(body)
        out = np.asarray(f(acc))
        same = bool(np.array_equal(out, ref_out))
        t = timed_chain(f, acc, iters=3, inner=2)
        print(f"{name:28s}: {t/n_steps*1e3:8.4f} ms/step  exact={same}",
              flush=True)
        assert same, name


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    lt = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    main(b, lt)
