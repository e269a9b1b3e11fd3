"""Round-3 step-kernel experiments: materialization cuts + MXU/VPU overlap.

Variants of the fused CMUX step (all asserted bit-exact against the
round-2 kernel on device before timing):

  v0  round-2 baseline: digits materialized, staged (radix-4) transforms
  v1  + fused decomp/pack (l=2 elementwise path), staged transforms
  v2  + two-pass radix-8 forward AND inverse (the round-3 default)
  p2  v2 restructured as a two-half software pipeline: front(A); dot(A);
      front(B); dot(B); back(A); back(B) — dot(A) result is not consumed
      until back(A), giving the scheduler a window to overlap the MXU dot
      with independent VPU work (the verdict-requested hand-scheduled
      two-tile pipeline)
  p4  same with four quarter-tiles (finer overlap windows)

Usage: python tools/exp_round3.py [batch] [lane_tile]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import timed_chain, sync_overhead, _setup  # noqa: E402


def run(batch, lane_tile):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import rows_engine as re_

    tp, _, acc, powers, row = _setup(batch)
    dl, l2b, off = tp.decomp_length, tp.bs_log2_base, int(tp.offset)
    c_size, q_size = row.shape[-2], row.shape[-1]
    mask1 = 2
    mac = dt.mac_dtype()

    def make(body):
        def kernel(p_ref, acc_ref, rhs_ref, out_ref):
            out_ref[:, :] = body(acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :])

        def f(a):
            return pl.pallas_call(
                kernel, grid=(batch // lane_tile,),
                in_specs=[
                    pl.BlockSpec((1, lane_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2048, lane_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, c_size, q_size), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((2048, lane_tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2048, batch), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(powers, a, row)
        return jax.jit(f)

    def v0(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        digits = re_.gadget_decomp(rot, mask1, dl, l2b, off)
        delta = re_.transformed_mac(digits, r, mask1=mask1, g_total=mask1 * dl,
                                    mac_dtype=mac, radix8=False)
        return (a + delta).astype(jnp.int32)

    def v1(a, p, r):
        return re_.external_step(a, p, r, mask1=mask1, decomp_length=dl,
                                 log2_base=l2b, offset=off, mac_dtype=mac,
                                 radix8=False)

    def v2(a, p, r):
        # radix-8 two-pass transforms, but combine/normalize still as
        # separate materialized steps (isolates the v3 fusion's effect)
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        xt_pk = re_.dif_forward_packed2(packed, mask1)
        lhs = re_.packed_to_lhs(xt_pk, mask1, mac, raw=True)
        lo3, hi3 = re_._mac_dot(lhs, r, mask1, mac)
        delta = re_.mac_out_to_delta(lo3, hi3, mask1, radix8=True)
        return (a + delta).astype(jnp.int32)

    def v3(a, p, r):
        # same as v2 plus the dot_out_to_delta fusion (combine rides the
        # first inverse pass, normalize the second) — the current default
        return re_.external_step(a, p, r, mask1=mask1, decomp_length=dl,
                                 log2_base=l2b, offset=off, mac_dtype=mac)

    def front(a, p):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        xt_pk = re_.dif_forward_packed2(packed, mask1)
        return re_.packed_to_lhs(xt_pk, mask1, mac, raw=True)

    def back(dot_out, a):
        delta = re_.dot_out_to_delta(dot_out, mask1)
        return (a + delta).astype(jnp.int32)

    def make_pipe(n_parts):
        def body(a, p, r):
            h = a.shape[-1] // n_parts
            parts_a = [a[:, i * h:(i + 1) * h] for i in range(n_parts)]
            parts_p = [p[:, i * h:(i + 1) * h] for i in range(n_parts)]
            # software pipeline: issue dot(i) then run front(i+1) (VPU)
            # before back(i) consumes dot(i)'s result
            lhs = [None] * n_parts
            dots = [None] * n_parts
            outs = [None] * n_parts
            lhs[0] = front(parts_a[0], parts_p[0])
            for i in range(n_parts):
                dots[i] = re_._mac_dot_raw(lhs[i], r, mac)
                if i + 1 < n_parts:
                    lhs[i + 1] = front(parts_a[i + 1], parts_p[i + 1])
                outs[i] = back(dots[i], parts_a[i])
            return jnp.concatenate(outs, axis=-1)
        return body

    def pipe2b(a, p, r):
        # both dots issued before either back: windows (dotA || frontB)
        # and (dotB || backA)
        h = a.shape[-1] // 2
        a0, a1 = a[:, :h], a[:, h:]
        p0, p1 = p[:, :h], p[:, h:]
        lhs0 = front(a0, p0)
        dot0 = re_._mac_dot_raw(lhs0, r, mac)
        lhs1 = front(a1, p1)
        dot1 = re_._mac_dot_raw(lhs1, r, mac)
        out0 = back(dot0, a0)
        out1 = back(dot1, a1)
        return jnp.concatenate([out0, out1], axis=-1)

    variants = [("v0 r2-baseline", v0), ("v1 +fused pack", v1),
                ("v2 +radix8 2-pass", v2),
                ("v3 +fused comb/norm", v3),
                ("p2 pipeline halves", make_pipe(2)),
                ("p2b dots-early", pipe2b),
                ("p4 pipeline quarters", make_pipe(4))]

    print(f"batch={batch} lane_tile={lane_tile} "
          f"sync={sync_overhead()*1000:.1f} ms")
    fns = {}
    ref_out = None
    for name, body in variants:
        f = make(body)
        out = np.asarray(f(acc))
        if ref_out is None:
            ref_out = out
            exact = True
        else:
            exact = bool(np.array_equal(out, ref_out))
        fns[name] = f
        print(f"{name:22s} exact={exact}")
        assert exact, name
    for name, f in fns.items():
        t = timed_chain(f, acc)
        ms_bit = t * 500 / batch * 1000
        print(f"{name:22s}: {t*1000:7.3f} ms  -> {ms_bit:.5f} ms/bit "
              f"(x{0.35/ms_bit:.2f})")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    lt = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    run(b, lt)
