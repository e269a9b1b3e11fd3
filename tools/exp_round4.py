"""Round-4 experiments: per-pass profile of the fused CMUX step.

The round-3 verdict asks for a per-pass profile of the 1.39 ms rounded-key
step at batch 2^14 (the exact `parts` microbench only covers batch 4096),
then to kill the top pass.  Bodies here are CUMULATIVE pipeline prefixes;
successive differences give per-stage costs.  Extra "consume" glue (folds /
sum-reductions that stop Mosaic from dead-code-eliminating unused slices)
is noted per body; it cancels in neighbouring differences where the glue
matches.

Rotation sub-probes split the 11-round data-dependent barrel into its
families: j-block rolls (bits 0-4, sublane-aligned), Y-rotations
(bits 5-9: rolls by 1/2/4 within 32-row blocks are NOT 8-aligned), and
the final negate (bit 10).

``context`` mode is the honest variant: 100-step in-program rotations
(``lax.fori_loop`` like the production path) where one pipeline stage at a
time is replaced by a cheap shape-correct stand-in — the difference to the
full rotation is that stage's TRUE overlapped cost (chained single-step
launches hide the MXU dot behind launch-boundary DMA, as the ``profile``
numbers show).

Usage:
    python tools/exp_round4.py profile [batch] [lane_tile]
    python tools/exp_round4.py context [batch] [lane_tile]
    NUFHE_BENCH_TRANSFORM=fft python tools/exp_round4.py context 16384 1024
"""

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


def _consume_rows(x, out_rows=2048):
    """Reduce an (n*out_rows, b) i32/i8 array to (out_rows, b) by summing
    row groups — consumes every element (no DCE), costs n-1 add passes."""
    n = x.shape[0] // out_rows
    if n == 1:
        return x.astype(jnp.int32)
    return jnp.sum(x.reshape(n, out_rows, x.shape[-1]), axis=0,
                   dtype=jnp.int32)


def profile(batch, lane_tile):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import rows_engine as re_

    tp, _, acc, powers, row = _setup(batch)
    dl, l2b, off = tp.decomp_length, tp.bs_log2_base, int(tp.offset)
    c_size, q_size = row.shape[-2], row.shape[-1]
    mask1 = 2
    mac = dt.mac_dtype()
    mode = "exact" if _exact() else "rounded-key"

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

    # --- rotation family sub-probes (copies of rotate_acc round groups) ---

    def rot_bits_j(a, p):
        """Bits 0-4: j-block rolls (stride-aligned) + Y-carry slice."""
        stride = mask1 * re_.R
        out = a
        for b in range(5):
            k = 1 << b
            rolled = re_._roll(out, stride * k)
            carry = re_.rot_block(rolled[:k * stride], 1)
            fixed = jnp.concatenate([carry, rolled[k * stride:]], axis=0)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, fixed, out)
        return out.astype(jnp.int32)

    def rot_bits_i(a, p, bits):
        """Y-rotation rounds (bits 5-9): rot_block by 2^(b-5)."""
        out = a
        for b in bits:
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, re_.rot_block(out, k), out)
        return out.astype(jnp.int32)

    # --- cumulative pipeline prefixes ---

    def b_noop(a, p, r):
        return a + 1

    def b_rot_j(a, p, r):
        return rot_bits_j(a, p)

    def b_rot_i124(a, p, r):
        return rot_bits_i(a, p, (5, 6, 7))

    def b_rot_i816(a, p, r):
        return rot_bits_i(a, p, (8, 9))

    def b_rot(a, p, r):
        return re_.rotate_acc(a, p, mask1, minus_one=True)

    def b_rotdp(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        return re_.decomp_pack2(rot, mask1, l2b, off)

    def b_fwd(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        xt_pk = re_.dif_forward_packed2(packed, mask1)   # (4096, b)
        return _consume_rows(xt_pk)

    def b_lhs(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        xt_pk = re_.dif_forward_packed2(packed, mask1)
        lhs = re_.packed_to_lhs(xt_pk, mask1, mac)       # (64, 256, b) i8
        return _consume_rows(lhs.reshape(-1, lhs.shape[-1]))

    def b_mac(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        xt_pk = re_.dif_forward_packed2(packed, mask1)
        lhs = re_.packed_to_lhs(xt_pk, mask1, mac)
        out = re_._mac_dot_raw(lhs, r, mac)              # (64, Q, b) i32
        return _consume_rows(out.reshape(-1, out.shape[-1]))

    def b_full(a, p, r):
        return re_.external_step(a, p, r, mask1=mask1, decomp_length=dl,
                                 log2_base=l2b, offset=off, mac_dtype=mac)

    bodies = [
        ("noop (1 pass)", b_noop),
        ("rot j-rolls b0-4", b_rot_j),
        ("rot Y-rolls 1/2/4", b_rot_i124),
        ("rot Y-rolls 8/16", b_rot_i816),
        ("rotation (full)", b_rot),
        ("+decomp_pack2", b_rotdp),
        ("+forward (fold glue)", b_fwd),
        ("+lhs (sum glue 8x)", b_lhs),
        ("+mac dot (sum glue)", b_mac),
        ("FULL step", b_full),
    ]

    print(f"mode={mode} batch={batch} lane_tile={lane_tile} "
          f"Q={q_size} sync={sync_overhead()*1000:.1f} ms", flush=True)
    results = {}
    for name, body in bodies:
        f = make(body)
        t = timed_chain(f, acc)
        results[name] = t
        print(f"{name:24s}: {t*1000:8.3f} ms", flush=True)
    return results


def context(batch, lane_tile, n_steps=100):
    """In-program (fori_loop) step ablations: replace one stage with a
    cheap shape-correct stand-in; full-minus-variant = the stage's true
    overlapped cost.  Stand-ins are mathematically wrong (timing only)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    # pipeline stages (shared by the variants)
    def stage_rot(a, p):
        return re_.rotate_acc(a, p, mask1, minus_one=True)

    def stage_pack(rot):
        return re_.decomp_pack2(rot, mask1, l2b, off)

    def stage_fwd(packed):
        return re_.dif_forward_packed2(packed, mask1)

    def stage_lhs(xt_pk):
        return re_.packed_to_lhs(xt_pk, mask1, mac)

    def stage_dot(lhs, r):
        return re_._mac_dot_raw(lhs, r, mac)

    def stage_inv(out):
        return re_.dot_out_to_delta(out, mask1)

    def full(a, p, r):
        rot = stage_rot(a, p)
        out = stage_dot(stage_lhs(stage_fwd(stage_pack(rot))), r)
        return (a + stage_inv(out)).astype(jnp.int32)

    def no_rot(a, p, r):
        out = stage_dot(stage_lhs(stage_fwd(stage_pack(a))), r)
        return (a + stage_inv(out)).astype(jnp.int32)

    def no_fwd(a, p, r):
        packed = stage_pack(stage_rot(a, p))
        fake_xt = jnp.concatenate([packed, packed], axis=0)   # (4096, b)
        out = stage_dot(stage_lhs(fake_xt), r)
        return (a + stage_inv(out)).astype(jnp.int32)

    def no_lhs(a, p, r):
        xt_pk = stage_fwd(stage_pack(stage_rot(a, p)))        # (4096, b)
        v = xt_pk.reshape(re_.L, 2 * re_.R, xt_pk.shape[-1])
        fake_lhs = jnp.concatenate([v, v, v, v], axis=1).astype(mac)
        out = stage_dot(fake_lhs, r)
        return (a + stage_inv(out)).astype(jnp.int32)

    def no_pack(a, p, r):
        rot = stage_rot(a, p)
        out = stage_dot(stage_lhs(stage_fwd(rot)), r)  # rot as fake packed
        return (a + stage_inv(out)).astype(jnp.int32)

    def no_inv(a, p, r):
        out = stage_dot(stage_lhs(stage_fwd(stage_pack(stage_rot(a, p)))), r)
        # consume the whole dot output with group-axis sums + a fold
        # (~4 short adds): (L, S, o_r, b) -> (L, o_r, b) -> fold to 2048
        o_r = mask1 * re_.R
        s = jnp.sum(out.reshape(re_.L, q_size // o_r, o_r, out.shape[-1]),
                    axis=1, dtype=jnp.int32)
        s = s.reshape(re_.L * o_r, out.shape[-1])      # (4096, b)
        half = s.shape[0] // 2
        return (a + s[:half] + s[half:]).astype(jnp.int32)

    def noop_step(a, p, r):
        # in-program per-step floor: loop + launch + acc HBM round-trip
        return (a + 1).astype(jnp.int32)

    def dot_only(a, p, r):
        # dot + cheap glue: lhs from 8 shifted copies of acc (consumes a),
        # output consumed through group sums + fold
        v = a.reshape(re_.L, 32, a.shape[-1])
        fake_lhs = jnp.concatenate(
            [(v >> (i % 3)) for i in range(8)], axis=1).astype(mac)
        out = re_._mac_dot_raw(fake_lhs[:, :256], r, mac)
        o_r = mask1 * re_.R
        s = jnp.sum(out.reshape(re_.L, q_size // o_r, o_r, out.shape[-1]),
                    axis=1, dtype=jnp.int32)
        s = s.reshape(re_.L * o_r, out.shape[-1])
        half = s.shape[0] // 2
        return (a + s[:half] + s[half:]).astype(jnp.int32)

    variants = [("FULL", full), ("noop step", noop_step),
                ("dot only", dot_only), ("no rotation", no_rot),
                ("no forward", no_fwd), ("no lhs-split", no_lhs),
                ("no pack", no_pack), ("no inverse", no_inv)]

    print(f"mode={mode} batch={batch} lane_tile={lane_tile} "
          f"n_steps={n_steps} sync={sync_overhead()*1000:.1f} ms", flush=True)
    base = None
    for name, body in variants:
        f = make(body)
        t = timed_chain(f, acc, iters=3, inner=2)
        per = t / n_steps * 1e3
        if base is None:
            base = per
            print(f"{name:16s}: {per:8.4f} ms/step", flush=True)
        else:
            print(f"{name:16s}: {per:8.4f} ms/step  "
                  f"(stage cost ~{base - per:+.4f})", flush=True)


def tricks(batch, lane_tile, n_steps=100):
    """Candidate micro-optimizations, measured in-program with bit-exactness
    asserted against the current engine:

    t1  single-roll block rotations: in rot_block/_pk_rot_block the second
        (wrap) roll equals the first rolled by -blk — a sublane-ALIGNED
        roll (free vreg reindex) — so every negacyclic rotation needs ONE
        unaligned shuffle instead of two.
    t2  + leaner decomp_pack2: the f1 field lands at bit 16 via one
        masked left-shift of the source word ((s<<4) & 0x03FF0000) instead
        of extract-then-shift; biases folded into one constant.
    t3  + rotate_acc j-rounds restructured: carry patch via small-slice
        where instead of building the fixed array before the select.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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

    # --- candidate implementations -------------------------------------

    def rot_block_v2(x, e, blk=re_.R):
        e = e % (2 * blk)
        if e >= blk:
            x, e = -x, e - blk
        if e == 0:
            return x
        hi = re_._roll(x, e)
        lo = re_._roll(hi, -blk)          # aligned: free vreg reindex
        return jnp.where(re_._mask(x, 'geq_mod', blk, e), hi, -lo)

    def pk_rot_block_v2(w, e, blk=re_.R):
        e = e % (2 * blk)
        neg = e >= blk
        if neg:
            e -= blk
        if e == 0:
            return re_._pk_neg(w) if neg else w
        hi = re_._roll(w, e)
        lo = re_._roll(hi, -blk)
        if neg:
            hi, lo = re_._pk_neg(hi), lo
        else:
            lo = re_._pk_neg(lo)
        return jnp.where(re_._mask(w, 'geq_mod', blk, e), hi, lo)

    _B14 = 1 << 14

    def decomp_pack2_v2_l10(rot, mask1_, log2_base, offset):
        # f1 = ((s >> 12) & 1023) << 16 = (s << 4) & (1023 << 16); both
        # field biases folded into one constant add
        assert log2_base == 10
        s = rot + jnp.int32(offset)
        bias = ((_B14 - 512) * (1 + (1 << 16)))
        bias = jnp.int32(((bias + 2**31) % 2**32) - 2**31)
        f0 = (s >> 22) & jnp.int32(1023)
        f1s = (s << 4) & jnp.int32(1023 << 16)
        return ((f0 + f1s) + bias).astype(jnp.int32)

    # --- t4: bias-deferred ("raw") packed forward ------------------------
    # Every _pk_add / _pk_sub spends 1-2 extra VPU ops re-normalizing the
    # per-field bias, and Mosaic does NOT constant-fold them (t2's win
    # proves it).  All stage values are i32-LINEAR in the inputs, so the
    # bias constants commute out: compute with plain +/- (1 op each),
    # track the per-output STATIC bias, and fold the one normalization
    # into packed_to_lhs's existing constant add (zero extra cost).
    # Bit-exact by linearity (asserted below).

    _BP = 512 * (1 + (1 << 16))          # raw field bias of packed digits

    def decomp_pack2_raw(rot, log2_base, offset):
        # fields f = d + 512 with NO 2^14 re-bias: 5 ops
        s = rot + jnp.int32(offset)
        f0 = (s >> 22) & jnp.int32(1023)
        f1s = (s << 4) & jnp.int32(1023 << 16)
        return (f0 + f1s).astype(jnp.int32)

    def rot_pk_raw(w, e, bias2=0, blk=re_.R):
        """Negacyclic rotation of raw packed words with per-field bias b
        (bias2 = packed 2*b constant): wrap negation is K - w, K = 2b."""
        e = e % (2 * blk)
        neg = e >= blk
        if neg:
            e -= blk
        K = jnp.int32(_wrap32i(bias2))

        def negate(x):
            return (K - x) if bias2 else -x
        if e == 0:
            return negate(w) if neg else w
        hi = re_._roll(w, e)
        lo = re_._roll(hi, -blk)
        if neg:
            hi = negate(hi)
        else:
            lo = negate(lo)
        return jnp.where(re_._mask(w, 'geq_mod', blk, e), hi, lo)

    def _wrap32i(v):
        return ((v + 2**31) % 2**32) - 2**31

    def dif_forward_packed2_raw(dig_pk, n_pk):
        """Two-pass radix-8 forward on RAW packed words (see t4 note).
        Output biases: 2^14 per field on rows with (grp in {0,4} and
        out_slice == 0), zero elsewhere — normalized by the caller."""
        stride = n_pk * re_.R
        b = dig_pk.shape[-1]
        A = dig_pk.reshape(re_.M, stride, b)

        groups = [[None] * 8 for _ in range(8)]
        for j in range(8):
            a = A[j]
            bb = A[j + 8]
            c = A[j + 16]
            d = A[j + 24]
            c16 = rot_pk_raw(c, 16, 2 * _BP)
            d16 = rot_pk_raw(d, 16, 2 * _BP)
            p = a + c                       # bias 2BP
            q = bb + d                      # 2BP
            m_ = a - c                      # 0
            n_ = bb - d                     # 0
            r = a + c16                     # 2BP
            s_ = a - c16                    # 0
            t = bb + d16                    # 2BP
            u = bb - d16                    # 0
            groups[0][j] = p + q            # 4BP
            groups[1][j] = rot_pk_raw(p - q, 4 * j)
            n16 = rot_pk_raw(n_, 16)
            groups[2][j] = rot_pk_raw(m_ + n16, 2 * j)
            groups[3][j] = rot_pk_raw(m_ - n16, 6 * j)
            t8 = rot_pk_raw(t, 8, 4 * _BP)
            groups[4][j] = rot_pk_raw(r + t8, j, 8 * _BP)   # 4BP
            groups[5][j] = rot_pk_raw(r - t8, 5 * j)
            u24 = rot_pk_raw(u, 24)
            groups[6][j] = rot_pk_raw(s_ + u24, 3 * j)
            groups[7][j] = rot_pk_raw(s_ - u24, 7 * j)
        x = jnp.concatenate(
            [g.reshape(1, stride, b) for grp in groups for g in grp],
            axis=0).reshape(re_.L * stride, b)

        # tail: biases per row-group: grp in {0,4} carry 4BP, others 0
        v = x.reshape(-1, 8, stride, b)
        xs = [v[:, m].reshape(-1, b) for m in range(8)]
        # xs[m] rows = (grp, stride): per-row bias pattern f(grp), shared
        # by all xs -> differences cancel, sums double
        s = [xs[m] + xs[m + 4] for m in range(4)]           # 2*f(grp)
        d = [rot_pk_raw(xs[m] - xs[m + 4], 8 * m) for m in range(4)]
        ss0 = s[0] + s[2]                                   # 4*f(grp)
        ss1 = s[1] + s[3]
        sd0 = s[0] - s[2]
        sd1 = rot_pk_raw(s[1] - s[3], 16)
        ds0 = d[0] + d[2]
        ds1 = d[1] + d[3]
        dd0 = d[0] - d[2]
        dd1 = rot_pk_raw(d[1] - d[3], 16)
        outs = [ss0 + ss1, ss0 - ss1,                       # [0]: 8*f(grp)
                sd0 + sd1, sd0 - sd1,
                ds0 + ds1, ds0 - ds1,
                dd0 + dd1, dd0 - dd1]
        return jnp.concatenate(
            [o.reshape(-1, 1, stride, b) for o in outs],
            axis=1).reshape(re_.L * stride, b)

    def packed_to_lhs_raw(xt_pk, n_pk, mac_dtype):
        """packed_to_lhs with the t4 bias normalization folded into the
        existing constant add: rows with (grp in {0,4}, out 0) already
        carry the 2^14 field bias (8 * 4BP = 2^14*(1+2^16)); all other
        rows get it here."""
        b = xt_pk.shape[-1]
        stride = 2 * n_pk * re_.R
        rrow = jax.lax.broadcasted_iota(jnp.int32, (xt_pk.shape[0], 1), 0)
        grp = rrow // (8 * n_pk * re_.R)
        out_sl = (rrow // (n_pk * re_.R)) % 8
        biased = ((grp == 0) | (grp == 4)) & (out_sl == 0)
        norm = _wrap32i(re_._B14 * (1 + (1 << 16)))      # python int
        u = xt_pk + jnp.where(biased, jnp.int32(0x00800080),
                              jnp.int32(_wrap32i(0x00800080 + norm)))
        sh = (re_.L, n_pk, 1, 1, re_.R, b)
        ev_a0 = ((u & 0xFF) - jnp.int32(128)).reshape(sh)
        od_a0 = (((u >> 16) & 0xFF) - jnp.int32(128)).reshape(sh)
        ev_a1 = (((u >> 8) & 0xFF) - jnp.int32(64)).reshape(sh)
        od_a1 = (((u >> 24) & 0xFF) - jnp.int32(64)).reshape(sh)
        lhs = jnp.concatenate([
            jnp.concatenate([ev_a0, ev_a1], axis=3),
            jnp.concatenate([od_a0, od_a1], axis=3)], axis=2)
        return lhs.reshape(re_.L, 2 * stride, b).astype(mac_dtype)

    def external_step_t4(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = decomp_pack2_raw(rot, l2b, off)
        xt_pk = dif_forward_packed2_raw(packed, mask1)
        lhs = packed_to_lhs_raw(xt_pk, mask1, mac)
        out = re_._mac_dot_raw(lhs, r, mac)
        return (a + re_.dot_out_to_delta(out, mask1)).astype(jnp.int32)

    def rotate_acc_v4(x, p, mask1_, minus_one=False):
        """Deferred j-carry: the five j-block rounds run as PURE cyclic
        rolls + selects; the net wrap region after them is exactly rows
        [0, (p mod 32)*stride) (the composed permutation's wrap count is 1
        iff the destination j < p mod 32, independent of the binary
        decomposition path), so ONE lane-masked Y-fix replaces five
        per-round carry patches.  The final negate (bit 10) fuses into the
        minus_one subtract as a +-1 multiply."""
        stride = mask1_ * re_.R
        out = x
        for b in range(5):
            k = 1 << b
            rolled = re_._roll(out, stride * k)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, rolled, out)
        # Y-fix on rows [0, r*stride), r = p mod 32 (lane-dependent extent)
        r_rows = (p & 31) * stride                     # (1, b)
        rows = jax.lax.broadcasted_iota(jnp.int32, (out.shape[0], 1), 0)
        yfix = re_.rot_block(out, 1)
        out = jnp.where(rows < r_rows, yfix, out)
        for b in range(5, 10):
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, re_.rot_block(out, k), out)
        sign = jnp.where(((p >> 10) & 1) != 0, jnp.int32(-1), jnp.int32(1))
        if minus_one:
            return (out * sign - x).astype(jnp.int32)
        return (out * sign).astype(jnp.int32)

    def external_step_t5(a, p, r):
        rot = rotate_acc_v4(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        out = re_._mac_dot_raw(
            re_.packed_to_lhs(re_.dif_forward_packed2(packed, mask1),
                              mask1, mac, raw=True), r, mac)
        return (a + re_.dot_out_to_delta(out, mask1)).astype(jnp.int32)

    def rotate_acc_v3(x, p, mask1_, minus_one=False):
        stride = mask1_ * re_.R
        out = x
        for b in range(5):
            k = 1 << b
            ks = k * stride
            rolled = re_._roll(out, ks)
            bit = ((p >> b) & 1) != 0
            body = jnp.where(bit, rolled, out)
            carry = rot_block_v2(rolled[:ks], 1)
            head = jnp.where(bit, carry, out[:ks])
            out = jnp.concatenate([head, body[ks:]], axis=0)
        for b in range(5, 10):
            k = 1 << (b - 5)
            bit = ((p >> b) & 1) != 0
            out = jnp.where(bit, rot_block_v2(out, k), out)
        bit = ((p >> 10) & 1) != 0
        out = jnp.where(bit, -out, out)
        if minus_one:
            out = out - x
        return out.astype(jnp.int32)

    # --- harness --------------------------------------------------------

    def make_with_bara(step_body, bara_arr):
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

        return lambda a: rot(a, bk, bara_arr)

    def make(step_body):
        return make_with_bara(step_body, bara_t)

    def full_step(a, p, r):
        return re_.external_step(a, p, r, mask1=mask1, decomp_length=dl,
                                 log2_base=l2b, offset=off, mac_dtype=mac)

    import contextlib

    @contextlib.contextmanager
    def patched(**repl):
        saved = {k: getattr(re_, k) for k in repl}
        try:
            for k, v in repl.items():
                setattr(re_, k, v)
            yield
        finally:
            for k, v in saved.items():
                setattr(re_, k, v)

    print(f"mode={mode} batch={batch} lane_tile={lane_tile} "
          f"n_steps={n_steps} sync={sync_overhead()*1000:.1f} ms", flush=True)

    f0 = make(full_step)
    ref_out = np.asarray(f0(acc))
    t = timed_chain(f0, acc, iters=3, inner=2)
    print(f"{'baseline':28s}: {t/n_steps*1e3:8.4f} ms/step", flush=True)

    # evened-powers harness for the coarse-modulus-switch variants: the
    # exactness oracle is the BASELINE step on the same even powers
    bara_even = (bara_t & ~jnp.int32(1)).astype(jnp.int32)
    ref_even = None

    # --- t6/t7: slab-hoisted forward head / inverse -----------------------
    # Hypothesis: the per-stage cost exceeds the op-count estimate ~2x
    # because the head/pass2 loops issue hundreds of SMALL (64-row-slice)
    # ops with per-instruction overhead.  All j-uniform adds/rotations
    # hoist into whole-slab ops (identical arithmetic per element, no
    # reassociation -> bit-identical); only the j-dependent twiddle
    # rotations stay per-slice.

    def _slab(x):
        return x.reshape(-1, x.shape[-1])

    def fwd_hoisted(dig_pk, n_pk):
        stride = n_pk * re_.R
        b = dig_pk.shape[-1]
        A = dig_pk.reshape(re_.M, stride, b)
        BP = _BP
        a = _slab(A[0:8])          # (8*stride, b) slabs
        bb = _slab(A[8:16])
        c = _slab(A[16:24])
        d = _slab(A[24:32])
        c16 = rot_pk_raw(c, 16, 2 * BP)
        d16 = rot_pk_raw(d, 16, 2 * BP)
        p = a + c
        q = bb + d
        m_ = a - c
        n_ = bb - d
        r = a + c16
        s_ = a - c16
        t = bb + d16
        u = bb - d16
        n16 = rot_pk_raw(n_, 16)
        t8 = rot_pk_raw(t, 8, 4 * BP)
        u24 = rot_pk_raw(u, 24)
        pre = [p + q, p - q, m_ + n16, m_ - n16,
               r + t8, r - t8, s_ + u24, s_ - u24]       # slabs (8*stride)
        coeffs = [0, 4, 2, 6, 1, 5, 3, 7]
        biases = [4 * BP, 0, 0, 0, 4 * BP, 0, 0, 0]
        gs = []
        for k in range(8):
            if coeffs[k] == 0:
                gs.append(pre[k])
                continue
            v = pre[k].reshape(8, stride, b)
            gs.append(jnp.concatenate(
                [rot_pk_raw(v[j], coeffs[k] * j, 2 * biases[k])
                 .reshape(1, stride, b) for j in range(8)],
                axis=0).reshape(8 * stride, b))
        x = jnp.concatenate(
            [g.reshape(1, 8 * stride, b) for g in gs],
            axis=0).reshape(re_.L * stride, b)

        # tail (already slab-structured; copy of the engine's raw tail)
        v = x.reshape(-1, 8, stride, b)
        xs = [v[:, m].reshape(-1, b) for m in range(8)]
        s = [xs[m] + xs[m + 4] for m in range(4)]
        d2 = [rot_pk_raw(xs[m] - xs[m + 4], 8 * m) for m in range(4)]
        ss0 = s[0] + s[2]
        ss1 = s[1] + s[3]
        sd0 = s[0] - s[2]
        sd1 = rot_pk_raw(s[1] - s[3], 16)
        ds0 = d2[0] + d2[2]
        ds1 = d2[1] + d2[3]
        dd0 = d2[0] - d2[2]
        dd1 = rot_pk_raw(d2[1] - d2[3], 16)
        outs = [ss0 + ss1, ss0 - ss1, sd0 + sd1, sd0 - sd1,
                ds0 + ds1, ds0 - ds1, dd0 + dd1, dd0 - dd1]
        return jnp.concatenate(
            [o.reshape(-1, 1, stride, b) for o in outs],
            axis=1).reshape(re_.L * stride, b)

    def inv_hoisted(out, mask1_):
        """dot_out_to_delta with (a) whole-tensor group combine and
        (b) pass-2 adds on slabs (only j-dependent rotations per-slice)."""
        b = out.shape[-1]
        o_r = mask1_ * re_.R
        q = out.shape[-2]
        n_groups = q // o_r
        assert n_groups == 4, "rounded-mode probe"
        # whole-tensor combine: 6 ops
        o4 = out.reshape(re_.L, n_groups, o_r, b)
        A_all = (o4[:, 0] + (o4[:, 1] << 8)) + \
            ((o4[:, 2] << 16) + (o4[:, 3] << 24))        # (L, o_r, b)
        v0 = A_all.reshape(8, 8, o_r, b)
        a = [v0[:, i].reshape(-1, b) for i in range(8)]  # (8*o_r, b) slabs
        b0 = a[0] + a[1]
        b1 = a[0] - a[1]
        b2 = a[2] + a[3]
        b3 = a[2] - a[3]
        b4 = a[4] + a[5]
        b5 = a[4] - a[5]
        b6 = a[6] + a[7]
        b7 = a[6] - a[7]
        c0 = b0 + b2
        c2 = b0 - b2
        t = re_.rot_block(b3, -16)
        c1 = b1 + t
        c3 = b1 - t
        c4 = b4 + b6
        c6 = b4 - b6
        t = re_.rot_block(b7, -16)
        c5 = b5 + t
        c7 = b5 - t
        d0 = c0 + c4
        d4 = c0 - c4
        t = re_.rot_block(c5, -8)
        d1 = c1 + t
        d5 = c1 - t
        t = re_.rot_block(c6, -16)
        d2 = c2 + t
        d6 = c2 - t
        t = re_.rot_block(c7, -24)
        d3 = c3 + t
        d7 = c3 - t
        stride = o_r
        x = jnp.concatenate(
            [dd.reshape(-1, 1, stride, b) for dd in
             (d0, d1, d2, d3, d4, d5, d6, d7)],
            axis=1).reshape(re_.L * stride, b)

        # pass 2, slab-hoisted: per-slice rotations gathered into slabs,
        # then slab adds.  w-slabs: (8grp?, j, stride) -> wz = v[z] slabs
        v = x.reshape(8, 8 * stride, b)                  # z-major slabs

        def rotj(slab, coef, extra=0):
            # per-j rotation of an (8, stride) slab by coef*j + extra;
            # j-uniform amounts (coef == 0) rotate the whole slab at once
            if coef == 0:
                return re_.rot_block(slab, extra) if extra else slab
            vv = slab.reshape(8, stride, b)
            return jnp.concatenate(
                [re_.rot_block(vv[j], coef * j + extra)
                 .reshape(1, stride, b) for j in range(8)],
                axis=0).reshape(8 * stride, b)

        w = [v[z] for z in range(8)]
        t1 = rotj(w[1], -4)
        e0 = w[0] + t1
        e1 = w[0] - t1
        t3 = rotj(w[3], -4)
        e2 = w[2] + t3
        e3 = w[2] - t3
        t5 = rotj(w[5], -4)
        e4 = w[4] + t5
        e5 = w[4] - t5
        t7 = rotj(w[7], -4)
        e6 = w[6] + t7
        e7 = w[6] - t7
        t = rotj(e2, -2)
        f0 = e0 + t
        f2 = e0 - t
        t = rotj(e3, -2, -16)
        f1 = e1 + t
        f3 = e1 - t
        t = rotj(e6, -2)
        f4 = e4 + t
        f6 = e4 - t
        t = rotj(e7, -2, -16)
        f5 = e5 + t
        f7 = e5 - t
        t = rotj(f4, -1)
        g0 = f0 + t
        g4 = f0 - t
        t = rotj(f5, -1, -8)
        g1 = f1 + t
        g5 = f1 - t
        t = rotj(f6, -1, -16)
        g2 = f2 + t
        g6 = f2 - t
        t = rotj(f7, -1, -24)
        g3 = f3 + t
        g7 = f3 - t
        o0 = g0 + rotj(g4, 0, 1)
        o1 = g1 + rotj(g5, 0, 1)
        o2 = g2 + rotj(g6, 0, 1)
        o3 = g3 + rotj(g7, 0, 1)
        return jnp.concatenate(
            [o.reshape(1, 8 * stride, b) for o in (o0, o1, o2, o3)],
            axis=0).reshape(mask1_ * re_.N, b).astype(jnp.int32)

    def step_t6(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(fwd_hoisted(packed, mask1), mask1, mac,
                                raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return (a + re_.dot_out_to_delta(out, mask1)).astype(jnp.int32)

    def step_t7(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(
            re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return (a + inv_hoisted(out, mask1)).astype(jnp.int32)

    def step_t67(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(fwd_hoisted(packed, mask1), mask1, mac,
                                raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return (a + inv_hoisted(out, mask1)).astype(jnp.int32)

    # --- t8: coarse modulus switch (even rotation amounts) ----------------
    # Round p to the nearest EVEN value with a zero-mean tie rule (odd p
    # moves +-1 by bit 1 of p), then skip barrel round 0 statically.
    # Adds ~0.0044 torus phase-noise std per gate (n=500) — safe against
    # the 1/16 margin; measured gain is the question.

    def rotate_acc_skip1(x, p, mask1_, minus_one=False):
        stride = mask1_ * re_.R
        out = x
        for b in range(1, 5):                     # bit 0 statically zero
            k = 1 << b
            rolled = re_._roll(out, stride * k)
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

    def step_t8(a, p, r):
        rot = rotate_acc_skip1(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(
            re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return (a + re_.dot_out_to_delta(out, mask1)).astype(jnp.int32)

    # --- t9: accumulator add fused into the inverse's output emission ----

    def dot_out_add_acc(out, acc, mask1_):
        """dot_out_to_delta with `acc` added per output slice as it is
        emitted (the separate full-array acc+delta pass disappears)."""
        b = out.shape[-1]
        o_r = mask1_ * re_.R
        q = out.shape[-2]
        n_groups = q // o_r
        assert n_groups == 4
        stride = o_r
        v0 = out.reshape(8, 8, q, b)

        def combine(i):
            o_sl = v0[:, i]
            sl = [jax.lax.slice_in_dim(o_sl, s * o_r, (s + 1) * o_r, axis=1)
                  for s in range(n_groups)]
            a_ch = (sl[0] + (sl[1] << 8)) + ((sl[2] << 16) + (sl[3] << 24))
            return a_ch.reshape(8 * stride, b)

        a_ = [combine(i) for i in range(8)]
        b0 = a_[0] + a_[1]
        b1 = a_[0] - a_[1]
        b2 = a_[2] + a_[3]
        b3 = a_[2] - a_[3]
        b4 = a_[4] + a_[5]
        b5 = a_[4] - a_[5]
        b6 = a_[6] + a_[7]
        b7 = a_[6] - a_[7]
        c0 = b0 + b2
        c2 = b0 - b2
        t = re_.rot_block(b3, -16)
        c1 = b1 + t
        c3 = b1 - t
        c4 = b4 + b6
        c6 = b4 - b6
        t = re_.rot_block(b7, -16)
        c5 = b5 + t
        c7 = b5 - t
        d0 = c0 + c4
        d4 = c0 - c4
        t = re_.rot_block(c5, -8)
        d1 = c1 + t
        d5 = c1 - t
        t = re_.rot_block(c6, -16)
        d2 = c2 + t
        d6 = c2 - t
        t = re_.rot_block(c7, -24)
        d3 = c3 + t
        d7 = c3 - t
        x = jnp.concatenate(
            [dd.reshape(-1, 1, stride, b) for dd in
             (d0, d1, d2, d3, d4, d5, d6, d7)],
            axis=1).reshape(re_.L * stride, b)

        acc_v = acc.reshape(re_.M, stride, b)
        v = x.reshape(8, 8, stride, b)
        outs = [[None] * 8 for _ in range(4)]
        for j in range(8):
            w = [v[z, j] for z in range(8)]
            t = re_.rot_block(w[1], -4 * j)
            e0 = w[0] + t
            e1 = w[0] - t
            t = re_.rot_block(w[3], -4 * j)
            e2 = w[2] + t
            e3 = w[2] - t
            t = re_.rot_block(w[5], -4 * j)
            e4 = w[4] + t
            e5 = w[4] - t
            t = re_.rot_block(w[7], -4 * j)
            e6 = w[6] + t
            e7 = w[6] - t
            t = re_.rot_block(e2, -2 * j)
            f0 = e0 + t
            f2 = e0 - t
            t = re_.rot_block(e3, -2 * (j + 8))
            f1 = e1 + t
            f3 = e1 - t
            t = re_.rot_block(e6, -2 * j)
            f4 = e4 + t
            f6 = e4 - t
            t = re_.rot_block(e7, -2 * (j + 8))
            f5 = e5 + t
            f7 = e5 - t
            t = re_.rot_block(f4, -j)
            g0 = f0 + t
            g4 = f0 - t
            t = re_.rot_block(f5, -(j + 8))
            g1 = f1 + t
            g5 = f1 - t
            t = re_.rot_block(f6, -(j + 16))
            g2 = f2 + t
            g6 = f2 - t
            t = re_.rot_block(f7, -(j + 24))
            g3 = f3 + t
            g7 = f3 - t
            for zi, (ga, gb) in enumerate(((g0, g4), (g1, g5),
                                           (g2, g6), (g3, g7))):
                c = ga + re_.rot_block(gb, 1)
                outs[zi][j] = (c + acc_v[zi * 8 + j]).astype(jnp.int32)
        return jnp.concatenate(
            [o.reshape(1, stride, b) for grp in outs for o in grp],
            axis=0).reshape(mask1_ * re_.N, b)

    def step_t9(a, p, r):
        rot = re_.rotate_acc(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(
            re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return dot_out_add_acc(out, a, mask1)

    def step_t89(a, p, r):
        rot = rotate_acc_skip1(a, p, mask1, minus_one=True)
        packed = re_.decomp_pack2(rot, mask1, l2b, off)
        lhs = re_.packed_to_lhs(
            re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
        out = re_._mac_dot_raw(lhs, r, mac)
        return dot_out_add_acc(out, a, mask1)

    # --- t10: static rotations as slice-concat instead of roll+select ----
    # For STATIC twiddle amounts the negacyclic rotation within blk-row
    # blocks is exactly [-tail_e | head_(blk-e)] per block: one partial
    # negate (~e/blk of a pass) + one concat copy, vs the roll+neg+select
    # (~2 full passes + shuffles) of rot_block.  Data-dependent rotations
    # (rotate_acc) keep the select form.

    def rot_block_sc(x, e, blk=re_.R):
        e = e % (2 * blk)
        neg = e >= blk
        if neg:
            e -= blk
        if e == 0:
            return -x if neg else x
        b = x.shape[-1]
        v = x.reshape(-1, blk, b)
        tail = v[:, blk - e:]
        head = v[:, :blk - e]
        if neg:
            out = jnp.concatenate([tail, -head], axis=1)
        else:
            out = jnp.concatenate([-tail, head], axis=1)
        return out.reshape(x.shape)

    def rot_pk_sc(w, e, bias2=0, blk=re_.R):
        e = e % (2 * blk)
        neg = e >= blk
        if neg:
            e -= blk
        K = jnp.int32(_wrap32i(bias2))

        def negate(x):
            return (K - x) if bias2 else -x
        if e == 0:
            return negate(w) if neg else w
        b = w.shape[-1]
        v = w.reshape(-1, blk, b)
        tail = v[:, blk - e:]
        head = v[:, :blk - e]
        if neg:
            out = jnp.concatenate([tail, negate(head)], axis=1)
        else:
            out = jnp.concatenate([negate(tail), head], axis=1)
        return out.reshape(w.shape)

    def step_t10(a, p, r):
        # static-concat rotations in the forward + inverse; data-dependent
        # barrel unchanged
        with patched(rot_block=rot_block_sc, _pk_rot_raw=rot_pk_sc):
            rot = rotate_acc_orig(a, p, mask1, minus_one=True)
            packed = re_.decomp_pack2(rot, mask1, l2b, off)
            lhs = re_.packed_to_lhs(
                re_.dif_forward_packed2(packed, mask1), mask1, mac, raw=True)
            out = re_._mac_dot_raw(lhs, r, mac)
            return re_.dot_out_to_delta(out, mask1, acc=a)

    rotate_acc_orig = re_.rotate_acc

    # NOTE: t1-t4 were measured against the round-3 engine; t4 (bias-
    # deferred forward) has since been INTEGRATED into rows_engine, so
    # "baseline" here is the post-t4 engine.  t8 is measured on EVENED
    # powers (the baseline with the same powers is the exactness oracle).
    variants = [
        ("t10 static slice-concat rot", None, step_t10),
        ("t9 fused acc add", None, step_t9),
        ("t8+t9 (even powers)", "even", step_t89),
        ("t8 even-p skip round 0", "even", step_t8),
        ("t6 slab-hoisted forward", None, step_t6),
        ("t7 slab-hoisted inverse", None, step_t7),
        ("t5 deferred j-carry rot", None, external_step_t5),
    ]
    sel = os.environ.get("NUFHE_TRICKS")   # substring filter, e.g. "t10"
    for name, repl, body in variants:
        if sel and sel not in name:
            continue
        even = repl == "even"
        with patched(**({} if (even or repl is None) else repl)):
            f = make(body or full_step)
            if even:
                f = make_with_bara(body or full_step, bara_even)
                if ref_even is None:
                    f_refe = make_with_bara(full_step, bara_even)
                    ref_even = np.asarray(f_refe(acc))
                out = np.asarray(f(acc))
                same = bool(np.array_equal(out, ref_even))
            else:
                out = np.asarray(f(acc))
                same = bool(np.array_equal(out, ref_out))
            t = timed_chain(f, acc, iters=3, inner=2)
        print(f"{name:28s}: {t/n_steps*1e3:8.4f} ms/step  exact={same}",
              flush=True)
        assert same, name


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    lt = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    if mode == "profile":
        profile(b, lt)
    elif mode == "context":
        context(b, lt)
    elif mode == "tricks":
        tricks(b, lt)
    else:
        raise SystemExit(f"unknown mode {mode}")
