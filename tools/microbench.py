"""Microbenchmarks for the device engine with honest timing.

On the tunneled TPU platform ``jax.block_until_ready`` can return before
execution finishes; the only reliable fence is a D2H transfer.  Every
measurement here chains ``inner`` data-dependent iterations and ends with a
scalar D2H, subtracting the separately-measured sync round-trip.

Usage:
    python tools/microbench.py step [batch] [lane_tile]   # fused CMUX step
    python tools/microbench.py parts [batch]              # step components
    python tools/microbench.py keyswitch [batch]          # keyswitch share
    python tools/microbench.py rotation [batch] [lt]      # chunked launches
    python tools/microbench.py intadd [batch] [width]     # ripple vs KS adder

``NUFHE_BENCH_TRANSFORM=fft`` switches step/rotation to the rounded-key
engine (the 'FFT' accuracy mode); the default is the exact engine.
``parts`` is exact-engine only (its bodies hard-code dual-channel shapes).
"""

import os
import sys
import time

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


def timed_chain(fn, x, iters=4, inner=48):
    """fn: x -> x (same shape/dtype). Chained to serialize execution;
    returns seconds per call with the single D2H sync subtracted.
    ``NUFHE_PROFILE_DIR=<dir>`` captures an XLA/Mosaic device trace of the
    measured region (``nufhe_tpu.utils.profiling``)."""
    from nufhe_tpu.utils import profile_trace

    ov = sync_overhead()
    y = fn(x)
    np.asarray(y.ravel()[0])
    best = float('inf')
    with profile_trace():
        for _ in range(iters):
            y = x
            t0 = time.time()
            for _ in range(inner):
                y = fn(y)
            np.asarray(y.ravel()[0])
            best = min(best, (time.time() - t0 - ov) / inner)
    return best


def _exact():
    """NUFHE_BENCH_TRANSFORM=fft selects the rounded-key engine (same env
    var as bench.py); default is the exact ('NTT') engine."""
    return os.environ.get("NUFHE_BENCH_TRANSFORM", "ntt").lower() != "fft"


def _setup(batch, exact=None):
    from nufhe_tpu.params import NuFHEParameters
    from nufhe_tpu.ops import rows_engine as re_
    from nufhe_tpu.ops import tgsw as dtgsw

    params = NuFHEParameters()
    tp = params.tgsw_params
    rs = np.random.RandomState(0)
    acc = jnp.asarray(
        rs.randint(-2**31, 2**31, (2048, batch)).astype(np.int32))
    powers = jnp.asarray(rs.randint(0, 2048, (1, batch)).astype(np.int32))
    bk_coeff = rs.randint(
        -2**31, 2**31, (1, 2, tp.decomp_length, 2, 1024)).astype(np.int32)
    if exact is None:
        exact = _exact()
    row = dtgsw.prepare_bootstrap_key_device(bk_coeff, exact=exact)[0]
    return tp, re_, acc, powers, row


def bench_step(batch, lane_tile):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops.pallas import blind_rotate as pbr

    tp, re_, acc, powers, row = _setup(batch)
    step = pbr.make_external_step_rows(
        2, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        lane_tile=lane_tile, mac_dtype=dt.mac_dtype())
    f = jax.jit(lambda a: step(a, powers, row))
    t = timed_chain(f, acc)
    ms_bit = t * 500 / batch * 1000
    mode = "exact" if _exact() else "rounded-key"
    print(f"fused CMUX step [{mode}] B={batch} lt={lane_tile}: "
          f"{t*1000:.3f} ms -> {ms_bit:.5f} ms/bit "
          f"(x{0.35/ms_bit:.2f} vs NTT baseline)")


def bench_parts(batch):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from nufhe_tpu.ops import transform as dt

    # parts bodies hard-code the exact engine's dual-channel shapes
    tp, re_, acc, powers, row = _setup(batch, exact=True)
    lt = min(512, batch)
    dl, l2b, off = tp.decomp_length, tp.bs_log2_base, int(tp.offset)
    c_size, q_size = row.shape[-2], row.shape[-1]

    def make(body):
        def kernel(p_ref, acc_ref, rhs_ref, out_ref):
            out_ref[:, :] = body(acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :])
        def f(a):
            return pl.pallas_call(
                kernel, grid=(batch // lt,),
                in_specs=[
                    pl.BlockSpec((1, lt), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2048, lt), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((64, c_size, q_size), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((2048, lt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((2048, batch), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024),
            )(powers, a, row)
        return jax.jit(f)

    def b_rot(a, p, r):
        return re_.rotate_acc(a, p, 2, minus_one=True)

    def b_rotdec(a, p, r):
        rot = re_.rotate_acc(a, p, 2, minus_one=True)
        d = re_.gadget_decomp(rot, 2, dl, l2b, off)
        return d[:2048] + d[2048:]

    def b_mac(a, p, r):
        d = re_.gadget_decomp(a, 2, dl, l2b, off)
        delta = re_.transformed_mac(d, r, mask1=2, g_total=2 * dl,
                                    mac_dtype=dt.mac_dtype())
        return delta

    def b_full(a, p, r):
        return re_.external_step(a, p, r, mask1=2, decomp_length=dl,
                                 log2_base=l2b, offset=off,
                                 mac_dtype=dt.mac_dtype())

    import jax.numpy as jnp
    from nufhe_tpu.ops import rows_engine as re2

    def b_fwd(a, p, r):
        d = re2.gadget_decomp(a, 2, dl, l2b, off)
        g_total = 2 * dl
        dv = d.reshape(re2.M, g_total // 2, 2, re2.R, d.shape[-1])
        packed = re2.pack_pairs(dv[:, :, 0], dv[:, :, 1]).reshape(
            re2.M * (g_total // 2) * re2.R, d.shape[-1])
        xt = re2.dif_forward_packed(packed, g_total // 2)
        return xt[:2048] + xt[2048:]

    def b_fwdmac(a, p, r):
        d = re2.gadget_decomp(a, 2, dl, l2b, off)
        g_total = 2 * dl
        dv = d.reshape(re2.M, g_total // 2, 2, re2.R, d.shape[-1])
        packed = re2.pack_pairs(dv[:, :, 0], dv[:, :, 1]).reshape(
            re2.M * (g_total // 2) * re2.R, d.shape[-1])
        xt_pk = re2.dif_forward_packed(packed, g_total // 2)
        ev, od = re2.unpack_pairs(xt_pk)
        b_ = d.shape[-1]
        stride = g_total * re2.R
        ev = ev.reshape(re2.L, g_total // 2, 1, re2.R, b_)
        od = od.reshape(re2.L, g_total // 2, 1, re2.R, b_)
        xt = jnp.concatenate([ev, od], axis=2).reshape(re2.L * stride, b_)
        a0 = ((xt + 128) & 255) - 128
        a1 = (xt - a0) >> 8
        lhs = jnp.concatenate([
            a0.reshape(re2.L, g_total, 1, re2.R, b_),
            a1.reshape(re2.L, g_total, 1, re2.R, b_)], axis=2)
        lhs = lhs.reshape(re2.L, 2 * stride, b_).astype(dt.mac_dtype())
        lo, hi = re2._mac_dot(lhs, r, 2, dt.mac_dtype())
        lo2 = lo.reshape(-1, b_)
        hi2 = hi.reshape(-1, b_)
        return (lo2[:2048] + lo2[2048:] + hi2[:2048] + hi2[2048:]
                ).astype(jnp.int32)

    def b_invonly(a, p, r):
        o_r = 2 * re2.R
        x = jnp.concatenate([a, a, a, a], axis=0)    # (8192, b) stand-in
        folded = re2.dit_inverse(x, 2 * o_r)
        v = folded.reshape(re2.M, 2, o_r, a.shape[-1])
        delta = re2.normalize_dual(v[:, 0], v[:, 1])
        return delta.reshape(2 * re2.N, a.shape[-1])

    print(f"sync overhead: {sync_overhead()*1000:.1f} ms")
    for nm, body in [("rotate", b_rot), ("rot+decomp", b_rotdec),
                     ("dec+fwd(SWAR)", b_fwd), ("dec+fwd+mac", b_fwdmac),
                     ("inverse only", b_invonly),
                     ("dec+fwd+mac+inv", b_mac), ("FULL step", b_full)]:
        f = make(body)
        t = timed_chain(f, acc)
        print(f"{nm:16s}: {t*1000:8.3f} ms")


def bench_keyswitch(batch):
    """Keyswitch share of a gate: the (base-1) x KS_LIMBS einsum fan-out
    (``ops/lwe.lwe_keyswitch``) at gate batch size, against the ~500-step
    blind rotation it follows."""
    from nufhe_tpu.params import NuFHEParameters
    from nufhe_tpu.ops import lwe as dlwe

    params = NuFHEParameters()
    inp = params.tgsw_params.tlwe_params.extracted_lweparams.size
    out = params.in_out_params.size
    dl, l2b = params.ks_decomp_length, params.ks_log2_base
    base = 2 ** l2b
    rs = np.random.RandomState(0)
    ks_a = rs.randint(-2**31, 2**31, (inp, dl, base, out)).astype(np.int32)
    ks_b = rs.randint(-2**31, 2**31, (inp, dl, base)).astype(np.int32)
    ks_cv = np.full((inp, dl, base), 1e-10, np.float64)
    arrays, meta = dlwe.prepare_keyswitch_device(ks_a, ks_b, ks_cv, l2b)
    a = jnp.asarray(rs.randint(-2**31, 2**31, (batch, inp)).astype(np.int32))
    b = jnp.asarray(rs.randint(-2**31, 2**31, (batch,)).astype(np.int32))

    @jax.jit
    def f(x):
        ra, rb, rcv = dlwe.lwe_keyswitch(arrays, meta, x, b)
        # fold the (smaller) output back into the input shape so the
        # chained-timing harness can feed the result into the next call
        return x.at[:, :ra.shape[-1]].add(ra)

    t = timed_chain(f, a)
    print(f"keyswitch B={batch}: {t*1000:.3f} ms "
          f"({t/batch*1e6:.3f} us/bit; a 0.06 ms/bit gate call at this "
          f"batch is {0.06*batch:.0f} ms)")


def bench_rotation(batch, lane_tile, n_steps=None):
    """Per-step launches vs chunked multi-step launches, full rotation.

    Env knobs (each distinct config is a fresh Mosaic compile — keep the
    list short on the tunneled rig):
      NUFHE_MB_STEPS=N        rotation length (default 100)
      NUFHE_MB_CHUNKS=a,b,c   chunk sizes to time (default 10,25,50)
      NUFHE_MB_SKIP=b         coarse skip bits: rotation amounts are
                              pre-rounded to multiples of 2^b and the
                              kernels statically skip the low b barrel
                              rounds (PerformanceParameters
                              coarse_phase_bits analogue)
      NUFHE_MB_NO_PERSTEP=1   skip the per-step variant (correctness is
                              then checked against the first chunk config)
      NUFHE_MB_SPLIT=1        channel-sequential A-then-B inverse (exact
                              engine VMEM/spill lever; bit-identical)
    """
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops.pallas import blind_rotate as pbr

    if n_steps is None:
        n_steps = int(os.environ.get("NUFHE_MB_STEPS", "100"))
    chunks = tuple(int(c) for c in
                   os.environ.get("NUFHE_MB_CHUNKS", "10,25,50").split(","))
    skip = int(os.environ.get("NUFHE_MB_SKIP", "0"))
    no_per_step = bool(os.environ.get("NUFHE_MB_NO_PERSTEP"))
    split = bool(os.environ.get("NUFHE_MB_SPLIT"))
    vmem = int(os.environ.get("NUFHE_MB_VMEM", "120"))

    tp, re_, acc, powers, row = _setup(batch)
    rs = np.random.RandomState(1)
    bk = jnp.asarray(np.broadcast_to(
        np.asarray(row)[None], (n_steps,) + row.shape).copy())
    bara_np = rs.randint(0, 2048, (n_steps, batch)).astype(np.int32)
    if skip:
        bara_np &= ~((1 << skip) - 1)   # kernel precondition for skip bits
    bara_t = jnp.asarray(bara_np)
    args = (2, tp.decomp_length, tp.bs_log2_base, int(tp.offset))

    results = {}
    print(f"engine: {'exact' if _exact() else 'rounded-key'} "
          f"steps={n_steps} skip_low_bits={skip} channel_split={split}",
          flush=True)
    oracle = None
    if not no_per_step:
        step = pbr.make_external_step_rows(
            *args, lane_tile=lane_tile, mac_dtype=dt.mac_dtype(),
            skip_low_bits=skip, channel_split=split, vmem_limit_mb=vmem)

        # bk/bara ride as ARGUMENTS (closed-over arrays would be embedded
        # as HLO constants — a 0.5 GB program body the remote compiler
        # rejects)
        @jax.jit
        def per_step(a, bk_, bara_):
            def body(i, a_):
                p = jax.lax.dynamic_index_in_dim(bara_, i, 0, keepdims=True)
                r = jax.lax.dynamic_index_in_dim(bk_, i, 0, keepdims=False)
                return step(a_, p, r)
            return jax.lax.fori_loop(0, n_steps, body, a)

        f = lambda a: per_step(a, bk, bara_t)  # noqa: E731
        oracle = np.asarray(f(acc))
        t = timed_chain(f, acc, iters=3, inner=2)
        results['per-step'] = t
        print(f"per-step   x{n_steps}: {t*1e3:9.2f} ms "
              f"({t/n_steps*1e6:7.1f} us/step)", flush=True)

    bara3 = bara_t.reshape(n_steps, 1, batch)
    for chunk in chunks:
        if n_steps % chunk:
            continue
        rot = pbr.make_blind_rotate_chunk(
            *args, chunk, lane_tile=lane_tile, mac_dtype=dt.mac_dtype(),
            skip_low_bits=skip, channel_split=split, vmem_limit_mb=vmem)

        @jax.jit
        def chunked(a, bk_, bara_, rot=rot, chunk=chunk):
            def body(i, a_):
                return rot(a_, bara_, bk_, i * chunk)
            return jax.lax.fori_loop(0, n_steps // chunk, body, a)

        fc = lambda a: chunked(a, bk, bara3)  # noqa: E731
        # correctness vs per-step (or vs the first chunk config)
        got = np.asarray(fc(acc))
        if oracle is None:
            oracle, same = got, True
        else:
            same = bool(np.array_equal(oracle, got))
        t = timed_chain(fc, acc, iters=3, inner=2)
        results[chunk] = t
        print(f"chunk={chunk:3d} x{n_steps}: {t*1e3:9.2f} ms "
              f"({t/n_steps*1e6:7.1f} us/step)  exact={same}", flush=True)
    return results


def bench_intadd(batch, width=8):
    """Ripple vs Kogge-Stone encrypted adder latency at a given integer
    batch (total encrypted bits = batch * width).

    The ripple adder issues 3*width dependent single-bit-column gate
    calls (batch lanes each); Kogge-Stone issues 2 + 2*ceil(log2 width)
    batched calls (up to batch*width lanes each).  Below chip saturation
    (~2^13 lanes, SCALING_r03.json) the parallel circuit should win on
    latency despite ~3x the bootstrapped bits.
    """
    import nufhe_tpu as nf
    from nufhe_tpu.models.integer import uint_add, bitarray_to_uintarray

    rng = nf.DeterministicRNG(5)
    print("keygen...", flush=True)
    secret, cloud = nf.make_key_pair(rng)
    rs = np.random.RandomState(0)
    # draw bits, not ints: randint's int64 bound breaks at width >= 63
    a_bits = rs.randint(0, 2, (batch, width)) != 0
    b_bits = rs.randint(0, 2, (batch, width)) != 0
    a_vals = bitarray_to_uintarray(a_bits)
    b_vals = bitarray_to_uintarray(b_bits)
    ca = nf.encrypt(rng, secret, a_bits)
    cb = nf.encrypt(rng, secret, b_bits)
    ans = nf.empty_ciphertext(cloud.params, ca.shape)
    expect = np.array(
        [(int(x) + int(y)) % (1 << width)
         for x, y in zip(a_vals, b_vals)], a_vals.dtype)

    ov = sync_overhead()
    for parallel in (False, True):
        name = "kogge-stone" if parallel else "ripple"
        uint_add(cloud, ans, ca, cb, parallel=parallel)  # compile warmup
        np.asarray(ans.b)
        ok = bool(np.array_equal(
            bitarray_to_uintarray(nf.decrypt(secret, ans)), expect))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            uint_add(cloud, ans, ca, cb, parallel=parallel)
            np.asarray(ans.b)
            best = min(best, time.time() - t0 - ov)
        print(f"{name:11s} batch={batch} width={width}: {best*1e3:9.1f} ms "
              f"({best*1e3/batch:8.3f} ms/int)  correct={ok}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    if mode == "rotation":
        lt = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
        bench_rotation(b, lt)
    elif mode == "parts":
        bench_parts(b)
    elif mode == "keyswitch":
        bench_keyswitch(b)
    elif mode == "intadd":
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        bench_intadd(b, w)
    else:
        lt = int(sys.argv[3]) if len(sys.argv) > 3 else 512
        bench_step(b, lt)
