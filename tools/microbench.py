"""Microbenchmark harness with honest device synchronization.

On the tunneled TPU platform ``jax.block_until_ready`` can return before
execution finishes; the only reliable fence is a D2H transfer.  Every timing
here therefore chains K dependent iterations and ends with a scalar D2H,
amortizing the tunnel round-trip (~30 ms).

Usage: python tools/microbench.py [gate|parts] [batch ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=4, inner=1):
    """fn(*args) -> pytree; returns best seconds per call (sync-corrected)."""
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.tree.leaves(fn(*args))[0].ravel()[0])  # compile+flush
    best = float('inf')
    for _ in range(iters):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / inner)
    return best


def sync_overhead():
    x = jnp.zeros((1,), jnp.int32)
    f = jax.jit(lambda v: v + 1)
    return timed(f, x, iters=6)


def bench_gate(batch):
    import nufhe_tpu as nf
    rng = nf.DeterministicRNG(42)
    secret, cloud = nf.make_key_pair(rng)
    t0 = time.time()
    cloud.bootstrap_key.device()
    cloud.keyswitch_key.device()
    print(f"key prep: {time.time()-t0:.1f}s")

    bits = np.random.RandomState(0).randint(0, 2, batch).astype(bool)
    ca = nf.encrypt(rng, secret, bits)
    cb = nf.encrypt(rng, secret, bits)
    vm = nf.VirtualMachine(cloud)

    res = vm.gate_nand(ca, cb)
    np.asarray(res.b.ravel()[0])

    def chained():
        r = res
        r = vm.gate_nand(ca, r, dest=r)
        return r.b

    ov = sync_overhead()
    t = timed(chained, iters=3) - ov
    print(f"batch {batch}: {t*1000:.1f} ms/gatecall = "
          f"{t/batch*1000:.5f} ms/bit  (sync overhead {ov*1000:.1f} ms)  "
          f"vs_baseline x{0.35/(t/batch*1000):.1f}")


def bench_parts(batch):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops import tgsw as dtgsw
    from nufhe_tpu.ops import tlwe as dtlwe
    from nufhe_tpu.params import NuFHEParameters

    params = NuFHEParameters()
    tp = params.tgsw_params
    rs = np.random.RandomState(0)
    ov = sync_overhead()
    print(f"sync overhead: {ov*1000:.1f} ms")

    acc = jnp.asarray(rs.randint(-2**31, 2**31, (batch, 2, 1024)).astype(np.int32))
    powers = jnp.asarray(rs.randint(0, 2048, (batch,)).astype(np.int32))
    limbs = rs.randint(-128, 128, (4, 2, 64, 32, 5)).astype(np.int8)
    row = dtgsw.expand_key_limbs_device(jnp.asarray(limbs))
    jax.block_until_ready(row)

    # individual stages (jitted separately)
    shift = jax.jit(lambda a, p: dtlwe.monomial_shift(a, p, minus_one=True))
    t = timed(shift, acc, powers, inner=8) - ov
    print(f"monomial_shift:      {t*1000:8.2f} ms")

    decomp = jax.jit(lambda a: dtgsw.tgsw_polynomial_decomp(
        a, int(tp.offset), tp.decomp_length, tp.bs_log2_base
    ).reshape(batch, 4, 1024))
    digits = decomp(acc)
    t = timed(decomp, acc, inner=8) - ov
    print(f"decomp:              {t*1000:8.2f} ms")

    fwd = jax.jit(lambda d: dt.forward_i32(d))
    ahat = fwd(digits)
    t = timed(fwd, digits, inner=8) - ov
    print(f"forward_i32:         {t*1000:8.2f} ms")

    lim = jax.jit(dt.acc_limbs)
    al = lim(ahat)
    t = timed(lim, ahat, inner=8) - ov
    print(f"acc_limbs:           {t*1000:8.2f} ms")

    mac = jax.jit(lambda a, k: dt.external_mac(a, k))
    lo, hi = mac(al, row)
    t = timed(mac, al, row, inner=8) - ov
    print(f"external_mac:        {t*1000:8.2f} ms")

    inv = jax.jit(dt.inverse_dual)
    t = timed(inv, lo, hi, inner=8) - ov
    print(f"inverse_dual:        {t*1000:8.2f} ms")

    # one fused external-product step (shift+decomp+fwd+mac+inv+add)
    @jax.jit
    def step(a, p, k):
        sh = dtlwe.monomial_shift(a, p, minus_one=True)
        d = dtgsw.tgsw_transformed_external_mul(
            sh, k[None], 0, int(tp.offset), tp.decomp_length, tp.bs_log2_base)
        return (a + d).astype(jnp.int32)

    t = timed(step, acc, powers, row, inner=8) - ov
    print(f"fused step (x500 -> {t*500*1000:.0f} ms): {t*1000:8.2f} ms")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parts"
    batches = [int(b) for b in sys.argv[2:]] or [4096]
    for b in batches:
        if mode == "gate":
            bench_gate(b)
        else:
            bench_parts(b)
