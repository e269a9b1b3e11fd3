"""The MXU-ized inverse: the real arithmetic, plus an on-chip measurement.

Round-4's closeout dismissed "MXU-ize the inverse transform" with an
unsubstantiated "8000x" figure; the round-4 verdict (What's weak #1) asked
for the actual computation — and, if it lands within ~3x of the MAC dot,
for the experiment.  This script IS that computation, and ``measure``
runs the decisive shape on the chip.

Summary of the arithmetic (printed by ``counts``):

The inverse+fold is, per lane and output polynomial, a linear map
(N = 1024 outputs) <- (L*R = 2048 transform-domain inputs) whose matrix
entries are {0, +1, -1}: the inverse-DFT weight omega^{-tj} = Y^{-tj} is a
signed monomial, so each (slot t, output row j) block is a signed
permutation of the R coefficients — each output row has exactly L = 64
nonzeros out of 2048.  Densifying it for the MXU therefore wastes a factor
2048/64 = 32 in FLOPs, and the i32 inputs (values mod 2^32) must be split
into 4 int8 limbs for the int8 MXU path, recombined with shifts afterwards
(the {0,+-1} matrix is exact in int8; 2048-term limb sums <= 2^18 fit i32).

At the default parameters (rounded-key mode, batch 2^14):

  current MAC dot        6.9e10 MACs/step  (measured ~0.35 ms standalone)
  dense MXU inverse      2.7e11 MACs/step  = 4.0x the dot  (exact: 5.7x)
  radix-8-blocked MXU    1.4e11 MACs/step  = 2.0x the dot, plus an extra
                         VPU re-limb pass between the two MXU passes
  inverse folded into    2.2e12 MACs/step  = 32x the dot (the composite
  the MAC rhs            rhs has int32 entries -> 4 limb planes; the
                         32x is the same densification factor)

Even granting the co-issue the toolchain refuses (DESIGN.md round-4
roofline), the cheapest variant puts 0.35 + 0.70 = 1.05 ms of MXU work in
a 1.147 ms (10x) step budget while the VPU still owes ~0.82 ms of
rotation+forward — and without co-issue every MXU millisecond is serial
with the VPU, so replacing the 0.25 ms VPU inverse with >= 0.70 ms of MXU
time is a guaranteed loss.  ``measure`` confirms the dense variant's MXU
time on hardware.

Usage:
  python tools/mxu_inverse_analysis.py counts [--exact]
  python tools/mxu_inverse_analysis.py measure [batch]   # on the chip
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, M, R, L = 1024, 32, 32, 64
MASK1 = 2          # mask_size + 1
G = 4              # decomposition rows: mask1 * decomp_length
ACC_LIMBS = 2      # int8 limbs of the forward-transformed digits
V5E_INT8_TOPS = 394e12   # peak int8 ops/s (2 ops per MAC), one v5e core


def counts(exact=False, batch=16384):
    groups = 5 if exact else 4               # key shift groups on Q
    o_r = MASK1 * R
    c = G * ACC_LIMBS * R
    q = groups * o_r
    dot = L * c * q * batch                  # current MAC dot MACs/step

    # dense inverse: per output poly, (N out) x (L*R in); input limbs:
    # A channel mod 2^32 -> 4 int8 limbs; exact mode adds the B channel
    # (|B| <= 2^24 -> 3 limbs)
    inv_limbs = 4 + (3 if exact else 0)
    dense_inv = MASK1 * inv_limbs * N * (L * R) * batch

    # radix-8 blocked: 2 passes, each dense within 8-slot groups
    # (256x256 blocks, 8 nonzeros per row -> 32x densification per pass,
    # but each pass touches the array once: L/8 groups of (8R)^2)
    blocked = MASK1 * inv_limbs * 2 * (L // 8) * (8 * R) ** 2 * batch

    # inverse absorbed into the MAC rhs: out (mask1*N) <- in (L*c), with
    # the composite rhs int32 -> 4 limb planes (key-limb groups already
    # counted inside c's structure collapses; see DESIGN.md round 5)
    absorbed = MASK1 * N * (L * c) * 4 * batch

    ms = lambda macs: 2.0 * macs / V5E_INT8_TOPS * 1e3
    print(f"mode={'exact' if exact else 'rounded'} batch={batch}")
    for name, macs in (("current MAC dot", dot),
                       ("dense MXU inverse", dense_inv),
                       ("radix-8-blocked MXU inverse", blocked),
                       ("inverse absorbed into rhs", absorbed)):
        print(f"  {name:30s}: {macs:.3e} MACs/step  = {macs/dot:5.2f}x dot"
              f"  (>= {ms(macs):6.3f} ms at peak int8)")


def measure(batch=16384):
    """Time the dense-inverse-shaped int8 matmul on the device: per output
    polynomial one (N, inv_limbs*L*R) x (inv_limbs*L*R, batch) int8 dot
    with i32 accumulation — exactly the MXU work the dense variant would
    add per step (the limb split/recombine VPU passes are NOT included,
    so this is a LOWER bound on its cost)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from microbench import sync_overhead

    rs = np.random.RandomState(0)
    k = 4 * L * R                                    # rounded: 4 limbs
    w = [jnp.asarray(rs.randint(-1, 2, (N, k)).astype(np.int8))
         for _ in range(MASK1)]

    # chained via a scalar dependency so the loop serializes on device
    @jax.jit
    def step(x, seed):
        outs = [jax.lax.dot_general(
            wi, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) for wi in w]
        dep = (outs[0].sum() + outs[1].sum()) & 1
        return (x ^ dep.astype(jnp.int8)), seed

    x = jnp.asarray(rs.randint(-128, 128, (k, batch)).astype(np.int8))
    ov = sync_overhead()
    y, _ = step(x, 0)
    np.asarray(y.ravel()[0])
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        z = x
        for i in range(24):
            z, _ = step(z, i)
        np.asarray(z.ravel()[0])
        best = min(best, (time.time() - t0 - ov) / 24)
    macs = MASK1 * N * k * batch
    print(f"dense-inverse dot (rounded shapes, batch {batch}): "
          f"{best*1e3:.3f} ms/step  ({2*macs/best/1e12:.1f} Tops/s; "
          f"peak-rate floor {2*macs/V5E_INT8_TOPS*1e3:.3f} ms)")

    # radix-8-blocked variant: both passes as batched 256x256 int8 dots
    # (8 slot-groups batched; limbs x mask1 fold into the lane axis).
    # The mid-pass i32 -> int8 re-limb VPU pass is NOT included.
    lanes = 4 * MASK1 * batch
    wb = jnp.asarray(rs.randint(-1, 2, (8, 8 * R, 8 * R)).astype(np.int8))

    @jax.jit
    def step_b(x, seed):
        mid = jax.lax.dot_general(
            wb, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        out = jax.lax.dot_general(
            wb, (mid & 127).astype(jnp.int8),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        dep = (out.sum() & 1).astype(jnp.int8)
        return x ^ dep, seed

    xb = jnp.asarray(rs.randint(-128, 128, (8, 8 * R, lanes)).astype(np.int8))
    yb, _ = step_b(xb, 0)
    np.asarray(yb.ravel()[0])
    best_b = float("inf")
    for _ in range(4):
        t0 = time.time()
        z = xb
        for i in range(24):
            z, _ = step_b(z, i)
        np.asarray(z.ravel()[0])
        best_b = min(best_b, (time.time() - t0 - ov) / 24)
    macs_b = 2 * 8 * (8 * R) ** 2 * lanes
    print(f"radix-8-blocked dots (2 passes, batch {batch}): "
          f"{best_b*1e3:.3f} ms/step  ({2*macs_b/best_b/1e12:.1f} Tops/s; "
          f"peak-rate floor {2*macs_b/V5E_INT8_TOPS*1e3:.3f} ms)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "counts"
    if cmd == "counts":
        counts(exact="--exact" in sys.argv)
        counts(exact=True)
    elif cmd == "measure":
        measure(int(sys.argv[2]) if len(sys.argv) > 2 else 16384)
    else:
        raise SystemExit(f"unknown command {cmd}")
