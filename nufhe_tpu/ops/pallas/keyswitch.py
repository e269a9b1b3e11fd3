"""Pallas TPU kernel: the LWE keyswitch one-hot MAC.

The XLA einsum formulation of the keyswitch (``ops/lwe.lwe_keyswitch``)
runs its int8 one-hot x int8 limb contractions at the bf16 MXU rate
(~0.75 ms per (2^14, 8192) x (8192, 512) einsum — measured via a device
trace, 12 einsums = 9.0 of the op's 10.4 ms): XLA:TPU lowers int8 dots
through the bf16 path.  Inside a Pallas kernel the same
``jax.lax.dot_general`` gets the NATIVE int8 MXU path (2x peak), and the
digit/one-hot construction stays in VMEM instead of round-tripping
(batch, 8192) masks through HBM.

Grid: (batch tiles, nonzero digit values).  Per cell: build the l-major
digit array once per tile (VMEM scratch, persists across the v cells),
one-hot it against value v+1, and accumulate all limb dots into the
revisited output block with their radix-2^8 shifts.  The key rides as a
(1, limbs, rows, n_pad) block streamed per v.

Reference: ``nufhe/lwe_gpu.mako:66-93`` (keyswitch digits semantics).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def keyswitch_mac(a2, ab_limbs, meta, lane_tile=1024, interpret=False,
                  vmem_limit_mb=120):
    """sum over nonzero digit values and limbs of
    ``onehot(digits, v) @ ab_limbs[v-1, limb] << 8*limb``.

    :param a2: (B, input_size) int32 source 'a' (B a multiple of
        ``lane_tile``).
    :param ab_limbs: (base-1, limbs, rows, n_pad) int8 packed key
        (l-major rows; see ``ops.lwe._ks_pack_device``).
    :returns: (B, n_pad) int32 totals ([a | b | nonzero-digit count]).
    """
    from ..lwe import KS_LIMB_BITS

    nv, n_limbs, rows, n_pad = ab_limbs.shape
    in_size = a2.shape[-1]
    log2b = meta.log2_base
    l = meta.decomp_length
    assert rows == in_size * l, (rows, in_size, l)
    prec = 2 ** (32 - (1 + log2b * l))
    dmask = 2 ** log2b - 1
    bsz = a2.shape[0]
    bt = min(lane_tile, bsz)
    assert bsz % bt == 0, (bsz, bt)

    def kernel(src_ref, rhs_ref, out_ref, digits_ref):
        v = pl.program_id(1)

        @pl.when(v == 0)
        def _():
            shifted = src_ref[...] + jnp.int32(prec)
            digits_ref[...] = jnp.concatenate(
                [(shifted >> (32 - (j + 1) * log2b)) & jnp.int32(dmask)
                 for j in range(l)], axis=-1)

        # the digits scratch stays i32: int8 equality is unsupported on
        # the VPU ("Target does not support this comparison", measured),
        # and widening an int8 scratch at compare time spilled 91 MB of
        # registers at lane tile 2048 — the i32 scratch at tile 512 is
        # 16 MB and compares natively
        mask = (digits_ref[...] == v + 1).astype(jnp.int8)
        acc = None
        for limb in range(n_limbs):
            p = jax.lax.dot_general(
                mask, rhs_ref[0, limb],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            if limb:
                p = p << (KS_LIMB_BITS * limb)
            acc = p if acc is None else acc + p

        @pl.when(v == 0)
        def _():
            out_ref[...] = acc

        @pl.when(v != 0)
        def _():
            out_ref[...] = out_ref[...] + acc

    # under shard_map with the varying-axes checker on, the output's vma
    # must be stated explicitly: the totals vary exactly as the source
    # 'a' does (the key operand is replicated)
    try:
        out_shape = jax.ShapeDtypeStruct(
            (bsz, n_pad), jnp.int32, vma=jax.typeof(a2).vma)
    except (AttributeError, TypeError):
        out_shape = jax.ShapeDtypeStruct((bsz, n_pad), jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(bsz // bt, nv),
        in_specs=[
            pl.BlockSpec((bt, in_size), lambda i, v: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_limbs, rows, n_pad), lambda i, v: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n_pad), lambda i, v: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, rows), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(a2, ab_limbs)
