"""Pallas TPU kernel: the fused CMUX step of the blind rotation.

One ``pallas_call`` executes a full external-product step — barrel monomial
rotation, gadget decomposition, DIF forward transform, per-slot MXU MACs
against the bootstrap-key row, dual-channel DIT inverse, accumulation —
entirely in VMEM per batch tile.  Under XLA the same math
(``ops/flat_engine.external_step``) materializes every roll/select pass
through HBM (~50 passes x batch x 8 KB per step); here only the
accumulator tile, the bara slice, and the compact int8 key row touch HBM.

This is the TPU analogue of the reference's persistent fused kernel
``nufhe/blind_rotate.mako:18-226`` (shared-memory NTT + MAC + accumulate),
with the 500-step loop kept in XLA (``lax.fori_loop``) and batch as the
grid axis.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import flat_engine as fe
from .. import rows_engine as re_


def _out_sds(shape, like):
    """int32 ShapeDtypeStruct carrying ``like``'s varying-axes spec —
    required under shard_map's vma checker (the accumulator's sharding is
    the output's: key operands are replicated)."""
    try:
        return jax.ShapeDtypeStruct(shape, jnp.int32,
                                    vma=jax.typeof(like).vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, jnp.int32)


def make_external_step_rows(mask1: int, decomp_length: int, log2_base: int,
                            offset: int, lane_tile: int = 128,
                            mac_dtype=jnp.int8, interpret: bool = False,
                            vmem_limit_mb: int = 120, skip_low_bits: int = 0,
                            channel_split: bool = False):
    """Rows-layout fused step kernel: polynomial dims on rows (cheap
    vreg-reindex rolls), batch on lanes (one lane tile per grid cell)."""
    n_rows = mask1 * re_.N

    def kernel(p_ref, acc_ref, rhs_ref, out_ref):
        out_ref[:, :] = re_.external_step(
            acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :],
            mask1=mask1, decomp_length=decomp_length,
            log2_base=log2_base, offset=offset, mac_dtype=mac_dtype,
            skip_low_bits=skip_low_bits, channel_split=channel_split)

    def step(acc_rows, p, rhs_row):
        b = acc_rows.shape[-1]
        bt = min(lane_tile, b)
        assert b % bt == 0, (b, bt)
        c_size, q_size = rhs_row.shape[-2], rhs_row.shape[-1]
        return pl.pallas_call(
            kernel,
            grid=(b // bt,),
            out_shape=_out_sds((n_rows, b), acc_rows),
            in_specs=[
                pl.BlockSpec((1, bt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rows, bt), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((re_.L, c_size, q_size), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, bt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
            interpret=interpret,
        )(p, acc_rows, rhs_row)

    return step


def make_blind_rotate_chunk(mask1: int, decomp_length: int, log2_base: int,
                            offset: int, chunk: int, lane_tile: int = 512,
                            mac_dtype=jnp.int8, interpret: bool = False,
                            vmem_limit_mb: int = 120, skip_low_bits: int = 0,
                            channel_split: bool = False):
    """``chunk`` consecutive CMUX steps as ONE pallas_call.

    Grid = (batch cells, steps-in-chunk); the accumulator is the revisited
    output block — it stays in VMEM across all steps of a cell and is
    written back once per chunk, eliminating the per-step accumulator HBM
    round-trip of the single-step launch (~16 KB/lane/step).  Bootstrap-key
    rows and bara slices stream through the Pallas pipeline with automatic
    prefetch double-buffering; the chunk's starting step arrives as a
    scalar-prefetch argument, so every chunk reuses the SAME compiled
    kernel (no per-chunk key slicing or recompilation).  This is the
    chunked analogue of the reference's persistent fused kernel
    (``nufhe/blind_rotate.mako``), sized so one launch stays well under
    the TPU runtime watchdog.
    """
    n_rows = mask1 * re_.N

    def kernel(start_ref, bara_ref, acc_hbm_ref, rhs_ref, out_ref, sem):
        del start_ref  # consumed by the index maps
        step = pl.program_id(1)
        cell = pl.program_id(0)
        bt = out_ref.shape[-1]

        @pl.when(step == 0)
        def _():
            # the accumulator input stays in HBM (memory_space=ANY) and is
            # DMA-ed straight into the revisited output window once per
            # cell — a windowed VMEM input would cost a double-buffered
            # (n_rows, bt) allocation (32 MB at bt=2048) that the fused
            # exact kernel cannot afford; the buffer itself is aliased to
            # the output, so the copy reads the cell's own (not yet
            # rewritten) region
            cp = pltpu.make_async_copy(
                acc_hbm_ref.at[:, pl.ds(cell * bt, bt)], out_ref, sem)
            cp.start()
            cp.wait()

        out_ref[:, :] = re_.external_step(
            out_ref[:, :], bara_ref[0], rhs_ref[0],
            mask1=mask1, decomp_length=decomp_length,
            log2_base=log2_base, offset=offset, mac_dtype=mac_dtype,
            skip_low_bits=skip_low_bits, channel_split=channel_split)

    def rotate(acc_rows, bara3, bk_dev, start):
        """One chunk: steps [start, start+chunk) of the rotation.

        :param acc_rows: (mask1*N, B) int32.
        :param bara3: (n, 1, B) int32 (full rotation's powers).
        :param bk_dev: (n, L, C, Q) int8 (full key).
        :param start: int32 scalar (traced ok), chunk base step.
        """
        b = acc_rows.shape[-1]
        bt = min(lane_tile, b)
        assert b % bt == 0, (b, bt)
        c_size, q_size = bk_dev.shape[-2], bk_dev.shape[-1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // bt, chunk),
            in_specs=[
                pl.BlockSpec((1, 1, bt),
                             lambda i, s, start_ref: (start_ref[0] + s, 0, i)),
                pl.BlockSpec(memory_space=pltpu.ANY),   # acc: HBM, manual DMA
                pl.BlockSpec((1, re_.L, c_size, q_size),
                             lambda i, s, start_ref:
                             (start_ref[0] + s, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((n_rows, bt),
                                   lambda i, s, start_ref: (0, i)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=_out_sds((n_rows, b), acc_rows),
            # the acc HBM buffer doubles as the output buffer (operand
            # index 2 counts the scalar-prefetch arg); each cell's region
            # is only rewritten at its own last-step writeback, after its
            # step-0 copy has consumed it
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(jnp.asarray(start, jnp.int32).reshape(1), bara3, acc_rows, bk_dev)

    return rotate


def make_external_step(mask1: int, decomp_length: int, log2_base: int,
                       offset: int, batch_tile: int = 128,
                       mac_dtype=jnp.int8, interpret: bool = False,
                       vmem_limit_mb: int = 120):
    """Build ``step(acc_q, p, rhs_row) -> acc_q`` running as a Pallas kernel.

    :param batch_tile: rows per grid cell; the caller pads the batch to a
        multiple of this.
    :param vmem_limit_mb: scoped-VMEM budget for the Mosaic compiler (the
        16 MB default is far below the physical VMEM).
    """
    lanes = mask1 * fe.N

    def kernel(p_ref, acc_ref, rhs_ref, out_ref):
        out_ref[:, :] = fe.external_step(
            acc_ref[:, :], p_ref[:, :], rhs_ref[:, :, :],
            mask1=mask1, decomp_length=decomp_length,
            log2_base=log2_base, offset=offset, mac_dtype=mac_dtype)

    def step(acc_q, p, rhs_row):
        b = acc_q.shape[0]
        bt = min(batch_tile, b)
        assert b % bt == 0, (b, bt)
        c_size, q_size = rhs_row.shape[-2], rhs_row.shape[-1]
        return pl.pallas_call(
            kernel,
            grid=(b // bt,),
            in_specs=[
                pl.BlockSpec((bt, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, lanes), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((fe.L, c_size, q_size), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, lanes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lanes), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
            interpret=interpret,
        )(p, acc_q, rhs_row)

    return step


def blind_rotate_pallas(acc_q, bk_dev, bara, *, mask1, decomp_length,
                        log2_base, offset, batch_tile=128,
                        mac_dtype=jnp.int8, interpret=False):
    """Full n-step blind rotation over the Pallas step kernel.

    :param acc_q: (B, mask1*N) int32 q-layout accumulator (B padded to a
        multiple of ``batch_tile`` by the caller).
    :param bk_dev: (n, L, C, Q) int8 MAC rhs rows.
    :param bara: (B, n) int32 in [0, 2N).
    """
    n = bara.shape[-1]
    step = make_external_step(
        mask1, decomp_length, log2_base, offset,
        batch_tile=batch_tile, mac_dtype=mac_dtype, interpret=interpret)

    def body(i, acc):
        powers = jax.lax.dynamic_index_in_dim(bara, i, axis=-1, keepdims=True)
        row = jax.lax.dynamic_index_in_dim(bk_dev, i, 0, keepdims=False)
        return step(acc, powers, row)

    return jax.lax.fori_loop(0, n, body, acc_q)
