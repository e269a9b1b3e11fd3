"""Device (JAX) bootstrap: modulus switch, blind rotation, extraction.

Reference: ``nufhe/bootstrap.py`` (loop path) and ``nufhe/blind_rotate.mako``
(the fused single-kernel path).  Here the n-step CMUX ladder is a
``lax.fori_loop`` whose body is: per-batch monomial rotation (gather),
gadget decomposition, exact forward transform, MXU limb MAC against the
HBM-resident transformed bootstrap key, dual-channel inverse — all of which
XLA compiles into a single program; batch is the parallel axis.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import tlwe as dtlwe
from . import tgsw as dtgsw
from . import lwe as dlwe


def t32_to_phase(phase, mspace_size: int):
    """Modulus switch to [0, mspace_size).  Reference:
    ``nufhe/numeric_functions_gpu.py:39-77``."""
    interv = np.uint32(2**32 // mspace_size)
    half = np.uint32(interv // 2)
    phase_u = jax.lax.bitcast_convert_type(phase, jnp.uint32)
    return ((phase_u + half) // interv).astype(jnp.int32)


# measured peak scoped-VMEM of the fused step kernel per batch lane
# (v5e, mask_size=1 i.e. mask1=2).  The CHUNKED kernel keeps the
# accumulator input in HBM (manual DMA into the revisited output window,
# round 5), which removed a double-buffered (2048, bt) input window; with
# that, the exact (dual-channel) engine fits lane tile 2048 in the 120 MB
# budget (measured ~109 MB incl. ~65 MB register spill slots) and runs
# 8.8% faster there (1.471 vs 1.613 ms/step chunked at batch 2^14); the
# rounded-key engine fits 2048 either way (1.195 ms/step).  The PER-STEP
# kernel still streams the accumulator through a windowed input, so its
# exact-engine working set stays ~75 KB/lane and 2048 does not fit.
# Every per-lane intermediate scales linearly with mask1, so the
# estimates are scaled for other mask sizes.
_VMEM_KB_PER_LANE_MASK1_2 = 75.0             # exact engine, per-step kernel
_VMEM_KB_PER_LANE_MASK1_2_CHUNKED = 55.0     # exact engine, chunked kernel
_VMEM_KB_PER_LANE_MASK1_2_ROUNDED = 58.0     # rounded-key ('FFT') engine


def lane_tile_for(batch: int, vmem_limit_mb: int, mask1: int = 2,
                  exact: bool = True, chunked: bool = False):
    """Largest 128-multiple lane tile whose step-kernel working set fits
    the scoped-VMEM budget (device-resolved; see performance.py), or None
    when not even the 128-lane minimum fits (the caller then falls back
    to the XLA-composed path).  The rounded-key engine (``exact=False``)
    and, since round 5, the chunked exact kernel (``chunked=True``) admit
    the faster 2048-lane tile."""
    if exact:
        per_lane = (_VMEM_KB_PER_LANE_MASK1_2_CHUNKED if chunked
                    else _VMEM_KB_PER_LANE_MASK1_2)
    else:
        per_lane = _VMEM_KB_PER_LANE_MASK1_2_ROUNDED
    kb_per_lane = per_lane * (mask1 / 2.0)
    wide = (not exact) or chunked
    tiles = (2048, 1024, 512, 256, 128) if wide else (1024, 512, 256, 128)
    for tile in tiles:
        if tile <= max(batch, 128) and \
                tile * kb_per_lane / 1024.0 <= vmem_limit_mb:
            return tile
    return None


def round_phase_coarse(bara, bits: int, n_poly: int):
    """Coarse modulus switch: round [0, 2N) rotation amounts to multiples
    of 2^bits with a ZERO-MEAN tie rule (the adjustment direction for
    exact ties comes from the next-higher phase bit, which is uniform),
    wrapping mod 2N.  Lets the barrel rotation skip its lowest ``bits``
    rounds statically (``rotate_acc(skip_low_bits=bits)``); the cost is
    extra phase noise of ~n * 2^(2*bits-2)/3 steps^2 per gate, tracked in
    ``blind_rotate_variance(coarse_phase_bits=bits)``.
    Off by default (``PerformanceParameters(coarse_phase_bits=0)``)."""
    if not bits:
        return bara
    step = 1 << bits
    half = step >> 1
    rem = bara & jnp.int32(step - 1)
    up = (rem > half) | ((rem == half) & (((bara >> bits) & 1) == 1))
    out = bara - rem + jnp.where(up, jnp.int32(step), jnp.int32(0))
    return (out & jnp.int32(2 * n_poly - 1)).astype(jnp.int32)


def blind_rotate(accum_a, bk_dev, bara, tgsw_params, axis_name=None,
                 use_pallas=None, lane_tile=None, slot_axis_name=None,
                 vmem_limit_mb=None, chunk_steps=1, coarse_phase_bits=0,
                 channel_split=None):
    """ACC <- BK_i (x) [(X^{bara_i}-1) ACC] + ACC over all n key bits.

    On TPU (and without tensor parallelism) each CMUX step runs as one
    fused Pallas kernel in the rows layout (``ops/rows_engine`` +
    ``ops/pallas/blind_rotate``): polynomial dims on rows, batch on lanes,
    everything VMEM-resident per step.  Tensor parallelism (limb- or
    slot-sharded) runs the same math in the rows layout under jit; the
    lanes layout (``ops/flat_engine``) remains the non-TPU fallback.
    Reference: the fused ``nufhe/blind_rotate.mako`` persistent kernel.

    :param accum_a: (B, mask_size+1, N) int32.
    :param bk_dev: device bootstrap key (n, L, C, Q) int8
        (C-sharded under ``axis_name``, L-sharded under ``slot_axis_name``).
    :param bara: (B, n) int32 in [0, 2N).
    """
    from . import flat_engine as fe
    from . import rows_engine as re_
    from . import transform as dt

    offset = int(tgsw_params.offset)
    decomp_length = tgsw_params.decomp_length
    log2_base = tgsw_params.bs_log2_base
    mask1 = tgsw_params.tlwe_params.mask_size + 1
    n = bara.shape[-1]
    lead = accum_a.shape[:-2]

    if use_pallas is None:
        use_pallas = (axis_name is None and slot_axis_name is None
                      and jax.default_backend() == 'tpu')

    if slot_axis_name is not None:
        # slot-sharded tensor parallelism: rows-layout XLA path
        acc = accum_a.reshape((-1, mask1, fe.N))
        bara_t = jnp.transpose(bara.reshape((-1, n)))
        acc_rows = re_.acc_rows_from_n(acc)
        try:
            # under shard_map the all_gather output is varying over the
            # slot axis; the loop carry must start with matching type
            acc_rows = jax.lax.pcast(
                acc_rows, (slot_axis_name,), to='varying')
        except (AttributeError, TypeError, ValueError):
            pass

        def body_s(i, a):
            powers = jax.lax.dynamic_index_in_dim(
                bara_t, i, axis=0, keepdims=True)
            row = jax.lax.dynamic_index_in_dim(bk_dev, i, 0, keepdims=False)
            return re_.external_step(
                a, powers, row, mask1=mask1, decomp_length=decomp_length,
                log2_base=log2_base, offset=offset,
                mac_dtype=dt.mac_dtype(), slot_axis_name=slot_axis_name)

        acc_rows = jax.lax.fori_loop(0, n, body_s, acc_rows)
        out = re_.acc_n_from_rows(acc_rows, mask1)
        return out.reshape(lead + (mask1, fe.N))

    if axis_name is not None:
        # limbs-sharded tensor parallelism: rows-layout XLA path.  Each
        # shard decomposes the full (replicated) accumulator, slices its
        # contiguous g-block C-slice of the digits, MACs it against its
        # key shard, and the channel outputs psum over the model axis
        # before the (replicated) inverse — see
        # ``rows_engine.transformed_mac``.  Routing this through the
        # lanes-layout flat engine measured 14x slower (TP_r04).
        acc = accum_a.reshape((-1, mask1, fe.N))
        bara_t = jnp.transpose(bara.reshape((-1, n)))
        acc_rows = re_.acc_rows_from_n(acc)

        def body_l(i, a):
            powers = jax.lax.dynamic_index_in_dim(
                bara_t, i, axis=0, keepdims=True)
            row = jax.lax.dynamic_index_in_dim(bk_dev, i, 0, keepdims=False)
            return re_.external_step(
                a, powers, row, mask1=mask1, decomp_length=decomp_length,
                log2_base=log2_base, offset=offset,
                mac_dtype=dt.mac_dtype(), axis_name=axis_name)

        acc_rows = jax.lax.fori_loop(0, n, body_l, acc_rows)
        out = re_.acc_n_from_rows(acc_rows, mask1)
        return out.reshape(lead + (mask1, fe.N))

    if vmem_limit_mb is None:
        vmem_limit_mb = 120
    if use_pallas and lane_tile is None:
        # engine mode read off the expanded key's Q axis (4 groups per
        # output poly = rounded-key 'FFT' mode, 5 = exact)
        exact_mode = bk_dev.shape[-1] // (mask1 * 32) != 4
        chunked_mode = int(chunk_steps or 1) > 1 and n % int(chunk_steps) == 0
        lane_tile = lane_tile_for(
            int(np.prod(lead)) if lead else accum_a.shape[0], vmem_limit_mb,
            mask1=mask1, exact=exact_mode, chunked=chunked_mode)
        if lane_tile is None:
            # not even a 128-lane tile fits this device's VMEM: run the
            # XLA-composed path instead of handing Mosaic an impossible
            # kernel
            use_pallas = False

    if use_pallas:
        from .pallas import blind_rotate as pbr

        acc = accum_a.reshape((-1, mask1, fe.N))
        bara2 = bara.reshape((-1, n))
        bsz = acc.shape[0]
        pad = (-bsz) % lane_tile
        if pad:
            acc = jnp.concatenate(
                [acc, jnp.zeros((pad, mask1, fe.N), jnp.int32)], axis=0)
            bara2 = jnp.concatenate(
                [bara2, jnp.zeros((pad, n), jnp.int32)], axis=0)
        acc_rows = re_.acc_rows_from_n(acc)
        bara_t = jnp.transpose(bara2)        # (n, B): per-step contiguous rows

        # Optional multi-step chunked launches
        # (PerformanceParameters(chunk_steps=k)): the accumulator stays in
        # VMEM for k consecutive CMUX steps (revisited output block) and is
        # written back once per chunk, with key rows / bara slices streaming
        # under automatic prefetch double-buffering.  Measured on v5e at
        # batch 16384: speed-equal to per-step launches (the per-step
        # accumulator HBM streaming, ~134 GB/s, is fully hidden behind
        # compute) at ~2x the cold Mosaic compile time — so per-step
        # remains the default.
        chunk = int(chunk_steps or 1)

        if chunk > 1 and n % chunk == 0:
            bara3 = bara_t.reshape(n, 1, bara_t.shape[-1])
            rot_chunk = pbr.make_blind_rotate_chunk(
                mask1, decomp_length, log2_base, offset, chunk,
                lane_tile=lane_tile, mac_dtype=dt.mac_dtype(),
                vmem_limit_mb=vmem_limit_mb,
                skip_low_bits=coarse_phase_bits,
                channel_split=bool(channel_split))

            def body_c(i, a):
                return rot_chunk(a, bara3, bk_dev, i * chunk)

            acc_rows = jax.lax.fori_loop(0, n // chunk, body_c, acc_rows)
        else:
            step = pbr.make_external_step_rows(
                mask1, decomp_length, log2_base, offset,
                lane_tile=lane_tile, mac_dtype=dt.mac_dtype(),
                vmem_limit_mb=vmem_limit_mb,
                skip_low_bits=coarse_phase_bits,
                channel_split=bool(channel_split))

            def body(i, a):
                powers = jax.lax.dynamic_index_in_dim(
                    bara_t, i, axis=0, keepdims=True)
                row = jax.lax.dynamic_index_in_dim(bk_dev, i, 0,
                                                   keepdims=False)
                return step(a, powers, row)

            acc_rows = jax.lax.fori_loop(0, n, body, acc_rows)
        out = re_.acc_n_from_rows(acc_rows, mask1)[:bsz]
        return out.reshape(lead + (mask1, fe.N))

    acc_q = fe.q_from_n(accum_a).reshape((-1, mask1 * fe.N))
    bara2 = bara.reshape((-1, n))

    def body(i, acc):
        powers = jax.lax.dynamic_index_in_dim(
            bara2, i, axis=-1, keepdims=True)
        row = jax.lax.dynamic_index_in_dim(bk_dev, i, 0, keepdims=False)
        return fe.external_step(
            acc, powers, row, mask1=mask1, decomp_length=decomp_length,
            log2_base=log2_base, offset=offset, mac_dtype=dt.mac_dtype(),
            axis_name=axis_name)

    acc_q = jax.lax.fori_loop(0, n, body, acc_q)
    return fe.n_from_q(acc_q.reshape(lead + (mask1, fe.N)))


def bootstrap_device(lwe_a, lwe_b, bk_dev, ks_arrays, ks_meta, mu, tgsw_params,
                     no_keyswitch=False, axis_name=None, use_pallas=None,
                     lane_tile=None, slot_axis_name=None, vmem_limit_mb=None,
                     chunk_steps=1, coarse_phase_bits=0):
    """Full gate bootstrap on device.

    result = LWE(mu) if phase > 0 else LWE(-mu); fresh noise.
    Reference: ``nufhe/bootstrap.py:154-229``.

    :param lwe_a: (B, n_in) int32; ``lwe_b``: (B,) int32.
    :returns: (a, b, cv) in the keyswitched (or extracted) LWE space.
    """
    tlwe_params = tgsw_params.tlwe_params
    n_poly = tlwe_params.polynomial_degree
    mask_size = tlwe_params.mask_size

    barb = t32_to_phase(lwe_b, 2 * n_poly)
    bara = t32_to_phase(lwe_a, 2 * n_poly)
    if coarse_phase_bits:
        bara = round_phase_coarse(bara, coarse_phase_bits, n_poly)

    # testvector = X^{2N - barb} * (mu, ..., mu).  For a CONSTANT test
    # vector the monomial shift is a pure sign pattern — coefficient k
    # is +mu iff (k + barb) mod 2N < N — so it is computed directly
    # (4 elementwise ops) instead of running the 11-round barrel shifter
    # (bit-equal to dtlwe.monomial_shift(testvect, barb,
    # invert_powers=True) on a constant vector; asserted in
    # tests/test_bootstrap.py against the oracle end-to-end)
    k_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * len(lwe_b.shape) + (n_poly,), len(lwe_b.shape))
    pos = (k_iota + barb[..., None]) & jnp.int32(2 * n_poly - 1)
    testvectbis = jnp.where(pos < n_poly, jnp.int32(mu), jnp.int32(-mu))

    accum, _ = dtlwe.tlwe_noiseless_trivial(testvectbis, mask_size)
    accum = blind_rotate(accum, bk_dev, bara, tgsw_params,
                         axis_name=axis_name, use_pallas=use_pallas,
                         lane_tile=lane_tile, slot_axis_name=slot_axis_name,
                         vmem_limit_mb=vmem_limit_mb, chunk_steps=chunk_steps,
                         coarse_phase_bits=coarse_phase_bits)

    ex_a, ex_b = dtlwe.tlwe_extract_lwe_samples(accum)

    # Fresh-noise estimate through the blind rotation (CGGI16 bound;
    # extraction is variance-preserving).  The reference leaves this
    # unfilled (TODO at nufhe/blind_rotate.py:254).  The rounded-key
    # ('FFT') mode adds its key-quantization variance term; the mode is
    # read off the expanded key's Q axis (4 groups = rounded).
    from ..ref.bootstrap_ref import blind_rotate_variance
    o_r = (mask_size + 1) * 32
    exact = bk_dev.shape[-1] // o_r != 4
    var_br = blind_rotate_variance(tgsw_params, lwe_a.shape[-1], exact=exact,
                                   coarse_phase_bits=coarse_phase_bits)
    ex_cv = jnp.full(ex_b.shape, jnp.float32(var_br))

    if no_keyswitch:
        return ex_a, ex_b.astype(jnp.int32), ex_cv

    return dlwe.lwe_keyswitch(ks_arrays, ks_meta, ex_a, ex_b,
                              source_cv=ex_cv)
