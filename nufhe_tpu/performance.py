"""Performance configuration.

The reference's ``PerformanceParameters`` (``nufhe/performance.py``) tunes
CUDA kernel shapes (transforms per block, constant memory, PTX variants),
resolving unset knobs from device introspection
(``performance.py:137-230``).  The TPU equivalents are different knobs:
whether the fused Pallas bootstrap kernel is used instead of the
XLA-composed path, the ciphertext lane tile processed per kernel instance,
and the scoped-VMEM budget handed to the Mosaic compiler.  As in the
reference, a device-independent ``PerformanceParameters`` is specialized
with ``for_device()`` into a ``PerformanceParametersForDevice``:

- ``vmem_mb`` comes from an explicit override (``NUFHE_TPU_VMEM_MB``), a
  device-kind table, or the conservative default;
- the lane tile is then derived from the VMEM budget at call time
  (``ops/bootstrap.lane_tile_for``); v4/v5/v6-class cores (128 MB) run
  1024-lane tiles, and devices whose budget cannot fit even the 128-lane
  minimum working set fall back to the XLA-composed path;
- if the Mosaic compiler still reports an out-of-VMEM condition at
  compile time, the gate layer shrinks the tile and retries
  (``models/gates._run_with_vmem_fallback`` — the analogue of the
  reference's ``OutOfResourcesError`` loops, ``blind_rotate.py:143-187``).
"""

import os

# scoped-VMEM capacity per core by device kind (MB).  TPU v4 and later
# expose 128 MB to Mosaic; v2/v3 cores have 16 MB.
_VMEM_MB_BY_KIND = (
    ("v2", 16),
    ("v3", 16),
    ("v4", 128),
    ("v5", 128),       # v5e ("v5 lite") and v5p
    ("v6", 128),
    ("lite", 128),
)
_DEFAULT_TPU_VMEM_MB = 128
_VMEM_HEADROOM_MB = 8   # leave room for Mosaic-internal buffers


def _resolve_vmem_mb(device) -> int:
    env = os.environ.get("NUFHE_TPU_VMEM_MB")
    if env:
        return int(env)
    kind = getattr(device, "device_kind", "").lower()
    for tag, mb in _VMEM_MB_BY_KIND:
        if tag in kind:
            return mb
    return _DEFAULT_TPU_VMEM_MB


class PerformanceParameters:

    def __init__(self, nufhe_params=None,
                 single_kernel_bootstrap=None,
                 batch_tile=None,
                 vmem_mb=None,
                 chunk_steps=None,
                 coarse_phase_bits=None):
        """
        :param single_kernel_bootstrap: use the fused Pallas blind-rotate
            kernel (``None`` = auto: enabled on TPU when supported).
        :param batch_tile: ciphertext batch tile per kernel instance
            (``None`` = auto from the device's VMEM capacity).
        :param vmem_mb: scoped-VMEM capacity override in MB (``None`` =
            resolve from the device kind).
        :param chunk_steps: CMUX steps fused into one multi-step Pallas
            launch (VMEM-revisited accumulator; key rows stream under
            prefetch double-buffering).  ``None`` = resolve from the
            ``NUFHE_TPU_CHUNK_STEPS`` env var, defaulting to 50 on TPU:
            with the round-4 engine the per-step accumulator HBM
            round-trip (~0.43 ms floor at batch 2^14) is no longer fully
            hidden behind compute, so the VMEM-revisited chunked kernel
            wins where round 3 had it speed-equal (rounded engine at
            lane tile 2048: 1.195 chunk=50 vs 1.242 per-step ms/step;
            at 1024: 1.269 vs 1.300).  Set 1 to minimize cold Mosaic
            compile time.
        """
        self.nufhe_params = nufhe_params
        self.single_kernel_bootstrap = single_kernel_bootstrap
        self.batch_tile = batch_tile
        self.vmem_mb = vmem_mb
        self.chunk_steps = chunk_steps
        self.coarse_phase_bits = coarse_phase_bits

    def for_device(self, device=None):
        return PerformanceParametersForDevice(self, device)

    def __hash__(self):
        return hash((self.__class__, self.single_kernel_bootstrap,
                     self.batch_tile, self.vmem_mb, self.chunk_steps,
                     self.coarse_phase_bits))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.single_kernel_bootstrap == other.single_kernel_bootstrap
                and self.batch_tile == other.batch_tile
                and self.vmem_mb == other.vmem_mb
                and self.chunk_steps == other.chunk_steps
                and self.coarse_phase_bits == other.coarse_phase_bits)


class PerformanceParametersForDevice:

    def __init__(self, perf_params: PerformanceParameters, device=None):
        import jax
        from . import _maybe_enable_persistent_compilation_cache
        _maybe_enable_persistent_compilation_cache()
        if device is None:
            device = jax.devices()[0]
        platform = getattr(device, "platform", "cpu")
        on_tpu = platform == "tpu"

        skb = perf_params.single_kernel_bootstrap
        if skb is None:
            skb = on_tpu  # fused Pallas step kernel (rows engine)
        self.single_kernel_bootstrap = skb
        self.batch_tile = perf_params.batch_tile
        chunk = perf_params.chunk_steps
        if chunk is None:
            chunk = int(os.environ.get(
                "NUFHE_TPU_CHUNK_STEPS", "50" if on_tpu else "1"))
        self.chunk_steps = max(1, int(chunk))
        coarse = perf_params.coarse_phase_bits
        if coarse is None:
            # opt-in speed/noise trade: round rotation amounts to
            # multiples of 2^bits and skip the low barrel rounds (see
            # ops.bootstrap.round_phase_coarse); 0 keeps the reference's
            # exact modulus switch.  DELIBERATELY not a default: the
            # offset error consumes the gate's input phase margin —
            # measured/derived failure-rate cost ~10x at bits=1, ~2000x
            # at bits=2, for a 1.7-5% speedup (margin table in DESIGN.md
            # round 5); the offset statistics and the bits=2 bit-equality
            # oracle are tested in tests/test_bootstrap.py
            coarse = int(os.environ.get("NUFHE_TPU_COARSE_PHASE_BITS", "0"))
        self.coarse_phase_bits = max(0, min(4, int(coarse)))
        self.platform = platform
        self.device_kind = getattr(device, "device_kind", "")
        vmem = perf_params.vmem_mb
        if vmem is None:
            vmem = _resolve_vmem_mb(device) if on_tpu else _DEFAULT_TPU_VMEM_MB
        self.vmem_limit_mb = max(8, vmem - _VMEM_HEADROOM_MB)

    def __hash__(self):
        return hash((self.__class__, self.single_kernel_bootstrap,
                     self.batch_tile, self.platform, self.vmem_limit_mb,
                     self.chunk_steps, self.coarse_phase_bits))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.single_kernel_bootstrap == other.single_kernel_bootstrap
                and self.batch_tile == other.batch_tile
                and self.platform == other.platform
                and self.vmem_limit_mb == other.vmem_limit_mb
                and self.chunk_steps == other.chunk_steps
                and self.coarse_phase_bits == other.coarse_phase_bits)
