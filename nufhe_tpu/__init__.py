"""nufhe_tpu: a TPU-native TFHE gate-bootstrapping library.

From-scratch JAX/Pallas implementation of the capability surface of
``nucypher/nufhe``: batched homomorphic boolean gates over encrypted bits
via TFHE gate bootstrapping, with an exact Z/2^32 Nussbaumer transform
engine replacing the reference's Goldilocks NTT / complex FFT (see
DESIGN.md), sharded over TPU meshes for multi-chip scaling.

The export surface mirrors the reference's ``nufhe/__init__.py:18-59``.
"""

__version__ = "0.1.0"


_compile_cache_decided = False


def _maybe_enable_persistent_compilation_cache():
    """Point JAX's persistent compilation cache at a per-user directory —
    for accelerator backends only, decided lazily at first device use.

    The fused bootstrap program costs minutes of XLA+Mosaic compile time at
    large batch; caching it on disk makes every process after the first
    start much faster.  The cache stays OFF for the CPU backend: XLA:CPU
    executables are AOT-compiled for the exact machine features of the
    compiling host, and loading an entry produced on a different machine
    (e.g. via a remote-compile service) can crash outright — observed as a
    segfault in ``compilation_cache.get_executable_and_time``.

    Deferred (not at import) so importing nufhe_tpu never initializes a
    JAX backend — which would break ``jax.distributed.initialize`` ordering
    for multi-host users.  Opt out with NUFHE_TPU_NO_COMPILE_CACHE=1 or by
    setting jax_compilation_cache_dir yourself.  (Analogue of the
    reference's in-process computation cache,
    ``nufhe/computation_cache.py``, extended across processes.)
    """
    global _compile_cache_decided
    if _compile_cache_decided:
        return
    import os
    import tempfile

    _compile_cache_decided = True
    if os.environ.get("NUFHE_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            return
        if jax.config.jax_compilation_cache_dir:
            return
        path = os.environ.get("NUFHE_TPU_COMPILE_CACHE_DIR") or os.path.join(
            tempfile.gettempdir(), "nufhe_tpu_jaxcache_%d" % os.getuid())
        os.makedirs(path, exist_ok=True)
        _diagnose_cache_dir(path)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        if os.environ.get("NUFHE_TPU_CACHE_DEBUG"):
            # surface persistent-cache read/write activity — including
            # SILENT write failures (jax logs and swallows them) — on stderr
            jax.config.update(
                "jax_debug_log_modules", "jax._src.compilation_cache")
    except Exception:
        pass


def _diagnose_cache_dir(path):
    """Big fused-bootstrap cache entries run to hundreds of MB; a full or
    read-only cache filesystem makes JAX drop writes SILENTLY (observed on
    this rig: 'big entries occasionally fail to write').  Probe writability
    and free space up front and warn loudly instead of failing quietly."""
    import os
    import sys
    import uuid

    try:
        probe = os.path.join(path, ".probe-%s" % uuid.uuid4().hex)
        with open(probe, "wb") as f:
            f.write(b"x")
        os.unlink(probe)
    except OSError as exc:
        print("nufhe_tpu: compilation cache dir %s is not writable (%s); "
              "cold compiles will repeat every process. Set "
              "NUFHE_TPU_COMPILE_CACHE_DIR to a writable path."
              % (path, exc), file=sys.stderr)
        return
    try:
        st = os.statvfs(path)
        free_mb = st.f_bavail * st.f_frsize / 1e6
        if free_mb < 1024:
            print("nufhe_tpu: compilation cache dir %s has only %.0f MB "
                  "free; large fused-bootstrap entries (up to ~500 MB) "
                  "will silently fail to persist. Free space or set "
                  "NUFHE_TPU_COMPILE_CACHE_DIR." % (path, free_mb),
                  file=sys.stderr)
    except OSError:
        pass

from .api import (
    Context,
    VirtualMachine,
    DeviceID,
    find_devices,
    empty_ciphertext,
    encrypt,
    decrypt,
)
from .keys import (
    NuFHESecretKey,
    NuFHECloudKey,
    make_key_pair,
)
from .params import NuFHEParameters
from .ciphertext import LweSampleArray, concatenate
from .performance import PerformanceParameters
from .rng import DeterministicRNG, SecureRNG
from .models.gates import (
    gate_nand,
    gate_or,
    gate_and,
    gate_xor,
    gate_xnor,
    gate_not,
    gate_copy,
    gate_constant,
    gate_nor,
    gate_andny,
    gate_andyn,
    gate_orny,
    gate_oryn,
    gate_mux,
)
from .models.integer import (
    uint_min,
    uint_max,
    uint_add,
    uint_sub,
    uint_mul,
    uint_gt,
    uint_lt,
    uint_eq,
    uint_div,
    uint_mod,
    uint_divmod,
    int_min,
    int_max,
    int_add,
    int_sub,
    int_neg,
    int_gt,
    int_lt,
    int_eq,
    uintarray_to_bitarray,
    bitarray_to_uintarray,
    intarray_to_bitarray,
    bitarray_to_intarray,
)


def clear_computation_cache(*args, **kwds):
    """Drop cached compiled programs.

    API-parity shim for the reference's computation cache
    (``nufhe/computation_cache.py``); here compilation caching is jit's job.
    """
    import jax
    jax.clear_caches()
