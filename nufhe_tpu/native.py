"""Native (C++) host numerics: build-on-first-use + ctypes bindings.

The hot host-side path of key generation — the exact Nussbaumer forward
transform over Z/2^64 and the mod-2^38 limb split (``csrc/``) — runs as
native code compiled once with the system toolchain (OpenMP across
polynomials).  Numpy (``ref/transform_ref.py``) remains the fallback when
no compiler is available; results are bit-identical.

Reference analogue: nufhe's device-side keygen kernels
(``nufhe/tlwe_gpu.py:111-196``); here keygen stays on host (as the
reference's RNG does, ``nufhe/random_numbers.py:18-27``) but native.
"""

import ctypes
import os
import subprocess
import sysconfig
import tempfile
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "csrc", "nussbaumer_host.cc")


def _build_dir():
    d = os.environ.get("NUFHE_TPU_BUILD_DIR")
    if not d:
        d = os.path.join(tempfile.gettempdir(),
                         "nufhe_tpu_native_%d" % os.getuid())
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("NUFHE_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(_build_dir(), "nussbaumer_host.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                cxx = os.environ.get("CXX", "g++")
                # per-process temp name: concurrent first-use builds must
                # not interleave writes to a shared path (the os.replace
                # below is atomic, the compile is not)
                tmp = "%s.%d.tmp" % (so, os.getpid())
                cmd = [cxx, "-O3", "-march=native", "-fPIC", "-shared",
                       "-fopenmp", _SRC, "-o", tmp]
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, so)
            lib = ctypes.CDLL(so)
            lib.nussbaumer_forward_u64.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
            lib.limb_split_38.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
            lib.bootstrap_key_limbs.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_int]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available():
    return _load() is not None


def forward_u64(a):
    """Exact forward Nussbaumer transform, (..., 1024) int -> (..., 64, 32)
    uint64 mod 2^64.  Native when possible, else the numpy oracle."""
    from .ref import transform_ref as tr

    lib = _load()
    a = np.ascontiguousarray(np.asarray(a), dtype=np.int32)
    if lib is None:
        return tr.forward(a)
    lead = a.shape[:-1]
    flat = a.reshape(-1, tr.N)
    out = np.empty((flat.shape[0], tr.L, tr.R), np.uint64)
    lib.nussbaumer_forward_u64(
        flat.ctypes.data, out.ctypes.data, flat.shape[0])
    return out.reshape(lead + (tr.L, tr.R))


def bootstrap_key_limbs(bk_coeff_flat, exact=True):
    """(n_polys, 1024) int32 -> (n_polys, 64, 32, KL, 2) int8 two-sided
    transformed-key limbs (forward transform + mod-2^38 A/B splits of +v
    and -v; see ``ops.transform.key_limbs_host``).  KL = 5 exact, 4 in
    the rounded-key ('FFT') mode."""
    from .ref import transform_ref as tr
    from .ops import transform as dt

    lib = _load()
    flat = np.ascontiguousarray(bk_coeff_flat, dtype=np.int32)
    if lib is None:
        return dt.key_limbs_host(tr.forward(flat), exact=exact)
    kl = dt.KEY_LIMBS if exact else dt.KEY_LIMBS_APPROX
    out = np.empty((flat.shape[0], tr.L, tr.R, kl, 2), np.int8)
    lib.bootstrap_key_limbs(flat.ctypes.data, out.ctypes.data, flat.shape[0],
                            1 if exact else 0)
    return out
