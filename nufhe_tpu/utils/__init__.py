"""Small shared utilities."""

import numpy as np


def arrays_equal(a, b):
    """Exact equality of two (host or device) arrays."""
    a = np.asarray(a)
    b = np.asarray(b)
    return a.shape == b.shape and bool((a == b).all())


def errors_allclose(a, b, rtol=1e-3, atol=1e-8):
    """Comparison for accumulated float32 noise variances
    (mirrors the tolerance used by the reference tests, test/utils.py:60-64)."""
    return np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


from .profiling import profile_trace, annotate  # noqa: E402,F401
