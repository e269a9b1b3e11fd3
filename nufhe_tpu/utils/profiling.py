"""Profiler integration.

The reference has no built-in tracing (SURVEY §5.1: manual wall-clock in
tests); here the JAX/XLA profiler is first-class: any benchmark or user
region can be captured to a TensorBoard-readable trace (HLO timelines,
Mosaic kernel occupancy, DMA overlap) with one context manager or by
setting ``NUFHE_PROFILE_DIR`` for the bundled CLIs (``bench.py``,
``tools/microbench.py``).
"""

import contextlib
import os


@contextlib.contextmanager
def profile_trace(logdir=None, create_perfetto_link=False):
    """Capture a device trace for the enclosed region.

    >>> with profile_trace("/tmp/nufhe_trace"):
    ...     vm.gate_nand(a, b)

    View with TensorBoard (``tensorboard --logdir /tmp/nufhe_trace``) or
    the generated Perfetto link.  No-op when ``logdir`` is None and
    ``NUFHE_PROFILE_DIR`` is unset, so call sites can wrap their hot
    region unconditionally.
    """
    logdir = logdir or os.environ.get("NUFHE_PROFILE_DIR")
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir,
                            create_perfetto_link=create_perfetto_link):
        yield


def annotate(name):
    """Named sub-region inside a profiled trace (shows as a span).

    >>> with annotate("blind_rotate"):
    ...     ...
    """
    import jax
    return jax.profiler.TraceAnnotation(name)
