"""Multi-host (multi-process) distribution.

The reference's cross-process story is manual: one ``Context`` per device,
ciphertexts sliced, serialized and shipped by the caller
(``/root/reference/examples/multi_gpu.py:88-104``; ``DeviceID`` is picklable
for MPI, ``api_high_level.py:104-114``).  Here multi-host is transparent
SPMD:

- every process calls :func:`initialize` (``jax.distributed``), after which
  ``jax.devices()`` spans all hosts;
- :func:`make_global_mesh` builds a (data, model) mesh in which the 'data'
  axis crosses hosts (batch redistribution rides DCN) while the 'model'
  axis stays inside a host (per-step collectives ride ICI);
- :func:`global_batch` assembles a globally-sharded ciphertext batch from
  per-process local shards without any host-side gather;
- the sharded gate/bootstrap functions from ``parallel.mesh`` run unchanged
  on the global mesh: keys are replicated per chip and kept HBM-resident,
  so the only cross-host traffic is the batch itself.

Scaling expectation: gates are embarrassingly parallel over the batch, so
gates/sec scales with chip count as long as each chip's batch slice keeps
its pipeline full (>= ~1024 lanes per chip; see bench_scaling.py).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Start (or no-op if already started) the JAX distributed runtime.

    On TPU pods with standard env metadata every argument may be None; for
    manual bring-up (e.g. CPU multi-process tests) pass them explicitly.
    Calling again after a successful init is a no-op.
    """
    try:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def make_global_mesh(n_model: int = 1, devices=None):
    """(data, model) mesh over all hosts' devices.

    The 'model' axis (tensor-parallel external products / transform slots)
    is confined to one host's devices so its per-step psum/all_gather rides
    ICI; the 'data' axis spans hosts (DCN only redistributes the batch).
    """
    if devices is None:
        devices = jax.devices()
    n_local = max(1, len(devices) // max(1, jax.process_count()))
    if n_model > n_local:
        raise ValueError(
            "n_model=%d exceeds devices per host (%d): the model axis must "
            "stay inside a host so collectives ride ICI" % (n_model, n_local))
    if len(devices) % n_model:
        raise ValueError(
            "device count %d is not divisible by n_model=%d"
            % (len(devices), n_model))
    if n_local % n_model:
        # with per-host counts not divisible by n_model, the fill below
        # would make a model group silently span hosts (correct results,
        # but its collectives would ride DCN instead of ICI)
        raise ValueError(
            "devices per host (%d) is not divisible by n_model=%d: a model "
            "group must not span hosts" % (n_local, n_model))
    n_data = len(devices) // n_model
    arr = np.empty((n_data, n_model), dtype=object)
    # fill model-axis-fastest so each model group is host-local
    for idx, d in enumerate(devices):
        arr[idx // n_model, idx % n_model] = d
    return Mesh(arr, ('data', 'model'))


def global_batch(mesh, local_arrays):
    """Per-process local batch shards -> globally batch-sharded arrays.

    :param local_arrays: pytree of numpy arrays holding THIS process's
        slice of the batch (equal sizes across processes).
    :returns: pytree of global jax.Arrays sharded P('data', ...) over the
        mesh, with global batch = sum of local batches.
    """
    def put(x):
        x = np.asarray(x)
        spec = P('data', *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, local_arrays)


def run_multiprocess_dryrun(nprocs: int = 2, local_devices: int = 4,
                            timeout: float = 900.0):
    """Launch the multi-process CPU SPMD dryrun (``_mp_worker``): nprocs
    cooperating processes x local_devices virtual CPU devices each, one
    sharded bootstrap over the global mesh, outputs asserted bit-exact
    against the unsharded computation.  Raises on any failure."""
    import os
    import socket
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    def attempt():
        # bind/close/reuse picks a free port; another process can grab it
        # before the coordinator binds (TOCTOU), so the caller retries on
        # bind failure instead of pretending the race cannot happen
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        coord = "127.0.0.1:%d" % port

        procs = [subprocess.Popen(
            [sys.executable, "-m", "nufhe_tpu.parallel._mp_worker",
             coord, str(nprocs), str(i), str(local_devices)],
            env=env, cwd=repo_root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(nprocs)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    bind_markers = ("address already in use", "failed to bind", "bind ")
    last_error = None
    for _ in range(3):
        procs, outs = attempt()
        failed = [(i, p, out) for i, (p, out) in enumerate(zip(procs, outs))
                  if p.returncode != 0]
        if not failed:
            return [out.strip().splitlines()[-1] for out in outs]
        i, p, out = failed[0]
        last_error = RuntimeError(
            "mp_worker %d failed (rc %d):\n%s" % (i, p.returncode,
                                                  out[-2000:]))
        if not any(m in out.lower() for m in bind_markers):
            raise last_error
    raise last_error
