"""Scaling benchmark: bootstrapped-NAND gates/sec vs chip count.

Data-parallel SPMD over a (data,) mesh: the ciphertext batch is sharded
over chips (fixed PER-CHIP batch, so perfect scaling = linear gates/sec),
keys replicated and HBM-resident.  Prints one JSON line per chip count
plus a summary with scaling efficiency vs one chip.

Usage:
    python bench_scaling.py                  # all available devices
    NUFHE_SCALE_BATCH=4096 python bench_scaling.py
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py              # virtual 8-device CPU mesh

On multi-host slices, run one process per host with
``nufhe_tpu.parallel.distributed.initialize()`` (see that module); the
same mesh/sharding code paths are exercised by the driver's multi-process
CPU dryrun.  Reference analogue being replaced: manual per-GPU slicing in
``/root/reference/examples/multi_gpu.py:88-104``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    # the TPU-tunnel sitecustomize forces its platform over the env var;
    # jax.config wins over both, so re-assert the env choice before any
    # backend is initialized
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import nufhe_tpu as nf
    from nufhe_tpu.parallel import mesh as pmesh
    from nufhe_tpu.numeric import phase_to_t32

    per_chip = int(os.environ.get("NUFHE_SCALE_BATCH", 4096))
    lwe_size = int(os.environ.get("NUFHE_SCALE_LWE_SIZE", 500))
    runs = int(os.environ.get("NUFHE_SCALE_RUNS", 3))
    inner = int(os.environ.get("NUFHE_SCALE_INNER", 2))

    n_dev = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    rng = nf.DeterministicRNG(42)
    secret, cloud = nf.make_key_pair(rng, lwe_size=lwe_size)
    mu = int(phase_to_t32(1, 8))
    tgsw_params = cloud.params.tgsw_params
    bk_dev_host = np.asarray(cloud.bootstrap_key.device())
    ks_arrays, ks_meta = cloud.keyswitch_key.device()
    ks_host = {k: np.asarray(v) for k, v in ks_arrays.items()}

    nand_const = phase_to_t32(1, 8)
    results = []
    for d in counts:
        mesh = pmesh.make_mesh(n_data=d, n_model=1)
        batch = per_chip * d
        rs = np.random.RandomState(0)
        lwe_a = rs.randint(-2**31, 2**31, (batch, lwe_size)).astype(np.int32)
        lwe_b = rs.randint(-2**31, 2**31, (batch,)).astype(np.int32)
        ga = jax.device_put(lwe_a, NamedSharding(mesh, P('data', None)))
        gb = jax.device_put(lwe_b, NamedSharding(mesh, P('data')))
        bk = pmesh.replicate(jnp.asarray(bk_dev_host), mesh)
        ks = pmesh.replicate(
            {k: jnp.asarray(v) for k, v in ks_host.items()}, mesh)

        fn = pmesh.sharded_bootstrap_fn(mesh, ks_meta, mu, tgsw_params)

        def gate(a, b):
            ta = (-a).astype(jnp.int32)
            tb = (jnp.int32(nand_const) - b).astype(jnp.int32)
            return fn(ta, tb, bk, ks)

        out = gate(ga, gb)
        np.asarray(out[1].ravel()[0])         # compile + run fence
        best = float("inf")
        for _ in range(runs):
            b_cur = gb
            t0 = time.time()
            for _ in range(inner):
                a_out, b_cur, _ = gate(ga, b_cur)
            np.asarray(b_cur.ravel()[0])
            best = min(best, (time.time() - t0) / inner)
        gps = batch / best
        results.append((d, gps))
        print(json.dumps({
            "chips": d, "batch": batch, "s_per_gatecall": round(best, 4),
            "gates_per_sec": round(gps, 1)}), file=sys.stderr)

    base = results[0][1]
    last_d, last_gps = results[-1]
    eff = last_gps / (base * last_d)
    print(json.dumps({
        "metric": "NAND gates/sec scaling ({} chip(s), per-chip batch {})"
                  .format(last_d, per_chip),
        "value": round(last_gps, 1),
        "unit": "gates/sec",
        "vs_baseline": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
