"""Multi-process SPMD dryrun worker (CPU backend).

Launched by ``__graft_entry__.dryrun_multichip`` (and usable standalone) as

    python -m nufhe_tpu.parallel._mp_worker <coordinator> <nprocs> <pid> \
        <local_devices>

Each process owns <local_devices> virtual CPU devices; together they form a
(data, model) global mesh.  All processes build identical synthetic scheme
state from a fixed seed, shard the ciphertext batch over 'data' (crossing
process boundaries — the DCN analogue) and the bootstrap key limb axis over
'model' (host-local — the ICI analogue), run one sharded NAND bootstrap,
and assert their local output shards are BIT-EXACTLY equal to the same
computation run unsharded.  This validates the full multi-host wiring:
``jax.distributed`` init, cross-process mesh, per-process batch feeding,
per-step psum, and output sharding.
"""

import os
import sys


def _setup(lwe_size, batch):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nufhe_tpu.params import NuFHEParameters
    from nufhe_tpu.ops import transform as dtr
    from nufhe_tpu.ops import lwe as dlwe

    params = NuFHEParameters(lwe_size=lwe_size)
    rng = np.random.RandomState(1234)
    limbs = rng.randint(
        -128, 128, (lwe_size, 4, 2, 64, 32, 5, 2)).astype(np.int8)
    bk_dev = jax.jit(dtr.build_mac_rhs)(jnp.asarray(limbs))
    ks_a = rng.randint(
        -2**31, 2**31, (1024, 8, 4, lwe_size)).astype(np.int32)
    ks_b = rng.randint(-2**31, 2**31, (1024, 8, 4)).astype(np.int32)
    # constant alpha^2 on nonzero digits like real keys (the count-based
    # cv accounting asserts this shape)
    ks_cv = np.full((1024, 8, 4), 3e-9, np.float32)
    ks_cv[:, :, 0] = 0
    ks_arrays, ks_meta = dlwe.prepare_keyswitch_device(ks_a, ks_b, ks_cv, 2)
    lwe_a = rng.randint(-2**31, 2**31, (batch, lwe_size)).astype(np.int32)
    lwe_b = rng.randint(-2**31, 2**31, (batch,)).astype(np.int32)
    return params, bk_dev, ks_arrays, ks_meta, lwe_a, lwe_b


def main():
    coord, nprocs, pid, local_devices = sys.argv[1:5]
    nprocs, pid, local_devices = int(nprocs), int(pid), int(local_devices)

    # a clean CPU-only backend: the axon sitecustomize must not register
    # its PJRT plugin, and the CPU client must use gloo collectives so the
    # distributed runtime spans processes
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=%d" % local_devices
    ).strip()

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs * local_devices

    import numpy as np
    import jax.numpy as jnp
    from nufhe_tpu.parallel import mesh as pmesh
    from nufhe_tpu.parallel import distributed as pdist
    from nufhe_tpu.ops import bootstrap as dboot
    from nufhe_tpu.numeric import phase_to_t32

    n_model = 2 if local_devices % 2 == 0 else 1
    mesh = pdist.make_global_mesh(n_model=n_model)
    n_data = mesh.devices.shape[0]

    lwe_size = 8
    batch = n_data * 2
    params, bk_dev, ks_arrays, ks_meta, lwe_a, lwe_b = _setup(
        lwe_size, batch)
    mu = int(phase_to_t32(1, 8))
    tgsw_params = params.tgsw_params

    # every process feeds only ITS slice of the global batch
    per_proc = batch // nprocs
    sl = slice(pid * per_proc, (pid + 1) * per_proc)
    ga, gb = pdist.global_batch(mesh, (lwe_a[sl], lwe_b[sl]))
    assert ga.shape == (batch, lwe_size)

    bk_sharded = pmesh.shard_bootstrap_key(bk_dev, mesh)
    ks_repl = pmesh.replicate(ks_arrays, mesh)

    fn = pmesh.sharded_bootstrap_fn(mesh, ks_meta, mu, tgsw_params)
    out_a, out_b, out_cv = jax.block_until_ready(
        fn(ga, gb, bk_sharded, ks_repl))

    # unsharded single-process reference of the SAME computation
    ref_a, ref_b, _ = jax.block_until_ready(dboot.bootstrap_device(
        jnp.asarray(lwe_a), jnp.asarray(lwe_b), bk_dev, ks_arrays, ks_meta,
        mu, tgsw_params, use_pallas=False))

    for shard in out_a.addressable_shards:
        start = shard.index[0].start or 0
        want = np.asarray(ref_a)[start:start + shard.data.shape[0]]
        assert np.array_equal(np.asarray(shard.data), want), \
            "a-shard mismatch at %s" % (shard.index,)
    for shard in out_b.addressable_shards:
        start = shard.index[0].start or 0
        want = np.asarray(ref_b)[start:start + shard.data.shape[0]]
        assert np.array_equal(np.asarray(shard.data), want), \
            "b-shard mismatch at %s" % (shard.index,)

    print("mp_worker %d/%d OK: mesh=%s batch=%d bit-exact"
          % (pid, nprocs, dict(zip(mesh.axis_names, mesh.devices.shape)),
             batch))


if __name__ == "__main__":
    main()
