"""Multi-device SPMD tests on the virtual 8-device CPU mesh: the sharded
(dp x tp, psum-accumulated) bootstrap must equal the single-device result
bit-exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nufhe_tpu.params import NuFHEParameters
from nufhe_tpu.rng import DeterministicRNG
from nufhe_tpu.keys import NuFHESecretKey, NuFHECloudKey
from nufhe_tpu.numeric import phase_to_t32
from nufhe_tpu.ops import bootstrap as dboot
from nufhe_tpu.parallel import mesh as pmesh

LWE_SIZE = 16


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    # XLA:CPU has crashed (segfault) running the shard_map programs with a
    # large accumulated compilation cache from earlier modules; start clean.
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def keys():
    rng = DeterministicRNG(11)
    params = NuFHEParameters(lwe_size=LWE_SIZE)
    secret = NuFHESecretKey.from_rng(params, rng)
    cloud = NuFHECloudKey.from_rng(params, rng, secret)
    return params, cloud, rng


@pytest.mark.parametrize("mode", ["limbs", "slots"])
def test_sharded_bootstrap_matches_single_device(keys, mode):
    params, cloud, rng = keys
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    B = 16
    lwe_a = rng.uniform_torus32((B, LWE_SIZE))
    lwe_b = rng.uniform_torus32((B,))
    mu = int(phase_to_t32(1, 8))
    tp = params.tgsw_params

    bk_dev = cloud.bootstrap_key.device()
    ks_arrays, ks_meta = cloud.keyswitch_key.device()

    want = dboot.bootstrap_device(
        jnp.asarray(lwe_a), jnp.asarray(lwe_b), bk_dev, ks_arrays, ks_meta,
        mu, tp)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    bk_sharded = pmesh.shard_bootstrap_key(bk_dev, mesh, mode=mode)
    ks_repl = pmesh.replicate(ks_arrays, mesh)
    a_sh = jax.device_put(
        jnp.asarray(lwe_a), NamedSharding(mesh, P('data', None)))
    b_sh = jax.device_put(jnp.asarray(lwe_b), NamedSharding(mesh, P('data')))

    fn = pmesh.sharded_bootstrap_fn(mesh, ks_meta, mu, tp, mode=mode)
    got = fn(a_sh, b_sh, bk_sharded, ks_repl)

    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


@pytest.mark.parametrize("mode", ["limbs", "slots"])
def test_sharded_bootstrap_rounded_key(mode):
    """Tensor-parallel external products in the rounded-key ('FFT') mode:
    the single-channel psum/all_gather paths match single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    rng = DeterministicRNG(12)
    params = NuFHEParameters(lwe_size=LWE_SIZE, transform_type='FFT')
    secret = NuFHESecretKey.from_rng(params, rng)
    cloud = NuFHECloudKey.from_rng(params, rng, secret)

    B = 8
    lwe_a = rng.uniform_torus32((B, LWE_SIZE))
    lwe_b = rng.uniform_torus32((B,))
    mu = int(phase_to_t32(1, 8))
    tp = params.tgsw_params

    bk_dev = cloud.bootstrap_key.device()
    assert bk_dev.shape[-1] == 4 * (tp.tlwe_params.mask_size + 1) * 32
    ks_arrays, ks_meta = cloud.keyswitch_key.device()

    want = dboot.bootstrap_device(
        jnp.asarray(lwe_a), jnp.asarray(lwe_b), bk_dev, ks_arrays, ks_meta,
        mu, tp)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    bk_sharded = pmesh.shard_bootstrap_key(bk_dev, mesh, mode=mode)
    ks_repl = pmesh.replicate(ks_arrays, mesh)
    a_sh = jax.device_put(
        jnp.asarray(lwe_a), NamedSharding(mesh, P('data', None)))
    b_sh = jax.device_put(jnp.asarray(lwe_b), NamedSharding(mesh, P('data')))

    fn = pmesh.sharded_bootstrap_fn(mesh, ks_meta, mu, tp, mode=mode)
    got = fn(a_sh, b_sh, bk_sharded, ks_repl)

    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_data_parallel_gate_end_to_end(keys):
    """Encrypt -> shard -> sharded NAND bootstrap -> decrypt."""
    params, cloud, rng = keys
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    import nufhe_tpu as nf
    secret = None  # re-derive pair for encryption
    rng2 = DeterministicRNG(12)
    secret, cloud2 = nf.make_key_pair(rng2, lwe_size=LWE_SIZE)

    bits_a = np.random.RandomState(0).randint(0, 2, 8).astype(bool)
    bits_b = np.random.RandomState(1).randint(0, 2, 8).astype(bool)
    ca = nf.encrypt(rng2, secret, bits_a)
    cb = nf.encrypt(rng2, secret, bits_b)

    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    pmesh.shard_ciphertext(ca, mesh)
    pmesh.shard_ciphertext(cb, mesh)

    vm = nf.VirtualMachine(cloud2)
    res = vm.gate_nand(ca, cb)
    assert np.array_equal(nf.decrypt(secret, res), ~(bits_a & bits_b))


@pytest.mark.heavy
def test_multiprocess_spmd_dryrun():
    """Two cooperating processes x 4 virtual CPU devices: one sharded
    bootstrap over the cross-process global mesh, bit-exact per shard
    (gloo collectives; the multi-host wiring the driver also validates)."""
    from nufhe_tpu.parallel import distributed as pdist
    lines = pdist.run_multiprocess_dryrun(nprocs=2, local_devices=4)
    assert all("bit-exact" in line for line in lines), lines
