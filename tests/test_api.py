"""API and serialization tests (reference: test/test_api_high_level.py,
test/test_api_low_level.py)."""

import io

import numpy as np
import pytest

import nufhe_tpu as nf


@pytest.fixture(scope="module")
def ctx_keys():
    ctx = nf.Context(rng=nf.DeterministicRNG(99))
    secret, cloud = ctx.make_key_pair(lwe_size=16)
    return ctx, secret, cloud


def test_context_workflow(ctx_keys):
    ctx, secret, cloud = ctx_keys
    vm = ctx.make_virtual_machine(cloud)
    bits = np.array([True, False, True, True])
    c = ctx.encrypt(secret, bits)
    res = vm.gate_not(c)
    assert np.array_equal(ctx.decrypt(secret, res), ~bits)


def test_find_devices():
    devices = nf.find_devices()
    assert len(devices) >= 1
    d = devices[0]
    assert d.get_device() is not None
    assert isinstance(str(d), str)


def test_secret_key_serialization(ctx_keys):
    ctx, secret, cloud = ctx_keys
    data = secret.dumps()
    loaded = nf.NuFHESecretKey.loads(data)
    assert loaded == secret

    buf = io.BytesIO()
    secret.dump(buf)
    buf.seek(0)
    assert ctx.load_secret_key(buf) == secret
    assert ctx.load_secret_key(data) == secret


def test_cloud_key_serialization(ctx_keys):
    ctx, secret, cloud = ctx_keys
    data = cloud.dumps()
    loaded = nf.NuFHECloudKey.loads(data)
    assert loaded == cloud
    assert ctx.load_cloud_key(data) == cloud


def test_bootstrap_key_format2_backcompat(ctx_keys):
    """Round-2 (format-2) containers stored plain balanced radix-2^8 key
    limbs; loading one must re-split into the current A/B form."""
    from nufhe_tpu import serialization
    from nufhe_tpu.keys import BootstrapKey

    ctx, secret, cloud = ctx_keys
    bk = cloud.bootstrap_key
    new = bk.limbs()
    # reconstruct the centered mod-2^38 values (both sides), then produce
    # the round-2 split: 5 balanced radix-2^8 digits, no A/B boundary
    v = new[..., 0, :].astype(np.int64) + (sum(
        new[..., j, :].astype(np.int64) << (8 * (j - 1))
        for j in range(1, 5)) << 6)
    old, w = [], v
    for _ in range(5):
        l0 = ((w + 128) & 255) - 128
        old.append(l0.astype(np.int8))
        w = (w - l0) >> 8
    old = np.stack(old, axis=-2)                      # (..., 5, 2)

    buf = io.BytesIO()
    serialization.dump(buf, {"kind": "BootstrapKey", "format": 2},
                       {"limbs": old, "cv": bk.cv})
    buf.seek(0)
    loaded = BootstrapKey.load(buf, bk.in_out_params, bk.bk_params)
    assert np.array_equal(loaded.limbs(), new)
    # the full legacy chain: radix-8 -> A/B re-split -> one-sided compact
    # -> device derivation -> expanded MAC rhs equals the fresh key's
    assert np.array_equal(np.asarray(loaded.device()),
                          np.asarray(bk.device()))


def test_bootstrap_key_format3_backcompat(ctx_keys):
    """Round-3a (format-3) containers stored BOTH sides of the A/B limb
    split; loading one must behave identically to the current one-sided
    format-4 path."""
    from nufhe_tpu import serialization
    from nufhe_tpu.keys import BootstrapKey

    ctx, secret, cloud = ctx_keys
    bk = cloud.bootstrap_key
    buf = io.BytesIO()
    serialization.dump(buf, {"kind": "BootstrapKey", "format": 3},
                       {"limbs": bk.limbs(), "cv": bk.cv})
    buf.seek(0)
    loaded = BootstrapKey.load(buf, bk.in_out_params, bk.bk_params)
    assert np.array_equal(loaded.limbs(), bk.limbs())


def test_bootstrap_key_format4_halves_container(ctx_keys):
    """The format-4 container stores only the +v side: about half the
    bytes of the two-sided payload, and loads bit-identically."""
    ctx, secret, cloud = ctx_keys
    bk = cloud.bootstrap_key
    buf = io.BytesIO()
    bk.dump(buf)
    two_sided_bytes = bk.limbs().nbytes
    assert buf.tell() < 0.6 * two_sided_bytes
    buf.seek(0)
    from nufhe_tpu.keys import BootstrapKey
    loaded = BootstrapKey.load(buf, bk.in_out_params, bk.bk_params)
    assert np.array_equal(loaded.limbs(), bk.limbs())


def test_keyswitch_key_container_drops_zero_slice(ctx_keys):
    """Format-2 keyswitch containers omit the trivial digit-0 slice and
    reconstruct it losslessly on load."""
    from nufhe_tpu.keys import LweKeyswitchKey

    ctx, secret, cloud = ctx_keys
    ks = cloud.keyswitch_key
    buf = io.BytesIO()
    ks.dump(buf)
    assert buf.tell() < 0.8 * (ks.ks_a.nbytes + ks.ks_b.nbytes
                               + ks.ks_cv.nbytes)
    buf.seek(0)
    loaded = LweKeyswitchKey.load(buf)
    assert np.array_equal(loaded.ks_a, ks.ks_a)
    assert np.array_equal(loaded.ks_b, ks.ks_b)
    assert np.array_equal(loaded.ks_cv, ks.ks_cv)


def test_ciphertext_serialization(ctx_keys):
    ctx, secret, cloud = ctx_keys
    bits = np.array([[True, False], [False, True]])
    c = ctx.encrypt(secret, bits)
    data = c.dumps()
    loaded = nf.LweSampleArray.loads(data)
    assert loaded == c
    assert np.array_equal(ctx.decrypt(secret, loaded), bits)


def test_serialized_gate_roundtrip(ctx_keys):
    """Full client/cloud workflow: serialize keys + ciphertexts, reload,
    compute, serialize result, decrypt (reference: examples/serialization.py).
    """
    ctx, secret, cloud = ctx_keys
    bits_a = np.array([True, False, True])
    bits_b = np.array([True, True, False])

    ca = ctx.encrypt(secret, bits_a).dumps()
    cb = ctx.encrypt(secret, bits_b).dumps()
    cloud_data = cloud.dumps()

    # "cloud side"
    cloud2 = nf.NuFHECloudKey.loads(cloud_data)
    vm = nf.VirtualMachine(cloud2)
    res = vm.gate_nand(nf.LweSampleArray.loads(ca), nf.LweSampleArray.loads(cb))
    res_data = res.dumps()

    # "client side"
    got = ctx.decrypt(secret, nf.LweSampleArray.loads(res_data))
    assert np.array_equal(got, ~(bits_a & bits_b))


def test_both_rngs():
    for rng in (nf.DeterministicRNG(1), nf.SecureRNG()):
        x = rng.uniform_bool((100,))
        assert set(np.unique(x)).issubset({0, 1})
        t = rng.uniform_torus32((100,))
        assert t.dtype == np.int32
        g = rng.gauss((1000,), 2.0)
        assert abs(float(np.std(g)) - 2.0) < 0.5


def test_vm_shape_derivation(ctx_keys):
    """dest=None derives the broadcast result shape
    (reference: test_api_high_level.py:135-172)."""
    ctx, secret, cloud = ctx_keys
    vm = ctx.make_virtual_machine(cloud)
    a = ctx.encrypt(secret, np.zeros((3, 1, 4), bool))
    b = ctx.encrypt(secret, np.zeros((5, 4), bool))
    res = vm.gate_and(a, b)
    assert res.shape == (3, 5, 4)


def test_ciphertext_roll_concat_setitem(ctx_keys):
    ctx, secret, cloud = ctx_keys
    bits = np.random.RandomState(3).randint(0, 2, (2, 6)).astype(bool)
    c = ctx.encrypt(secret, bits)

    c2 = c.copy()
    c2.roll(2, axis=-1)
    assert np.array_equal(ctx.decrypt(secret, c2), np.roll(bits, 2, axis=-1))

    cat = nf.concatenate([c, c2], axis=0)
    assert cat.shape == (4, 6)
    want = np.concatenate([bits, np.roll(bits, 2, axis=-1)], axis=0)
    assert np.array_equal(ctx.decrypt(secret, cat), want)

    c3 = c.copy()
    c3[0] = c2[1]
    got = ctx.decrypt(secret, c3)
    want = bits.copy()
    want[0] = np.roll(bits, 2, axis=-1)[1]
    assert np.array_equal(got, want)


def test_empty_ciphertext_shapes(ctx_keys):
    ctx, secret, cloud = ctx_keys
    c = nf.empty_ciphertext(cloud.params, (2, 3))
    assert c.shape == (2, 3)
    assert c.a.shape == (2, 3, cloud.params.in_out_params.size)
