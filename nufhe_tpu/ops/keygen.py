"""Device (JAX) key generation: the TPU-native analogue of the reference's
GPU keygen kernels.

The reference builds both cloud-key halves on the GPU:
``TLweEncryptZero`` (``nufhe/tlwe_gpu.py:111-196``) computes the 500 x
(k+1) x l homogeneous TLWE samples via forward-transform/multiply/inverse
plans, and ``MakeLweKeyswitchKey`` (``nufhe/lwe_gpu.py:63-124``) the
1024 x 8 x 4 LWE table.  Rounds 1-3 ran both on host numpy/OpenMP; this
module moves them onto the device, TPU-style:

- the binary-key negacyclic products of TLWE encrypt-zero become ONE int8
  MXU matmul against a signed-circulant matrix of the key (digit-split
  noise x {-1,0,1} key matrix, int32 accumulation — exact: |products|
  <= 128, 1024-term sums <= 2^17);
- the keyswitch-key body is a plain i32 contraction (XLA);
- the bootstrap-key forward transform mod 2^38 (the stored limb form) runs
  as five exact digit-plane forwards (|digits| <= 128 -> transform values
  <= 2^12, exact in i32) assembled into the A/B limb split in pure i32
  wraparound — bit-equal to the host path (``native.bootstrap_key_limbs``),
  asserted by tests/test_keygen.py.

RNG stays on host (the reference's own design, ``random_numbers.py:18-27``):
noise tensors are drawn by the caller's RNG in the reference call order and
uploaded once, so host and device keygen produce IDENTICAL keys.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import transform as dt

N = dt.N
L = dt.L
R = dt.R


# --- binary negacyclic products (TLWE encrypt-zero) -------------------------


def negacyclic_key_matrix(key):
    """Host: binary key polynomials -> the signed circulant matmul operand.

    W[k, m, c] = key[k, (c - m) % N] * (+1 if m <= c else -1), so that the
    negacyclic product (key_k * x)[c] = sum_m x[m] * W[k, m, c].

    :param key: (mask_size, N) 0/1 int host array.
    :returns: (mask_size, N, N) int8 numpy array (~1 MB per polynomial).
    """
    key = np.asarray(key, np.int64)
    mask_size, n = key.shape
    m_idx = np.arange(n)
    c_idx = np.arange(n)
    gather = (c_idx[None, :] - m_idx[:, None]) % n          # (m, c)
    sign = np.where(m_idx[:, None] <= c_idx[None, :], 1, -1)
    w = key[:, gather] * sign[None]
    return w.astype(np.int8)


def _digit_planes(x, planes=4, with_rem=False):
    """Balanced radix-2^8 digit planes of i32 values (plus the {-1,0,1}
    remainder plane when ``with_rem``): x = sum_d 2^(8d) d_d + 2^32 rem
    EXACTLY over Z for the centered i32 value of x.

    Carry form (d = low byte - 256*carry; v' = (v >> 8) + carry) instead
    of the naive (v - d) >> 8: the naive subtraction overflows i32 at
    v = 2^31-1 (d = -1), which corrupts the remainder plane (the digits
    themselves only depend on v mod 2^32 and are identical either way)."""
    digs = []
    v = x.astype(jnp.int32)
    for _ in range(planes):
        low = v & 255
        c = (low >= 128).astype(jnp.int32)
        digs.append((low - (c << 8)).astype(jnp.int32))
        v = (v >> 8) + c
    if with_rem:
        digs.append(v)
    return digs


@jax.jit
def binary_negacyclic_mul_device(w_dev, x):
    """sum_k key_k * x_k (negacyclic, exact mod 2^32) on the MXU.

    :param w_dev: (mask_size, N, N) int8 device array
        (``negacyclic_key_matrix``).
    :param x: (..., mask_size, N) int32.
    :returns: (..., N) int32.
    """
    mask_size = w_dev.shape[0]
    lead = x.shape[:-2]
    xf = x.reshape((-1, mask_size, N))
    digs = jnp.stack(_digit_planes(xf), axis=-2)            # (B, K, 4, N)
    digs = jnp.moveaxis(digs, -2, 1).astype(jnp.int8)       # (B, 4, K, N)
    out = jax.lax.dot_general(
        digs, w_dev,
        dimension_numbers=(((2, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32)                   # (B, 4, N)
    total = (out[:, 0] + (out[:, 1] << 8)
             + (out[:, 2] << 16) + (out[:, 3] << 24))
    return total.astype(jnp.int32).reshape(lead + (N,))


def tlwe_encrypt_zero_device(w_dev, noises1, noises2):
    """Homogeneous TLWE samples: b = noise2 + sum_k key_k * mask_noise_k.

    Device twin of ``ref.tlwe_ref.tlwe_encrypt_zero`` (bit-equal);
    reference kernel: ``nufhe/tlwe_gpu.py:111-196``.

    :param w_dev: (mask_size, N, N) int8 key matrix.
    :param noises1: (..., mask_size, N) int32 uniform mask noise.
    :param noises2: (..., N) int32 gaussian body noise.
    :returns: (..., mask_size+1, N) int32.
    """
    noises1 = jnp.asarray(noises1, jnp.int32)
    body = (jnp.asarray(noises2, jnp.int32)
            + binary_negacyclic_mul_device(w_dev, noises1)).astype(jnp.int32)
    return jnp.concatenate([noises1, body[..., None, :]], axis=-2)


def tgsw_add_message_device(a, messages, base_powers):
    """result += message * H (gadget on the diagonal); device twin of
    ``ref.tgsw_ref.tgsw_add_message`` (reference kernel:
    ``nufhe/tgsw_gpu.py:172-205``).

    :param a: (n, mask1, l, mask1, N) int32 TGSW samples.
    :param messages: (n,) int32 (the LWE key bits).
    :param base_powers: (l,) gadget constants (int64/uint32 host values).
    """
    mask1 = a.shape[1]
    bp = jnp.asarray(
        np.asarray(base_powers, np.int64).astype(np.uint32).view(np.int32))
    inc = (jnp.asarray(messages, jnp.int32)[:, None] * bp)  # (n, l)
    for o in range(mask1):
        a = a.at[:, o, :, o, 0].add(inc)
    return a.astype(jnp.int32)


# module-level jit: the whole BK sample build is ONE device dispatch
# (eager op-by-op execution costs a tunnel round-trip per op on this rig)
@jax.jit
def _bootstrap_key_device_jit(w_dev, lwe_key_dev, noises1, noises2, bp):
    a = tlwe_encrypt_zero_device(w_dev, noises1, noises2)
    mask1 = a.shape[1]
    inc = (jnp.asarray(lwe_key_dev, jnp.int32)[:, None] * bp)
    for o in range(mask1):
        a = a.at[:, o, :, o, 0].add(inc)
    return a.astype(jnp.int32)


def bootstrap_key_device(w_dev, lwe_key_dev, noises1, noises2, base_powers):
    """Full bootstrap-key sample build on device:
    TGSW encrypt-zero (batched) + add-message, one jitted dispatch.

    :param noises1: (n, mask1, l, mask_size, N) int32.
    :param noises2: (n, mask1, l, N) int32.
    :returns: (n, mask1, l, mask1, N) int32 coefficient-domain TGSW rows.
    """
    bp = jnp.asarray(
        np.asarray(base_powers, np.int64).astype(np.uint32).view(np.int32))
    return _bootstrap_key_device_jit(
        w_dev, jnp.asarray(lwe_key_dev), jnp.asarray(noises1),
        jnp.asarray(noises2), bp)


# --- keyswitch key -----------------------------------------------------------


def make_keyswitch_key_device(in_key, out_key, noises_a, noises_b,
                              decomp_length: int, log2_base: int):
    """Keyswitch key on device: encryptions of
    ``s'_i * h * 2^(32-(j+1)*log2_base)`` under the output key.

    Device twin of ``ref.lwe_ref.make_keyswitch_key`` (reference kernel:
    ``nufhe/lwe_gpu.py:63-124``); the digit-0 base slice stays the trivial
    zero encryption.

    :param in_key: (input_size,) int32 0/1 (device ok).
    :param out_key: (output_size,) int32 0/1 (device ok).
    :param noises_a: (input_size, l, base-1, output_size) int32.
    :param noises_b: (input_size, l, base-1) int32.
    :returns: (ks_a, ks_b) int32 device arrays of shapes
        (input_size, l, base, output_size) and (input_size, l, base).
    """
    return _make_ks_device_jit(
        jnp.asarray(in_key, jnp.int32), jnp.asarray(out_key, jnp.int32),
        jnp.asarray(noises_a, jnp.int32), jnp.asarray(noises_b, jnp.int32),
        decomp_length, log2_base)


@partial(jax.jit, static_argnums=(4, 5))
def _make_ks_device_jit(in_key, out_key, noises_a, noises_b,
                        decomp_length, log2_base):
    in_key = jnp.asarray(in_key, jnp.int32)
    out_key = jnp.asarray(out_key, jnp.int32)
    noises_a = jnp.asarray(noises_a, jnp.int32)
    noises_b = jnp.asarray(noises_b, jnp.int32)
    input_size, l, base_m1, output_size = noises_a.shape
    base = base_m1 + 1

    hs = jnp.arange(1, base, dtype=jnp.int32)
    js = np.arange(l)
    # h * 2^(32-(j+1)*log2_base) mod 2^32 in i32 wraparound (the reference
    # computes this in int64 then truncates; identical mod 2^32)
    powers = jnp.asarray(
        ((np.int64(1) << (32 - (js + 1) * log2_base)) & 0xFFFFFFFF)
        .astype(np.uint32).view(np.int32))
    messages = (in_key[:, None, None] * hs[None, None, :]
                * powers[None, :, None]).astype(jnp.int32)
    body = (messages + noises_b
            + jnp.einsum('iljn,n->ilj', noises_a, out_key,
                         preferred_element_type=jnp.int32)).astype(jnp.int32)
    pad = [(0, 0), (0, 0), (1, 0), (0, 0)]
    ks_a = jnp.pad(noises_a, pad)
    ks_b = jnp.pad(body, pad[:-1])
    return ks_a, ks_b


# --- bootstrap-key transform (the stored limb form) on device ---------------


def _vhi_limbs(vhi):
    """Balanced radix-2^8 int8 digits of an i32 value (mod-2^32 semantics:
    the top digit wraps, exactly as the host split's int64 digits 0..3)."""
    return jnp.stack(
        [d.astype(jnp.int8) for d in _digit_planes(vhi)], axis=-1)


@partial(jax.jit, static_argnums=1)
def _split_planes(chunk_flat, exact):
    """(B, N) i32 polynomials -> one-sided A/B limb split of their exact
    forward transforms mod 2^38 (see ``bootstrap_key_limbs_device``).
    The five digit planes ride ONE batched forward call (plane-major
    stacking) so the whole chunk is a single fused device program."""
    planes = _digit_planes(chunk_flat, with_rem=True)   # 5 x (B, N)
    stacked = jnp.stack(planes, axis=0)                 # (5, B, N)
    fs = dt.forward_i32(stacked)                        # (5, B, L, R)
    f0 = fs[0]
    tail = ((fs[1] << 2) + (fs[2] << 10)
            + (fs[3] << 18) + (fs[4] << 26)).astype(jnp.int32)
    if exact:
        vlo = (((f0 + 32) & 63) - 32).astype(jnp.int32)
        vhi = (((f0 - vlo) >> 6) + tail).astype(jnp.int32)
        pos = jnp.concatenate(
            [vlo[..., None].astype(jnp.int8), _vhi_limbs(vhi)], axis=-1)
        return pos, jnp.zeros((), jnp.uint8)
    q = (((f0 + 32) >> 6) + tail).astype(jnp.int32)
    delta = ((f0 & 63) == 32).astype(jnp.uint8)
    return _vhi_limbs(q), delta


def bootstrap_key_limbs_device(bk_coeff, exact=True, chunk=2048):
    """Device twin of the host transform+split
    (``tgsw.bootstrap_key_limbs_host`` -> ``one_sided_limbs_host``): the
    exact forward Nussbaumer transform mod 2^38 of every bootstrap-key
    polynomial, A/B-limb-split, ONE-SIDED (+v limbs; the -v side is derived
    at expansion by ``transform.two_sided_limbs_device``).

    Method: split each i32 polynomial into four balanced radix-2^8 digit
    planes plus the {-1,0} remainder plane (x = sum 2^(8d) d_d + 2^32 rem
    over Z), forward-transform each plane exactly in i32 (|values| <=
    2^12), then assemble mod 2^38 without any 64-bit arithmetic:
      v mod 64 = f_0 mod 64                     (2^8 = 0 mod 64)
      vlo      = balanced(f_0 mod 64)
      vhi      = (f_0 - vlo)>>6 + sum_{d>=1} f_d 2^(8d-6) + f_rem 2^26
                 (i32 wraparound IS the required mod-2^32)
    Rounded ('FFT') mode: q = (f_0+32)>>6 + the same tail (exact: the tail
    is divisible by 64), delta-bit = [f_0 = 32 mod 64].

    :param bk_coeff: (n, mask1, l, mask1, N) int32 (device ok).
    :returns: (pos, delta): pos int8 (n, G, O, L, R, KL[,4]); delta uint8
        (n, G, O, L, R) in rounded mode else None.  Same layout as
        ``transform.one_sided_limbs_host(key_limbs_host(...))``.
    """
    n_rows, mask1, decomp, mask1_o, poly_n = bk_coeff.shape
    flat = jnp.asarray(bk_coeff).reshape(-1, poly_n)
    total = flat.shape[0]
    pad = (-total) % chunk
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, poly_n), jnp.int32)], axis=0)

    pos_parts, delta_parts = [], []
    for i in range(0, flat.shape[0], chunk):
        p, d = _split_planes(flat[i:i + chunk], exact)
        pos_parts.append(p)
        if not exact:
            delta_parts.append(d)
    pos = (jnp.concatenate(pos_parts, axis=0)
           if len(pos_parts) > 1 else pos_parts[0])[:total]
    kl = pos.shape[-1]
    pos = pos.reshape(n_rows, mask1 * decomp, mask1_o, dt.L, dt.R, kl)
    if exact:
        return pos, None
    delta = (jnp.concatenate(delta_parts, axis=0)
             if len(delta_parts) > 1 else delta_parts[0])[:total]
    return pos, delta.reshape(n_rows, mask1 * decomp, mask1_o, dt.L, dt.R)
