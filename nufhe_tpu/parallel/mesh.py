"""Multi-chip execution: mesh construction and sharded bootstrap.

The reference's multi-device story is manual slicing + serialization per GPU
(``examples/multi_gpu.py``).  Here scaling is first-class SPMD:

- **data parallel (dp)**: the ciphertext batch axis is sharded over the
  ``data`` mesh axis; gates are embarrassingly parallel, keys replicated.
- **tensor parallel (tp)**: the external-product decomposition axis
  G = (mask_size+1)*decomp_length is sharded over the ``model`` mesh axis;
  each shard MACs its slice of the transformed bootstrap key and the
  dual-channel accumulators are ``psum``-reduced over ICI before the
  inverse transform (see ``ops/tgsw.py``).

Collectives are inserted by ``shard_map``; batch redistribution across
hosts rides DCN, the per-step psum rides ICI.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..ops import bootstrap as dboot
from ..ops import lwe as dlwe


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ('data', 'model'))


def shard_ciphertext(ct, mesh):
    """Place a ciphertext with its leading batch axis sharded over 'data'."""
    ct.a = jax.device_put(
        ct.a, NamedSharding(mesh, P('data', *([None] * (ct.a.ndim - 1)))))
    ct.b = jax.device_put(
        ct.b, NamedSharding(mesh, P('data', *([None] * (ct.b.ndim - 1)))))
    ct.current_variances = jax.device_put(
        ct.current_variances,
        NamedSharding(mesh, P('data', *([None] * (ct.b.ndim - 1)))))
    return ct


def replicate(tree, mesh):
    """Replicate key material over the whole mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def sharded_bootstrap_fn(mesh, ks_meta, mu, tgsw_params, no_keyswitch=False):
    """A jitted SPMD bootstrap: batch over 'data', external-product
    decomposition limbs over 'model' (psum-accumulated), keyswitch local.

    Returns ``fn(lwe_a, lwe_b, bk_dev, ks_arrays) -> (a, b, cv)``.
    ``bk_dev`` must be passed C-sharded over 'model'
    (``shard_bootstrap_key``).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(lwe_a, lwe_b, bk_dev, ks_ab, ks_cv):
        ks_arrays = dict(ab_limbs=ks_ab, cv=ks_cv)
        return dboot.bootstrap_device(
            lwe_a, lwe_b, bk_dev, ks_arrays, ks_meta, mu, tgsw_params,
            no_keyswitch=no_keyswitch, axis_name='model')

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P('data'), P('data'), P(None, None, 'model', None),
                  P(), P()),
        out_specs=(P('data'), P('data'), P('data')))

    @jax.jit
    def fn(lwe_a, lwe_b, bk_dev, ks_arrays):
        return mapped(lwe_a, lwe_b, bk_dev,
                      ks_arrays['ab_limbs'], ks_arrays['cv'])

    return fn


def shard_bootstrap_key(bk_dev, mesh):
    """Place the device bootstrap key (n, L, C, Q) sharded over 'model'
    along the MAC contraction axis C (whole g-blocks of size 2R)."""
    return jax.device_put(
        bk_dev, NamedSharding(mesh, P(None, None, 'model', None)))
