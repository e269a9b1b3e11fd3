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


def sharded_bootstrap_fn(mesh, ks_meta, mu, tgsw_params, no_keyswitch=False,
                         mode='limbs', force_tp=False):
    """A jitted SPMD bootstrap: batch over 'data'; over 'model' either the
    external-product decomposition limbs (``mode='limbs'``, per-step psum
    of the dual-channel MAC outputs) or the transform slots
    (``mode='slots'``, per-step all_gather — the TPU-native equivalent of
    splitting NTT stages across chips); keyswitch local.

    A size-1 'model' axis means pure data parallelism: the tensor-parallel
    kwargs are dropped so each shard runs the fused Pallas engine (the
    XLA-composed TP branch measured ~4x slower per chip).  ``force_tp``
    keeps them anyway — used by ``tools/run_tp.py`` to prove the
    collective code paths compile and run on a 1-device mesh.

    Returns ``fn(lwe_a, lwe_b, bk_dev, ks_arrays) -> (a, b, cv)``.
    ``bk_dev`` must be passed sharded with ``shard_bootstrap_key(mode=)``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_model = int(np.prod(
        [s_ for n_, s_ in zip(mesh.axis_names, mesh.devices.shape)
         if n_ == 'model'])) if 'model' in mesh.axis_names else 1
    use_tp = force_tp or n_model > 1

    def step(lwe_a, lwe_b, bk_dev, ks_ab, ks_cv_scale):
        ks_arrays = dict(ab_limbs=ks_ab, cv_scale=ks_cv_scale)
        tp = {}
        if use_tp:
            tp = dict(axis_name='model') if mode == 'limbs' else \
                dict(slot_axis_name='model')
        return dboot.bootstrap_device(
            lwe_a, lwe_b, bk_dev, ks_arrays, ks_meta, mu, tgsw_params,
            no_keyswitch=no_keyswitch, **tp)

    bk_spec = (P(None, None, 'model', None) if mode == 'limbs'
               else P(None, 'model', None, None))
    kwargs = dict(
        mesh=mesh,
        in_specs=(P('data'), P('data'), bk_spec, P(), P()),
        out_specs=(P('data'), P('data'), P('data')))
    if mode == 'slots':
        # the result is replicated over 'model' by construction (each shard
        # all_gathers the full slot set before the inverse), which the
        # varying-axes checker cannot infer statically
        kwargs['check_vma'] = False
    try:
        mapped = shard_map(step, **kwargs)
    except TypeError:  # older jax spelling
        if 'check_vma' in kwargs:
            kwargs['check_rep'] = kwargs.pop('check_vma')
        mapped = shard_map(step, **kwargs)

    @jax.jit
    def fn(lwe_a, lwe_b, bk_dev, ks_arrays):
        return mapped(lwe_a, lwe_b, bk_dev,
                      ks_arrays['ab_limbs'], ks_arrays['cv_scale'])

    return fn


def shard_bootstrap_key(bk_dev, mesh, mode='limbs'):
    """Place the device bootstrap key (n, L, C, Q) sharded over 'model':
    along the MAC contraction axis C (whole g-blocks of size 2R) for
    ``mode='limbs'``, or along the transform slot axis L for
    ``mode='slots'``."""
    spec = (P(None, None, 'model', None) if mode == 'limbs'
            else P(None, 'model', None, None))
    return jax.device_put(bk_dev, NamedSharding(mesh, spec))
