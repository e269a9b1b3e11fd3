"""The 14 homomorphic gates.

Every bootstrapped gate follows the reference pattern
(``nufhe/gates.py``): a noiseless-trivial constant plus a +-1/+-2 linear
combination of the inputs, then one bootstrap with mu = 1/8.  Here the
linear part and the whole bootstrap compile into a single jit'd program per
(parameter set, gate coefficient signature); batch is the parallel axis.

Gate constants (reference lines):
  NAND (0, 1/8) - a - b      gates.py:110-121
  OR   (0, 1/8) + a + b      gates.py:152-163
  AND  (0,-1/8) + a + b      gates.py:194-205
  XOR  (0, 1/4) + 2a + 2b    gates.py:236-247
  XNOR (0,-1/4) - 2a - 2b    gates.py:278-289
  NOR  (0,-1/8) - a - b      gates.py:418-429
  ANDNY(0,-1/8) - a + b      gates.py:460-471
  ANDYN(0,-1/8) + a - b      gates.py:502-513
  ORNY (0, 1/8) - a + b      gates.py:544-555
  ORYN (0, 1/8) + a - b      gates.py:586-597
  NOT/COPY/CONSTANT: linear only; MUX: two no-keyswitch bootstraps + sum +
  single keyswitch (gates.py:600-664).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..numeric import phase_to_t32, bool_to_t32, Torus32
from ..ciphertext import LweSampleArray
from ..ops import bootstrap as dboot
from ..ops import lwe as dlwe

_MU = int(phase_to_t32(1, 8))


def get_shape(obj):
    """Batch shape of a gate argument: a ciphertext, an array, or a plain
    (nested) list of booleans.  Reference behavior: nufhe/gates.py:42-48."""
    shape = getattr(obj, 'shape', None)
    if shape is not None:
        return tuple(shape)
    if isinstance(obj, list):
        return np.asarray(obj).shape
    raise ValueError("not an array-like gate argument: %r" % (type(obj),))


def result_shape(*shapes):
    """Numpy-style broadcast of any number of batch shapes (the shape of a
    gate's output given its inputs').  Raises ValueError when some axis pair
    disagrees with both sides > 1.  Reference behavior: nufhe/gates.py:51-69.
    """
    try:
        return np.broadcast_shapes(*shapes)
    except ValueError:
        raise ValueError("gate argument shapes do not broadcast: %s"
                         % (list(map(tuple, shapes)),))


def check_shape(result, *args):
    """Destination-shape validation: the broadcast of the argument shapes
    must equal a trailing slice of the destination shape (extra leading
    destination axes replicate).  Reference behavior: nufhe/gates.py:72-78."""
    derived = result_shape(*map(get_shape, args))
    dest = tuple(result.shape)
    if dest[max(len(dest) - len(derived), 0):] != derived:
        raise ValueError(
            "gate result shape %s does not accept the broadcast "
            "argument shape %s" % (dest, derived))


def _broadcast_flat(ct, shape, lwe_size):
    """Broadcast a ciphertext's arrays to ``shape`` and flatten the batch."""
    a = jnp.broadcast_to(ct.a, shape + (lwe_size,)).reshape(-1, lwe_size)
    b = jnp.broadcast_to(ct.b, shape).reshape(-1)
    cv = jnp.broadcast_to(ct.current_variances, shape).reshape(-1)
    return a, b, cv


@partial(jax.jit, static_argnames=(
    'mu', 'tgsw_params', 'ks_meta', 'no_keyswitch', 'use_pallas',
    'lane_tile', 'vmem_limit_mb', 'chunk_steps', 'coarse_phase_bits'))
def _linear_bootstrap(inputs, const, coeffs, bk_dev, ks_arrays, *, mu,
                      tgsw_params, ks_meta, no_keyswitch, use_pallas=None,
                      lane_tile=None, vmem_limit_mb=None, chunk_steps=1,
                      coarse_phase_bits=0):
    """temp = (0, const) + sum_i coeffs[i] * inputs[i]; bootstrap(temp).

    ``const`` and ``coeffs`` are traced scalars, so all two-input gates share
    one compiled program per (shape, parameter set).
    """
    ta = jnp.zeros_like(inputs[0][0])
    tb = jnp.full(inputs[0][1].shape, jnp.int32(0)) + const
    tcv = jnp.zeros_like(inputs[0][2])
    for (ia, ib, icv), c in zip(inputs, coeffs):
        c32 = c.astype(jnp.int32)
        ta = ta + c32 * ia
        tb = tb + c32 * ib
        tcv = tcv + c.astype(jnp.float32)**2 * icv
    return dboot.bootstrap_device(
        ta.astype(jnp.int32), tb.astype(jnp.int32), bk_dev, ks_arrays,
        ks_meta, mu, tgsw_params, no_keyswitch=no_keyswitch,
        use_pallas=use_pallas, lane_tile=lane_tile,
        vmem_limit_mb=vmem_limit_mb, chunk_steps=chunk_steps,
        coarse_phase_bits=coarse_phase_bits)


def _perf_kwargs(perf_params):
    if perf_params is None:
        return {}
    return dict(use_pallas=perf_params.single_kernel_bootstrap,
                lane_tile=perf_params.batch_tile,
                vmem_limit_mb=getattr(perf_params, 'vmem_limit_mb', None),
                chunk_steps=getattr(perf_params, 'chunk_steps', 1),
                coarse_phase_bits=getattr(
                    perf_params, 'coarse_phase_bits', 0))


def _looks_like_vmem_oom(exc) -> bool:
    # Mosaic scoped-memory failures name VMEM explicitly; matching broader
    # OOM phrases would send unrelated failures into futile tile-shrink
    # retries and mask the real error.
    return 'vmem' in str(exc).lower()


# successful lane tiles per (platform, batch): remembered so the shrink
# search runs once per process (reference analogue: the shrinking
# OutOfResourcesError loops in nufhe/blind_rotate.py:143-187)
_WORKING_TILE = {}


def _run_with_vmem_fallback(run, perf_params, batch):
    """Call ``run(lane_tile)``, shrinking the lane tile on Mosaic/XLA
    out-of-VMEM compile errors.  ``lane_tile=None`` means the VMEM-derived
    auto choice (ops/bootstrap.lane_tile_for)."""
    platform = getattr(perf_params, 'platform', None) if perf_params else None
    key = (platform, batch)
    first = None
    if perf_params is not None and perf_params.batch_tile is not None:
        first = perf_params.batch_tile
    elif key in _WORKING_TILE:
        first = _WORKING_TILE[key]
    tiles = [first] + [t for t in (1024, 512, 256, 128)
                       if first is None or t < first]
    last_exc = None
    for tile in tiles:
        try:
            out = run(tile)
            _WORKING_TILE[key] = tile
            return out
        except Exception as exc:  # noqa: BLE001 - filtered below
            if not _looks_like_vmem_oom(exc):
                raise
            last_exc = exc
    raise last_exc


def _bootstrap_gate(cloud_key, result, sources, const, coeffs,
                    no_keyswitch=False, perf_params=None):
    params = cloud_key.params
    lwe_size = params.in_out_params.size
    shape = result.shape
    inputs = tuple(
        _broadcast_flat(src, shape, lwe_size) for src in sources)

    ks_arrays, ks_meta = cloud_key.keyswitch_key.device()
    perf_kw = _perf_kwargs(perf_params)

    def run(tile):
        kw = dict(perf_kw, lane_tile=tile)
        return _linear_bootstrap(
            inputs, jnp.int32(int(const)),
            tuple(jnp.int32(int(c)) for c in coeffs),
            cloud_key.bootstrap_key.device(), ks_arrays,
            mu=_MU, tgsw_params=params.tgsw_params, ks_meta=ks_meta,
            no_keyswitch=no_keyswitch, **kw)

    ra, rb, rcv = _run_with_vmem_fallback(
        run, perf_params, inputs[0][1].shape[0])

    out_size = ra.shape[-1]
    result.a = ra.reshape(shape + (out_size,))
    result.b = rb.reshape(shape)
    result.current_variances = rcv.reshape(shape)
    return result


def _linear_gate(result, source, coeff):
    """result = coeff * source (broadcast); no bootstrap."""
    shape = result.shape
    lwe_size = source.a.shape[-1]
    sa = jnp.broadcast_to(source.a, shape + (lwe_size,))
    sb = jnp.broadcast_to(source.b, shape)
    scv = jnp.broadcast_to(source.current_variances, shape)
    ra, rb, rcv = dlwe.lwe_linear((sa, sb, scv), coeff)
    result.a, result.b, result.current_variances = ra, rb, rcv
    return result


# --- two-input bootstrapped gates ---

def _make_gate2(name, const_num, const_den, ca, cb, doc):
    def gate(cloud_key, result, a, b, perf_params=None):
        check_shape(result, a, b)
        return _bootstrap_gate(
            cloud_key, result, (a, b),
            phase_to_t32(const_num, const_den), (ca, cb),
            perf_params=perf_params)
    gate.__name__ = name
    gate.__doc__ = doc
    return gate


gate_nand = _make_gate2(
    'gate_nand', 1, 8, -1, -1,
    "Bootstrapped NAND: (0,1/8) - a - b.  Reference: nufhe/gates.py:81-121.")
gate_or = _make_gate2(
    'gate_or', 1, 8, 1, 1,
    "Bootstrapped OR: (0,1/8) + a + b.  Reference: nufhe/gates.py:124-163.")
gate_and = _make_gate2(
    'gate_and', -1, 8, 1, 1,
    "Bootstrapped AND: (0,-1/8) + a + b.  Reference: nufhe/gates.py:166-205.")
gate_xor = _make_gate2(
    'gate_xor', 1, 4, 2, 2,
    "Bootstrapped XOR: (0,1/4) + 2a + 2b.  Reference: nufhe/gates.py:208-247.")
gate_xnor = _make_gate2(
    'gate_xnor', -1, 4, -2, -2,
    "Bootstrapped XNOR: (0,-1/4) - 2a - 2b.  Reference: nufhe/gates.py:250-289.")
gate_nor = _make_gate2(
    'gate_nor', -1, 8, -1, -1,
    "Bootstrapped NOR: (0,-1/8) - a - b.  Reference: nufhe/gates.py:390-429.")
gate_andny = _make_gate2(
    'gate_andny', -1, 8, -1, 1,
    "Bootstrapped (not a) and b.  Reference: nufhe/gates.py:432-471.")
gate_andyn = _make_gate2(
    'gate_andyn', -1, 8, 1, -1,
    "Bootstrapped a and (not b).  Reference: nufhe/gates.py:474-513.")
gate_orny = _make_gate2(
    'gate_orny', 1, 8, -1, 1,
    "Bootstrapped (not a) or b.  Reference: nufhe/gates.py:516-555.")
gate_oryn = _make_gate2(
    'gate_oryn', 1, 8, 1, -1,
    "Bootstrapped a or (not b).  Reference: nufhe/gates.py:558-597.")


# --- linear gates ---

def gate_not(cloud_key, result, a, perf_params=None):
    """Homomorphic NOT (negation; not bootstrapped).
    Reference: nufhe/gates.py:292-317."""
    check_shape(result, a)
    return _linear_gate(result, a, -1)


def gate_copy(cloud_key, result, a, perf_params=None):
    """Copy ciphertext (not bootstrapped).  Reference: nufhe/gates.py:320-344."""
    check_shape(result, a)
    return _linear_gate(result, a, 1)


def gate_constant(cloud_key, result, vals, perf_params=None):
    """Trivial (noiseless) encryption of plaintext bits.
    Reference: nufhe/gates.py:352-387."""
    vals = np.asarray(vals)
    mus = bool_to_t32(vals)
    check_shape(result, mus)
    shape = result.shape
    mus_dev = jnp.broadcast_to(jnp.asarray(mus, jnp.int32), shape)
    ra, rb, rcv = dlwe.lwe_noiseless_trivial(
        mus_dev, result.params.size)
    result.a, result.b, result.current_variances = ra, rb, rcv
    return result


# --- MUX ---

@partial(jax.jit, static_argnames=('mu', 'tgsw_params', 'ks_meta',
                                   'use_pallas', 'lane_tile',
                                   'vmem_limit_mb', 'chunk_steps',
                                   'coarse_phase_bits'))
def _mux_kernel(a_in, b_in, c_in, bk_dev, ks_arrays, *, mu, tgsw_params,
                ks_meta, use_pallas=None, lane_tile=None,
                vmem_limit_mb=None, chunk_steps=1, coarse_phase_bits=0):
    and_const = jnp.int32(phase_to_t32(-1, 8))
    mux_const = jnp.int32(phase_to_t32(1, 8))

    aa, ab, acv = a_in
    ba, bb, bcv = b_in
    ca, cb, ccv = c_in

    perf = dict(use_pallas=use_pallas, lane_tile=lane_tile,
                vmem_limit_mb=vmem_limit_mb, chunk_steps=chunk_steps,
                coarse_phase_bits=coarse_phase_bits)
    # The two keyswitch-free bootstraps — u1 = BS((0,-1/8) + a + b) and
    # u2 = BS((0,-1/8) - a + c) — are batch-concatenated into ONE blind
    # rotation over 2B lanes, so MUX keeps the per-lane pipeline efficiency
    # of a binary gate (the reference runs them serially,
    # nufhe/gates.py:638-655).
    bsz = ab.shape[0]
    lwe_a = jnp.concatenate(
        [(aa + ba).astype(jnp.int32), (ca - aa).astype(jnp.int32)], axis=0)
    lwe_b = jnp.concatenate(
        [(and_const + ab + bb).astype(jnp.int32),
         (and_const - ab + cb).astype(jnp.int32)], axis=0)
    ex_a, ex_b, ex_cv = dboot.bootstrap_device(
        lwe_a, lwe_b, bk_dev, ks_arrays, ks_meta, mu, tgsw_params,
        no_keyswitch=True, **perf)

    # (0, 1/8) + u1 + u2 in the extracted space, then a single keyswitch;
    # the summed bootstraps' variance estimates ride into the keyswitch
    ta = (ex_a[:bsz] + ex_a[bsz:]).astype(jnp.int32)
    tb = (mux_const + ex_b[:bsz] + ex_b[bsz:]).astype(jnp.int32)
    tcv = ex_cv[:bsz] + ex_cv[bsz:]
    return dlwe.lwe_keyswitch(ks_arrays, ks_meta, ta, tb, source_cv=tcv)


def gate_mux(cloud_key, result, a, b, c, perf_params=None):
    """Bootstrapped MUX: b if a else c.  Two keyswitch-free bootstraps, a sum
    in the extracted space, one keyswitch.  Reference: nufhe/gates.py:600-664.
    """
    check_shape(result, a, b, c)
    params = cloud_key.params
    lwe_size = params.in_out_params.size
    shape = result.shape

    inputs = tuple(
        _broadcast_flat(src, shape, lwe_size) for src in (a, b, c))
    ks_arrays, ks_meta = cloud_key.keyswitch_key.device()
    perf_kw = _perf_kwargs(perf_params)

    def run(tile):
        kw = dict(perf_kw, lane_tile=tile)
        return _mux_kernel(
            *inputs, cloud_key.bootstrap_key.device(), ks_arrays,
            mu=_MU, tgsw_params=params.tgsw_params, ks_meta=ks_meta, **kw)

    ra, rb, rcv = _run_with_vmem_fallback(
        run, perf_params, inputs[0][1].shape[0])

    out_size = ra.shape[-1]
    result.a = ra.reshape(shape + (out_size,))
    result.b = rb.reshape(shape)
    result.current_variances = rcv.reshape(shape)
    return result
