"""Ciphertext arrays.

``LweSampleArray`` is the user-facing ciphertext object (reference:
``nufhe/lwe.py:135-251``): an array of LWE samples with a numpy-style
``shape``, supporting views, item assignment, roll, concatenation and
serialization.  Internally it is a pytree of jax arrays
(``a: shape+(n,) int32``, ``b: shape int32``, ``current_variances: shape
float32``) so whole ciphertexts flow through jit'd functions directly.
"""

import io

import numpy as np
import jax.numpy as jnp

from .numeric import Torus32, ErrorFloat
from .params import LweParams
from . import serialization
from .utils import arrays_equal


class LweSampleArray:
    """A ciphertext object: an array of LWE samples.

    .. attribute:: shape

        Batch shape of the underlying plaintext (one LWE sample per entry).
    """

    def __init__(self, params: LweParams, a, b, current_variances):
        if a.shape[:-1] != b.shape or b.shape != current_variances.shape:
            raise ValueError(
                "Inconsistent shapes: {a}, {b}, {cv}".format(
                    a=a.shape, b=b.shape, cv=current_variances.shape))
        self.params = params
        self.a = a
        self.b = b
        self.current_variances = current_variances

    @classmethod
    def empty(cls, params: LweParams, shape):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(shape)
        return cls(
            params,
            jnp.zeros(shape + (params.size,), Torus32),
            jnp.zeros(shape, Torus32),
            jnp.zeros(shape, ErrorFloat))

    @property
    def shape(self):
        return self.b.shape

    def _normalize_index(self, index):
        """Resolve Ellipsis against the *message* shape so that indexing
        never touches the trailing LWE axis of ``a``."""
        if not isinstance(index, tuple):
            index = (index,)
        if any(ix is Ellipsis for ix in index):
            pos = index.index(Ellipsis)
            specified = sum(
                1 for ix in index if ix is not Ellipsis and ix is not None)
            fill = len(self.shape) - specified
            index = index[:pos] + (slice(None),) * fill + index[pos + 1:]
        return index

    def __getitem__(self, index):
        """A view over the ciphertext (indexes the message shape)."""
        index = self._normalize_index(index)
        return LweSampleArray(
            self.params, self.a[index], self.b[index],
            self.current_variances[index])

    def __setitem__(self, index, value):
        if not isinstance(value, LweSampleArray):
            raise ValueError(
                "can only assign another LweSampleArray into a ciphertext "
                "view, got %r" % (type(value),))
        index = self._normalize_index(index)
        self.a = self.a.at[index].set(value.a)
        self.b = self.b.at[index].set(value.b)
        self.current_variances = self.current_variances.at[index].set(
            value.current_variances)

    def copy(self):
        return LweSampleArray(
            self.params, jnp.array(self.a), jnp.array(self.b),
            jnp.array(self.current_variances))

    def broadcast_to(self, shape):
        """A read-only broadcast view with the given message shape
        (numpy broadcasting rules; the LWE axis is untouched)."""
        shape = tuple(shape)
        return LweSampleArray(
            self.params,
            jnp.broadcast_to(self.a, shape + (self.params.size,)),
            jnp.broadcast_to(self.b, shape),
            jnp.broadcast_to(self.current_variances, shape))

    def roll(self, shift, axis=-1):
        """Cyclically shift encrypted bits along ``axis``, in place.

        Equivalent to ``numpy.roll`` (reference: ``nufhe/lwe.py:188-205``).
        """
        axis = axis % len(self.shape)
        self.a = jnp.roll(self.a, shift, axis=axis)
        self.b = jnp.roll(self.b, shift, axis=axis)
        self.current_variances = jnp.roll(
            self.current_variances, shift, axis=axis)

    # --- serialization ---

    def dump(self, file_obj):
        serialization.dump(
            file_obj,
            {"kind": "LweSampleArray",
             "params": [self.params.size, self.params.min_noise,
                        self.params.max_noise]},
            {"a": np.asarray(self.a), "b": np.asarray(self.b),
             "cv": np.asarray(self.current_variances)})

    def dumps(self):
        buf = io.BytesIO()
        self.dump(buf)
        return buf.getvalue()

    @classmethod
    def load(cls, file_obj):
        meta, arrays = serialization.load(file_obj)
        assert meta["kind"] == "LweSampleArray"
        size, min_noise, max_noise = meta["params"]
        params = LweParams(int(size), float(min_noise), float(max_noise))
        return cls(params, jnp.asarray(arrays["a"]), jnp.asarray(arrays["b"]),
                   jnp.asarray(arrays["cv"]))

    @classmethod
    def loads(cls, s: bytes):
        return cls.load(io.BytesIO(s))

    def __eq__(self, other):
        return (
            self.__class__ == other.__class__
            and self.params == other.params
            and arrays_equal(self.a, other.a)
            and arrays_equal(self.b, other.b)
            and arrays_equal(self.current_variances, other.current_variances))


def concatenate(lwe_sample_arrays, axis=0, out=None):
    """Concatenate ciphertext arrays along ``axis``
    (reference: ``nufhe/lwe.py:425-447``)."""
    if len(lwe_sample_arrays) == 0:
        raise ValueError("concatenate() requires a non-empty ciphertext list")
    params = lwe_sample_arrays[0].params
    a = jnp.concatenate([c.a for c in lwe_sample_arrays], axis=axis)
    b = jnp.concatenate([c.b for c in lwe_sample_arrays], axis=axis)
    cv = jnp.concatenate(
        [c.current_variances for c in lwe_sample_arrays], axis=axis)
    if out is None:
        return LweSampleArray(params, a, b, cv)
    out.a, out.b, out.current_variances = a, b, cv
    return out
