"""Performance configuration.

The reference's ``PerformanceParameters`` (``nufhe/performance.py``) tunes
CUDA kernel shapes (transforms per block, constant memory, PTX variants).
The TPU equivalents are different knobs: whether the fused Pallas bootstrap
kernel is used instead of the XLA-composed path, the batch tile processed
per kernel instance, and the MAC matmul dtype.  As in the reference, a
device-independent ``PerformanceParameters`` is specialized with
``for_device()`` into a ``PerformanceParametersForDevice``.
"""


class PerformanceParameters:

    def __init__(self, nufhe_params=None,
                 single_kernel_bootstrap=None,
                 batch_tile=None):
        """
        :param single_kernel_bootstrap: use the fused Pallas blind-rotate
            kernel (``None`` = auto: enabled on TPU when supported).
        :param batch_tile: ciphertext batch tile per kernel instance
            (``None`` = auto).
        """
        self.nufhe_params = nufhe_params
        self.single_kernel_bootstrap = single_kernel_bootstrap
        self.batch_tile = batch_tile

    def for_device(self, device=None):
        return PerformanceParametersForDevice(self, device)

    def __hash__(self):
        return hash((self.__class__, self.single_kernel_bootstrap,
                     self.batch_tile))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.single_kernel_bootstrap == other.single_kernel_bootstrap
                and self.batch_tile == other.batch_tile)


class PerformanceParametersForDevice:

    def __init__(self, perf_params: PerformanceParameters, device=None):
        import jax
        if device is None:
            device = jax.devices()[0]
        platform = getattr(device, "platform", "cpu")
        on_tpu = platform == "tpu"

        skb = perf_params.single_kernel_bootstrap
        if skb is None:
            skb = on_tpu  # fused Pallas step kernel (rows engine)
        self.single_kernel_bootstrap = skb
        self.batch_tile = perf_params.batch_tile
        self.platform = platform

    def __hash__(self):
        return hash((self.__class__, self.single_kernel_bootstrap,
                     self.batch_tile, self.platform))

    def __eq__(self, other):
        return (self.__class__ == other.__class__
                and self.single_kernel_bootstrap == other.single_kernel_bootstrap
                and self.batch_tile == other.batch_tile
                and self.platform == other.platform)
