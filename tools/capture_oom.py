"""Capture a REAL Mosaic out-of-VMEM compile error message (round-3 verdict
item 9): the exact engine at lane tile 2048 is known to exceed the 128 MB
scoped VMEM on v5e.  The captured text pins the ``_looks_like_vmem_oom``
matcher test against reality instead of a fabricated message.

Usage: python tools/capture_oom.py [lane_tile]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from microbench import _setup  # noqa: E402


def main(lane_tile=2048):
    from nufhe_tpu.ops import transform as dt
    from nufhe_tpu.ops.pallas import blind_rotate as pbr
    from nufhe_tpu.models.gates import _looks_like_vmem_oom

    batch = lane_tile
    tp, re_, acc, powers, row = _setup(batch, exact=True)
    step = pbr.make_external_step_rows(
        2, tp.decomp_length, tp.bs_log2_base, int(tp.offset),
        lane_tile=lane_tile, mac_dtype=dt.mac_dtype(),
        vmem_limit_mb=128)
    f = jax.jit(lambda a: step(a, powers, row))
    try:
        np.asarray(f(acc))
        print("NO OOM at lane_tile", lane_tile)
    except Exception as exc:  # noqa: BLE001
        text = str(exc)
        print("exception type:", type(exc).__name__)
        print("matched by _looks_like_vmem_oom:", _looks_like_vmem_oom(exc))
        print("---- first 2000 chars ----")
        print(text[:2000])
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "data",
            "mosaic_oom_message.txt")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            fh.write(text[:4000])
        print("wrote", out)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
