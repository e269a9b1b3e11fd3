"""Ripple vs Kogge-Stone crossover sweep (round-3 verdict item 8).

Measures encrypted addition latency for both circuit families over a
(batch x width) grid on the current backend and writes
``ADDER_CROSSOVER_r04.json``.  The result table calibrates the
``parallel=None`` auto-selection in ``models/integer.py``.

Usage: python tools/adder_crossover.py [batches] [widths]
       python tools/adder_crossover.py 128,512,2048 8,16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from microbench import sync_overhead  # noqa: E402


def main(batches, widths):
    import nufhe_tpu as nf
    from nufhe_tpu.models.integer import (
        uint_add, uintarray_to_bitarray, bitarray_to_uintarray)

    rng = nf.DeterministicRNG(5)
    print("keygen...", flush=True)
    secret, cloud = nf.make_key_pair(rng)
    ov = sync_overhead()

    results = {"device": None, "grid": []}
    import jax
    results["device"] = str(jax.devices()[0])

    for width in widths:
        for batch in batches:
            rs = np.random.RandomState(batch * 31 + width)
            a_bits = rs.randint(0, 2, (batch, width)) != 0
            b_bits = rs.randint(0, 2, (batch, width)) != 0
            ca = nf.encrypt(rng, secret, a_bits)
            cb = nf.encrypt(rng, secret, b_bits)
            ans = nf.empty_ciphertext(cloud.params, ca.shape)
            expect = (bitarray_to_uintarray(a_bits).astype(np.int64)
                      + bitarray_to_uintarray(b_bits)) % (1 << width)

            entry = {"batch": batch, "width": width}
            for parallel, name in ((False, "ripple"), (True, "kogge_stone")):
                uint_add(cloud, ans, ca, cb, parallel=parallel)  # warm
                np.asarray(ans.b)
                ok = bool(np.array_equal(
                    bitarray_to_uintarray(nf.decrypt(secret, ans))
                    .astype(np.int64),
                    expect))
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    uint_add(cloud, ans, ca, cb, parallel=parallel)
                    np.asarray(ans.b)
                    best = min(best, time.time() - t0 - ov)
                entry[name + "_ms"] = round(best * 1e3, 2)
                entry[name + "_ok"] = ok
                print(f"B={batch:6d} w={width:2d} {name:12s}: "
                      f"{best*1e3:9.1f} ms  ok={ok}", flush=True)
            entry["winner"] = ("kogge_stone"
                               if entry["kogge_stone_ms"] < entry["ripple_ms"]
                               else "ripple")
            results["grid"].append(entry)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ADDER_CROSSOVER_r04.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    batches = [int(x) for x in
               (sys.argv[1] if len(sys.argv) > 1 else "128,1024,4096").split(",")]
    widths = [int(x) for x in
              (sys.argv[2] if len(sys.argv) > 2 else "8,16").split(",")]
    main(batches, widths)
