"""Prove the tensor-parallel code paths compile and run through
Mosaic/XLA:TPU on REAL hardware (a 1-device mesh exercises the identical
shard_map + psum / all_gather program; multi-chip hardware is not
available on this rig).

Runs the limbs-sharded (per-step psum) and slots-sharded (per-step
all_gather) bootstrap through ``parallel.mesh.sharded_bootstrap_fn`` on the
axon chip, checks decryption correctness of a NAND against plaintext, and
writes ``TP_r05.json`` (override with NUFHE_TP_OUT).  Since round 5 the
limbs mode rides the rows engine (``ops/bootstrap.blind_rotate``), closing
the 14x limbs-vs-slots gap TP_r04 recorded.

Usage: python tools/run_tp.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=1024):
    import jax
    import jax.numpy as jnp
    import nufhe_tpu as nf
    from nufhe_tpu.models.gates import _MU
    from nufhe_tpu.parallel import mesh as pmesh

    dev = jax.devices()[0]
    rng = nf.DeterministicRNG(7)
    secret, cloud = nf.make_key_pair(rng)
    bk_dev = cloud.bootstrap_key.device()
    ks_arrays, ks_meta = cloud.keyswitch_key.device()
    params = cloud.params
    tgsw_params = params.tgsw_params

    rs = np.random.RandomState(3)
    bits_a = rs.randint(0, 2, batch).astype(bool)
    bits_b = rs.randint(0, 2, batch).astype(bool)
    ca = nf.encrypt(rng, secret, bits_a)
    cb = nf.encrypt(rng, secret, bits_b)

    # NAND linear part: (0, 1/8) - a - b
    lin_a = (-(np.asarray(ca.a) + np.asarray(cb.a))).astype(np.int32)
    lin_b = (np.int32(_MU) - (np.asarray(ca.b) + np.asarray(cb.b))
             ).astype(np.int32)
    expect = ~(bits_a & bits_b)

    results = {"device": str(dev), "batch": batch, "modes": {}}
    for mode in ("limbs", "slots"):
        mesh = pmesh.make_mesh(n_data=1, n_model=1)
        fn = pmesh.sharded_bootstrap_fn(
            mesh, ks_meta, int(_MU), tgsw_params, mode=mode,
            force_tp=True)
        bk_sharded = pmesh.shard_bootstrap_key(bk_dev, mesh, mode=mode)
        la = jnp.asarray(lin_a)
        lb = jnp.asarray(lin_b)
        t0 = time.time()
        a, b, cv = fn(la, lb, bk_sharded, ks_arrays)
        np.asarray(b[0])
        compile_and_first_run_s = time.time() - t0
        t0 = time.time()
        a, b, cv = fn(la, lb, bk_sharded, ks_arrays)
        np.asarray(b[0])
        run_s = time.time() - t0
        phase = (np.asarray(b).astype(np.int64)
                 - (np.asarray(a).astype(np.int64)
                    * secret.lwe_key.key[None, :]).sum(1)) % 2**32
        got = np.asarray(phase.astype(np.uint32).view(np.int32)) > 0
        ok = bool(np.array_equal(got, expect))
        results["modes"][mode] = {
            "ok": ok,
            "compile_and_first_run_s": round(compile_and_first_run_s, 2),
            "run_s": round(run_s, 4),
            "ms_per_bit": round(run_s / batch * 1000, 4),
        }
        print(json.dumps({mode: results["modes"][mode]}), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        os.environ.get("NUFHE_TP_OUT", "TP_r05.json"))
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
