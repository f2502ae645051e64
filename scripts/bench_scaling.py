"""Multi-device scaling benchmark (BASELINE.json config 5).

Weak scaling of the sharded gate bootstrap: fixed per-device batch, mesh
grown over the dp axis; efficiency(n) = t(1) / t(n) (ideal weak scaling
keeps wall time flat).  On a real pod slice this exercises ICI/DCN; on this
machine it can also run on the virtual CPU mesh (--platform cpu
--virtual-devices 8) to validate the harness and the sharded program, where
times reflect host-core contention, not interconnect.

Emits one JSON line with per-mesh-size timings and efficiencies.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="toy")
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--n-tp", type=int, default=1)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="force N virtual CPU devices (sets XLA_FLAGS; must "
                         "be first JAX use in the process)")
    args = ap.parse_args(argv)

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        ).strip()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from peba1_tpu import gates, keys
    from peba1_tpu.params import PRESETS
    from peba1_tpu.parallel import mesh as pmesh
    from peba1_tpu.parallel import shard as pshard

    p = PRESETS[args.params]
    sk, ck = jax.jit(keys.keygen, static_argnames=("params",))(
        jax.random.PRNGKey(0), params=p)
    np.asarray(ck.ks_table_limbs[0, :4])

    sizes = [int(s) for s in args.sizes.split(",")]
    devices = jax.devices()
    rng = np.random.default_rng(0)
    times = {}
    for n in sizes:
        if n * args.n_tp > len(devices):
            print(f"skip n={n}: only {len(devices)} devices", file=sys.stderr)
            continue
        m = pmesh.make_mesh(n_dp=n, n_tp=args.n_tp, devices=devices)
        batch = args.per_device_batch * n
        bits = jnp.asarray(rng.integers(0, 2, batch))
        ct = gates.encrypt_bits(jax.random.PRNGKey(n), sk, bits)
        # warm/compile for this mesh shape
        out = pshard.sharded_bootstrap(m, ck, ct, jnp.int32(gates.MU_1_8))
        np.asarray(out.b[:4])
        # timed, fresh inputs
        ct = gates.encrypt_bits(jax.random.PRNGKey(100 + n), sk, bits)
        np.asarray(ct.b[:4])
        t0 = time.time()
        out = pshard.sharded_bootstrap(m, ck, ct, jnp.int32(gates.MU_1_8))
        np.asarray(out.b[:8])
        times[n] = time.time() - t0
        got = np.asarray(gates.decrypt_bits(out, sk))
        assert (got == np.asarray(bits)).all(), f"wrong bits at n={n}"
        print(f"n={n}: {times[n]:.3f}s (batch {batch})", file=sys.stderr, flush=True)

    base = times[min(times)]
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "unit": "t1/tn (1.0 = ideal)",
        "per_device_batch": args.per_device_batch,
        "params": args.params,
        "times_s": {str(k): round(v, 4) for k, v in times.items()},
        "efficiency": {str(k): round(base / v, 4) for k, v in times.items()},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
