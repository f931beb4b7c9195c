"""Weak-scaling benchmark: grid-points/s at constant per-device load.

The BASELINE.md north star: weak-scaling efficiency of the shallow-water
RHS from 1 device to a full mesh (target >= 80%). The state is sharded over
the (panel, y, x) element axes; halo gathers become ICI collectives under
GSPMD. On a CPU host this exercises the virtual-device path
(XLA_FLAGS=--xla_force_host_platform_device_count=N); on a TPU slice it
measures the real fabric.

Usage:
    python -m wxfactory_tpu.benchmarks.weak_scaling --base-nel 16 --steps 10
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_shape(n: int):
    p = math.gcd(n, 6)
    rest = n // p
    y = int(math.sqrt(rest))
    while rest % y:
        y -= 1
    return p, y, rest // y


def run_one(devices, base_nel: int, num_solpts: int, nsteps: int, dtype):
    from ..geometry import make_cubed_sphere_2d, make_metric_2d
    from ..models import make_rhs_shallow_water
    from ..ops.dfr import make_dfr_operators
    from ..testcases import williamson_case6

    n = len(devices)
    p, y, x = mesh_shape(n)
    # Constant load per device: scale the element grid with the mesh.
    nel = base_nel * max(y, x)
    geom = make_cubed_sphere_2d(nel, num_solpts)
    ops = make_dfr_operators(num_solpts)
    metric = make_metric_2d(geom)
    rhs = make_rhs_shallow_water(geom, ops, metric, dtype=dtype)
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)
    dt = jnp.asarray(30.0, dtype=dtype)

    mesh = Mesh(np.array(devices).reshape(p, y, x), axis_names=("panel", "y", "x"))
    sharding = NamedSharding(mesh, P(None, "panel", "y", "x", None))
    q = jax.device_put(q, sharding)

    @jax.jit
    def multi_step(q):
        def body(q, _):
            q1 = q + rhs(q) * dt
            q2 = 0.75 * q + 0.25 * (q1 + rhs(q1) * dt)
            return q / 3.0 + 2.0 / 3.0 * (q2 + rhs(q2) * dt), None

        return jax.lax.scan(body, q, None, length=nsteps)[0]

    out = multi_step(q)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = multi_step(q)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    pts = 6 * nel * nel * num_solpts**2
    return pts * nsteps * 3 / elapsed, pts


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--base-nel", type=int, default=16)
    parser.add_argument("--num-solpts", type=int, default=4)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--dtype", default="f32", choices=["f32", "f64"])
    parser.add_argument("--device-counts", type=int, nargs="*", default=None)
    args = parser.parse_args(argv)

    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    all_devices = jax.devices()
    counts = args.device_counts or sorted({1, 2, min(4, len(all_devices)), min(6, len(all_devices)),
                                           len(all_devices)})
    counts = [c for c in counts if c <= len(all_devices)]

    base_rate = None
    for n in counts:
        rate, pts = run_one(all_devices[:n], args.base_nel, args.num_solpts, args.steps, dtype)
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate * 100.0
        print(f"devices={n:3d} mesh={mesh_shape(n)} points={pts:9d}: "
              f"{rate:.3e} pts/s total, {per_dev:.3e}/dev, efficiency {eff:5.1f}%")


if __name__ == "__main__":
    main()
