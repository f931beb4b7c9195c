"""Per-stage RHS timing benchmark.

Capability parity with the reference's tests/rhs_benchmark suite (run.sh +
base.job): sweep num_solpts at ~constant DOF, time the RHS stages, store
rows into the solver-stats SQLite `rhs_timing` table.

The reference times stages inside one RHS call with device timestamps
(rhs/rhs.py:77-118). Under XLA the full RHS is one fused program, so stages
are timed as separately-jitted partial programs (the fused total is also
reported — the number that matters); stage times measure the unfused cost
and include one dispatch latency each.

Usage:
    python -m wxfactory_tpu.benchmarks.rhs_benchmark --model sw \
        --solpts 2 3 4 5 6 --dof 900000 [--dtype f32] [--db rhs.db]
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp


def time_fn(fn, args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_sw(num_solpts: int, dof: int, dtype):
    from ..geometry import make_cubed_sphere_2d, make_metric_2d
    from ..models import make_rhs_shallow_water
    from ..ops.dfr import make_dfr_operators
    from ..testcases import williamson_case6

    nel = max(2, round(math.sqrt(dof / (6 * num_solpts**2))))
    geom = make_cubed_sphere_2d(nel, num_solpts)
    ops = make_dfr_operators(num_solpts)
    metric = make_metric_2d(geom)
    rhs = jax.jit(make_rhs_shallow_water(geom, ops, metric, dtype=dtype))
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)

    ex = jnp.asarray(ops.extrap_x, dtype=dtype)
    ey = jnp.asarray(ops.extrap_z, dtype=dtype)
    dx = jnp.asarray(ops.derivative_x, dtype=dtype)
    dy = jnp.asarray(ops.derivative_z, dtype=dtype)

    from ..parallel.topology import CubedSphereTopology

    topo = CubedSphereTopology(geom)

    extrap = jax.jit(lambda q: (q @ ex, q @ ey))
    deriv = jax.jit(lambda q: (q @ dx, q @ dy))
    itf_x, itf_y = extrap(q)
    halo = jax.jit(lambda ix, iy: topo.halo_scalars(ix[0], iy[0]))

    stages = {
        "full_rhs(fused)": time_fn(rhs, (q,)),
        "extrapolation": time_fn(extrap, (q,)),
        "interior_derivative": time_fn(deriv, (q,)),
        "halo_exchange": time_fn(halo, (itf_x, itf_y)),
    }
    return nel, 6 * nel * nel * num_solpts**2, stages


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="sw", choices=["sw"])
    p.add_argument("--solpts", type=int, nargs="+", default=[2, 3, 4, 5, 6])
    p.add_argument("--dof", type=int, default=900_000)
    p.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    p.add_argument("--db", default=None, help="Write rows into this solver-stats DB")
    args = p.parse_args(argv)

    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    rows = []
    for s in args.solpts:
        nel, pts, stages = bench_sw(s, args.dof, dtype)
        total = stages["full_rhs(fused)"]
        print(f"num_solpts={s} nel={nel} ({pts} pts): full {total*1e3:.3f} ms "
              f"({pts/total:.3e} pts/s)")
        for name, t in stages.items():
            print(f"    {name:22s}: {t*1e3:8.3f} ms")
            rows.append((s, name, t))

    if args.db:
        import sqlite3

        db = sqlite3.connect(args.db)
        db.execute("CREATE TABLE IF NOT EXISTS rhs_timing (run_id INTEGER, step_id INTEGER, stage TEXT, elapsed REAL)")
        db.executemany("INSERT INTO rhs_timing VALUES (0, ?, ?, ?)", rows)
        db.commit()
        print(f"Wrote {len(rows)} rows to {args.db}")


if __name__ == "__main__":
    main()
