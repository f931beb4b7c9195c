"""Benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metric (BASELINE.md): grid-points/s per chip on the canonical RHS.
Currently measures the 2D Cartesian Euler DFR RHS (gaussian_bubble lab) at a
production-like size; will switch to case6/dcmip31 once the cubed-sphere
models land.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def main():
    from wxfactory_tpu.geometry.cartesian import make_cartesian_2d
    from wxfactory_tpu.models.euler_cartesian import make_rhs_euler_cartesian
    from wxfactory_tpu.ops.dfr import make_dfr_operators
    from wxfactory_tpu.testcases.cartesian import initialize_cartesian2d

    num_solpts = 4
    nel = 64  # 64x64 elements x 16 solpts = 65536 grid points, 4 vars
    geom = make_cartesian_2d((0.0, 1000.0), (0.0, 1500.0), nel, nel, num_solpts)
    ops = make_dfr_operators(num_solpts)
    rhs = jax.jit(make_rhs_euler_cartesian(geom, ops))
    q = jnp.asarray(initialize_cartesian2d(geom, 2))

    # warmup / compile
    out = rhs(q)
    out.block_until_ready()

    n_iter = 50
    t0 = time.perf_counter()
    for _ in range(n_iter):
        q_out = rhs(q)
    q_out.block_until_ready()
    elapsed = time.perf_counter() - t0

    grid_points = nel * nel * num_solpts**2
    gps = grid_points * n_iter / elapsed

    print(
        json.dumps(
            {
                "metric": "euler2d_rhs_gridpoints_per_s",
                "value": gps,
                "unit": "gridpoints/s",
                "vs_baseline": 1.0,  # reference publishes no numbers (BASELINE.md)
            }
        )
    )


if __name__ == "__main__":
    main()
