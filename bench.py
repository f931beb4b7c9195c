"""Benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metric (BASELINE.md): grid-points/s per chip on the canonical
RHS. Benchmarks the cubed-sphere shallow-water RHS (Williamson case 6
configuration, float64 — the reference's working precision) on the real
chip. Uses a persistent XLA compilation cache (.jax_cache) — the TPU-native
replacement for the reference's compiled-kernel cache — so repeat runs skip
the (slow, ~400 s over the axon tunnel) first compile.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_sw_rhs(nel=32, num_solpts=4, dtype=jnp.float64, n_iter=50):
    from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
    from wxfactory_tpu.models import make_rhs_shallow_water
    from wxfactory_tpu.ops.dfr import make_dfr_operators
    from wxfactory_tpu.testcases import williamson_case6

    geom = make_cubed_sphere_2d(nel, num_solpts)
    ops = make_dfr_operators(num_solpts)
    metric = make_metric_2d(geom)
    rhs = jax.jit(make_rhs_shallow_water(geom, ops, metric, dtype=dtype))
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)

    out = rhs(q)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = rhs(q)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    grid_points = 6 * nel * nel * num_solpts**2
    return grid_points * n_iter / elapsed


def main():
    gps = bench_sw_rhs()
    print(
        json.dumps(
            {
                "metric": "sw_case6_rhs_gridpoints_per_s",
                "value": gps,
                "unit": "gridpoints/s",
                "vs_baseline": 1.0,  # reference publishes no numbers (BASELINE.md)
            }
        )
    )


if __name__ == "__main__":
    main()
