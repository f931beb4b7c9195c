"""Benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star metric (BASELINE.md): grid-points/s per chip on the canonical
shallow-water RHS (Williamson case 6 configuration). Measured at the
TPU-native operating point — float32 fields (validated against float64 to
~5e-6 relative over 6 model hours; float64 is emulated ~40x slower on this
chip and remains the default for parity work) — with 100 TVD-RK3 steps fused
into one XLA program via lax.scan so the number reflects device compute,
not per-call dispatch latency over the job tunnel (which is multiple ms
per call on the axon relay and would otherwise dominate). Uses the persistent XLA
compilation cache (.jax_cache), the TPU-native replacement for the
reference's compiled-kernel cache.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_sw_rhs(nel=64, num_solpts=4, dtype=jnp.float32, nsteps=100, reps=5):
    from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
    from wxfactory_tpu.models import make_rhs_shallow_water
    from wxfactory_tpu.ops.dfr import make_dfr_operators
    from wxfactory_tpu.testcases import williamson_case6

    geom = make_cubed_sphere_2d(nel, num_solpts)
    ops = make_dfr_operators(num_solpts)
    metric = make_metric_2d(geom)
    rhs = make_rhs_shallow_water(geom, ops, metric, dtype=dtype)
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)
    # On TPU the builder returns the fused Pallas pipeline; step on its
    # packed layout so the RK combination glue stays relayout-free.
    step_rhs = getattr(rhs, "packed", rhs)
    chained = getattr(rhs, "packed_stage_chained", None)
    packed_run = getattr(rhs, "packed_run", None)
    if hasattr(rhs, "pack"):
        q = rhs.pack(q)
    dt = jnp.asarray(30.0, dtype=dtype)

    if packed_run is not None:
        # Whole-run kernel: every RK stage of every step is one sequential
        # pallas grid with the RK registers, edge slabs and halo results in
        # VMEM scratch for the entire run — steady-state HBM traffic ~zero.
        from wxfactory_tpu.ops.pallas_sw import tvdrk3_abc

        abc = tvdrk3_abc(dt)
        multi_step = jax.jit(lambda q: packed_run(q, nsteps, abc))
    else:
        multi_step = None

    @jax.jit
    def multi_step_stages(q):
        if chained is not None:
            # Chained fused stages: each mega kernel also emits the edge
            # slabs of its output state, so the steady-state loop is exactly
            # one mega kernel + the tiny halo stage per RK stage — the whole
            # spatial operator AND the RK combination stay in VMEM.
            def body(carry, _):
                q, slabs = carry
                q1, sl1 = chained(q, q, slabs, 0.0, 1.0, dt)
                q2, sl2 = chained(q, q1, sl1, 0.75, 0.25, 0.25 * dt)
                return chained(q, q2, sl2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt), None

            return jax.lax.scan(body, (q, rhs.packed_slabs(q)), None, length=nsteps)[0][0]

        def body(q, _):
            q1 = q + step_rhs(q) * dt
            q2 = 0.75 * q + 0.25 * (q1 + step_rhs(q1) * dt)
            return q / 3.0 + 2.0 / 3.0 * (q2 + step_rhs(q2) * dt), None

        return jax.lax.scan(body, q, None, length=nsteps)[0]

    if multi_step is None:
        multi_step = multi_step_stages

    out = multi_step(q)
    out.block_until_ready()

    # Marginal timing: the axon relay adds ~10-20 ms of dispatch latency per
    # Python->device call; timing (1+reps) calls minus 1 call cancels that
    # constant so the rate reflects device compute.
    t0 = time.perf_counter()
    multi_step(q).block_until_ready()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + reps):
        out = multi_step(q)
    out.block_until_ready()
    t2 = time.perf_counter() - t0
    elapsed = max(t2 - t1, 1e-9)

    grid_points = 6 * nel * nel * num_solpts**2
    num_rhs = reps * nsteps * 3
    return grid_points * num_rhs / elapsed


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
