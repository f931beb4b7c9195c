"""Measure the REFERENCE implementation's RHS throughput on this host.

BASELINE.md's contract: the reference publishes no numbers, so baselines
"must be produced by running the reference itself, then matched". This runs
the reference's own RHS (via the in-process 6-thread lockstep harness,
tools/ref_harness.py) at the canonical configurations and records
grid-points/s into BASELINE_MEASURED.json, which bench.py uses for real
``vs_baseline`` ratios.

Hardware note: the reference targets CPU/CUDA; no CUDA device exists here,
so the baseline is the reference's CPU path on this host (numpy + 6
lockstep workers, one per cubed-sphere panel — its canonical 6-rank run).

Usage: python tools/measure_baseline.py  (writes BASELINE_MEASURED.json)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from ref_harness import _install_fake_modules, run_lockstep  # noqa: E402


def time_sw_rhs(case_number=6, nel_per_tile=10, num_solpts=3, iters=20):
    """Reference SW RHS (rhs/rhs_sw.py) seconds/call, 6 lockstep workers."""
    _install_fake_modules()

    def tile_run(rank):
        from types import SimpleNamespace

        from mpi4py import MPI

        import device as device_mod

        dev = device_mod.CpuDevice(MPI.COMM_WORLD)
        from process_topology import ProcessTopology

        ptopo = ProcessTopology(dev)
        param = SimpleNamespace(
            case_number=case_number, filter_apply=False, expfilter_apply=False,
            apply_sponge=False, dt=60.0, t_end=0.0, matsuno_wave_type="Rossby",
            matsuno_amp=1e-5, num_elements_horizontal=nel_per_tile, num_solpts=num_solpts,
        )
        from geometry.cubed_sphere_2d import CubedSphere2D
        from geometry.metric2d import Metric2D
        from geometry.operators import DFROperators

        geom = CubedSphere2D(nel_per_tile, num_solpts, 0.0, 0.0, 0.0, ptopo, param, dev)
        mtrx = DFROperators(geom, param, dev)
        metric = Metric2D(geom)
        import init.shallow_water_test as swt

        u1, u2, h = swt.williamson_case6(geom, metric, param)
        Q = np.stack([np.asarray(h), np.asarray(h * u1), np.asarray(h * u2)])
        from rhs.rhs_sw import RhsShallowWater

        rhs_fn = RhsShallowWater(Q.shape, geom, mtrx, metric, None, ptopo, num_solpts, nel_per_tile)
        rhs_fn(Q)  # warm-up
        MPI.COMM_WORLD.barrier()
        t0 = time.perf_counter()
        for _ in range(iters):
            rhs_fn(Q)
        MPI.COMM_WORLD.barrier()
        return (time.perf_counter() - t0) / iters

    per_rank = run_lockstep(6, tile_run)
    sec = max(per_rank)  # lockstep: slowest rank sets the pace
    grid_points = 6 * nel_per_tile * nel_per_tile * num_solpts * num_solpts
    return {"seconds_per_rhs": sec, "gridpoints_per_s": grid_points / sec}


def time_euler3d_rhs(case_number=31, nel_h=12, nel_v=3, num_solpts=2, ztop=10000.0, iters=10):
    """Reference 3D Euler RHS (rhs/rhs_dfr.py) seconds/call."""
    _install_fake_modules()

    def tile_run(rank):
        from types import SimpleNamespace

        from mpi4py import MPI

        import device as device_mod

        dev = device_mod.CpuDevice(MPI.COMM_WORLD)
        from process_topology import ProcessTopology

        ptopo = ProcessTopology(dev)
        param = SimpleNamespace(
            case_number=case_number, depth_approx="shallow", filter_apply=False,
            expfilter_apply=False, apply_sponge=False, num_elements_horizontal=nel_h,
            num_elements_vertical=nel_v, num_solpts=num_solpts, ztop=ztop, dt=30.0, t_end=0.0,
        )
        from geometry.cubed_sphere_3d import CubedSphere3D
        from geometry.metric3d import Metric3DTopo
        from geometry.operators import DFROperators

        geom = CubedSphere3D(nel_h, nel_v, num_solpts, 0.0, 0.0, 0.0, ztop, ptopo, param, dev)
        mtrx = DFROperators(geom, param, dev)
        metric = Metric3DTopo(geom, mtrx)
        from init.initialize import initialize_euler

        Q, _topo = initialize_euler(geom, metric, mtrx, param)
        from pde.pde_euler_cubesphere import PDEEulerCubesphere
        from rhs.rhs_dfr import RHSDirecFluxReconstruction_mpi

        pde = PDEEulerCubesphere(geom, param, metric)
        rhs_fn = RHSDirecFluxReconstruction_mpi(pde, geom, mtrx, metric, None, ptopo, param, Q.shape)
        rhs_fn(Q)
        MPI.COMM_WORLD.barrier()
        t0 = time.perf_counter()
        for _ in range(iters):
            rhs_fn(Q)
        MPI.COMM_WORLD.barrier()
        return (time.perf_counter() - t0) / iters

    per_rank = run_lockstep(6, tile_run)
    sec = max(per_rank)
    grid_points = 6 * nel_h * nel_h * nel_v * num_solpts**3
    return {"seconds_per_rhs": sec, "gridpoints_per_s": grid_points / sec}


def time_euler3d_epi2_step(nel_h=12, nel_v=3, num_solpts=2, ztop=10000.0, steps=2):
    """Reference EPI2+KIOPS seconds/step on dcmip31 (the canonical
    exponential configuration, config/dcmip31.ini)."""
    from ref_harness import reference_euler3d_epi_steps

    t0 = time.perf_counter()
    reference_euler3d_epi_steps(31, nel_h, nel_v, num_solpts, ztop, 30.0, steps,
                                order=2, exponential_solver="kiops", tolerance=1e-7)
    sec = (time.perf_counter() - t0) / steps
    return {"seconds_per_step": sec, "steps_per_s": 1.0 / sec}


def time_euler3d_ros2_step(nel_h=12, nel_v=3, num_solpts=2, ztop=10000.0, steps=2):
    """Reference Ros2+FGMRES seconds/step on dcmip31 (the reference's other
    canonical operating mode, tests/rhs_benchmark configs there)."""
    from ref_harness import reference_euler3d_ros2_steps

    t0 = time.perf_counter()
    reference_euler3d_ros2_steps(31, nel_h, nel_v, num_solpts, ztop, 30.0, steps,
                                 tolerance=1e-7, gmres_restart=30)
    sec = (time.perf_counter() - t0) / steps
    return {"seconds_per_step": sec, "steps_per_s": 1.0 / sec}


def time_sw_epi3_step(nel=10, num_solpts=3, steps=10):
    """Reference EPI3+PMEX seconds/step on canonical case6
    (config/case6.ini: epi3 + pmex, dt=1800, tol 1e-7). Marginal timing
    T(1+steps) - T(1) so the model construction AND the first step's
    10-substep Epi2 bootstrap (integrators/epi.py there) cancel."""
    from ref_harness import reference_sw_epi_steps

    run = lambda n: reference_sw_epi_steps(6, nel, num_solpts, 1800.0, n, order=3,
                                           exponential_solver="pmex", tolerance=1e-7)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter()
    run(1 + steps)
    sec = ((time.perf_counter() - t1) - (t1 - t0)) / steps
    return {"seconds_per_step": sec, "steps_per_s": 1.0 / sec}


def time_sw_galewsky_epi3_step(nel=30, num_solpts=3, steps=6):
    """Reference EPI3+PMEX seconds/step at the TRUE galewsky configuration's
    operating point (config/galewsky.ini: nel=30, num_solpts=3, dt=900,
    epi3). The reference's own case-8 initializer is dead code in this
    snapshot (init/shallow_water_test.py:289 indexes `geom.lon` as 2D; the
    geometry only carries the new element-block layout), so the
    measurement uses the case-6 IC on the SAME discretization, integrator,
    dt and tolerance — per-step cost is IC-independent to first order.
    Marginal timing as for case6 (construction + bootstrap cancel)."""
    from ref_harness import reference_sw_epi_steps

    run = lambda n: reference_sw_epi_steps(6, nel, num_solpts, 900.0, n, order=3,
                                           exponential_solver="pmex", tolerance=1e-7)
    t0 = time.perf_counter()
    run(1)
    t1 = time.perf_counter()
    run(1 + steps)
    sec = ((time.perf_counter() - t1) - (t1 - t0)) / steps
    return {"seconds_per_step": sec, "steps_per_s": 1.0 / sec}


def main():
    import platform
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")
    out = {}
    if os.path.exists(path) and "--all" not in sys.argv:
        with open(path) as f:
            out = json.load(f)  # incremental: only measure missing keys

    measurers = {
        "sw_case6_rhs": lambda: time_sw_rhs(6, 10, 3),  # config/case6.ini:28-43
        "sw_case6_rhs_nel64": lambda: time_sw_rhs(6, 64, 3, iters=5),
        "sw_case6_epi3": time_sw_epi3_step,  # end-to-end canonical case6
        "sw_galewsky_epi3": time_sw_galewsky_epi3_step,  # true galewsky.ini
        "euler3d_dcmip31_rhs": lambda: time_euler3d_rhs(31, 12, 3, 2),  # config/dcmip31.ini:58-65
        "euler3d_dcmip31_epi2": lambda: time_euler3d_epi2_step(12, 3, 2),
        "euler3d_dcmip31_ros2": lambda: time_euler3d_ros2_step(12, 3, 2),
    }
    out.setdefault(
        "hardware",
        f"host CPU ({os.cpu_count()} cores, {platform.processor() or 'unknown'}), "
        "6 lockstep workers (one per panel — the reference's canonical 6-rank run)",
    )
    for key, fn in measurers.items():
        if key not in out:
            print(f"measuring {key}...", flush=True)
            out[key] = fn()
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
