"""Low-synchronization Krylov benchmark runner on the stiff-PDE lab.

Capability parity with the reference's tests/lowsync_benchmark/main_*.py:
run (integrator x orthogonalization) combinations on the Allen-Cahn / ADR /
Burgers / porous-medium problems and report wall time. Usage:

    python -m wxfactory_tpu.stiff_pdes.benchmark ac epi4 icwy_ne \
        --grid 2002 --dt 0.001 --t-end 0.02
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp

from ..integrators import Epi, Srerk
from .problems import initial_condition, make_adr, make_allen_cahn, make_burgers, make_porous_medium

PROBLEMS = {
    "ac": lambda n: make_allen_cahn(num_points=n),
    "adr": lambda n: make_adr(num_points=n),
    "burg": lambda n: make_burgers(num_points=n),
    "por": lambda n: make_porous_medium(num_points=n),
}


def run(problem: str, method: str, ortho: str, grid: int, dt: float, t_end: float,
        tolerance: float = 1e-10, verbose: bool = True) -> float:
    rhs = PROBLEMS[problem](grid)
    q = jnp.asarray(initial_condition(grid))

    order = int(method[-1])
    if method.startswith("srerk"):
        stepper = Srerk(rhs, order, exponential_solver=ortho, tolerance=tolerance)
    elif method.startswith("epi"):
        stepper = Epi(rhs, order, exponential_solver=ortho, tolerance=tolerance, init_substeps=10)
    else:
        raise ValueError(f"method must be epi<order> or srerk<order>, got {method}")

    total_steps = math.ceil(t_end / dt)
    t0 = time.time()
    t = 0.0
    for step in range(total_steps):
        step_dt = min(dt, t_end - t)
        q = stepper.step(q, step_dt)
        t += step_dt
        if verbose:
            print(f"Step {step + 1}/{total_steps}", flush=True)
    elapsed = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(q))), "solution blew up"
    if verbose:
        print(f"{problem} {method}+{ortho} grid={grid} dt={dt}: {elapsed:.3f} s")
    return elapsed


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("problem", choices=sorted(PROBLEMS))
    p.add_argument("method", help="epi<order> or srerk<order>")
    p.add_argument("ortho", help="kiops, pmex, icwy_ne, cwy_1s, dcgs2, ...")
    p.add_argument("--grid", type=int, default=202)
    p.add_argument("--dt", type=float, default=0.001)
    p.add_argument("--t-end", type=float, default=0.02)
    p.add_argument("--tolerance", type=float, default=1e-10)
    args = p.parse_args(argv)
    run(args.problem, args.method, args.ortho, args.grid, args.dt, args.t_end, args.tolerance)


if __name__ == "__main__":
    main()
