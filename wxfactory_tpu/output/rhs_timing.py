"""Per-stage RHS timing probes for PRODUCTION runs.

Capability parity with the reference's in-RHS stage timers
(rhs/rhs.py:77-118 + print_times :190-213, persisted per step to the
solver-stats ``rhs_timing`` table, output/solver_stats.py:160 there). Under
XLA the production RHS is ONE fused program — there is no sound way to read
per-stage wall times out of it — so stages are timed as separately-jitted
partial programs, sampled every ``rhs_timing_freq`` steps of a real run and
written to the same table (the fused total is also recorded; it is the
number that matters). jax.profiler traces (CLI ``--jax-trace``) give the
full in-program op breakdown when more detail is needed.
"""

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def _timer(fn, reps: int = 3) -> float:
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_stage_probes(geom, ops, topology, rhs, q0, equations: str) -> Dict[str, Callable]:
    """Zero-arg jitted probes per RHS stage, closed over a representative
    state. Stage names mirror the reference's timing rows (extrapolation /
    comm / interior derivative / full)."""
    q0 = jnp.asarray(q0)
    probes: Dict[str, Callable] = {}
    full = jax.jit(rhs)
    probes["full_rhs(fused)"] = lambda: full(q0)

    if topology is None:
        return probes

    import numpy as np

    if equations == "shallow_water":
        ex = jnp.asarray(np.asarray(ops.extrap_x))
        ey = jnp.asarray(np.asarray(ops.extrap_z))
        dx = jnp.asarray(np.asarray(ops.derivative_x))
        dy = jnp.asarray(np.asarray(ops.derivative_z))
        extrap = jax.jit(lambda q: (q @ ex, q @ ey))
        deriv = jax.jit(lambda q: (q @ dx, q @ dy))
        itf_x, itf_y = extrap(q0)
        halo = jax.jit(lambda ix, iy: topology.halo_scalars(ix[0], iy[0]))
        probes["extrapolation"] = lambda: extrap(q0)
        probes["interior_derivative"] = lambda: deriv(q0)
        probes["halo_exchange"] = lambda: halo(itf_x, itf_y)
    elif equations == "euler":
        s = ops.num_solpts
        ss = s * s
        EE = jnp.asarray(
            np.concatenate(
                [np.asarray(ops.extrap_x3), np.asarray(ops.extrap_y3), np.asarray(ops.extrap_z3)],
                axis=1,
            )
        )
        DD = jnp.asarray(np.asarray(ops.derivative_x3))
        extrap = jax.jit(lambda q: q @ EE)
        deriv = jax.jit(lambda q: q @ DD)
        itf = extrap(q0)
        itf_i = itf[..., : 2 * ss]
        itf_j = itf[..., 2 * ss : 4 * ss]
        from ..models.euler_cubesphere import IDX_RHO_U1, IDX_RHO_U2

        halo = jax.jit(
            lambda qi, qj: topology.halo_state_3d(qi, qj, (IDX_RHO_U1, IDX_RHO_U2))
        )
        probes["extrapolation"] = lambda: extrap(q0)
        probes["interior_derivative"] = lambda: deriv(q0)
        probes["halo_exchange"] = lambda: halo(itf_i, itf_j)
    return probes


def sample(probes: Dict[str, Callable], reps: int = 3) -> Dict[str, float]:
    """Time every probe; returns {stage: seconds}."""
    return {name: _timer(fn, reps) for name, fn in probes.items()}
