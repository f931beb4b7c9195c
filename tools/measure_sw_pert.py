"""Measure the f32 accuracy of the perturbation-form SW RHS vs the absolute
form, against on-chip f64 truth, at Williamson case 6 (canonical shapes).

State under test: the IC advanced `NSTEP` f64 TVD-RK3 steps (dt=1800) — the
honest operating condition for a base-state refreshed every few steps.
"""

import sys

import os

import jax

if os.environ.get("WXF_MM", ""):
    jax.config.update("jax_default_matmul_precision", os.environ["WXF_MM"])
import jax.numpy as jnp
import numpy as np

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6

NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def run(nel, s, dt=300.0):
    geom = make_cubed_sphere_2d(num_elements=nel, num_solpts=s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    rhs64 = jax.jit(make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="xla"))
    q0 = jnp.asarray(williamson_case6(geom), jnp.float64)

    def rk3(q):
        k1 = q + dt * rhs64(q)
        k2 = 0.75 * q + 0.25 * (k1 + dt * rhs64(k1))
        return q / 3.0 + 2.0 / 3.0 * (k2 + dt * rhs64(k2))

    qt = q0
    for _ in range(NSTEP):
        qt = rk3(qt)
    truth = np.asarray(rhs64(qt), np.float64)
    scale = np.abs(truth).reshape(3, -1).max(axis=1)
    dq64 = qt - q0
    print(f"nel={nel} s={s} steps={NSTEP}  |dq|/|q| per var:",
          [float(np.abs(np.asarray(dq64[v])).max() / np.abs(np.asarray(q0[v])).max()) for v in range(3)])
    print("  tendency scale per var:", scale)

    # f32 absolute XLA path
    rhs32 = jax.jit(make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32, interior="xla"))
    out_abs = np.asarray(rhs32(jnp.asarray(qt, jnp.float32)), np.float64)
    err_abs = np.abs(out_abs - truth).reshape(3, -1).max(axis=1) / scale

    # f32 perturbation form, base = IC, delta carried in f32
    rhs_p = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float32, interior="xla", perturbation_base=q0
    )
    out_pert = np.asarray(jax.jit(rhs_p.delta)(jnp.asarray(dq64, jnp.float32)), np.float64)
    err_pert = np.abs(out_pert - truth).reshape(3, -1).max(axis=1) / scale

    # f64 pert form == f64 absolute (algebra exactness check)
    rhs_p64 = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float64, interior="xla", perturbation_base=q0
    )
    out_p64 = np.asarray(jax.jit(rhs_p64.delta)(dq64), np.float64)
    err_alg = np.abs(out_p64 - truth).reshape(3, -1).max(axis=1) / scale

    print("  rel err (vs per-var tendency scale):")
    print("    f32 absolute :", err_abs)
    print("    f32 pert-form:", err_pert)
    print("    f64 pert-form:", err_alg)


if __name__ == "__main__":
    nel_s = sys.argv[1] if len(sys.argv) > 1 else "10,3"
    nel, s = (int(v) for v in nel_s.split(","))
    run(nel, s)
