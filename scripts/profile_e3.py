"""Per-stage timing of the fused 3D Euler RHS on the real TPU.

Marginal timing: time an N-call scan minus a 1-call scan to cancel
dispatch latency. Stages: XLA edge-halo extraction, full packed RHS,
fused packed_stage, full TVD-RK3 step (unchained), full TVD-RK3 step
(chained — each mega kernel emits the next stage's edge slabs, so the
XLA big-state extraction drops out of the steady-state loop).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from wxfactory_tpu.geometry.cubed_sphere_3d import make_cubed_sphere_3d
from wxfactory_tpu.geometry.metric3d import make_metric_3d
from wxfactory_tpu.models.euler_cubesphere import make_rhs_euler_cubesphere
from wxfactory_tpu.ops import pallas_euler3d as pe3
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.parallel.topology import CubedSphereTopology
from wxfactory_tpu.testcases.dcmip import dcmip_gravity_wave

print("devices:", jax.devices())

nel_h, nel_v, s = 16, 16, 4  # dcmip31-scale DOF (1.57M gridpoints)
geom = make_cubed_sphere_3d(nel_h, nel_v, s, ztop=10000.0, planet_scaling_factor=125.0)
ops = make_dfr_operators(s, three_d=True)
topo = CubedSphereTopology(geom)
metric = make_metric_3d(geom, ops, topo)
q0 = jnp.asarray(dcmip_gravity_wave(geom))
# base_state (the balanced f32 offset) is omitted here: it only adds a
# constant per-row axpy in the kernel epilogue but costs a full f64 XLA
# RHS compile at setup.
rhs = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo, dtype=jnp.float32)
assert hasattr(rhs, "packed")
q = rhs.pack(q0.astype(jnp.float32))
hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float32)
ty = pe3.pick_ty(nel_h, nel_v)
print("ty =", ty)
N = 100


def timeit(name, fn, x):
    f = jax.jit(lambda q: jax.lax.scan(lambda c, _: (fn(c), None), q, None, length=N)[0])
    f1 = jax.jit(lambda q: fn(q))
    wait = lambda r: jax.block_until_ready(r)
    wait(f(x)); wait(f1(x))
    t0 = time.perf_counter(); wait(f(x)); t1 = time.perf_counter()
    wait(f1(x)); t2 = time.perf_counter()
    per = ((t1 - t0) - (t2 - t1)) / (N - 1) * 1e6
    print(f"{name:34s} {per:9.2f} us/call", flush=True)
    return per


def halo_only(qp):
    hwe, hs, hn = pe3.edge_halo(qp, topo, hops, nel_h, nel_v, ty)
    return qp + 1e-30 * (jnp.sum(hwe) + jnp.sum(hs) + jnp.sum(hn))


dt = jnp.asarray(0.1, jnp.float32)


def rk3(qp):
    q1 = rhs.packed_stage(qp, qp, 0.0, 1.0, dt)
    q2 = rhs.packed_stage(qp, q1, 0.75, 0.25, 0.25 * dt)
    return rhs.packed_stage(qp, q2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)


def rk3_chained(carry):
    qp, slabs = carry
    q1, sl1 = rhs.packed_stage_chained(qp, qp, slabs, 0.0, 1.0, dt)
    q2, sl2 = rhs.packed_stage_chained(qp, q1, sl1, 0.75, 0.25, 0.25 * dt)
    return rhs.packed_stage_chained(qp, q2, sl2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)


t_halo = timeit("edge_halo (XLA extraction)", halo_only, q)
t_full = timeit("full rhs.packed", rhs.packed, q)
t_stage = timeit("packed_stage (RHS+axpy)", lambda qp: rhs.packed_stage(qp, qp, 0.5, 0.5, dt), q)
t_rk3 = timeit("full RK3 step (3 stages)", rk3, q)
t_rk3c = timeit("RK3 step (chained slabs)", rk3_chained, (q, rhs.packed_slabs(q)))

gp = 6 * nel_h * nel_h * nel_v * s**3
print(f"\ngridpoints {gp}; rhs rate {gp/(t_full/1e6)/1e9:.2f} e9 gp/s; "
      f"rk3 {3*gp/(t_rk3/1e6)/1e9:.2f} e9 gp/s; chained {3*gp/(t_rk3c/1e6)/1e9:.2f} e9 gp/s")
