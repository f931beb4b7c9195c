"""Per-stage timing of the fused SW RHS on the real TPU.

Marginal timing: time an N-call scan minus a 1-call scan to cancel
dispatch latency. Stages: KE alone, KE+pool glue, KE+glue+KH, full RHS,
fused packed_stage, full RK3 step (unchained), full RK3 step (chained —
each mega kernel emits the next stage's edge slabs, so KE drops out of
the steady-state loop).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops import pallas_sw
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.parallel.topology import CubedSphereTopology
from wxfactory_tpu.testcases import williamson_case6

print("devices:", jax.devices())

nel, s = 64, 4
geom = make_cubed_sphere_2d(nel, s)
ops = make_dfr_operators(s)
metric = make_metric_2d(geom)
rhs = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32)
q = rhs.pack(jnp.asarray(williamson_case6(geom), dtype=jnp.float32))
consts = pallas_sw.build_constants(ops, metric, nel, dtype=jnp.float32)
topology = CubedSphereTopology(geom)
hc = pallas_sw.build_halo_constants(topology, dtype=jnp.float32)

rows = 6 * nel * nel // 8
rpr = nel // 8
rpad = -(-rpr // 8) * 8
npts = nel * s
N = 200


def timeit(name, fn, x):
    f = jax.jit(lambda q: jax.lax.scan(lambda c, _: (fn(c), None), q, None, length=N)[0])
    f1 = jax.jit(lambda q: fn(q))
    wait = lambda r: jax.block_until_ready(r)
    wait(f(x)); wait(f1(x))
    t0 = time.perf_counter(); wait(f(x)); t1 = time.perf_counter()
    wait(f1(x)); t2 = time.perf_counter()
    per = ((t1 - t0) - (t2 - t1)) / (N - 1) * 1e6
    print(f"{name:34s} {per:9.2f} us/call")
    return per


def ke_only(qp):
    we, ssl, nsl = rhs.packed_slabs(qp)
    # keep all outputs alive, shaped like qp for the scan carry
    return qp + 1e-30 * (jnp.sum(we) + jnp.sum(ssl) + jnp.sum(nsl))


def pool_of(qp):
    we, ssl, nsl = rhs.packed_slabs(qp)
    west = we[:, :, 0:s].reshape(3, 6, npts)
    east = we[:, :, 64 - s : 64].reshape(3, 6, npts)
    sv = ssl.reshape(3, 6, rpad, 128)[:, :, :rpr, 64:]
    nv = nsl.reshape(3, 6, rpad, 128)[:, :, rpad - rpr :, 64:]
    south = sv.reshape(3, 6, rpr, 8, 2, s)[..., 0, :].reshape(3, 6, npts)
    north = nv.reshape(3, 6, rpr, 8, 2, s)[..., 1, :].reshape(3, 6, npts)
    return jnp.stack([south, north, west, east], axis=1)


def ke_glue(qp):
    return qp + 1e-30 * jnp.sum(pool_of(qp))


def ke_glue_kh(qp):
    halo_we, hs, hn = pallas_sw.kh_exchange(pool_of(qp), hc)
    return qp + 1e-30 * (jnp.sum(halo_we) + jnp.sum(hs) + jnp.sum(hn))


dt = jnp.asarray(30.0, jnp.float32)


def rk3(qp):
    q1 = rhs.packed_stage(qp, qp, 0.0, 1.0, dt)
    q2 = rhs.packed_stage(qp, q1, 0.75, 0.25, 0.25 * dt)
    return rhs.packed_stage(qp, q2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)


def rk3_chained(carry):
    qp, slabs = carry
    q1, sl1 = rhs.packed_stage_chained(qp, qp, slabs, 0.0, 1.0, dt)
    q2, sl2 = rhs.packed_stage_chained(qp, q1, sl1, 0.75, 0.25, 0.25 * dt)
    return rhs.packed_stage_chained(qp, q2, sl2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)


t_ke = timeit("KE only", ke_only, q)
t_glue = timeit("KE + pool glue", ke_glue, q)
t_kh = timeit("KE + glue + KH", ke_glue_kh, q)
t_full = timeit("full rhs.packed", rhs.packed, q)
t_stage = timeit("packed_stage (RHS+axpy)", lambda qp: rhs.packed_stage(qp, qp, 0.5, 0.5, dt), q)
t_rk3 = timeit("full RK3 step (3 stages)", rk3, q)
t_rk3c = timeit("RK3 step (chained slabs)", rk3_chained, (q, rhs.packed_slabs(q)))

gp = 6 * nel * nel * s * s
print(f"\nglue={t_glue-t_ke:.1f}us  kh={t_kh-t_glue:.1f}us  km={t_stage-t_kh:.1f}us")
print(f"gridpoints {gp}; stage rate {gp/(t_stage/1e6)/1e9:.2f} e9 gp/s; "
      f"rk3 {3*gp/(t_rk3/1e6)/1e9:.2f} e9 gp/s; chained {3*gp/(t_rk3c/1e6)/1e9:.2f} e9 gp/s")
