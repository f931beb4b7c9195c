"""Per-stage timing of the fused SW RHS on the real TPU.

Marginal timing: time an N-call scan minus a 1-call scan to cancel
dispatch latency. Stages: K1 alone, K1+pool glue, K1+glue+KH, full RHS,
fused packed_stage, full RK3 step.
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
npts = nel * s
prows = rows // 6
bpp = prows // (256 if prows % 256 == 0 else prows)
N = 200


def timeit(name, fn, x):
    f = jax.jit(lambda q: jax.lax.scan(lambda c, _: (fn(c), None), q, None, length=N)[0])
    f1 = jax.jit(lambda q: fn(q))
    f(x).block_until_ready(); f1(x).block_until_ready()
    t0 = time.perf_counter(); f(x).block_until_ready(); t1 = time.perf_counter()
    f1(x).block_until_ready(); t2 = time.perf_counter()
    per = ((t1 - t0) - (t2 - t1)) / (N - 1) * 1e6
    print(f"{name:34s} {per:9.2f} us/call")
    return per


def k1_only(qp):
    df, we, ssl, nsl = pallas_sw.k1_element_local(
        qp, consts.fields, consts.gridrot, consts.eexy, consts.dd, rpr=rpr
    )
    # keep all outputs alive, shaped like qp for the scan carry
    return df + 1e-30 * (jnp.sum(we) + jnp.sum(ssl) + jnp.sum(nsl))


def pool_of(qp):
    df, we, ssl, nsl = pallas_sw.k1_element_local(
        qp, consts.fields, consts.gridrot, consts.eexy, consts.dd, rpr=rpr
    )
    west = we[:, :, 0:s].reshape(3, 6, npts)
    east = we[:, :, 64 - s : 64].reshape(3, 6, npts)
    rpad = -(-rpr // 8) * 8
    sv = ssl.reshape(3, 6, bpp, rpad, 128)[:, :, 0, :rpr, 64:]
    nv = nsl.reshape(3, 6, bpp, rpad, 128)[:, :, bpp - 1, rpad - rpr :, 64:]
    south = sv.reshape(3, 6, rpr, 8, 2, s)[..., 0, :].reshape(3, 6, npts)
    north = nv.reshape(3, 6, rpr, 8, 2, s)[..., 1, :].reshape(3, 6, npts)
    return df, jnp.stack([south, north, west, east], axis=1)


def k1_glue(qp):
    df, pool = pool_of(qp)
    return df + 1e-30 * jnp.sum(pool)


def k1_glue_kh(qp):
    df, pool = pool_of(qp)
    halo_we, hs, hn = pallas_sw.kh_exchange(pool, hc)
    return df + 1e-30 * (jnp.sum(halo_we) + jnp.sum(hs) + jnp.sum(hn))


dt = jnp.asarray(30.0, jnp.float32)


def rk3(qp):
    q1 = rhs.packed_stage(qp, qp, 0.0, 1.0, dt)
    q2 = rhs.packed_stage(qp, q1, 0.75, 0.25, 0.25 * dt)
    return rhs.packed_stage(qp, q2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)


t_k1 = timeit("K1 only", k1_only, q)
t_glue = timeit("K1 + pool glue", k1_glue, q)
t_kh = timeit("K1 + glue + KH", k1_glue_kh, q)
t_full = timeit("full rhs.packed", rhs.packed, q)
t_stage = timeit("packed_stage (RHS+axpy)", lambda qp: rhs.packed_stage(qp, qp, 0.5, 0.5, dt), q)
t_rk3 = timeit("full RK3 step (3 stages)", rk3, q)

gp = 6 * nel * nel * s * s
print(f"\nglue={t_glue-t_k1:.1f}us  kh={t_kh-t_glue:.1f}us  k2={t_stage-t_kh:.1f}us")
print(f"gridpoints {gp}; stage rate {gp/(t_stage/1e6)/1e9:.2f} e9 gp/s; rk3 {3*gp/(t_rk3/1e6)/1e9:.2f} e9 gp/s")
