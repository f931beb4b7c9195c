"""Per-stage timing of the fused SW RHS on the real TPU.

Times (a) the full packed RHS, (b) K1 alone, (c) K1+glue (halo) without K2,
to attribute microseconds per stage. Marginal timing vs dispatch latency:
time N-call scan minus 1-call scan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops import pallas_sw
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6

print("devices:", jax.devices())

nel, s = 64, 4
geom = make_cubed_sphere_2d(nel, s)
ops = make_dfr_operators(s)
metric = make_metric_2d(geom)
rhs = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32)
q = rhs.pack(jnp.asarray(williamson_case6(geom), dtype=jnp.float32))
consts = pallas_sw.build_constants(ops, metric, nel, dtype=jnp.float32)

N = 200


def timeit(name, fn, x):
    f = jax.jit(lambda q: jax.lax.scan(lambda c, _: (fn(c), None), q, None, length=N)[0])
    f1 = jax.jit(lambda q: fn(q))
    f(x).block_until_ready(); f1(x).block_until_ready()
    t0 = time.perf_counter(); f(x).block_until_ready(); t1 = time.perf_counter()
    f1(x).block_until_ready(); t2 = time.perf_counter()
    per = ((t1 - t0) - (t2 - t1)) / (N - 1) * 1e6
    print(f"{name:30s} {per:9.2f} us/call")
    return per


full = timeit("full rhs_packed", rhs.packed, q)

k1 = lambda qp: pallas_sw.k1_element_local(qp, consts.fields, consts.eexy, consts.dd)[0]
timeit("K1 only (df out)", k1, q)

k1b = lambda qp: pallas_sw.k1_element_local(qp, consts.fields, consts.eexy, consts.dd)[1]
timeit("K1 only (tr out)", k1b, q)


def k1_glue(qp):
    # K1 + the halo glue, feeding a trivial combine instead of K2.
    import numpy as np
    from wxfactory_tpu.models.shallow_water import IDX_H, IDX_HU1, IDX_HU2
    df, tr = pallas_sw.k1_element_local(qp, consts.fields, consts.eexy, consts.dd)
    rpr = nel // 8
    npts = nel * s
    v = tr.reshape(3, 6, nel, rpr, 128)
    west = v[:, :, :, 0, 0:s].reshape(3, 6, npts)
    east = v[:, :, :, rpr - 1, 64 - s : 64].reshape(3, 6, npts)
    south = v[:, :, 0, :, 64:128].reshape(3, 6, rpr, 8, 2, s)[..., 0, :].reshape(3, 6, npts)
    north = v[:, :, nel - 1, :, 64:128].reshape(3, 6, rpr, 8, 2, s)[..., 1, :].reshape(3, 6, npts)
    pool = jnp.stack([south, north, west, east], axis=1)
    topo = geom.topology if hasattr(geom, "topology") else None
    from wxfactory_tpu.parallel.topology import ProcessTopology
    return df + 0.0 * jnp.sum(pool) if topo is None else df

timeit("K1 + edge slice/stack", k1_glue, q)
print(f"state bytes: {q.nbytes/1e6:.2f} MB; gridpoints {6*nel*nel*s*s}")
print(f"full-RHS effective rate: {6*nel*nel*s*s/ (full/1e6) /1e9:.2f} e9 gp/s")
