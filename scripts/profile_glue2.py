"""Breakdown of the post-step-1 glue: extraction vs exchange vs packing."""
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
from wxfactory_tpu.models.shallow_water import IDX_H, IDX_HU1, IDX_HU2
from wxfactory_tpu.ops import pallas_sw
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6
from wxfactory_tpu.parallel.topology import WEST, EAST, SOUTH, NORTH, CubedSphereTopology

nel, s = 64, 4
geom = make_cubed_sphere_2d(nel, s)
ops = make_dfr_operators(s)
metric = make_metric_2d(geom)
rhs = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32)
q = rhs.pack(jnp.asarray(williamson_case6(geom), dtype=jnp.float32))
consts = pallas_sw.build_constants(ops, metric, nel, dtype=jnp.float32)
topology = CubedSphereTopology(geom)

N = 200
rows = 6 * nel * nel // 8
rpr = nel // 8
npts = nel * s
npl = -(-npts // 128) * 128
block = 256
bpp = max(1, (rows // 6) // block)


def timeit(name, fn, x):
    f = jax.jit(lambda q: jax.lax.scan(lambda c, _: (fn(c), None), q, None, length=N)[0])
    f1 = jax.jit(lambda q: fn(q))
    f(x).block_until_ready(); f1(x).block_until_ready()
    t0 = time.perf_counter(); f(x).block_until_ready(); t1 = time.perf_counter()
    f1(x).block_until_ready(); t2 = time.perf_counter()
    per = ((t1 - t0) - (t2 - t1)) / (N - 1) * 1e6
    print(f"{name:34s} {per:9.2f} us/call")
    return per


def variant(mode):
    def rhs_packed(qp):
        df, tr, we, ssl, nsl = pallas_sw.k1_element_local(
            qp, consts.fields, consts.eexy, consts.dd, rpr=rpr
        )
        if mode == "none":
            hwe = jnp.zeros((3, 6 * nel, 128), qp.dtype)
            hs = jnp.zeros((3, 6, 8, npl), qp.dtype)
            hn = jnp.zeros((3, 6, 8, npl), qp.dtype)
            return pallas_sw.k2_interface(
                tr, hwe, hs, hn, consts.m_sg, consts.m_hd, consts.m_ho,
                df, consts.fields[13], consts.wmat, consts.spread, rpr=rpr)
        if mode == "skip_extract":
            pool = jnp.full((3, 4, 6, npts), 1.0, qp.dtype) + 0.0 * we[0, 0, 0]
        else:
            west = we[:, :, 0:s].reshape(3, 6, npts)
            east = we[:, :, 64 - s : 64].reshape(3, 6, npts)
            sv = ssl.reshape(3, -1, rpr, 128)[:, ::bpp, :, 64:]
            nv = nsl.reshape(3, -1, rpr, 128)[:, bpp - 1 :: bpp, :, 64:]
            south = sv.reshape(3, 6, rpr, 8, 2, s)[..., 0, :].reshape(3, 6, npts)
            north = nv.reshape(3, 6, rpr, 8, 2, s)[..., 1, :].reshape(3, 6, npts)
            pool = jnp.stack([south, north, west, east], axis=1)
        if mode == "skip_exchange":
            halo = pool
        else:
            ex = topology.exchange_pool(pool)
            conv = jnp.asarray(topology._conv_contra_all, dtype=ex.dtype)
            b1 = conv[..., 0, 0] * ex[IDX_HU1] + conv[..., 0, 1] * ex[IDX_HU2]
            b2 = conv[..., 1, 0] * ex[IDX_HU1] + conv[..., 1, 1] * ex[IDX_HU2]
            halo = jnp.stack([ex[IDX_H], b1, b2])
        if mode == "skip_pack":
            hwe = jnp.zeros((3, 6 * nel, 128), qp.dtype) + 0.0 * halo[0, 0, 0, 0]
            hs = jnp.zeros((3, 6, 8, npl), qp.dtype)
            hn = jnp.zeros((3, 6, 8, npl), qp.dtype)
        else:
            hw = halo[:, WEST].reshape(3, 6, nel, 1, s)
            he = halo[:, EAST].reshape(3, 6, nel, 1, s)
            hwe = (
                jnp.pad(hw, ((0, 0), (0, 0), (0, 0), (0, 31), (0, 0)))
                + jnp.pad(he, ((0, 0), (0, 0), (0, 0), (15, 16), (0, 0)))
            ).reshape(3, 6 * nel, 128)
            edge_pad = ((0, 0), (0, 0), (0, 7), (0, npl - npts))
            hs = jnp.pad(halo[:, SOUTH].reshape(3, 6, 1, npts), edge_pad)
            hn = jnp.pad(halo[:, NORTH].reshape(3, 6, 1, npts), edge_pad)
        return pallas_sw.k2_interface(
            tr, hwe, hs, hn, consts.m_sg, consts.m_hd, consts.m_ho,
            df, consts.fields[13], consts.wmat, consts.spread, rpr=rpr)

    return rhs_packed


timeit("full", variant("full"), q)
timeit("skip extraction", variant("skip_extract"), q)
timeit("skip exchange+rot", variant("skip_exchange"), q)
timeit("skip packing", variant("skip_pack"), q)
timeit("no glue", variant("none"), q)
