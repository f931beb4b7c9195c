"""Explicit shard_map + ppermute 3D Euler step over a (6, N, N) tile mesh.

The same decomposition as the general SW path (shard_map_sw.py): one device
per cubed-sphere TILE, halo exchange = four interior cyclic-shift ppermute
rounds plus four edge-colored panel-edge rounds (the reference's
one-rank-per-tile strategy, process_topology.py:69-94). The vertical
direction is local to a tile (reference: columns local to a rank,
rhs_dfr.py:265-268).

The tile body IS the model's spatial operator: `_euler3d_rhs_core`
(models/euler_cubesphere.py) runs unchanged on tile-shaped arrays with the
metric constants passed as per-tile shard_map operands and the halo function
implemented with the ppermute rounds. 3D edge semantics follow
topology.exchange_pool_3d: a flipped edge reverses the horizontal element
order AND the horizontal solution-point order within each face (kz kept),
and the horizontal momentum pair gets the per-edge 2x2 contravariant basis
rotation.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.cubed_sphere_3d import CubedSphere3D
from ..geometry.metric3d import Metric3D
from ..models.euler_cubesphere import (
    IDX_RHO_U1,
    IDX_RHO_U2,
    _euler3d_rhs_core,
    build_euler3d_constants,
)
from ..ops.dfr import DFROperators
from .shard_map_sw import _build_tile_tables
from .topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology

# cst keys that are per-tile grid fields, with their leading non-grid axes.
_GRID_KEYS = {
    "sqrtG": 0, "inv_sqrtG": 0, "inv_dzdeta": 0, "wpres_int": 0,
    "hc": 2, "chr": 2,
}
# interface-family keys: (leading axes, which grid axis carries the +1)
_ITF_KEYS = {"sg_i": (0, "x"), "sg_j": (0, "y"), "sg_k": (0, "z"),
             "hr_i": (1, "x"), "hr_j": (1, "y"), "hr_k": (1, "z")}
_SHARED_KEYS = ("EE", "DD", "DD3", "CC", "CCb", "hfk")


def _tile_slices(cst: dict, n: int, nt: int):
    """Split the global cst grid fields into (6, N, N, ...) per-tile stacks
    (interface families keep their one-interface overlap).

    Each field has `lead` leading non-grid axes followed by the grid
    (6, nk[, +1], ny[, +1], nx[, +1], tail). Output: the panel/tile axes
    lead, then the original lead axes, then the tile-local grid."""

    def slice_tiles(a, lead, ysl, xsl):
        a = np.asarray(a)
        if lead:
            a = np.moveaxis(a, list(range(lead)), list(range(-lead, 0)))  # grid leads
        # a: (6, nk[, +1], ny[, +1], nx[, +1], tail..., lead...)
        tiles = np.stack(
            [np.stack([a[:, :, ysl(ty), xsl(tx)] for tx in range(n)]) for ty in range(n)]
        )  # (N, N, 6, nk, nyt, nxt, tail..., lead...)
        tiles = np.moveaxis(tiles, 2, 0)  # (6, N, N, ...)
        if lead:
            tiles = np.moveaxis(tiles, list(range(tiles.ndim - lead, tiles.ndim)),
                                list(range(3, 3 + lead)))
        return jnp.asarray(tiles)

    plain = lambda t: slice(t * nt, (t + 1) * nt)
    over = lambda t: slice(t * nt, (t + 1) * nt + 1)
    out = {}
    for key, lead in _GRID_KEYS.items():
        out[key] = slice_tiles(cst[key], lead, plain, plain)
    for key, (lead, plus) in _ITF_KEYS.items():
        out[key] = slice_tiles(
            cst[key], lead, over if plus == "y" else plain, over if plus == "x" else plain
        )
    return out


def make_shard_map_euler3d_step(
    geom: CubedSphere3D,
    ops: DFROperators,
    metric: Metric3D,
    mesh: Mesh,
    dt: float,
    dtype=jnp.float64,
) -> Callable:
    """Jitted TVD-RK3 step of the 3D Euler model with the RHS fully inside
    shard_map over a ('panel', 'y', 'x') = (6, N, N) mesh. Returns
    (step, sharding); the state keeps the usual global layout
    (5, 6, nk, ny, nx, s^3) placed with the returned NamedSharding."""
    n = mesh.shape["y"]
    if mesh.shape["panel"] != 6 or mesh.shape["x"] != n:
        raise ValueError("shard_map 3D Euler path needs a (6, N, N) mesh")
    s = ops.num_solpts
    ss = s * s
    nel_h, nel_v = geom.nel_h, geom.nel_v
    if nel_h % n:
        raise ValueError(f"nel_h={nel_h} not divisible by mesh N={n}")
    nt = nel_h // n
    topology = CubedSphereTopology(geom)
    shift_perms, color_perms, onehot_send, route, flip_t, _conv2d = _build_tile_tables(
        topology, n, s
    )
    axes = ("panel", "y", "x")

    cst_global = build_euler3d_constants(ops, metric, dtype=dtype)
    cst_shared = {k: cst_global[k] for k in _SHARED_KEYS}
    tiled = _tile_slices(cst_global, n, nt)
    tile_keys = list(tiled.keys())

    # Per-tile routing tables; conv sliced to this tile's boundary segment
    # (element h, k) along each side.
    cc = np.asarray(topology._conv_contra_all).reshape(4, 6, nel_h, s, 2, 2)
    conv = np.zeros((6, n, n, 4, nt, s, 2, 2))
    conv[..., 0, 0] = 1.0
    conv[..., 1, 1] = 1.0
    edges = topology.edges
    for p in range(6):
        for d in range(4):
            tiles_d = (
                [(p, 0, tx) for tx in range(n)] if d == SOUTH
                else [(p, n - 1, tx) for tx in range(n)] if d == NORTH
                else [(p, ty, 0) for ty in range(n)] if d == WEST
                else [(p, ty, n - 1) for ty in range(n)]
            )
            for i, (pp, ty, tx) in enumerate(tiles_d):
                conv[pp, ty, tx, d] = cc[d, p, i * nt : (i + 1) * nt]
    tables = dict(
        onehot_send=jnp.asarray(onehot_send, dtype=dtype),
        route=jnp.asarray(np.eye(8)[route], dtype=dtype),
        flip=jnp.asarray(flip_t, dtype=dtype),
        conv=jnp.asarray(conv, dtype=dtype),
    )

    def local_rhs(q, cst_tile, tbl):
        """RHS for ONE tile: the model core with a ppermute halo_fn."""
        nk = nel_v

        def halo_fn(q_itf_i, q_itf_j):
            traces = jnp.stack(
                [
                    q_itf_j[:, :, 0, :, :ss],  # SOUTH outward face (nv, nk, nt, ss)
                    q_itf_j[:, :, -1, :, ss:],  # NORTH
                    q_itf_i[:, :, :, 0, :ss],  # WEST
                    q_itf_i[:, :, :, -1, ss:],  # EAST
                ]
            )  # (4, nv, nk, nt, ss)
            rounds = [jax.lax.ppermute(traces[d], axes, shift_perms[d]) for d in range(4)]
            rounds += [
                jax.lax.ppermute(
                    jnp.tensordot(tbl["onehot_send"][c], traces, axes=1), axes, color_perms[c]
                )
                for c in range(4)
            ]
            received = jnp.stack(rounds)  # (8, nv, nk, nt, ss)

            def halo_for(d):
                buf = jnp.tensordot(tbl["route"][d], received, axes=1)  # (nv, nk, nt, ss)
                split = buf.reshape(buf.shape[:-1] + (s, s))
                flipped = split[:, :, ::-1, :, ::-1].reshape(buf.shape)
                buf = jnp.where(tbl["flip"][d] > 0.5, flipped, buf)
                cmat = tbl["conv"][d]  # (nt, s, 2, 2)
                v1 = buf[IDX_RHO_U1].reshape(nk, nt, s, s)
                v2 = buf[IDX_RHO_U2].reshape(nk, nt, s, s)
                co = lambda i, j: cmat[None, :, None, :, i, j]
                b1 = (co(0, 0) * v1 + co(0, 1) * v2).reshape(nk, nt, ss)
                b2 = (co(1, 0) * v1 + co(1, 1) * v2).reshape(nk, nt, ss)
                return jnp.concatenate(
                    [buf[:IDX_RHO_U1], b1[None], b2[None], buf[IDX_RHO_U2 + 1 :]], axis=0
                )

            return halo_for(SOUTH), halo_for(NORTH), halo_for(WEST), halo_for(EAST)

        cst = dict(cst_shared)
        cst.update(cst_tile)
        return _euler3d_rhs_core(q, cst, halo_fn, ss)

    state_spec = P(None, "panel", None, "y", "x", None)
    field_specs = [P("panel", "y", "x") for _ in tile_keys]
    table_keys = list(tables.keys())
    table_specs = [P("panel", "y", "x") for _ in table_keys]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_spec, *field_specs, *table_specs),
        out_specs=state_spec,
    )
    def shard_step(q, *ops_in):
        fields = ops_in[: len(tile_keys)]
        tabs = ops_in[len(tile_keys) :]
        cst_tile = {k: v[0, 0, 0] for k, v in zip(tile_keys, fields)}
        tbl = {k: v[0, 0, 0] for k, v in zip(table_keys, tabs)}
        q = q[:, 0]  # (5, nk, nyt, nxt, s^3) local tile

        def rhs(qq):
            return local_rhs(qq, cst_tile, tbl)

        dt_ = jnp.asarray(dt, dtype=dtype)
        q1 = q + rhs(q) * dt_
        q2 = 0.75 * q + 0.25 * (q1 + rhs(q1) * dt_)
        q3 = q / 3.0 + 2.0 / 3.0 * (q2 + rhs(q2) * dt_)
        return q3[:, None]

    sharding = NamedSharding(mesh, state_spec)
    args = [tiled[k] for k in tile_keys] + [tables[k] for k in table_keys]

    @jax.jit
    def step(q):
        return shard_step(q, *args)

    return step, sharding
