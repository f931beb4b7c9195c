"""Distributed FAST path for the shallow-water step: the fused Pallas mega
kernel inside the shard_map tile body (VERDICT r2 Missing #2).

The jnp tile paths (shard_map_sw.py) prove the decomposition; this module
makes the per-device work the PRODUCTION kernel: each device owns an
(nel/N x nel/N)-element tile of a (panel, y, x) = (6, N, N) mesh and runs
ops/pallas_sw_gen.km_tile — the whole spatial operator (+ RK stage
combination + next-stage edge-slab emission) in one VMEM-resident kernel —
while the halo exchange stays the EIGHT lax.ppermute rounds of the general
jnp path (4 interior shifts + 4 edge-colored panel rounds, issued before
the kernel so the transfers overlap compute under XLA's latency-hiding
scheduler). This is the TPU analogue of the reference's per-rank compiled
kernels (device/device.py:79-141) + Ineighbor_alltoall halos
(process_topology.py:269-386).

Supports the f32 perturbation (base-state-split) operating point: per-tile
base planes (the kernel's bp input) are built from the GLOBAL f64 base
interface states, so every tile's delta math is exact around the same base
the single-chip pipelines use. Packed tile states then carry the
PERTURBATION; the step subtracts/adds the base at the boundary (any
a + b = 1 RK combination of delta states equals the absolute one).
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.cubed_sphere import CubedSphere2D
from ..geometry.metric import Metric2D
from ..ops import pallas_sw_gen as psg
from ..ops.dfr import DFROperators
from .shard_map_sw import _build_tile_tables
from .topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology

IDX_H, IDX_HU1, IDX_HU2 = 0, 1, 2


class _TileMetricView:
    """Metric2D attribute view sliced to one (nt x nt)-element tile (all six
    panels kept — the fields build_constants packs are panel-identical on
    the equiangular cubed sphere, which it asserts)."""

    _BULK = (
        "sqrtG", "inv_sqrtG", "H_contra_11", "H_contra_12", "H_contra_21",
        "H_contra_22", "coriolis_factor_1_01", "coriolis_factor_1_02",
        "coriolis_factor_2_01", "coriolis_factor_2_02",
        "christoffel_1_11", "christoffel_1_12", "christoffel_2_12",
        "christoffel_2_22", "gridrot",
    )

    def __init__(self, metric: Metric2D, ey0: int, ex0: int, nt: int):
        for name in self._BULK:
            a = np.asarray(getattr(metric, name), np.float64)
            setattr(self, name, a[:, ey0 : ey0 + nt, ex0 : ex0 + nt])
        # Interface arrays keep their one-halo-element padding convention:
        # build_constants slices [:, :, 1:, :s] / [:, 1:, :, :s] off these.
        for name in ("sqrtG_itf_i", "H_contra_11_itf_i", "H_contra_21_itf_i"):
            a = np.asarray(getattr(metric, name), np.float64)
            setattr(self, name, a[:, ey0 : ey0 + nt, ex0 : ex0 + nt + 2])
        for name in ("sqrtG_itf_j", "H_contra_12_itf_j", "H_contra_22_itf_j"):
            a = np.asarray(getattr(metric, name), np.float64)
            setattr(self, name, a[:, ey0 : ey0 + nt + 2, ex0 : ex0 + nt])


def _sw_base_interfaces_f64(geom, ops, topology, q0_64):
    """Global f64 base interface L/R states (the model's pert assembly,
    models/shallow_water.py) — the source of every tile's base halos,
    interior tile edges and panel edges alike."""
    s = ops.num_solpts
    nel = geom.num_elements
    EE = jnp.asarray(np.concatenate([ops.extrap_x, ops.extrap_z], axis=1), jnp.float64)
    itf = jnp.asarray(q0_64, jnp.float64) @ EE
    itf_x, itf_y = itf[..., : 2 * s], itf[..., 2 * s :]
    hh = topology.halo_scalars(itf_x[IDX_H], itf_y[IDX_H])
    uh = topology.halo_vectors(itf_x[IDX_HU1], itf_y[IDX_HU1], itf_x[IDX_HU2], itf_y[IDX_HU2])

    def halo_q(side, shape):
        return jnp.stack([hh[side], uh[side][0], uh[side][1]]).reshape((3,) + shape)

    ny = nx = nel
    qL_x = jnp.concatenate(
        [halo_q(WEST, (6, ny, 1, s)), itf_x[..., s:].reshape(3, 6, ny, nx, s)], axis=-2
    )
    qR_x = jnp.concatenate(
        [itf_x[..., :s].reshape(3, 6, ny, nx, s), halo_q(EAST, (6, ny, 1, s))], axis=-2
    )
    qL_y = jnp.concatenate(
        [halo_q(SOUTH, (6, 1, nx, s)), itf_y[..., s:].reshape(3, 6, ny, nx, s)], axis=-3
    )
    qR_y = jnp.concatenate(
        [itf_y[..., :s].reshape(3, 6, ny, nx, s), halo_q(NORTH, (6, 1, nx, s))], axis=-3
    )
    return qL_x, qR_x, qL_y, qR_y


def make_shard_map_sw_step_fused(
    geom: CubedSphere2D,
    ops: DFROperators,
    metric: Metric2D,
    mesh: Mesh,
    dt: float,
    dtype=jnp.float32,
    perturbation_base: Optional[jnp.ndarray] = None,
    rhs0_64: Optional[jnp.ndarray] = None,
) -> Callable:
    """Jitted TVD-RK3 step: fused per-tile Pallas kernel inside shard_map
    over a ('panel', 'y', 'x') mesh of 6*N*N devices (N | nel). Returns
    (step, sharding); q keeps the usual global (3, 6, ny, nx, s^2) layout.

    With ``perturbation_base`` (optionally + its precomputed f64 RHS) the
    tiles run the base-state-split form; callers still pass/receive the
    ABSOLUTE state."""
    n = mesh.shape["y"]
    if mesh.shape["panel"] != 6 or mesh.shape["x"] != n:
        raise ValueError("fused shard_map SW path needs a (6, N, N) mesh")
    s = ops.num_solpts
    nel = geom.num_elements
    if nel % n:
        raise ValueError(f"nel={nel} not divisible by mesh N={n}")
    nt = nel // n
    if not psg.supported(s, nt, dtype):
        raise ValueError(f"no fused tile pipeline for (s={s}, nel_t={nt}, {dtype})")
    p = psg.plan(s, nt)
    prows = p.prows
    used = p.g * s * s
    rpr = p.rpr
    npts_t = nt * s
    npl = p.npl
    topology = CubedSphereTopology(geom)
    shift_perms, color_perms, onehot_send, route, flip_t, conv_t = _build_tile_tables(
        topology, n, s
    )
    axes = ("panel", "y", "x")
    interp = jax.default_backend() != "tpu"

    # --- per-tile constants ------------------------------------------------
    con_by_tile = {}
    for ty in range(n):
        for tx in range(n):
            view = _TileMetricView(metric, ty * nt, tx * nt, nt)
            con_by_tile[(ty, tx)] = psg.build_constants(
                ops, view, nt, s, dtype=dtype, single_block=True
            )
    c00 = con_by_tile[(0, 0)]

    def tile_stack(get):
        """(6, n, n, ...) stack of a per-tile plane (panel-identical)."""
        return jnp.stack(
            [get(con_by_tile[(ty, tx)]) for ty in range(n) for tx in range(n)]
        ).reshape((1, n, n) + get(c00).shape).repeat(6, axis=0)

    fields_t = [tile_stack(lambda c, k=k: c.fields[k][:prows]) for k in range(13)]
    m_sg_t = tile_stack(lambda c: c.m_sg[:prows])
    m_hd_t = tile_stack(lambda c: c.m_hd[:prows])
    m_ho_t = tile_stack(lambda c: c.m_ho[:prows])
    # gridrot is panel-dependent: (6*prows, 128) per tile -> per (p, ty, tx).
    grot_t = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [con_by_tile[(ty, tx)].gridrot[pp * prows : (pp + 1) * prows]
                         for tx in range(n)]
                    )
                    for ty in range(n)
                ]
            )
            for pp in range(6)
        ]
    )

    operands = dict(
        grot=grot_t,
        m_sg=m_sg_t, m_hd=m_hd_t, m_ho=m_ho_t,
        onehot_send=jnp.asarray(onehot_send, dtype=dtype),
        route=jnp.asarray(np.eye(8)[route], dtype=dtype),
        flip=jnp.asarray(flip_t, dtype=dtype),
        conv=jnp.asarray(conv_t, dtype=dtype),
    )
    for k in range(13):
        operands[f"f{k}"] = fields_t[k]

    # --- perturbation base planes -------------------------------------------
    pert = perturbation_base is not None
    q0c = None
    if pert:
        q0_64 = jnp.asarray(perturbation_base, jnp.float64)
        if rhs0_64 is None:
            from ..models.shallow_water import make_rhs_shallow_water

            rhs0_64 = make_rhs_shallow_water(
                geom, ops, metric, dtype=jnp.float64, interior="xla"
            )(q0_64)
        qL_x, qR_x, qL_y, qR_y = (
            np.asarray(a) for a in _sw_base_interfaces_f64(geom, ops, topology, q0_64)
        )
        q0np = np.asarray(q0_64, np.float64)
        rhs0np = np.asarray(rhs0_64, np.float64)
        u0np = q0np[1:3] / q0np[0]
        con64_by_tile = {}
        bp_rows = []
        for pp in range(6):
            for ty in range(n):
                for tx in range(n):
                    ey0, ex0 = ty * nt, tx * nt
                    if (ty, tx) not in con64_by_tile:
                        view = _TileMetricView(metric, ey0, ex0, nt)
                        con64_by_tile[(ty, tx)] = psg.build_constants(
                            ops, view, nt, s, dtype=jnp.float64, single_block=True
                        )
                    c64 = con64_by_tile[(ty, tx)]
                    sl = lambda a: a[:, pp, ey0 : ey0 + nt, ex0 : ex0 + nt]

                    def ptile(a, h_pad_one=False):
                        # (V, nt, nt, s^2) -> (V, prows, 128)
                        V = a.shape[0]
                        b = np.asarray(a).reshape(V, nt, rpr, used)
                        padz = np.zeros((V, nt, rpr, 128 - used))
                        if h_pad_one:
                            padz[0] = 1.0
                        return jnp.asarray(
                            np.concatenate([b, padz], -1).reshape(V, prows, 128)
                        )

                    q0t = ptile(sl(q0np), h_pad_one=True)
                    u0t = ptile(sl(u0np))
                    r0t = ptile(sl(rhs0np))
                    A0 = jnp.stack([q0t[v] @ c64.eexy for v in range(3)])
                    hw = qL_x[:, pp, ey0 : ey0 + nt, ex0, :].reshape(3, npts_t)
                    he = qR_x[:, pp, ey0 : ey0 + nt, ex0 + nt, :].reshape(3, npts_t)
                    hs = qL_y[:, pp, ey0, ex0 : ex0 + nt, :].reshape(3, npts_t)
                    hn = qR_y[:, pp, ey0 + nt, ex0 : ex0 + nt, :].reshape(3, npts_t)
                    padf = lambda a: jnp.asarray(np.pad(a, ((0, 0), (0, npl - npts_t))))
                    hw, he, hs, hn = padf(hw), padf(he), padf(hs), padf(hn)
                    E0 = jnp.stack(
                        [
                            psg._expand_halo(
                                hw[v : v + 1], he[v : v + 1], hs[v : v + 1],
                                hn[v : v + 1], c64, jnp.float64,
                            )
                            for v in range(3)
                        ]
                    )
                    bp_rows.append(jnp.concatenate([q0t, u0t, A0, E0, r0t]))
        operands["bp"] = jnp.asarray(jnp.stack(bp_rows), dtype).reshape(
            (6, n, n, 14, prows, 128)
        )
        q0c = jnp.asarray(q0_64, dtype)

    # --- shard body ----------------------------------------------------------
    state_spec = P(None, "panel", "y", "x", None)
    op_specs = {k: P("panel", "y", "x") for k in operands}

    def pack_tile(qt):
        b = qt.reshape(3, nt, rpr, used)
        if pert:
            pad = jnp.zeros((3, nt, rpr, 128 - used), qt.dtype)
        else:
            padv = jnp.zeros((3, 1, 1, 128 - used), qt.dtype).at[0].set(1.0)
            pad = jnp.broadcast_to(padv, (3, nt, rpr, 128 - used))
        return jnp.concatenate([b, pad], axis=-1).reshape(3, prows, 128)

    def unpack_tile(qp):
        return qp.reshape(3, nt, rpr, 128)[..., :used].reshape(3, nt, nt, s * s)

    def _traces_from_slabs(we, ssl, nsl):
        """Tile-edge traces (4, 3, npts_t) from the kernel's edge slabs."""
        wev = we[:, :nt]
        west = wev[..., 0:s].reshape(3, npts_t)
        east = wev[..., s : 2 * s].reshape(3, npts_t)
        south = ssl[:, :rpr, : p.ws].reshape(3, npts_t)
        north = nsl[:, :rpr, : p.ws].reshape(3, npts_t)
        return jnp.stack([south, north, west, east])

    def shard_step(q, ops_):
        f = {k: v[0, 0, 0] for k, v in ops_.items()}
        con = psg.GenConstants(
            fields=tuple(f[f"f{k}"] for k in range(13)),
            gridrot=f["grot"],
            **{
                name: {"m_sg": f["m_sg"], "m_hd": f["m_hd"], "m_ho": f["m_ho"]}.get(
                    name, getattr(c00, name)
                )
                for name in psg._CON_FIELDS
            },
        )
        bp = f.get("bp")
        qp = pack_tile(q[:, 0])

        def slabs_of(qp_):
            m = psg._masks(p, prows)
            wes, ss_, ns_ = psg._emit_slabs(
                tuple(qp_[v] for v in range(3)), con, m, jnp.roll, qp_.dtype
            )
            return jnp.stack(wes), jnp.stack(ss_), jnp.stack(ns_)

        def halos_of(slabs):
            traces = _traces_from_slabs(*slabs)
            rounds = [jax.lax.ppermute(traces[d], axes, shift_perms[d]) for d in range(4)]
            rounds += [
                jax.lax.ppermute(
                    jnp.tensordot(f["onehot_send"][c], traces, axes=1), axes, color_perms[c]
                )
                for c in range(4)
            ]
            received = jnp.stack(rounds)  # (8, 3, npts_t)

            def halo_for(d):
                buf = jnp.tensordot(f["route"][d], received, axes=1)
                flipped = jnp.where(f["flip"][d] > 0.5, buf[:, ::-1], buf)
                cmat = f["conv"][d]
                b1 = cmat[:, 0, 0] * flipped[IDX_HU1] + cmat[:, 0, 1] * flipped[IDX_HU2]
                b2 = cmat[:, 1, 0] * flipped[IDX_HU1] + cmat[:, 1, 1] * flipped[IDX_HU2]
                return jnp.stack([flipped[IDX_H], b1, b2])

            def fmt(a):
                return (jnp.pad(a, ((0, 0), (0, npl - npts_t))) if npl > npts_t else a)[None]

            return fmt(halo_for(WEST)), fmt(halo_for(EAST)), fmt(halo_for(SOUTH)), fmt(halo_for(NORTH))

        dt_ = jnp.asarray(dt, dtype=dtype)
        coeffs = (
            (0.0, 1.0, dt_),
            (0.75, 0.25, 0.25 * dt_),
            (1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt_),
        )
        x = qp
        y = qp
        slabs = slabs_of(qp)
        for a, b, cdt in coeffs:
            y, *oslabs = psg.km_tile(
                y, *halos_of(slabs), con, nt, s, x=x, cdt=cdt,
                stage_a=float(a), stage_b=float(b), emit_slabs=True,
                interpret=interp, bp=bp,
            )
            slabs = tuple(oslabs)
        return unpack_tile(y)[:, None]

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no
    # varying-mesh-axes annotation, which the checker would reject.
    shard_step = partial(
        jax.shard_map, mesh=mesh, in_specs=(state_spec, op_specs),
        out_specs=state_spec, check_vma=False,
    )(shard_step)

    sharding = NamedSharding(mesh, state_spec)

    @jax.jit
    def step(q):
        if pert:
            out = shard_step((q - q0c).astype(dtype), operands)
            return q0c + out
        return shard_step(q.astype(dtype), operands)

    return step, sharding
