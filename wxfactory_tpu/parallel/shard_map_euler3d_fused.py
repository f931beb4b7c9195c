"""Distributed FAST path for 3D Euler: the single-tile mega kernel
(ops/pallas_euler3d.km3_tile) inside the shard_map tile body.

Same decomposition as the fused SW path (shard_map_sw_fused.py): one device
per cubed-sphere tile of a ('panel', 'y', 'x') = (6, N, N) mesh, halo
exchange = EIGHT lax.ppermute rounds (4 interior cyclic shifts + 4
edge-colored panel rounds) issued before the kernel, per-device work = the
whole tile spatial operator (+ RK stage combination + next-stage west/east
edge-slab emission) in one VMEM-resident pallas kernel. TPU analogue of the
reference's per-rank compiled kernels + neighbourhood halos
(device/device.py:79-141, process_topology.py:269-386); the vertical
direction stays tile-local (reference rhs_dfr.py:265-268).

Supports the f32 perturbation (base-state-split) operating point: per-tile
base planes (packed base state, f64 base RHS, base halo faces, base edge
trace pools) are built on host from the GLOBAL f64 base state, so every
tile's delta math expands around the same base the single-chip pipeline
uses. Callers pass/receive the ABSOLUTE state; the step shifts by the base
at the boundary (exact for any a + b = 1 RK combination of delta states).
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.cubed_sphere_3d import CubedSphere3D
from ..geometry.metric3d import Metric3D
from ..models.euler_cubesphere import IDX_RHO_U1, IDX_RHO_U2
from ..ops import pallas_euler3d as pe3
from ..ops.dfr import DFROperators
from .shard_map_sw import _build_tile_tables
from .topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology


class _TileMetric3DView:
    """Metric3D attribute view sliced to one (nt x nt)-horizontal-element
    tile (all six panels kept — pe3.build_constants checks panel identity of
    the equiangular fields itself; the rotation terms in ``christoffel[:, :3]``
    stay panel-dependent and full)."""

    def __init__(self, metric: Metric3D, ey0: int, ex0: int, nt: int):
        ysl = slice(ey0, ey0 + nt)
        xsl = slice(ex0, ex0 + nt)
        yso = slice(ey0, ey0 + nt + 1)
        xso = slice(ex0, ex0 + nt + 1)
        f64 = lambda a: np.asarray(a, np.float64)
        self.sqrtG = f64(metric.sqrtG)[:, :, ysl, xsl]
        self.inv_sqrtG = f64(metric.inv_sqrtG)[:, :, ysl, xsl]
        self.inv_dzdeta = f64(metric.inv_dzdeta)[:, :, ysl, xsl]
        self.h_contra = f64(metric.h_contra)[:, :, :, :, ysl, xsl]
        self.christoffel = f64(metric.christoffel)[:, :, :, :, ysl, xsl]
        self.sqrtG_itf_i = f64(metric.sqrtG_itf_i)[:, :, ysl, xso]
        self.sqrtG_itf_j = f64(metric.sqrtG_itf_j)[:, :, yso, xsl]
        self.sqrtG_itf_k = f64(metric.sqrtG_itf_k)[:, :, ysl, xsl]
        self.h_contra_itf_i = f64(metric.h_contra_itf_i)[:, :, :, :, ysl, xso]
        self.h_contra_itf_j = f64(metric.h_contra_itf_j)[:, :, :, :, yso, xsl]
        self.h_contra_itf_k = f64(metric.h_contra_itf_k)[:, :, :, :, ysl, xsl]


def _tile_conv3d(topology: CubedSphereTopology, n: int, nt: int, s: int, dtype):
    """Per-tile 2x2 contravariant momentum rotation for each side's received
    halo, sliced to the tile's boundary segment (identity off panel edges)."""
    nel_h = n * nt
    cc = np.asarray(topology._conv_contra_all).reshape(4, 6, nel_h, s, 2, 2)
    conv = np.zeros((6, n, n, 4, nt, s, 2, 2))
    conv[..., 0, 0] = 1.0
    conv[..., 1, 1] = 1.0
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
    return jnp.asarray(conv, dtype=dtype)


def _global_base_traces(q0g, ops):
    """f64 per-element outward face traces of the base state:
    t_x (5, 6, nk, ny, nx, 2ss) [west|east], t_y likewise [south|north]."""
    ex3 = jnp.asarray(np.asarray(ops.extrap_x3, np.float64))
    ey3 = jnp.asarray(np.asarray(ops.extrap_y3, np.float64))
    logged = jnp.concatenate(
        [jnp.log(q0g[0:1]), q0g[1:4], jnp.log(q0g[4:5])], axis=0
    )
    expd = lambda a: jnp.concatenate(
        [jnp.exp(a[0:1]), a[1:4], jnp.exp(a[4:5])], axis=0
    )
    return expd(logged @ ex3), expd(logged @ ey3)


def _panel_edge_base_halos(t_x, t_y, topology, s):
    """Exchanged + momentum-rotated f64 base halos at the PANEL edges:
    (5, 4[S,N,W,E], 6, nk, nh, ss) in each receiving panel's local coords."""
    SS = s * s
    # All four already sit in pool layout (5, 6, nk, nh, ss): nh is the
    # along-edge element index (x for S/N, y for W/E).
    sth = t_y[:, :, :, 0, :, :SS]
    nth = t_y[:, :, :, -1, :, SS:]
    wst = t_x[:, :, :, :, 0, :SS]
    est = t_x[:, :, :, :, -1, SS:]
    pool = jnp.stack([sth, nth, wst, est], axis=1)  # (5, 4, 6, nk, nh, ss)
    ex = topology.exchange_pool_3d(pool)
    nel_h = pool.shape[-2]
    cc = np.asarray(topology._conv_contra_all).reshape(4, 6, nel_h, s, 2, 2)
    coef = lambda i, j: jnp.asarray(cc[..., i, j][:, :, None, :, None, :], jnp.float64)
    split = ex.shape[1:-1] + (s, s)
    v1 = ex[1].reshape(split)
    v2 = ex[2].reshape(split)
    b1 = (coef(0, 0) * v1 + coef(0, 1) * v2).reshape(ex.shape[1:])
    b2 = (coef(1, 0) * v1 + coef(1, 1) * v2).reshape(ex.shape[1:])
    return jnp.stack([ex[0], b1, b2, ex[3], ex[4]])


def make_shard_map_euler3d_step_fused(
    geom: CubedSphere3D,
    ops: DFROperators,
    metric: Metric3D,
    mesh: Mesh,
    dt: float,
    dtype=jnp.float32,
    perturbation_base: Optional[jnp.ndarray] = None,
    rhs0_64: Optional[jnp.ndarray] = None,
) -> Callable:
    """Jitted TVD-RK3 step of the 3D Euler model with the per-tile mega
    kernel inside shard_map over a ('panel', 'y', 'x') = (6, N, N) mesh.
    Returns (step, sharding); the state keeps the global layout
    (5, 6, nk, ny, nx, s^3) placed with the returned NamedSharding.

    With ``perturbation_base`` (optionally + its precomputed f64 RHS) the
    tiles run the base-state-split f32 form; callers still pass/receive the
    ABSOLUTE state."""
    n = mesh.shape["y"]
    if mesh.shape["panel"] != 6 or mesh.shape["x"] != n:
        raise ValueError("fused shard_map 3D path needs a (6, N, N) mesh")
    s = ops.num_solpts
    SS = s * s
    S3 = s**3
    nel_h, nel_v = geom.nel_h, geom.nel_v
    nk = nel_v
    if nel_h % n:
        raise ValueError(f"nel_h={nel_h} not divisible by mesh N={n}")
    nt = nel_h // n
    if not pe3.tile_supported(nt, nk, s, 5, dtype):
        raise ValueError(f"no fused tile pipeline for (s={s}, nel_t={nt}, {dtype})")
    g, nxp, rows, Rp = pe3.tile_plan(nt, nk, s)
    nkxp = nk * nxp
    tynk = nt * nk
    T = g * 2 * SS
    topology = CubedSphereTopology(geom)
    shift_perms, color_perms, onehot_send, route, flip_t, _conv2d = _build_tile_tables(
        topology, n, s
    )
    axes = ("panel", "y", "x")
    interp = jax.default_backend() != "tpu"

    # --- per-tile constants --------------------------------------------------
    con_by_tile = {}
    for ty in range(n):
        for tx in range(n):
            view = _TileMetric3DView(metric, ty * nt, tx * nt, nt)
            con_by_tile[(ty, tx)] = pe3.build_constants(ops, view, nt, nk, s, dtype=dtype, g=g)
    c00 = con_by_tile[(0, 0)]
    with_tch = c00.tch is not None

    def pad_row_field(a, fill):
        a = jnp.asarray(a)
        if Rp == rows:
            return a
        return jnp.concatenate([a, jnp.full((Rp - rows, 128), fill, a.dtype)], 0)

    split = c00.itf_y is not None  # split x/y trace registers (pe3)
    _ROWF = (  # (field picker, pad fill)
        [(lambda c: c.sqrtg, 1.0), (lambda c: c.inv_sqrtg, 1.0), (lambda c: c.inv_dzdeta, 1.0)]
        + [(lambda c, i=i: c.h[i], 1.0) for i in range(6)]
        + [(lambda c, i=i: c.chs[i], 0.0) for i in range(18)]
        + [(lambda c: c.wpres_int, 0.0)]
        + [(lambda c, i=i: c.itf_xy[i], 1.0) for i in range(5)]
        + [(lambda c, i=i: c.itf_z[i], 1.0) for i in range(5)]
        + ([(lambda c, i=i: c.itf_y[i], 1.0) for i in range(5)] if split else [])
    )

    def tile_stack(fn):
        """Panel-identical per-tile plane -> (6, n, n, ...) operand."""
        one = jnp.stack([fn(ty, tx) for ty in range(n) for tx in range(n)])
        return one.reshape((1, n, n) + one.shape[1:]).repeat(6, axis=0)

    operands = {}
    for k, (get, fill) in enumerate(_ROWF):
        operands[f"c{k}"] = tile_stack(
            lambda ty, tx, get=get, fill=fill: pad_row_field(get(con_by_tile[(ty, tx)]), fill)
        )
    if with_tch:
        # Rotation terms are panel-dependent: (6, n, n, 9, Rp, 128).
        operands["tch"] = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack(
                            [
                                jnp.stack(
                                    [
                                        pad_row_field(
                                            con_by_tile[(ty, tx)].tch[a][pp * rows : (pp + 1) * rows],
                                            0.0,
                                        )
                                        for a in range(9)
                                    ]
                                )
                                for tx in range(n)
                            ]
                        )
                        for ty in range(n)
                    ]
                )
                for pp in range(6)
            ]
        )

    conv3d = _tile_conv3d(topology, n, nt, s, dtype)
    operands.update(
        onehot_send=jnp.asarray(onehot_send, dtype=dtype),
        route=jnp.asarray(np.eye(8)[route], dtype=dtype),
        flip=jnp.asarray(flip_t, dtype=dtype),
        conv=conv3d,
    )

    # Closure constants (tile-independent): operator matrices + halo mats.
    mats = pe3.tile_halo_mats(nt, nk, s, dtype)
    exw = jnp.asarray(np.asarray(ops.extrap_x3, np.float64)[:, :SS], dtype)
    exe = jnp.asarray(np.asarray(ops.extrap_x3, np.float64)[:, SS:], dtype)
    eys = jnp.asarray(np.asarray(ops.extrap_y3, np.float64)[:, :SS], dtype)
    eyn = jnp.asarray(np.asarray(ops.extrap_y3, np.float64)[:, SS:], dtype)

    # --- perturbation base planes --------------------------------------------
    pert = perturbation_base is not None
    q0c = None
    if pert:
        q0_64 = jnp.asarray(perturbation_base, jnp.float64)
        if rhs0_64 is None:
            from ..models.euler_cubesphere import make_rhs_euler_cubesphere

            rhs0_64 = make_rhs_euler_cubesphere(
                geom, ops, metric, topology=topology, dtype=jnp.float64, interior="xla"
            )(q0_64)
        t_x, t_y = _global_base_traces(q0_64, ops)
        halo0 = _panel_edge_base_halos(t_x, t_y, topology, s)
        q0np = np.asarray(q0_64)
        rhs0np = np.asarray(rhs0_64)
        t_x, t_y, halo0 = np.asarray(t_x), np.asarray(t_y), np.asarray(halo0)
        mats64 = pe3.tile_halo_mats(nt, nk, s, jnp.float64)

        def tile_base(pp, ty, tx):
            ey0, ex0 = ty * nt, tx * nt
            q0t = pe3.pack_tile_jnp(
                jnp.asarray(q0np[:, pp, :, ey0 : ey0 + nt, ex0 : ex0 + nt]),
                nt, nk, s, state_fill=True,
            )
            r0t = pe3.pack_tile_jnp(
                jnp.asarray(rhs0np[:, pp, :, ey0 : ey0 + nt, ex0 : ex0 + nt]), nt, nk, s
            )
            # Base halo faces (5, nk, nt, ss): interior tile edges read the
            # neighbour element's outward trace; panel edges the exchanged+
            # rotated pool.
            w0h = (
                t_x[:, pp, :, ey0 : ey0 + nt, ex0 - 1, SS:]
                if tx > 0 else halo0[:, WEST, pp, :, ey0 : ey0 + nt]
            )
            e0h = (
                t_x[:, pp, :, ey0 : ey0 + nt, ex0 + nt, :SS]
                if tx < n - 1 else halo0[:, EAST, pp, :, ey0 : ey0 + nt]
            )
            s0h = (
                t_y[:, pp, :, ey0 - 1, ex0 : ex0 + nt, SS:]
                if ty > 0 else halo0[:, SOUTH, pp, :, ex0 : ex0 + nt]
            )
            n0h = (
                t_y[:, pp, :, ey0 + nt, ex0 : ex0 + nt, :SS]
                if ty < n - 1 else halo0[:, NORTH, pp, :, ex0 : ex0 + nt]
            )
            hwe0, hs0, hn0 = pe3.format_tile_halos(
                *(jnp.asarray(a) for a in (w0h, e0h, s0h, n0h)), nt, nk, s, mats64
            )
            # Base outward trace pools + edge element strips of THIS tile
            # (the shard body's delta extrapolation pivots).
            wst0 = t_x[:, pp, :, ey0 : ey0 + nt, ex0, :SS]
            est0 = t_x[:, pp, :, ey0 : ey0 + nt, ex0 + nt - 1, SS:]
            sth0 = t_y[:, pp, :, ey0, ex0 : ex0 + nt, :SS]
            nth0 = t_y[:, pp, :, ey0 + nt - 1, ex0 : ex0 + nt, SS:]
            w0s = q0np[:, pp, :, ey0 : ey0 + nt, ex0]
            e0s = q0np[:, pp, :, ey0 : ey0 + nt, ex0 + nt - 1]
            s0s = q0np[:, pp, :, ey0, ex0 : ex0 + nt]
            n0s = q0np[:, pp, :, ey0 + nt - 1, ex0 : ex0 + nt]
            return dict(
                q0p=q0t, rhs0p=r0t, hwe0=hwe0, hs0=hs0, hn0=hn0,
                wst0=wst0, est0=est0, sth0=sth0, nth0=nth0,
                w0s=w0s, e0s=e0s, s0s=s0s, n0s=n0s,
            )

        planes = [tile_base(pp, ty, tx) for pp in range(6) for ty in range(n) for tx in range(n)]
        for key in planes[0]:
            stk = jnp.stack([jnp.asarray(pl[key], jnp.float64) for pl in planes])
            operands[f"b_{key}"] = jnp.asarray(stk, dtype).reshape(
                (6, n, n) + stk.shape[1:]
            )
        q0c = jnp.asarray(q0_64, dtype)

    # --- shard body ------------------------------------------------------------
    state_spec = P(None, "panel", None, "y", "x", None)
    op_specs = {k: P("panel", "y", "x") for k in operands}

    def shard_step(q, ops_):
        f = {k: v[0, 0, 0] for k, v in ops_.items()}
        con = pe3.E3Constants(
            sqrtg=f["c0"], inv_sqrtg=f["c1"], inv_dzdeta=f["c2"],
            h=tuple(f[f"c{3 + i}"] for i in range(6)),
            chs=tuple(f[f"c{9 + i}"] for i in range(18)),
            wpres_int=f["c27"],
            itf_xy=tuple(f[f"c{28 + i}"] for i in range(5)),
            itf_z=tuple(f[f"c{33 + i}"] for i in range(5)),
            tch=tuple(f["tch"][a] for a in range(9)) if with_tch else None,
            e_xy=c00.e_xy, e_z=c00.e_z, dd=c00.dd, dlp=c00.dlp,
            corr=c00.corr, lfc_xy=c00.lfc_xy, lfc_z=c00.lfc_z, hfk=c00.hfk,
            itf_y=tuple(f[f"c{38 + i}"] for i in range(5)) if split else None,
            e_y=c00.e_y, lfc_y=c00.lfc_y,
        )
        base = None
        if pert:
            base = {
                "q0": f["b_q0p"], "rhs0": f["b_rhs0p"],
                "hwe0": f["b_hwe0"], "hs0": f["b_hs0"], "hn0": f["b_hn0"],
            }
        # Absolute-state pads need the NaN-safe fill (log-space rows);
        # perturbation pads are zero deltas around the safe-filled base.
        qp = pe3.pack_tile_jnp(q[:, 0], nt, nk, s, state_fill=not pert)

        logd = lambda d, b: jnp.concatenate(
            [jnp.log1p(d[0:1] / b[0:1]), d[1:4], jnp.log1p(d[4:5] / b[4:5])], axis=0
        )
        comb = lambda raw, t0: jnp.concatenate(
            [t0[0:1] * jnp.expm1(raw[0:1]), raw[1:4], t0[4:5] * jnp.expm1(raw[4:5])],
            axis=0,
        )
        logged = lambda a: jnp.concatenate(
            [jnp.log(a[0:1]), a[1:4], jnp.log(a[4:5])], axis=0
        )
        expd = lambda a: jnp.concatenate(
            [jnp.exp(a[0:1]), a[1:4], jnp.exp(a[4:5])], axis=0
        )

        def strip_trace(strip, e_half, b0s, t0):
            """Outward face trace (5, nk, nt, ss) of one tile-edge element
            strip (5, nk, nt, s^3): delta form around the base when pert."""
            if pert:
                return comb(logd(strip, b0s) @ e_half, t0)
            return expd(logged(strip) @ e_half)

        def sn_strips(qp_):
            """South/north edge element strips (5, nk, nt, s^3) of the
            packed state (contiguous row slices)."""
            south = qp_[:, :nkxp, : g * S3].reshape(5, nk, nt, S3)
            north = qp_[:, rows - nkxp : rows, : g * S3].reshape(5, nk, nt, S3)
            return south, north

        def we_strips(qp_):
            """West/east edge element strips (5, nk, nt, s^3): first/last
            element of each (ky, kz) grid row."""
            v = qp_[:, :rows, : g * S3].reshape(5, nt, nk, nxp, g, S3)
            west = jnp.swapaxes(v[:, :, :, 0, 0], 1, 2)
            east = jnp.swapaxes(v[:, :, :, -1, -1], 1, 2)
            return west, east

        def out_traces_boot(qp_):
            wstp, estp = we_strips(qp_)
            sstp, nstp = sn_strips(qp_)
            wt = strip_trace(wstp, exw, f.get("b_w0s"), f.get("b_wst0"))
            et = strip_trace(estp, exe, f.get("b_e0s"), f.get("b_est0"))
            st = strip_trace(sstp, eys, f.get("b_s0s"), f.get("b_sth0"))
            ntr = strip_trace(nstp, eyn, f.get("b_n0s"), f.get("b_nth0"))
            return wt, et, st, ntr

        def we_from_slabs(we):
            """Kernel-emitted (5, tynk_pad, 128) west/east slabs ->
            (w, e) traces (5, nk, nt, ss)."""
            rowsv = we[:, :tynk].reshape(5, nt, nk, 128)
            w = jnp.swapaxes(rowsv[..., :SS], 1, 2)
            e = jnp.swapaxes(rowsv[..., T - SS : T], 1, 2)
            return w, e

        def halos_of(wt, et, st, ntr):
            traces = jnp.stack([st, ntr, wt, et])  # (4, 5, nk, nt, ss)
            rounds = [jax.lax.ppermute(traces[d], axes, shift_perms[d]) for d in range(4)]
            rounds += [
                jax.lax.ppermute(
                    jnp.tensordot(f["onehot_send"][c], traces, axes=1), axes, color_perms[c]
                )
                for c in range(4)
            ]
            received = jnp.stack(rounds)  # (8, 5, nk, nt, ss)

            def halo_for(d):
                buf = jnp.tensordot(f["route"][d], received, axes=1)  # (5, nk, nt, ss)
                split = buf.reshape(5, nk, nt, s, s)
                flipped = split[:, :, ::-1, :, ::-1].reshape(buf.shape)
                buf = jnp.where(f["flip"][d] > 0.5, flipped, buf)
                cmat = f["conv"][d]  # (nt, s, 2, 2)
                v1 = buf[IDX_RHO_U1].reshape(nk, nt, s, s)
                v2 = buf[IDX_RHO_U2].reshape(nk, nt, s, s)
                co = lambda i, j: cmat[None, :, None, :, i, j]
                b1 = (co(0, 0) * v1 + co(0, 1) * v2).reshape(nk, nt, SS)
                b2 = (co(1, 0) * v1 + co(1, 1) * v2).reshape(nk, nt, SS)
                return jnp.concatenate(
                    [buf[:IDX_RHO_U1], b1[None], b2[None], buf[IDX_RHO_U2 + 1 :]], axis=0
                )

            return pe3.format_tile_halos(
                halo_for(WEST), halo_for(EAST), halo_for(SOUTH), halo_for(NORTH),
                nt, nk, s, mats,
            )

        dt_ = jnp.asarray(dt, dtype=dtype)
        coeffs = (
            (0.0, 1.0, dt_),
            (0.75, 0.25, 0.25 * dt_),
            (1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt_),
        )
        x = qp
        y = qp
        halos = halos_of(*out_traces_boot(qp))
        for i, (a, b, cdt) in enumerate(coeffs):
            y, we = pe3.km3_tile(
                y, *halos, con, nt, nk, s, x=x, cdt=cdt,
                stage_a=float(a), stage_b=float(b), emit_slabs=True,
                interpret=interp, base=base,
            )
            if i < 2:
                st, ntr = (
                    strip_trace(sp, eh, f.get(bk), f.get(tk))
                    for sp, eh, bk, tk in zip(
                        sn_strips(y), (eys, eyn), ("b_s0s", "b_n0s"), ("b_sth0", "b_nth0")
                    )
                )
                halos = halos_of(*we_from_slabs(we), st, ntr)
        return pe3.unpack_tile_jnp(y, nt, nk, s)[:, None]

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker would reject (same as the SW path).
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
