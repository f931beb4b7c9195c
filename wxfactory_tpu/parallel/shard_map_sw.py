"""Explicit shard_map + ppermute shallow-water step (panel-per-device).

The GSPMD path (models/shallow_water.py under jit-with-sharding) is the
general, correctness-first distribution: halo gathers lower to whatever
collectives XLA picks. This module is the hand-scheduled hot path for the
canonical 6-device layout (one cubed-sphere panel per device, the
reference's one-rank-per-panel configuration): the whole RHS runs inside
``jax.shard_map`` over a ``('panel',)`` mesh and the halo exchange is FOUR
``lax.ppermute`` collectives — one per *send side*, which makes each
transfer a true permutation (a receive-side organization would not be:
four panels all receive their south halo from panel 5).

Panel-edge geometry (which neighbor, flipped or not, which 2x2 basis
rotation) is baked into per-panel constant arrays sharded over the panel
axis, so the kernel body is uniform code with branchless masked selects —
no data-dependent control flow under jit.

Issued before the interior flux GEMMs, the ppermutes overlap with interior
compute under XLA's latency-hiding scheduler — the reference's
start_communication / interior / end_communication overlap
(rhs/rhs.py:94-105) expressed the TPU way.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common.constants import GRAVITY
from ..geometry.cubed_sphere import CubedSphere2D
from ..geometry.metric import Metric2D
from ..ops.dfr import DFROperators
from .topology import EAST, NORTH, SOUTH, WEST, CubedSphereTopology

IDX_H, IDX_HU1, IDX_HU2 = 0, 1, 2


def _edge_coloring(edges):
    """Proper 4-edge-coloring of the (4-regular, octahedral) panel adjacency
    graph: 12 undirected panel-edges into 4 perfect matchings, so each
    exchange round is an involutive permutation over the 'panel' axis."""
    undirected = []
    seen = set()
    for p in range(6):
        for d in range(4):
            q, e = edges[p][d].neighbor, edges[p][d].neighbor_side
            key = frozenset([(p, d), (q, e)])
            if key not in seen:
                seen.add(key)
                undirected.append(((p, d), (q, e)))
    assert len(undirected) == 12

    colors = {}

    def free(p, c):
        return all(colors.get(i) != c for i, ((a, _), (b, _)) in enumerate(undirected) if p in (a, b))

    def solve(i):
        if i == len(undirected):
            return True
        (a, _), (b, _) = undirected[i]
        for c in range(4):
            if free(a, c) and free(b, c):
                colors[i] = c
                if solve(i + 1):
                    return True
                del colors[i]
        return False

    assert solve(0), "edge coloring failed"
    return undirected, colors


def _build_edge_tables(topology: CubedSphereTopology):
    """Static per-panel tables driving the uniform shard kernel.

    perms[c]            : ppermute pairs of exchange round (color) c
    side_onehot[p,c,d]  : 1.0 if p's color-c edge uses its side d
    flip[p, d]          : 1.0 if the incoming side-d trace must be reversed
    conv[p, d]          : (npts, 2, 2) basis rotation for incoming vectors
    """
    edges = topology.edges
    npts = topology.num_points
    undirected, colors = _edge_coloring(edges)

    partner = [[None] * 4 for _ in range(6)]  # partner[p][c] = q
    side_onehot = np.zeros((6, 4, 4))
    for i, ((p, d), (q, e)) in enumerate(undirected):
        c = colors[i]
        partner[p][c] = q
        partner[q][c] = p
        side_onehot[p, c, d] = 1.0
        side_onehot[q, c, e] = 1.0
    perms = [[(p, partner[p][c]) for p in range(6)] for c in range(4)]

    flip = np.zeros((6, 4))
    conv = np.zeros((6, 4, npts, 2, 2))
    for p in range(6):
        for d in range(4):
            flip[p, d] = 1.0 if edges[p][d].flip else 0.0
            conv[p, d] = edges[p][d].conv_contra
    return perms, side_onehot, flip, conv


def make_shard_map_sw_step(
    geom: CubedSphere2D,
    ops: DFROperators,
    metric: Metric2D,
    mesh: Mesh,
    dt: float,
    dtype=jnp.float64,
) -> Callable:
    """Jitted TVD-RK3 step with the RHS fully inside shard_map.

    `mesh` must have a 'panel' axis of size 6 (panel-per-device). Returns
    (step, sharding): call `step(q_sharded)`; q has the usual global layout
    (3, 6, ny, nx, s^2) placed with the returned NamedSharding.
    """
    if mesh.shape["panel"] != 6:
        raise ValueError("shard_map SW path requires a 6-way 'panel' mesh axis")

    s = ops.num_solpts
    nel = geom.num_elements
    npts = nel * s
    topology = CubedSphereTopology(geom)
    perms, side_onehot_t, flip_t, conv_t = _build_edge_tables(topology)

    c = lambda a: jnp.asarray(a, dtype=dtype)

    consts = dict(
        extrap_x=c(ops.extrap_x),
        extrap_y=c(ops.extrap_z),
        derivative_x=c(ops.derivative_x),
        derivative_y=c(ops.derivative_z),
        correction_we=c(ops.correction_WE),
        correction_sn=c(ops.correction_DU),
    )

    # Per-panel fields, passed through shard_map with P('panel', ...).
    panel_fields = dict(
        sqrtG=c(metric.sqrtG),
        inv_sqrtG=c(metric.inv_sqrtG),
        h11=c(metric.H_contra_11),
        h12=c(metric.H_contra_12),
        h21=c(metric.H_contra_21),
        h22=c(metric.H_contra_22),
        sqrtG_ix=c(metric.sqrtG_itf_i[:, :, 1:, :s]),
        h11_ix=c(metric.H_contra_11_itf_i[:, :, 1:, :s]),
        h21_ix=c(metric.H_contra_21_itf_i[:, :, 1:, :s]),
        sqrtG_jx=c(metric.sqrtG_itf_j[:, 1:, :, :s]),
        h12_jx=c(metric.H_contra_12_itf_j[:, 1:, :, :s]),
        h22_jx=c(metric.H_contra_22_itf_j[:, 1:, :, :s]),
        chr_1_01=c(metric.christoffel_1_01),
        chr_1_02=c(metric.christoffel_1_02),
        chr_2_01=c(metric.christoffel_2_01),
        chr_2_02=c(metric.christoffel_2_02),
        chr_1_11=c(metric.christoffel_1_11),
        chr_1_12=c(metric.christoffel_1_12),
        chr_2_12=c(metric.christoffel_2_12),
        chr_2_22=c(metric.christoffel_2_22),
        side_onehot=jnp.asarray(side_onehot_t, dtype=dtype),
        flip=jnp.asarray(flip_t, dtype=dtype),
        conv=jnp.asarray(conv_t, dtype=dtype),
    )

    def ausm_flux(qL, qR, sqrtG_itf, h_diag, h_off, normal):
        hL, hR = qL[IDX_H], qR[IDX_H]
        aL = jnp.sqrt(GRAVITY * hL * h_diag)
        aR = jnp.sqrt(GRAVITY * hR * h_diag)
        mL = jnp.where(hL * aL != 0.0, qL[normal] / (hL * aL), 0.0)
        mR = jnp.where(hR * aR != 0.0, qR[normal] / (hR * aR), 0.0)
        big_m = 0.25 * ((mL + 1.0) ** 2 - (mR - 1.0) ** 2)
        flux = sqrtG_itf * (jnp.maximum(0.0, big_m) * aL * qL + jnp.minimum(0.0, big_m) * aR * qR)
        half_g = 0.5 * GRAVITY
        pd = 0.5 * ((1.0 + mL) * sqrtG_itf * half_g * h_diag * hL**2 + (1.0 - mR) * sqrtG_itf * half_g * h_diag * hR**2)
        po = 0.5 * ((1.0 + mL) * sqrtG_itf * half_g * h_off * hL**2 + (1.0 - mR) * sqrtG_itf * half_g * h_off * hR**2)
        rows = (IDX_HU1, IDX_HU2) if normal == IDX_HU1 else (IDX_HU2, IDX_HU1)
        flux = flux.at[rows[0]].add(pd)
        flux = flux.at[rows[1]].add(po)
        return flux

    def local_rhs(q, f):
        """RHS body for ONE panel. q: (3, ny, nx, s^2); f: per-panel consts."""
        h = q[IDX_H]
        hu1 = q[IDX_HU1]
        hu2 = q[IDX_HU2]
        u1 = hu1 / h
        u2 = hu2 / h

        itf_x = q @ consts["extrap_x"]  # (3, ny, nx, 2s)
        itf_y = q @ consts["extrap_y"]

        # ---- Halo exchange: four edge-colored ppermute rounds (each an
        # involutive permutation), issued first so the transfers overlap the
        # interior GEMMs below. Each round, a panel exchanges across the one
        # edge of that color; the per-panel one-hot picks which side.
        traces = jnp.stack(
            [
                itf_y[..., 0, :, :s].reshape(3, npts),  # SOUTH
                itf_y[..., -1, :, s:].reshape(3, npts),  # NORTH
                itf_x[..., :, 0, :s].reshape(3, npts),  # WEST
                itf_x[..., :, -1, s:].reshape(3, npts),  # EAST
            ]
        )  # (4, 3, npts)
        received = [
            jax.lax.ppermute(
                jnp.tensordot(f["side_onehot"][c], traces, axes=1), "panel", perms[c]
            )
            for c in range(4)
        ]

        # ---- Interior pointwise fluxes + derivative GEMMs (overlap window).
        hsq = h * h
        fx = jnp.stack([
            f["sqrtG"] * hu1,
            f["sqrtG"] * (hu1 * u1 + 0.5 * GRAVITY * f["h11"] * hsq),
            f["sqrtG"] * (hu2 * u1 + 0.5 * GRAVITY * f["h21"] * hsq),
        ])
        fy = jnp.stack([
            f["sqrtG"] * hu2,
            f["sqrtG"] * (hu1 * u2 + 0.5 * GRAVITY * f["h12"] * hsq),
            f["sqrtG"] * (hu2 * u2 + 0.5 * GRAVITY * f["h22"] * hsq),
        ])
        df1 = fx @ consts["derivative_x"]
        df2 = fy @ consts["derivative_y"]

        # ---- Route received buffers to local sides, flip, rotate.
        def halo_for(d):
            buf = sum(f["side_onehot"][c, d] * received[c] for c in range(4))
            flipped = jnp.where(f["flip"][d] > 0.5, buf[:, ::-1], buf)
            cmat = f["conv"][d]  # (npts, 2, 2)
            b1 = cmat[:, 0, 0] * flipped[IDX_HU1] + cmat[:, 0, 1] * flipped[IDX_HU2]
            b2 = cmat[:, 1, 0] * flipped[IDX_HU1] + cmat[:, 1, 1] * flipped[IDX_HU2]
            return jnp.stack([flipped[IDX_H], b1, b2])

        halo_w = halo_for(WEST).reshape(3, nel, 1, s)
        halo_e = halo_for(EAST).reshape(3, nel, 1, s)
        halo_s = halo_for(SOUTH).reshape(3, 1, nel, s)
        halo_n = halo_for(NORTH).reshape(3, 1, nel, s)

        # ---- Per-interface AUSM fluxes + correction GEMMs.
        qL_x = jnp.concatenate([halo_w, itf_x[..., s:]], axis=-2)
        qR_x = jnp.concatenate([itf_x[..., :s], halo_e], axis=-2)
        qL_y = jnp.concatenate([halo_s, itf_y[..., s:]], axis=-3)
        qR_y = jnp.concatenate([itf_y[..., :s], halo_n], axis=-3)

        f_x = ausm_flux(qL_x, qR_x, f["sqrtG_ix"], f["h11_ix"], f["h21_ix"], IDX_HU1)
        f_y = ausm_flux(qL_y, qR_y, f["sqrtG_jx"], f["h22_jx"], f["h12_jx"], IDX_HU2)

        faces_x = jnp.concatenate([f_x[..., :-1, :], f_x[..., 1:, :]], axis=-1)
        faces_y = jnp.concatenate([f_y[..., :-1, :, :], f_y[..., 1:, :, :]], axis=-1)
        df1 = df1 + faces_x @ consts["correction_we"]
        df2 = df2 + faces_y @ consts["correction_sn"]

        forcing_1 = (
            2.0 * (f["chr_1_01"] * hu1 + f["chr_1_02"] * hu2)
            + f["chr_1_11"] * hu1 * u1
            + 2.0 * f["chr_1_12"] * hu1 * u2
        )
        forcing_2 = (
            2.0 * (f["chr_2_01"] * hu1 + f["chr_2_02"] * hu2)
            + 2.0 * f["chr_2_12"] * hu1 * u2
            + f["chr_2_22"] * hu2 * u2
        )
        forcing = jnp.stack([jnp.zeros_like(forcing_1), forcing_1, forcing_2])
        return f["inv_sqrtG"] * (-df1 - df2) - forcing

    field_names = list(panel_fields.keys())
    field_values = [panel_fields[k] for k in field_names]
    # Metric/routing constants are per-panel: shard their leading axis.
    field_specs = [P("panel") for _ in field_names]

    state_spec = P(None, "panel", None, None, None)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_spec, *field_specs),
        out_specs=state_spec,
    )
    def shard_step(q, *fields):
        f = dict(zip(field_names, [x[0] for x in fields]))  # drop the local panel axis
        q = q[:, 0]  # (3, ny, nx, s^2) local panel

        def rhs(qq):
            return local_rhs(qq, f)

        dt_ = jnp.asarray(dt, dtype=dtype)
        q1 = q + rhs(q) * dt_
        q2 = 0.75 * q + 0.25 * (q1 + rhs(q1) * dt_)
        q3 = q / 3.0 + 2.0 / 3.0 * (q2 + rhs(q2) * dt_)
        return q3[:, None]

    sharding = NamedSharding(mesh, state_spec)

    @jax.jit
    def step(q):
        return shard_step(q, *field_values)

    return step, sharding
