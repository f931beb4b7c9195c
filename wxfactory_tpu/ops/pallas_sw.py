"""Fused Pallas TPU pipeline for the shallow-water DFR RHS.

Two kernels cover the whole spatial operator (reference rhs/rhs_sw.py:38-240);
between them only the tiny panel-edge halo computation (``parallel/topology``)
runs in XLA on ~KB-sized edge arrays.

Layout. The packed state view is ``(R, 128)`` with ``R = 6*nel^2/8`` rows of
``g = 8`` consecutive elements x ``s^2 = 16`` solution points (f32 lane width
128, zero padding). Element ``e = (p*nel + ey)*nel + ex`` sits at row
``e // 8``, lane group ``ex % 8`` (requires ``nel % 8 == 0`` so element-grid
rows tile position-rows exactly). Face traces use the matching ``(R, 128)``
layout ``[x half | y half]``: lane ``dir*64 + group*8 + face*4 + k`` holds
face value ``k`` of the west/east (x) or south/north (y) face. Every
array the two kernels exchange is bit-contiguous in this row order, so all
inter-kernel reshapes are free — the relayout copies that dominate the pure
XLA schedule (profiled at ~30% of RHS time) disappear.

K1 (``_k1_kernel``): per block of packed rows — extrapolation GEMM to both
direction traces at once (one ``(128,128)`` matmul per variable), pointwise
sqrt(g)-weighted fluxes, interior-divergence GEMM, Coriolis/Christoffel
forcing. Flux fields live only in VMEM.

K2 (``_k2_kernel``): per panel — assembles the left/right interface states
with ``pltpu.roll`` shifts (neighbour element faces are one lane-group or one
position-row away; panel-edge slots are patched from the halo-filled ``E``
array), evaluates the AUSM Mach-splitting flux for BOTH directions in one
vector pass (x in lanes 0..63, y in 64..127), places the per-element face
fluxes, applies the boundary-correction GEMM (block-diagonal ``(128,128)``
operator) and produces the final ``df - 1/sqrt(g)*corr`` update.

Reference semantics: rhs/rhs_sw.py:120-131 (pointwise), :170-207 (AUSM),
:223-238 (forcing + assembly). f32 operating point; the XLA path remains the
float64 parity reference.
"""

import functools
import types
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common.constants import GRAVITY
from . import kernel_precision as _kernel_precision

_KP = _kernel_precision()

G8 = 8  # elements per packed row
S = 4  # num_solpts this pipeline is specialized for (s^2=16, 2s=8)
S2 = S * S
LANES = G8 * S2  # 128


def supported(num_solpts: int, nel: int, dtype) -> bool:
    """Shapes/dtypes the fused pipeline handles; others fall back to XLA.

    float64 is accepted only off-TPU (pallas interpret mode, used by the
    parity tests); Mosaic has no f64 vector path."""
    if num_solpts != S or nel % G8 != 0:
        return False
    if dtype in (jnp.float32, np.float32):
        return True
    return dtype in (jnp.float64, np.float64) and jax.default_backend() != "tpu"


class SWConstants(NamedTuple):
    """Trace-time constants for the fused kernels (all device arrays).

    Every *geometric* metric field is identical on all six panels of the
    equiangular cubed sphere (a rigid rotation of the sphere leaves the
    panel-local metric unchanged), so those are stored for ONE panel only
    (R/6 rows) and the kernels' panel-major grid order re-reads them from
    VMEM instead of HBM. Only the rotation factor ``gridrot`` (the
    panel-dependent part of the Coriolis Christoffels, metric.py:93) is
    kept full-size: K1's constant traffic drops from 13 full fields to
    one full field + 13 single-panel fields (~4x less HBM)."""

    fields: tuple  # 13 single-panel metric fields (R/6, 128) for K1
    gridrot: jnp.ndarray  # (R, 128) panel-dependent Coriolis rotation factor
    eexy: jnp.ndarray  # (128, 128) fused [extrap_x | extrap_y] block-diag
    dd: jnp.ndarray  # (256, 128) stacked block-diag [Dx ; Dy]
    m_sg: jnp.ndarray  # (R/6, 128) interface sqrt(g) in trace layout
    m_hd: jnp.ndarray  # (R/6, 128) interface H^11 (x half) / H^22 (y half)
    m_ho: jnp.ndarray  # (R/6, 128) interface H^21 (x half) / H^12 (y half)
    wmat: jnp.ndarray  # (128, 128) faces -> correction block-diag GEMM
    spread: jnp.ndarray  # (128, 128) flat edge lanes -> y-h1 trace slots


def _edge_selectors(nel: int, prows: int, rpr: int):
    """One-hot row selectors (lw, le): element-grid row y's west/east element
    row within a panel (host-side, float64)."""
    lw = np.zeros((nel, prows), np.float64)
    le = np.zeros((nel, prows), np.float64)
    for y in range(nel):
        lw[y, y * rpr] = 1.0
        le[y, y * rpr + rpr - 1] = 1.0
    return lw, le


def _pwe() -> np.ndarray:
    """One-hot (36, 72) matrix reordering the flat halo rows (v*24 + side*6
    + panel, W/E sides only) into KM's panel-major (p, v, side) order."""
    pwe = np.zeros((36, 72), np.float64)
    for p in range(6):
        for v in range(3):
            for side in range(2):
                pwe[(p * 3 + v) * 2 + side, v * 24 + 12 + side * 6 + p] = 1.0
    return pwe


def _block_diag(a: np.ndarray, reps: int) -> np.ndarray:
    r, c = a.shape
    out = np.zeros((reps * r, reps * c), a.dtype)
    for k in range(reps):
        out[k * r : (k + 1) * r, k * c : (k + 1) * c] = a
    return out


def build_constants(ops, metric, nel: int, dtype=jnp.float32) -> SWConstants:
    """Precompute every constant array of the fused SW pipeline (host-side)."""
    s, s2 = S, S2
    rows = 6 * nel * nel // G8
    rpr = nel // G8

    eexy = np.concatenate(
        [_block_diag(np.asarray(ops.extrap_x), G8), _block_diag(np.asarray(ops.extrap_z), G8)],
        axis=1,
    )  # (128, 128)
    dd = np.concatenate(
        [_block_diag(np.asarray(ops.derivative_x), G8), _block_diag(np.asarray(ops.derivative_z), G8)],
        axis=0,
    )  # (256, 128)

    # H^21 == H^12 (symmetric metric tensor): read it once — K1 is
    # HBM-bound on these constants, so every dropped field is ~2 us/RHS.
    # All geometric fields are panel-identical (the equiangular metric
    # does not see the sphere rotation), so store one panel only; the
    # Coriolis Christoffels factor as gridrot * (single-panel factor).
    prows_full = rows // 6
    packed = lambda a: np.asarray(a, np.float64).reshape(rows, LANES)

    def panel0(a):
        full = packed(a)
        one = full[:prows_full]
        assert np.array_equal(full.reshape(6, prows_full, LANES), np.broadcast_to(one, (6, prows_full, LANES))), (
            "metric field unexpectedly differs across panels"
        )
        return one

    fields = tuple(
        jnp.asarray(panel0(a), dtype=dtype)
        for a in (
            metric.sqrtG, metric.H_contra_11, metric.H_contra_12,
            metric.H_contra_22,
            metric.coriolis_factor_1_01, metric.coriolis_factor_1_02,
            metric.coriolis_factor_2_01, metric.coriolis_factor_2_02,
            metric.christoffel_1_11, metric.christoffel_1_12,
            metric.christoffel_2_12, metric.christoffel_2_22,
            metric.inv_sqrtG,
        )
    )
    gridrot = jnp.asarray(packed(np.broadcast_to(metric.gridrot, metric.sqrtG.shape)), dtype=dtype)

    # Interface-metric arrays in the trace layout. h1 slots carry the metric
    # at the element's west/south interface; h2 slots default to 1.0 (their
    # AUSM output is discarded) except at panel-edge elements, where they
    # carry the east/north boundary-interface metric so the main vector pass
    # also computes the two boundary fluxes of each row/column.
    sg_ix = np.asarray(metric.sqrtG_itf_i, np.float64)[:, :, 1:, :s]  # (6, nel, nel+1, s)
    h11_ix = np.asarray(metric.H_contra_11_itf_i, np.float64)[:, :, 1:, :s]
    h21_ix = np.asarray(metric.H_contra_21_itf_i, np.float64)[:, :, 1:, :s]
    sg_jx = np.asarray(metric.sqrtG_itf_j, np.float64)[:, 1:, :, :s]  # (6, nel+1, nel, s)
    h22_jx = np.asarray(metric.H_contra_22_itf_j, np.float64)[:, 1:, :, :s]
    h12_jx = np.asarray(metric.H_contra_12_itf_j, np.float64)[:, 1:, :, :s]

    def itf_layout(mx, my):
        """mx: (6, nel, nel+1, s), my: (6, nel+1, nel, s) -> single-panel
        (rows/6, 128) — the interface metric is panel-identical too."""
        for a in (mx, my):
            assert np.array_equal(a, np.broadcast_to(a[:1], a.shape)), "itf metric differs across panels"
        out = np.ones((nel, rpr, 2, G8, 2, s))  # (ey, rpos, dir, grp, half, k)
        p = 0
        for ey in range(nel):
            for ex in range(nel):
                r, grp = ex // G8, ex % G8
                out[ey, r, 0, grp, 0] = mx[p, ey, ex]  # west interface
                out[ey, r, 1, grp, 0] = my[p, ey, ex]  # south interface
            out[ey, rpr - 1, 0, G8 - 1, 1] = mx[p, ey, nel]  # east edge
        for ex in range(nel):
            r, grp = ex // G8, ex % G8
            out[nel - 1, r, 1, grp, 1] = my[p, nel, ex]  # north edge
        return out.reshape(prows_full, LANES)

    m_sg = itf_layout(sg_ix, sg_jx)
    m_hd = itf_layout(h11_ix, h22_jx)
    m_ho = itf_layout(h21_ix, h12_jx)

    # Correction operator: faces (dir, grp, half, k) -> packed (grp, s^2).
    cw = np.asarray(ops.correction_WE)  # (2s, s^2)
    cs = np.asarray(ops.correction_DU)
    wmat = np.zeros((LANES, LANES))
    for grp in range(G8):
        for half in range(2):
            for k in range(s):
                wmat[0 * 64 + grp * 2 * s + half * s + k, grp * s2 : (grp + 1) * s2] = cw[half * s + k]
                wmat[1 * 64 + grp * 2 * s + half * s + k, grp * s2 : (grp + 1) * s2] = cs[half * s + k]

    # In-kernel south/north halo placement: flat edge lane j = 4*g + k of a
    # 32-lane window maps to trace slot 64 + 8*g + k (y h1); north adds +4
    # via a lane roll in the kernel.
    spread = np.zeros((LANES, LANES))
    for j in range(32):
        spread[j, 64 + 8 * (j // 4) + (j % 4)] = 1.0

    c = lambda a: jnp.asarray(a, dtype=dtype)
    return SWConstants(fields, gridrot, c(eexy), c(dd), c(m_sg), c(m_hd), c(m_ho), c(wmat), c(spread))


# ---------------------------------------------------------------------------
# KE: edge-trace kernel (bootstrap of the chained pipeline, and the first
# kernel of the plain RHS path). Extrapolates the state to both direction
# traces and emits ONLY the panel-edge slabs the halo stage needs; the mega
# kernel KM recomputes interior traces in VMEM.


def _make_ke(rpr: int, prows: int, nel: int):
    """KE kernel body: one panel per program. Emits
      * ``we``: one row per element-grid row, west boundary-face trace at
        lanes 0..s-1 and east at 64-s..63 (native trace lanes); compaction
        of rows rmod==0 / rmod==rpr-1 is an exact one-hot GEMM.
      * ``s``/``n``: the panel's first/last `rpad` trace rows in native
        layout (rpad = rpr rounded up to 8 for Mosaic sublane tiling; the
        south edge is the first rpr rows, the north edge the last rpr).
    """
    rpad = -(-rpr // 8) * 8

    def kernel(q_ref, eexy_ref, lw_ref, le_ref, we_ref, s_ref, n_ref):
        mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=we_ref.dtype)
        eexy = eexy_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nel, LANES), 1)
        wmask = lane < S
        emask = (lane >= 64 - S) & (lane < 64)
        lw = lw_ref[...]
        le = le_ref[...]
        for v in range(3):
            tr = mm(q_ref[v], eexy)
            we_ref[v] = jnp.where(wmask, mm(lw, tr), 0.0) + jnp.where(emask, mm(le, tr), 0.0)
            s_ref[v] = tr[0:rpad]
            n_ref[v] = tr[prows - rpad : prows]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpr", "interpret"))
def ke_edges(q, eexy, rpr: int, interpret: bool = False):
    """q: (3, R, 128) packed state. Returns the panel-edge trace slabs
    (we, s, n): we (3, 6*nel, 128); s/n (3, 6*rpad, 128), panel-major."""
    rows = q.shape[1]
    prows = rows // 6
    nel = prows // rpr
    rpad = -(-rpr // 8) * 8

    lw, le = _edge_selectors(nel, prows, rpr)
    lw = jnp.asarray(lw, dtype=q.dtype)
    le = jnp.asarray(le, dtype=q.dtype)

    zero = np.int32(0)
    outs = pl.pallas_call(
        _make_ke(rpr, prows, nel),
        grid=(6,),
        in_specs=[
            pl.BlockSpec((3, prows, LANES), lambda p: (zero, p, zero)),
            pl.BlockSpec((LANES, LANES), lambda p: (zero, zero)),
            pl.BlockSpec((nel, prows), lambda p: (zero, zero)),
            pl.BlockSpec((nel, prows), lambda p: (zero, zero)),
        ],
        out_specs=[
            pl.BlockSpec((3, nel, LANES), lambda p: (zero, p, zero)),
            pl.BlockSpec((3, rpad, LANES), lambda p: (zero, p, zero)),
            pl.BlockSpec((3, rpad, LANES), lambda p: (zero, p, zero)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 6 * nel, LANES), q.dtype),
            jax.ShapeDtypeStruct((3, 6 * rpad, LANES), q.dtype),
            jax.ShapeDtypeStruct((3, 6 * rpad, LANES), q.dtype),
        ],
        interpret=interpret,
        **(
            {}
            if interpret
            else {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}
        ),
    )(q, eexy, lw, le)
    return outs


# ---------------------------------------------------------------------------
# KH: the panel-edge halo exchange as one tiny kernel. The XLA version
# (topology.exchange_pool + the 2x2 rotation) is ~11 small HLO ops at ~2 us
# fixed cost each (~20 us/RHS); in VMEM the same one-hot matmuls and
# elementwise combines cost ~2 us total.


class HaloConstants(NamedTuple):
    """Constant tables for the fused halo-exchange kernel."""

    perm72: jnp.ndarray  # (72, 72) block-diag neighbor permutation x 3 vars
    rev: jnp.ndarray  # (npts, npts) edge-reversal one-hot
    flip: jnp.ndarray  # (72, 1) 1.0 where the received edge is flipped
    conv: jnp.ndarray  # (4, 24, npts) stacked 2x2 contravariant rotation


def build_halo_constants(topology, dtype=jnp.float32) -> HaloConstants:
    """Precompute the KH tables from a CubedSphereTopology (host-side)."""
    npts = topology.num_points
    perm = np.zeros((24, 24))
    perm[np.arange(24), topology._edge_src] = 1.0
    perm72 = np.kron(np.eye(3), perm)
    rev = np.eye(npts)[::-1].copy()
    flip = np.tile(topology._flip_mask.astype(np.float64), 3)[:, None]
    cc = topology._conv_contra_all  # (4, 6, npts, 2, 2)
    conv = np.stack(
        [cc[..., 0, 0], cc[..., 0, 1], cc[..., 1, 0], cc[..., 1, 1]]
    ).reshape(4, 24, npts)
    c = lambda a: jnp.asarray(a, dtype=dtype)
    return HaloConstants(c(perm72), c(rev), c(flip), c(conv))


def _halo_math(flat, perm, rev, flip, conv, pwe, npts: int, npl: int):
    """The panel-edge exchange on flat edges: neighbor permutation, edge
    flips, 2x2 contravariant basis rotation of the momenta (reference
    process_topology.py start_exchange_* semantics). flat: (72, npts) rows
    ``v*24 + side*6 + panel`` in (S, N, W, E) side order. Returns
    (hwe (6,3,2,npts), hs (3,6,1,npl), hn (3,6,1,npl))."""
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=flat.dtype)
    ex = mm(perm, flat)
    flipped = mm(ex, rev)
    ex = flip * flipped + (1.0 - flip) * ex
    a1 = ex[24:48]
    a2 = ex[48:72]
    b1 = conv[0] * a1 + conv[1] * a2
    b2 = conv[2] * a1 + conv[3] * a2
    halo = jnp.concatenate([ex[0:24], b1, b2], axis=0)  # (72, npts) v-major

    cat = lambda slabs: jnp.concatenate(slabs, axis=0)
    pad = lambda a: (
        a if npl == npts else jnp.concatenate([a, jnp.zeros((a.shape[0], npl - npts), a.dtype)], axis=-1)
    )
    hs = pad(cat([halo[v * 24 : v * 24 + 6] for v in range(3)])).reshape(3, 6, 1, npl)
    hn = pad(cat([halo[v * 24 + 6 : v * 24 + 12] for v in range(3)])).reshape(3, 6, 1, npl)
    # KM consumes the flat edges panel-major (its per-panel block spec
    # needs the blocked axis leading): rows (p, v, side) via one-hot.
    hwe = mm(pwe, halo).reshape(6, 3, 2, npts)
    return hwe, hs, hn


def _make_kh(npts: int, npl: int):
    def kernel(pool_ref, perm_ref, rev_ref, flip_ref, conv_ref, pwe_ref, we_ref, hs_ref, hn_ref):
        flat = pool_ref[...].reshape(72, npts)
        hwe, hs, hn = _halo_math(
            flat, perm_ref[...], rev_ref[...], flip_ref[...], conv_ref[...], pwe_ref[...], npts, npl
        )
        we_ref[...] = hwe
        hs_ref[...] = hs
        hn_ref[...] = hn

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def kh_exchange(pool, hc: HaloConstants, interpret: bool = False):
    """pool: (3, 4, 6, npts) outgoing traces in (S, N, W, E) side order.
    Applies the neighbor permutation, edge flips and the momentum 2x2
    panel-basis rotation (= topology.exchange_pool + rotation; reference
    process_topology.py start_exchange_* semantics) and emits KM-ready
    arrays: hwe (6, 3, 2, npts) panel-major [west, east] flat edges,
    hs/hn (3, 6, 1, npl) flat lane-padded south/north rows."""
    npts = pool.shape[-1]
    npl = -(-npts // 128) * 128
    pwe = _pwe()
    return pl.pallas_call(
        _make_kh(npts, npl),
        out_shape=[
            jax.ShapeDtypeStruct((6, 3, 2, npts), pool.dtype),
            jax.ShapeDtypeStruct((3, 6, 1, npl), pool.dtype),
            jax.ShapeDtypeStruct((3, 6, 1, npl), pool.dtype),
        ],
        interpret=interpret,
    )(pool.reshape(3, 24, npts), hc.perm72, hc.rev, hc.flip, hc.conv,
      jnp.asarray(pwe, dtype=pool.dtype))


# ---------------------------------------------------------------------------
# Shared per-panel stage math (used by KM and the whole-run kernel KR).
# All helpers take/return VMEM *values*; the kernels do the ref plumbing.


def _masks(rpr: int, prows: int):
    """Slot masks of the packed trace layout (trace-time constants)."""
    shape = (prows, LANES)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    is_x = lane < 64
    h1 = jax.lax.rem(lane, jnp.int32(8)) < S
    rmod = jax.lax.rem(row, jnp.int32(rpr))
    west_slot = is_x & (lane < S) & (rmod == 0)
    east_slot = is_x & (lane >= 64 - S) & (rmod == rpr - 1)
    south_slot = (~is_x) & h1 & (row < rpr)
    north_slot = (~is_x) & (~h1) & (row >= prows - rpr)
    return types.SimpleNamespace(
        rpr=rpr, prows=prows, lane=lane, is_x=is_x, h1=h1,
        west_slot=west_slot, south_slot=south_slot,
        edge_h2=east_slot | north_slot,
    )


def _element_stage(q3, fields, gridrot, dd):
    """Element-local stage: pointwise sqrt(g)-weighted fluxes, interior
    divergence GEMM, Coriolis/Christoffel forcing (reference
    rhs_sw.py:120-131, :223-238). Returns the interior df tuple."""
    (sqrtg, h11, h12, h22, g101, g102, g201, g202,
     c111, c112, c212, c222, invsg) = fields
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=q3[0].dtype)
    half_g = 0.5 * GRAVITY
    h, hu1, hu2 = q3
    u1 = hu1 / h
    u2 = hu2 / h
    hsq = h * h
    cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
    div0 = mm(cat(sqrtg * hu1, sqrtg * hu2), dd)
    div1 = mm(
        cat(
            sqrtg * (hu1 * u1 + half_g * h11 * hsq),
            sqrtg * (hu1 * u2 + half_g * h12 * hsq),
        ),
        dd,
    )
    div2 = mm(
        cat(
            sqrtg * (hu2 * u1 + half_g * h12 * hsq),
            sqrtg * (hu2 * u2 + half_g * h22 * hsq),
        ),
        dd,
    )
    # Time Christoffels factored as gridrot * single-panel factor.
    rot2 = 2.0 * gridrot
    forcing_1 = (
        rot2 * (g101 * hu1 + g102 * hu2) + c111 * hu1 * u1 + 2.0 * c112 * hu1 * u2
    )
    forcing_2 = (
        rot2 * (g201 * hu1 + g202 * hu2) + 2.0 * c212 * hu1 * u2 + c222 * hu2 * u2
    )
    return (-invsg * div0, -invsg * div1 - forcing_1, -invsg * div2 - forcing_2)


def _element_stage_pert(dq3, bq, fields, gridrot, dd):
    """Term-level delta of ``_element_stage`` around the packed base planes
    ``bq = (h0, hu10, hu20, u10, u20)``: d(ab) = da*b + a0*db product rules,
    d(h^2) = (h+h0)*dh, velocity delta du = (d(hu) - u0*dh)/h. The returned
    tuple is the INTERIOR-stage delta (the f64 base RHS is added by the
    caller). Layout-independent; shared by both SW pipelines."""
    (sqrtg, h11, h12, h22, g101, g102, g201, g202,
     c111, c112, c212, c222, invsg) = fields
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=dq3[0].dtype)
    half_g = 0.5 * GRAVITY
    h0, hu10, hu20, u10, u20 = bq
    dh, dhu1, dhu2 = dq3
    h = h0 + dh
    du1 = (dhu1 - u10 * dh) / h
    du2 = (dhu2 - u20 * dh) / h
    u1 = u10 + du1
    u2 = u20 + du2
    hph0 = h + h0
    d11 = dhu1 * u1 + hu10 * du1
    d12 = dhu1 * u2 + hu10 * du2
    d21 = dhu2 * u1 + hu20 * du1
    d22 = dhu2 * u2 + hu20 * du2
    cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
    div0 = mm(cat(sqrtg * dhu1, sqrtg * dhu2), dd)
    div1 = mm(
        cat(
            sqrtg * (d11 + half_g * h11 * hph0 * dh),
            sqrtg * (d12 + half_g * h12 * hph0 * dh),
        ),
        dd,
    )
    div2 = mm(
        cat(
            sqrtg * (d21 + half_g * h12 * hph0 * dh),
            sqrtg * (d22 + half_g * h22 * hph0 * dh),
        ),
        dd,
    )
    rot2 = 2.0 * gridrot
    forcing_1 = rot2 * (g101 * dhu1 + g102 * dhu2) + c111 * d11 + 2.0 * c112 * d12
    forcing_2 = rot2 * (g201 * dhu1 + g202 * dhu2) + 2.0 * c212 * d12 + c222 * d22
    return (-invsg * div0, -invsg * div1 - forcing_1, -invsg * div2 - forcing_2)


def _expand_halo_var(w_row, e_row, hs_row, hn_row, spread, rev, m, nel: int, npl: int):
    """Expand one variable's compact halo edges to full panel trace shape in
    VMEM. hwe holds the west/east panel edges as ONE flat lane-padded row
    each; element-grid row y's west value lives at flat lanes y*s..y*s+s-1
    and must land at lanes 0..s-1 (east: 64-s..63) of its row — a per-row
    DECREASING lane shift. Mosaic's strided rotate only increases, so rows
    are produced grid-reversed (shift base -s*(nel-1), stride +s) and
    un-reversed by a one-hot matmul. Consuming the flat layout directly is
    what kills the XLA-side (3,6,nel,32,4) pad+relayout copy (~16 us/stage,
    a third of the whole step). hs/hn: position-row r of the first/last
    grid row takes its 32-lane window via a lane roll, then one (128,128)
    one-hot matmul spreads it onto the y-face slots. Only slot-masked
    selects ever read the results."""
    rpr, prows = m.rpr, m.prows
    _i32 = lambda v: np.int32(v)
    lanes_we = jax.lax.broadcasted_iota(jnp.int32, (nel, LANES), 1)
    bw = (npl - S * (nel - 1)) % npl
    be = (npl - S * (nel - 1) + (64 - S)) % npl

    w = jnp.repeat(w_row, nel, axis=0)  # (nel, npl), identical rows
    e = jnp.repeat(e_row, nel, axis=0)
    w = pltpu.roll(w, _i32(bw), 1, stride=S, stride_axis=0)[:, :LANES]
    e = pltpu.roll(e, _i32(be), 1, stride=S, stride_axis=0)[:, :LANES]
    wsel = jnp.where(lanes_we < S, w, 0.0)
    esel = jnp.where((lanes_we >= 64 - S) & (lanes_we < 64), e, 0.0)
    we = jax.lax.dot(rev, wsel + esel, precision=_KP, preferred_element_type=w.dtype)

    def expand_sn(src, north):
        npl_ = src.shape[-1]
        rows_ = []
        for r in range(rpr):
            shift = (npl_ - 32 * r) % npl_
            rolled = pltpu.roll(src, _i32(shift), 1) if shift else src
            rows_.append(rolled[:, :LANES])
        b = jnp.concatenate(rows_, axis=0) if rpr > 1 else rows_[0]
        e_ = jax.lax.dot(b, spread, precision=_KP, preferred_element_type=src.dtype)
        if north:
            e_ = pltpu.roll(e_, _i32(4), 1)
            return jnp.pad(e_, ((prows - rpr, 0), (0, 0)))
        return jnp.pad(e_, ((0, prows - rpr), (0, 0)))

    return jnp.repeat(we, rpr, axis=0) + expand_sn(hs_row, False) + expand_sn(hn_row, True)


def _ausm_slots(L, R, msg, mhd, mho, is_x):
    """AUSM Mach-splitting flux on assembled L/R slot values, BOTH
    directions in one vector pass (x in lanes 0..63, y in 64..127) —
    reference rhs_sw.py:170-207. Layout-independent: shared by the s=4 and
    the generic pipelines."""
    half_g = 0.5 * GRAVITY
    hL, hR = L[0], R[0]
    aL = jnp.sqrt(GRAVITY * hL * mhd)
    aR = jnp.sqrt(GRAVITY * hR * mhd)
    qnL = jnp.where(is_x, L[1], L[2])
    qnR = jnp.where(is_x, R[1], R[2])
    tmpL = hL * aL
    tmpR = hR * aR
    mL = jnp.where(tmpL != 0.0, qnL / tmpL, 0.0)
    mR = jnp.where(tmpR != 0.0, qnR / tmpR, 0.0)
    big_m = 0.25 * ((mL + 1.0) ** 2 - (mR - 1.0) ** 2)
    adv_l = jnp.maximum(0.0, big_m) * aL
    adv_r = jnp.minimum(0.0, big_m) * aR
    f = [msg * (adv_l * l + adv_r * r) for l, r in zip(L, R)]
    pres_l = (1.0 + mL) * (msg * half_g) * (hL * hL)
    pres_r = (1.0 - mR) * (msg * half_g) * (hR * hR)
    pres_diag = 0.5 * (mhd * pres_l + mhd * pres_r)
    pres_off = 0.5 * (mho * pres_l + mho * pres_r)
    f[1] = f[1] + jnp.where(is_x, pres_diag, pres_off)
    f[2] = f[2] + jnp.where(is_x, pres_off, pres_diag)
    return f


def _ausm_delta_slots(L0, R0, dL, dR, msg, mhd, mho, is_x):
    """Term-level delta of ``_ausm_slots`` around base slot values
    (L0, R0): exact product-rule expansions everywhere, sound speed via
    d(sqrt) = g*mhd*dh/(a+a0), Mach ratios by direct subtraction (smooth
    state ratios). Twin of the jnp ``ausm_delta`` in
    models/shallow_water.py; see that docstring for the math."""
    hL0, hR0 = L0[0], R0[0]
    dhL, dhR = dL[0], dR[0]
    hL, hR = hL0 + dhL, hR0 + dhR
    aL0 = jnp.sqrt(GRAVITY * hL0 * mhd)
    aR0 = jnp.sqrt(GRAVITY * hR0 * mhd)
    aL = jnp.sqrt(GRAVITY * hL * mhd)
    aR = jnp.sqrt(GRAVITY * hR * mhd)
    daL = jnp.where(aL + aL0 > 0.0, GRAVITY * mhd * dhL / (aL + aL0), 0.0)
    daR = jnp.where(aR + aR0 > 0.0, GRAVITY * mhd * dhR / (aR + aR0), 0.0)
    qn0L = jnp.where(is_x, L0[1], L0[2])
    qn0R = jnp.where(is_x, R0[1], R0[2])
    dqnL = jnp.where(is_x, dL[1], dL[2])
    dqnR = jnp.where(is_x, dR[1], dR[2])
    tmpL0, tmpL = hL0 * aL0, hL * aL
    tmpR0, tmpR = hR0 * aR0, hR * aR
    mL0 = jnp.where(tmpL0 != 0.0, qn0L / tmpL0, 0.0)
    mR0 = jnp.where(tmpR0 != 0.0, qn0R / tmpR0, 0.0)
    mL = jnp.where(tmpL != 0.0, (qn0L + dqnL) / tmpL, 0.0)
    mR = jnp.where(tmpR != 0.0, (qn0R + dqnR) / tmpR, 0.0)
    dmL, dmR = mL - mL0, mR - mR0
    M0 = 0.25 * ((mL0 + 1.0) ** 2 - (mR0 - 1.0) ** 2)
    dM = 0.25 * ((mL + mL0 + 2.0) * dmL - (mR + mR0 - 2.0) * dmR)
    M = M0 + dM
    P0 = jnp.maximum(0.0, M0)
    dP = jnp.maximum(0.0, M) - P0
    N0 = jnp.minimum(0.0, M0)
    dN = jnp.minimum(0.0, M) - N0
    f = [
        msg * (
            dP * aL * (l0 + dl) + P0 * (daL * (l0 + dl) + aL0 * dl)
            + dN * aR * (r0 + dr) + N0 * (daR * (r0 + dr) + aR0 * dr)
        )
        for l0, dl, r0, dr in zip(L0, dL, R0, dR)
    ]
    dterm = (
        dmL * hL * hL + (1.0 + mL0) * (hL + hL0) * dhL
        - dmR * hR * hR + (1.0 - mR0) * (hR + hR0) * dhR
    )
    dpres = (0.25 * GRAVITY) * msg * dterm
    f[1] = f[1] + jnp.where(is_x, mhd, mho) * dpres
    f[2] = f[2] + jnp.where(is_x, mho, mhd) * dpres
    return f


def _assemble_LR(A, E, m):
    """Interface L/R slot values from trace (A) and halo (E) planes with
    pltpu.roll shifts (s=4 packed layout)."""
    _i32 = lambda v: np.int32(v)
    rpr, is_x, lane = m.rpr, m.is_x, m.lane

    def assemble_L(a, e):
        prev = pltpu.roll(a, _i32(1), 0)
        # x: qL = east face of the lane-group to the west (same row),
        # with the group-0 carry from the previous position-row.
        lx = jnp.where(lane < S, pltpu.roll(prev, _i32(68), 1), pltpu.roll(a, _i32(4), 1))
        # y: qL = north face of the element one position-row up.
        ly = pltpu.roll(pltpu.roll(a, _i32(LANES - 4), 1), _i32(rpr), 0)
        l = jnp.where(is_x, lx, ly)
        # Panel-edge interfaces: qL west/south comes from the halo;
        # qL east/north is this element's own east/north face (in place).
        l = jnp.where(m.west_slot | m.south_slot, e, l)
        return jnp.where(m.edge_h2, a, l)

    L = tuple(assemble_L(a, e) for a, e in zip(A, E))
    R = tuple(jnp.where(m.edge_h2, e, a) for a, e in zip(A, E))
    return L, R


def _interface_flux(A, E, msg, mhd, mho, m):
    """Interface L/R assembly + AUSM flux (absolute form, s=4 layout)."""
    L, R = _assemble_LR(A, E, m)
    return _ausm_slots(L, R, msg, mhd, mho, m.is_x)


def _faces(fl, m):
    """Per-element faces: h1 slots already hold the west/south flux; the
    east/north flux is the next element's west/south one (or, at panel
    edges, the boundary flux computed in this element's h2 slot)."""
    _i32 = lambda v: np.int32(v)
    fnext = pltpu.roll(fl, _i32(m.prows - 1), 0)
    shx = jnp.where(
        jax.lax.rem(m.lane, jnp.int32(64)) >= 60,
        pltpu.roll(fnext, _i32(60), 1),
        pltpu.roll(fl, _i32(LANES - 4), 1),
    )
    shy = pltpu.roll(pltpu.roll(fl, _i32(m.prows - m.rpr), 0), _i32(4), 1)
    fc = jnp.where(m.h1, fl, jnp.where(m.is_x, shx, shy))
    return jnp.where(m.edge_h2, fl, fc)


def _emit_slabs(o3, eexy, lw, le, rpr: int, prows: int, nel: int):
    """Panel-edge trace slabs of a state (the ``ke_edges`` layout), emitted
    from edge-element rows only: one-hot row selection commutes exactly with
    the extrapolation GEMM, so extrapolating the selected rows is bitwise
    identical to selecting from the full trace at ~2/3 of the MXU work."""
    rpad = -(-rpr // 8) * 8
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=o3[0].dtype)
    lanes_ = jax.lax.broadcasted_iota(jnp.int32, (nel, LANES), 1)
    wmask = lanes_ < S
    emask = (lanes_ >= 64 - S) & (lanes_ < 64)
    wes, ss, ns_ = [], [], []
    for v in range(3):
        trw = mm(mm(lw, o3[v]), eexy)
        tre = mm(mm(le, o3[v]), eexy)
        wes.append(jnp.where(wmask, trw, 0.0) + jnp.where(emask, tre, 0.0))
        ss.append(mm(o3[v][0:rpad], eexy))
        ns_.append(mm(o3[v][prows - rpad : prows], eexy))
    return wes, ss, ns_


# ---------------------------------------------------------------------------
# KM: the mega kernel — the ENTIRE spatial operator per panel in one VMEM
# pass: extrapolation, pointwise fluxes, interior divergence, forcing
# (reference rhs_sw.py:81-131,223-238), interface assembly + AUSM + boundary
# correction (:170-207), the TVD-RK stage combination, and (optionally) the
# NEXT stage's panel-edge trace slabs. Nothing intermediate ever touches
# HBM: per stage the only big transfers are q, x and the output state.


def _make_km(rpr: int, prows: int, nel: int, npl: int, stage_a, stage_b, emit_slabs: bool,
             with_x: bool, with_base: bool = False):
    with_stage = stage_a is not None

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        hwe_ref, hs_ref, hn_ref = next(it), next(it), next(it)
        (sqrtg_ref, h11_ref, h12_ref, h22_ref,
         g101_ref, g102_ref, g201_ref, g202_ref,
         c111_ref, c112_ref, c212_ref, c222_ref, invsg_ref) = (next(it) for _ in range(13))
        gridrot_ref = next(it)
        eexy_ref, dd_ref = next(it), next(it)
        msg_ref, mhd_ref, mho_ref = next(it), next(it), next(it)
        wmat_ref, spread_ref, lw_ref, le_ref, rev_ref = (next(it) for _ in range(5))
        bp_ref = next(it) if with_base else None
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        o_ref = next(it)
        if emit_slabs:
            we_ref, s_ref, n_ref = next(it), next(it), next(it)

        mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=o_ref.dtype)
        eexy = eexy_ref[...]
        m = _masks(rpr, prows)
        fields = (
            sqrtg_ref[...], h11_ref[...], h12_ref[...], h22_ref[...],
            g101_ref[...], g102_ref[...], g201_ref[...], g202_ref[...],
            c111_ref[...], c112_ref[...], c212_ref[...], c222_ref[...],
            invsg_ref[...],
        )
        invsg = fields[12]
        q3 = (q_ref[0], q_ref[1], q_ref[2])

        # --- interface traces + halo expansion (shared by both forms) ---
        A = tuple(mm(q3[v], eexy) for v in range(3))
        spread = spread_ref[...]
        rev = rev_ref[...]
        E = tuple(
            _expand_halo_var(
                hwe_ref[0, v, 0:1], hwe_ref[0, v, 1:2], hs_ref[v, 0], hn_ref[v, 0],
                spread, rev, m, nel, npl,
            )
            for v in range(3)
        )
        if with_base:
            # Perturbation form: q3/halos carry the delta; base planes ride
            # in bp_ref (layout: build_base_planes in pallas_sw_gen — the
            # s=4/g=8 packing is the same in both pipelines).
            bq = tuple(bp_ref[k] for k in range(5))
            df = _element_stage_pert(q3, bq, fields, gridrot_ref[...], dd_ref[...])
            L0, R0 = _assemble_LR(
                tuple(bp_ref[5 + v] for v in range(3)),
                tuple(bp_ref[8 + v] for v in range(3)), m,
            )
            dL, dR = _assemble_LR(A, E, m)
            f = _ausm_delta_slots(L0, R0, dL, dR, msg_ref[...], mhd_ref[...], mho_ref[...], m.is_x)
        else:
            df = _element_stage(q3, fields, gridrot_ref[...], dd_ref[...])
            f = _interface_flux(A, E, msg_ref[...], mhd_ref[...], mho_ref[...], m)

        wmat = wmat_ref[...]
        o = []
        for v in range(3):
            rhs_v = df[v] - invsg * mm(_faces(f[v], m), wmat)
            if with_base:
                rhs_v = rhs_v + bp_ref[11 + v]
            if with_stage:
                cdt = cdt_ref[0, 0]
                val = stage_b * q_ref[v] + cdt * rhs_v
                if with_x:
                    val = stage_a * x_ref[v] + val
            else:
                val = rhs_v
            o.append(val)
            o_ref[v] = val

        # --- next-stage edge slabs of the OUTPUT state (chained mode) ---
        if emit_slabs:
            wes, ss, ns_ = _emit_slabs(o, eexy, lw_ref[...], le_ref[...], rpr, prows, nel)
            for v in range(3):
                we_ref[v] = wes[v]
                s_ref[v] = ss[v]
                n_ref[v] = ns_[v]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rpr", "stage_a", "stage_b", "emit_slabs", "interpret"),
)
def km_fused(
    qp, hwe, hs, hn, fields, gridrot, eexy, dd, m_sg, m_hd, m_ho, wmat, spread,
    rpr: int, x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False, bp=None,
):
    """The whole SW spatial operator + optional TVD-RK stage combination in
    one kernel per panel. qp: (3, R, 128) packed state; hwe: (6, 3, 2, npts)
    compact west/east halo edges (flat rows, the kh_exchange layout —
    expanded to panel shape in VMEM so no XLA relayout ever touches them);
    hs/hn: (3, 6, 1, npl) flat lane-padded south/north halo edges;
    fields: the 13 single-panel K1 constants; m_*: single-panel interface
    metrics. Returns the RHS (3, R, 128), or with stage coefficients
    ``stage_a*x + stage_b*qp + cdt*RHS(qp)``; with ``emit_slabs`` also the
    (we, s, n) edge-trace slabs of the OUTPUT state (``ke_edges`` layout)
    so the next stage needs no separate edge kernel."""
    rows = qp.shape[1]
    prows = rows // 6
    nel = prows // rpr
    npl = hs.shape[-1]
    rpad = -(-rpr // 8) * 8
    zero = np.int32(0)
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    if hwe.shape[-1] < npl:
        hwe = jnp.pad(hwe, ((0, 0), (0, 0), (0, 0), (0, npl - hwe.shape[-1])))

    lw, le = _edge_selectors(nel, prows, rpr)
    lw = jnp.asarray(lw, dtype=qp.dtype)
    le = jnp.asarray(le, dtype=qp.dtype)
    rev = jnp.asarray(np.eye(nel)[::-1].copy(), dtype=qp.dtype)

    pan3 = lambda: pl.BlockSpec((3, prows, LANES), lambda i: (zero, i, zero))
    pan = lambda: pl.BlockSpec((prows, LANES), lambda i: (i, zero))
    pan0 = lambda: pl.BlockSpec((prows, LANES), lambda i: (zero, zero))
    small3 = lambda r: pl.BlockSpec((3, r, LANES), lambda i: (zero, i, zero))
    edge = lambda: pl.BlockSpec((3, 1, 1, npl), lambda i: (zero, i, zero, zero))
    const = lambda: pl.BlockSpec((LANES, LANES), lambda i: (zero, zero))

    in_specs = (
        [
            pan3(),
            pl.BlockSpec((1, 3, 2, npl), lambda i: (i, zero, zero, zero)),  # hwe
            edge(), edge(),
        ]
        + [pan0() for _ in range(13)]
        + [
            pan(),  # gridrot (panel-dependent)
            const(),
            pl.BlockSpec((2 * LANES, LANES), lambda i: (zero, zero)),  # dd
            pan0(), pan0(), pan0(),  # m_sg, m_hd, m_ho
            const(), const(),  # wmat, spread
            pl.BlockSpec((nel, prows), lambda i: (zero, zero)),  # lw
            pl.BlockSpec((nel, prows), lambda i: (zero, zero)),  # le
            pl.BlockSpec((nel, nel), lambda i: (zero, zero)),  # rev
        ]
    )
    args = [qp, hwe, hs, hn, *fields, gridrot, eexy, dd, m_sg, m_hd, m_ho, wmat, spread, lw, le, rev]
    with_base = bp is not None
    if with_base:
        in_specs.append(pl.BlockSpec((14, prows, LANES), lambda i: (zero, i, zero)))
        args.append(bp)
    if with_x:
        in_specs.append(pan3())
        args.append(x)
    if with_stage:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (zero, zero), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(cdt, dtype=qp.dtype).reshape(1, 1))

    out_specs = [pan3()]
    out_shape = [jax.ShapeDtypeStruct((3, rows, LANES), qp.dtype)]
    if emit_slabs:
        out_specs += [
            small3(nel),
            pl.BlockSpec((3, rpad, LANES), lambda i: (zero, i, zero)),
            pl.BlockSpec((3, rpad, LANES), lambda i: (zero, i, zero)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((3, 6 * nel, LANES), qp.dtype),
            jax.ShapeDtypeStruct((3, 6 * rpad, LANES), qp.dtype),
            jax.ShapeDtypeStruct((3, 6 * rpad, LANES), qp.dtype),
        ]

    outs = pl.pallas_call(
        _make_km(rpr, prows, nel, npl, stage_a, stage_b, emit_slabs, with_x, with_base),
        grid=(6,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **(
            {}
            if interpret
            else {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}
        ),
    )(*args)
    return tuple(outs) if emit_slabs else outs[0]


# ---------------------------------------------------------------------------
# KR: the whole-RUN kernel. One pallas_call executes EVERY TVD-RK stage of
# EVERY time step: grid (nsteps, 3, 6) iterated sequentially on the core,
# with both RK state registers, the edge-trace slabs, and the halo results
# living in VMEM scratch for the entire run (v5e VMEM is 128 MB; the whole
# working set at nel=64 is ~30 MB). Constants are fetched ONCE per call
# instead of once per stage, and the per-stage kernel launches, XLA glue
# and all intermediate-state HBM round-trips disappear: steady-state HBM
# traffic is ~zero, leaving the MXU as the only limiter.


def tvdrk3_abc(dt):
    """Per-stage (a, b, c*dt) rows of TVD-RK3 in 2-register SSP form
    (``val = a*x + b*y + c*dt*RHS(y)``; reference integrators/tvdrk3.py)."""
    a = jnp.asarray([0.0, 0.75, 1.0 / 3.0])
    b = jnp.asarray([1.0, 0.25, 2.0 / 3.0])
    return jnp.stack([a, b, b * dt])


def run_supported(num_solpts: int, nel: int, dtype) -> bool:
    """KR additionally folds the halo exchange in-kernel, whose batched
    edge flattening needs lane-tiled flat edges: npts % 128 == 0
    (i.e. nel a multiple of 32)."""
    return supported(num_solpts, nel, dtype) and (nel * S) % 128 == 0


def _slabs_to_flat(we, sv, nv, csn_s, csn_n, p6, p6s, p6n, nel: int, rpr: int, npl: int):
    """Flatten the panel-edge trace slabs (``ke_edges`` layout) into the
    (72, npts) flat-edge matrix ``_halo_math`` consumes — in VMEM, batched
    over all six panels per (variable, side). Element-grid row y's face
    point k must land at flat lane s*y+k: a strided lane rotate moves row r
    by ``base + stride*r`` and the per-panel offsets vanish mod npts (the
    ``run_supported`` gate), so one roll + one block-ones GEMM flattens a
    whole side. Mosaic caps a strided rotate's intra-vreg shift spread at
    the vreg width, so the y-side rows (32-lane windows) use per-row plain
    rolls with a row-index mask instead — shifts depend only on the
    within-panel row, so one pass covers all six panels. Row order:
    v*24 + side*6 + panel, (S,N,W,E)."""
    _i32 = lambda v: np.int32(v)
    rpad = -(-rpr // 8) * 8
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=we.dtype)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (6 * nel, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (6 * rpad, npl), 0)
    rmod = jax.lax.rem(rowi, jnp.int32(rpad))
    pad = lambda a: jnp.pad(a, ((0, 0), (0, npl - LANES))) if npl > LANES else a
    per_var = []
    for v in range(3):
        blk = we[v]  # (6*nel, LANES): west at lanes 0..s-1, east at 64-s..63
        wsel = pad(jnp.where(lanes < S, blk, 0.0))
        esel = pad(jnp.where((lanes >= 64 - S) & (lanes < 64), blk, 0.0))
        flat_w = mm(p6, pltpu.roll(wsel, _i32(0), 1, stride=S, stride_axis=0))
        flat_e = mm(p6, pltpu.roll(esel, _i32((npl - (64 - S)) % npl), 1, stride=S, stride_axis=0))
        # y-face slabs: compact lanes 64+8g+half*4+k -> 4g+k, then shift
        # row r (within the panel edge) to flat lanes 32r..32r+31.
        cs = mm(sv[v], csn_s)  # (6*rpad, npl)
        cn = mm(nv[v], csn_n)
        acc_s = jnp.zeros_like(cs)
        acc_n = jnp.zeros_like(cn)
        for r in range(rpad):
            acc_s = acc_s + jnp.where(rmod == r, pltpu.roll(cs, _i32((32 * r) % npl), 1), 0.0)
            rn = (32 * (r - (rpad - rpr))) % npl
            acc_n = acc_n + jnp.where(rmod == r, pltpu.roll(cn, _i32(rn), 1), 0.0)
        flat_s = mm(p6s, acc_s)
        flat_n = mm(p6n, acc_n)
        per_var.append(jnp.concatenate([flat_s, flat_n, flat_w, flat_e], axis=0))
    return jnp.concatenate(per_var, axis=0)  # (72, npts)


def _make_kr(rpr: int, prows: int, nel: int, npl: int, nsteps: int, with_base: bool = False):
    rpad = -(-rpr // 8) * 8
    rows = 6 * prows

    def kernel(*refs):
        it = iter(refs)
        q_ref, we0_ref, s0_ref, n0_ref = (next(it) for _ in range(4))
        (sqrtg_ref, h11_ref, h12_ref, h22_ref,
         g101_ref, g102_ref, g201_ref, g202_ref,
         c111_ref, c112_ref, c212_ref, c222_ref, invsg_ref) = (next(it) for _ in range(13))
        (gridrot_ref, eexy_ref, dd_ref, msg_ref, mhd_ref, mho_ref,
         wmat_ref, spread_ref, lw_ref, le_ref, rev_ref,
         perm_ref, revn_ref, flip_ref, conv_ref, pwe_ref,
         csns_ref, csnn_ref, p6_ref, p6s_ref, p6n_ref) = (next(it) for _ in range(21))
        bp_ref = next(it) if with_base else None
        abc_ref = next(it)
        o_ref = next(it)
        (x_scr, y_scr, cur_scr, we_scr, s_scr, n_scr,
         hwe_scr, hs_scr, hn_scr) = (next(it) for _ in range(9))
        t = pl.program_id(0)
        s = pl.program_id(1)
        p = pl.program_id(2)
        pslice = pl.ds(p * prows, prows)
        first = (t == 0) & (s == 0)

        @pl.when(first)
        def _():
            # Register x := the input state; slab scratch := its edge slabs.
            for v in range(3):
                x_scr[v, pslice, :] = q_ref[v, pslice, :]

        @pl.when(first & (p == 0))
        def _():
            we_scr[...] = we0_ref[...]
            s_scr[...] = s0_ref[...]
            n_scr[...] = n0_ref[...]

        # --- panel-edge halo exchange, once per stage (p == 0), from the
        # slabs the previous stage's panels wrote to VMEM scratch ---
        @pl.when(p == 0)
        def _():
            flat = _slabs_to_flat(
                we_scr[...], s_scr[...], n_scr[...],
                csns_ref[...], csnn_ref[...], p6_ref[...], p6s_ref[...], p6n_ref[...],
                nel, rpr, npl,
            )
            hwe, hs, hn = _halo_math(
                flat, perm_ref[...], revn_ref[...], flip_ref[...], conv_ref[...],
                pwe_ref[...], npl, npl,
            )
            hwe_scr[...] = hwe
            hs_scr[...] = hs
            hn_scr[...] = hn

        # --- stage source: register x at stage 0, register y afterwards ---
        @pl.when(s == 0)
        def _():
            for v in range(3):
                cur_scr[v] = x_scr[v, pslice, :]

        @pl.when(s != 0)
        def _():
            for v in range(3):
                cur_scr[v] = y_scr[v, pslice, :]

        mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=o_ref.dtype)
        eexy = eexy_ref[...]
        m = _masks(rpr, prows)
        fields = (
            sqrtg_ref[...], h11_ref[...], h12_ref[...], h22_ref[...],
            g101_ref[...], g102_ref[...], g201_ref[...], g202_ref[...],
            c111_ref[...], c112_ref[...], c212_ref[...], c222_ref[...],
            invsg_ref[...],
        )
        invsg = fields[12]
        q3 = tuple(cur_scr[v] for v in range(3))

        A = tuple(mm(q3[v], eexy) for v in range(3))
        spread = spread_ref[...]
        rev = rev_ref[...]
        E = tuple(
            _expand_halo_var(
                hwe_scr[pl.ds(p, 1), v, 0], hwe_scr[pl.ds(p, 1), v, 1],
                hs_scr[v, pl.ds(p, 1), 0], hn_scr[v, pl.ds(p, 1), 0],
                spread, rev, m, nel, npl,
            )
            for v in range(3)
        )
        if with_base:
            # Perturbation form: the registers carry the delta state; base
            # planes (this panel's block) ride in bp_ref.
            bq = tuple(bp_ref[k] for k in range(5))
            df = _element_stage_pert(q3, bq, fields, gridrot_ref[pslice, :], dd_ref[...])
            L0, R0 = _assemble_LR(
                tuple(bp_ref[5 + v] for v in range(3)),
                tuple(bp_ref[8 + v] for v in range(3)), m,
            )
            dL, dR = _assemble_LR(A, E, m)
            f = _ausm_delta_slots(L0, R0, dL, dR, msg_ref[...], mhd_ref[...], mho_ref[...], m.is_x)
        else:
            df = _element_stage(q3, fields, gridrot_ref[pslice, :], dd_ref[...])
            f = _interface_flux(A, E, msg_ref[...], mhd_ref[...], mho_ref[...], m)

        wmat = wmat_ref[...]
        a = abc_ref[0, s]
        b = abc_ref[1, s]
        cdt = abc_ref[2, s]
        val = []
        for v in range(3):
            rhs_v = df[v] - invsg * mm(_faces(f[v], m), wmat)
            if with_base:
                rhs_v = rhs_v + bp_ref[11 + v]
            x3 = x_scr[v, pslice, :]
            val.append(a * x3 + b * q3[v] + cdt * rhs_v)

        # --- slabs of the output state for the NEXT stage's halo ---
        wes, ss, ns_ = _emit_slabs(val, eexy, lw_ref[...], le_ref[...], rpr, prows, nel)
        for v in range(3):
            we_scr[v, pl.ds(p * nel, nel), :] = wes[v]
            s_scr[v, pl.ds(p * rpad, rpad), :] = ss[v]
            n_scr[v, pl.ds(p * rpad, rpad), :] = ns_[v]

        # --- register writes: stages 0,1 -> y; stage 2 -> x (step done) ---
        @pl.when(s <= 1)
        def _():
            for v in range(3):
                y_scr[v, pslice, :] = val[v]

        @pl.when(s == 2)
        def _():
            for v in range(3):
                x_scr[v, pslice, :] = val[v]

        @pl.when((s == 2) & (t == nsteps - 1))
        def _():
            for v in range(3):
                o_ref[v, pslice, :] = val[v]

    return kernel


@functools.partial(jax.jit, static_argnames=("rpr", "nsteps", "interpret"))
def kr_run(
    qp, we0, s0, n0, fields, gridrot, eexy, dd, m_sg, m_hd, m_ho, wmat, spread,
    halo: HaloConstants, abc, rpr: int, nsteps: int, interpret: bool = False, bp=None,
):
    """Run ``nsteps`` full 3-stage explicit RK steps entirely on-chip.
    qp: (3, R, 128) packed state; (we0, s0, n0): its edge-trace slabs
    (``ke_edges``); abc: (3, 3) rows = per-stage (a, b, c*dt) of the
    2-register SSP combination ``val = a*x + b*y + (c*dt)*RHS(y)`` (TVD-RK3:
    a=[0,3/4,1/3], b=[1,1/4,2/3], c=[1,1/4,2/3]). Returns the final state."""
    rows = qp.shape[1]
    prows = rows // 6
    nel = prows // rpr
    rpad = -(-rpr // 8) * 8
    npts = nel * S
    npl = npts
    zero = np.int32(0)

    lw, le = _edge_selectors(nel, prows, rpr)
    rev = np.eye(nel)[::-1].copy()
    pwe = _pwe()
    csn_s = np.zeros((LANES, npl), np.float64)
    csn_n = np.zeros((LANES, npl), np.float64)
    for g in range(G8):
        for k in range(S):
            csn_s[64 + 8 * g + k, 4 * g + k] = 1.0
            csn_n[64 + 8 * g + 4 + k, 4 * g + k] = 1.0
    p6 = np.kron(np.eye(6), np.ones((1, nel)))
    pr_s = np.zeros((1, rpad))
    pr_s[0, :rpr] = 1.0
    pr_n = np.zeros((1, rpad))
    pr_n[0, rpad - rpr :] = 1.0
    p6s = np.kron(np.eye(6), pr_s)
    p6n = np.kron(np.eye(6), pr_n)

    dt_ = qp.dtype
    c = lambda a_: jnp.asarray(a_, dtype=dt_)
    full = lambda shape: pl.BlockSpec(shape, lambda t, s, p: tuple(zero for _ in shape))
    # The index map must return i32 even under x64 (Mosaic rejects an i64
    # func.return); the default (no-map) SMEM spec would produce i64 zeros.
    smem = pl.BlockSpec((3, 3), lambda t, s, p: (zero, zero), memory_space=pltpu.SMEM)

    in_specs = (
        [full((3, rows, LANES)), full((3, 6 * nel, LANES)),
         full((3, 6 * rpad, LANES)), full((3, 6 * rpad, LANES))]
        + [full((prows, LANES)) for _ in range(13)]
        + [full((rows, LANES)), full((LANES, LANES)), full((2 * LANES, LANES)),
           full((prows, LANES)), full((prows, LANES)), full((prows, LANES)),
           full((LANES, LANES)), full((LANES, LANES)),
           full((nel, prows)), full((nel, prows)), full((nel, nel)),
           full((72, 72)), full((npl, npl)), full((72, 1)), full((4, 24, npl)),
           full((36, 72)), full((LANES, npl)), full((LANES, npl)),
           full((6, 6 * nel)), full((6, 6 * rpad)), full((6, 6 * rpad))]
    )
    args = [
        qp, we0, s0, n0, *fields, gridrot, eexy, dd, m_sg, m_hd, m_ho, wmat,
        spread, c(lw), c(le), c(rev),
        halo.perm72, halo.rev, halo.flip, halo.conv, c(pwe),
        c(csn_s), c(csn_n), c(p6), c(p6s), c(p6n),
    ]
    with_base = bp is not None
    if with_base:
        in_specs.append(pl.BlockSpec((14, prows, LANES), lambda t, s, p: (zero, p, zero)))
        args.append(bp)
    in_specs.append(smem)
    args.append(jnp.asarray(abc, dtype=dt_))
    scratch = [
        pltpu.VMEM((3, rows, LANES), dt_),  # x register
        pltpu.VMEM((3, rows, LANES), dt_),  # y register
        pltpu.VMEM((3, prows, LANES), dt_),  # current stage source
        pltpu.VMEM((3, 6 * nel, LANES), dt_),  # we slabs
        pltpu.VMEM((3, 6 * rpad, LANES), dt_),  # s slabs
        pltpu.VMEM((3, 6 * rpad, LANES), dt_),  # n slabs
        pltpu.VMEM((6, 3, 2, npl), dt_),  # halo west/east
        pltpu.VMEM((3, 6, 1, npl), dt_),  # halo south
        pltpu.VMEM((3, 6, 1, npl), dt_),  # halo north
    ]
    kwargs = {}
    if not interpret:
        # The whole-run kernel keeps both RK registers + slabs + halos in
        # VMEM scratch (~30 MB at nel=64) — beyond the default 16 MB
        # scoped budget; v5e has 128 MB.
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        _make_kr(rpr, prows, nel, npl, nsteps, with_base),
        grid=(nsteps, 3, 6),
        in_specs=in_specs,
        out_specs=full((3, rows, LANES)),
        out_shape=jax.ShapeDtypeStruct((3, rows, LANES), dt_),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(*args)
