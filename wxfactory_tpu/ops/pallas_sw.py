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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common.constants import GRAVITY

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
        mm = lambda a, b: jax.lax.dot(a, b, preferred_element_type=we_ref.dtype)
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

    lw = np.zeros((nel, prows), np.float64)
    le = np.zeros((nel, prows), np.float64)
    for y in range(nel):
        lw[y, y * rpr] = 1.0
        le[y, y * rpr + rpr - 1] = 1.0
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


def _make_kh(npts: int, npl: int):
    def kernel(pool_ref, perm_ref, rev_ref, flip_ref, conv_ref, pwe_ref, we_ref, hs_ref, hn_ref):
        flat = pool_ref[...].reshape(72, npts)
        mm = lambda a, b: jax.lax.dot(a, b, preferred_element_type=flat.dtype)
        ex = mm(perm_ref[...], flat)
        flipped = mm(ex, rev_ref[...])
        m = flip_ref[...]
        ex = m * flipped + (1.0 - m) * ex
        conv = conv_ref[...]
        a1 = ex[24:48]
        a2 = ex[48:72]
        b1 = conv[0] * a1 + conv[1] * a2
        b2 = conv[2] * a1 + conv[3] * a2
        halo = jnp.concatenate([ex[0:24], b1, b2], axis=0)  # (72, npts) v-major

        cat = lambda slabs: jnp.concatenate(slabs, axis=0)
        pad = lambda a: (
            a if npl == npts else jnp.concatenate([a, jnp.zeros((a.shape[0], npl - npts), a.dtype)], axis=-1)
        )
        hs_ref[...] = pad(cat([halo[v * 24 : v * 24 + 6] for v in range(3)])).reshape(3, 6, 1, npl)
        hn_ref[...] = pad(cat([halo[v * 24 + 6 : v * 24 + 12] for v in range(3)])).reshape(3, 6, 1, npl)
        # KM consumes the flat edges panel-major (its per-panel block spec
        # needs the blocked axis leading): rows (p, v, side) via one-hot.
        we_ref[...] = mm(pwe_ref[...], halo).reshape(6, 3, 2, npts)

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
    pwe = np.zeros((36, 72), np.float64)
    for p in range(6):
        for v in range(3):
            for side in range(2):
                pwe[(p * 3 + v) * 2 + side, v * 24 + 12 + side * 6 + p] = 1.0
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
# KM: the mega kernel — the ENTIRE spatial operator per panel in one VMEM
# pass: extrapolation, pointwise fluxes, interior divergence, forcing
# (reference rhs_sw.py:81-131,223-238), interface assembly + AUSM + boundary
# correction (:170-207), the TVD-RK stage combination, and (optionally) the
# NEXT stage's panel-edge trace slabs. Nothing intermediate ever touches
# HBM: per stage the only big transfers are q, x and the output state.


def _make_km(rpr: int, prows: int, nel: int, npl: int, stage_a, stage_b, emit_slabs: bool, with_x: bool):
    half_g = 0.5 * GRAVITY
    _i32 = lambda v: np.int32(v)
    with_stage = stage_a is not None
    rpad = -(-rpr // 8) * 8

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
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        o_ref = next(it)
        if emit_slabs:
            we_ref, s_ref, n_ref = next(it), next(it), next(it)

        mm = lambda a, b: jax.lax.dot(a, b, preferred_element_type=o_ref.dtype)
        eexy = eexy_ref[...]

        # --- element-local stage (the former K1, now in VMEM) ---
        h = q_ref[0]
        hu1 = q_ref[1]
        hu2 = q_ref[2]
        sqrtg = sqrtg_ref[...]
        invsg = invsg_ref[...]
        u1 = hu1 / h
        u2 = hu2 / h
        hsq = h * h
        dd = dd_ref[...]
        cat = lambda a, b: jnp.concatenate([a, b], axis=-1)
        div0 = mm(cat(sqrtg * hu1, sqrtg * hu2), dd)
        div1 = mm(
            cat(
                sqrtg * (hu1 * u1 + half_g * h11_ref[...] * hsq),
                sqrtg * (hu1 * u2 + half_g * h12_ref[...] * hsq),
            ),
            dd,
        )
        div2 = mm(
            cat(
                sqrtg * (hu2 * u1 + half_g * h12_ref[...] * hsq),
                sqrtg * (hu2 * u2 + half_g * h22_ref[...] * hsq),
            ),
            dd,
        )
        # Time Christoffels factored as gridrot * single-panel factor.
        rot2 = 2.0 * gridrot_ref[...]
        forcing_1 = (
            rot2 * (g101_ref[...] * hu1 + g102_ref[...] * hu2)
            + c111_ref[...] * hu1 * u1
            + 2.0 * c112_ref[...] * hu1 * u2
        )
        forcing_2 = (
            rot2 * (g201_ref[...] * hu1 + g202_ref[...] * hu2)
            + 2.0 * c212_ref[...] * hu1 * u2
            + c222_ref[...] * hu2 * u2
        )
        df = (-invsg * div0, -invsg * div1 - forcing_1, -invsg * div2 - forcing_2)

        # --- interface stage (the former K2) ---
        shape = (prows, LANES)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        is_x = lane < 64
        lmod8 = jax.lax.rem(lane, jnp.int32(8))
        h1 = lmod8 < S
        rmod = jax.lax.rem(row, jnp.int32(rpr))
        west_slot = is_x & (lane < S) & (rmod == 0)
        east_slot = is_x & (lane >= 64 - S) & (rmod == rpr - 1)
        south_slot = (~is_x) & h1 & (row < rpr)
        north_slot = (~is_x) & (~h1) & (row >= prows - rpr)
        edge_h2 = east_slot | north_slot

        A = (mm(q_ref[0], eexy), mm(q_ref[1], eexy), mm(q_ref[2], eexy))

        # Expand the small halo arrays to full panel shape in VMEM. hwe
        # holds the west/east panel edges as ONE flat lane-padded row each;
        # element-grid row y's west value lives at flat lanes y*s..y*s+s-1
        # and must land at lanes 0..s-1 (east: 64-s..63) of its row — a
        # per-row DECREASING lane shift. Mosaic's strided rotate only
        # increases, so rows are produced grid-reversed (shift base
        # -s*(nel-1), stride +s) and un-reversed by a one-hot matmul.
        # Consuming the flat layout directly is what kills the XLA-side
        # (3,6,nel,32,4) pad+relayout copy (~16 us/stage, a third of the
        # whole step). hs/hn: position-row r of the first/last grid row
        # takes its 32-lane window via a lane roll, then one (128,128)
        # one-hot matmul spreads it onto the y-face slots. Only slot-masked
        # selects ever read the results.
        spread = spread_ref[...]
        rev = rev_ref[...]
        lanes_we = jax.lax.broadcasted_iota(jnp.int32, (nel, LANES), 1)
        bw = (npl - S * (nel - 1)) % npl
        be = (npl - S * (nel - 1) + (64 - S)) % npl

        def expand_we(v):
            w = jnp.repeat(hwe_ref[0, v, 0:1], nel, axis=0)  # (nel, npl), identical rows
            e = jnp.repeat(hwe_ref[0, v, 1:2], nel, axis=0)
            w = pltpu.roll(w, _i32(bw), 1, stride=S, stride_axis=0)[:, :LANES]
            e = pltpu.roll(e, _i32(be), 1, stride=S, stride_axis=0)[:, :LANES]
            wsel = jnp.where(lanes_we < S, w, 0.0)
            esel = jnp.where((lanes_we >= 64 - S) & (lanes_we < 64), e, 0.0)
            return jax.lax.dot(rev, wsel + esel, preferred_element_type=w.dtype)

        def expand_sn(src, north):
            npl = src.shape[-1]
            rows_ = []
            for r in range(rpr):
                shift = (npl - 32 * r) % npl
                rolled = pltpu.roll(src, _i32(shift), 1) if shift else src
                rows_.append(rolled[:, :LANES])
            b = jnp.concatenate(rows_, axis=0) if rpr > 1 else rows_[0]
            e = jax.lax.dot(b, spread, preferred_element_type=src.dtype)
            if north:
                e = pltpu.roll(e, _i32(4), 1)
                return jnp.pad(e, ((prows - rpr, 0), (0, 0)))
            return jnp.pad(e, ((0, prows - rpr), (0, 0)))

        E = tuple(
            jnp.repeat(expand_we(i), rpr, axis=0)
            + expand_sn(hs_ref[i, 0], False)
            + expand_sn(hn_ref[i, 0], True)
            for i in range(3)
        )

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
            l = jnp.where(west_slot | south_slot, e, l)
            return jnp.where(edge_h2, a, l)

        L = tuple(assemble_L(a, e) for a, e in zip(A, E))
        R = tuple(jnp.where(edge_h2, e, a) for a, e in zip(A, E))

        # AUSM Mach-splitting flux, both directions at once
        # (reference rhs_sw.py:170-207).
        sg = msg_ref[...]
        hd = mhd_ref[...]
        ho = mho_ref[...]
        hL, hR = L[0], R[0]
        aL = jnp.sqrt(GRAVITY * hL * hd)
        aR = jnp.sqrt(GRAVITY * hR * hd)
        qnL = jnp.where(is_x, L[1], L[2])
        qnR = jnp.where(is_x, R[1], R[2])
        tmpL = hL * aL
        tmpR = hR * aR
        mL = jnp.where(tmpL != 0.0, qnL / tmpL, 0.0)
        mR = jnp.where(tmpR != 0.0, qnR / tmpR, 0.0)
        big_m = 0.25 * ((mL + 1.0) ** 2 - (mR - 1.0) ** 2)
        adv_l = jnp.maximum(0.0, big_m) * aL
        adv_r = jnp.minimum(0.0, big_m) * aR
        f = [sg * (adv_l * l + adv_r * r) for l, r in zip(L, R)]
        pres_l = (1.0 + mL) * (sg * half_g) * (hL * hL)
        pres_r = (1.0 - mR) * (sg * half_g) * (hR * hR)
        pres_diag = 0.5 * (hd * pres_l + hd * pres_r)
        pres_off = 0.5 * (ho * pres_l + ho * pres_r)
        f[1] = f[1] + jnp.where(is_x, pres_diag, pres_off)
        f[2] = f[2] + jnp.where(is_x, pres_off, pres_diag)

        # Per-element faces: h1 slots already hold the west/south flux; the
        # east/north flux is the next element's west/south one (or, at panel
        # edges, the boundary flux computed in this element's h2 slot).
        def faces(fl):
            fnext = pltpu.roll(fl, _i32(prows - 1), 0)
            shx = jnp.where(
                jax.lax.rem(lane, jnp.int32(64)) >= 60, pltpu.roll(fnext, _i32(60), 1), pltpu.roll(fl, _i32(LANES - 4), 1)
            )
            shy = pltpu.roll(pltpu.roll(fl, _i32(prows - rpr), 0), _i32(4), 1)
            fc = jnp.where(h1, fl, jnp.where(is_x, shx, shy))
            return jnp.where(edge_h2, fl, fc)

        wmat = wmat_ref[...]
        o = []
        for v in range(3):
            rhs_v = df[v] - invsg * mm(faces(f[v]), wmat)
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
            lanes_ = jax.lax.broadcasted_iota(jnp.int32, (nel, LANES), 1)
            wmask = lanes_ < S
            emask = (lanes_ >= 64 - S) & (lanes_ < 64)
            lw = lw_ref[...]
            le = le_ref[...]
            for v in range(3):
                tr = mm(o[v], eexy)
                we_ref[v] = jnp.where(wmask, mm(lw, tr), 0.0) + jnp.where(emask, mm(le, tr), 0.0)
                s_ref[v] = tr[0:rpad]
                n_ref[v] = tr[prows - rpad : prows]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rpr", "stage_a", "stage_b", "emit_slabs", "interpret"),
)
def km_fused(
    qp, hwe, hs, hn, fields, gridrot, eexy, dd, m_sg, m_hd, m_ho, wmat, spread,
    rpr: int, x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False,
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

    lw = np.zeros((nel, prows), np.float64)
    le = np.zeros((nel, prows), np.float64)
    for y in range(nel):
        lw[y, y * rpr] = 1.0
        le[y, y * rpr + rpr - 1] = 1.0
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
        _make_km(rpr, prows, nel, npl, stage_a, stage_b, emit_slabs, with_x),
        grid=(6,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return tuple(outs) if emit_slabs else outs[0]
