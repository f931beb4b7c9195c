"""Fused Pallas TPU pipeline for the 3D Euler DFR RHS on the cubed sphere.

One mega kernel (KM3) computes the ENTIRE spatial operator per
(y-slab, panel) block: log-space extrapolation to all six element faces,
sqrt(g)-weighted pointwise fluxes, interior divergence, Rusanov interface
fluxes with the rho*w advection/pressure split, boundary corrections,
Christoffel/Coriolis forcing and the filtered gravity term (reference
rhs/rhs_dfr.py + pde/pde_euler_cubesphere.py + pde/fluxes.py semantics,
matching models/euler_cubesphere.py). Only the tiny panel-edge halo stage
runs in XLA between kernel launches.

Why: the XLA schedule of the 3D RHS moves ~9.3 GB of HBM per evaluation
(padded interface layouts + materialized concatenations) for an 8.6-GFLOP
computation — 50x over the bandwidth roofline. In the kernel everything
intermediate lives in VMEM; per block the only HBM transfers are the
packed state, the output and the (mostly single-panel) metric constants.

Packed layout. State view is ``(5, R, 128)`` with ``R = 6*ny*nk*nxp`` rows
of ``g = 2`` elements x ``s^3 = 64`` solution points (f32 lane width 128).
Row ``r`` maps to ``(panel, ky, kz, x2)`` with x2 innermost and ky
outermost; element x-index is ``ex = 2*x2 + g``; lane ``g*64 + pt`` holds
solution point ``pt = (kz_s*s + ky_s)*s + kx_s`` (x fastest — the
reference's new-layout ordering, cubed_sphere_3d.py:187).

Face-trace slot layout (per row, two 128-lane arrays):
  * ``tr_xy``: lane ``g*32 + [west:0..15 | east:16..31]`` for the x faces,
    ``64 + g*32 + [south:16 | north:16]`` for the y faces; face index
    ``kz_s*s + ky_s`` (x) / ``kz_s*s + kx_s`` (y).
  * ``tr_z``: lane ``g*32 + [down:16 | up:16]``, upper 64 lanes unused.
Each element's west/south/down slot hosts the Riemann flux of the
interface on that side; panel-edge east/north slots and the rigid-lid /
ground slots host the boundary interfaces ("h2" slots).

Grid is ``(ny/ty, 6)`` with the PANEL axis innermost so the single-panel
metric constants (every geometric field of the equiangular cubed sphere is
panel-identical) keep a constant block index across the six inner steps.
y-slab coupling uses two extra one-grid-row views of the state (the
neighbouring slabs' boundary rows); their faces are recomputed in VMEM.

f32 operating point on TPU; f64 via interpret mode off-TPU for the parity
tests (the XLA path in models/euler_cubesphere.py stays the float64
reference).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common.constants import CPD, CVD, GRAVITY, P0, RD
from . import kernel_precision as _kernel_precision

_KP = _kernel_precision()

LANES = 128

GAMMA = CPD / CVD

IDX_RHO = 0
IDX_RHO_U1 = 1
IDX_RHO_U2 = 2
IDX_RHO_W = 3
IDX_RHO_THETA = 4


def pick_h(num_solpts: int) -> int:
    """Rows per element (the kz HALF-SPLIT): 1 when a whole element fits a
    128-lane row, else the smallest even split H | s with s^3/H <= 128 —
    s=6 gets H=2 (108 lanes/row, kz 0..2 on the low row, 3..5 on the
    high). Only the z-direction operators cross the row pair; they run as
    parity-split GEMM pairs (see _km3_body's H=2 sites). 0 = unsupported."""
    s = num_solpts
    if s**3 <= 128:
        return 1
    for H in (2, 4):
        if s % H == 0 and s**3 // H <= 128 and (s * s // H) * 2 <= 64:
            return H
    return 0


def pick_g3(num_solpts: int, nel_h: int, nel_v: int = None):
    """Elements-per-row packing g with g | nel_h that fits the state
    (g*s^3 <= 128) and one face family per 128-lane trace register
    (g*2*s^2 <= 128), preferring the largest g. When the packing exceeds
    the half-register bound (g*2s^2 > 64) the pipeline switches to the
    SPLIT trace layout — separate x and y face registers
    (is_split_layout) — which is what lets s=2 fill 16 elements/row
    (128/128 state lanes, r3 ran 40-48) and s=3 reach 4 (108/128 vs 81).
    With ``nel_v`` given, g is co-optimized with the y-slab height: a g
    whose blocks admit NO Mosaic-legal ty (ty*nel_v*(nel_h/g) % 8 != 0 for
    every ty | nel_h) is skipped in favor of a smaller one — e.g.
    (s=2, 30^3) needs g=15/ty=2, not a g with no valid ty.

    For s with s^3 > 128 (s=6) the HALF-SPLIT layout applies (pick_h):
    g = 1, one element across H rows."""
    s = num_solpts
    H = pick_h(s)
    if H == 0:
        return None
    if H > 1:
        return 1
    cap = min(128 // s**3, 64 // (s * s))
    fallback = None
    for g in range(min(cap, nel_h), 0, -1):
        if nel_h % g:
            continue
        if fallback is None:
            fallback = g
        if nel_v is None:
            return g
        nkxp = nel_v * (nel_h // g)
        if any((ty * nkxp) % 8 == 0 for ty in range(1, nel_h + 1) if nel_h % ty == 0):
            return g
    return fallback


def is_split_layout(num_solpts: int, g: int) -> bool:
    """True when the x/y face traces need SEPARATE 128-lane registers
    (g*2*s^2/H > 64 per-row face lanes): each family then uses lanes
    [0, g*2s^2/H) of its own register instead of sharing one register at a
    64-lane offset. (Half-split layouts carry s^2/H face points per row
    and family — s=6/H=2 has 36, so it shares one register.)"""
    H = max(pick_h(num_solpts), 1)
    return g * 2 * num_solpts * num_solpts // H > 64


_PANEL_ROWS_BUDGET = 1024  # whole-panel blocks: VMEM row cap per block


def grid_plan(num_solpts: int, nel_h: int, nel_v: int):
    """(g, ty, rowpad) of the grid (km3_fused) pipeline, or None.

    Prefers the y-slab decomposition (rowpad = 0, Mosaic-legal ty) at the
    maximum packing g. When the divisibility constraint would force a
    smaller g (e.g. canonical dcmip31 12x12x3 at s=2: ty-compatible g = 6 =
    48/128 lanes, but g = 12 = 96/128 has no legal ty) — or no ty exists at
    all (s=4 at 15^3) — it switches to WHOLE-PANEL blocks with the rows
    padded to a multiple of 8 (the km3_tile row-padding mechanism,
    dims["rows"]), as long as the panel fits the VMEM row budget."""
    s = num_solpts
    if pick_h(s) == 0:
        return None
    H = pick_h(s)
    g_free = pick_g3(s, nel_h)
    if g_free is None:
        return None
    g_ty = pick_g3(s, nel_h, nel_v)
    ty = pick_ty(s, nel_h, nel_v)
    if g_ty is not None and ty is not None and g_ty >= g_free:
        return g_ty, ty, 0
    rows6 = nel_h * nel_v * H * (nel_h // g_free)
    Rp6 = -(-rows6 // 8) * 8
    if Rp6 > _PANEL_ROWS_BUDGET:
        # Whole-panel blocks too big; fall back to the slab decomposition
        # when one exists.
        if g_ty is not None and ty is not None:
            return g_ty, ty, 0
        return None
    return g_free, nel_h, Rp6 - rows6


def supported(num_solpts: int, nel_h: int, nel_v: int, nvar: int, dtype) -> bool:
    """Shapes/dtypes the fused 3D pipeline handles; others fall back to XLA.

    Needs a grid plan (grid_plan): either a y-slab decomposition whose
    block rows tile the (8, 128) layout, or whole-panel blocks with padded
    rows. float64 only off-TPU (interpret mode)."""
    if nvar != 5 or not (2 <= num_solpts <= 6):
        return False
    if grid_plan(num_solpts, nel_h, nel_v) is None:
        return False
    if dtype in (jnp.float32, np.float32):
        return True
    return dtype in (jnp.float64, np.float64) and jax.default_backend() != "tpu"


def pick_ty(num_solpts: int, nel_h: int, nel_v: int, vmem_budget_rows: int = 128):
    """Largest y-slab height ty | ny with Mosaic-legal block rows
    (ty*nk*nxp % 8 == 0) under a VMEM row budget; None if none exists."""
    g = pick_g3(num_solpts, nel_h, nel_v)
    if g is None:
        return None
    nxp = nel_h // g
    nkxp = nel_v * max(pick_h(num_solpts), 1) * nxp
    best = None
    for ty in range(1, nel_h + 1):
        if nel_h % ty or (ty * nkxp) % 8:
            continue
        if ty * nkxp <= vmem_budget_rows or best is None:
            best = ty
        if ty * nkxp > vmem_budget_rows and best is not None:
            break
    return best


# ---------------------------------------------------------------------------
# Host-side packing helpers. Lane pads (when g*s^3 < 128) are NaN-safe by
# construction: rho and rho*theta pads carry 1.0 (their logs are 0, and the
# trace-GEMM rows for pad lanes are zero so nothing propagates), momenta 0.


def _pk(num_solpts: int, nel_h: int, nel_v: int = None, g: int = None):
    """(s, g, s3l, nxp, rowpad) of the packing, with s3l = s^3/H the STATE
    LANES PER ROW GROUP (s^3 when one element fits a row; 108 for the
    s=6 half-split). With ``nel_v`` given the grid plan decides g AND the
    per-panel row padding (whole-panel-block mode); an explicit ``g`` (the
    tile path, which pads its own rows) or a missing nel_v means rowpad
    0. Row order is (ky, kz, h, x2) — the H half-rows of an element sit
    ``nxp`` rows apart."""
    s = num_solpts
    H = max(pick_h(s), 1)
    s3l = s**3 // H
    if g is not None:
        return s, g, s3l, nel_h // g, 0
    if nel_v is None:
        g = pick_g3(s, nel_h)
        return s, g, s3l, nel_h // g, 0
    g, _ty, rowpad = grid_plan(s, nel_h, nel_v)
    return s, g, s3l, nel_h // g, rowpad


def _pad_panel_rows(b, rowpad: int, fill=None, xp=np):
    """(..., 6, rows6, 128) -> (..., 6, rows6+rowpad, 128): append pad rows
    per panel (NaN-safe fill per leading variable when given)."""
    if rowpad == 0:
        return b
    shape = b.shape[:-2] + (rowpad, LANES)
    if fill is None:
        pad = xp.zeros(shape, b.dtype)
    else:
        f = xp.asarray(fill, b.dtype).reshape((len(fill),) + (1,) * (len(shape) - 1))
        pad = xp.broadcast_to(f, shape)
    return xp.concatenate([b, pad], axis=-2)


def _split_h(b, H: int, s3l: int, xp):
    """(..., 6, ny, nk, nxp, H*s3l) element view -> (..., 6, ny, nk,
    H*nxp, s3l) interleaved half-rows (kz_s is the OUTER index of the
    point ordering, so the lane split is a plain reshape)."""
    if H == 1:
        return b
    lead = b.shape[:-2]
    nxp = b.shape[-2]
    b = b.reshape(lead + (nxp, H, s3l))
    b = xp.moveaxis(b, -2, -3)
    return b.reshape(lead + (H * nxp, s3l))


def _merge_h(b, H: int, s3l: int, xp):
    """Inverse of _split_h."""
    if H == 1:
        return b
    lead = b.shape[:-2]
    nxp = b.shape[-2] // H
    b = b.reshape(lead + (H, nxp, s3l))
    b = xp.moveaxis(b, -3, -2)
    return b.reshape(lead + (nxp, H * s3l))


def pack_rows(a: np.ndarray, nel_h: int, nel_v: int, s: int = 4, g: int = None,
              rowpad: int = None) -> np.ndarray:
    """Model layout (..., 6, nk, ny, nx, s^3) -> packed (..., R, 128).
    ``rowpad`` overrides the grid plan's per-panel row padding (used by
    build_constants, which also takes an explicit g)."""
    s, g, s3l, nxp, rp = _pk(s, nel_h, nel_v, g)
    H = max(pick_h(s), 1)
    if rowpad is not None:
        rp = rowpad
    lead = a.shape[:-5]
    b = np.moveaxis(a, -4, -3)  # (..., 6, ny, nk, nx, s^3)
    b = b.reshape(lead + (6, nel_h, nel_v, nxp, g * s3l * H))
    b = _split_h(b, H, g * s3l, np)
    pad = np.zeros(b.shape[:-1] + (128 - g * s3l,), b.dtype)
    b = np.concatenate([b, pad], axis=-1).reshape(
        lead + (6, nel_h * nel_v * H * nxp, LANES)
    )
    b = _pad_panel_rows(b, rp, xp=np)
    return b.reshape(lead + (6 * b.shape[-2], LANES))


def unpack_rows(a: np.ndarray, nel_h: int, nel_v: int, s: int = 4) -> np.ndarray:
    """Packed (..., R, 128) -> model layout (..., 6, nk, ny, nx, s^3)."""
    s, g, s3l, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    xp = np if isinstance(a, np.ndarray) else jnp
    lead = a.shape[:-2]
    rows6 = nel_h * nel_v * H * nxp
    b = a.reshape(lead + (6, rows6 + rp, LANES))
    b = b[..., :rows6, : g * s3l]
    b = b.reshape(lead + (6, nel_h, nel_v, H * nxp, g * s3l))
    b = _merge_h(b, H, g * s3l, xp)
    b = b.reshape(lead + (6, nel_h, nel_v, nxp * g, s**3))
    return xp.moveaxis(b, -3, -4)


def pack_rows_jnp(a: jnp.ndarray, nel_h: int, nel_v: int, s: int = 4) -> jnp.ndarray:
    s, g, s3l, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    lead = a.shape[:-5]
    b = jnp.moveaxis(a, -4, -3).reshape(lead + (6, nel_h, nel_v, nxp, g * s3l * H))
    b = _split_h(b, H, g * s3l, jnp)
    pad = jnp.zeros(b.shape[:-1] + (128 - g * s3l,), b.dtype)
    b = jnp.concatenate([b, pad], axis=-1).reshape(
        lead + (6, nel_h * nel_v * H * nxp, LANES)
    )
    b = _pad_panel_rows(b, rp, xp=jnp)
    return b.reshape(lead + (6 * b.shape[-2], LANES))


def pack_state_jnp(a: jnp.ndarray, nel_h: int, nel_v: int, s: int = 4) -> jnp.ndarray:
    """pack_rows_jnp for a (5, ...) STATE: lane AND panel-row pads filled
    NaN-safely (rho/rho*theta = 1, momenta = 0)."""
    s_, g, s3l, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s_), 1)
    qp = pack_rows_jnp(a, nel_h, nel_v, s)
    if g * s3l == 128 and rp == 0:
        return qp
    rows6p = nel_h * nel_v * H * nxp + rp
    lanepad = jnp.arange(LANES) >= g * s3l
    rowmask = jnp.arange(rows6p) >= (rows6p - rp) if rp else None
    mask = jnp.broadcast_to(lanepad[None, :], (rows6p, LANES))
    if rp:
        mask = mask | rowmask[:, None]
    mask = jnp.tile(mask, (6, 1))
    fill = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0], qp.dtype)[:, None, None]
    return jnp.where(mask[None, :, :], fill, qp)


def unpack_rows_jnp(a: jnp.ndarray, nel_h: int, nel_v: int, s: int = 4) -> jnp.ndarray:
    s, g, s3l, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    lead = a.shape[:-2]
    rows6 = nel_h * nel_v * H * nxp
    b = a.reshape(lead + (6, rows6 + rp, LANES))
    b = b[..., :rows6, : g * s3l]
    b = b.reshape(lead + (6, nel_h, nel_v, H * nxp, g * s3l))
    b = _merge_h(b, H, g * s3l, jnp)
    b = b.reshape(lead + (6, nel_h, nel_v, nxp, g, s**3))
    b = b.reshape(lead + (6, nel_h, nel_v, nel_h, s**3))
    return jnp.moveaxis(b, -3, -4).reshape(lead + (6, nel_v, nel_h, nel_h, s**3))


class E3Constants(NamedTuple):
    """Trace-time constants of the fused 3D pipeline (device arrays).

    ``fields`` are the single-panel interior metric fields in packed-row
    layout (R/6, 128); ``itf_xy``/``itf_z`` the single-panel interface
    metric in trace-slot layout; ``tch`` the 9 time-Christoffel fields —
    ``None`` for a non-rotating planet (they vanish), else FULL-size
    (R, 128) because the Coriolis terms differ per panel."""

    # interior, single panel (R6, 128) each
    sqrtg: jnp.ndarray
    inv_sqrtg: jnp.ndarray
    inv_dzdeta: jnp.ndarray
    h: tuple  # 6 fields: h11, h12, h13, h22, h23, h33
    chs: tuple  # 18 spatial Christoffels: [a][j] for a=0..2, j=0..5 (rows 3..8)
    wpres_int: jnp.ndarray  # sum_d (sqrtG h^{d3}) @ D_d (constant interior term)
    tch: tuple | None  # 9 full-size time Christoffels (rotating planets)
    # interface metric in slot layout, single panel
    itf_xy: tuple  # (sg, hd, h0, h1, h2) each (R6, 128); x-only in split mode
    itf_z: tuple  # (sg, hd, h0, h1, h2) each (R6, 128), lanes 0..T
    # operator matrices
    e_xy: jnp.ndarray  # (128, 128) state row -> x|y face traces (x-only in split)
    e_z: jnp.ndarray  # (128, 128) state row -> z face traces (lanes 0..T)
    dd: jnp.ndarray  # (384, 128) [fx|fy|fz] -> x+y+z divergence sum
    dlp: jnp.ndarray  # (128, 384) logp -> per-direction interior gradient
    corr: jnp.ndarray  # (256|384, 128) [xy|z] (or [x|y|z]) face fluxes -> correction
    lfc_xy: jnp.ndarray  # (128, 384) xy-slot (or x-slot) face logp -> per-dir corr
    lfc_z: jnp.ndarray  # (128, 384) z-slot face logp -> per-direction correction
    hfk: jnp.ndarray  # (128, 128) block-diag highfilter_k (gravity)
    # SPLIT trace layout (is_split_layout: g*2s^2 > 64) — the x and y face
    # families each get a full 128-lane register; these hold the y family's
    # counterparts (None in the combined layout).
    e_y: jnp.ndarray = None  # (128, 128) state row -> y face traces
    lfc_y: jnp.ndarray = None  # (128, 384) y-slot face logp -> d=1 correction
    itf_y: tuple = None  # y-family interface metric, (R6, 128) each
    # HALF-SPLIT layout (pick_h > 1, s=6): the z-direction operators cross
    # the element's H=2 rows and run as parity-paired GEMMs. Tuple of
    # (ez1, dz00, dz01, dz10, dz11, cz0, cz1, hf00, hf01, hf10, hf11):
    # e_z holds the LOW half's z-extrapolation (ez0); dz/hf map in-half ->
    # out-half (divergence + dlp gradient / gravity filter); cz the
    # z-face-to-points correction per output half. None when H == 1.
    zsplit: tuple = None


def _bdg(a: np.ndarray, g: int, lanes: int = LANES) -> np.ndarray:
    """Block-diagonal over the g elements of a row, zero-padded to lanes."""
    r, c = a.shape
    out = np.zeros((lanes, lanes), a.dtype)
    for k in range(g):
        out[k * r : (k + 1) * r, k * c : (k + 1) * c] = a
    return out


def build_constants(ops, metric, nel_h: int, nel_v: int, s: int = 4, dtype=jnp.float32,
                    g: int = None) -> E3Constants:
    """Precompute every constant array of the fused 3D pipeline (host).
    ``g`` overrides the row packing (the single-tile path uses tile_plan's
    packing, which has no y-slab divisibility constraint)."""
    if g is None:
        G, _ty, rowpad = grid_plan(s, nel_h, nel_v)
    else:
        G, rowpad = g, 0
    H = max(pick_h(s), 1)
    SS, S3 = s * s, s**3
    S3L = S3 // H  # state lanes per row group
    FSS = SS // H  # xy-face points per row per side
    TSS = 2 * FSS  # xy trace lanes per element-row per family
    nxp = nel_h // G
    rows6 = nel_h * nel_v * H * nxp  # rows per panel (excluding row pads)
    f64 = lambda a: np.asarray(a, np.float64)

    # --- operator matrices -------------------------------------------------
    ex3, ey3, ez3 = f64(ops.extrap_x3), f64(ops.extrap_y3), f64(ops.extrap_z3)
    dx3, dy3, dz3 = f64(ops.derivative_x3), f64(ops.derivative_y3), f64(ops.derivative_z3)
    cwe, csn, cdu = f64(ops.correction_WE3), f64(ops.correction_SN3), f64(ops.correction_DU3)

    split = is_split_layout(s, G)
    yoff = 0 if split else 64  # y-family lane offset within its register

    if H > 1:
        # Half-split layout (s=6): the in-row x/y operator blocks are the
        # kz-half submatrices — IDENTICAL for both halves (they act within
        # constant-kz lines; asserted below). z operators cross the row
        # pair and get their own parity-paired matrices (zsplit).
        def _heq(subs, what):
            sc = max(np.abs(subs[0]).max(), 1e-300)
            for m in subs[1:]:
                assert np.abs(m - subs[0]).max() <= 1e-14 * sc, what
            return subs[0]

        def _fidx(h):
            # face lanes [west_h | east_h] of half h within a 2*SS face block
            return np.concatenate(
                [np.arange(h * FSS, (h + 1) * FSS),
                 np.arange(SS + h * FSS, SS + (h + 1) * FSS)]
            )

        def xysub(a):  # (S3, 2*SS) extrapolation -> (S3L, TSS) half block
            return _heq(
                [a[h * S3L : (h + 1) * S3L][:, _fidx(h)] for h in range(H)], "extrap"
            )

        def csub(a):  # (2*SS, S3) correction -> (TSS, S3L) half block
            return _heq(
                [a[_fidx(h)][:, h * S3L : (h + 1) * S3L] for h in range(H)], "corr"
            )

        ex_h = xysub(ex3)
        ey_h = xysub(ey3)
        dx_h = _heq([dx3[h * S3L : (h + 1) * S3L, h * S3L : (h + 1) * S3L]
                     for h in range(H)], "dx")
        dy_h = _heq([dy3[h * S3L : (h + 1) * S3L, h * S3L : (h + 1) * S3L]
                     for h in range(H)], "dy")
        assert np.abs(dx3[:S3L, S3L:]).max() == 0.0 and np.abs(dy3[:S3L, S3L:]).max() == 0.0

        e_xy = np.zeros((LANES, LANES))
        e_y_m = None
        e_z = np.zeros((LANES, LANES))  # ez0: LOW half's z-extrapolation
        e_xy[:S3L, :TSS] = ex_h
        e_xy[:S3L, yoff : yoff + TSS] = ey_h
        e_z[:S3L, : 2 * SS] = ez3[:S3L]
        ez1 = np.zeros((LANES, LANES))
        ez1[:S3L, : 2 * SS] = ez3[S3L:]

        dd = np.zeros((2 * LANES, LANES))  # [fx|fy] -> in-row divergence
        dd[:S3L, :S3L] = dx_h
        dd[LANES : LANES + S3L, :S3L] = dy_h
        dzm = []
        for i in range(H):
            for j in range(H):
                m = np.zeros((LANES, LANES))
                m[:S3L, :S3L] = dz3[i * S3L : (i + 1) * S3L, j * S3L : (j + 1) * S3L]
                dzm.append(m)

        dlp = np.zeros((LANES, 2 * LANES))  # logp -> [x|y] in-row gradients
        dlp[:S3L, :S3L] = dx_h
        dlp[:S3L, LANES : LANES + S3L] = dy_h

        cwe_h = csub(cwe)
        csn_h = csub(csn)
        corr = np.zeros((LANES, LANES))  # xy-only; z via cz0/cz1
        corr[:TSS, :S3L] = cwe_h
        corr[yoff : yoff + TSS, :S3L] = csn_h
        czm = []
        for h in range(H):
            m = np.zeros((LANES, LANES))
            m[: 2 * SS, :S3L] = cdu[:, h * S3L : (h + 1) * S3L]
            czm.append(m)

        lfc_xy = np.zeros((LANES, 2 * LANES))
        lfc_xy[:TSS, :S3L] = cwe_h
        lfc_xy[yoff : yoff + TSS, LANES : LANES + S3L] = csn_h
        lfc_y_m = None
        lfc_z = None  # z face-logp corrections go through czm

        hk = f64(ops.highfilter_k)
        hfm = []
        for i in range(H):
            for j in range(H):
                m = np.zeros((LANES, LANES))
                m[:S3L, :S3L] = hk[i * S3L : (i + 1) * S3L, j * S3L : (j + 1) * S3L]
                hfm.append(m)
        hfk = np.zeros((LANES, LANES))  # unused in H>1 mode (hfm instead)
        zsplit_np = [ez1] + dzm + czm + hfm
    else:
        e_xy = np.zeros((LANES, LANES))  # x-only when split
        e_y_m = np.zeros((LANES, LANES)) if split else None
        e_z = np.zeros((LANES, LANES))
        for g in range(G):
            sl = slice(g * S3, (g + 1) * S3)
            e_xy[sl, g * TSS : (g + 1) * TSS] = ex3  # west|east
            ytgt = e_y_m if split else e_xy
            ytgt[sl, yoff + g * TSS : yoff + (g + 1) * TSS] = ey3  # south|north
            e_z[sl, g * TSS : (g + 1) * TSS] = ez3  # down|up

        dd = np.zeros((3 * LANES, LANES))
        for g in range(G):
            for d, m in enumerate((dx3, dy3, dz3)):
                dd[d * LANES + g * S3 : d * LANES + (g + 1) * S3, g * S3 : (g + 1) * S3] = m

        dlp = np.zeros((LANES, 3 * LANES))
        for g in range(G):
            for d, m in enumerate((dx3, dy3, dz3)):
                dlp[g * S3 : (g + 1) * S3, d * LANES + g * S3 : d * LANES + (g + 1) * S3] = m

        # Correction GEMM: input [xy-slot row | z-slot row] (256 lanes) in the
        # combined layout, [x | y | z] (384) in the split layout; output s^3.
        corr = np.zeros(((3 if split else 2) * LANES, LANES))
        lfc_xy = np.zeros((LANES, 3 * LANES))
        lfc_y_m = np.zeros((LANES, 3 * LANES)) if split else None
        lfc_z = np.zeros((LANES, 3 * LANES))
        ycorr = LANES if split else 0  # y block offset in corr's input rows
        zcorr = 2 * LANES if split else LANES
        for g in range(G):
            out = slice(g * S3, (g + 1) * S3)
            corr[g * TSS : (g + 1) * TSS, out] = cwe
            corr[ycorr + yoff + g * TSS : ycorr + yoff + (g + 1) * TSS, out] = csn
            corr[zcorr + g * TSS : zcorr + (g + 1) * TSS, out] = cdu
            lfc_xy[g * TSS : (g + 1) * TSS, 0 * LANES + g * S3 : 0 * LANES + (g + 1) * S3] = cwe
            ylfc = lfc_y_m if split else lfc_xy
            ylfc[yoff + g * TSS : yoff + (g + 1) * TSS, 1 * LANES + g * S3 : 1 * LANES + (g + 1) * S3] = csn
            lfc_z[g * TSS : (g + 1) * TSS, 2 * LANES + g * S3 : 2 * LANES + (g + 1) * S3] = cdu

        hfk = _bdg(f64(ops.highfilter_k), G)
        zsplit_np = None

    # --- interior fields, single panel -------------------------------------
    def panel0(a, scale=None):
        # Geometric fields of the equiangular cubed sphere are identical on
        # all six panels up to the rounding of the numerical metric build
        # (~5e-13 relative to the field scale). `scale` lets a family of
        # fields share one magnitude so identically-zero members (pure
        # rounding noise) pass.
        full = pack_rows(f64(a), nel_h, nel_v, s, g=G)
        one = full[:rows6]
        tol = 1e-10 * max(np.abs(full).max() if scale is None else scale, 1e-300)
        if np.abs(full.reshape(6, rows6, LANES) - one).max() > tol:
            raise ValueError("interior metric field unexpectedly differs across panels")
        return one

    sqrtg = panel0(metric.sqrtG)
    inv_sqrtg = panel0(metric.inv_sqrtG)
    inv_dzdeta = panel0(metric.inv_dzdeta)
    h_fields = tuple(
        panel0(metric.h_contra[a, b]) for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    )
    ch_scale = np.abs(f64(metric.christoffel[:, 3:])).max()
    chs = tuple(
        panel0(metric.christoffel[a, 3 + j], scale=ch_scale) for a in range(3) for j in range(6)
    )

    tch_np = f64(metric.christoffel[:, :3])  # (3, 3, 6, nk, ny, nx, s3)
    if np.all(tch_np == 0.0):
        tch = None
    else:
        tch = tuple(
            # Full-size per-panel field: row-padded alongside the state so
            # tch blocks align in whole-panel (rowpad > 0) mode.
            jnp.asarray(pack_rows(tch_np[a, b], nel_h, nel_v, s, g=G, rowpad=rowpad),
                        dtype=dtype)
            for a in range(3)
            for b in range(3)
        )

    # Interior part of the w pressure split: sum_d (sqrtG h^{d3}) @ D_d.
    wp = (
        f64(metric.sqrtG) * f64(metric.h_contra[0, 2]) @ dx3
        + f64(metric.sqrtG) * f64(metric.h_contra[1, 2]) @ dy3
        + f64(metric.sqrtG) * f64(metric.h_contra[2, 2]) @ dz3
    )
    wpres_int = panel0(wp)

    # --- interface metric in trace-slot layout ------------------------------
    def _row(ky, kz, h, x2):
        return ((ky * nel_v + kz) * H + h) * nxp + x2

    def slot_x(m_i):
        """m_i: (nk, ny, nx+1, ss) x-interfaces of panel 0 -> (rows6, 128)
        x-register slots. Every element's west slot carries its west
        interface metric, its east ("h2") slot the east one — panel edges
        AND interior y-slab boundaries read the h2 slots. Pads stay 1.0
        (safe under sqrt/divide). Half-split rows carry their half's FSS
        face values."""
        out = np.ones((rows6, LANES))
        for ky in range(nel_h):
            for kz in range(nel_v):
                for h in range(H):
                    fsl = slice(h * FSS, (h + 1) * FSS)
                    for x2 in range(nxp):
                        row = _row(ky, kz, h, x2)
                        for g in range(G):
                            ex = G * x2 + g
                            b = g * TSS
                            out[row, b : b + FSS] = m_i[kz, ky, ex][fsl]
                            out[row, b + FSS : b + TSS] = m_i[kz, ky, ex + 1][fsl]
        return out

    def slot_y(m_j, out=None):
        """m_j: (nk, ny+1, nx, ss) y-interfaces -> y-register slots at lane
        offset ``yoff`` (their own register when split, upper half of the
        shared register otherwise)."""
        out = np.ones((rows6, LANES)) if out is None else out
        for ky in range(nel_h):
            for kz in range(nel_v):
                for h in range(H):
                    fsl = slice(h * FSS, (h + 1) * FSS)
                    for x2 in range(nxp):
                        row = _row(ky, kz, h, x2)
                        for g in range(G):
                            ex = G * x2 + g
                            b = yoff + g * TSS
                            out[row, b : b + FSS] = m_j[kz, ky, ex][fsl]
                            out[row, b + FSS : b + TSS] = m_j[kz, ky + 1, ex][fsl]
        return out

    def slot_xy(m_i, m_j):
        return slot_y(m_j, out=slot_x(m_i))

    def slot_z(m_k):
        """m_k: (nk+1, ny, nx, ss) -> (rows6, 128), lanes g*2ss+[d|u]*ss+k.
        Half-split: the z-face slots (FULL ss per side) live on the LOW
        (h = 0) row of each element; high rows keep the 1.0 pad."""
        out = np.ones((rows6, LANES))
        for ky in range(nel_h):
            for kz in range(nel_v):
                for x2 in range(nxp):
                    row = _row(ky, kz, 0, x2)
                    for g in range(G):
                        ex = G * x2 + g
                        b = g * 2 * SS
                        out[row, b : b + SS] = m_k[kz, ky, ex]  # down (incl. ground)
                        out[row, b + SS : b + 2 * SS] = m_k[kz + 1, ky, ex]  # up (incl. lid)
        return out

    def p0_itf(a, scale=None):
        a = f64(a)
        tol = 1e-10 * max(np.abs(a).max() if scale is None else scale, 1e-300)
        if np.abs(a - a[:1]).max() > tol:
            raise ValueError("interface metric field unexpectedly differs across panels")
        return a[0]

    sg_i, sg_j, sg_k = p0_itf(metric.sqrtG_itf_i), p0_itf(metric.sqrtG_itf_j), p0_itf(metric.sqrtG_itf_k)
    hsc_i = np.abs(f64(metric.h_contra_itf_i)).max()
    hsc_j = np.abs(f64(metric.h_contra_itf_j)).max()
    hsc_k = np.abs(f64(metric.h_contra_itf_k)).max()
    hi = lambda a, b: p0_itf(metric.h_contra_itf_i[a, b], scale=hsc_i)
    hj = lambda a, b: p0_itf(metric.h_contra_itf_j[a, b], scale=hsc_j)
    hk = lambda a, b: p0_itf(metric.h_contra_itf_k[a, b], scale=hsc_k)

    x_pairs = ((sg_i, sg_j), (hi(0, 0), hj(1, 1)), (hi(0, 0), hj(1, 0)),
               (hi(0, 1), hj(1, 1)), (hi(0, 2), hj(1, 2)))
    if split:
        itf_xy = tuple(slot_x(mi) for mi, _ in x_pairs)
        itf_y = tuple(slot_y(mj) for _, mj in x_pairs)
    else:
        itf_xy = tuple(slot_xy(mi, mj) for mi, mj in x_pairs)
        itf_y = None
    itf_z = (
        slot_z(sg_k),
        slot_z(hk(2, 2)),
        slot_z(hk(2, 0)),
        slot_z(hk(2, 1)),
        slot_z(hk(2, 2)),
    )

    c = lambda a: jnp.asarray(a, dtype=dtype)
    ct = lambda t: tuple(c(a) for a in t)
    return E3Constants(
        sqrtg=c(sqrtg), inv_sqrtg=c(inv_sqrtg), inv_dzdeta=c(inv_dzdeta),
        h=ct(h_fields), chs=ct(chs), wpres_int=c(wpres_int), tch=tch,
        itf_xy=ct(itf_xy), itf_z=ct(itf_z),
        e_xy=c(e_xy), e_z=c(e_z), dd=c(dd), dlp=c(dlp), corr=c(corr),
        lfc_xy=c(lfc_xy), lfc_z=(c(lfc_z) if lfc_z is not None else c(np.zeros((LANES, 3 * LANES)))),
        hfk=c(hfk),
        e_y=(c(e_y_m) if split else None),
        lfc_y=(c(lfc_y_m) if split else None),
        itf_y=(ct(itf_y) if split else None),
        zsplit=(ct(zsplit_np) if zsplit_np is not None else None),
    )


# ---------------------------------------------------------------------------
# KM3 kernel body. Written as a pure jnp function over VMEM-resident values
# so the same code runs under pallas (Mosaic/interpret) AND as a plain jnp
# function in the unit tests; `roll` is pltpu.roll in-kernel, jnp.roll in
# pure mode (identical semantics: value at index i moves to i+shift).


def _pressure(rt):
    return P0 * jnp.exp(GAMMA * jnp.log((RD / P0) * rt))


# Mosaic has no expm1/log1p lowering; these are the classic 1-2 ulp
# compensation formulas (Goldberg) built from exp/log/where, which it has.
# The correction factor x/(u-1) (resp. x/log(y)) cancels the rounding of
# the 1+x (resp. exp) step, preserving the small-argument accuracy the
# perturbation form relies on.


def _log1p(x):
    u = 1.0 + x
    d = u - 1.0
    return jnp.where(d == 0.0, x, jnp.log(u) * (x / jnp.where(d == 0.0, 1.0, d)))


def _expm1(x):
    y = jnp.exp(x)
    d = y - 1.0
    lg = jnp.log(y)
    return jnp.where(d == 0.0, x, d * (x / jnp.where(lg == 0.0, 1.0, lg)))


def _km3_body(
    q, qprev, qnext, hwe, hs, hn, con, dims, ytile, n_ytiles, roll,
    x=None, cdt=None, stage_a=None, stage_b=None, bal=None, lwe=None,
    base=None, tangent=None,
):
    """q: (5, Rb, 128) block rows of one panel; qprev/qnext: (5, nkxp, 128)
    boundary grid-rows of the neighbouring y-slabs; hwe: (5, ty*nk, 128)
    panel-edge west/east halo faces (lanes 0..15 / 48..63); hs/hn:
    (5, nkxp, 128) panel-edge south/north halo faces in ys/yn slot lanes.
    con: dict of constant blocks. Returns the 5 output rows (5, Rb, 128).

    ``base`` switches to the perturbation (base-state-split) form — the
    kernel twin of models/euler_cubesphere.py _euler3d_rhs_core_pert. q,
    qprev/qnext and the halos then carry the PERTURBATION; ``base`` is a
    dict with the same-shaped base-state inputs {q0, q0prev, q0next, hwe0,
    hs0, hn0} plus the packed f64 base RHS {rhs0}. Every linear stage
    (GEMMs, assembly selects, fills) acts on deltas directly; every
    nonlinear site (log-space extrapolation, pressure, Rusanov, the w
    pressure split, forcing) is expanded exactly via expm1/log1p and
    product rules, so the hydrostatic cancellation never has to survive
    float32 rounding. Output = rhs0 + delta (or its RK stage combination
    of delta states, exact whenever a + b = 1).

    ``tangent`` (requires ``base``) switches the kernel to the JACOBIAN
    ACTION J(q0+dq).v — the analytically linearized operator the
    exponential/implicit Krylov loops apply once per iteration (reference
    hot loop: solvers/kiops.py:181-199 there; here the XLA alternative is
    jax.jvp of the pert core, which moves the ~9.3 GB/eval schedule).
    ``tangent`` is a dict {v, vprev, vnext, vwe, vs, vn} shaped exactly
    like the primal (q, qprev, qnext, hwe, hs, hn) but carrying the
    DIRECTION. The pert path's primal intermediates double as the
    linearization coefficients (absolute traces, interface states, normal
    speeds, pressures, eigen speeds, face log-pressure chains); every
    nonlinear site contributes its exact directional derivative:
    d exp(E.log q) = tr_abs * (E.(v/q_abs)), dp = gamma p v_rt/q_rt,
    d|vn| = sign(vn) dvn, d max(aL, aR) = the active side's derivative.
    The output rows are J.v alone (no rhs0/bal/stage combination); the
    unused primal flux branches are dead-code-eliminated by the compiler.
    """
    if tangent is not None:
        assert base is not None, "tangent mode linearizes the perturbation form"
        assert stage_a is None and lwe is None and bal is None, (
            "tangent mode emits J.v alone (no stage combination/slabs/offset)"
        )
    nk, nxp, ty = dims["nk"], dims["nxp"], dims["ty"]
    s = dims["s"]
    SS, G = s * s, dims["g"]
    HH = dims.get("h", 1)  # half-split rows per element (s=6: 2)
    FSS = SS // HH  # xy-face points per row per side
    TSS = 2 * FSS
    T = G * TSS  # used xy trace lanes per family
    TZ = G * 2 * SS  # z trace lanes (full faces; on the LOW row when HH>1)
    zstr = HH * nxp  # row stride between z-neighbour elements
    nkxp = nk * HH * nxp
    Rb = ty * nkxp
    # Whole-tile mode (km3_tile): arrays are row-padded to ``dims["rows"]``
    # >= Rb so a single no-grid block meets the (8, 128) tiling. Pad rows
    # sit past the last real y-row; every roll that could pull them into a
    # real row lands only on masked (hs/hn/keep_*) positions, so they only
    # ever produce pad-row garbage, which the caller discards.
    Rp = dims.get("rows", Rb)
    dtype = q.dtype
    f = lambda v: jnp.asarray(v, dtype)

    # Trace layout: combined (x lanes [0, 64) | y lanes [64, 128) of ONE
    # register, T = G*TSS <= 64) or SPLIT (g*2s^2 > 64): the x and y face
    # families are stacked along ROWS — a (2*Rp, 128) array with x rows
    # first — and each family uses lanes [0, T) of its own register. All
    # row rolls wrap within the stacked array; every cross-half wrap lands
    # on positions the masks overwrite (the same argument that covers the
    # combined layout's own wraps).
    split = is_split_layout(s, G)
    Rt = 2 * Rp if split else Rp

    # All index math stays strictly int32 via lax ops: Python-int floor
    # division would promote through int64/f32 converts that Mosaic cannot
    # lower (its convert rule recurses).
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rp, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Rp, LANES), 0)

    # --- state-register masks (interior + z family, shape (Rp, 128)) ------
    lo_half_s = jax.lax.rem(lane, i32(2 * SS)) < SS
    in_fam_s = lane < TZ
    is_low = jax.lax.rem(jax.lax.div(row, i32(nxp)), i32(HH)) == 0
    zd = lo_half_s & in_fam_s & is_low
    zu = (~lo_half_s) & in_fam_s & is_low
    kz_s = jax.lax.rem(jax.lax.div(row, i32(zstr)), i32(nk))
    kz0 = kz_s == 0
    kztop = kz_s == nk - 1

    # --- xy-trace-register masks (shape (Rt, 128)) ------------------------
    if split:
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (Rt, LANES), 1)
        srow = jax.lax.broadcasted_iota(jnp.int32, (Rt, LANES), 0)
        is_x = srow < Rp
        rrow = jnp.where(is_x, srow, srow - Rp)
        lrel = lane_t
    else:
        srow = row
        is_x = lane < 64
        rrow = srow
        # Face parity on HALF-relative lanes (the y family starts at lane
        # 64, a multiple of 2*s^2 only for s in {2, 4}).
        lrel = jnp.where(is_x, lane, lane - 64)
    lo_half = jax.lax.rem(lrel, i32(TSS)) < FSS
    x2 = jax.lax.rem(rrow, i32(nxp))
    kyl = jax.lax.div(rrow, i32(nkxp))

    in_fam = lrel < T  # used trace lanes (the rest is zero padding)
    xw = is_x & lo_half & in_fam
    xe = is_x & ~lo_half & in_fam
    ys = (~is_x) & lo_half & in_fam
    yn = (~is_x) & ~lo_half & in_fam
    g1 = (lrel >= (G - 1) * TSS) & in_fam  # last element group of the row

    first_ky = kyl == 0
    last_ky = kyl == ty - 1
    south_edge = first_ky & (ytile == 0)
    north_edge = last_ky & (ytile == n_ytiles - 1)
    west_col = x2 == 0
    east_col = x2 == nxp - 1

    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=dtype)

    if HH > 1:
        (zs_ez1, dz00, dz01, dz10, dz11, cz0, cz1,
         hf00, hf01, hf10, hf11) = con["zsplit"]

        def _low_rows(n_rows):
            r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANES), 0)
            return jax.lax.rem(jax.lax.div(r, i32(nxp)), i32(HH)) == 0

        def zpair(a, m00, m01, m10, m11):
            """Parity-paired z GEMM over an element's two half-rows:
            out(low) = a@m00 + partner@m10, out(high) = a@m11 + partner@m01
            (partner = the element's other half-row, nxp rows away)."""
            n = a.shape[0]
            low = _low_rows(n)
            pa = jnp.where(low, roll(a, np.int32(n - nxp), 0), roll(a, np.int32(nxp), 0))
            return jnp.where(low, mm(a, m00) + mm(pa, m10), mm(a, m11) + mm(pa, m01))

        def zface_out(a, lo_m, hi_m):
            """z-face slot values (valid on LOW rows) -> per-point
            contributions on both half-rows."""
            n = a.shape[0]
            low = _low_rows(n)
            return jnp.where(low, mm(a, lo_m), roll(mm(a, hi_m), np.int32(nxp), 0))

    # --- extrapolation to faces (rho, rho*theta in log space) -------------
    def traces_raw(rows_in):
        big = jnp.concatenate(rows_in, axis=0)
        t_z = mm(big, con["e_z"])
        if HH > 1:
            # z faces gather from BOTH half-rows; the partner term reads the
            # high row (+nxp). Valid on low rows; high rows hold (finite)
            # garbage the z masks discard.
            t_z = t_z + mm(roll(big, np.int32(big.shape[0] - nxp), 0), zs_ez1)
        n = rows_in[0].shape[0]
        sp = lambda t: [t[i * n : (i + 1) * n] for i in range(5)]
        if split:
            # Separate x / y family GEMMs, stacked along rows per variable.
            t_x = mm(big, con["e_xy"])
            t_y = mm(big, con["e_y"])
            t_xy = [
                jnp.concatenate([t_x[i * n : (i + 1) * n], t_y[i * n : (i + 1) * n]], axis=0)
                for i in range(5)
            ]
            return t_xy, sp(t_z)
        t_xy = mm(big, con["e_xy"])
        return sp(t_xy), sp(t_z)

    def traces(rows_in):
        t_xy, t_z = traces_raw(rows_in)
        for i in (0, 4):
            t_xy[i] = jnp.exp(t_xy[i])
            t_z[i] = jnp.exp(t_z[i])
        return t_xy, t_z

    log_rows = lambda qq: [jnp.log(qq[0]), qq[1], qq[2], qq[3], jnp.log(qq[4])]
    # Delta rows for the log-space families: d(tr) = tr0 * expm1(E . log1p(d/base)).
    dlog_rows = lambda dq_, q0_: [
        _log1p(dq_[0] / q0_[0]), dq_[1], dq_[2], dq_[3], _log1p(dq_[4] / q0_[4])
    ]

    if base is None:
        tr, trz = traces(log_rows(q))
        trp, _ = traces(log_rows(qprev))  # previous slab: need its north faces
        trn, _ = traces(log_rows(qnext))  # next slab: need its south faces
    else:
        tr0, trz0 = traces(log_rows(base["q0"]))
        trp0, _ = traces(log_rows(base["q0prev"]))
        trn0, _ = traces(log_rows(base["q0next"]))

        def dtraces(dq_, q0_, t0_xy, t0_z):
            raw_xy, raw_z = traces_raw(dlog_rows(dq_, q0_))
            for i in (0, 4):
                raw_xy[i] = t0_xy[i] * _expm1(raw_xy[i])
                if t0_z is not None:
                    raw_z[i] = t0_z[i] * _expm1(raw_z[i])
            return raw_xy, raw_z

        tr, trz = dtraces(q, base["q0"], tr0, trz0)
        trp, _ = dtraces(qprev, base["q0prev"], trp0, None)
        trn, _ = dtraces(qnext, base["q0next"], trn0, None)

    if tangent is not None:
        # Absolute primal traces (base + delta) are the tangent's
        # coefficients: d exp(E.log q) . v = tr_abs * (E.(v/q_abs)).
        tra = [a + b for a, b in zip(tr0, tr)]
        trza = [a + b for a, b in zip(trz0, trz)]
        trpa = [a + b for a, b in zip(trp0, trp)]
        trna = [a + b for a, b in zip(trn0, trn)]
        qa_rows = [base["q0"][v] + q[v] for v in range(5)]
        qpa_rows = [base["q0prev"][v] + qprev[v] for v in range(5)]
        qna_rows = [base["q0next"][v] + qnext[v] for v in range(5)]
        tlog_rows = lambda tv_, qa_: [
            tv_[0] / qa_[0], tv_[1], tv_[2], tv_[3], tv_[4] / qa_[4]
        ]

        def ttraces(tv_, qa_, ta_xy, ta_z):
            raw_xy, raw_z = traces_raw(tlog_rows(tv_, qa_))
            for i in (0, 4):
                raw_xy[i] = ta_xy[i] * raw_xy[i]
                if ta_z is not None:
                    raw_z[i] = ta_z[i] * raw_z[i]
            return raw_xy, raw_z

        ttr, ttrz = ttraces(tangent["v"], qa_rows, tra, trza)
        ttrp, _ = ttraces(tangent["vprev"], qpa_rows, trpa, None)
        ttrn, _ = ttraces(tangent["vnext"], qna_rows, trna, None)

    # pyl places an (nkxp,)-row array at the y-family's LEADING rows of the
    # xy-register layout; pyt at the REAL tail [Rb - n, Rb) (north masks
    # cover exactly those rows), with any whole-tile pad rows after. The
    # *_tr variants take a trace array (which carries an x half in split
    # mode) and keep only its y-family rows.
    if split:
        pyl = lambda a: jnp.pad(a, ((Rp, Rp - a.shape[0]), (0, 0)))
        pyt = lambda a: jnp.pad(a, ((Rp + Rb - a.shape[0], Rp - Rb), (0, 0)))
        pyl_tr = lambda a: pyl(a[a.shape[0] // 2 :])
        pyt_tr = lambda a: pyt(a[a.shape[0] // 2 :])
    else:
        pyl = lambda a: jnp.pad(a, ((0, Rp - a.shape[0]), (0, 0)))
        pyt = lambda a: jnp.pad(a, ((Rb - a.shape[0], Rp - Rb), (0, 0)))
        pyl_tr, pyt_tr = pyl, pyt
    # (ty*nk, 128) -> (Rt, 128) (x-family rows; y rows never selected)
    rep = lambda a: jnp.pad(jnp.repeat(a, nxp, axis=0), ((0, Rt - Rb), (0, 0)))

    # --- L/R interface states ---------------------------------------------
    b80 = np.int32((128 - (T - FSS)) % 128)  # prev-row last-group east -> g0 west
    bss = np.int32(FSS)
    mss = np.int32((128 - FSS) % 128)
    bssz = np.int32(SS)
    mssz = np.int32((128 - SS) % 128)
    east_b = xe & g1 & east_col
    north_b = yn & last_ky

    def assemble(tr_, trz_, trp_, trn_, hwe_, hs_, hn_):
        L_xy, R_xy, L_z, R_z = [], [], [], []
        for v in range(5):
            t = tr_[v]
            lx = jnp.where(lrel < FSS, roll(roll(t, 1, 0), b80, 1), roll(t, bss, 1))
            ly = roll(roll(t, nkxp, 0), mss, 1)
            ly = jnp.where(first_ky, pyl_tr(roll(trp_[v], mss, 1)), ly)
            l = jnp.where(is_x, lx, ly)
            hwe_v = rep(hwe_[v])
            # Only the g0 element's west slot (lanes 0..ss-1) sits on the
            # panel boundary; other groups' west interfaces are row-interior.
            l = jnp.where(is_x & (lrel < FSS) & west_col, hwe_v, l)
            l = jnp.where(ys & south_edge, pyl(hs_[v]), l)
            # h2 slots: east/north boundary interfaces — L is the element's
            # own east/north face (already in place).
            l = jnp.where(east_b | north_b, t, l)
            r = t
            r = jnp.where(east_b, hwe_v, r)
            rn = pyt_tr(roll(trn_[v], bss, 1))
            r = jnp.where(north_b, jnp.where(north_edge, pyt(hn_[v]), rn), r)
            L_xy.append(l)
            R_xy.append(r)

            tz = trz_[v]
            lz = roll(roll(tz, zstr, 0), mssz, 1)
            # Ground mirror (kz=0 down slots) and rigid-lid h2 (kz=nk-1 up
            # slots): L is the element's own face; the flipped normal speed
            # is applied below (reference pde_euler_cubesphere.py:150-156).
            lz = jnp.where((zd & kz0) | (zu & kztop), tz, lz)
            L_z.append(lz)
            R_z.append(tz)
        return L_xy, R_xy, L_z, R_z

    L_xy, R_xy, L_z, R_z = assemble(tr, trz, trp, trn, hwe, hs, hn)
    if base is not None:
        L0_xy, R0_xy, L0_z, R0_z = assemble(
            tr0, trz0, trp0, trn0, base["hwe0"], base["hs0"], base["hn0"]
        )
    if tangent is not None:
        tL_xy, tR_xy, tL_z, tR_z = assemble(
            ttr, ttrz, ttrp, ttrn, tangent["vwe"], tangent["vs"], tangent["vn"]
        )

    # --- Rusanov at every slot (both xy families in one pass; z its own) ---
    def rusanov(L, R, msg, mhd, mh0, mh1, mh2, vnL, vnR):
        pL = _pressure(L[4])
        pR = _pressure(R[4])
        eig = jnp.maximum(
            jnp.abs(vnL) + jnp.sqrt(mhd * f(GAMMA) * pL / L[0]),
            jnp.abs(vnR) + jnp.sqrt(mhd * f(GAMMA) * pR / R[0]),
        )
        flux, wadv = [], None
        for v in range(5):
            fl = f(0.5) * msg * (vnL * L[v] + vnR * R[v] - eig * (R[v] - L[v]))
            if v == IDX_RHO_W:
                wadv = fl
            flux.append(fl)
        psum = f(0.5) * msg * (pL + pR)
        flux[1] = flux[1] + mh0 * psum
        flux[2] = flux[2] + mh1 * psum
        flux[3] = flux[3] + mh2 * psum
        wpres = mh2 * psum
        return flux, wadv, wpres, pL, pR

    def rusanov_delta(L0, R0, dL, dR, msg, mhd, mh0, mh1, mh2, vnL0, vnL, vnR0, vnR):
        """Term-level delta of ``rusanov``: pressures via expm1/log1p around
        the base faces, fluxes via the product rule with base normal speeds
        and absolute states, dissipation on delta jumps + deig on the
        (smooth, small) base jumps — the jnp pert core's expansion
        (models/euler_cubesphere.py:504-532) slot-wise."""
        pL0, pR0 = _pressure(L0[4]), _pressure(R0[4])
        dpL = pL0 * _expm1(f(GAMMA) * _log1p(dL[4] / L0[4]))
        dpR = pR0 * _expm1(f(GAMMA) * _log1p(dR[4] / R0[4]))
        eig = jnp.maximum(
            jnp.abs(vnL) + jnp.sqrt(mhd * f(GAMMA) * (pL0 + dpL) / (L0[0] + dL[0])),
            jnp.abs(vnR) + jnp.sqrt(mhd * f(GAMMA) * (pR0 + dpR) / (R0[0] + dR[0])),
        )
        eig0 = jnp.maximum(
            jnp.abs(vnL0) + jnp.sqrt(mhd * f(GAMMA) * pL0 / L0[0]),
            jnp.abs(vnR0) + jnp.sqrt(mhd * f(GAMMA) * pR0 / R0[0]),
        )
        deig = eig - eig0
        dvnL, dvnR = vnL - vnL0, vnR - vnR0
        dflux, dwadv = [], None
        for v in range(5):
            dl = f(0.5) * msg * (
                vnL0 * dL[v] + dvnL * (L0[v] + dL[v])
                + vnR0 * dR[v] + dvnR * (R0[v] + dR[v])
                - eig * (dR[v] - dL[v]) - deig * (R0[v] - L0[v])
            )
            if v == IDX_RHO_W:
                dwadv = dl
            dflux.append(dl)
        dpsum = f(0.5) * msg * (dpL + dpR)
        psum0 = f(0.5) * msg * (pL0 + pR0)
        dflux[1] = dflux[1] + mh0 * dpsum
        dflux[2] = dflux[2] + mh1 * dpsum
        dflux[3] = dflux[3] + mh2 * dpsum
        return dflux, dwadv, mh2 * dpsum, mh2 * psum0, pL0, pR0, dpL, dpR

    if split:
        # Stack the per-family interface metric to match the stacked
        # xy-trace rows (x rows first).
        msg, mhd, mh0, mh1, mh2 = (
            jnp.concatenate([xa, ya], axis=0)
            for xa, ya in zip(con["itf_xy"], con["itf_y"])
        )
    else:
        msg, mhd, mh0, mh1, mh2 = con["itf_xy"]
    msgz, mhdz, mh0z, mh1z, mh2z = con["itf_z"]
    vsel_xy = lambda L: jnp.where(is_x, L[1], L[2]) / L[0]

    def vsel_zL(L):
        v = L[3] / L[0]
        return jnp.where(zd & kz0, -v, v)

    def vsel_zR(R):
        v = R[3] / R[0]
        return jnp.where(zu & kztop, -v, v)

    if base is None:
        Fxy, wadv_xy, wpres_xy, pL_xy, pR_xy = rusanov(
            L_xy, R_xy, msg, mhd, mh0, mh1, mh2, vsel_xy(L_xy), vsel_xy(R_xy)
        )
        Fz, wadv_z, wpres_z, pL_z, pR_z = rusanov(
            L_z, R_z, msgz, mhdz, mh0z, mh1z, mh2z, vsel_zL(L_z), vsel_zR(R_z)
        )
    else:
        LA_xy = [a + b for a, b in zip(L0_xy, L_xy)]
        RA_xy = [a + b for a, b in zip(R0_xy, R_xy)]
        LA_z = [a + b for a, b in zip(L0_z, L_z)]
        RA_z = [a + b for a, b in zip(R0_z, R_z)]
        Fxy, wadv_xy, wpres_xy, wpres0_xy, pL0_xy, pR0_xy, dpL_xy, dpR_xy = rusanov_delta(
            L0_xy, R0_xy, L_xy, R_xy, msg, mhd, mh0, mh1, mh2,
            vsel_xy(L0_xy), vsel_xy(LA_xy), vsel_xy(R0_xy), vsel_xy(RA_xy),
        )
        Fz, wadv_z, wpres_z, wpres0_z, pL0_z, pR0_z, dpL_z, dpR_z = rusanov_delta(
            L0_z, R0_z, L_z, R_z, msgz, mhdz, mh0z, mh1z, mh2z,
            vsel_zL(L0_z), vsel_zL(LA_z), vsel_zR(R0_z), vsel_zR(RA_z),
        )

    if tangent is not None:
        # Exact directional derivative of ``rusanov`` at the absolute
        # interface states, linear in (tL, tR).
        def rusanov_tangent(LA, RA, tL, tR, pLa, pRa, vnLa, vnRa, tvnL, tvnR,
                            msg_, mhd_, mh0_, mh1_, mh2_):
            tpL = f(GAMMA) * pLa * tL[4] / LA[4]
            tpR = f(GAMMA) * pRa * tR[4] / RA[4]
            cL = jnp.sqrt(mhd_ * f(GAMMA) * pLa / LA[0])
            cR = jnp.sqrt(mhd_ * f(GAMMA) * pRa / RA[0])
            aL = jnp.abs(vnLa) + cL
            aR = jnp.abs(vnRa) + cR
            eig = jnp.maximum(aL, aR)
            taL = jnp.sign(vnLa) * tvnL + f(0.5) * cL * (tpL / pLa - tL[0] / LA[0])
            taR = jnp.sign(vnRa) * tvnR + f(0.5) * cR * (tpR / pRa - tR[0] / RA[0])
            # Balanced-tie convention of lax.max's JVP (ties are EXACT on a
            # symmetric base state, so this matters for jvp parity).
            teig = jnp.where(
                aL > aR, taL, jnp.where(aL < aR, taR, f(0.5) * (taL + taR))
            )
            tflux, twadv = [], None
            for v in range(5):
                tl = f(0.5) * msg_ * (
                    vnLa * tL[v] + tvnL * LA[v] + vnRa * tR[v] + tvnR * RA[v]
                    - eig * (tR[v] - tL[v]) - teig * (RA[v] - LA[v])
                )
                if v == IDX_RHO_W:
                    twadv = tl
                tflux.append(tl)
            tpsum = f(0.5) * msg_ * (tpL + tpR)
            tflux[1] = tflux[1] + mh0_ * tpsum
            tflux[2] = tflux[2] + mh1_ * tpsum
            tflux[3] = tflux[3] + mh2_ * tpsum
            return tflux, twadv, mh2_ * tpsum, tpL, tpR

        vnLa_xy, vnRa_xy = vsel_xy(LA_xy), vsel_xy(RA_xy)
        tvnL_xy = (jnp.where(is_x, tL_xy[1], tL_xy[2]) - vnLa_xy * tL_xy[0]) / LA_xy[0]
        tvnR_xy = (jnp.where(is_x, tR_xy[1], tR_xy[2]) - vnRa_xy * tR_xy[0]) / RA_xy[0]
        tFxy, twadv_xy, twpres_xy, tpL_xy, tpR_xy = rusanov_tangent(
            LA_xy, RA_xy, tL_xy, tR_xy, pL0_xy + dpL_xy, pR0_xy + dpR_xy,
            vnLa_xy, vnRa_xy, tvnL_xy, tvnR_xy, msg, mhd, mh0, mh1, mh2,
        )
        # vn_z = sigma * w with sigma = -1 at the ground/lid mirror slots,
        # so d(vn_z) = (sigma*t3 - vn*t0)/rho (sigma folded into vn).
        vnLa_z, vnRa_z = vsel_zL(LA_z), vsel_zR(RA_z)
        sgnL_z = jnp.where(zd & kz0, f(-1.0), f(1.0))
        sgnR_z = jnp.where(zu & kztop, f(-1.0), f(1.0))
        tvnL_z = (sgnL_z * tL_z[3] - vnLa_z * tL_z[0]) / LA_z[0]
        tvnR_z = (sgnR_z * tR_z[3] - vnRa_z * tR_z[0]) / RA_z[0]
        tFz, twadv_z, twpres_z, tpL_z, tpR_z = rusanov_tangent(
            LA_z, RA_z, tL_z, tR_z, pL0_z + dpL_z, pR0_z + dpR_z,
            vnLa_z, vnRa_z, tvnL_z, tvnR_z, msgz, mhdz, mh0z, mh1z, mh2z,
        )

    # --- fill east/north/up face slots from the neighbours' west/south/down
    # interface values (SW faces() pattern, reference rhs_dfr.py:106-139).
    keep_xe = east_col & g1
    keep_yn = last_ky
    keep_zu = kztop

    b48 = np.int32(T - FSS)

    def fill_xy(a):
        f_g0 = roll(a, mss, 1)
        f_g1 = roll(roll(a, Rt - 1, 0), b48, 1)
        fe = jnp.where(g1, f_g1, f_g0)
        fn = roll(roll(a, Rt - nkxp, 0), bss, 1)
        out = jnp.where(xe & ~keep_xe, fe, a)
        return jnp.where(yn & ~keep_yn, fn, out)

    def fill_z(a):
        fu = roll(roll(a, Rp - zstr, 0), bssz, 1)
        return jnp.where(zu & ~keep_zu, fu, a)

    Fxy = [fill_xy(a) if v != 3 else a for v, a in enumerate(Fxy)]
    Fz = [fill_z(a) if v != 3 else a for v, a in enumerate(Fz)]
    wadv_xy, wadv_z = fill_xy(wadv_xy), fill_z(wadv_z)
    wpres_xy, wpres_z = fill_xy(wpres_xy), fill_z(wpres_z)
    if base is None:
        # Face pressures: west/south/down faces are the R side of their own
        # interface; east/north/up faces are the L side of the neighbour's.
        pf_xy = jnp.where(xw | ys, pR_xy, fill_xy(pL_xy))
        pf_z = jnp.where(zd, pR_z, fill_z(pL_z))
        lf_xy = jnp.log(pf_xy)
        lf_z = jnp.log(pf_z)
        wpf_xy = wpres_xy / pf_xy
        wpf_z = wpres_z / pf_z
    else:
        wpres0_xy, wpres0_z = fill_xy(wpres0_xy), fill_z(wpres0_z)
        pf0_xy = jnp.where(xw | ys, pR0_xy, fill_xy(pL0_xy))
        pf0_z = jnp.where(zd, pR0_z, fill_z(pL0_z))
        dpf_xy = jnp.where(xw | ys, dpR_xy, fill_xy(dpL_xy))
        dpf_z = jnp.where(zd, dpR_z, fill_z(dpL_z))
        # Delta of the face log pressure; base face logs feed the base dlp.
        lf_xy = _log1p(dpf_xy / pf0_xy)
        lf_z = _log1p(dpf_z / pf0_z)
        lf0_xy = jnp.log(pf0_xy)
        lf0_z = jnp.log(pf0_z)
        # d[wpres/p] = dwpres/p - (wpres0/p0)(dp/p); base wpf0 = wpres0/p0
        # feeds the base wcorr0 correction (jnp core line 550-558).
        wpf0_xy = wpres0_xy / pf0_xy
        wpf0_z = wpres0_z / pf0_z
        pfa_xy = pf0_xy + dpf_xy
        pfa_z = pf0_z + dpf_z
        wpf_xy = wpres_xy / pfa_xy - wpf0_xy * (dpf_xy / pfa_xy)
        wpf_z = wpres_z / pfa_z - wpf0_z * (dpf_z / pfa_z)

    if tangent is not None:
        # Tangent face fills + face-pressure chains at the absolute faces:
        # t[log pf] = tpf/pf, t[wpres/pf] = twpres/pf - (wpres/pf)(tpf/pf).
        tFxy = [fill_xy(a) if v != 3 else a for v, a in enumerate(tFxy)]
        tFz = [fill_z(a) if v != 3 else a for v, a in enumerate(tFz)]
        twadv_xy, twadv_z = fill_xy(twadv_xy), fill_z(twadv_z)
        twpres_xy, twpres_z = fill_xy(twpres_xy), fill_z(twpres_z)
        tpf_xy = jnp.where(xw | ys, tpR_xy, fill_xy(tpL_xy))
        tpf_z = jnp.where(zd, tpR_z, fill_z(tpL_z))
        t_lf_xy = tpf_xy / pfa_xy
        t_lf_z = tpf_z / pfa_z
        wpfa_ratio_xy = (wpres0_xy + wpres_xy) / pfa_xy  # absolute wpres/pf
        wpfa_ratio_z = (wpres0_z + wpres_z) / pfa_z
        twpf_xy = twpres_xy / pfa_xy - wpfa_ratio_xy * t_lf_xy
        twpf_z = twpres_z / pfa_z - wpfa_ratio_z * t_lf_z

    # --- pointwise fluxes + interior divergence ---------------------------
    sg = con["sqrtg"]
    inv_sg = con["inv_sqrtg"]
    h11, h12, h13, h22, h23, h33 = con["h"]
    hrows = ((h11, h12, h13), (h12, h22, h23), (h13, h23, h33))
    cat = lambda xs: jnp.concatenate(xs, axis=-1)
    if base is None:
        rho = q[IDX_RHO]
        u1 = q[1] / rho
        u2 = q[2] / rho
        w = q[3] / rho
        pressure = _pressure(q[IDX_RHO_THETA])
        logp = jnp.log(pressure)
        sgp = sg * pressure

        # The rho*w momentum row needs only its ADVECTIVE divergence (the
        # pressure part goes through the p*dlogp split), so the full w flux
        # row is never contracted: bundle rows are [rho, hu1, hu2,
        # rho*theta, w-advective] (reference rhs_dfr.py:106-139).
        bundles = []
        for v in (0, 1, 2, 4):
            per_d = []
            for d, un in enumerate((u1, u2, w)):
                fl = sg * un * q[v]
                if 1 <= v <= 2:
                    fl = fl + sgp * hrows[d][v - 1]
                per_d.append(fl)
            bundles.append(per_d)
        bundles.append([sg * un * q[3] for un in (u1, u2, w)])  # w advective
        dlp_point = logp
    else:
        # Delta pointwise: du = (d(rho u) - u0 dRho)/rho (exact algebra),
        # dp via expm1 around the base pressure; the bundle rows carry only
        # the DELTA fluxes (the base interior divergence lives in rhs0).
        q0 = base["q0"]
        rho0 = q0[IDX_RHO]
        qa = [q0[v] + q[v] for v in range(5)]
        rho = qa[IDX_RHO]
        u0 = (q0[1] / rho0, q0[2] / rho0, q0[3] / rho0)
        du = tuple((q[i + 1] - u0[i] * q[IDX_RHO]) / rho for i in range(3))
        p0 = _pressure(q0[IDX_RHO_THETA])
        dp = p0 * _expm1(f(GAMMA) * _log1p(q[IDX_RHO_THETA] / q0[IDX_RHO_THETA]))
        pressure = p0 + dp
        sgdp = sg * dp

        bundles = []
        for v in (0, 1, 2, 4):
            per_d = []
            for d in range(3):
                fl = sg * (u0[d] * q[v] + du[d] * qa[v])
                if 1 <= v <= 2:
                    fl = fl + sgdp * hrows[d][v - 1]
                per_d.append(fl)
            bundles.append(per_d)
        bundles.append([sg * (u0[d] * q[3] + du[d] * qa[3]) for d in range(3)])
        dlp_point = _log1p(dp / p0)  # delta of log p

    if tangent is not None:
        # Pointwise tangent: tu = (tv_mom - u_abs tv_rho)/rho_abs,
        # tp = gamma p_abs tv_rt/q_rt; bundle rows are the directional
        # derivatives of the absolute pointwise fluxes.
        tv = tangent["v"]
        ua = tuple(u0[d] + du[d] for d in range(3))
        tu = tuple((tv[i + 1] - ua[i] * tv[0]) / rho for i in range(3))
        tp = f(GAMMA) * pressure * tv[4] / qa[4]
        sgtp = sg * tp
        tbundles = []
        for v in (0, 1, 2, 4):
            per_d = []
            for d in range(3):
                fl = sg * (ua[d] * tv[v] + tu[d] * qa[v])
                if 1 <= v <= 2:
                    fl = fl + sgtp * hrows[d][v - 1]
                per_d.append(fl)
            tbundles.append(per_d)
        tbundles.append([sg * (ua[d] * tv[3] + tu[d] * qa[3]) for d in range(3)])
        tdlp_point = tp / pressure
    if HH == 1:
        div = mm(jnp.concatenate([cat(b3) for b3 in bundles], axis=0), con["dd"])
        dvr = [div[i * Rp : (i + 1) * Rp] for i in range(5)]
    else:
        div_xy = mm(jnp.concatenate([cat(b3[:2]) for b3 in bundles], axis=0), con["dd"])
        dvr = [
            div_xy[i * Rp : (i + 1) * Rp] + zpair(bundles[i][2], dz00, dz01, dz10, dz11)
            for i in range(5)
        ]
    dv = [dvr[0], dvr[1], dvr[2], None, dvr[3], dvr[4]]

    def dlp_op(a):
        # logp -> (Rp, 384) per-direction interior gradients
        if HH == 1:
            return mm(a, con["dlp"])
        return jnp.concatenate(
            [mm(a, con["dlp"]), zpair(a, dz00, dz01, dz10, dz11)], axis=1
        )

    dlogp = dlp_op(dlp_point)  # (Rb, 384)

    # --- boundary corrections (w momentum row skipped, as in the bundle) ---
    # Split mode: the stacked xy arrays unstack into [x | y | z] lanes.
    catc = (
        (lambda a, z_: cat([a[:Rp], a[Rp:], z_])) if split else (lambda a, z_: cat([a, z_]))
    )
    cpairs = [(Fxy[v], Fz[v]) for v in (0, 1, 2, 4)]
    cpairs.append((wadv_xy, wadv_z))
    cpairs.append((wpf_xy, wpf_z))
    if base is not None:
        cpairs.append((wpf0_xy, wpf0_z))  # base wpres/p -> wcorr0
    nrows_c = len(cpairs)
    if HH == 1:
        co = mm(jnp.concatenate([catc(a, z_) for a, z_ in cpairs], axis=0), con["corr"])
        cvr = [co[i * Rp : (i + 1) * Rp] for i in range(nrows_c)]
    else:
        co = mm(jnp.concatenate([a for a, _ in cpairs], axis=0), con["corr"])
        cvr = [
            co[i * Rp : (i + 1) * Rp] + zface_out(z_, cz0, cz1)
            for i, (_, z_) in enumerate(cpairs)
        ]
    cv = [cvr[0], cvr[1], cvr[2], None, cvr[3], cvr[4], cvr[5]]

    if tangent is not None:
        # Tangent divergence + corrections run as their OWN GEMMs (not
        # appended to the primal ones) so the dead primal delta-flux branch
        # can be eliminated; the two primal wpres/p rows ride along here
        # because wcorr_abs = corr(wpf0) + corr(dwpf) is a tangent-side
        # coefficient.
        if HH == 1:
            tdiv = mm(jnp.concatenate([cat(b3) for b3 in tbundles], axis=0), con["dd"])
            tdvr = [tdiv[i * Rp : (i + 1) * Rp] for i in range(5)]
        else:
            tdiv_xy = mm(jnp.concatenate([cat(b3[:2]) for b3 in tbundles], axis=0), con["dd"])
            tdvr = [
                tdiv_xy[i * Rp : (i + 1) * Rp]
                + zpair(tbundles[i][2], dz00, dz01, dz10, dz11)
                for i in range(5)
            ]
        tdv = [tdvr[0], tdvr[1], tdvr[2], None, tdvr[3], tdvr[4]]
        tpairs = [(tFxy[v], tFz[v]) for v in (0, 1, 2, 4)]
        tpairs.append((twadv_xy, twadv_z))
        tpairs.append((twpf_xy, twpf_z))
        tpairs.append((wpf_xy, wpf_z))  # primal delta wpres/p
        tpairs.append((wpf0_xy, wpf0_z))  # base wpres/p
        if HH == 1:
            tco = mm(jnp.concatenate([catc(a, z_) for a, z_ in tpairs], axis=0), con["corr"])
            tcvr = [tco[i * Rp : (i + 1) * Rp] for i in range(8)]
        else:
            tco = mm(jnp.concatenate([a for a, _ in tpairs], axis=0), con["corr"])
            tcvr = [
                tco[i * Rp : (i + 1) * Rp] + zface_out(z_, cz0, cz1)
                for i, (_, z_) in enumerate(tpairs)
            ]
        tcv = [tcvr[0], tcvr[1], tcvr[2], None, tcvr[3], tcvr[4], tcvr[5]]
        wcorr_abs = tcvr[6] + tcvr[7]

    if split:
        lfc_sum = lambda a, z_: (
            mm(a[:Rp], con["lfc_xy"]) + mm(a[Rp:], con["lfc_y"]) + mm(z_, con["lfc_z"])
        )
    elif HH > 1:
        lfc_sum = lambda a, z_: jnp.concatenate(
            [mm(a, con["lfc_xy"]), zface_out(z_, cz0, cz1)], axis=1
        )
    else:
        lfc_sum = lambda a, z_: mm(a, con["lfc_xy"]) + mm(z_, con["lfc_z"])
    dlp = dlogp + lfc_sum(lf_xy, lf_z)
    dlp_x, dlp_y, dlp_z = dlp[:, :LANES], dlp[:, LANES : 2 * LANES], dlp[:, 2 * LANES :]

    if base is None:
        w_df = (
            dv[5]
            + cv[5]
            + (con["wpres_int"] + cv[6]) * pressure
            + pressure * (sg * h13 * dlp_x + sg * h23 * dlp_y + sg * h33 * dlp_z)
        )
    else:
        # Base dlp (pointwise + face log corrections of the base pressure)
        # rebuilt in-kernel; dlp above is the DELTA (ddlp). The w pressure
        # split expands as d[(W + c) p] = (W + c0) dp + dc p and
        # d[p sgh dlp] = p0 ddlp + dp dlp_abs (jnp core lines 538-587).
        wcorr0 = cvr[6]
        dlp0 = dlp_op(jnp.log(p0)) + lfc_sum(lf0_xy, lf0_z)
        dlpa = dlp0 + dlp
        sp3 = lambda a: (a[:, :LANES], a[:, LANES : 2 * LANES], a[:, 2 * LANES :])
        dlpa_x, dlpa_y, dlpa_z = sp3(dlpa)
        w_df = (
            dv[5]
            + cv[5]
            + (con["wpres_int"] + wcorr0) * dp
            + cv[6] * pressure
            + sg * h13 * (p0 * dlp_x + dp * dlpa_x)
            + sg * h23 * (p0 * dlp_y + dp * dlpa_y)
            + sg * h33 * (p0 * dlp_z + dp * dlpa_z)
        )

    if tangent is not None:
        # Tangent of the w pressure split at the absolute state:
        # t[(W + c) p] = (W + c_abs) tp + tc p_abs and
        # t[p sgh dlp] = p_abs t_dlp + tp dlp_abs.
        t_dlp = dlp_op(tdlp_point) + lfc_sum(t_lf_xy, t_lf_z)
        tdlp_x, tdlp_y, tdlp_z = sp3(t_dlp)
        tw_df = (
            tdv[5]
            + tcv[5]
            + (con["wpres_int"] + wcorr_abs) * tp
            + tcv[6] * pressure
            + sg * h13 * (pressure * tdlp_x + tp * dlpa_x)
            + sg * h23 * (pressure * tdlp_y + tp * dlpa_y)
            + sg * h33 * (pressure * tdlp_z + tp * dlpa_z)
        )

    # --- forcing -----------------------------------------------------------
    chs = con["chs"]

    if base is None:

        def forcing_row(a):
            c11, c12, c13, c22, c23, c33 = chs[a * 6 : (a + 1) * 6]
            out = (
                c11 * (rho * u1 * u1 + h11 * pressure)
                + f(2.0) * c12 * (rho * u1 * u2 + h12 * pressure)
                + f(2.0) * c13 * (rho * u1 * w + h13 * pressure)
                + c22 * (rho * u2 * u2 + h22 * pressure)
                + f(2.0) * c23 * (rho * u2 * w + h23 * pressure)
                + c33 * (rho * w * w + h33 * pressure)
            )
            if con.get("tch") is not None:
                t0, t1, t2 = con["tch"][a * 3 : (a + 1) * 3]
                out = out + f(2.0) * rho * (t0 * u1 + t1 * u2 + t2 * w)
            return out

        grho = rho
    else:

        def dprod(i, j):
            # d[q_i q_j / rho] via the product rule with absolute second
            # factors (jnp core dforcing_row).
            return (q[i] * q0[j] + qa[i] * q[j]) / rho - (q0[i] * q0[j] / rho0) * (
                q[IDX_RHO] / rho
            )

        def forcing_row(a):
            c11, c12, c13, c22, c23, c33 = chs[a * 6 : (a + 1) * 6]
            out = (
                c11 * (dprod(1, 1) + h11 * dp)
                + f(2.0) * c12 * (dprod(1, 2) + h12 * dp)
                + f(2.0) * c13 * (dprod(1, 3) + h13 * dp)
                + c22 * (dprod(2, 2) + h22 * dp)
                + f(2.0) * c23 * (dprod(2, 3) + h23 * dp)
                + c33 * (dprod(3, 3) + h33 * dp)
            )
            if con.get("tch") is not None:
                t0, t1, t2 = con["tch"][a * 3 : (a + 1) * 3]
                # rho * (t . u) = t . (rho u) is LINEAR in the state.
                out = out + f(2.0) * (t0 * q[1] + t1 * q[2] + t2 * q[3])
            return out

        grho = q[IDX_RHO]  # gravity is linear in rho

    hf_op = (
        (lambda a: mm(a, con["hfk"])) if HH == 1
        else (lambda a: zpair(a, hf00, hf01, hf10, hf11))
    )
    gravity = con["inv_dzdeta"] * f(GRAVITY) * inv_sg * hf_op(sg * grho)
    f1 = forcing_row(0)
    f2 = forcing_row(1)
    f3 = forcing_row(2) + gravity

    out = [
        -inv_sg * (dv[0] + cv[0]),
        -inv_sg * (dv[1] + cv[1]) - f1,
        -inv_sg * (dv[2] + cv[2]) - f2,
        -inv_sg * w_df - f3,
        -inv_sg * (dv[4] + cv[4]),
    ]

    if tangent is not None:
        # Tangent forcing (product rule at the absolute state) + linear
        # gravity; the output is J.v alone — the primal delta `out` above
        # and its flux branch are dead code the compiler eliminates.
        def tprod(i, j):
            return (tv[i] * qa[j] + qa[i] * tv[j]) / rho - (qa[i] * qa[j] / rho) * (
                tv[0] / rho
            )

        def tforcing_row(a):
            c11, c12, c13, c22, c23, c33 = chs[a * 6 : (a + 1) * 6]
            o_ = (
                c11 * (tprod(1, 1) + h11 * tp)
                + f(2.0) * c12 * (tprod(1, 2) + h12 * tp)
                + f(2.0) * c13 * (tprod(1, 3) + h13 * tp)
                + c22 * (tprod(2, 2) + h22 * tp)
                + f(2.0) * c23 * (tprod(2, 3) + h23 * tp)
                + c33 * (tprod(3, 3) + h33 * tp)
            )
            if con.get("tch") is not None:
                t0, t1, t2 = con["tch"][a * 3 : (a + 1) * 3]
                o_ = o_ + f(2.0) * (t0 * tv[1] + t1 * tv[2] + t2 * tv[3])
            return o_

        tgrav = con["inv_dzdeta"] * f(GRAVITY) * inv_sg * hf_op(sg * tv[0])
        out = [
            -inv_sg * (tdv[0] + tcv[0]),
            -inv_sg * (tdv[1] + tcv[1]) - tforcing_row(0),
            -inv_sg * (tdv[2] + tcv[2]) - tforcing_row(1),
            -inv_sg * tw_df - (tforcing_row(2) + tgrav),
            -inv_sg * (tdv[4] + tcv[4]),
        ]

    if base is not None and tangent is None:
        out = [o + base["rhs0"][v] for v, o in enumerate(out)]
    if bal is not None:
        # Well-balanced offset: bal = RHS_f64(q_base) - K_f32(q_base), so
        # the f32 cancellation error of the huge balanced terms (pressure
        # gradient vs gravity) is removed exactly at the base state and to
        # first order near it.
        out = [o + bal[v] for v, o in enumerate(out)]
    if stage_a is not None:
        for v in range(5):
            val = f(stage_b) * q[v] + cdt * out[v]
            if x is not None:
                val = f(stage_a) * x[v] + val
            out[v] = val
    if Rp > Rb:
        # Whole-tile mode: pin pad rows to their NaN-safe fill so chained
        # stages never see log-of-garbage there (state outputs keep the
        # rho/rho*theta = 1 fill; RHS and delta outputs keep zeros).
        fills = (
            (1.0, 0.0, 0.0, 0.0, 1.0)
            if (stage_a is not None and base is None)
            else (0.0,) * 5
        )
        pad_row_m = row >= Rb
        out = [jnp.where(pad_row_m, f(fv), o) for fv, o in zip(fills, out)]
    if lwe is None:
        return out

    # --- west/east edge traces of the OUTPUT state (chained mode) ----------
    # The west/east panel-edge extraction is the expensive part of the XLA
    # ``edge_halo`` (strided row+lane gathers over the big state); emitting
    # it here costs one tiny compaction GEMM on VMEM-resident data. The
    # south/north grid rows stay an XLA job — they are contiguous row
    # slices, and emitting them per block would write whole-block-sized
    # slabs of which only the boundary y-tiles' are consumed. ``lwe`` is
    # the one-hot (2*ty*nk, Rb) compaction picking the west column (x2=0)
    # rows then the east column (x2=nxp-1) rows.
    tynk = ty * nk * HH
    nwe = 2 * tynk
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (tynk, LANES), 1)
    if base is None:
        # Compact FIRST, then log: lwe is a one-hot row SELECTION, so the
        # two orders are bit-identical — but logging the full block would
        # put log(garbage) on whole-tile pad rows (km3_tile), and NaN * 0
        # in the compaction GEMM poisons everything.
        comp = [mm(lwe, out[v]) for v in range(5)]  # (2*tynk, 128) each
        logged = [jnp.log(comp[0]), comp[1], comp[2], comp[3], jnp.log(comp[4])]
        tr_o = mm(jnp.concatenate(logged, axis=0), con["e_xy"])
        t0we = None
    else:
        # Delta traces of the OUTPUT delta state around the (compacted)
        # base columns: dtr = t0 * expm1(E . log1p(dout/base)).
        comp0 = [mm(lwe, base["q0"][v]) for v in range(5)]
        compd = [mm(lwe, out[v]) for v in range(5)]
        logd = [
            _log1p(compd[0] / comp0[0]), compd[1], compd[2], compd[3],
            _log1p(compd[4] / comp0[4]),
        ]
        log0 = [jnp.log(comp0[0]), comp0[1], comp0[2], comp0[3], jnp.log(comp0[4])]
        tr_o = mm(jnp.concatenate(logd, axis=0), con["e_xy"])
        t0we = mm(jnp.concatenate(log0, axis=0), con["e_xy"])
    we_rows = []
    for v in range(5):
        cv_ = tr_o[v * nwe : (v + 1) * nwe]
        if v in (0, 4):
            if base is None:
                cv_ = jnp.exp(cv_)
            else:
                cv_ = jnp.exp(t0we[v * nwe : (v + 1) * nwe]) * _expm1(cv_)
        wtr, etr = cv_[:tynk], cv_[tynk:]
        we_rows.append(
            jnp.where(lane_w < FSS, wtr, f(0.0))
            + jnp.where((lane_w >= T - FSS) & (lane_w < T), etr, f(0.0))
        )
    return out, we_rows


# ---------------------------------------------------------------------------
# Panel-edge halo glue (XLA). Extracts the four outward edge-face traces of
# the packed state (log-space extrapolation like the interior), runs the
# pooled neighbour exchange + momentum rotation of parallel/topology.py and
# formats the results into the kernel's hwe/hs/hn input arrays. Everything
# here is edge-sized (~nv*6*nk*nh*s^2 values).
#
# At small shapes this stage is bound by XLA per-op overhead, not data:
# the lane placements therefore run as ONE one-hot GEMM per output (the
# former zero-concat chains cost ~50 us of a 67 us stage at canonical
# dcmip31 size; with the GEMMs the chained stage is ~14 us). Remaining
# headroom: fold the exchange itself into the mega kernel (KR-style).


class HaloOps(NamedTuple):
    exw: jnp.ndarray  # (64, 16) west-face extrapolation
    exe: jnp.ndarray
    eys: jnp.ndarray
    eyn: jnp.ndarray
    conv: jnp.ndarray  # (4, 6, nk?, ...) momentum rotation, from topology


def build_halo_ops(ops, topology, s: int = 4, dtype=jnp.float32) -> HaloOps:
    SS = s * s
    f64 = lambda a: np.asarray(a, np.float64)
    ex3, ey3 = f64(ops.extrap_x3), f64(ops.extrap_y3)
    c = lambda a: jnp.asarray(a, dtype=dtype)
    conv = np.asarray(topology._conv_contra_all)  # (4, 6, npts_h, 2, 2)
    return HaloOps(c(ex3[:, :SS]), c(ex3[:, SS:]), c(ey3[:, :SS]), c(ey3[:, SS:]), c(conv))


def _grid_view(qp, nel_h, nel_v, s):
    """Packed (5, R, 128) -> (5, 6, ny, nk, nxp, g*s^3) view of the REAL
    rows/lanes with WHOLE elements per trailing entry (drops pads; merges
    the H half-rows back into element point order, so the edge glue is
    layout-independent)."""
    s, G, S3, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    rows6 = nel_h * nel_v * H * nxp
    v = qp.reshape(5, 6, rows6 + rp, LANES)[:, :, :rows6, : G * S3]
    v = v.reshape(5, 6, nel_h, nel_v, H * nxp, G * S3)
    v = _merge_h(v, H, G * S3, jnp)
    return v


def edge_halo(qp, topology, hops: HaloOps, nel_h: int, nel_v: int, ty: int, s: int = 4):
    """qp: (5, R, 128) packed state -> (hwe, hs, hn) kernel halo inputs.

    hwe: (6*n_ytiles, tynk_pad, 128) west halo at lanes [0, ss), east at
    [T-ss, T), rows (ky_local, kz) per (panel, ytile) chunk; hs/hn:
    (6, nkxp, 128) south/north halo faces in ys/yn slot lanes."""
    s, G, S3, nxp, _rp = _pk(s, nel_h, nel_v)
    S3 = s**3  # _grid_view merges half-rows back into whole elements
    SS = s * s
    nk, ny = nel_v, nel_h

    qv = _grid_view(qp, nel_h, nel_v, s)

    def logged(strip):
        # rows (rho, u1, u2, w, rho*theta) -> log on rows 0 and 4
        return jnp.concatenate(
            [jnp.log(strip[0:1]), strip[1:4], jnp.log(strip[4:5])], axis=0
        )

    def expd(face):
        return jnp.concatenate(
            [jnp.exp(face[0:1]), face[1:4], jnp.exp(face[4:5])], axis=0
        )

    # Outward faces of the four panel edges (reference new-layout face
    # index kz_s*s+ky_s for x, kz_s*s+kx_s for y).
    wst = expd(logged(qv[:, :, :, :, 0, :S3]) @ hops.exw)  # (5,6,ny,nk,ss)
    est = expd(logged(qv[:, :, :, :, -1, (G - 1) * S3 :]) @ hops.exe)
    sst = qv[:, :, 0].reshape(5, 6, nk, nxp, G, S3)
    nst = qv[:, :, -1].reshape(5, 6, nk, nxp, G, S3)
    sth = expd(logged(sst) @ hops.eys).reshape(5, 6, nk, G * nxp, SS)
    nth = expd(logged(nst) @ hops.eyn).reshape(5, 6, nk, G * nxp, SS)

    pool = jnp.stack(
        [sth, nth, jnp.moveaxis(wst, 2, 3), jnp.moveaxis(est, 2, 3)], axis=1
    )  # (5, 4, 6, nk, nh, ss)
    return _exchange_and_format(pool, topology, hops, nel_h, nel_v, ty, s)


def _exchange_and_format(pool, topology, hops: HaloOps, nel_h: int, nel_v: int, ty: int, s: int = 4):
    """Neighbour exchange + momentum rotation + kernel-input formatting on
    an outgoing trace pool (5, 4[S,N,W,E], 6, nk, nh, ss)."""
    s, G, _S3, nxp, _rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    SS = s * s
    FSS = SS // H
    TSS = 2 * FSS
    T = G * TSS
    nk, ny = nel_v, nel_h
    nkxp = nk * H * nxp
    n_ytiles = ny // ty
    tynk = ty * nk * H
    tynk_pad = -(-tynk // 8) * 8
    dtype = pool.dtype

    ex = topology.exchange_pool_3d(pool)

    # 2x2 panel-basis rotation of the horizontal momenta (contravariant).
    cc = np.asarray(hops.conv).reshape(4, 6, ny, s, 2, 2)
    coef = lambda i, j: jnp.asarray(
        cc[..., i, j][:, :, None, :, None, :], dtype=dtype
    )  # (4, 6, 1, nh, 1, s)
    split = ex.shape[1:-1] + (s, s)
    v1 = ex[1].reshape(split)
    v2 = ex[2].reshape(split)
    b1 = (coef(0, 0) * v1 + coef(0, 1) * v2).reshape(ex.shape[1:])
    b2 = (coef(1, 0) * v1 + coef(1, 1) * v2).reshape(ex.shape[1:])
    halo = jnp.stack([ex[0], b1, b2, ex[3], ex[4]])  # (5, 4, 6, nk, nh, ss)

    # Lane-placement via ONE one-hot GEMM per output (this stage is bound
    # by XLA per-op overhead at small shapes, not data — see the module
    # note above; GEMMs replace the former zero-concat chains).
    # hwe rows (p, ky, kz, h): west at lanes [0, fss), east at [T-fss, T)
    # — each half-row gets its half's face points (fss = ss/H).
    kwe = np.zeros((2 * FSS, LANES))
    kwe[np.arange(FSS), np.arange(FSS)] = 1.0
    kwe[FSS + np.arange(FSS), T - FSS + np.arange(FSS)] = 1.0
    wr = jnp.moveaxis(halo[:, 2], 2, 3)  # (5, 6, ny, nk, SS)
    er = jnp.moveaxis(halo[:, 3], 2, 3)
    wr = wr.reshape(5, 6, ny, nk * H, FSS)
    er = er.reshape(5, 6, ny, nk * H, FSS)
    hwe = jnp.concatenate([wr, er], axis=-1) @ jnp.asarray(kwe, dtype=dtype)
    hwe = hwe.reshape(5, 6, n_ytiles, tynk, LANES)
    hwe = jnp.pad(hwe, ((0, 0), (0, 0), (0, 0), (0, tynk_pad - tynk), (0, 0)))
    hwe = jnp.moveaxis(hwe, 0, 2).reshape(6 * n_ytiles, 5, tynk_pad, LANES)

    # hs rows (p, kz, h, x2): group g's face lanes go to the ys slots of
    # the y-family register (offset 64 in the combined layout, 0 when the
    # families are split); hn to the matching yn slots (+fss).
    yoff = 0 if is_split_layout(s, G) else 64
    ks = np.zeros((G * FSS, LANES))
    kn = np.zeros((G * FSS, LANES))
    for g in range(G):
        ks[g * FSS + np.arange(FSS), yoff + g * TSS + np.arange(FSS)] = 1.0
        kn[g * FSS + np.arange(FSS), yoff + g * TSS + FSS + np.arange(FSS)] = 1.0
    if H == 1:
        sr = halo[:, 0].reshape(5, 6, nkxp, G * FSS)
        nr = halo[:, 1].reshape(5, 6, nkxp, G * FSS)
    else:
        # (5, 6, nk, nxp, ss) faces -> rows (kz, h, x2) with the half's
        # fss points per row (g = 1 in half-split layouts).
        spl = lambda a: jnp.moveaxis(
            a.reshape(5, 6, nk, nxp, H, FSS), 4, 3
        ).reshape(5, 6, nkxp, FSS)
        sr = spl(halo[:, 0])
        nr = spl(halo[:, 1])
    hs = sr @ jnp.asarray(ks, dtype=dtype)
    hn = nr @ jnp.asarray(kn, dtype=dtype)
    return hwe, jnp.moveaxis(hs, 0, 1), jnp.moveaxis(hn, 0, 1)


def halo_from_slabs(we, qp, topology, hops: HaloOps, nel_h: int, nel_v: int, ty: int, s: int = 4):
    """Panel-edge halo stage from the kernel-emitted west/east slabs plus
    the packed state (chained mode).

    we: (6*n_ytiles, 5, tynk_pad, 128) chunks in hwe chunk order
    (p*n_ytiles + i), rows (ky_local, kz), west face at lanes [0, ss) /
    east at [T-ss, T) — the strided big-state gathers that make XLA
    extraction expensive. The south/north grid rows are contiguous row
    slices of ``qp``, so their (edge-sized) extrapolation stays in XLA."""
    s, G, S3, nxp, _rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    SS = s * s
    FSS = SS // H
    T = G * 2 * FSS
    nk, ny = nel_v, nel_h
    nkxp = nk * H * nxp
    n_ytiles = ny // ty
    tynk = ty * nk * H
    tynk_pad = we.shape[-2]
    wec = we.reshape(6, n_ytiles, 5, tynk_pad, LANES)[:, :, :, :tynk]
    # Half-rows carry their half's fss face points; merging (h, fss) back
    # into ss restores whole faces (kz_s is the outer face index).
    wst = wec[..., 0:FSS].reshape(6, n_ytiles, 5, ty, nk, SS)
    est = wec[..., T - FSS : T].reshape(6, n_ytiles, 5, ty, nk, SS)
    # (6, i, 5, ty, nk, ss) -> (5, 6, nk, ny, ss) with ky = i*ty + ky_local
    fmt = lambda a: jnp.transpose(a, (2, 0, 4, 1, 3, 5)).reshape(5, 6, nk, ny, SS)
    w_pool = fmt(wst)
    e_pool = fmt(est)

    S3 = s**3  # whole-element lanes in the merged grid view
    qv = _grid_view(qp, nel_h, nel_v, s).reshape(5, 6, ny, nk * nxp, G * S3)
    logged = lambda a: jnp.concatenate([jnp.log(a[0:1]), a[1:4], jnp.log(a[4:5])], axis=0)
    expd = lambda a: jnp.concatenate([jnp.exp(a[0:1]), a[1:4], jnp.exp(a[4:5])], axis=0)
    sst = qv[:, :, 0].reshape(5, 6, nk, nxp, G, S3)
    nst = qv[:, :, -1].reshape(5, 6, nk, nxp, G, S3)
    s_pool = expd(logged(sst) @ hops.eys).reshape(5, 6, nk, G * nxp, SS)
    n_pool = expd(logged(nst) @ hops.eyn).reshape(5, 6, nk, G * nxp, SS)

    pool = jnp.stack([s_pool, n_pool, w_pool, e_pool], axis=1)
    return _exchange_and_format(pool, topology, hops, nel_h, nel_v, ty, s)


# ---------------------------------------------------------------------------
# Perturbation-form support: packed base-state inputs + delta halo glue.


class E3PertBase(NamedTuple):
    """Packed base-state inputs for the perturbation-form kernel, built once
    in float64 (build_pert_base) and cast to the working dtype."""

    q0p: jnp.ndarray  # (5, R, 128) packed base state
    rhs0p: jnp.ndarray  # (5, R, 128) packed f64 base RHS
    hwe0: jnp.ndarray  # base halo kernel inputs (edge_halo layout)
    hs0: jnp.ndarray
    hn0: jnp.ndarray
    wst0: jnp.ndarray  # base outward-face trace pools (pre-exchange), for
    est0: jnp.ndarray  # the delta glue's expm1 expansion
    sth0: jnp.ndarray
    nth0: jnp.ndarray


def _edge_strips(qp, nel_h, nel_v, s):
    """State views feeding the four outward-edge extrapolations."""
    s, G, S3, nxp, _rp = _pk(s, nel_h, nel_v)
    S3 = s**3  # whole-element lanes in the merged grid view
    nk, ny = nel_v, nel_h
    qv = _grid_view(qp, nel_h, nel_v, s)
    west = qv[:, :, :, :, 0, :S3]
    east = qv[:, :, :, :, -1, (G - 1) * S3 :]
    south = qv[:, :, 0].reshape(5, 6, nk, nxp, G, S3)
    north = qv[:, :, -1].reshape(5, 6, nk, nxp, G, S3)
    return west, east, south, north


def build_pert_base(q0_64, rhs0_64, topology, ops, nel_h, nel_v, ty, s, dtype) -> E3PertBase:
    """All base-state kernel/glue inputs from the f64 base state + f64 base
    RHS (grid layout)."""
    hops64 = build_halo_ops(ops, topology, s, dtype=jnp.float64)
    q0p = pack_state_jnp(jnp.asarray(q0_64, jnp.float64), nel_h, nel_v, s)
    rhs0p = pack_rows_jnp(jnp.asarray(rhs0_64, jnp.float64), nel_h, nel_v, s)
    hwe0, hs0, hn0 = edge_halo(q0p, topology, hops64, nel_h, nel_v, ty, s)
    s_, G, _S3, nxp, _rp = _pk(s, nel_h, nel_v)
    SS = s_ * s_
    nk, ny = nel_v, nel_h
    west, east, south, north = _edge_strips(q0p, nel_h, nel_v, s)
    logged = lambda a: jnp.concatenate([jnp.log(a[0:1]), a[1:4], jnp.log(a[4:5])], axis=0)
    expd = lambda a: jnp.concatenate([jnp.exp(a[0:1]), a[1:4], jnp.exp(a[4:5])], axis=0)
    wst0 = expd(logged(west) @ hops64.exw)
    est0 = expd(logged(east) @ hops64.exe)
    sth0 = expd(logged(south) @ hops64.eys).reshape(5, 6, nk, G * nxp, SS)
    nth0 = expd(logged(north) @ hops64.eyn).reshape(5, 6, nk, G * nxp, SS)
    c = lambda a: jnp.asarray(a, dtype)
    return E3PertBase(
        c(q0p), c(rhs0p), c(hwe0), c(hs0), c(hn0), c(wst0), c(est0), c(sth0), c(nth0)
    )


def _delta_pools(dqp, pbase: E3PertBase, hops: HaloOps, nel_h, nel_v, s):
    """Delta outward-face trace pools: linear extrapolation for the momenta,
    t0 * expm1(E . log1p(d/base)) for the log-space rows."""
    s_, G, _S3, nxp, _rp = _pk(s, nel_h, nel_v)
    SS = s_ * s_
    nk = nel_v
    west, east, south, north = _edge_strips(dqp, nel_h, nel_v, s)
    w0, e0, s0_, n0_ = _edge_strips(pbase.q0p, nel_h, nel_v, s)
    logd = lambda d, b: jnp.concatenate(
        [jnp.log1p(d[0:1] / b[0:1]), d[1:4], jnp.log1p(d[4:5] / b[4:5])], axis=0
    )
    comb = lambda raw, t0: jnp.concatenate(
        [t0[0:1] * jnp.expm1(raw[0:1]), raw[1:4], t0[4:5] * jnp.expm1(raw[4:5])], axis=0
    )
    dwst = comb(logd(west, w0) @ hops.exw, pbase.wst0)
    dest = comb(logd(east, e0) @ hops.exe, pbase.est0)
    rs = lambda a: a.reshape(5, 6, nk, G * nxp, SS)
    dsth = comb(rs(logd(south, s0_) @ hops.eys), pbase.sth0)
    dnth = comb(rs(logd(north, n0_) @ hops.eyn), pbase.nth0)
    return dwst, dest, dsth, dnth


def edge_halo_delta(dqp, pbase: E3PertBase, topology, hops: HaloOps,
                    nel_h: int, nel_v: int, ty: int, s: int = 4):
    """Perturbation-mode edge_halo: delta traces in, delta halos out (the
    exchange, flips and momentum rotation are all linear)."""
    dwst, dest, dsth, dnth = _delta_pools(dqp, pbase, hops, nel_h, nel_v, s)
    pool = jnp.stack(
        [dsth, dnth, jnp.moveaxis(dwst, 2, 3), jnp.moveaxis(dest, 2, 3)], axis=1
    )
    return _exchange_and_format(pool, topology, hops, nel_h, nel_v, ty, s)


def tangent_glue_prep(dqp, pbase: E3PertBase, hops: HaloOps, nel_h, nel_v, s):
    """Per-linearization-point precomputation of the tangent halo glue:
    absolute edge strips (base + delta) and absolute outward-face pools.
    Computed ONCE per step and reused by every Krylov matvec — explicitly,
    because when the Arnoldi while loop is nested inside a lax.scan (the
    chunked stepper) XLA's loop-invariant code motion does NOT hoist this
    prep out of the inner loop (measured +60 ms/step at canonical dcmip31
    when recomputed per iteration)."""
    west_d, east_d, south_d, north_d = _edge_strips(dqp, nel_h, nel_v, s)
    w0, e0, s0_, n0_ = _edge_strips(pbase.q0p, nel_h, nel_v, s)
    dwst, dest, dsth, dnth = _delta_pools(dqp, pbase, hops, nel_h, nel_v, s)
    return {
        "wa": w0 + west_d, "ea": e0 + east_d,
        "sa": s0_ + south_d, "na": n0_ + north_d,
        "pw": pbase.wst0 + dwst, "pe": pbase.est0 + dest,
        "ps": pbase.sth0 + dsth, "pn": pbase.nth0 + dnth,
    }


def _tangent_pools(vqp, prep: dict, hops: HaloOps, nel_h, nel_v, s):
    """Tangent outward-face trace pools at q = q0 + dq in direction v:
    linear extrapolation for the momenta; for the log-space rows the exact
    directional derivative t_pool = abs_pool * (E . (v / q_abs)), with the
    absolute strips/pools from ``tangent_glue_prep``."""
    west_v, east_v, south_v, north_v = _edge_strips(vqp, nel_h, nel_v, s)
    s_, G, _S3, nxp, _rp = _pk(s, nel_h, nel_v)
    SS = s_ * s_
    nk = nel_v
    tlog = lambda v_, a_: jnp.concatenate(
        [v_[0:1] / a_[0:1], v_[1:4], v_[4:5] / a_[4:5]], axis=0
    )
    combt = lambda raw, ta: jnp.concatenate(
        [ta[0:1] * raw[0:1], raw[1:4], ta[4:5] * raw[4:5]], axis=0
    )
    rs = lambda a: a.reshape(5, 6, nk, G * nxp, SS)
    twst = combt(tlog(west_v, prep["wa"]) @ hops.exw, prep["pw"])
    test_ = combt(tlog(east_v, prep["ea"]) @ hops.exe, prep["pe"])
    tsth = combt(rs(tlog(south_v, prep["sa"]) @ hops.eys), prep["ps"])
    tnth = combt(rs(tlog(north_v, prep["na"]) @ hops.eyn), prep["pn"])
    return twst, test_, tsth, tnth


def edge_halo_tangent_prepped(vqp, prep: dict, topology, hops: HaloOps,
                              nel_h: int, nel_v: int, ty: int, s: int = 4):
    """Tangent-mode edge_halo from a ``tangent_glue_prep``: direction traces
    in, tangent halos out (exchange/flips/momentum rotation are linear)."""
    twst, test_, tsth, tnth = _tangent_pools(vqp, prep, hops, nel_h, nel_v, s)
    pool = jnp.stack(
        [tsth, tnth, jnp.moveaxis(twst, 2, 3), jnp.moveaxis(test_, 2, 3)], axis=1
    )
    return _exchange_and_format(pool, topology, hops, nel_h, nel_v, ty, s)


def edge_halo_tangent(vqp, dqp, pbase: E3PertBase, topology, hops: HaloOps,
                      nel_h: int, nel_v: int, ty: int, s: int = 4):
    """One-shot form: prep + apply."""
    prep = tangent_glue_prep(dqp, pbase, hops, nel_h, nel_v, s)
    return edge_halo_tangent_prepped(vqp, prep, topology, hops, nel_h, nel_v, ty, s)


def halo_from_slabs_delta(we, dqp, pbase: E3PertBase, topology, hops: HaloOps,
                          nel_h: int, nel_v: int, ty: int, s: int = 4):
    """Chained-mode delta halo stage: the kernel-emitted west/east slabs
    already hold DELTA traces (the pert lwe path); the south/north rows are
    delta-extrapolated here from the packed delta state + base pools."""
    s_, G, S3, nxp, _rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s_), 1)
    SS = s_ * s_
    FSS = SS // H
    T = G * 2 * FSS
    nk, ny = nel_v, nel_h
    n_ytiles = ny // ty
    tynk = ty * nk * H
    tynk_pad = we.shape[-2]
    wec = we.reshape(6, n_ytiles, 5, tynk_pad, LANES)[:, :, :, :tynk]
    wst = wec[..., 0:FSS].reshape(6, n_ytiles, 5, ty, nk, SS)
    est = wec[..., T - FSS : T].reshape(6, n_ytiles, 5, ty, nk, SS)
    fmt = lambda a: jnp.transpose(a, (2, 0, 4, 1, 3, 5)).reshape(5, 6, nk, ny, SS)
    w_pool = fmt(wst)
    e_pool = fmt(est)

    _, _, south, north = _edge_strips(dqp, nel_h, nel_v, s)
    _, _, s0_, n0_ = _edge_strips(pbase.q0p, nel_h, nel_v, s)
    logd = lambda d, b: jnp.concatenate(
        [jnp.log1p(d[0:1] / b[0:1]), d[1:4], jnp.log1p(d[4:5] / b[4:5])], axis=0
    )
    comb = lambda raw, t0: jnp.concatenate(
        [t0[0:1] * jnp.expm1(raw[0:1]), raw[1:4], t0[4:5] * jnp.expm1(raw[4:5])], axis=0
    )
    rs = lambda a: a.reshape(5, 6, nk, G * nxp, SS)
    s_pool = comb(rs(logd(south, s0_) @ hops.eys), pbase.sth0)
    n_pool = comb(rs(logd(north, n0_) @ hops.eyn), pbase.nth0)

    pool = jnp.stack([s_pool, n_pool, w_pool, e_pool], axis=1)
    return _exchange_and_format(pool, topology, hops, nel_h, nel_v, ty, s)


def _const_blocks(con: E3Constants, i0, i1, Rb, nkxp, tch_block):
    """Slice the constant fields for one (ytile, panel) block (pure mode)."""
    sl = lambda a: a[i0:i1]
    d = {
        "sqrtg": sl(con.sqrtg), "inv_sqrtg": sl(con.inv_sqrtg),
        "inv_dzdeta": sl(con.inv_dzdeta),
        "h": tuple(sl(a) for a in con.h),
        "chs": tuple(sl(a) for a in con.chs),
        "wpres_int": sl(con.wpres_int),
        "itf_xy": tuple(sl(a) for a in con.itf_xy),
        "itf_z": tuple(sl(a) for a in con.itf_z),
        "e_xy": con.e_xy, "e_z": con.e_z, "dd": con.dd, "dlp": con.dlp,
        "corr": con.corr, "lfc_xy": con.lfc_xy, "lfc_z": con.lfc_z,
        "hfk": con.hfk, "tch": tch_block,
        "e_y": con.e_y, "lfc_y": con.lfc_y,
        "itf_y": None if con.itf_y is None else tuple(sl(a) for a in con.itf_y),
        "zsplit": con.zsplit,
    }
    return d


def rhs_packed_pure(qp, con: E3Constants, topology, hops: HaloOps,
                    nel_h: int, nel_v: int, ty: int, s: int = 4,
                    pert: E3PertBase = None, tangent_qp=None):
    """Reference driver: run the kernel body block-by-block with jnp.roll.
    Bit-identical semantics to the pallas path; used by the parity tests.
    With ``pert``, qp carries the PERTURBATION (base-state-split form).
    With ``tangent_qp`` (packed direction; requires ``pert``) the output is
    the JACOBIAN ACTION J(q0 + qp) . tangent_qp instead of the RHS."""
    s, G, _S3, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    nk, ny = nel_v, nel_h
    nkxp = nk * H * nxp
    rows6 = ny * nkxp
    n_ytiles = ny // ty
    Rb = ty * nkxp
    Rbp = Rb + rp  # whole-panel rowpad mode: blocks carry pad rows (ty = ny)
    stride6 = rows6 + rp  # per-panel row stride in the packed arrays
    dims = {"nk": nk, "nxp": nxp, "ty": ty, "s": s, "g": G, "h": H}
    if rp:
        assert ty == ny and n_ytiles == 1, "rowpad implies whole-panel blocks"
        dims["rows"] = Rbp
        con = _pad_constants_rows(con._replace(tch=None), rows6, Rbp)._replace(tch=con.tch)

    if pert is None:
        hwe, hs, hn = edge_halo(qp, topology, hops, nel_h, nel_v, ty, s)
    else:
        hwe, hs, hn = edge_halo_delta(qp, pert, topology, hops, nel_h, nel_v, ty, s)
    if tangent_qp is not None:
        assert pert is not None
        thwe, ths, thn = edge_halo_tangent(
            tangent_qp, qp, pert, topology, hops, nel_h, nel_v, ty, s
        )
    out = []
    for p in range(6):
        pan = []
        for i in range(n_ytiles):
            r0 = p * stride6 + i * Rb
            q = qp[:, r0 : r0 + Rbp]
            pr = p * stride6 + max(i * ty - 1, 0) * nkxp
            nx_ = p * stride6 + min(i * ty + ty, ny - 1) * nkxp
            qprev = qp[:, pr : pr + nkxp]
            qnext = qp[:, nx_ : nx_ + nkxp]
            c0 = i * Rb
            tch_block = (
                tuple(a[r0 : r0 + Rbp] for a in con.tch) if con.tch is not None else None
            )
            cblk = _const_blocks(con, c0, c0 + Rbp, Rb, nkxp, tch_block)
            base = None
            if pert is not None:
                base = {
                    "q0": pert.q0p[:, r0 : r0 + Rbp],
                    "q0prev": pert.q0p[:, pr : pr + nkxp],
                    "q0next": pert.q0p[:, nx_ : nx_ + nkxp],
                    "hwe0": pert.hwe0[p * n_ytiles + i, :, : ty * nk * H],
                    "hs0": pert.hs0[p],
                    "hn0": pert.hn0[p],
                    "rhs0": pert.rhs0p[:, r0 : r0 + Rbp],
                }
            tangent = None
            if tangent_qp is not None:
                tangent = {
                    "v": tangent_qp[:, r0 : r0 + Rbp],
                    "vprev": tangent_qp[:, pr : pr + nkxp],
                    "vnext": tangent_qp[:, nx_ : nx_ + nkxp],
                    "vwe": thwe[p * n_ytiles + i, :, : ty * nk * H],
                    "vs": ths[p],
                    "vn": thn[p],
                }
            o = _km3_body(
                q, qprev, qnext, hwe[p * n_ytiles + i, :, : ty * nk * H], hs[p], hn[p],
                cblk, dims, i, n_ytiles, jnp.roll, base=base, tangent=tangent,
            )
            pan.append(jnp.stack(o))
        out.append(jnp.concatenate(pan, axis=1))
    return jnp.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# Pallas wrapper: grid (ny/ty, 6) with the panel axis innermost (single-
# panel constants keep their block between the six inner steps).


def km3_fused(
    qp, hwe, hs, hn, con: E3Constants, nel_h: int, nel_v: int, ty: int,
    s: int = 4,
    x=None, cdt=None, stage_a=None, stage_b=None, bal=None,
    emit_slabs: bool = False, interpret: bool = False,
    pert: E3PertBase = None, tangent=None,
):
    """The whole 3D Euler spatial operator (+ optional explicit-RK stage
    combination ``stage_a*x + stage_b*qp + cdt*RHS(qp)``) as one kernel per
    (y-slab, panel) block. qp: (5, R, 128) packed state; hwe/hs/hn from
    ``edge_halo``. With ``emit_slabs`` (requires a stage combination, since
    the slabs are log-extrapolated from the OUTPUT state) also returns the
    (we, ssl, nsl) edge-trace slabs for ``halo_from_slabs`` so the next
    stage needs no XLA extraction over the big state.

    ``tangent`` (requires ``pert``): a tuple ``(vp, thwe, ths, thn)`` — the
    packed DIRECTION plus its halos from ``edge_halo_tangent`` — switching
    the kernel to the fused Jacobian action J(q0 + qp) . vp (see
    _km3_body's tangent docstring); qp then still carries the perturbation
    at which the operator is linearized."""
    s, G, _S3, nxp, rp = _pk(s, nel_h, nel_v)
    H = max(pick_h(s), 1)
    nk, ny = nel_v, nel_h
    nkxp = nk * H * nxp
    rows6 = ny * nkxp
    n_ytiles = ny // ty
    Rb = ty * nkxp
    Rbp = Rb + rp  # whole-panel rowpad mode (ty = ny): blocks carry pad rows
    tynk = ty * nk * H
    tynk_pad = hwe.shape[-2]
    dims = {"nk": nk, "nxp": nxp, "ty": ty, "s": s, "g": G, "h": H}
    if rp:
        assert ty == ny and n_ytiles == 1, "rowpad implies whole-panel blocks"
        dims["rows"] = Rbp
        con = _pad_constants_rows(con._replace(tch=None), rows6, Rbp)._replace(tch=con.tch)
    # Neighbor-sliver blocks need nkxp-unit addressing over the rows, which
    # row padding breaks; the one-hot row-select path covers that case.
    slim_neighbors = (nkxp % 8) == 0 and rp == 0
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    with_bal = bal is not None
    with_pert = pert is not None
    with_tan = tangent is not None
    with_tch = con.tch is not None
    with_split = con.itf_y is not None  # split x/y trace registers
    with_zs = con.zsplit is not None  # half-split z matrices (s=6)
    if emit_slabs and not with_stage:
        raise ValueError("emit_slabs needs a stage combination (output must be a state)")
    if with_tan and (not with_pert or with_stage or emit_slabs or with_bal):
        raise ValueError("tangent mode requires pert and emits J.v alone")
    dtype = qp.dtype
    zero = np.int32(0)

    n_panel_fields = 3 + 6 + 18 + 1 + 5 + 5  # sqrtg..wpres_int + itf_xy + itf_z
    n_mats = 8

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        qprev_ref, qnext_ref = next(it), next(it)
        hwe_ref, hs_ref, hn_ref = next(it), next(it), next(it)
        sqrtg, inv_sqrtg, inv_dzdeta = next(it), next(it), next(it)
        h = tuple(next(it) for _ in range(6))
        chs = tuple(next(it) for _ in range(18))
        wpres_int = next(it)
        itf_xy = tuple(next(it) for _ in range(5))
        itf_z = tuple(next(it) for _ in range(5))
        e_xy, e_z, dd, dlp, corr, lfc_xy, lfc_z, hfk = (next(it) for _ in range(n_mats))
        if with_split:
            itf_y = tuple(next(it) for _ in range(5))
            e_y, lfc_y = next(it), next(it)
        else:
            itf_y, e_y, lfc_y = None, None, None
        zs_refs = tuple(next(it) for _ in range(11)) if with_zs else None
        tch = tuple(next(it) for _ in range(9)) if with_tch else None
        bal_ref = next(it) if with_bal else None
        if with_pert:
            (q0_ref, q0prev_ref, q0next_ref, hwe0_ref, hs0_ref, hn0_ref,
             rhs0_ref) = (next(it) for _ in range(7))
        if with_tan:
            (v_ref, vprev_ref, vnext_ref, vhwe_ref, vhs_ref, vhn_ref) = (
                next(it) for _ in range(6)
            )
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        lwe_ref = next(it) if emit_slabs else None
        sel_prev_ref = next(it) if not slim_neighbors else None
        sel_next_ref = next(it) if not slim_neighbors else None
        o_ref = next(it)
        if emit_slabs:
            owe_ref = next(it)

        rd = lambda r: r[...]
        if slim_neighbors:
            qprev = qprev_ref[...]
            qnext = qnext_ref[...]
            if with_pert:
                q0prev = q0prev_ref[...]
                q0next = q0next_ref[...]
            if with_tan:
                vprev = vprev_ref[...]
                vnext = vnext_ref[...]
        else:
            # Neighbor boundary rows via one-hot row-select GEMMs (a
            # (5, nkxp, 128) block is Mosaic-illegal when nkxp % 8 != 0).
            sp, sn_ = sel_prev_ref[...], sel_next_ref[...]
            mmsel = lambda m, a: jax.lax.dot(m, a, precision=_KP, preferred_element_type=dtype)
            qprev = jnp.stack([mmsel(sp, qprev_ref[v]) for v in range(5)])
            qnext = jnp.stack([mmsel(sn_, qnext_ref[v]) for v in range(5)])
            if with_pert:
                q0prev = jnp.stack([mmsel(sp, q0prev_ref[v]) for v in range(5)])
                q0next = jnp.stack([mmsel(sn_, q0next_ref[v]) for v in range(5)])
            if with_tan:
                vprev = jnp.stack([mmsel(sp, vprev_ref[v]) for v in range(5)])
                vnext = jnp.stack([mmsel(sn_, vnext_ref[v]) for v in range(5)])
        cblk = {
            "sqrtg": rd(sqrtg), "inv_sqrtg": rd(inv_sqrtg),
            "inv_dzdeta": rd(inv_dzdeta),
            "h": tuple(rd(a) for a in h),
            "chs": tuple(rd(a) for a in chs),
            "wpres_int": rd(wpres_int),
            "itf_xy": tuple(rd(a) for a in itf_xy),
            "itf_z": tuple(rd(a) for a in itf_z),
            "e_xy": rd(e_xy), "e_z": rd(e_z), "dd": rd(dd), "dlp": rd(dlp),
            "corr": rd(corr), "lfc_xy": rd(lfc_xy), "lfc_z": rd(lfc_z),
            "hfk": rd(hfk),
            "tch": tuple(rd(a) for a in tch) if with_tch else None,
            "itf_y": tuple(rd(a) for a in itf_y) if with_split else None,
            "e_y": rd(e_y) if with_split else None,
            "lfc_y": rd(lfc_y) if with_split else None,
            "zsplit": tuple(rd(a) for a in zs_refs) if with_zs else None,
        }
        base = None
        if with_pert:
            base = {
                "q0": q0_ref[...],
                "q0prev": q0prev,
                "q0next": q0next,
                "hwe0": hwe0_ref[0][:, :tynk],
                "hs0": hs0_ref[0],
                "hn0": hn0_ref[0],
                "rhs0": rhs0_ref[...],
            }
        tan_d = None
        if with_tan:
            tan_d = {
                "v": v_ref[...],
                "vprev": vprev,
                "vnext": vnext,
                "vwe": vhwe_ref[0][:, :tynk],
                "vs": vhs_ref[0],
                "vn": vhn_ref[0],
            }
        # shift must land as an i32 scalar (x64 mode would make it i64,
        # which tpu.dynamic_rotate rejects)
        roll = lambda a, shift, axis: pltpu.roll(a, np.int32(shift), axis)
        out = _km3_body(
            q_ref[...], qprev, qnext,
            hwe_ref[0][:, :tynk], hs_ref[0], hn_ref[0],
            cblk, dims, pl.program_id(0), n_ytiles, roll,
            x=(x_ref[...] if with_x else None),
            cdt=(cdt_ref[0, 0] if with_stage else None),
            stage_a=stage_a, stage_b=stage_b,
            bal=(bal_ref[...] if with_bal else None),
            lwe=(lwe_ref[...] if emit_slabs else None),
            base=base, tangent=tan_d,
        )
        if emit_slabs:
            out, we_rows = out
            wearr = jnp.stack(we_rows)
            owe_ref[0] = jnp.pad(wearr, ((0, 0), (0, tynk_pad - tynk), (0, 0)))
        for v in range(5):
            o_ref[v] = out[v]

    blk5 = pl.BlockSpec((5, Rbp, LANES), lambda i, p: (zero, p * n_ytiles + i, zero))
    if slim_neighbors:
        slab = lambda rowsel: pl.BlockSpec((5, nkxp, LANES), rowsel)
        prev_spec = slab(lambda i, p: (zero, p * ny + jnp.maximum(i * ty - 1, 0), zero))
        next_spec = slab(lambda i, p: (zero, p * ny + jnp.minimum(i * ty + ty, ny - 1), zero))
    else:
        prev_spec = pl.BlockSpec(
            (5, Rbp, LANES), lambda i, p: (zero, p * n_ytiles + jnp.maximum(i - 1, 0), zero)
        )
        next_spec = pl.BlockSpec(
            (5, Rbp, LANES), lambda i, p: (zero, p * n_ytiles + jnp.minimum(i + 1, n_ytiles - 1), zero)
        )
    hwe_spec = pl.BlockSpec((1, 5, tynk_pad, LANES), lambda i, p: (p * n_ytiles + i, zero, zero, zero))
    edge_spec = pl.BlockSpec((1, 5, nkxp, LANES), lambda i, p: (p, zero, zero, zero))
    pan = lambda: pl.BlockSpec((Rbp, LANES), lambda i, p: (i, zero))
    full = lambda a: pl.BlockSpec(a.shape, lambda i, p: tuple(zero for _ in a.shape))
    tch_spec = pl.BlockSpec((Rbp, LANES), lambda i, p: (p * n_ytiles + i, zero))

    in_specs = [blk5, prev_spec, next_spec, hwe_spec, edge_spec, edge_spec]
    args = [qp, qp, qp, hwe, hs, hn]
    panel_fields = (
        [con.sqrtg, con.inv_sqrtg, con.inv_dzdeta]
        + list(con.h) + list(con.chs) + [con.wpres_int]
        + list(con.itf_xy) + list(con.itf_z)
    )
    in_specs += [pan() for _ in panel_fields]
    args += panel_fields
    mats = [con.e_xy, con.e_z, con.dd, con.dlp, con.corr, con.lfc_xy, con.lfc_z, con.hfk]
    in_specs += [full(a) for a in mats]
    args += mats
    if with_split:
        in_specs += [pan() for _ in range(5)] + [full(con.e_y), full(con.lfc_y)]
        args += list(con.itf_y) + [con.e_y, con.lfc_y]
    if with_zs:
        in_specs += [full(a) for a in con.zsplit]
        args += list(con.zsplit)
    if with_tch:
        in_specs += [tch_spec for _ in range(9)]
        args += list(con.tch)
    if with_bal:
        in_specs.append(blk5)
        args.append(bal)
    if with_pert:
        in_specs += [blk5, prev_spec, next_spec, hwe_spec, edge_spec, edge_spec, blk5]
        args += [pert.q0p, pert.q0p, pert.q0p, pert.hwe0, pert.hs0, pert.hn0, pert.rhs0p]
    if with_tan:
        vp_t, thwe, ths_t, thn_t = tangent
        in_specs += [blk5, prev_spec, next_spec, hwe_spec, edge_spec, edge_spec]
        args += [vp_t, vp_t, vp_t, thwe, ths_t, thn_t]
    if with_x:
        in_specs.append(blk5)
        args.append(x)
    if with_stage:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, p: (zero, zero), memory_space=pltpu.SMEM))
        args.append(jnp.asarray(cdt, dtype=dtype).reshape(1, 1))
    if emit_slabs:
        lwe_np = np.zeros((2 * tynk, Rbp), np.float32)
        for r in range(tynk):
            lwe_np[r, r * nxp] = 1.0
            lwe_np[tynk + r, r * nxp + nxp - 1] = 1.0
        in_specs.append(pl.BlockSpec((2 * tynk, Rbp), lambda i, p: (zero, zero)))
        args.append(jnp.asarray(lwe_np, dtype=dtype))
    if not slim_neighbors:
        sel_p = np.zeros((nkxp, Rbp), np.float64)
        sel_n = np.zeros((nkxp, Rbp), np.float64)
        for j in range(nkxp):
            sel_p[j, (ty - 1) * nkxp + j] = 1.0
            sel_n[j, j] = 1.0
        for m_ in (sel_p, sel_n):
            in_specs.append(pl.BlockSpec((nkxp, Rbp), lambda i, p: (zero, zero)))
            args.append(jnp.asarray(m_, dtype=dtype))

    out_specs = [blk5]
    out_shapes = [jax.ShapeDtypeStruct(qp.shape, dtype)]
    if emit_slabs:
        out_specs.append(
            pl.BlockSpec((1, 5, tynk_pad, LANES), lambda i, p: (p * n_ytiles + i, zero, zero, zero))
        )
        out_shapes.append(jax.ShapeDtypeStruct((6 * n_ytiles, 5, tynk_pad, LANES), dtype))

    import sys

    # The kernel body traces to several hundred primitives; CPython's
    # default 1000-frame recursion limit is not enough for the nested
    # trace/lowering machinery on a body this size.
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 20000))
    try:
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        res = pl.pallas_call(
            kernel,
            grid=(n_ytiles, 6),
            in_specs=in_specs,
            out_specs=out_specs if emit_slabs else out_specs[0],
            out_shape=out_shapes if emit_slabs else out_shapes[0],
            interpret=interpret,
            **kwargs,
        )(*args)
        return tuple(res) if emit_slabs else res
    finally:
        sys.setrecursionlimit(old_limit)


# ---------------------------------------------------------------------------
# Single-TILE whole-array kernel (the per-device kernel of the fused 3D
# shard_map path, parallel/shard_map_euler3d_fused.py). One tile of a
# (6, N, N) mesh holds (nel_t x nel_t x nel_v) elements; the whole tile runs
# as ONE no-grid pallas_call with rows padded to a multiple of 8
# (dims["rows"] support in _km3_body), so any tile shape with a row packing
# g | nel_t is Mosaic-legal — no (ty * nkxp) % 8 divisibility constraint.
# TPU analogue of the reference's per-rank compiled kernels
# (device/device.py:79-141).


def tile_plan(nel_t: int, nel_v: int, s: int):
    """(g, nxp, rows, Rp) of the single-tile packing; None if unsupported."""
    if s**3 > 128:
        return None
    g = pick_g3(s, nel_t)
    if g is None:
        return None
    nxp = nel_t // g
    rows = nel_t * nel_v * nxp
    Rp = -(-rows // 8) * 8
    return g, nxp, rows, Rp


def tile_supported(nel_t: int, nel_v: int, s: int, nvar: int, dtype) -> bool:
    if nvar != 5 or not (2 <= s <= 5):
        return False
    if tile_plan(nel_t, nel_v, s) is None:
        return False
    if dtype in (jnp.float32, np.float32):
        return True
    return dtype in (jnp.float64, np.float64) and jax.default_backend() != "tpu"


_STATE_FILL = (1.0, 0.0, 0.0, 0.0, 1.0)  # NaN-safe pad per variable


def pack_tile_jnp(a: jnp.ndarray, nel_t: int, nel_v: int, s: int,
                  state_fill: bool = False) -> jnp.ndarray:
    """Tile grid layout (5, nk, nt, nt, s^3) -> padded packed (5, Rp, 128).
    ``state_fill`` fills lane AND row pads NaN-safely (rho/rho*theta = 1)."""
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    s3 = s**3
    b = jnp.moveaxis(a, -4, -3).reshape(5, rows, g * s3)
    if state_fill:
        fill = jnp.asarray(_STATE_FILL, a.dtype)[:, None, None]
        lanepad = jnp.broadcast_to(fill, (5, rows, LANES - g * s3))
        rowpad = jnp.broadcast_to(fill, (5, Rp - rows, LANES))
    else:
        lanepad = jnp.zeros((5, rows, LANES - g * s3), a.dtype)
        rowpad = jnp.zeros((5, Rp - rows, LANES), a.dtype)
    return jnp.concatenate([jnp.concatenate([b, lanepad], -1), rowpad], 1)


def unpack_tile_jnp(qp: jnp.ndarray, nel_t: int, nel_v: int, s: int) -> jnp.ndarray:
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    s3 = s**3
    b = qp[:, :rows, : g * s3].reshape(5, nel_t, nel_v, nel_t, s3)
    return jnp.moveaxis(b, 1, 2)


def pad_tile_constants(con: E3Constants, nel_t: int, nel_v: int, s: int) -> E3Constants:
    """Row-pad a tile's E3Constants (single-panel fields from
    build_constants(ops, view, nel_t, nel_v, s)) to Rp rows with values that
    keep every kernel intermediate finite on the pad rows (sqrt/divide-safe:
    metric factors 1, Christoffels 0). ``tch`` is NOT padded here — the
    caller passes per-panel tile slices and pads them alongside."""
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    return _pad_constants_rows(con, rows, Rp)


def _pad_constants_rows(con: E3Constants, rows: int, Rp: int) -> E3Constants:
    """Row-pad the single-panel constant fields to Rp rows (NaN-safe fills;
    also used by km3_fused's whole-panel rowpad mode)."""
    if Rp == rows:
        return con

    def pad(a, fill):
        tail = jnp.full((Rp - rows, LANES), fill, a.dtype)
        return jnp.concatenate([a, tail], 0)

    return con._replace(
        sqrtg=pad(con.sqrtg, 1.0),
        inv_sqrtg=pad(con.inv_sqrtg, 1.0),
        inv_dzdeta=pad(con.inv_dzdeta, 1.0),
        h=tuple(pad(a, 1.0) for a in con.h),
        chs=tuple(pad(a, 0.0) for a in con.chs),
        wpres_int=pad(con.wpres_int, 0.0),
        itf_xy=tuple(pad(a, 1.0) for a in con.itf_xy),
        itf_z=tuple(pad(a, 1.0) for a in con.itf_z),
        tch=None if con.tch is None else tuple(pad(a, 0.0) for a in con.tch),
        itf_y=None if con.itf_y is None else tuple(pad(a, 1.0) for a in con.itf_y),
    )


def tile_halo_mats(nel_t: int, nel_v: int, s: int, dtype):
    """One-hot lane-placement GEMM matrices of the tile halo formatter:
    (kwe, ks, kn) — same construction as _exchange_and_format, tile-sized."""
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    SS = s * s
    TSS = 2 * SS
    T = g * TSS
    kwe = np.zeros((2 * SS, LANES))
    kwe[np.arange(SS), np.arange(SS)] = 1.0
    kwe[SS + np.arange(SS), T - SS + np.arange(SS)] = 1.0
    yoff = 0 if is_split_layout(s, g) else 64
    ks = np.zeros((g * SS, LANES))
    kn = np.zeros((g * SS, LANES))
    for gg in range(g):
        ks[gg * SS + np.arange(SS), yoff + gg * TSS + np.arange(SS)] = 1.0
        kn[gg * SS + np.arange(SS), yoff + gg * TSS + SS + np.arange(SS)] = 1.0
    c = lambda a: jnp.asarray(a, dtype)
    return c(kwe), c(ks), c(kn)


def format_tile_halos(w, e, s_, n_, nel_t: int, nel_v: int, s: int, mats):
    """Received tile halo faces (5, nk, nel_t, ss) per side [W, E, S, N] ->
    the km3_tile kernel inputs (hwe (5, tynk, 128), hs/hn (5, nkxp, 128))."""
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    SS = s * s
    nk = nel_v
    kwe, ks, kn = mats
    tynk = nel_t * nk
    # hwe rows (ky, kz): transpose the (nk, nel_t) face grid.
    tr = lambda a: jnp.swapaxes(a, 1, 2).reshape(5, tynk, SS)
    hwe = jnp.concatenate([tr(w), tr(e)], axis=-1) @ kwe
    # hs/hn rows (kz, x2) with the g in-row elements concatenated in lanes.
    rs = lambda a: a.reshape(5, nk * nxp, g * SS)
    return hwe, rs(s_) @ ks, rs(n_) @ kn


def km3_tile(
    qp, hwe, hs, hn, con: E3Constants, nel_t: int, nel_v: int, s: int,
    x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False, base=None,
):
    """The whole spatial operator of ONE cubed-sphere tile as a single
    no-grid pallas_call (rows padded to Rp): the per-device kernel of the
    fused shard_map 3D path.

    qp: (5, Rp, 128) padded packed tile state (pack_tile_jnp); hwe:
    (5, tynk, 128) west/east halo rows (ky, kz) with west faces at lanes
    [0, ss) and east at [T-ss, T); hs/hn: (5, nkxp, 128) south/north halo
    rows (kz, x2) in ys/yn slot lanes — all from ``format_tile_halos``.
    ``con``: pad_tile_constants output, with ``tch`` already the tile's OWN
    panel block (padded). ``base``: optional dict {q0, rhs0, hwe0, hs0, hn0}
    switching to the perturbation form (same shapes; q0/rhs0 (5, Rp, 128)).
    With ``emit_slabs`` also returns (5, tynk_pad, 128) west/east output
    edge traces for the next stage's halo exchange."""
    g, nxp, rows, Rp = tile_plan(nel_t, nel_v, s)
    nk = nel_v
    nkxp = nk * nxp
    tynk = nel_t * nk
    tynk_pad = -(-tynk // 8) * 8
    dims = {"nk": nk, "nxp": nxp, "ty": nel_t, "s": s, "g": g, "rows": Rp}
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    with_base = base is not None
    with_tch = con.tch is not None
    with_split = con.itf_y is not None  # split x/y trace registers
    if emit_slabs and not with_stage:
        raise ValueError("emit_slabs needs a stage combination (output must be a state)")
    dtype = qp.dtype

    from jax.experimental.pallas import tpu as pltpu

    roll = lambda a, shift, axis: pltpu.roll(a, np.int32(shift), axis)

    lwe = None
    if emit_slabs:
        lwe_np = np.zeros((2 * tynk, Rp), np.float32)
        for r in range(tynk):
            lwe_np[r, r * nxp] = 1.0
            lwe_np[tynk + r, r * nxp + nxp - 1] = 1.0
        lwe = jnp.asarray(lwe_np, dtype)

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        hwe_ref, hs_ref, hn_ref = next(it), next(it), next(it)
        sqrtg, inv_sqrtg, inv_dzdeta = next(it), next(it), next(it)
        h = tuple(next(it) for _ in range(6))
        chs = tuple(next(it) for _ in range(18))
        wpres_int = next(it)
        itf_xy = tuple(next(it) for _ in range(5))
        itf_z = tuple(next(it) for _ in range(5))
        mats = {k: next(it) for k in ("e_xy", "e_z", "dd", "dlp", "corr", "lfc_xy", "lfc_z", "hfk")}
        if with_split:
            itf_y = tuple(next(it) for _ in range(5))
            mats["e_y"], mats["lfc_y"] = next(it), next(it)
        tch = tuple(next(it) for _ in range(9)) if with_tch else None
        if with_base:
            q0_ref, rhs0_ref, hwe0_ref, hs0_ref, hn0_ref = (next(it) for _ in range(5))
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        lwe_ref = next(it) if emit_slabs else None
        o_ref = next(it)
        if emit_slabs:
            owe_ref = next(it)

        rd = lambda r: r[...]
        cblk = {
            "sqrtg": rd(sqrtg), "inv_sqrtg": rd(inv_sqrtg),
            "inv_dzdeta": rd(inv_dzdeta),
            "h": tuple(rd(a) for a in h),
            "chs": tuple(rd(a) for a in chs),
            "wpres_int": rd(wpres_int),
            "itf_xy": tuple(rd(a) for a in itf_xy),
            "itf_z": tuple(rd(a) for a in itf_z),
            "tch": tuple(rd(a) for a in tch) if with_tch else None,
            "itf_y": tuple(rd(a) for a in itf_y) if with_split else None,
        }
        if not with_split:
            cblk["e_y"] = cblk["lfc_y"] = None
        cblk.update({k: rd(v) for k, v in mats.items()})

        # The y-neighbour slabs are never SELECTED with a single y-block
        # (every first/last-ky position reads hs/hn instead), but their
        # traces are still computed — synthesize a finite NaN-safe fill.
        vidx = jax.lax.broadcasted_iota(jnp.int32, (5, nkxp, LANES), 0)
        qfill = jnp.where((vidx == 0) | (vidx == 4), 1.0, 0.0).astype(dtype)

        base_d = None
        if with_base:
            base_d = {
                "q0": q0_ref[...], "q0prev": qfill, "q0next": qfill,
                "hwe0": hwe0_ref[...], "hs0": hs0_ref[...], "hn0": hn0_ref[...],
                "rhs0": rhs0_ref[...],
            }
        out = _km3_body(
            q_ref[...], qfill, qfill, hwe_ref[...], hs_ref[...], hn_ref[...],
            cblk, dims, 0, 1, roll,
            x=(x_ref[...] if with_x else None),
            cdt=(cdt_ref[0, 0] if with_stage else None),
            stage_a=stage_a, stage_b=stage_b,
            lwe=(lwe_ref[...] if emit_slabs else None),
            base=base_d,
        )
        if emit_slabs:
            out, we_rows = out
            owe_ref[...] = jnp.pad(jnp.stack(we_rows), ((0, 0), (0, tynk_pad - tynk), (0, 0)))
        for v in range(5):
            o_ref[v] = out[v]

    args = [qp, hwe, hs, hn, con.sqrtg, con.inv_sqrtg, con.inv_dzdeta]
    args += list(con.h) + list(con.chs) + [con.wpres_int]
    args += list(con.itf_xy) + list(con.itf_z)
    args += [con.e_xy, con.e_z, con.dd, con.dlp, con.corr, con.lfc_xy, con.lfc_z, con.hfk]
    if with_split:
        args += list(con.itf_y) + [con.e_y, con.lfc_y]
    if with_tch:
        args += list(con.tch)
    if with_base:
        args += [base["q0"], base["rhs0"], base["hwe0"], base["hs0"], base["hn0"]]
    if with_x:
        args.append(x)
    if with_stage:
        args.append(jnp.asarray(cdt, dtype=dtype).reshape(1, 1))
    if emit_slabs:
        args.append(lwe)
    out_shape = [jax.ShapeDtypeStruct((5, Rp, LANES), dtype)]
    if emit_slabs:
        out_shape.append(jax.ShapeDtypeStruct((5, tynk_pad, LANES), dtype))

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 20000))
    try:
        kwargs = dict(out_shape=out_shape, interpret=interpret)
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        outs = pl.pallas_call(kernel, **kwargs)(*args)
        return tuple(outs) if emit_slabs else outs[0]
    finally:
        sys.setrecursionlimit(old_limit)
