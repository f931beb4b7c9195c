"""Generic fused Pallas TPU pipeline for the shallow-water DFR RHS:
num_solpts in 2..8, any element count with a usable row packing.

Same architecture as the s=4-specialized pipeline (pallas_sw.py — kept as
the tuned fast path for its shapes, incl. the whole-run KR kernel): the
whole spatial operator (extrapolation, pointwise fluxes, interior
divergence, AUSM interface fluxes, boundary correction, forcing, optional
RK-stage combination and next-stage edge slabs) runs in VMEM per panel;
only the KB-sized panel-edge halo exchange runs in XLA between launches.
Reference semantics: rhs/rhs_sw.py:81-238.

Differences that buy the generality:

* Packing ``g`` elements per 128-lane row with ``g | nel`` and
  ``g <= min(128 // s^2, 64 // (2 s))``: state lane ``grp*s^2 + j``,
  face-trace lane ``dir*64 + grp*2s + face*s + k`` (x in lanes [0, 2sg),
  y in [64, 64+2sg); the rest is zero padding). At (s=4, g=8) this is
  exactly the specialized module's layout.
* Mosaic requires block sublane counts divisible by 8 (or whole-array
  blocks), so the per-panel grid runs only when ``prows = nel^2/g`` is a
  multiple of 8; otherwise ONE whole-array program loops the six panels
  with static slices (small shapes only — gated by a VMEM row budget).
* Halo expansion to panel trace shape uses masked-broadcast + one-hot
  GEMMs instead of ``pltpu.roll(stride=...)`` (the strided rotate does not
  lower for non-8-aligned row counts).
* Lane padding is NaN-safe by construction: ``pack`` fills the height
  pads with 1.0 (momenta 0), metric pads are 0, and every GEMM row/column
  touching a pad lane is zero, so pads carry exactly ``a+b = 1`` through
  any consistent RK stage combination.
"""

import functools
import types
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_sw import _element_stage  # layout-independent per-row stage math
from . import kernel_precision as _kernel_precision

_KP = _kernel_precision()

MAX_WHOLE_ROWS = 4096  # VMEM budget gate for the whole-array mode


def pick_g(num_solpts: int, nel: int):
    """Largest element-per-row packing g with g | nel that fits the state
    (g*s^2 <= 128) and the split trace layout (2*s*g <= 64)."""
    s = num_solpts
    cap = min(128 // (s * s), 64 // (2 * s))
    for g in range(min(cap, nel), 0, -1):
        if nel % g == 0:
            return g
    return None


def plan(num_solpts: int, nel: int):
    s = num_solpts
    g = pick_g(s, nel)
    if g is None:
        return None
    rpr = nel // g
    prows = nel * rpr
    mode = "panel" if prows % 8 == 0 else "whole"
    if mode == "whole" and 6 * prows > MAX_WHOLE_ROWS:
        return None
    npts = nel * s
    return types.SimpleNamespace(
        s=s, g=g, T=2 * s * g, nel=nel, rpr=rpr, prows=prows, rows=6 * prows,
        nelp=-(-nel // 8) * 8, rpad=-(-rpr // 8) * 8, ws=g * s,
        npts=npts, npl=-(-npts // 128) * 128, mode=mode,
    )


MAX_PANEL_ROWS_TPU = 1024  # per-block VMEM budget for the compiled kernel
SLAB_ROWS_BUDGET = 512  # per-block rows of the y-slab decomposition


def slab_plan(num_solpts: int, nel: int):
    """Y-slab decomposition for panels too large for one whole-panel block:
    ``ty | nel`` element rows per block with Mosaic-legal block rows
    (ty*rpr % 8 == 0) under SLAB_ROWS_BUDGET. Returns (ty, n_ytiles) or
    None. Each slab is a (ty x nel) mini-panel: its south/north "halo" is
    the neighbouring slab's boundary trace, computed by the edge-sized XLA
    glue — the same h2-slot interface pattern the 3D pipeline uses for its
    y-slab coupling (pallas_euler3d.py), so the kernel body is unchanged."""
    s = num_solpts
    g = pick_g(s, nel)
    if g is None:
        return None
    rpr = nel // g
    best = None
    for ty in range(1, nel):
        if nel % ty or (ty * rpr) % 8:
            continue
        if ty * rpr <= SLAB_ROWS_BUDGET:
            best = ty
    return (best, nel // best) if best else None


def supported(num_solpts: int, nel: int, dtype) -> bool:
    """Shapes/dtypes this pipeline handles; others fall back to XLA.
    float64 only off-TPU (interpret mode — Mosaic has no f64 vector path).

    On TPU, panel blocks above MAX_PANEL_ROWS_TPU rows run the y-SLAB
    decomposition (slab_plan) — one kernel block per (y-slab, panel) so the
    VMEM working set stays bounded at any resolution (galewsky's 2048-row
    panels at s=7/nel=64 OOM the whole-panel kernel even at a 100 MB
    scoped limit)."""
    if not (2 <= num_solpts <= 8) or nel < 2:
        return False
    p = plan(num_solpts, nel)
    if p is None:
        return False
    if jax.default_backend() == "tpu" and p.prows > MAX_PANEL_ROWS_TPU:
        return slab_plan(num_solpts, nel) is not None
    if dtype in (jnp.float32, np.float32):
        return True
    return dtype in (jnp.float64, np.float64) and jax.default_backend() != "tpu"


class GenConstants(NamedTuple):
    """Trace-time constants (device arrays), sized per kernel BLOCK: one
    panel in "panel" mode (prows rows), the whole cube in "whole" mode
    (6*prows rows — the metric fields are tiled host-side there; they are
    panel-identical on the equiangular cubed sphere). B = block rows,
    P = panels per block (1 or 6) below."""

    fields: tuple  # 13 metric fields (B, 128)
    gridrot: jnp.ndarray  # (rows, 128) — always full (panel-dependent)
    eexy: jnp.ndarray  # (128, 128) state -> [x|y] trace
    dd: jnp.ndarray  # (256, 128) [fx|fy] -> divergence sum
    m_sg: jnp.ndarray  # (B, 128) interface sqrt(g), trace slots
    m_hd: jnp.ndarray  # (B, 128) H^11 (x) / H^22 (y)
    m_ho: jnp.ndarray  # (B, 128) H^21 (x) / H^12 (y)
    wmat: jnp.ndarray  # (128, 128) face fluxes -> correction
    # halo-expansion one-hot factors (host-built; see _expand_halo)
    p6w: jnp.ndarray  # (P*nel, P) halo-row broadcast, west/east
    p6s: jnp.ndarray  # (P*rpr, P) halo-row broadcast, south/north
    m1w: jnp.ndarray  # (P*nel, npl) flat-window row mask, west/east
    m1s: jnp.ndarray  # (P*rpr, npl) flat-window row mask, south/north
    kw: jnp.ndarray  # (npl, 128) flat -> west slot lanes
    ke: jnp.ndarray  # (npl, 128) flat -> east slot lanes
    ks: jnp.ndarray  # (npl, 128) flat -> south slot lanes
    kn: jnp.ndarray  # (npl, 128) flat -> north slot lanes
    pw: jnp.ndarray  # (B, P*nel) rows rmod==0
    pe: jnp.ndarray  # (B, P*nel) rows rmod==rpr-1
    ps: jnp.ndarray  # (B, P*rpr) panel rows 0..rpr-1
    pn: jnp.ndarray  # (B, P*rpr) panel rows prows-rpr..prows-1
    # slab-emission selectors/compactors
    lw: jnp.ndarray  # (P*nelp, B) west-column element rows
    le: jnp.ndarray  # (P*nelp, B) east-column element rows
    sel_s: jnp.ndarray  # (P*rpad, B) first rpr panel rows
    sel_n: jnp.ndarray  # (P*rpad, B) last rpr panel rows
    kcs: jnp.ndarray  # (128, 128) south trace slots -> flat window lanes
    kcn: jnp.ndarray  # (128, 128) north trace slots -> flat window lanes


def build_constants(ops, metric, nel: int, num_solpts: int, dtype=jnp.float32,
                    single_block: bool = False, slab_ty: int = None) -> GenConstants:
    """``single_block``: keep panel-style (P=1) constants even when the plan
    says "whole" mode — for km_tile, whose block is always ONE tile.
    ``slab_ty``: y-slab mode — every slab-last element row (ey+1 % ty == 0)
    gets the y-interface metric in its north h2 slots, so interior slab
    boundaries compute their interface flux exactly like panel edges."""
    p = plan(num_solpts, nel)
    s, g, T, rpr, prows = p.s, p.g, p.T, p.rpr, p.prows
    s2 = s * s
    npts, npl = p.npts, p.npl

    ex = np.asarray(ops.extrap_x, np.float64)  # (s^2, 2s)
    ez = np.asarray(ops.extrap_z, np.float64)
    dx = np.asarray(ops.derivative_x, np.float64)  # (2? s^2, s^2)
    dz = np.asarray(ops.derivative_z, np.float64)
    cw = np.asarray(ops.correction_WE, np.float64)  # (2s, s^2)
    cs = np.asarray(ops.correction_DU, np.float64)

    eexy = np.zeros((128, 128))
    dd = np.zeros((256, 128))
    wmat = np.zeros((128, 128))
    for grp in range(g):
        st = slice(grp * s2, (grp + 1) * s2)
        eexy[st, grp * 2 * s : (grp + 1) * 2 * s] = ex
        eexy[st, 64 + grp * 2 * s : 64 + (grp + 1) * 2 * s] = ez
        dd[st, st] = dx
        dd[128 + grp * s2 : 128 + (grp + 1) * s2, st] = dz
        for half in range(2):
            for k in range(s):
                wmat[grp * 2 * s + half * s + k, st] = cw[half * s + k]
                wmat[64 + grp * 2 * s + half * s + k, st] = cs[half * s + k]

    # --- packed single-panel interior fields --------------------------------
    def packed(a):
        full = pack_field(np.asarray(a, np.float64), nel, s, g)
        one = full[:prows]
        assert np.abs(full.reshape(6, prows, 128) - one).max() <= 1e-10 * max(
            np.abs(full).max(), 1e-300
        ), "metric field unexpectedly differs across panels"
        return one

    fields = tuple(
        jnp.asarray(packed(a), dtype=dtype)
        for a in (
            metric.sqrtG, metric.H_contra_11, metric.H_contra_12, metric.H_contra_22,
            metric.coriolis_factor_1_01, metric.coriolis_factor_1_02,
            metric.coriolis_factor_2_01, metric.coriolis_factor_2_02,
            metric.christoffel_1_11, metric.christoffel_1_12,
            metric.christoffel_2_12, metric.christoffel_2_22,
            metric.inv_sqrtG,
        )
    )
    gridrot = jnp.asarray(
        pack_field(np.broadcast_to(np.asarray(metric.gridrot, np.float64), metric.sqrtG.shape), nel, s, g),
        dtype=dtype,
    )

    # --- interface metric in trace slots (single panel) ---------------------
    sg_ix = np.asarray(metric.sqrtG_itf_i, np.float64)[:, :, 1:, :s]  # (6, nel, nel+1, s)
    h11_ix = np.asarray(metric.H_contra_11_itf_i, np.float64)[:, :, 1:, :s]
    h21_ix = np.asarray(metric.H_contra_21_itf_i, np.float64)[:, :, 1:, :s]
    sg_jx = np.asarray(metric.sqrtG_itf_j, np.float64)[:, 1:, :, :s]  # (6, nel+1, nel, s)
    h22_jx = np.asarray(metric.H_contra_22_itf_j, np.float64)[:, 1:, :, :s]
    h12_jx = np.asarray(metric.H_contra_12_itf_j, np.float64)[:, 1:, :, :s]

    def itf_layout(mx, my):
        for a in (mx, my):
            assert np.abs(a - a[:1]).max() <= 1e-10 * max(np.abs(a).max(), 1e-300)
        out = np.zeros((prows, 128))
        for ey in range(nel):
            for ex_ in range(nel):
                r, grp = ex_ // g, ex_ % g
                row = ey * rpr + r
                b = grp * 2 * s
                out[row, b : b + s] = mx[0, ey, ex_]  # west interface
                out[row, b + s : b + 2 * s] = 1.0  # interior h2: discarded
                out[row, 64 + b : 64 + b + s] = my[0, ey, ex_]  # south
                out[row, 64 + b + s : 64 + b + 2 * s] = 1.0
            row = ey * rpr + rpr - 1
            b = (g - 1) * 2 * s
            out[row, b + s : b + 2 * s] = mx[0, ey, nel]  # east panel edge
        north_rows = (
            [nel - 1] if slab_ty is None
            else [ey for ey in range(nel) if (ey + 1) % slab_ty == 0]
        )
        for ey in north_rows:  # north h2: panel edge / interior slab boundary
            for ex_ in range(nel):
                r, grp = ex_ // g, ex_ % g
                row = ey * rpr + r
                b = grp * 2 * s
                out[row, 64 + b + s : 64 + b + 2 * s] = my[0, ey + 1, ex_]
        return out

    m_sg = itf_layout(sg_ix, sg_jx)
    m_hd = itf_layout(h11_ix, h22_jx)
    m_ho = itf_layout(h21_ix, h12_jx)

    # --- halo-expansion factors ---------------------------------------------
    m1w = np.zeros((nel, npl))
    kw = np.zeros((npl, 128))
    ke = np.zeros((npl, 128))
    for y in range(nel):
        m1w[y, y * s : (y + 1) * s] = 1.0
    for j in range(npts):
        kw[j, j % s] = 1.0
        ke[j, T - s + (j % s)] = 1.0
    ws = g * s
    m1s = np.zeros((rpr, npl))
    ks = np.zeros((npl, 128))
    kn = np.zeros((npl, 128))
    for r in range(rpr):
        m1s[r, r * ws : (r + 1) * ws] = 1.0
    for j in range(npts):
        gi, k = (j % ws) // s, j % s
        ks[j, 64 + 2 * s * gi + k] = 1.0
        kn[j, 64 + 2 * s * gi + s + k] = 1.0

    pw = np.zeros((prows, nel))
    pe = np.zeros((prows, nel))
    for y in range(nel):
        pw[y * rpr, y] = 1.0
        pe[y * rpr + rpr - 1, y] = 1.0
    ps = np.zeros((prows, rpr))
    pn = np.zeros((prows, rpr))
    for r in range(rpr):
        ps[r, r] = 1.0
        pn[prows - rpr + r, r] = 1.0

    lw = np.zeros((p.nelp, prows))
    le = np.zeros((p.nelp, prows))
    for y in range(nel):
        lw[y, y * rpr] = 1.0
        le[y, y * rpr + rpr - 1] = 1.0
    sel_s = np.zeros((p.rpad, prows))
    sel_n = np.zeros((p.rpad, prows))
    for r in range(rpr):
        sel_s[r, r] = 1.0
        sel_n[r, prows - rpr + r] = 1.0
    kcs = np.zeros((128, 128))
    kcn = np.zeros((128, 128))
    for gi in range(g):
        for k in range(s):
            kcs[64 + 2 * s * gi + k, s * gi + k] = 1.0
            kcn[64 + 2 * s * gi + s + k, s * gi + k] = 1.0

    if p.mode == "panel" or single_block:
        p6w, p6s = np.ones((nel, 1)), np.ones((rpr, 1))
    else:
        # Whole-array mode: tile/block-diag everything over the six panels.
        tile6 = lambda a: np.tile(a, (6, 1))
        bd6 = lambda a: np.kron(np.eye(6), a)
        fields = tuple(jnp.asarray(tile6(np.asarray(f)), dtype=dtype) for f in fields)
        m_sg, m_hd, m_ho = tile6(m_sg), tile6(m_hd), tile6(m_ho)
        p6w = np.kron(np.eye(6), np.ones((nel, 1)))
        p6s = np.kron(np.eye(6), np.ones((rpr, 1)))
        m1w, m1s = tile6(m1w), tile6(m1s)
        pw, pe, ps, pn = bd6(pw), bd6(pe), bd6(ps), bd6(pn)
        lw, le, sel_s, sel_n = bd6(lw), bd6(le), bd6(sel_s), bd6(sel_n)

    c = lambda a: jnp.asarray(a, dtype=dtype)
    return GenConstants(
        fields, gridrot, c(eexy), c(dd), c(m_sg), c(m_hd), c(m_ho), c(wmat),
        c(p6w), c(p6s), c(m1w), c(m1s), c(kw), c(ke), c(ks), c(kn),
        c(pw), c(pe), c(ps), c(pn),
        c(lw), c(le), c(sel_s), c(sel_n), c(kcs), c(kcn),
    )


# ---------------------------------------------------------------------------
# Layout converters (jnp; used at trace time and in the model wrappers)


def pack_field(a: np.ndarray, nel: int, s: int, g: int) -> np.ndarray:
    """(..., 6, nel, nel, s^2) -> (..., 6*nel*rpr, 128), zero pads."""
    rpr = nel // g
    lead = a.shape[:-4]
    b = np.asarray(a).reshape(lead + (6, nel, rpr, g * s * s))
    pad = np.zeros(lead + (6, nel, rpr, 128 - g * s * s), b.dtype)
    return np.concatenate([b, pad], axis=-1).reshape(lead + (6 * nel * rpr, 128))


def pack_state(q: jnp.ndarray, nel: int, s: int, g: int) -> jnp.ndarray:
    """(3, 6, nel, nel, s^2) -> (3, rows, 128). Pad lanes are NaN-safe:
    h pads carry 1.0 (so u = hu/h is 0/1), momentum pads 0."""
    rpr = nel // g
    used = g * s * s
    b = q.reshape(3, 6, nel, rpr, used)
    padv = jnp.zeros((3, 1, 1, 1, 128 - used), q.dtype).at[0].set(1.0)
    pad = jnp.broadcast_to(padv, (3, 6, nel, rpr, 128 - used))
    return jnp.concatenate([b, pad], axis=-1).reshape(3, 6 * nel * rpr, 128)


def unpack_state(qp: jnp.ndarray, nel: int, s: int, g: int) -> jnp.ndarray:
    rpr = nel // g
    used = g * s * s
    return qp.reshape(3, 6, nel, rpr, 128)[..., :used].reshape(3, 6, nel, nel, s * s)


def pack_delta(dq: jnp.ndarray, nel: int, s: int, g: int) -> jnp.ndarray:
    """Pack a PERTURBATION state: all pad lanes zero (the base planes carry
    h0 = 1 there, so h = h0 + 0 stays division-safe and the delta math is
    exactly zero in pads — they survive any a + b = 1 stage combination)."""
    rpr = nel // g
    used = g * s * s
    b = dq.reshape(3, 6, nel, rpr, used)
    pad = jnp.zeros((3, 6, nel, rpr, 128 - used), dq.dtype)
    return jnp.concatenate([b, pad], axis=-1).reshape(3, 6 * nel * rpr, 128)


def build_base_planes(ops, metric, topology, q0_64, rhs0_64, nel: int, s: int, dtype,
                      slab_ty: int = None, geom=None):
    """Packed base planes for the perturbation-form kernel, computed in
    float64 (one-time factory cost) and cast: [h0, hu10, hu20, u10, u20,
    A0 (base traces, 3), E0 (expanded base halos, 3), rhs0 (f64 base RHS,
    3)] -> (14, rows, 128). The base trace/halo values are produced by the
    SAME packed-layout machinery the kernel uses (packed_slabs /
    halo_from_slabs / _expand_halo), so slot semantics match exactly.

    ``slab_ty`` (+ ``geom``): y-slab mode — E0 additionally carries the
    base interface states at interior slab boundaries (the slots the slab
    kernel patches from halos), built from the global f64 base interface
    L/R states."""
    p = plan(s, nel)
    f64 = jnp.float64
    con64 = build_constants(ops, metric, nel, s, dtype=f64,
                            single_block=slab_ty is not None, slab_ty=slab_ty)
    conv64 = jnp.asarray(topology._conv_contra_all, f64)
    q0j = jnp.asarray(q0_64, f64)
    qp0 = pack_state(q0j, nel, s, p.g)
    A0 = jnp.stack([qp0[v] @ con64.eexy for v in range(3)])
    if slab_ty is not None:
        from ..parallel.shard_map_sw_fused import _sw_base_interfaces_f64

        ex64 = _slab_extras(p, slab_ty, f64)
        econ64 = _slab_con(con64, ex64, None, None, None, None, None)
        qL_x, qR_x, qL_y, qR_y = _sw_base_interfaces_f64(geom, ops, topology, q0j)
        n_yt = nel // slab_ty
        npts_w = slab_ty * s
        npl_w = -(-npts_w // 128) * 128
        padw = lambda a: jnp.pad(a, ((0, 0), (0, npl_w - npts_w)))
        padl = lambda a: jnp.pad(a, ((0, 0), (0, p.npl - p.npts)))
        parts = []
        for pp in range(6):
            for i in range(n_yt):
                ys = slice(i * slab_ty, (i + 1) * slab_ty)
                hw0 = padw(qL_x[:, pp, ys, 0, :].reshape(3, npts_w))
                he0 = padw(qR_x[:, pp, ys, nel, :].reshape(3, npts_w))
                hs0 = padl(qL_y[:, pp, i * slab_ty].reshape(3, p.npts))
                hn0 = padl(qR_y[:, pp, (i + 1) * slab_ty].reshape(3, p.npts))
                parts.append(
                    jnp.stack(
                        [
                            _expand_halo(hw0[v : v + 1], he0[v : v + 1],
                                         hs0[v : v + 1], hn0[v : v + 1], econ64, f64)
                            for v in range(3)
                        ]
                    )
                )
        E0 = jnp.concatenate(parts, axis=1)
        u0 = np.asarray(q0_64[1:3], np.float64) / np.asarray(q0_64[0], np.float64)
        up = jnp.asarray(pack_field(u0, nel, s, p.g), f64)
        rp = jnp.asarray(pack_field(np.asarray(rhs0_64, np.float64), nel, s, p.g), f64)
        return jnp.asarray(jnp.concatenate([qp0, up, A0, E0, rp]), dtype)
    slabs = packed_slabs(qp0, con64, nel, s)
    hw, he, hs, hn = halo_from_slabs(*slabs, topology, conv64, nel, s)
    if p.mode == "panel":
        E0 = jnp.stack(
            [
                jnp.concatenate(
                    [
                        _expand_halo(
                            hw[pi, v : v + 1], he[pi, v : v + 1],
                            hs[pi, v : v + 1], hn[pi, v : v + 1], con64, f64,
                        )
                        for pi in range(6)
                    ]
                )
                for v in range(3)
            ]
        )
    else:
        E0 = jnp.stack(
            [_expand_halo(hw[:, v], he[:, v], hs[:, v], hn[:, v], con64, f64) for v in range(3)]
        )
    u0 = np.asarray(q0_64[1:3], np.float64) / np.asarray(q0_64[0], np.float64)
    up = jnp.asarray(pack_field(u0, nel, s, p.g), f64)
    rp = jnp.asarray(pack_field(np.asarray(rhs0_64, np.float64), nel, s, p.g), f64)
    planes = jnp.concatenate([qp0, up, A0, E0, rp])
    return jnp.asarray(planes, dtype)


# ---------------------------------------------------------------------------
# Kernel math (pure jnp over VMEM values; roll is pltpu.roll in-kernel)


def _masks(p, nrows: int):
    """Slot masks on a (nrows, 128) block; nrows = prows ("panel" mode) or
    6*prows ("whole" mode — panel-local row indices via mod, and the rolls
    that wrap across panel boundaries only land in halo-patched slots)."""
    s, T, rpr, prows = p.s, p.T, p.rpr, p.prows
    shape = (nrows, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    prow = jax.lax.rem(row, jnp.int32(prows))
    is_x = lane < 64
    in_x = is_x & (lane < T)
    in_y = (~is_x) & (lane < 64 + T)
    # Face parity must be computed on HALF-relative lanes: the y half
    # starts at lane 64, which is a multiple of 2s only for s in {2, 4}.
    lrel = jnp.where(is_x, lane, lane - 64)
    h1 = jax.lax.rem(lrel, jnp.int32(2 * s)) < s
    rmod = jax.lax.rem(row, jnp.int32(rpr))
    west_slot = in_x & (lane < s) & (rmod == 0)
    east_slot = in_x & (lane >= T - s) & (lane < T) & (rmod == rpr - 1)
    south_slot = in_y & h1 & (prow < rpr)
    north_slot = in_y & (~h1) & (prow >= prows - rpr)
    return types.SimpleNamespace(
        s=s, T=T, rpr=rpr, prows=prows, total=nrows, lane=lane, is_x=is_x, h1=h1,
        west_slot=west_slot, south_slot=south_slot,
        edge_h2=east_slot | north_slot,
    )


def _expand_halo(hw, he, hs, hn, con: GenConstants, dtype):
    """Flat panel-edge halo rows (each (P, npl), P = panels in the block)
    -> one (B, 128) array with the west/south values in their qL slots and
    east/north in the h2 slots, via one-hot GEMMs (layout-safe everywhere;
    see module docstring). The four row placements run as ONE stacked GEMM
    (the placement matrices dominate the expansion's MXU cost: each is
    (B, ~nel) against the slot results' (~nel, 128))."""
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=dtype)
    bw = mm(con.p6w, hw)
    be = mm(con.p6w, he)
    bs = mm(con.p6s, hs)
    bn = mm(con.p6s, hn)
    slots = jnp.concatenate(
        [mm(con.m1w * bw, con.kw), mm(con.m1w * be, con.ke),
         mm(con.m1s * bs, con.ks), mm(con.m1s * bn, con.kn)]
    )
    pall = jnp.concatenate([con.pw, con.pe, con.ps, con.pn], axis=1)
    return mm(pall, slots)


def _assemble_LR(A, E, m, roll):
    """Interface L/R slot values from trace (A) and halo (E) planes —
    generic (s, g) twin of pallas_sw._assemble_LR."""
    _i = lambda v: np.int32(v)
    s, T, rpr, is_x, lane = m.s, m.T, m.rpr, m.is_x, m.lane

    def assemble_L(a, e):
        prev = roll(a, _i(1), 0)
        lx = jnp.where(lane < s, roll(prev, _i((128 - (T - s)) % 128), 1), roll(a, _i(s), 1))
        ly = roll(roll(a, _i((128 - s) % 128), 1), _i(rpr), 0)
        l = jnp.where(is_x, lx, ly)
        l = jnp.where(m.west_slot | m.south_slot, e, l)
        return jnp.where(m.edge_h2, a, l)

    L = tuple(assemble_L(a, e) for a, e in zip(A, E))
    R = tuple(jnp.where(m.edge_h2, e, a) for a, e in zip(A, E))
    return L, R


def _interface_flux(A, E, msg, mhd, mho, m, roll):
    """L/R interface assembly + AUSM Mach-splitting flux for both
    directions in one pass (reference rhs_sw.py:170-207); slot math is
    shared with the s=4 pipeline (pallas_sw._ausm_slots)."""
    from .pallas_sw import _ausm_slots

    L, R = _assemble_LR(A, E, m, roll)
    return _ausm_slots(L, R, msg, mhd, mho, m.is_x)


def _faces(fl, m, roll):
    """Per-element faces from per-interface fluxes (generic twin of
    pallas_sw._faces): h1 slots already hold the west/south flux; the
    east/north flux is the next element's west/south one, panel edges keep
    the boundary flux computed in their own h2 slot."""
    _i = lambda v: np.int32(v)
    s, T = m.s, m.T
    fnext = roll(fl, _i(m.total - 1), 0)
    shx = jnp.where(
        jax.lax.rem(m.lane, jnp.int32(64)) >= T - s,
        roll(fnext, _i(T - s), 1),
        roll(fl, _i((128 - s) % 128), 1),
    )
    shy = roll(roll(fl, _i(m.total - m.rpr), 0), _i(s), 1)
    fc = jnp.where(m.h1, fl, jnp.where(m.is_x, shx, shy))
    return jnp.where(m.edge_h2, fl, fc)


def _emit_slabs(o3, con: GenConstants, m, roll, dtype):
    """Edge slabs of a state for the next halo stage: one-hot row selection
    commutes with the extrapolation GEMM, so only the edge-element rows are
    extrapolated. Returns (we, ssl, nsl):
      we  (3, nelp, 128): row y = west trace at lanes [0, s), east at [s, 2s)
      ssl (3, rpad, 128): row r = flat south window at lanes [0, g*s)
      nsl (3, rpad, 128): same for north."""
    _i = lambda v: np.int32(v)
    s, T = m.s, m.T
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=dtype)
    nelp = con.lw.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nelp, 128), 1)
    wes, ss, ns = [], [], []
    for v in range(3):
        trw = mm(mm(con.lw, o3[v]), con.eexy)
        tre = mm(mm(con.le, o3[v]), con.eexy)
        east = roll(jnp.where((lane >= T - s) & (lane < T), tre, 0.0), _i((128 - (T - 2 * s)) % 128), 1)
        wes.append(jnp.where(lane < s, trw, 0.0) + east)
        ss.append(mm(mm(mm(con.sel_s, o3[v]), con.eexy), con.kcs))
        ns.append(mm(mm(mm(con.sel_n, o3[v]), con.eexy), con.kcn))
    return wes, ss, ns


def _panel_body(q3, hw, he, hs, hn, fields, gridrot_p, con: GenConstants, m, roll,
                x3=None, cdt=None, stage_a=None, stage_b=None, emit=False,
                base=None):
    """One panel of the spatial operator. hw/he/hs/hn: (3, npl) flat
    panel-edge halo rows of this panel (one per variable).

    ``base`` switches to the perturbation (base-state-split) form: q3 and
    the halos then carry the PERTURBATION, ``base`` is a dict of packed base
    planes ({"bq": (h0, hu10, hu20, u10, u20), "A0": base traces,
    "E0": expanded base halos, "rhs0": f64 base RHS}) and the output is the
    full RHS ``rhs0 + delta`` (or the RK stage combination of delta states,
    which matches the absolute combination whenever a + b = 1)."""
    from .pallas_sw import _ausm_delta_slots, _element_stage_pert

    dtype = q3[0].dtype
    mm = lambda a, b: jax.lax.dot(a, b, precision=_KP, preferred_element_type=dtype)
    A = tuple(mm(q3[v], con.eexy) for v in range(3))
    E = tuple(_expand_halo(hw[v], he[v], hs[v], hn[v], con, dtype) for v in range(3))
    if base is None:
        df = _element_stage(q3, fields, gridrot_p, con.dd)
        f = _interface_flux(A, E, con.m_sg, con.m_hd, con.m_ho, m, roll)
    else:
        df = _element_stage_pert(q3, base["bq"], fields, gridrot_p, con.dd)
        L0, R0 = _assemble_LR(base["A0"], base["E0"], m, roll)
        dL, dR = _assemble_LR(A, E, m, roll)
        f = _ausm_delta_slots(L0, R0, dL, dR, con.m_sg, con.m_hd, con.m_ho, m.is_x)
    invsg = fields[12]
    out = []
    for v in range(3):
        rhs_v = df[v] - invsg * mm(_faces(f[v], m, roll), con.wmat)
        if base is not None:
            rhs_v = rhs_v + base["rhs0"][v]
        if stage_a is not None:
            val = stage_b * q3[v] + cdt * rhs_v
            if x3 is not None:
                val = stage_a * x3[v] + val
        else:
            val = rhs_v
        out.append(val)
    if not emit:
        return out, None
    return out, _emit_slabs(out, con, m, roll, dtype)


# ---------------------------------------------------------------------------
# Pallas wrapper


_CON_FIELDS = [f for f in GenConstants._fields if f not in ("fields", "gridrot")]
_EMIT_FIELDS = ("lw", "le", "sel_s", "sel_n", "kcs", "kcn")


@functools.partial(
    jax.jit,
    static_argnames=("nel", "s", "stage_a", "stage_b", "emit_slabs", "interpret"),
)
def km_gen(
    qp, hw, he, hs, hn, con: GenConstants, nel: int, s: int,
    x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False, bp=None,
):
    """The whole generic SW spatial operator (+ optional RK stage
    combination ``stage_a*x + stage_b*qp + cdt*RHS(qp)``; with
    ``emit_slabs`` also the output state's edge slabs). qp: (3, rows, 128)
    packed; hw/he/hs/hn: (6, 3, npl) flat panel-edge halo rows
    (panel-major so the per-panel block keeps Mosaic-legal trailing dims).
    ``bp``: (14, rows, 128) packed base planes (build_base_planes) — when
    given, qp/halos carry the PERTURBATION and the kernel runs the
    base-state-split form (see _panel_body)."""
    p = plan(s, nel)
    rows, prows = p.rows, p.prows
    dtype = qp.dtype
    zero = np.int32(0)
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    with_base = bp is not None
    panel_mode = p.mode == "panel"
    nblk = prows if panel_mode else rows

    from jax.experimental.pallas import tpu as pltpu

    roll = pltpu.roll

    def kernel(*refs):
        m = _masks(p, nblk)  # iotas must be created inside the kernel
        it = iter(refs)
        q_ref = next(it)
        hw_ref, he_ref, hs_ref, hn_ref = (next(it) for _ in range(4))
        field_refs = tuple(next(it) for _ in range(13))
        gridrot_ref = next(it)
        con_refs = {name: next(it) for name in _CON_FIELDS}
        bp_ref = next(it) if with_base else None
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        o_ref = next(it)
        if emit_slabs:
            we_ref, ss_ref, ns_ref = next(it), next(it), next(it)

        cblk = GenConstants(
            fields=tuple(r[...] for r in field_refs),
            gridrot=None,
            **{name: con_refs[name][...] for name in _CON_FIELDS},
        )
        if panel_mode:
            halo = lambda r: tuple(r[...][0, v : v + 1] for v in range(3))  # (1, npl) per var
        else:
            halo = lambda r: tuple(r[...][:, v] for v in range(3))  # (6, npl) per var
        base = None
        if with_base:
            base = {
                "bq": tuple(bp_ref[k] for k in range(5)),
                "A0": tuple(bp_ref[5 + v] for v in range(3)),
                "E0": tuple(bp_ref[8 + v] for v in range(3)),
                "rhs0": tuple(bp_ref[11 + v] for v in range(3)),
            }
        out, slabs = _panel_body(
            tuple(q_ref[v] for v in range(3)),
            halo(hw_ref), halo(he_ref), halo(hs_ref), halo(hn_ref),
            cblk.fields, gridrot_ref[...], cblk, m, roll,
            x3=(tuple(x_ref[v] for v in range(3)) if with_x else None),
            cdt=(cdt_ref[0, 0] if with_stage else None),
            stage_a=stage_a, stage_b=stage_b, emit=emit_slabs,
            base=base,
        )
        for v in range(3):
            o_ref[v] = out[v]
        if emit_slabs:
            wes, ss, ns = slabs
            for v in range(3):
                we_ref[v] = wes[v]
                ss_ref[v] = ss[v]
                ns_ref[v] = ns[v]

    npl = p.npl
    if panel_mode:
        grid = (6,)
        q_spec = pl.BlockSpec((3, prows, 128), lambda i: (zero, i, zero))
        halo_spec = pl.BlockSpec((1, 3, npl), lambda i: (i, zero, zero))
        grot_spec = pl.BlockSpec((prows, 128), lambda i: (i, zero))
        full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(zero for _ in a.shape))
        we_spec = pl.BlockSpec((3, p.nelp, 128), lambda i: (zero, i, zero))
        sn_spec = pl.BlockSpec((3, p.rpad, 128), lambda i: (zero, i, zero))
    else:
        grid = None
        q_spec = halo_spec = grot_spec = we_spec = sn_spec = None
        full = lambda a: None

    args = [qp, hw, he, hs, hn, *con.fields, con.gridrot]
    args += [getattr(con, name) for name in _CON_FIELDS]
    in_specs = None
    if panel_mode:
        in_specs = [q_spec, halo_spec, halo_spec, halo_spec, halo_spec]
        in_specs += [full(f) for f in con.fields]
        in_specs += [grot_spec]
        in_specs += [full(getattr(con, name)) for name in _CON_FIELDS]
    if with_base:
        args.append(bp)
        if panel_mode:
            in_specs.append(pl.BlockSpec((14, prows, 128), lambda i: (zero, i, zero)))
    if with_x:
        args.append(x)
        if panel_mode:
            in_specs.append(q_spec)
    if with_stage:
        from jax.experimental.pallas import tpu as pltpu_mod

        args.append(jnp.asarray(cdt, dtype=dtype).reshape(1, 1))
        if panel_mode:
            in_specs.append(
                pl.BlockSpec((1, 1), lambda i: (zero, zero), memory_space=pltpu_mod.SMEM)
            )

    out_specs = [q_spec] if panel_mode else None
    out_shape = [jax.ShapeDtypeStruct((3, rows, 128), dtype)]
    if emit_slabs:
        out_shape += [
            jax.ShapeDtypeStruct((3, 6 * p.nelp, 128), dtype),
            jax.ShapeDtypeStruct((3, 6 * p.rpad, 128), dtype),
            jax.ShapeDtypeStruct((3, 6 * p.rpad, 128), dtype),
        ]
        if panel_mode:
            out_specs += [we_spec, sn_spec, sn_spec]

    kwargs = dict(out_shape=out_shape, interpret=interpret)
    if panel_mode:
        kwargs.update(grid=grid, in_specs=in_specs, out_specs=out_specs)
    if not interpret:
        # Large blocks (e.g. galewsky: 2048-row panels at s=7) exceed the
        # default 16 MB scoped-VMEM budget; v5e has 128 MB of VMEM.
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(kernel, **kwargs)(*args)
    return tuple(outs) if emit_slabs else outs[0]


# ---------------------------------------------------------------------------
# XLA glue: slab bootstrap + panel-edge halo exchange


def packed_slabs(qp, con: GenConstants, nel: int, s: int):
    """Edge slabs of a packed state, in XLA (bootstrap of the chained
    pipeline; edge-sized work only: one-hot row selections + small GEMMs)."""
    p = plan(s, nel)
    m = _masks(p, p.prows if p.mode == "panel" else p.rows)
    if p.mode == "whole":
        wes, ss, ns = _emit_slabs(tuple(qp[v] for v in range(3)), con, m, jnp.roll, qp.dtype)
        return jnp.stack(wes), jnp.stack(ss), jnp.stack(ns)
    per = [
        _emit_slabs(tuple(qp[v, i * p.prows : (i + 1) * p.prows] for v in range(3)),
                    con, m, jnp.roll, qp.dtype)
        for i in range(6)
    ]
    cat = lambda k: jnp.stack([jnp.concatenate([per[i][k][v] for i in range(6)]) for v in range(3)])
    return cat(0), cat(1), cat(2)


def halo_from_slabs(we, ssl, nsl, topology, conv, nel: int, s: int):
    """Slabs -> (hw, he, hs, hn) kernel inputs: pooled neighbour exchange
    with edge flips + the 2x2 contravariant momentum rotation
    (parallel/topology.py semantics; reference process_topology.py
    start_exchange_*). All arrays are edge-sized."""
    p = plan(s, nel)
    npts, npl, ws = p.npts, p.npl, p.ws
    wev = we.reshape(3, 6, p.nelp, 128)[:, :, : p.nel]
    west = wev[..., 0:s].reshape(3, 6, npts)
    east = wev[..., s : 2 * s].reshape(3, 6, npts)
    south = ssl.reshape(3, 6, p.rpad, 128)[:, :, : p.rpr, :ws].reshape(3, 6, npts)
    north = nsl.reshape(3, 6, p.rpad, 128)[:, :, : p.rpr, :ws].reshape(3, 6, npts)
    pool = jnp.stack([south, north, west, east], axis=1)  # (3, 4, 6, npts)

    ex = topology.exchange_pool(pool)
    b1 = conv[..., 0, 0] * ex[1] + conv[..., 0, 1] * ex[2]
    b2 = conv[..., 1, 0] * ex[1] + conv[..., 1, 1] * ex[2]
    halo = jnp.stack([ex[0], b1, b2])  # (3, 4, 6, npts)
    from ..parallel.topology import EAST, NORTH, SOUTH, WEST

    def fmt(side):  # -> (6, 3, npl) panel-major
        a = jnp.swapaxes(halo[:, side], 0, 1)
        return jnp.pad(a, ((0, 0), (0, 0), (0, npl - npts))) if npl > npts else a

    return fmt(WEST), fmt(EAST), fmt(SOUTH), fmt(NORTH)


@functools.partial(
    jax.jit,
    static_argnames=("nel", "s", "stage_a", "stage_b", "emit_slabs", "interpret"),
)
def km_tile(
    qp, hw, he, hs, hn, con: GenConstants, nel: int, s: int,
    x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False, bp=None,
):
    """Single-TILE mega kernel: the km_gen panel body as one whole-array
    pallas_call (no grid) over a tile-local packed state — the per-device
    kernel of the fused shard_map path (parallel/shard_map_sw_fused.py).

    qp: (3, prows, 128) packed tile (nel = elements per tile side);
    hw/he/hs/hn: (1, 3, npl) flat tile-edge halo rows; ``con``: tile-local
    GenConstants (fields/m_* sliced to THIS tile; gridrot in con.gridrot);
    ``bp``: optional (14, prows, 128) tile base planes (perturbation form).
    Same returns as km_gen."""
    p = plan(s, nel)
    prows = p.prows
    dtype = qp.dtype
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    with_base = bp is not None

    from jax.experimental.pallas import tpu as pltpu

    roll = pltpu.roll

    def kernel(*refs):
        m = _masks(p, prows)
        it = iter(refs)
        q_ref = next(it)
        hw_ref, he_ref, hs_ref, hn_ref = (next(it) for _ in range(4))
        field_refs = tuple(next(it) for _ in range(13))
        gridrot_ref = next(it)
        con_refs = {name: next(it) for name in _CON_FIELDS}
        bp_ref = next(it) if with_base else None
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        o_ref = next(it)
        if emit_slabs:
            we_ref, ss_ref, ns_ref = next(it), next(it), next(it)

        cblk = GenConstants(
            fields=tuple(r[...] for r in field_refs),
            gridrot=None,
            **{name: con_refs[name][...] for name in _CON_FIELDS},
        )
        halo = lambda r: tuple(r[...][0, v : v + 1] for v in range(3))
        base = None
        if with_base:
            base = {
                "bq": tuple(bp_ref[k] for k in range(5)),
                "A0": tuple(bp_ref[5 + v] for v in range(3)),
                "E0": tuple(bp_ref[8 + v] for v in range(3)),
                "rhs0": tuple(bp_ref[11 + v] for v in range(3)),
            }
        out, slabs = _panel_body(
            tuple(q_ref[v] for v in range(3)),
            halo(hw_ref), halo(he_ref), halo(hs_ref), halo(hn_ref),
            cblk.fields, gridrot_ref[...], cblk, m, roll,
            x3=(tuple(x_ref[v] for v in range(3)) if with_x else None),
            cdt=(cdt_ref[0, 0] if with_stage else None),
            stage_a=stage_a, stage_b=stage_b, emit=emit_slabs,
            base=base,
        )
        for v in range(3):
            o_ref[v] = out[v]
        if emit_slabs:
            wes, ss, ns = slabs
            for v in range(3):
                we_ref[v] = wes[v]
                ss_ref[v] = ss[v]
                ns_ref[v] = ns[v]

    args = [qp, hw, he, hs, hn, *con.fields, con.gridrot]
    args += [getattr(con, name) for name in _CON_FIELDS]
    if with_base:
        args.append(bp)
    if with_x:
        args.append(x)
    if with_stage:
        args.append(jnp.asarray(cdt, dtype=dtype).reshape(1, 1))
    out_shape = [jax.ShapeDtypeStruct((3, prows, 128), dtype)]
    if emit_slabs:
        out_shape += [
            jax.ShapeDtypeStruct((3, p.nelp, 128), dtype),
            jax.ShapeDtypeStruct((3, p.rpad, 128), dtype),
            jax.ShapeDtypeStruct((3, p.rpad, 128), dtype),
        ]
    kwargs = dict(out_shape=out_shape, interpret=interpret)
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(kernel, **kwargs)(*args)
    return tuple(outs) if emit_slabs else outs[0]


# ---------------------------------------------------------------------------
# Y-slab mode: one kernel block per (y-slab, panel). Each slab is a
# (ty x nel)-element mini-panel; interior slab boundaries compute their
# interface flux in the north h2 / south slots with the neighbouring slab's
# boundary trace supplied as a halo by the edge-sized XLA glue — the same
# pattern the 3D pipeline uses (pallas_euler3d.py y-slab coupling). Both
# sides evaluate AUSM on identical (L, R, metric) triples, so the shared
# interface flux is bit-identical and conservation is preserved.


class SlabExtras(NamedTuple):
    """Slab-local halo-expansion + slab-emission factors (arrays only — a
    jit-compatible pytree; sizes are recomputed from (s, nel, ty))."""

    p6w: jnp.ndarray
    m1w: jnp.ndarray
    kw: jnp.ndarray
    ke: jnp.ndarray
    pw: jnp.ndarray
    pe: jnp.ndarray
    ps: jnp.ndarray
    pn: jnp.ndarray
    lw: jnp.ndarray
    le: jnp.ndarray
    sel_s: jnp.ndarray
    sel_n: jnp.ndarray


def _slab_extras(p, ty: int, dtype) -> SlabExtras:
    """Slab-local halo-expansion + slab-emission factors (the slab twins of
    build_constants' m1w/pw/../sel_n; west/east flat windows are ty*s long,
    south/north keep the full panel window npl)."""
    s, g, T, rpr = p.s, p.g, p.T, p.rpr
    prows_s = ty * rpr
    npts_w = ty * s
    npl_w = -(-npts_w // 128) * 128
    typad = -(-ty // 8) * 8

    m1w = np.zeros((ty, npl_w))
    kw = np.zeros((npl_w, 128))
    ke = np.zeros((npl_w, 128))
    for y in range(ty):
        m1w[y, y * s : (y + 1) * s] = 1.0
    for j in range(npts_w):
        kw[j, j % s] = 1.0
        ke[j, T - s + (j % s)] = 1.0
    pw = np.zeros((prows_s, ty))
    pe = np.zeros((prows_s, ty))
    for y in range(ty):
        pw[y * rpr, y] = 1.0
        pe[y * rpr + rpr - 1, y] = 1.0
    ps = np.zeros((prows_s, rpr))
    pn = np.zeros((prows_s, rpr))
    for r in range(rpr):
        ps[r, r] = 1.0
        pn[prows_s - rpr + r, r] = 1.0
    lw = np.zeros((typad, prows_s))
    le = np.zeros((typad, prows_s))
    for y in range(ty):
        lw[y, y * rpr] = 1.0
        le[y, y * rpr + rpr - 1] = 1.0
    sel_s = np.zeros((p.rpad, prows_s))
    sel_n = np.zeros((p.rpad, prows_s))
    for r in range(rpr):
        sel_s[r, r] = 1.0
        sel_n[r, prows_s - rpr + r] = 1.0
    c = lambda a: jnp.asarray(a, dtype)
    return SlabExtras(
        p6w=c(np.ones((ty, 1))),
        m1w=c(m1w), kw=c(kw), ke=c(ke),
        pw=c(pw), pe=c(pe), ps=c(ps), pn=c(pn),
        lw=c(lw), le=c(le), sel_s=c(sel_s), sel_n=c(sel_n),
    )


def _slab_con(con: GenConstants, ex, fields, gridrot_blk, m_sg, m_hd, m_ho):
    """GenConstants block for _panel_body with slab-local factors."""
    return GenConstants(
        fields=fields, gridrot=gridrot_blk,
        eexy=con.eexy, dd=con.dd, wmat=con.wmat,
        m_sg=m_sg, m_hd=m_hd, m_ho=m_ho,
        p6w=ex.p6w, p6s=con.p6s, m1w=ex.m1w, m1s=con.m1s,
        kw=ex.kw, ke=ex.ke, ks=con.ks, kn=con.kn,
        pw=ex.pw, pe=ex.pe, ps=ex.ps, pn=ex.pn,
        lw=ex.lw, le=ex.le, sel_s=ex.sel_s, sel_n=ex.sel_n,
        kcs=con.kcs, kcn=con.kcn,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nel", "s", "ty", "stage_a", "stage_b", "emit_slabs", "interpret"),
)
def km_slab(
    qp, hw, he, hs, hn, con: GenConstants, ex, nel: int, s: int, ty: int,
    x=None, cdt=None, stage_a=None, stage_b=None,
    emit_slabs: bool = False, interpret: bool = False, bp=None,
):
    """The generic SW spatial operator with grid (n_ytiles, 6) — one block
    per (y-slab, panel). qp: (3, rows, 128) packed (global row order, slabs
    contiguous); hw/he: (6*n_ytiles, 3, npl_w) per-slab west/east halo
    windows; hs/hn: (6*n_ytiles, 3, npl) per-slab south/north halos (outer
    slabs: the panel exchange; inner boundaries: the neighbour slab's
    boundary trace). ``con`` from build_constants(..., slab_ty=ty);
    ``ex`` from _slab_extras. Same returns as km_gen (emitted ss/ns are
    per-slab: (3, 6*n_ytiles*rpad, 128), we (3, 6*n_ytiles*typad, 128))."""
    p = plan(s, nel)
    rpr, prows = p.rpr, p.prows
    n_ytiles = nel // ty
    prows_s = ty * rpr
    rows = p.rows
    npl_w = -(-(ty * s) // 128) * 128
    typad = -(-ty // 8) * 8
    dtype = qp.dtype
    zero = np.int32(0)
    with_stage = stage_a is not None
    with_x = with_stage and (stage_a != 0.0)
    with_base = bp is not None
    ps = types.SimpleNamespace(s=s, T=p.T, rpr=rpr, prows=prows_s)

    from jax.experimental.pallas import tpu as pltpu

    roll = pltpu.roll
    _EX_FIELDS = ("p6w", "m1w", "kw", "ke", "pw", "pe", "ps", "pn",
                  "lw", "le", "sel_s", "sel_n")

    def kernel(*refs):
        m = _masks(ps, prows_s)
        it = iter(refs)
        q_ref = next(it)
        hw_ref, he_ref, hs_ref, hn_ref = (next(it) for _ in range(4))
        field_refs = tuple(next(it) for _ in range(13))
        gridrot_ref = next(it)
        con_refs = {name: next(it) for name in _CON_FIELDS}
        ex_refs = {name: next(it) for name in _EX_FIELDS}
        bp_ref = next(it) if with_base else None
        x_ref = next(it) if with_x else None
        cdt_ref = next(it) if with_stage else None
        o_ref = next(it)
        if emit_slabs:
            we_ref, ss_ref, ns_ref = next(it), next(it), next(it)

        cv = {name: con_refs[name][...] for name in _CON_FIELDS}
        ev = {name: ex_refs[name][...] for name in _EX_FIELDS}
        cblk = GenConstants(
            fields=tuple(r[...] for r in field_refs), gridrot=None,
            **{**cv, **ev},
        )
        halo = lambda r: tuple(r[...][0, v : v + 1] for v in range(3))
        base = None
        if with_base:
            base = {
                "bq": tuple(bp_ref[k] for k in range(5)),
                "A0": tuple(bp_ref[5 + v] for v in range(3)),
                "E0": tuple(bp_ref[8 + v] for v in range(3)),
                "rhs0": tuple(bp_ref[11 + v] for v in range(3)),
            }
        out, slabs = _panel_body(
            tuple(q_ref[v] for v in range(3)),
            halo(hw_ref), halo(he_ref), halo(hs_ref), halo(hn_ref),
            cblk.fields, gridrot_ref[...], cblk, m, roll,
            x3=(tuple(x_ref[v] for v in range(3)) if with_x else None),
            cdt=(cdt_ref[0, 0] if with_stage else None),
            stage_a=stage_a, stage_b=stage_b, emit=emit_slabs,
            base=base,
        )
        for v in range(3):
            o_ref[v] = out[v]
        if emit_slabs:
            wes, ss, ns = slabs
            for v in range(3):
                we_ref[v] = wes[v]
                ss_ref[v] = ss[v]
                ns_ref[v] = ns[v]

    grid = (n_ytiles, 6)
    q_spec = pl.BlockSpec((3, prows_s, 128), lambda i, pp: (zero, pp * n_ytiles + i, zero))
    hw_spec = pl.BlockSpec((1, 3, npl_w), lambda i, pp: (pp * n_ytiles + i, zero, zero))
    hs_spec = pl.BlockSpec((1, 3, p.npl), lambda i, pp: (pp * n_ytiles + i, zero, zero))
    pan = pl.BlockSpec((prows_s, 128), lambda i, pp: (i, zero))
    grot_spec = pl.BlockSpec((prows_s, 128), lambda i, pp: (pp * n_ytiles + i, zero))
    full = lambda a: pl.BlockSpec(a.shape, lambda i, pp: tuple(zero for _ in a.shape))

    args = [qp, hw, he, hs, hn, *con.fields, con.gridrot]
    in_specs = [q_spec, hw_spec, hw_spec, hs_spec, hs_spec]
    in_specs += [pan for _ in con.fields] + [grot_spec]
    for name in _CON_FIELDS:
        a = getattr(con, name)
        args.append(a)
        in_specs.append(pan if name in ("m_sg", "m_hd", "m_ho") else full(a))
    for name in ("p6w", "m1w", "kw", "ke", "pw", "pe", "ps", "pn",
                 "lw", "le", "sel_s", "sel_n"):
        a = getattr(ex, name)
        args.append(a)
        in_specs.append(full(a))
    if with_base:
        args.append(bp)
        in_specs.append(pl.BlockSpec((14, prows_s, 128), lambda i, pp: (zero, pp * n_ytiles + i, zero)))
    if with_x:
        args.append(x)
        in_specs.append(q_spec)
    if with_stage:
        from jax.experimental.pallas import tpu as pltpu_mod

        args.append(jnp.asarray(cdt, dtype=dtype).reshape(1, 1))
        in_specs.append(pl.BlockSpec((1, 1), lambda i, pp: (zero, zero), memory_space=pltpu_mod.SMEM))

    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct((3, rows, 128), dtype)]
    if emit_slabs:
        out_specs += [
            pl.BlockSpec((3, typad, 128), lambda i, pp: (zero, pp * n_ytiles + i, zero)),
            pl.BlockSpec((3, p.rpad, 128), lambda i, pp: (zero, pp * n_ytiles + i, zero)),
            pl.BlockSpec((3, p.rpad, 128), lambda i, pp: (zero, pp * n_ytiles + i, zero)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((3, 6 * n_ytiles * typad, 128), dtype),
            jax.ShapeDtypeStruct((3, 6 * n_ytiles * p.rpad, 128), dtype),
            jax.ShapeDtypeStruct((3, 6 * n_ytiles * p.rpad, 128), dtype),
        ]
    kwargs = dict(
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        interpret=interpret,
    )
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(kernel, **kwargs)(*args)
    return tuple(outs) if emit_slabs else outs[0]


def slab_packed_slabs(qp, con: GenConstants, ex, nel: int, s: int, ty: int):
    """Per-slab edge slabs of a packed state, in XLA (bootstrap)."""
    p = plan(s, nel)
    rpr = p.rpr
    n_ytiles = nel // ty
    prows_s = ty * rpr
    ps = types.SimpleNamespace(s=s, T=p.T, rpr=rpr, prows=prows_s)
    m = _masks(ps, prows_s)
    econ = _slab_con(con, ex, None, None, None, None, None)
    per = []
    for blk in range(6 * n_ytiles):
        o3 = tuple(qp[v, blk * prows_s : (blk + 1) * prows_s] for v in range(3))
        per.append(_emit_slabs(o3, econ, m, jnp.roll, qp.dtype))
    cat = lambda k: jnp.stack(
        [jnp.concatenate([per[b][k][v] for b in range(6 * n_ytiles)]) for v in range(3)]
    )
    return cat(0), cat(1), cat(2)


def slab_halo_from_slabs(we, ssl, nsl, topology, conv, nel: int, s: int, ty: int):
    """Per-slab halos from per-slab edge slabs: panel edges go through the
    pooled neighbour exchange (+ flips and the 2x2 momentum rotation);
    interior slab boundaries take the adjacent slab's boundary trace
    directly. All arrays are edge-sized."""
    p = plan(s, nel)
    rpr, ws, npts, npl = p.rpr, p.ws, p.npts, p.npl
    n_ytiles = nel // ty
    npts_w = ty * s
    npl_w = -(-npts_w // 128) * 128
    typad = -(-ty // 8) * 8

    wev = we.reshape(3, 6, n_ytiles, typad, 128)[:, :, :, :ty]
    west = wev[..., 0:s].reshape(3, 6, npts)
    east = wev[..., s : 2 * s].reshape(3, 6, npts)
    ssv = ssl.reshape(3, 6, n_ytiles, p.rpad, 128)[:, :, :, :rpr, :ws]
    nsv = nsl.reshape(3, 6, n_ytiles, p.rpad, 128)[:, :, :, :rpr, :ws]
    south = ssv[:, :, 0].reshape(3, 6, npts)
    north = nsv[:, :, -1].reshape(3, 6, npts)
    pool = jnp.stack([south, north, west, east], axis=1)

    ex = topology.exchange_pool(pool)
    b1 = conv[..., 0, 0] * ex[1] + conv[..., 0, 1] * ex[2]
    b2 = conv[..., 1, 0] * ex[1] + conv[..., 1, 1] * ex[2]
    halo = jnp.stack([ex[0], b1, b2])  # (3, 4, 6, npts)
    from ..parallel.topology import EAST, NORTH, SOUTH, WEST

    def fmt_we(side):  # exchanged west/east -> per-slab windows
        a = halo[:, side].reshape(3, 6, n_ytiles, npts_w)
        a = jnp.moveaxis(a, (1, 2), (0, 1)).reshape(6 * n_ytiles, 3, npts_w)
        return jnp.pad(a, ((0, 0), (0, 0), (0, npl_w - npts_w))) if npl_w > npts_w else a

    padl = (
        (lambda a: jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, npl - npts)]))
        if npl > npts else (lambda a: a)
    )

    def fmt_sn(side, inner):
        # inner: (3, 6, n_ytiles, rpr, ws) neighbour-slab boundary traces;
        # slot 0 (hs) / slot n-1 (hn) takes the panel exchange instead.
        edge = padl(halo[:, side])  # (3, 6, npl)
        inn = padl(inner.reshape(3, 6, n_ytiles, npts))
        if side == SOUTH:
            stack = jnp.concatenate([edge[:, :, None], inn[:, :, :-1]], axis=2)
        else:
            stack = jnp.concatenate([inn[:, :, 1:], edge[:, :, None]], axis=2)
        return jnp.moveaxis(stack, (1, 2), (0, 1)).reshape(6 * n_ytiles, 3, npl)

    return (
        fmt_we(WEST), fmt_we(EAST),
        fmt_sn(SOUTH, nsv),  # slab i's south halo = slab i-1's north trace
        fmt_sn(NORTH, ssv),  # slab i's north halo = slab i+1's south trace
    )


def make_pipeline(geom, ops, metric, topology, dtype=jnp.float32, perturbation=None,
                  force_slab: bool = False):
    """Build the generic packed-pipeline API (same surface as the s=4
    module's wrappers in models/shallow_water.py): returns a namespace with
    packed / packed_stage / packed_stage_chained / packed_slabs / pack /
    unpack, or None if the shape is unsupported.

    ``perturbation``: optional (q0_64, rhs0_64) pair switching every kernel
    to the base-state-split form. Packed states then carry the PERTURBATION
    (pack/unpack convert the perturbation, not the absolute state — callers
    add/subtract the base); packed() returns the FULL RHS (rhs0 + delta).

    Panels above MAX_PANEL_ROWS_TPU rows (galewsky-class resolutions) run
    the Y-SLAB decomposition (km_slab) on TPU; ``force_slab`` selects it
    regardless of size (tests)."""
    s = ops.num_solpts
    nel = geom.num_elements
    if not supported(s, nel, dtype):
        return None
    p = plan(s, nel)
    conv = jnp.asarray(topology._conv_contra_all, dtype=dtype)
    interp = jax.default_backend() != "tpu"
    use_slab = force_slab or (
        jax.default_backend() == "tpu" and p.prows > MAX_PANEL_ROWS_TPU
    )
    if use_slab:
        sp = slab_plan(s, nel)
        if sp is None:
            return None
        ty, _n_yt = sp
        con = build_constants(ops, metric, nel, s, dtype=dtype,
                              single_block=True, slab_ty=ty)
        ex = _slab_extras(p, ty, dtype)
        bp = None
        if perturbation is not None:
            q0_64, rhs0_64 = perturbation
            bp = build_base_planes(ops, metric, topology, q0_64, rhs0_64, nel, s,
                                   dtype, slab_ty=ty, geom=geom)

        def _slabs(qp):
            return slab_packed_slabs(qp, con, ex, nel, s, ty)

        def _halo(slabs):
            return slab_halo_from_slabs(*slabs, topology, conv, nel, s, ty)

        def _km(qp, halo, **kw):
            return km_slab(qp, *halo, con, ex, nel, s, ty, interpret=interp,
                           bp=bp, **kw)
    else:
        con = build_constants(ops, metric, nel, s, dtype=dtype)
        bp = None
        if perturbation is not None:
            q0_64, rhs0_64 = perturbation
            bp = build_base_planes(ops, metric, topology, q0_64, rhs0_64, nel, s, dtype)

        def _slabs(qp):
            return packed_slabs(qp, con, nel, s)

        def _halo(slabs):
            return halo_from_slabs(*slabs, topology, conv, nel, s)

        def _km(qp, halo, **kw):
            return km_gen(qp, *halo, con, nel, s, interpret=interp, bp=bp, **kw)

    def rhs_packed(qp):
        return _km(qp, _halo(_slabs(qp)))

    def packed_stage(x, y, a: float, b: float, cdt):
        return _km(y, _halo(_slabs(y)), x=x, cdt=cdt, stage_a=float(a), stage_b=float(b))

    def packed_stage_chained(x, y, slabs, a: float, b: float, cdt):
        o, *oslabs = _km(
            y, _halo(slabs), x=x, cdt=cdt, stage_a=float(a), stage_b=float(b),
            emit_slabs=True,
        )
        return o, tuple(oslabs)

    pack = (
        (lambda q: pack_state(q, nel, s, p.g))
        if perturbation is None
        else (lambda dq: pack_delta(dq, nel, s, p.g))
    )
    return types.SimpleNamespace(
        plan=p,
        packed=rhs_packed,
        packed_stage=packed_stage,
        packed_stage_chained=packed_stage_chained,
        packed_slabs=_slabs,
        pack=pack,
        unpack=lambda qp: unpack_state(qp, nel, s, p.g),
    )
