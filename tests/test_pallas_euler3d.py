"""Parity of the fused 3D Euler pipeline (ops/pallas_euler3d.py) against the
XLA reference path (models/euler_cubesphere.py), which itself matches the
upstream reference to ~1e-12 (tests/test_euler3d.py). The kernel body runs
here in pure-jnp mode (jnp.roll) and in pallas interpret mode — identical
semantics to the Mosaic compile on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wxfactory_tpu.geometry.cubed_sphere_3d import make_cubed_sphere_3d
from wxfactory_tpu.geometry.metric3d import make_metric_3d
from wxfactory_tpu.models.euler_cubesphere import make_rhs_euler_cubesphere
from wxfactory_tpu.ops import pallas_euler3d as pe3
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.parallel.topology import CubedSphereTopology
from wxfactory_tpu.testcases.dcmip import dcmip_gravity_wave

NELH, NELV, S = 4, 4, 4
ZTOP = 10000.0


def _setup(rotating=False):
    from conftest import cs3d_setup

    geom, ops, topo, metric = cs3d_setup(NELH, NELV, S, ZTOP, rotating=rotating)
    q = jnp.asarray(dcmip_gravity_wave(geom))
    rhs = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo)
    return geom, ops, topo, metric, q, rhs


def _setup_shape(nel_h, nel_v, s):
    from conftest import cs3d_setup

    geom, ops, topo, metric = cs3d_setup(nel_h, nel_v, s, ZTOP)
    q0 = jnp.asarray(dcmip_gravity_wave(geom), jnp.float64)
    return geom, ops, topo, metric, q0


def test_pack_roundtrip():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((5, 6, NELV, NELH, NELH, 64))
    p = pe3.pack_rows(a, NELH, NELV)
    assert p.shape == (5, 6 * NELH * NELV * (NELH // 2), 128)
    b = np.asarray(pe3.unpack_rows_jnp(jnp.asarray(p), NELH, NELV))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ty", [pytest.param(NELH, marks=pytest.mark.slow), 2])
def test_km3_body_matches_xla(ty):
    geom, ops, topo, metric, q, rhs = _setup()
    ref = np.asarray(rhs(q))

    con = pe3.build_constants(ops, metric, NELH, NELV, dtype=jnp.float64)
    hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float64)
    qp = pe3.pack_rows_jnp(q, NELH, NELV)
    out = pe3.rhs_packed_pure(qp, con, topo, hops, NELH, NELV, ty)
    got = np.asarray(pe3.unpack_rows_jnp(out, NELH, NELV))

    scale = np.abs(ref).max(axis=(1, 2, 3, 4, 5), keepdims=True)
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-9)


def test_km3_body_matches_xla_rotating():
    # Rotating planet: the time-Christoffel (Coriolis) terms are nonzero and
    # panel-dependent; the kernel takes them as full-size fields.
    geom, ops, topo, metric, q, rhs = _setup(rotating=True)
    ref = np.asarray(rhs(q))

    con = pe3.build_constants(ops, metric, NELH, NELV, dtype=jnp.float64)
    assert con.tch is not None
    hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float64)
    qp = pe3.pack_rows_jnp(q, NELH, NELV)
    out = pe3.rhs_packed_pure(qp, con, topo, hops, NELH, NELV, 2)
    got = np.asarray(pe3.unpack_rows_jnp(out, NELH, NELV))

    scale = np.abs(ref).max(axis=(1, 2, 3, 4, 5), keepdims=True)
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-9)


@pytest.mark.parametrize("ty", [2])
def test_km3_fused_matches_pure(ty):
    # The pallas_call wrapper (interpret mode) must reproduce the pure-jnp
    # block driver exactly: same body, same block decomposition.
    geom, ops, topo, metric, q, rhs = _setup()
    con = pe3.build_constants(ops, metric, NELH, NELV, dtype=jnp.float64)
    hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float64)
    qp = pe3.pack_rows_jnp(q, NELH, NELV)

    want = np.asarray(pe3.rhs_packed_pure(qp, con, topo, hops, NELH, NELV, ty))
    hwe, hs, hn = pe3.edge_halo(qp, topo, hops, NELH, NELV, ty)
    got = np.asarray(
        pe3.km3_fused(qp, hwe, hs, hn, con, NELH, NELV, ty, interpret=True)
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=1e-12)


def test_km3_fused_stage_combination():
    # stage_a*x + stage_b*q + cdt*RHS(q) fused into the kernel epilogue.
    geom, ops, topo, metric, q, rhs = _setup()
    con = pe3.build_constants(ops, metric, NELH, NELV, dtype=jnp.float64)
    hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float64)
    qp = pe3.pack_rows_jnp(q, NELH, NELV)
    hwe, hs, hn = pe3.edge_halo(qp, topo, hops, NELH, NELV, 2)
    r = pe3.km3_fused(qp, hwe, hs, hn, con, NELH, NELV, 2, interpret=True)
    dt = jnp.asarray(1.7, qp.dtype)
    x = qp * 1.1
    got = pe3.km3_fused(
        qp, hwe, hs, hn, con, NELH, NELV, 2,
        x=x, cdt=dt, stage_a=0.25, stage_b=0.75, interpret=True,
    )
    want = 0.25 * x + 0.75 * qp + dt * r
    w = np.asarray(want)
    np.testing.assert_allclose(np.asarray(got) / np.abs(w).max(), w / np.abs(w).max(), atol=1e-12)


def test_packed_stage_chained_matches_unchained():
    # Chained stages: the mega kernel emits the output's edge slabs; the
    # rebuilt halo must equal the XLA extraction of the output state, so a
    # chained TVD-RK3 step reproduces the unchained one exactly.
    geom, ops, topo, metric, q, rhs = _setup()
    con = pe3.build_constants(ops, metric, NELH, NELV, dtype=jnp.float64)
    hops = pe3.build_halo_ops(ops, topo, dtype=jnp.float64)
    qp = pe3.pack_rows_jnp(q, NELH, NELV)
    ty = 2
    dt = jnp.asarray(0.04, qp.dtype)

    def unchained_stage(x, y, a, b, cdt):
        hwe, hs, hn = pe3.edge_halo(y, topo, hops, NELH, NELV, ty)
        return pe3.km3_fused(
            y, hwe, hs, hn, con, NELH, NELV, ty,
            x=x, cdt=cdt, stage_a=a, stage_b=b, interpret=True,
        )

    def chained_stage(x, y, slabs, a, b, cdt):
        o, we = pe3.km3_fused(
            y, *slabs, con, NELH, NELV, ty,
            x=x, cdt=cdt, stage_a=a, stage_b=b, emit_slabs=True, interpret=True,
        )
        return o, pe3.halo_from_slabs(we, o, topo, hops, NELH, NELV, ty)

    stages = [(0.0, 1.0, dt), (0.75, 0.25, 0.25 * dt), (1.0 / 3.0, 2.0 / 3.0, 2.0 / 3.0 * dt)]
    y_u = qp
    y_c, slabs = qp, pe3.edge_halo(qp, topo, hops, NELH, NELV, ty)
    for a, b, cdt in stages:
        y_u = unchained_stage(qp, y_u, a, b, cdt)
        y_c, slabs = chained_stage(qp, y_c, slabs, a, b, cdt)
    scale = np.abs(np.asarray(y_u)).max()
    np.testing.assert_allclose(
        np.asarray(y_c) / scale, np.asarray(y_u) / scale, atol=1e-13
    )
    # the emitted halo must match a fresh XLA extraction of the final state
    fresh = pe3.edge_halo(y_c, topo, hops, NELH, NELV, ty)
    for got, want in zip(slabs, fresh):
        w = np.asarray(want)
        np.testing.assert_allclose(np.asarray(got), w, atol=1e-13 * max(np.abs(w).max(), 1.0))


def test_balanced_offset_restores_base_state_rhs():
    # f32 cannot resolve the hydrostatic balance (pressure gradient vs
    # gravity differ at ~1e-9 relative); with base_state the kernel adds
    # C = RHS_f64(base) - K_f32(base) so the RHS at the base state matches
    # the f64 truth to f32-addition rounding instead of being off by ~1e4.
    geom, ops, topo, metric, q, rhs = _setup()
    truth = np.asarray(rhs(q))
    sc = np.abs(truth).max(axis=(1, 2, 3, 4, 5), keepdims=True)
    q32 = q.astype(jnp.float32)

    from wxfactory_tpu.models.euler_cubesphere import make_rhs_euler_cubesphere

    plain = make_rhs_euler_cubesphere(
        geom, ops, metric, topology=topo, dtype=jnp.float32, interior="pallas"
    )
    balanced = make_rhs_euler_cubesphere(
        geom, ops, metric, topology=topo, dtype=jnp.float32, interior="pallas",
        base_state=q,
    )
    assert hasattr(plain, "packed")
    err_plain = np.abs((np.asarray(plain(q32)) - truth) / sc).max()
    err_bal = np.abs((np.asarray(balanced(q32)) - truth) / sc).max()
    assert err_bal < 1e-2, err_bal
    assert err_bal < err_plain * 1e-3, (err_bal, err_plain)


@pytest.mark.parametrize("nel_h,nel_v,s", [
    (12, 3, 2), (6, 4, 3),
    pytest.param(4, 8, 2, marks=pytest.mark.slow),
    pytest.param(16, 4, 2, marks=pytest.mark.slow),
])
def test_generic_shapes_match_xla(nel_h, nel_v, s):
    """The generalized pipeline (num_solpts 2..5, g|nel_h row packings with
    NaN-safe lane padding) at the canonical dcmip31 discretization (12x12x3,
    s=2 — config/dcmip31.ini:58-65) and other non-s=4 shapes."""
    geom, ops, _topo, metric, q0s = _setup_shape(nel_h, nel_v, s)
    q = q0s
    assert pe3.supported(s, nel_h, nel_v, 5, jnp.float64)

    rhs_x = make_rhs_euler_cubesphere(geom, ops, metric, dtype=jnp.float64, interior="xla")
    rhs_p = make_rhs_euler_cubesphere(geom, ops, metric, dtype=jnp.float64, interior="pallas")
    assert hasattr(rhs_p, "pack")
    ref = np.asarray(rhs_x(q))
    out = np.asarray(rhs_p(q))
    scale = np.abs(ref).max(axis=(1, 2, 3, 4, 5), keepdims=True)
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-11)


def test_generic_chained_stage_s2():
    nel_h, nel_v, s = 12, 3, 2
    geom, ops, _topo, metric, q0s = _setup_shape(nel_h, nel_v, s)
    q = q0s
    rhs = make_rhs_euler_cubesphere(geom, ops, metric, dtype=jnp.float64, interior="pallas")
    qp = rhs.pack(q)
    dt = jnp.asarray(0.5, qp.dtype)

    q1 = rhs.packed_stage(qp, qp, 0.0, 1.0, dt)
    ref1 = qp + dt * rhs.packed(qp)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(ref1), rtol=1e-12, atol=1e-12)

    y, slabs = qp, rhs.packed_slabs(qp)
    y1, _ = rhs.packed_stage_chained(qp, y, slabs, 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(q1), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("nel_h,nel_v,s", [
    (4, 2, 3),
    pytest.param(12, 3, 2, marks=pytest.mark.slow),
    pytest.param(4, 8, 2, marks=pytest.mark.slow),
])
def test_tangent_kernel_matches_jvp(nel_h, nel_v, s):
    """Fused Jacobian action (tangent mode, _km3_body tangent=): the
    analytically linearized mega kernel must equal jax.jvp of the XLA
    perturbation core (the Krylov hot-loop matvec both formulations serve;
    reference hot loop: solvers/kiops.py:181-199 there) to roundoff. Covers
    the split (s=3 g=4; s=2 whole-panel g=12 + rowpad) and combined
    (4x8x2: g=8) trace layouts, pure-jnp AND pallas interpret mode."""
    geom, ops, topo, metric, q0 = _setup_shape(nel_h, nel_v, s)
    rng = np.random.default_rng(7)
    dq = 1e-4 * q0 * jnp.asarray(rng.standard_normal(q0.shape))
    v = (
        jnp.asarray(rng.standard_normal(q0.shape))
        * np.abs(np.asarray(q0)).max(axis=(1, 2, 3, 4, 5), keepdims=True) * 1e-3
    )

    rp_xla = make_rhs_euler_cubesphere(
        geom, ops, metric, topology=topo, dtype=jnp.float64, interior="xla",
        perturbation_base=q0,
    )
    want = np.asarray(jax.jvp(rp_xla.delta, (dq,), (v,))[1])
    scale = np.abs(want).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)

    # pure-jnp block driver
    con = pe3.build_constants(ops, metric, nel_h, nel_v, s, dtype=jnp.float64)
    hops = pe3.build_halo_ops(ops, topo, s, dtype=jnp.float64)
    _g, ty, _rp = pe3.grid_plan(s, nel_h, nel_v)
    rhs64 = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo,
                                      dtype=jnp.float64, interior="xla")
    pbase = pe3.build_pert_base(q0, rhs64(q0), topo, ops, nel_h, nel_v, ty, s, jnp.float64)
    dqp = pe3.pack_rows_jnp(dq, nel_h, nel_v, s)
    vp = pe3.pack_rows_jnp(v, nel_h, nel_v, s)
    out = pe3.rhs_packed_pure(dqp, con, topo, hops, nel_h, nel_v, ty, s,
                              pert=pbase, tangent_qp=vp)
    got = np.asarray(pe3.unpack_rows_jnp(out, nel_h, nel_v, s))
    assert np.abs((got - want) / scale).max() < 1e-11

    # pallas wrapper (interpret) through the factory entry point
    rp_k = make_rhs_euler_cubesphere(
        geom, ops, metric, topology=topo, dtype=jnp.float64, interior="pallas",
        perturbation_base=q0,
    )
    assert hasattr(rp_k, "jtv")
    got_k = np.asarray(rp_k.jtv(q0 + dq, v))
    assert np.abs((got_k - want) / scale).max() < 1e-11


def test_tangent_kernel_f32_accuracy():
    """The f32 fused Jacobian action must resolve the tangent to the same
    operating point the f32 perturbation-form jvp does (it replaces that
    matvec in the mixed-precision Krylov loop)."""
    nel_h, nel_v, s = 4, 2, 3
    geom, ops, _topo, metric, q0 = _setup_shape(nel_h, nel_v, s)
    rng = np.random.default_rng(11)
    dq = 1e-4 * q0 * jnp.asarray(rng.standard_normal(q0.shape))
    v = (
        jnp.asarray(rng.standard_normal(q0.shape))
        * np.abs(np.asarray(q0)).max(axis=(1, 2, 3, 4, 5), keepdims=True) * 1e-3
    )

    rp64 = make_rhs_euler_cubesphere(
        geom, ops, metric, dtype=jnp.float64, interior="xla", perturbation_base=q0
    )
    truth = np.asarray(jax.jvp(rp64.delta, (dq,), (v,))[1])
    scale = np.abs(truth).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)

    rp32 = make_rhs_euler_cubesphere(
        geom, ops, metric, dtype=jnp.float32, interior="pallas", perturbation_base=q0
    )
    got32 = np.asarray(rp32.jtv((q0 + dq).astype(jnp.float32), v.astype(jnp.float32)))
    err = np.abs((got32 - truth) / scale).max()
    # f32 jvp of the XLA pert core — the matvec this replaces
    ref32 = make_rhs_euler_cubesphere(
        geom, ops, metric, dtype=jnp.float32, interior="xla", perturbation_base=q0
    )
    base32 = np.asarray(
        jax.jvp(ref32.delta, (dq.astype(jnp.float32),), (v.astype(jnp.float32),))[1]
    )
    err_ref = np.abs((base32 - truth) / scale).max()
    assert err < 5e-5, err
    assert err < max(err_ref * 10, 1e-5), (err, err_ref)


@pytest.mark.parametrize("nel_h,nel_v,s", [
    (12, 3, 2),
    pytest.param(4, 2, 3, marks=pytest.mark.slow),
    pytest.param(16, 4, 2, marks=pytest.mark.slow),
])
def test_pert_kernel_matches_xla_pert(nel_h, nel_v, s):
    """Perturbation-form 3D mega kernel (base planes/halos + delta math) vs
    the jnp perturbation core: exact algebra in f64, and delta-state RK
    stages reproduce the absolute trajectory."""
    geom, ops, _topo, metric, q0 = _setup_shape(nel_h, nel_v, s)
    dq = 1e-4 * q0 * jnp.sin(jnp.arange(q0.size).reshape(q0.shape) * 0.37)

    rp_xla = make_rhs_euler_cubesphere(
        geom, ops, metric, dtype=jnp.float64, interior="xla", perturbation_base=q0
    )
    rp_k = make_rhs_euler_cubesphere(
        geom, ops, metric, dtype=jnp.float64, interior="pallas", perturbation_base=q0
    )
    assert hasattr(rp_k, "packed_stage_chained")
    a = np.asarray(rp_xla.delta(dq))
    b = np.asarray(rp_k.delta(dq))
    scale = np.abs(a).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)
    assert np.abs((b - a) / scale).max() < 1e-11

    qp = rp_k.pack(q0 + dq)
    dt = jnp.asarray(0.5, qp.dtype)
    y1 = rp_k.packed_stage(qp, qp, 0.0, 1.0, dt)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(qp + dt * rp_k.packed(qp)), rtol=1e-10, atol=1e-8
    )
    y, slabs = rp_k.packed_stage_chained(qp, qp, rp_k.packed_slabs(qp), 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1), rtol=1e-10, atol=1e-8)
    for got, want in zip(slabs, rp_k.packed_slabs(y)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-7)
    q_ref = (q0 + dq) + dt * rp_xla(q0 + dq)
    np.testing.assert_allclose(np.asarray(rp_k.unpack(y1)), np.asarray(q_ref), rtol=1e-9, atol=1e-6)


def test_s6_half_split_all_paths():
    """s=6 HALF-SPLIT layout (VERDICT r4 next #4: the fused matrix row the
    reference benchmarks at num_solpts 2..6, tests/rhs_benchmark/run.sh
    there): one element across H=2 rows (kz 0..2 | 3..5, 108 lanes), z
    operators as parity-paired GEMMs. Absolute, perturbation, TANGENT and
    chained-stage paths must all match the XLA operator (f64, interpret)."""
    geom, ops, topo, metric, q0 = _setup_shape(2, 2, 6)
    assert pe3.pick_h(6) == 2 and pe3.supported(6, 2, 2, 5, jnp.float64)
    rng = np.random.default_rng(7)
    dq = 1e-4 * q0 * jnp.asarray(rng.standard_normal(q0.shape))
    v = (
        jnp.asarray(rng.standard_normal(q0.shape))
        * np.abs(np.asarray(q0)).max(axis=(1, 2, 3, 4, 5), keepdims=True) * 1e-3
    )
    q = q0 * (1.0 + 0.05 * jnp.asarray(rng.standard_normal(q0.shape)))

    rhs_x = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo,
                                      dtype=jnp.float64, interior="xla")
    # absolute path at an unbalanced state (the balanced state's rho row is
    # cancellation-dominated; the f32 production path uses the pert form)
    ref = np.asarray(rhs_x(q))
    rhs_k = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo,
                                      dtype=jnp.float64, interior="pallas")
    assert hasattr(rhs_k, "packed")
    sc = np.abs(ref).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)
    assert np.abs((np.asarray(rhs_k(q)) - ref) / sc).max() < 1e-11

    rp_xla = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo,
                                       dtype=jnp.float64, interior="xla",
                                       perturbation_base=q0)
    rp_k = make_rhs_euler_cubesphere(geom, ops, metric, topology=topo,
                                     dtype=jnp.float64, interior="pallas",
                                     perturbation_base=q0)
    want = np.asarray(rp_xla.delta(dq))
    scp = np.abs(want).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)
    assert np.abs((np.asarray(rp_k.delta(dq)) - want) / scp).max() < 1e-11

    want_j = np.asarray(jax.jvp(rp_xla.delta, (dq,), (v,))[1])
    scj = np.abs(want_j).reshape(5, -1).max(axis=1).reshape(5, 1, 1, 1, 1, 1)
    assert np.abs((np.asarray(rp_k.jtv(q0 + dq, v)) - want_j) / scj).max() < 1e-11

    qp = rp_k.pack(q0 + dq)
    dt = jnp.asarray(0.5, qp.dtype)
    y1 = rp_k.packed_stage(qp, qp, 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(qp + dt * rp_k.packed(qp)),
                               rtol=1e-11, atol=1e-8)
    y2, slabs = rp_k.packed_stage_chained(qp, qp, rp_k.packed_slabs(qp), 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-11, atol=1e-8)
    for got, wnt in zip(slabs, rp_k.packed_slabs(y2)):
        w = np.asarray(wnt)
        np.testing.assert_allclose(np.asarray(got), w, atol=1e-9 * max(np.abs(w).max(), 1.0))
