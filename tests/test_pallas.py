"""Pallas fast-path parity: the fused two-kernel SW pipeline (K1 element-local
+ K2 interface stage, ops/pallas_sw.py) must match the XLA reference
semantics. Runs in pallas interpret mode on the CPU mesh; the same code
compiles via Mosaic on TPU (exercised by bench.py)."""

import jax.numpy as jnp
import numpy as np

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6


def _compare(nel, s, dtype, atol):
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)

    rhs_xla = make_rhs_shallow_water(geom, ops, metric, dtype=dtype, interior="xla")
    rhs_pallas = make_rhs_shallow_water(geom, ops, metric, dtype=dtype, interior="pallas")
    assert rhs_pallas is not rhs_xla

    ref = np.asarray(rhs_xla(q))
    out = np.asarray(rhs_pallas(q))
    scale = np.abs(ref).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(out / scale, ref / scale, atol=atol)


def test_sw_fused_pipeline_matches_xla_f64():
    # f64 end to end (interpret mode is pure JAX): only reduction/summation
    # order differs, so agreement is near machine precision. nel=8 keeps one
    # position-row per element-grid row; nel=16 exercises the row-carry
    # shifts inside K2.
    _compare(8, 4, jnp.float64, 1e-12)
    _compare(16, 4, jnp.float64, 1e-12)


def test_sw_fused_pipeline_matches_xla_f32():
    # In f32 the fused pipeline reorders the interface arithmetic, so it is
    # not bit-comparable to the f32 XLA path; instead require its error
    # against the f64 truth to be of the same magnitude as XLA-f32's own
    # roundoff (both are dominated by cancellation in the AUSM flux).
    nel, s = 8, 4
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q64 = jnp.asarray(williamson_case6(geom))
    q32 = q64.astype(jnp.float32)

    truth = np.asarray(make_rhs_shallow_water(geom, ops, metric, interior="xla")(q64))
    scale = np.abs(truth).max(axis=(1, 2, 3, 4), keepdims=True)
    xla32 = np.asarray(make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32, interior="xla")(q32))
    fused32 = np.asarray(
        make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32, interior="pallas")(q32)
    )
    err_xla = np.abs((xla32 - truth) / scale).max()
    err_fused = np.abs((fused32 - truth) / scale).max()
    assert err_fused < max(4.0 * err_xla, 1e-5), (err_fused, err_xla)


def test_unsupported_shapes_fall_back_to_xla():
    # num_solpts != 4 is outside the fused pipeline's specialization; the
    # builder must return the XLA implementation rather than fail.
    geom = make_cubed_sphere_2d(4, 3)
    ops = make_dfr_operators(3)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom))
    rhs = make_rhs_shallow_water(geom, ops, metric, interior="pallas")
    assert np.isfinite(np.asarray(rhs(q))).all()


def test_sw_fused_pipeline_kh_exchange_f64():
    # nel=32 -> npts=128: the fused halo-exchange kernel (kh_exchange) is
    # active; must still match the XLA reference exactly in f64.
    _compare(32, 4, jnp.float64, 1e-12)


def test_kh_exchange_matches_xla_exchange():
    from wxfactory_tpu.ops import pallas_sw
    from wxfactory_tpu.parallel.topology import CubedSphereTopology

    nel, s = 32, 4
    geom = make_cubed_sphere_2d(nel, s)
    topo = CubedSphereTopology(geom)
    npts = nel * s
    rng = np.random.default_rng(7)
    pool = jnp.asarray(rng.standard_normal((3, 4, 6, npts)))

    ex = topo.exchange_pool(pool)
    conv = jnp.asarray(topo._conv_contra_all, dtype=ex.dtype)
    b1 = conv[..., 0, 0] * ex[1] + conv[..., 0, 1] * ex[2]
    b2 = conv[..., 1, 0] * ex[1] + conv[..., 1, 1] * ex[2]
    ref = np.asarray(jnp.stack([ex[0], b1, b2]))

    hc = pallas_sw.build_halo_constants(topo, dtype=pool.dtype)
    halo_we, hs, hn = pallas_sw.kh_exchange(pool, hc, interpret=True)
    np.testing.assert_allclose(np.asarray(hs)[:, :, 0, :npts], ref[:, 0], atol=1e-13)
    np.testing.assert_allclose(np.asarray(hn)[:, :, 0, :npts], ref[:, 1], atol=1e-13)
    # hwe is panel-major (6, 3, 2, npts)
    np.testing.assert_allclose(np.moveaxis(np.asarray(halo_we)[:, :, 0], 0, 1), ref[:, 2], atol=1e-13)
    np.testing.assert_allclose(np.moveaxis(np.asarray(halo_we)[:, :, 1], 0, 1), ref[:, 3], atol=1e-13)


def test_packed_stage_matches_explicit_axpy():
    # The fused TVD-RK stage (a*x + b*y + cdt*RHS(y) inside K2) must equal
    # the explicit XLA combination of the same pieces.
    nel, s = 16, 4
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    rhs = make_rhs_shallow_water(geom, ops, metric, interior="pallas")
    q = rhs.pack(jnp.asarray(williamson_case6(geom)))
    dt = jnp.asarray(30.0, q.dtype)

    q1 = rhs.packed_stage(q, q, 0.0, 1.0, dt)
    ref1 = q + dt * rhs.packed(q)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(ref1), rtol=1e-13)

    q2 = rhs.packed_stage(q, q1, 0.75, 0.25, 0.25 * dt)
    ref2 = 0.75 * q + 0.25 * q1 + 0.25 * dt * rhs.packed(q1)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(ref2), rtol=1e-13)


def test_packed_stage_chained_matches_unchained():
    # The chained stage (edge slabs of the output state emitted by the
    # previous mega kernel instead of a separate KE pass) must reproduce the
    # unchained states and slabs over a full TVD-RK3 step. Tolerance is a few
    # ulp: emit_slabs changes the compiled program, so XLA may fuse the
    # (identical) arithmetic differently.
    nel, s = 16, 4
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    rhs = make_rhs_shallow_water(geom, ops, metric, interior="pallas")
    q = rhs.pack(jnp.asarray(williamson_case6(geom)))
    dt = jnp.asarray(30.0, q.dtype)

    coeffs = [(0.0, 1.0, dt), (0.75, 0.25, 0.25 * dt), (1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)]

    y_ref = q
    ys = []
    for a, b, cdt in coeffs:
        y_ref = rhs.packed_stage(q, y_ref, a, b, cdt)
        ys.append(y_ref)

    y, slabs = q, rhs.packed_slabs(q)
    for (a, b, cdt), expect in zip(coeffs, ys):
        y, slabs = rhs.packed_stage_chained(q, y, slabs, a, b, cdt)
        np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=1e-13)
    # The final emitted slabs must match a fresh KE pass on the final state.
    fresh = rhs.packed_slabs(y)
    for got, want in zip(slabs, fresh):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-13, atol=1e-9)


def test_whole_run_kernel_matches_iterated_stages():
    # KR (the whole-run kernel: every RK stage of every step in one
    # pallas_call with VMEM-resident registers/slabs/halos) must reproduce
    # nsteps iterations of the per-stage packed path.
    from wxfactory_tpu.ops.pallas_sw import tvdrk3_abc

    for nel, nsteps in ((32, 2), (64, 1)):
        s = 4
        geom = make_cubed_sphere_2d(nel, s)
        ops = make_dfr_operators(s)
        metric = make_metric_2d(geom)
        rhs = make_rhs_shallow_water(geom, ops, metric, interior="pallas")
        assert hasattr(rhs, "packed_run"), "KR gate should accept nel % 32 == 0"
        q = rhs.pack(jnp.asarray(williamson_case6(geom)))
        dt = jnp.asarray(30.0, q.dtype)

        got = rhs.packed_run(q, nsteps, tvdrk3_abc(dt))

        coeffs = [(0.0, 1.0, dt), (0.75, 0.25, 0.25 * dt), (1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)]
        want = q
        for _ in range(nsteps):
            y = want
            for a, b, cdt in coeffs:
                y = rhs.packed_stage(want, y, a, b, cdt)
            want = y
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-13, atol=1e-10)


def test_tvdrk3_uses_packed_chain_and_matches_plain():
    # The explicit integrators route through the fused packed pipeline when
    # the RHS exposes it; per-step results must match stepping the plain
    # callable, including cache reuse across back-to-back steps.
    from wxfactory_tpu.integrators import Tvdrk3

    nel, s = 8, 4
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom))

    rhs = make_rhs_shallow_water(geom, ops, metric, interior="pallas")
    integ = Tvdrk3(rhs)
    assert integ._packed is not None

    dt = 30.0
    qa = q
    for _ in range(3):
        qa = integ.step(qa, dt)

    def plain(q, dt):
        q1 = q + rhs(q) * dt
        q2 = 0.75 * q + 0.25 * q1 + 0.25 * rhs(q1) * dt
        return q / 3.0 + 2.0 / 3.0 * q2 + 2.0 / 3.0 * rhs(q2) * dt

    qb = q
    for _ in range(3):
        qb = plain(qb, dt)
    w = np.asarray(qb)
    scale = np.abs(w).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(np.asarray(qa) / scale, w / scale, atol=1e-11)

    # Chunked device stepping (steps_device = ONE lax.scan program over the
    # fused stage chain) reproduces the repeated-single-step trajectory.
    qc = Tvdrk3(rhs).steps_device(q, dt, 3)
    np.testing.assert_allclose(np.asarray(qc) / scale, np.asarray(qa) / scale, atol=1e-11)
