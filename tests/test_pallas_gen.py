"""Generic fused SW pipeline (ops/pallas_sw_gen.py) parity: num_solpts in
{2,3,5,6,7,8} and odd element counts must match the XLA reference semantics
in pallas interpret mode (f64). The same code compiles via Mosaic on TPU in
both block modes (exercised by bench.py's case6/galewsky entries)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops import pallas_sw_gen
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6

# (nel, s) -> expected (g, mode); case6 canonical is (10, 3), galewsky-like
# shapes use s=7 with g=2 panel blocks.
SHAPES = [
    (10, 3, "whole"),  # case6.ini discretization (num_solpts=3, nel=10)
    (12, 2, "whole"),
    (4, 6, "panel"),
    (8, 7, "panel"),
    (16, 3, "panel"),
    (6, 5, "whole"),
    (4, 8, "panel"),
]


def _build(nel, s, dtype=jnp.float64):
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom), dtype=dtype)
    return geom, ops, metric, q


@pytest.mark.parametrize("nel,s,mode", SHAPES)
def test_gen_pipeline_matches_xla_f64(nel, s, mode):
    geom, ops, metric, q = _build(nel, s)
    pln = pallas_sw_gen.plan(s, nel)
    assert pln is not None and pln.mode == mode

    rhs_xla = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="xla")
    rhs_gen = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="pallas")
    assert hasattr(rhs_gen, "pack"), "generic pipeline should be active"

    ref = np.asarray(rhs_xla(q))
    out = np.asarray(rhs_gen(q))
    scale = np.abs(ref).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-12)


def test_gen_stage_and_chained_match():
    nel, s = 10, 3
    geom, ops, metric, q = _build(nel, s)
    rhs = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="pallas")
    qp = rhs.pack(q)
    dt = jnp.asarray(30.0, qp.dtype)

    q1 = rhs.packed_stage(qp, qp, 0.0, 1.0, dt)
    ref1 = qp + dt * rhs.packed(qp)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(ref1), rtol=1e-12)

    coeffs = [(0.0, 1.0, dt), (0.75, 0.25, 0.25 * dt), (1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt)]
    y_ref = qp
    for a, b, cdt in coeffs:
        y_ref = rhs.packed_stage(qp, y_ref, a, b, cdt)
    y, slabs = qp, rhs.packed_slabs(qp)
    for a, b, cdt in coeffs:
        y, slabs = rhs.packed_stage_chained(qp, y, slabs, a, b, cdt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-12)
    # Emitted slabs of the final state must equal a fresh bootstrap.
    for got, want in zip(slabs, rhs.packed_slabs(y)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-8)


def test_gen_tvdrk3_steps_match_xla():
    from wxfactory_tpu.integrators import Tvdrk3

    nel, s = 10, 3
    geom, ops, metric, q = _build(nel, s)
    rhs_gen = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="pallas")
    rhs_xla = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="xla")
    integ = Tvdrk3(rhs_gen)
    assert integ._packed is not None  # chained packed path active

    qa = q
    for _ in range(3):
        qa = integ.step(qa, 30.0)

    def plain(qq, dtv):
        q1 = qq + rhs_xla(qq) * dtv
        q2 = 0.75 * qq + 0.25 * q1 + 0.25 * rhs_xla(q1) * dtv
        return qq / 3.0 + 2.0 / 3.0 * q2 + 2.0 / 3.0 * rhs_xla(q2) * dtv

    qb = q
    for _ in range(3):
        qb = plain(qb, 30.0)
    w = np.asarray(qb)
    scale = np.abs(w).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(np.asarray(qa) / scale, w / scale, atol=1e-11)


@pytest.mark.parametrize("nel,s", [(10, 3), (4, 6)])
def test_gen_pert_pipeline_matches_xla_delta(nel, s):
    """Perturbation-form kernel (base planes) vs the jnp perturbation form:
    exact algebra in f64 (both are term-level expansions of the same
    operator)."""
    geom, ops, metric, q = _build(nel, s)
    q0 = q
    dq = 1e-3 * q0 * jnp.sin(jnp.arange(q0.size).reshape(q0.shape) * 0.37)
    rp_xla = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float64, interior="xla", perturbation_base=q0
    )
    rp_gen = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float64, interior="pallas", perturbation_base=q0
    )
    assert hasattr(rp_gen, "packed_stage_chained")
    a = np.asarray(rp_xla.delta(dq))
    b = np.asarray(rp_gen.delta(dq))
    scale = np.abs(a).reshape(3, -1).max(axis=1).reshape(3, 1, 1, 1, 1)
    assert np.abs((b - a) / scale).max() < 1e-12


def test_s4_pert_pipeline_and_stages():
    """s=4-specialized pert kernel: f64 parity with the jnp pert form, and
    delta-state RK stages reproduce the absolute-state trajectory (valid for
    any a + b = 1 stage combination)."""
    nel, s = 8, 4
    geom, ops, metric, q0 = _build(nel, s)
    dq = 1e-3 * q0 * jnp.sin(jnp.arange(q0.size).reshape(q0.shape) * 0.37)
    rp_xla = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float64, interior="xla", perturbation_base=q0
    )
    rp = make_rhs_shallow_water(
        geom, ops, metric, dtype=jnp.float64, interior="pallas", perturbation_base=q0
    )
    a = np.asarray(rp_xla.delta(dq))
    b = np.asarray(rp.delta(dq))
    scale = np.abs(a).reshape(3, -1).max(axis=1).reshape(3, 1, 1, 1, 1)
    assert np.abs((b - a) / scale).max() < 1e-12

    dt = jnp.asarray(30.0, jnp.float64)
    qp = rp.pack(q0 + dq)
    y1 = rp.packed_stage(qp, qp, 0.0, 1.0, dt)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(qp + dt * rp.packed(qp)), rtol=1e-11, atol=1e-9
    )
    y, slabs = rp.packed_stage_chained(qp, qp, rp.packed_slabs(qp), 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1), rtol=1e-11, atol=1e-9)
    # unpacked delta trajectory == absolute Euler step
    q_ref = (q0 + dq) + dt * rp_xla(q0 + dq)
    np.testing.assert_allclose(np.asarray(rp.unpack(y1)), np.asarray(q_ref), rtol=1e-10, atol=1e-7)


def test_pack_pads_are_nan_safe():
    # Pad lanes carry h=1, momentum=0 and stay exactly (a+b)=1 through a
    # consistent stage combination, so no 0/0 can ever form.
    nel, s = 10, 3
    geom, ops, metric, q = _build(nel, s)
    pln = pallas_sw_gen.plan(s, nel)
    qp = pallas_sw_gen.pack_state(q, nel, s, pln.g)
    used = pln.g * s * s
    assert float(jnp.abs(qp[0, :, used:] - 1.0).max()) == 0.0
    assert float(jnp.abs(qp[1:, :, used:]).max()) == 0.0
    back = pallas_sw_gen.unpack_state(qp, nel, s, pln.g)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))


def test_plan_constraints():
    # g | nel, state fits, split trace layout fits; s=4 nel%8==0 stays on
    # the specialized module (model-level routing).
    p = pallas_sw_gen.plan(3, 10)
    assert (p.g, p.rpr, p.mode) == (10, 1, "whole")
    p = pallas_sw_gen.plan(7, 64)
    assert (p.g, p.mode) == (2, "panel")
    assert not pallas_sw_gen.supported(9, 10, jnp.float64)  # s > 8 gated off
    for s, nel in ((2, 12), (3, 16), (6, 4)):
        p = pallas_sw_gen.plan(s, nel)
        assert nel % p.g == 0 and p.g * s * s <= 128 and 2 * s * p.g <= 64


def test_slab_mode_matches_xla_and_pert():
    """Y-slab decomposition (km_slab, VERDICT r4 next #4): one kernel block
    per (y-slab, panel) with interior slab boundaries fluxed through the
    north-h2/south slot pattern — absolute, chained-stage AND perturbation
    forms must match the XLA operator exactly (f64, interpret)."""
    from wxfactory_tpu.parallel.topology import CubedSphereTopology

    nel, s = 8, 5
    geom, ops, metric, q = _build(nel, s)
    topo = CubedSphereTopology(geom)
    assert pallas_sw_gen.slab_plan(s, nel) == (4, 2)

    rhs_xla = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float64, interior="xla")
    ref = np.asarray(rhs_xla(q))
    scale = np.abs(ref).reshape(3, -1).max(axis=1).reshape(3, 1, 1, 1, 1)

    pipe = pallas_sw_gen.make_pipeline(geom, ops, metric, topo, dtype=jnp.float64,
                                       force_slab=True)
    qp = pipe.pack(q)
    got = np.asarray(pipe.unpack(pipe.packed(qp)))
    assert np.abs((got - ref.reshape(got.shape)) / scale).max() < 1e-10

    dt = jnp.asarray(13.7, qp.dtype)
    y1 = pipe.packed_stage(qp, qp, 0.0, 1.0, dt)
    ref1 = qp + dt * pipe.packed(qp)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref1), rtol=1e-11,
                               atol=1e-11 * float(jnp.abs(ref1).max()))
    y2, oslabs = pipe.packed_stage_chained(qp, qp, pipe.packed_slabs(qp), 0.0, 1.0, dt)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), rtol=1e-11,
                               atol=1e-11 * float(jnp.abs(y1).max()))
    for got_s, want_s in zip(oslabs, pipe.packed_slabs(y2)):
        w = np.asarray(want_s)
        np.testing.assert_allclose(np.asarray(got_s), w, atol=1e-9 * max(np.abs(w).max(), 1.0))

    rhs0_64 = rhs_xla(q)
    pipe_p = pallas_sw_gen.make_pipeline(geom, ops, metric, topo, dtype=jnp.float64,
                                         perturbation=(q, rhs0_64), force_slab=True)
    dq = 1e-4 * q * jnp.sin(jnp.arange(q.size).reshape(q.shape) * 0.37)
    got_p = np.asarray(pipe_p.unpack(pipe_p.packed(pipe_p.pack(dq))))
    ref_p = np.asarray(rhs_xla(q + dq))
    assert np.abs((got_p - ref_p.reshape(got_p.shape)) / scale).max() < 1e-9
