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
