"""Pallas fast-path parity: the fused interior-stage kernel must match the
XLA reference semantics (runs in pallas interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
from wxfactory_tpu.models import make_rhs_shallow_water
from wxfactory_tpu.ops.dfr import make_dfr_operators
from wxfactory_tpu.testcases import williamson_case6


def test_sw_pallas_interior_matches_xla():
    nel, s = 6, 4
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom))

    rhs_xla = make_rhs_shallow_water(geom, ops, metric, interior="xla")
    rhs_pallas = make_rhs_shallow_water(geom, ops, metric, interior="pallas")

    ref = np.asarray(rhs_xla(q))
    out = np.asarray(rhs_pallas(q))
    # f64 end to end; only the summation order of the two directional GEMMs
    # differs (stacked [fx|fy] @ [Dx;Dy] contraction).
    scale = np.abs(ref).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-13)


def test_sw_pallas_interior_matches_xla_f32():
    nel, s = 4, 3
    geom = make_cubed_sphere_2d(nel, s)
    ops = make_dfr_operators(s)
    metric = make_metric_2d(geom)
    q = jnp.asarray(williamson_case6(geom), dtype=jnp.float32)

    rhs_xla = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32, interior="xla")
    rhs_pallas = make_rhs_shallow_water(geom, ops, metric, dtype=jnp.float32, interior="pallas")

    ref = np.asarray(rhs_xla(q))
    out = np.asarray(rhs_pallas(q))
    scale = np.abs(ref).max(axis=(1, 2, 3, 4), keepdims=True)
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-4)
