"""Post-step modal filters and sponge layer.

Capability parity with the reference's DFROperators filter machinery
(operators.py:101-138, 210-261): the exponential modal filter applied to
sqrt(g)*Q after each step (3D Kronecker lift of the 1D filter), and the
Rayleigh sponge damping the vertical momentum near the model top of the
Cartesian plane.
"""

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .dfr import make_filter_matrix


def make_expfilter_3d(num_solpts: int, strength: float, order: int, cutoff: float) -> np.ndarray:
    """3D-lifted exponential modal filter (operators.py:110-119)."""
    f1 = make_filter_matrix(num_solpts, strength, order, cutoff)
    s = num_solpts
    i2, i3 = np.eye(s), np.eye(s * s)
    fx = np.kron(i3, f1).T
    fy = np.kron(i2, np.kron(f1, i2)).T
    fz = np.kron(f1, i3).T
    return (fx @ fy) @ fz


def make_expfilter_2d(num_solpts: int, strength: float, order: int, cutoff: float) -> np.ndarray:
    f1 = make_filter_matrix(num_solpts, strength, order, cutoff)
    s = num_solpts
    ident = np.eye(s)
    return (np.kron(ident, f1).T) @ (np.kron(f1, ident).T)


def make_apply_filters(config, ops, metric, geom) -> Optional[Callable]:
    """Build the jittable post-step filter q -> q, or None if no filter is
    active (reference operators.apply_filters, simulation.py:148)."""
    fns = []

    if config.expfilter_apply:
        if config.equations == "euler" and config.grid_type == "cubed_sphere":
            filt = jnp.asarray(
                make_expfilter_3d(config.num_solpts, config.expfilter_strength,
                                  config.expfilter_order, config.expfilter_cutoff)
            )
            sqrt_g = jnp.asarray(metric.sqrtG)
            inv_sqrt_g = jnp.asarray(metric.inv_sqrtG)
        else:
            filt = jnp.asarray(
                make_expfilter_2d(config.num_solpts, config.expfilter_strength,
                                  config.expfilter_order, config.expfilter_cutoff)
            )
            sqrt_g = jnp.asarray(metric.sqrtG) if metric is not None else 1.0
            inv_sqrt_g = jnp.asarray(metric.inv_sqrtG) if metric is not None else 1.0

        def expfilter(q, dt):
            return ((sqrt_g * q) @ filt) * inv_sqrt_g

        fns.append(expfilter)

    if config.apply_sponge and config.grid_type == "cartesian2d":
        from ..common.constants import IDX_2D_RHO_W

        zs = config.z1 - config.sponge_zscale
        x3 = np.asarray(geom.X3)
        beta = np.where(
            x3 > zs,
            np.sin(0.5 * np.pi * (x3 - zs) / max(config.z1 - zs, 1e-300)) ** 2 / config.sponge_tscale,
            0.0,
        )
        beta_j = jnp.asarray(beta)

        def sponge(q, dt):
            return q.at[IDX_2D_RHO_W].multiply(1.0 / (1.0 + beta_j * dt))

        fns.append(sponge)

    if not fns:
        return None

    def apply_all(q, dt):
        for fn in fns:
            q = fn(q, dt)
        return q

    return apply_all
