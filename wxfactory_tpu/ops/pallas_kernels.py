"""Pallas TPU kernels for the DFR hot path.

The dominant interior stage of every RHS is: elementwise sqrt(g)-weighted
flux computation followed by the per-element derivative GEMMs. XLA already
batches the small per-element matmuls; this kernel additionally
- keeps the flux fields in VMEM (never materialized to HBM), and
- contracts BOTH directions in one MXU pass by stacking the operators:
  ``[fx | fy] @ [Dx ; Dy]`` — doubling the contraction depth of the tiny
  (s^2 x s^2) matrices.

Used by models via ``interior_flux_divergence`` when
``WXF_USE_PALLAS=1`` (off by default; the XLA path is the reference
semantics and runs everywhere including CPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..common.constants import GRAVITY


def _sw_kernel(q_ref, sqrtg_ref, h11_ref, h12_ref, h21_ref, h22_ref, dxy_ref, out_ref):
    """One block of elements: q (3, B, s2) -> df (3, B, s2)."""
    q = q_ref[...]
    sqrtg = sqrtg_ref[...]
    h11 = h11_ref[...]
    h12 = h12_ref[...]
    h21 = h21_ref[...]
    h22 = h22_ref[...]

    h = q[0]
    hu1 = q[1]
    hu2 = q[2]
    u1 = hu1 / h
    u2 = hu2 / h
    hsq = h * h
    half_g = 0.5 * GRAVITY

    fx = jnp.stack([
        sqrtg * hu1,
        sqrtg * (hu1 * u1 + half_g * h11 * hsq),
        sqrtg * (hu2 * u1 + half_g * h21 * hsq),
    ])
    fy = jnp.stack([
        sqrtg * hu2,
        sqrtg * (hu1 * u2 + half_g * h12 * hsq),
        sqrtg * (hu2 * u2 + half_g * h22 * hsq),
    ])
    both = jnp.concatenate([fx, fy], axis=-1)  # (3, B, 2*s2)
    dxy = dxy_ref[...]  # (2*s2, s2)
    acc_t = out_ref.dtype if out_ref.dtype == jnp.float64 else jnp.float32
    out_ref[...] = jax.lax.dot_general(
        both, dxy, (((2,), (0,)), ((), ())), preferred_element_type=acc_t
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def sw_interior_flux_divergence(q, sqrtg, h11, h12, h21, h22, dxy, block: int = 512):
    """Fused pointwise-flux + dual-derivative for the SW model.

    q: (3, N, s2) element-flattened state; metric fields (N, s2);
    dxy: (2*s2, s2) = vstack(Dx, Dy). Returns df (3, N, s2) such that
    df = fx @ Dx + fy @ Dy.
    """
    n, s2 = q.shape[1], q.shape[2]
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        padder = lambda a: jnp.pad(a, ((0, pad), (0, 0)), constant_values=1.0)
        sqrtg, h11, h12, h21, h22 = map(padder, (sqrtg, h11, h12, h21, h22))

    grid = (nblocks,)
    zero = np.int32(0)

    def fld():
        return pl.BlockSpec((block, s2), lambda i: (i, zero))
    out = pl.pallas_call(
        _sw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, block, s2), lambda i: (zero, i, zero)),
            fld(), fld(), fld(), fld(), fld(),
            pl.BlockSpec((2 * s2, s2), lambda i: (zero, zero)),
        ],
        out_specs=pl.BlockSpec((3, block, s2), lambda i: (zero, i, zero)),
        out_shape=jax.ShapeDtypeStruct((3, nblocks * block, s2), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q, sqrtg, h11, h12, h21, h22, dxy)
    return out[:, :n, :]
