"""Pallas TPU kernels for the DFR hot path.

The DFR spatial operator is element-local except for the interface-trace
exchange: per element, extrapolation / derivative / correction are tiny
(s^2 x ks) matmuls and the flux math is elementwise. Two properties of the
TPU shape the kernel design here (see pallas_guide):

- **Lane packing.** s^2 (9..36) is far below the 128-lane vector width, so
  per-element arrays waste 3/4+ of every VPU op and the MXU contraction
  depth is s^2. We pack ``g = floor(128 / s^2)`` consecutive elements into
  the lane dimension and lift each per-element operator ``A`` to the
  block-diagonal ``diag_g(A)`` — contraction depth g*s^2 (=128 at s=4),
  full lanes, and the reshape ``(N, s^2) -> (N/g, g*s^2)`` is free
  (row-major contiguous).
- **Fusion.** The element-local pipeline stage (pointwise flux ->
  derivative GEMM -> metric forcing, plus the face-trace extrapolation
  feeding the halo exchange) runs as ONE kernel: the flux fields live only
  in VMEM, never in HBM. XLA's unfused path materializes both directional
  flux fields (2x the state size) between the elementwise and GEMM HLOs.

All kernel operands are 2-D ``(rows, lanes)`` tiles (one ref per physical
variable) — Mosaic lowers these directly with no relayouts.

Reference semantics: rhs/rhs_sw.py:38-240 stages 1+3+6 (extrapolate,
pointwise flux + interior divergence, forcing). Used by
``make_rhs_shallow_water(interior="pallas")`` / ``WXF_USE_PALLAS=1``;
the XLA path remains the float64 parity reference.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..common.constants import GRAVITY


def lane_group(s2: int) -> int:
    """Elements packed into the 128-lane dim (>=1)."""
    return max(1, 128 // s2)


def _sw_kernel(
    h_ref, hu1_ref, hu2_ref,
    sqrtg_ref, h11_ref, h12_ref, h21_ref, h22_ref,
    c101_ref, c102_ref, c201_ref, c202_ref,
    c111_ref, c112_ref, c212_ref, c222_ref,
    invsg_ref, eex_ref, eey_ref, dd_ref,
    df0_ref, df1_ref, df2_ref,
    trx0_ref, trx1_ref, trx2_ref,
    try0_ref, try1_ref, try2_ref,
):
    """One block of lane-packed elements; every operand is a 2-D tile."""
    h = h_ref[...]
    hu1 = hu1_ref[...]
    hu2 = hu2_ref[...]
    sqrtg = sqrtg_ref[...]
    u1 = hu1 / h
    u2 = hu2 / h
    hsq = h * h
    half_g = 0.5 * GRAVITY

    acc_t = df0_ref.dtype if df0_ref.dtype == jnp.float64 else jnp.float32
    mm = lambda a, b: jax.lax.dot(a, b, preferred_element_type=acc_t).astype(df0_ref.dtype)
    eex = eex_ref[...]
    eey = eey_ref[...]
    dd = dd_ref[...]

    # Face traces per element and direction: block-diag GEMMs. Separate x/y
    # outputs so the (M, g*2s) -> (N, 2s) reshape downstream is free.
    trx0_ref[...] = mm(h, eex)
    trx1_ref[...] = mm(hu1, eex)
    trx2_ref[...] = mm(hu2, eex)
    try0_ref[...] = mm(h, eey)
    try1_ref[...] = mm(hu1, eey)
    try2_ref[...] = mm(hu2, eey)

    # sqrt(g)-weighted fluxes (reference rhs_sw.py:120-131), x and y stacked
    # on the lane axis so each variable's divergence is one GEMM.
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
            sqrtg * (hu2 * u1 + half_g * h21_ref[...] * hsq),
            sqrtg * (hu2 * u2 + half_g * h22_ref[...] * hsq),
        ),
        dd,
    )

    # Coriolis/Christoffel forcing (reference rhs_sw.py:223-235, no topo).
    forcing_1 = (
        2.0 * (c101_ref[...] * hu1 + c102_ref[...] * hu2)
        + c111_ref[...] * hu1 * u1
        + 2.0 * c112_ref[...] * hu1 * u2
    )
    forcing_2 = (
        2.0 * (c201_ref[...] * hu1 + c202_ref[...] * hu2)
        + 2.0 * c212_ref[...] * hu1 * u2
        + c222_ref[...] * hu2 * u2
    )
    invsg = invsg_ref[...]
    df0_ref[...] = -invsg * div0
    df1_ref[...] = -invsg * div1 - forcing_1
    df2_ref[...] = -invsg * div2 - forcing_2


@functools.partial(jax.jit, static_argnames=("block",))
def sw_element_local(q, fields, eex, eey, dd, block: int = 256):
    """Fused extrapolation + flux + interior divergence + forcing.

    q: (3, M, L) lane-packed state (L = g*s^2); fields: 14 metric arrays
    (M, L) in the order (sqrtG, H11, H12, H21, H22, chr_1_01, chr_1_02,
    chr_2_01, chr_2_02, chr_1_11, chr_1_12, chr_2_12, chr_2_22, 1/sqrtG);
    eex/eey: (L, g*2s) block-diag extrap_x / extrap_y; dd: (2L, L)
    block-diag [Dx ; Dy]. Returns (df, traces_x, traces_y): df (3, M, L)
    already carrying -1/sqrt(g)*div - forcing, traces (3, M, g*2s).
    """
    m, L = q.shape[1], q.shape[2]
    Lt = eex.shape[1]
    nblocks = (m + block - 1) // block
    pad = nblocks * block - m
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        fields = [jnp.pad(a, ((0, pad), (0, 0)), constant_values=1.0) for a in fields]

    zero = np.int32(0)
    fld = lambda: pl.BlockSpec((block, L), lambda i: (i, zero))
    trs = lambda: pl.BlockSpec((block, Lt), lambda i: (i, zero))
    outs = pl.pallas_call(
        _sw_kernel,
        grid=(nblocks,),
        in_specs=[fld() for _ in range(17)]
        + [
            pl.BlockSpec((L, Lt), lambda i: (zero, zero)),
            pl.BlockSpec((L, Lt), lambda i: (zero, zero)),
            pl.BlockSpec((2 * L, L), lambda i: (zero, zero)),
        ],
        out_specs=[fld()] * 3 + [trs()] * 6,
        out_shape=[jax.ShapeDtypeStruct((nblocks * block, L), q.dtype)] * 3
        + [jax.ShapeDtypeStruct((nblocks * block, Lt), q.dtype)] * 6,
        interpret=jax.default_backend() != "tpu",
    )(q[0], q[1], q[2], *fields, eex, eey, dd)
    df = jnp.stack(outs[:3])[:, :m, :]
    traces_x = jnp.stack(outs[3:6])[:, :m, :]
    traces_y = jnp.stack(outs[6:9])[:, :m, :]
    return df, traces_x, traces_y
