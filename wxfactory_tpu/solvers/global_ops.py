"""Global (mesh-wide) reductions.

Capability parity with the reference's solvers/global_operations.py. There,
these wrap MPI allreduce; here a jnp reduction over a sharded array IS the
collective — XLA lowers it to a psum over the device mesh. Keeping them as
named functions preserves the call sites where the low-synchronization
Krylov algorithms count their sync points.
"""

import jax.numpy as jnp


def global_norm(vec):
    """2-norm across the whole (possibly sharded) vector."""
    return jnp.sqrt(jnp.vdot(vec, vec))


def global_dotprod(vec1, vec2):
    """Dot product across the whole (possibly sharded) vector."""
    return jnp.vdot(vec1, vec2)


def global_inf_norm(vec):
    """Infinity norm across the whole (possibly sharded) vector."""
    return jnp.max(jnp.abs(vec))
