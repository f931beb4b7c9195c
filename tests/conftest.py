"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host devices
(xla_force_host_platform_device_count), mirroring how the reference tests
multi-rank behavior under mpirun (tests/unit/mpi_test.py there). Real-TPU
execution is exercised by bench.py / __graft_entry__.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 24 = 6*2^2 panels x tiles: enough for the general (panel, y, x)
    # shard_map decomposition at N=2 (reference 6*N^2-rank analogue).
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=24").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
