"""Output orchestration: periodic field output, checkpoints, blockstats.

Capability parity with the reference's output/output_manager.py
(OutputManager) + output/output_cubesphere.py (__blockstats__): per-step
actions at configured frequencies, state filename keyed by a hash of the
discretization parameters, timing accounting, restart loading.
"""

import math
import os
import time
from typing import Optional

import numpy as np

from ..config import Configuration
from ..parallel.distributed import gather_global, is_primary
from .diagnostics import global_integral_2d, potential_enstrophy, total_energy
from .solver_stats import SolverStatsOutput


class OutputManager:
    def __init__(self, config: Configuration, geom, ops, metric, topo=None):
        self.config = config
        self.geom = geom
        self.ops = ops
        self.metric = metric
        self.topo = topo

        # Host-side effects (files, stdout, SQLite) happen on the primary
        # process only — the rank-0 gating of the reference's wx_mpi.py,
        # expressed as jax.process_index()==0 (parallel/distributed.py).
        self.primary = is_primary()

        self.output_dir = config.output_dir
        if self.primary and self._any_output_enabled():
            os.makedirs(self.output_dir, exist_ok=True)

        self.solver_stats: Optional[SolverStatsOutput] = None
        if config.store_solver_stats and self.primary:
            self.solver_stats = SolverStatsOutput(config)

        self.writer = None
        self.fst_writer = None
        if (
            self.primary
            and config.output_freq > 0
            and config.output_format == "netcdf"
            and config.grid_type == "cubed_sphere"
        ):
            from .netcdf import make_writer

            path = os.path.join(self.output_dir, f"{config.base_output_file}.nc")
            self.writer = make_writer(path, geom, metric, ops, config.equations, topo=topo)
        elif (
            self.primary
            and config.output_freq > 0
            and config.output_format == "fst"
            and config.grid_type == "cubed_sphere"
        ):
            from .fst import FstWriter

            path = os.path.join(self.output_dir, f"{config.base_output_file}.fst")
            self.fst_writer = FstWriter(path, geom, metric, ops, config.equations, dt=config.dt)

        # Deterministic digest (NOT Python hash(): state_id_params contains
        # strings, whose hashes are randomized per process — a restart from
        # another invocation, or a multi-process run, would never find its
        # own checkpoint file otherwise).
        import hashlib

        digest = hashlib.md5(repr(config.state_id_params()).encode()).hexdigest()
        self.config_hash = int(digest[:12], 16)
        self.initial_integrals = None
        self.num_writes = 0
        self.num_save_states = 0
        self.num_blockstats = 0
        self.total_write_time = 0.0
        self.total_save_state_time = 0.0
        self.total_blockstat_time = 0.0

    def _any_output_enabled(self) -> bool:
        c = self.config
        return any(f > 0 for f in (c.output_freq, c.save_state_freq, c.stat_freq)) or bool(
            c.store_solver_stats or c.store_total_time
        )

    # ------------------------------------------------------------------
    def state_file_name(self, step_id: int) -> str:
        base = f"state_vector_{self.config_hash:012x}"
        return os.path.join(self.output_dir, f"{base}.{step_id:08d}.npy")

    def load_state_from_file(self, step_id: int, expected_shape) -> np.ndarray:
        from ..parallel.distributed import load_state_distributed

        state, _ = load_state_distributed(self.state_file_name(step_id), panel_major=self._panel_major())
        if tuple(state.shape) != tuple(expected_shape):
            raise ValueError(
                f"Saved state for step {step_id} has shape {state.shape}, expected {expected_shape}"
            )
        if self.primary:
            print(f"Starting simulation from step {step_id} (rather than 0)")
        return state

    def _panel_major(self) -> bool:
        return self.config.grid_type == "cubed_sphere"

    # ------------------------------------------------------------------
    def step(self, q, step_id: int, sim_time: float) -> None:
        """Per-step output actions. The state gather is collective (every
        process participates, parallel/distributed.py gather_global); the
        file/stdout effects run on the primary only."""
        c = self.config
        if c.output_freq > 0 and step_id % c.output_freq == 0:
            t0 = time.time()
            self.__write_result__(gather_global(q), step_id, sim_time)
            self.total_write_time += time.time() - t0
            self.num_writes += 1
        if c.save_state_freq > 0 and step_id % c.save_state_freq == 0:
            t0 = time.time()
            from ..parallel.distributed import save_state_distributed

            save_state_distributed(q, c, self.state_file_name(step_id), panel_major=self._panel_major())
            self.total_save_state_time += time.time() - t0
            self.num_save_states += 1
        if c.stat_freq > 0 and step_id % c.stat_freq == 0:
            t0 = time.time()
            self.__blockstats__(gather_global(q), step_id)
            self.total_blockstat_time += time.time() - t0
            self.num_blockstats += 1

    def store_rhs_timing(self, step_id: int, stage_times: dict):
        """Persist sampled per-stage RHS timings (output/rhs_timing.py) to
        the solver-stats ``rhs_timing`` table (reference rhs/rhs.py:88-118 +
        solver_stats.py:160)."""
        if self.solver_stats is not None and stage_times:
            self.solver_stats.write_rhs_timing(
                step_id, list(stage_times.keys()), list(stage_times.values())
            )

    def store_solver_stats(self, step_id: int, solver_info, solve_time: float):
        if self.solver_stats is not None and solver_info is not None:
            self.solver_stats.write_output(
                step_id,
                num_iterations=getattr(solver_info, "total_num_it", 0),
                solve_time=solve_time,
                num_substeps=getattr(solver_info, "num_substeps", 0) or 0,
                num_rejected=getattr(solver_info, "num_rejected", 0) or 0,
                error_estimate=getattr(solver_info, "error_estimate", 0.0) or 0.0,
            )

    def __write_result__(self, q, step_id: int, sim_time: float):
        if self.fst_writer is not None:
            self.fst_writer.write_sw(step_id, np.asarray(q))
            return
        if self.writer is None:
            return
        if self.config.equations == "shallow_water":
            self.writer.write_sw(sim_time, np.asarray(q))
        elif self.config.equations == "euler":
            self.writer.write_euler(sim_time, np.asarray(q))

    def __blockstats__(self, q, step_id: int):
        c = self.config
        if not self.primary:
            return
        if c.grid_type != "cubed_sphere" or c.equations != "shallow_water":
            return
        from ..testcases.shallow_water import height_case1, height_case2

        h = q[0]
        u1 = q[1] / h
        u2 = q[2] / h

        print("=" * 96)
        print(f"Blockstats for timestep {step_id}")

        if c.case_number <= 2:
            if c.case_number == 1:
                h_anal = height_case1(self.geom, step_id * c.dt)
            elif c.case_number == 2:
                h_anal = height_case2(self.geom)
            else:
                h_anal = None
            if h_anal is not None:
                a_err = global_integral_2d(np.abs(h - h_anal), self.ops, self.metric)
                i_anal = global_integral_2d(np.abs(h_anal), self.ops, self.metric)
                a_err2 = global_integral_2d((h - h_anal) ** 2, self.ops, self.metric)
                i_anal2 = global_integral_2d(h_anal**2, self.ops, self.metric)
                l1 = a_err / i_anal
                l2 = math.sqrt(a_err2 / i_anal2)
                linf = np.max(np.abs(h - h_anal)) / np.max(h_anal)
                print(f"l1 = {l1} \t l2 = {l2} \t linf = {linf}")

        if c.case_number >= 2:
            energy = total_energy(h, u1, u2, self.metric, self.topo)
            enstrophy = potential_enstrophy(h, u1, u2, self.metric, self.ops)
            integrals = np.array(
                [
                    global_integral_2d(h, self.ops, self.metric),
                    global_integral_2d(energy, self.ops, self.metric),
                    global_integral_2d(enstrophy, self.ops, self.metric),
                ]
            )
            if self.initial_integrals is None:
                self.initial_integrals = integrals
                print(f"Integral of mass = {integrals[0]}")
                print(f"Integral of energy = {integrals[1]}")
                print(f"Integral of enstrophy = {integrals[2]}")
            drift = (integrals - self.initial_integrals) / self.initial_integrals
            print(f"normalized error for mass = {drift[0]}")
            print(f"normalized error for energy = {drift[1]}")
            print(f"normalized error for enstrophy = {drift[2]}")
        print("=" * 96)

    def finalize(self, total_time: Optional[float] = None):
        if self.writer is not None:
            self.writer.close()
        if self.fst_writer is not None:
            self.fst_writer.close()
        if self.solver_stats is not None:
            self.solver_stats.close()
        if self.primary and self.config.store_total_time and total_time is not None:
            path = os.path.join(self.output_dir, f"runtime_{self.config.time_integrator}.txt")
            with open(path, "a") as fh:
                fh.write(
                    f"{self.config.exponential_solver} {self.config.num_elements_horizontal} "
                    f"{self.config.time_integrator} {self.config.case_number} {total_time:.3f}\n"
                )
