"""Benchmark entry point. Prints one JSON line PER METRIC, then the final
headline line (the driver records the last line; it carries every metric in
"extra" so nothing is lost).

Metrics (BASELINE.md "Numbers to be measured"), all on the real TPU chip:
  * sw_case6_rhs_gridpoints_per_s   — headline: canonical Williamson case 6
    discretization scaled to nel=64/panel (num_solpts=3 — the config's
    discretization, config/case6.ini:30) through the GENERIC fused Pallas
    pipeline, 100 fused TVD-RK3 steps per program.
  * sw_case6_canonical_gp_per_s     — the exact case6.ini shape (nel=10).
  * sw_s4_rhs_gridpoints_per_s      — the s=4-specialized pipeline at its
    tuned shape (whole-run KR kernel when available).
  * sw_galewsky_gp_per_s            — canonical galewsky jet (nel=64, s=7).
  * sw_case6_epi3_steps_per_s       — end-to-end canonical case6 stepping
    (config epi3; device KIOPS + chunked dispatch vs reference epi3+pmex).
  * euler3d_dcmip31_rhs_gp_per_s    — canonical dcmip31 (nel 12x12x3, s=2).
  * euler3d_dcmip31_epi2_steps_per_s— end-to-end exponential stepping
    (EPI2 + device-resident KIOPS, ONE XLA program per step; the _chunked
    variant scans 10 steps per dispatch — integrators/epi.py steps_device).
  * euler3d_dcmip31_ros2_steps_per_s— implicit stepping (Ros2 + FGMRES).
  * euler3d_dcmip31_s{2..6}_gp_per_s— the reference's constant-DOF RHS
    benchmark matrix (tests/rhs_benchmark/run.sh there).

vs_baseline ratios come from BASELINE_MEASURED.json — produced by running
the REFERENCE's own RHS/integrator on this host (tools/measure_baseline.py;
the reference targets CPU/CUDA and no CUDA device exists here, so the
baseline is its canonical 6-worker CPU run).

Accuracy gate (ABSOLUTE, round-3): every Pallas-path number is reported only
if the compiled f32 production kernel's RHS error against on-chip f64 truth,
at a 4-step drift state, stays under GATE_REL (5e-3) of the per-variable
tendency scale. This certifies the number times output with real SNR on the
physics: the round-2 operating point (absolute form, default single-bf16-pass
TPU matmuls) measured 8-17x the tendency scale and would hard-fail this gate.

float32 operating point = perturbation (base-state-split) form + full-f32
multi-pass GEMMs (jax_default_matmul_precision=highest, set at package
import); float64 is emulated ~40x slower on this chip and remains the parity
reference. Timing is marginal ((1+reps) calls minus 1) so the ~10-20 ms axon
relay dispatch latency cancels.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = []
_FINAL_EMITTED = False

# Budget machinery (VERDICT r3 Weak #1 / Next #3): the driver runs this
# under a wall-clock cap; BENCH_r03 overran it (rc=124) and lost the tail.
# Every stage now checks the remaining budget before starting, every metric
# streams to BENCH_PARTIAL.jsonl on disk as it lands, expensive f64 truth
# states cache to .bench_cache/ keyed by shape, and a SIGTERM/SIGALRM
# handler emits the final summary record even if the cap fires mid-stage.
T_START = time.time()
# Default sits just under the ~1h window the r3 driver evidence implies;
# if the real cap is lower, the SIGTERM handler still emits the summary.
DEADLINE_SECS = float(os.environ.get("BENCH_DEADLINE_SECS", "3300"))
_HERE = os.path.dirname(os.path.abspath(__file__))
PARTIAL_PATH = os.path.join(_HERE, "BENCH_PARTIAL.jsonl")
CACHE_DIR = os.path.join(_HERE, ".bench_cache")


def remaining_budget() -> float:
    return DEADLINE_SECS - (time.time() - T_START)


def stage_fits(estimate_secs: float, name: str) -> bool:
    if remaining_budget() >= estimate_secs:
        return True
    emit(name, 0.0, "skipped",
         note=f"SKIPPED: {remaining_budget():.0f}s left < ~{estimate_secs:.0f}s estimate "
              f"(deadline {DEADLINE_SECS:.0f}s)")
    return False


def emit(metric, value, unit, baseline=None, note=None):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": (value / baseline) if baseline else 1.0,
           "t": round(time.time() - T_START, 1)}
    if note:
        rec["note"] = note
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    try:
        with open(PARTIAL_PATH, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    return rec


def emit_final():
    """The driver records the LAST stdout line; emit the headline summary
    carrying every metric. Idempotent (also wired to SIGTERM/SIGALRM)."""
    global _FINAL_EMITTED
    if _FINAL_EMITTED or not RESULTS:
        return
    _FINAL_EMITTED = True
    headline = next(
        (r for r in RESULTS if r["metric"] == "sw_case6_rhs_gridpoints_per_s" and r["value"] > 0),
        RESULTS[0],
    )
    final = dict(headline)
    final["extra"] = {r["metric"]: {"value": r["value"], "unit": r["unit"],
                                    "vs_baseline": r["vs_baseline"]} for r in RESULTS}
    print(json.dumps(final), flush=True)


class StageTimeout(Exception):
    """A single stage exceeded its soft cap (raised from SIGALRM so one
    runaway stage can't eat the whole sweep's budget — VERDICT r4 weak #2:
    the builder's own final sweep died mid-matrix at the global deadline)."""


_STAGE_CAP_ACTIVE = False
_STAGE_ESCAPING = False


def _on_timeout(signum, frame):
    global _STAGE_CAP_ACTIVE, _STAGE_ESCAPING
    if signum == signal.SIGALRM and _STAGE_CAP_ACTIVE and remaining_budget() > 45:
        # Soft cap: raise into the running stage. If the stage is stuck in
        # a blocked relay call the raise may not propagate — a 90 s
        # follow-up alarm (_STAGE_ESCAPING) detects that hang and ends the
        # run with the summary instead of idling to the global deadline.
        _STAGE_CAP_ACTIVE = False
        _STAGE_ESCAPING = True
        signal.alarm(90)
        raise StageTimeout(f"stage soft cap hit at t={time.time() - T_START:.0f}s")
    if signum == signal.SIGALRM and _STAGE_ESCAPING and remaining_budget() > 45:
        emit("bench_stage_hang", float(time.time() - T_START), "s",
             note="a stage blocked in a non-interruptible call past its soft "
                  "cap + 90s grace (relay hang); summary from completed metrics")
    else:
        emit("bench_deadline_hit", float(time.time() - T_START), "s",
             note=f"signal {signum} during a stage; summary emitted from completed metrics")
    emit_final()
    sys.stdout.flush()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_timeout)
signal.signal(signal.SIGALRM, _on_timeout)
# Fire ~20 s before the external cap so the summary still reaches stdout.
signal.alarm(max(30, int(DEADLINE_SECS) + 20))


def stage(name, estimate, fn, retries=1):
    """Run one bench stage in isolation: skip if the remaining budget can't
    fit `estimate`, cap its runtime via SIGALRM (2.5x the estimate, clamped
    to the global budget) so an overrun surfaces as StageTimeout instead of
    silently eating every later stage, and retry transient relay errors
    once. A failure emits a 0-value record and the sweep moves on."""
    global _STAGE_CAP_ACTIVE
    only = os.environ.get("BENCH_ONLY")
    if only and not any(tok.strip() in name for tok in only.split(",") if tok.strip()):
        return
    if not stage_fits(estimate, name):
        return

    def run_once():
        global _STAGE_CAP_ACTIVE, _STAGE_ESCAPING
        cap = min(max(2.5 * estimate, estimate + 180.0), remaining_budget() - 40)
        _STAGE_CAP_ACTIVE = True
        signal.alarm(max(int(cap), 10))
        try:
            return fn()
        finally:
            _STAGE_CAP_ACTIVE = False
            _STAGE_ESCAPING = False
            signal.alarm(max(int(remaining_budget()) + 20, 30))

    err = None
    for attempt in range(1 + retries):
        try:
            return run_once()
        except StageTimeout as e:
            err = e
            break  # a cap overrun will overrun again — don't retry
        except Exception as e:
            err = e
            if remaining_budget() < estimate:
                break
    emit(name, 0.0, "failed", note=f"STAGE FAILED: {type(err).__name__}: {err}")


def truth_cache(key: str, compute):
    """Disk cache for expensive f64 drift/truth arrays, keyed by shape
    (persists across rounds in .bench_cache/)."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{key}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    out = compute()
    np.savez(path, **out)
    return out


def cpu_build():
    """Context manager: run EAGER construction math on the host CPU backend.

    RHS-factory construction (packed constants, base planes, f64 base RHS)
    is a few hundred tiny eager jnp ops; on the axon TPU relay each pays a
    ~0.4 s compile+dispatch round trip (measured 87 s per factory, the r4
    bench's dominant cost — and below the persistent-cache threshold, so
    paid EVERY run). Under default_device(cpu) they compile locally in ms
    (8 s total) and the resulting arrays are merely *placed* (not
    committed) on CPU, so the jitted TPU programs that consume them
    transfer them once at compile time."""
    return jax.default_device(jax.devices("cpu")[0])


def load_baselines():
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


_PROBES = {}


def _sync(out):
    """Wait for `out` to actually exist by FETCHING one scalar of it.

    jax.block_until_ready does not reliably wait for execution over the
    axon relay (measured: a single 200-GEMM call 'ready' after 46 ms of a
    ~190 ms execution); only a value transfer synchronizes. The probe is a
    jitted ravel[0] (enqueued after the producer on the same stream), so
    the cost is one scalar round trip — constant, and it cancels in the
    marginal scheme."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    key = (leaf.shape, str(leaf.dtype))
    probe = _PROBES.get(key)
    if probe is None:
        probe = jax.jit(lambda a: jnp.ravel(a)[0])
        _PROBES[key] = probe
    return np.asarray(probe(leaf))


def _marginal_time(fn, reps):
    """(loop of 1+reps calls) − (one call): the per-dispatch relay latency
    cancels. The relay latency is also NOISY (one hiccup in the single-call
    baseline once produced a negative margin and a 1e17 'throughput'), so
    the baseline is the min of two tries and the margin falls back to the
    non-marginal loop fraction when it is implausibly small. Syncing is by
    scalar fetch (_sync), not block_until_ready, which the relay breaks."""
    out = fn()
    _sync(out)
    singles = []
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(fn())
        singles.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(1 + reps):
        out = fn()
    _sync(out)
    loop = time.perf_counter() - t0
    elapsed = loop - min(singles)
    if not (elapsed > 0.25 * loop):  # hiccup in the baseline: margin bogus
        elapsed = loop * reps / (1.0 + reps)
    return max(elapsed, 1e-9), out


def _sw_setup(nel, s, case="case6"):
    from wxfactory_tpu.geometry import make_cubed_sphere_2d, make_metric_2d
    from wxfactory_tpu.models import make_rhs_shallow_water
    from wxfactory_tpu.ops.dfr import make_dfr_operators
    from wxfactory_tpu.testcases import case_galewsky, williamson_case6

    with cpu_build():
        geom = make_cubed_sphere_2d(nel, s)
        ops = make_dfr_operators(s)
        metric = make_metric_2d(geom)
        ic = case_galewsky if case == "galewsky" else williamson_case6
        # The galewsky balance integral is ~1 min of host quadrature at the
        # canonical 1.2M-point grid — cache the IC alongside the truth states.
        if case == "galewsky":
            q64 = jnp.asarray(truth_cache(
                f"swic_{case}_nel{nel}_s{s}", lambda: {"q": np.asarray(ic(geom))})["q"])
        else:
            q64 = jnp.asarray(ic(geom))
    return geom, ops, metric, q64, make_rhs_shallow_water


# ABSOLUTE accuracy gate (round-3 redesign; VERDICT r2 Weak #1): the f32
# production kernel's RHS error against on-chip f64 truth, measured at a
# DRIFT state (the IC advanced a few f64 TVD-RK3 steps, base = IC — the
# honest operating condition of the perturbation form with periodic
# re-basing), must stay under GATE_REL of the per-variable tendency scale.
# A kernel whose output is tendency-scale noise (the round-2 default-precision
# operating point measured 8-17x) can never report a number. Measured
# r3 operating point (pert form + full-f32 GEMMs): ~2e-5..2e-4.
GATE_REL = 5e-3


def _rk3_steps(rhs64, q, dt, nsteps):
    @jax.jit
    def step(q):
        k1 = q + dt * rhs64(q)
        k2 = 0.75 * q + 0.25 * (k1 + dt * rhs64(k1))
        return q / 3.0 + 2.0 / 3.0 * (k2 + dt * rhs64(k2))

    for _ in range(nsteps):
        q = step(q)
    return q


_PEAKS = {}


def _peak_bf16_flops() -> float:
    """Per-chip bf16 MXU peak, from the device kind (ADVICE r3: don't
    hard-code one generation); override with BENCH_PEAK_BF16_FLOPS.

    LAZY (VERDICT r4 weak #1): must not run at module import — a relay
    outage at import time killed the whole r4 capture before any of the
    robustness machinery could run."""
    if "bf16" in _PEAKS:
        return _PEAKS["bf16"]
    env = os.environ.get("BENCH_PEAK_BF16_FLOPS")
    if env:
        _PEAKS["bf16"] = float(env)
        return _PEAKS["bf16"]
    try:
        kind = (jax.devices()[0].device_kind or "").lower()
    except Exception:
        kind = ""
    table = {  # published per-chip bf16 peaks
        "v4": 275e12, "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
        "v6 lite": 918e12, "v6e": 918e12,
    }
    peak = next((v for k, v in table.items() if k in kind), 197e12)
    _PEAKS["bf16"] = peak  # assume v5e-class when unrecognized
    return peak


def _peak_f32_flops() -> float:
    """Full-f32 (precision=HIGHEST) matmuls issue 6 bf16 MXU passes per
    algorithmic matmul, so the achievable algorithmic peak is peak_bf16/6."""
    return _peak_bf16_flops() / 6.0


def acquire_backend(max_tries: int = 6):
    """jax.devices() under a bounded retry/backoff loop (~5 min total).

    The r4 driver capture lost every metric to a transient axon-relay
    outage (VERDICT r4 weak #1) that recovered within the hour; one retry
    loop here is the difference between an empty BENCH artifact and a full
    one. Returns the device list, or None after the last failure."""
    delay = 15.0
    for i in range(max_tries):
        try:
            devs = jax.devices()
            if i:
                print(json.dumps({"backend_acquired_after_tries": i + 1}), flush=True)
            return devs
        except Exception as e:
            print(json.dumps({"backend_try": i + 1, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
            _BACKEND_ERRORS.append(f"{type(e).__name__}: {e}")
            if i < max_tries - 1:
                time.sleep(min(delay, max(1.0, remaining_budget() - 120)))
                delay *= 1.7
                try:  # drop the cached failed-init state before retrying
                    import jax.extend

                    jax.extend.backend.clear_backends()
                except Exception:
                    pass
    return None


_BACKEND_ERRORS = []


def _flops_per_gp(fn, example_arg, gp):
    """Algorithmic FLOP/gridpoint of `fn` from XLA's own post-optimization
    cost analysis (the MFU numerator; VERDICT r2 weak #5 — covers every
    measured path, not just the hand-counted s=4 kernel)."""
    try:
        ca = jax.jit(fn).lower(example_arg).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        return flops / gp if flops > 0 else None
    except Exception:
        return None


def _mfu_note(make_rhs, geom, ops, metric, q64, base, gp, gps):
    """'; ~N FLOP/gp, ~X% MFU' from the XLA-f32 twin of the measured kernel
    (same math, compiler-counted algorithmic FLOPs)."""
    with cpu_build():
        rhs_x = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="xla",
                         perturbation_base=base)
    if hasattr(rhs_x, "delta"):
        fn, arg = rhs_x.delta, (q64 - rhs_x.base_state).astype(jnp.float32)
    else:
        fn, arg = rhs_x, q64.astype(jnp.float32)
    fpg = _flops_per_gp(fn, arg, gp)
    if fpg is None:
        return ""
    mfu = gps * fpg / _peak_f32_flops()
    return (f"; ~{fpg:.0f} algorithmic FLOP/gp (XLA cost analysis), "
            f"~{100 * mfu:.1f}% of the {_peak_f32_flops() / 1e12:.0f} TFLOP/s full-f32 "
            f"(6-pass) MXU peak (assumed bf16 peak {_peak_bf16_flops() / 1e12:.0f} TFLOP/s "
            f"for {jax.devices()[0].device_kind!r})")


def sw_parity_gate(geom, ops, metric, q64, make_rhs, rhs32, nel, s, case="case6"):
    """f32 production kernel vs f64 XLA truth at a 4-step drift state;
    absolute criterion GATE_REL on the per-variable tendency scale. The
    (expensive, emulated-f64-on-TPU) drift/truth pair caches to
    .bench_cache/ so only the first run of a round pays it."""

    def compute():
        with cpu_build():
            rhs64 = jax.jit(make_rhs(geom, ops, metric, dtype=jnp.float64, interior="xla"))
        dt = 150.0 * (10.0 / nel) * (3.0 / s)  # ~half the explicit CFL
        qt = _rk3_steps(rhs64, q64, dt, 4)
        return {"qt": np.asarray(qt), "truth": np.asarray(rhs64(qt))}

    c = truth_cache(f"swtruth_v1_{case}_nel{nel}_s{s}", compute)
    qt, truth = jnp.asarray(c["qt"]), c["truth"]
    scale = np.abs(truth).max(axis=(1, 2, 3, 4), keepdims=True)
    if hasattr(rhs32, "delta"):
        fused32 = np.asarray(jax.jit(rhs32.delta)((qt - rhs32.base_state).astype(jnp.float32)))
    else:
        fused32 = np.asarray(jax.jit(rhs32)(qt.astype(jnp.float32)))
    err_fused = np.abs((fused32 - truth) / scale).max()
    return bool(err_fused < GATE_REL), float(err_fused)


def bench_sw(nel, s, dt, metric_name, baseline_gps, nsteps=100, reps=3, case="case6"):
    geom, ops, metric, q64, make_rhs = _sw_setup(nel, s, case)
    # Production operating point: f32 perturbation (base-state-split) form,
    # base = the initial condition (re-based periodically in long runs).
    with cpu_build():
        rhs = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="pallas",
                       perturbation_base=q64)
    if not hasattr(rhs, "pack"):
        # No fused pipeline at this shape (e.g. galewsky s=7/nel=64: the
        # 2048-row panel blocks exceed the kernel VMEM budget) — measure
        # the fused-XLA f32 perturbation path honestly instead.
        return _bench_sw_xla_fallback(geom, ops, metric, q64, make_rhs, nel, s,
                                      dt, metric_name, baseline_gps, nsteps, reps, case)

    ok, err_fused = sw_parity_gate(geom, ops, metric, q64, make_rhs, rhs, nel, s, case)
    if not ok:
        emit(metric_name, 0.0, "gridpoints/s",
             note=f"ACCURACY GATE FAILED: kernel err {err_fused:.2e} "
                  f"of tendency scale (absolute gate {GATE_REL:.0e})")
        return

    q = rhs.pack(q64.astype(jnp.float32))
    dtv = jnp.asarray(dt, jnp.float32)
    packed_run = getattr(rhs, "packed_run", None)
    chained = rhs.packed_stage_chained

    if packed_run is not None:
        from wxfactory_tpu.ops.pallas_sw import tvdrk3_abc

        abc = tvdrk3_abc(dtv)
        multi = jax.jit(lambda q: packed_run(q, nsteps, abc))
    else:

        @jax.jit
        def multi(q):
            def body(carry, _):
                q, slabs = carry
                q1, s1 = chained(q, q, slabs, 0.0, 1.0, dtv)
                q2, s2 = chained(q, q1, s1, 0.75, 0.25, 0.25 * dtv)
                return chained(q, q2, s2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dtv), None

            return jax.lax.scan(body, (q, rhs.packed_slabs(q)), None, length=nsteps)[0][0]

    elapsed, out = _marginal_time(lambda: multi(q), reps)
    final = out[0] if isinstance(out, tuple) else out
    assert np.isfinite(np.asarray(final)).all(), "non-finite state after benchmark run"
    gps = 6 * nel * nel * s * s * reps * nsteps * 3 / elapsed
    mfu = _mfu_note(make_rhs, geom, ops, metric, q64, q64, 6 * nel * nel * s * s, gps)
    emit(metric_name, gps, "gridpoints/s", baseline_gps,
         note=f"f32 perturbation form + full-f32 GEMMs; accuracy gate: kernel "
              f"{err_fused:.1e} of tendency scale vs f64 truth at 4-step drift "
              f"(absolute gate {GATE_REL:.0e}){mfu}")


def _bench_sw_xla_fallback(geom, ops, metric, q64, make_rhs, nel, s, dt,
                           metric_name, baseline_gps, nsteps, reps, case):
    """SW shapes without a fused pipeline: time the fused-XLA f32
    perturbation path (same operator, XLA-scheduled), same accuracy gate."""
    with cpu_build():
        rhs = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="xla",
                       perturbation_base=q64)
    ok, err = sw_parity_gate(geom, ops, metric, q64, make_rhs, rhs, nel, s, case)
    if not ok:
        emit(metric_name, 0.0, "gridpoints/s",
             note=f"ACCURACY GATE FAILED (XLA fallback): {err:.2e} "
                  f"(absolute gate {GATE_REL:.0e})")
        return
    delta = rhs.delta
    dq0 = (q64 - rhs.base_state).astype(jnp.float32)
    dtv = jnp.asarray(dt, jnp.float32)

    @jax.jit
    def multi(dq):
        def body(q, _):
            q1 = q + dtv * delta(q)
            q2 = 0.75 * q + 0.25 * (q1 + dtv * delta(q1))
            return q / 3.0 + 2.0 / 3.0 * (q2 + dtv * delta(q2)), None

        return jax.lax.scan(body, dq, None, length=nsteps)[0]

    elapsed, out = _marginal_time(lambda: multi(dq0), reps)
    assert np.isfinite(np.asarray(out)).all()
    gps = 6 * nel * nel * s * s * reps * nsteps * 3 / elapsed
    mfu = _mfu_note(make_rhs, geom, ops, metric, q64, q64, 6 * nel * nel * s * s, gps)
    emit(metric_name, gps, "gridpoints/s", baseline_gps,
         note=f"XLA fallback (no fused pipeline at this shape: panel block "
              f"exceeds the kernel VMEM budget); f32 perturbation form; "
              f"gate {err:.1e}{mfu}")


def bench_sw_case6_epi3(baselines, steps=4, chunk=4):
    """End-to-end canonical case6 (config/case6.ini: epi3 + exponential
    solver, dt=1800, tol 1e-7) — production operating point: device-resident
    KIOPS, f32 perturbation-form Arnoldi companion, chunked stepping
    (steps_device: the multistep EPI3 history rides the scan carry)."""
    from wxfactory_tpu.integrators import Epi

    base = baselines.get("sw_case6_epi3", {}).get("steps_per_s")
    geom, ops, metric, q64, make_rhs = _sw_setup(10, 3)
    with cpu_build():
        rhs = make_rhs(geom, ops, metric)
        rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="xla",
                         perturbation_base=q64)
    epi = Epi(rhs, order=3, tolerance=1e-7, exponential_solver="kiops_jit",
              init_substeps=10, rhs32=rhs32)
    q = epi.step(q64, 1800.0)  # first step: 10-substep Epi2 bootstrap + compile
    q = epi.step(q, 1800.0)  # EPI3 device-step compile
    q = epi.steps_device(q, 1800.0, chunk)  # chunked scan compile
    jax.block_until_ready(q)
    secs = []
    for _ in range(3):  # tiny problem: dispatch-latency noise dominates
        t0 = time.perf_counter()
        q = epi.steps_device(q, 1800.0, chunk)
        jax.block_until_ready(q)
        secs.append((time.perf_counter() - t0) / chunk)
    sec = min(secs)
    assert np.isfinite(np.asarray(q)).all()
    emit("sw_case6_epi3_steps_per_s", 1.0 / sec, "steps/s", base,
         note=f"canonical case6 (nel=10, s=3) EPI3 + device-resident KIOPS, "
              f"MIXED precision (f32 SW pert-form Arnoldi matvec), dt=1800, "
              f"{chunk} steps per dispatch; baseline = reference epi3+pmex "
              "6-worker run (marginal timing, bootstrap excluded)")


def bench_sw_galewsky_epi3(baselines, chunk=4):
    """End-to-end TRUE galewsky configuration (reference config/galewsky.ini:
    case 8, nel=30, num_solpts=3, dt=900, epi3, tol 1e-7) — same production
    operating point as the case6 end-to-end stage: device-resident KIOPS,
    f32 perturbation-form Arnoldi companion, chunked device stepping."""
    from wxfactory_tpu.integrators import Epi

    base = baselines.get("sw_galewsky_epi3", {}).get("steps_per_s")
    geom, ops, metric, q64, make_rhs = _sw_setup(30, 3, case="galewsky")
    with cpu_build():
        rhs = make_rhs(geom, ops, metric)
        rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="xla",
                         perturbation_base=q64)
    epi = Epi(rhs, order=3, tolerance=1e-7, exponential_solver="kiops_jit",
              init_substeps=10, rhs32=rhs32)
    q = epi.step(q64, 900.0)  # first step: 10-substep Epi2 bootstrap + compile
    q = epi.step(q, 900.0)  # EPI3 device-step compile
    q = epi.steps_device(q, 900.0, chunk)  # chunked scan compile
    jax.block_until_ready(q)
    secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        q = epi.steps_device(q, 900.0, chunk)
        jax.block_until_ready(q)
        secs.append((time.perf_counter() - t0) / chunk)
    sec = min(secs)
    assert np.isfinite(np.asarray(q)).all()
    emit("sw_galewsky_epi3_steps_per_s", 1.0 / sec, "steps/s", base,
         note=f"TRUE galewsky config (case 8, nel=30, s=3, dt=900, epi3 — "
              f"reference config/galewsky.ini) with device-resident KIOPS, "
              f"MIXED precision f32 pert-form Arnoldi matvec, {chunk} steps "
              f"per dispatch; baseline = reference epi3+pmex 6-worker run")


def _e3_setup(nel_h=12, nel_v=3, s=2, ztop=10000.0):
    from wxfactory_tpu.geometry.cubed_sphere_3d import make_cubed_sphere_3d
    from wxfactory_tpu.geometry.metric3d import make_metric_3d
    from wxfactory_tpu.models import make_rhs_euler_cubesphere
    from wxfactory_tpu.ops.dfr import make_dfr_operators
    from wxfactory_tpu.testcases.dcmip import dcmip_gravity_wave

    with cpu_build():
        geom = make_cubed_sphere_3d(nel_h, nel_v, s, ztop, planet_scaling_factor=125.0,
                                    planet_is_rotating=False)
        ops = make_dfr_operators(s, three_d=True)
        metric = make_metric_3d(geom, ops)
        q0 = jnp.asarray(dcmip_gravity_wave(geom))
    return geom, ops, metric, q0, make_rhs_euler_cubesphere


def bench_dcmip31_rhs(baselines, reps=5, nsteps=150):
    """Canonical dcmip31 RHS through the generic fused 3D pipeline (s=2),
    f32 with the well-balanced base-state offset, chained TVD-RK3 stages."""
    base = baselines.get("euler3d_dcmip31_rhs", {}).get("gridpoints_per_s")
    geom, ops, metric, q0, make_rhs = _e3_setup()
    # Production operating point: f32 perturbation (base-state-split) form
    # in the mega kernel, base = the initial condition.
    with cpu_build():
        rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32, interior="pallas",
                         perturbation_base=q0)
    gp = 6 * 12 * 12 * 3 * 2**3
    if not hasattr(rhs32, "pack"):
        emit("euler3d_dcmip31_rhs_gp_per_s", 0.0, "gridpoints/s",
             note="no fused 3D pipeline for this shape")
        return

    # ABSOLUTE accuracy gate at a 4-step drift state (same design as SW),
    # drift/truth pair cached to .bench_cache/.
    def compute():
        with cpu_build():
            rhs64 = jax.jit(make_rhs(geom, ops, metric, dtype=jnp.float64, interior="xla"))
        qt = _rk3_steps(rhs64, q0, 0.5, 4)
        return {"qt": np.asarray(qt), "truth": np.asarray(rhs64(qt))}

    c = truth_cache("e3truth_v1_canonical_12x12x3_s2", compute)
    qt, truth = jnp.asarray(c["qt"]), c["truth"]
    scale = np.abs(truth).max(axis=(1, 2, 3, 4, 5), keepdims=True)
    fused32 = np.asarray(jax.jit(rhs32)(qt.astype(jnp.float32)))
    err_fused = np.abs((fused32 - truth) / scale).max()
    if not (err_fused < GATE_REL):
        emit("euler3d_dcmip31_rhs_gp_per_s", 0.0, "gridpoints/s",
             note=f"ACCURACY GATE FAILED: kernel {err_fused:.2e} of tendency "
                  f"scale (absolute gate {GATE_REL:.0e})")
        return

    qp = rhs32.pack(q0.astype(jnp.float32))
    dt = jnp.asarray(0.5, jnp.float32)
    chained = rhs32.packed_stage_chained

    @jax.jit
    def multi(qp):
        def body(carry, _):
            q, slabs = carry
            q1, s1 = chained(q, q, slabs, 0.0, 1.0, dt)
            q2, s2 = chained(q, q1, s1, 0.75, 0.25, 0.25 * dt)
            return chained(q, q2, s2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt), None

        return jax.lax.scan(body, (qp, rhs32.packed_slabs(qp)), None, length=nsteps)[0][0]

    elapsed, out = _marginal_time(lambda: multi(qp), reps)
    assert np.isfinite(np.asarray(out)).all()
    gps = gp * reps * nsteps * 3 / elapsed
    mfu = _mfu_note(make_rhs, geom, ops, metric, q0, q0, gp, gps)
    emit("euler3d_dcmip31_rhs_gp_per_s", gps, "gridpoints/s", base,
         note=f"canonical dcmip31 (12x12x3, s=2) fused 3D pipeline, f32 perturbation "
              f"form; accuracy gate: kernel {err_fused:.1e} of tendency scale at "
              f"4-step drift (absolute gate {GATE_REL:.0e}){mfu}; measured headroom: "
              "kernel-only (glue-free) runs 1.42x this rate — at 36 rows/panel the "
              "shape is per-launch-cost bound; a whole-cube single-block kernel "
              "(in-kernel panel exchange, the pallas_sw_gen 'whole'-mode analogue) "
              "is the remaining step")


def bench_dcmip31_epi2(baselines, steps=3):
    from wxfactory_tpu.integrators import Epi

    base = baselines.get("euler3d_dcmip31_epi2", {}).get("steps_per_s")
    geom, ops, metric, q0, make_rhs = _e3_setup()
    with cpu_build():
        rhs = make_rhs(geom, ops, metric)
    # Mixed-precision device-resident stepping: the KIOPS Arnoldi matvec is
    # the FUSED Jacobian-action kernel (the analytically linearized mega
    # kernel, models/euler_cubesphere.py jtv — default interior on TPU);
    # basis/controller stay f64 with full CGS2 orthogonalization (required
    # for inexact operators — see solvers/kiops_jit.py). Trajectory parity
    # is gated by tests/test_euler3d.py (mixed-precision + fused-jtv golden
    # tests).
    with cpu_build():
        rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32,
                         perturbation_base=q0)
    epi = Epi(rhs, order=2, tolerance=1e-7, exponential_solver="kiops_jit",
              mmin=16, mmax=64, rhs32=rhs32)
    q = epi.step(q0, 30.0)  # warm-up/compile
    jax.block_until_ready(q)
    t0 = time.perf_counter()
    for _ in range(steps):
        q = epi.step(q, 30.0)
    jax.block_until_ready(q)
    sec = (time.perf_counter() - t0) / steps
    assert np.isfinite(np.asarray(q)).all()
    emit("euler3d_dcmip31_epi2_steps_per_s", 1.0 / sec, "steps/s", base,
         note="EPI2 + device-resident KIOPS, MIXED precision (f32 pert-form "
              "Arnoldi matvec, f32 CGS2 basis, f64 H/controller/expm), dt=30; "
              "r2 full-f64 path was 0.456 steps/s on this chip, f64-basis "
              "mixed path 1.21")

    # Chunked production stepping: N steps per XLA program (lax.scan with
    # the Krylov warm start as a device carry, integrators/epi.py
    # steps_device) — amortizes the per-step dispatch + stats round trip.
    chunk = 10
    q = epi.steps_device(q, 30.0, chunk)  # compile
    jax.block_until_ready(q)
    secs = []
    for _ in range(2):  # min-of-2: one relay hiccup otherwise skews the rate
        t0 = time.perf_counter()
        q = epi.steps_device(q, 30.0, chunk)
        jax.block_until_ready(q)
        secs.append((time.perf_counter() - t0) / chunk)
    sec_c = min(secs)
    assert np.isfinite(np.asarray(q)).all()
    emit("euler3d_dcmip31_epi2_chunked_steps_per_s", 1.0 / sec_c, "steps/s", base,
         note=f"EPI2 + device-resident KIOPS, {chunk} steps per dispatch "
              "(steps_device lax.scan), same mixed precision")


def bench_dcmip31_ros2(baselines, steps=3):
    """The reference's OTHER canonical dcmip31 operating mode: Ros2 +
    FGMRES (rhs_benchmark configs there run both epi2/kiops and
    ros2/fgmres). Mixed precision: f32 perturbation-form rational matvec +
    f32 inner Arnoldi basis, f64 outer residuals (restarted iterative
    refinement, solvers/fgmres_jit.py); parity gated by
    tests/test_euler3d.py::test_ros2_mixed_precision_matches_f64_path."""
    from wxfactory_tpu.integrators import Ros2

    base = baselines.get("euler3d_dcmip31_ros2", {}).get("steps_per_s")
    geom, ops, metric, q0, make_rhs = _e3_setup()
    with cpu_build():
        rhs = make_rhs(geom, ops, metric)
    with cpu_build():
        # Default interior: the fused Jacobian-action companion on TPU
        # (rational matvec = 1 - dt/2 * fused J.v).
        rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32,
                         perturbation_base=q0)
    ros = Ros2(rhs, tolerance=1e-7, gmres_restart=30, linear_solver="fgmres_jit",
               rhs32=rhs32)
    q = ros.step(q0, 30.0)  # warm-up/compile
    jax.block_until_ready(q)
    t0 = time.perf_counter()
    for _ in range(steps):
        q = ros.step(q, 30.0)
    jax.block_until_ready(q)
    sec = (time.perf_counter() - t0) / steps
    assert np.isfinite(np.asarray(q)).all()
    emit("euler3d_dcmip31_ros2_steps_per_s", 1.0 / sec, "steps/s", base,
         note="Ros2 + device-resident FGMRES, MIXED precision (f32 pert-form "
              "rational matvec + f32 inner basis, f64 outer iterative "
              "refinement), dt=30; full-f64 device path measures 3.5 s/step "
              "on this chip")

    # Chunked implicit stepping (steps_device lax.scan over the whole-step
    # solve — the dispatch amortization EPI2 already had, VERDICT r4 #6).
    chunk = 10
    q = ros.steps_device(q, 30.0, chunk)  # compile
    jax.block_until_ready(q)
    secs = []
    for _ in range(2):
        t0 = time.perf_counter()
        q = ros.steps_device(q, 30.0, chunk)
        jax.block_until_ready(q)
        secs.append((time.perf_counter() - t0) / chunk)
    sec_c = min(secs)
    assert np.isfinite(np.asarray(q)).all()
    emit("euler3d_dcmip31_ros2_chunked_steps_per_s", 1.0 / sec_c, "steps/s", base,
         note=f"Ros2 + device-resident FGMRES, {chunk} steps per dispatch "
              "(steps_device lax.scan), same mixed precision")


def bench_e3_matrix(reps=2, nsteps=20):
    """The reference's constant-DOF dcmip31 RHS benchmark matrix
    (tests/rhs_benchmark/run.sh:66-70 there: num_solpts 2..6 with element
    counts 30/20/15/12/10 per direction, ~1.3M gridpoints) through the
    fused 3D pipeline — every row fused, including s=6 via the kz
    half-split layout (ops/pallas_euler3d.py pick_h). Deviation: s=4 runs
    16^3 (the 8-row Mosaic block constraint admits no packing at 15^3). Each shape passes the
    same absolute accuracy gate as the canonical bench, evaluated at a
    2-step drift state, and reports algorithmic MFU from operator shapes."""
    # Per-row estimates from the r4 sweep timings (BENCH_PARTIAL.jsonl):
    # the cost is dominated by host-side metric3d construction (~N^3), and
    # the stage() soft cap cuts a relay hang (one ate 2600 s in r4) instead
    # of letting it consume the rest of the sweep.
    shapes = [(2, 30, 450, "fused"), (3, 20, 260, "fused"),
              (4, 16, 280, "fused (16^3: no packing at 15^3)"),
              (5, 12, 220, "fused"),
              (6, 10, 300, "fused (kz half-split H=2: one element across 2 rows)")]
    from wxfactory_tpu.ops import pallas_euler3d as pe3

    def row(s, N, how):
        name = f"euler3d_dcmip31_s{s}_gp_per_s"
        geom, ops, metric, q0, make_rhs = _e3_setup(nel_h=N, nel_v=N, s=s)
        with cpu_build():
            rhs32 = make_rhs(geom, ops, metric, dtype=jnp.float32,
                             interior="pallas" if how.startswith("fused") else "xla",
                             perturbation_base=q0)
        gp = 6 * (N * s) ** 3
        fused = hasattr(rhs32, "packed_stage_chained")

        # Accuracy gate at a 2-step drift state. Unlike the canonical
        # 12x12x3 shape (dz = 1667 m), these constant-DOF shapes pack
        # N*s vertical points into ztop = 10 km, so dt sits under the
        # VERTICAL acoustic CFL: dz/(N*s)/c_s with margin. The drift
        # state comes from the (fast) f32 production path ON CHIP — the
        # gate only needs a representative drifted state, not an
        # f64-accurate trajectory; the single f64 TRUTH eval at that
        # state runs on the HOST CPU backend op-by-op (whole-program
        # CPU compiles at ~1.3M gridpoints stall; eager dispatch costs
        # ~11 s — r3 paid 7 such evals per shape and blew the driver
        # cap, VERDICT Weak #1) and caches to .bench_cache/.
        dtg = 0.25 * (10000.0 / (N * s)) / 340.0
        dq0 = (q0 - rhs32.base_state).astype(jnp.float32)
        dt32 = jnp.asarray(dtg, jnp.float32)
        # XLA-path objects expose delta_fn(consts, dq): consts ride
        # as runtime ARGUMENTS. Closed over (rhs32.delta) they are
        # HLO literals — hundreds of MB at these shapes, over the
        # relay's remote-compile request limit (HTTP 413, the r5
        # s=6 failure). The Pallas objects feed constants through
        # pallas_call operands, so their .delta closure is fine.
        if hasattr(rhs32, "delta_fn"):
            gate_consts = jax.device_put(rhs32.consts, jax.devices()[0])
            delta_rhs = rhs32.delta_fn
        else:
            gate_consts = None
            delta_rhs = lambda _c, dq: rhs32.delta(dq)

        @jax.jit
        def drift2(dq, consts):
            def body(qq, _):
                q1 = qq + dt32 * delta_rhs(consts, qq)
                q2 = 0.75 * qq + 0.25 * (q1 + dt32 * delta_rhs(consts, q1))
                return qq / 3.0 + 2.0 / 3.0 * (q2 + dt32 * delta_rhs(consts, q2)), None

            return jax.lax.scan(body, dq, None, length=2)[0]

        dqt32 = np.asarray(drift2(dq0, gate_consts), np.float32)
        qt64 = np.asarray(rhs32.base_state, np.float64) + dqt32.astype(np.float64)

        def compute_truth():
            with jax.default_device(jax.devices("cpu")[0]), jax.disable_jit():
                rhs64 = make_rhs(geom, ops, metric, dtype=jnp.float64, interior="xla")
                return {"truth": np.asarray(rhs64(jax.device_put(qt64)))}

        import hashlib

        key = f"e3truth_s{s}_N{N}_" + hashlib.md5(dqt32.tobytes()).hexdigest()[:10]
        truth = truth_cache(key, compute_truth)["truth"]
        qt = jnp.asarray(qt64)
        scale = np.abs(truth).max(axis=(1, 2, 3, 4, 5), keepdims=True)
        fused32 = np.asarray(jax.jit(delta_rhs)(
            gate_consts, (qt - rhs32.base_state).astype(jnp.float32)))
        err = np.abs((fused32 - truth) / scale).max()
        if not (err < GATE_REL):
            emit(name, 0.0, "gridpoints/s",
                 note=f"ACCURACY GATE FAILED: {err:.2e} (gate {GATE_REL:.0e}); {how}")
            return  # a gate failure is final

        dt = jnp.asarray(dtg, jnp.float32)
        # At these sizes the packed metric constants/base planes are
        # ~100s of MB; closed over, they'd be embedded in the HLO as
        # literals (590 MB at 30^3) and blow the axon remote-compile
        # request limit (HTTP 413). The *_fn entry points take them as
        # an explicit pytree argument -> runtime parameters.
        if fused:
            chained = rhs32.packed_stage_chained_fn
            slabs0 = rhs32.packed_slabs_fn
            # device_put: these ride as jit ARGUMENTS (not closures);
            # left CPU-placed by cpu_build they would re-transfer
            # hundreds of MB over the relay on EVERY call (measured
            # 13x on the s=2 matrix row).
            dev = jax.devices()[0]
            big = jax.device_put(rhs32.packed_big, dev)
            qp = jax.device_put(rhs32.pack(q0.astype(jnp.float32)), dev)

            @jax.jit
            def multi(qp, big):
                def body(carry, _):
                    q, slabs = carry
                    q1, s1 = chained(big, q, q, slabs, 0.0, 1.0, dt)
                    q2, s2 = chained(big, q, q1, s1, 0.75, 0.25, 0.25 * dt)
                    return chained(big, q, q2, s2, 1.0 / 3.0, 2.0 / 3.0, (2.0 / 3.0) * dt), None

                return jax.lax.scan(body, (qp, slabs0(big, qp)), None, length=nsteps)[0][0]

            elapsed, out = _marginal_time(lambda: multi(qp, big), reps)
        else:
            delta_fn = rhs32.delta_fn
            dev = jax.devices()[0]
            consts = jax.device_put(rhs32.consts, dev)
            dq0 = jax.device_put((q0 - rhs32.base_state).astype(jnp.float32), dev)

            @jax.jit
            def multi(dq, consts):
                def body(q, _):
                    q1 = q + dt * delta_fn(consts, q)
                    q2 = 0.75 * q + 0.25 * (q1 + dt * delta_fn(consts, q1))
                    return q / 3.0 + 2.0 / 3.0 * (q2 + dt * delta_fn(consts, q2)), None

                return jax.lax.scan(body, dq, None, length=nsteps)[0]

            elapsed, out = _marginal_time(lambda: multi(dq0, consts), reps)
        assert np.isfinite(np.asarray(out)).all()
        gps = gp * reps * nsteps * 3 / elapsed
        # Algorithmic FLOPs/gridpoint from the pipeline's GEMM shapes
        # (per 128-lane row: traces 2x(5R,128,128), divergence
        # (5R,384,128), dlp (R,128,384) + face GEMMs ~(6R,128*3) corr,
        # + ~220 elementwise ops/lane) — fused path only.
        note = f"constant-DOF dcmip31 matrix, {how}; gate {err:.1e}"
        if fused:
            g = pe3.grid_plan(s, N, N)[0]
            gp_row = g * s**3
            # Algorithmic FLOPs per 128-lane state row, from the
            # pipeline's GEMM shapes (pert form; elementwise ~300/lane):
            # Split trace layout (g*2s^2 > 64): x/y/z get separate
            # trace/correction GEMMs (3 families instead of 2 fused
            # registers) — more FLOPs per row, but 2-3x the gridpoints
            # per row (ops/pallas_euler3d.py is_split_layout).
            nfam = 3 if pe3.is_split_layout(s, g) else 2
            flops_row = (
                2 * (nfam * 5 * 2 * 128 * 128)      # state+base traces
                + 5 * 2 * 384 * 128                 # interior divergence bundle
                + 2 * (2 * 128 * 384)               # dlogp (delta + base)
                + 7 * 2 * (nfam * 128) * 128        # boundary corrections
                + 2 * (nfam * 2 * 128 * 384)        # face-log corrections
                + 2 * 128 * 128                     # gravity hfk
                + 300 * 128                         # elementwise (VPU)
            )
            flops_gp = flops_row / gp_row
            mfu = gps * flops_gp / _peak_f32_flops()
            note += (f"; ~{flops_gp:.0f} FLOP/gp (lane util {gp_row}/128), "
                     f"~{100*mfu:.1f}% of 6-pass f32 MXU peak")
        emit(name, gps, "gridpoints/s", note=note)

    for s, N, est, how in shapes:
        # stage() provides the budget check, the soft runtime cap and one
        # retry on transient relay errors for each row independently.
        stage(f"euler3d_dcmip31_s{s}_gp_per_s", est,
              lambda s=s, N=N, how=how: row(s, N, how))


def emit_roofline():
    """FLOP-count + HBM-byte accounting for the measured SW kernels
    (BASELINE.md asks for a roofline/MFU line; reference rhs/rhs.py:190-213
    only records stage TIMES — FLOP accounting is new here).

    Per packed row (g=8 elements, 128 lanes, s=4) and RK stage the s=4
    pipeline runs, per variable: the (128,128) extrapolation GEMM, the
    (256,128) divergence GEMM and the (128,128) correction GEMM, plus the
    ~130-op/lane elementwise flux/forcing math; the chained-mode slab/halo
    GEMMs add ~15%. Steady-state HBM traffic of the whole-run kernel is
    only the initial state + final state + constants (everything else lives
    in VMEM), so the kernel is MXU-bound by construction.
    """
    s4 = next((r for r in RESULTS if r["metric"] == "sw_s4_rhs_gridpoints_per_s"), None)
    if s4 is None or s4["value"] == 0.0:
        return
    # FLOPs per gridpoint (s=4 layout: 16 gridpoints/element, 8 elements/row)
    gp_per_row = 128.0
    gemm_flops_per_row = 3 * (2 * 128 * 128 + 2 * 256 * 128 + 2 * 128 * 128)  # eexy+dd+wmat
    elementwise_per_row = 130 * 128.0
    flops_per_gp = 1.15 * (gemm_flops_per_row + elementwise_per_row) / gp_per_row
    flops_per_s = s4["value"] * flops_per_gp
    peak_f32 = _peak_f32_flops()
    emit(
        "sw_s4_kernel_mxu_flops_per_s", flops_per_s, "FLOP/s",
        note=f"{flops_per_gp:.0f} algorithmic FLOP/gridpoint from operator shapes; "
             f"~{100 * flops_per_s / peak_f32:.1f}% of the {peak_f32 / 1e12:.0f} TFLOP/s full-f32 "
             "(6-pass) MXU peak; steady-state HBM ~0 (whole-run kernel keeps "
             "state in VMEM)",
    )


def main():
    # Fresh partial stream for this run.
    try:
        if os.path.exists(PARTIAL_PATH):
            os.remove(PARTIAL_PATH)
    except OSError:
        pass

    # Backend FIRST, under retry (VERDICT r4 next #1): a relay outage must
    # produce an honest rc=0 record, not an import-time crash.
    if acquire_backend() is None:
        emit("backend_unavailable", 0.0, "none",
             note="TPU backend unavailable after 6 tries over ~5 min "
                  f"({_BACKEND_ERRORS[-1] if _BACKEND_ERRORS else 'unknown'}); "
                  "no metrics this run — see BENCH_PARTIAL.jsonl")
        emit_final()
        return

    baselines = load_baselines()
    sw_b = baselines.get("sw_case6_rhs", {}).get("gridpoints_per_s")
    sw_b64 = baselines.get("sw_case6_rhs_nel64", {}).get("gridpoints_per_s")

    # Stage order = importance (headline SW + canonical end-to-end first);
    # each stage declares a rough worst-case estimate against the deadline.
    try:
        # Canonical case6 discretization (s=3): exact config shape +
        # scaled-up. The nel=10 problem is sub-ms per 100 steps — use more
        # reps for a stable marginal timing.
        stage("sw_case6_canonical_gp_per_s", 120,
              lambda: bench_sw(10, 3, 30.0, "sw_case6_canonical_gp_per_s", sw_b,
                               nsteps=200, reps=10))
        stage("sw_case6_rhs_gridpoints_per_s", 150,
              lambda: bench_sw(64, 3, 10.0, "sw_case6_rhs_gridpoints_per_s", sw_b64))
        # The s=4-specialized pipeline at its tuned shape (KR whole-run kernel).
        stage("sw_s4_rhs_gridpoints_per_s", 120,
              lambda: bench_sw(64, 4, 30.0, "sw_s4_rhs_gridpoints_per_s", None))
        # End-to-end canonical case6 stepping (BASELINE.md "steps/s ... on
        # case6"; reference epi3+pmex baseline from tools/measure_baseline).
        stage("sw_case6_epi3_steps_per_s", 200, lambda: bench_sw_case6_epi3(baselines))
        stage("euler3d_dcmip31_rhs_gp_per_s", 150, lambda: bench_dcmip31_rhs(baselines))
        stage("euler3d_dcmip31_epi2_steps_per_s", 120, lambda: bench_dcmip31_epi2(baselines))
        stage("euler3d_dcmip31_ros2_steps_per_s", 220, lambda: bench_dcmip31_ros2(baselines))
        # The TRUE galewsky operating point (reference config/galewsky.ini:
        # nel=30, num_solpts=3, dt=900, epi3) end-to-end — VERDICT r4 next
        # #4; the 64/7 shape below is the scaled-up RHS stress shape.
        stage("sw_galewsky_epi3_steps_per_s", 200,
              lambda: bench_sw_galewsky_epi3(baselines))
        bench_e3_matrix()  # per-row isolation + retry via stage()
        # Scaled-up galewsky jet shape (nel=64, num_solpts=7) through the
        # fused pipeline. LAST: the s=7 f64 truth/compile is the most
        # expensive stage on a cold cache (the drift/truth pair caches to
        # .bench_cache after the first complete run).
        stage("sw_galewsky_gp_per_s", 300,
              lambda: bench_sw(64, 7, 10.0, "sw_galewsky_gp_per_s", None, case="galewsky"))
        emit_roofline()
    finally:
        emit_final()


if __name__ == "__main__":
    main()
