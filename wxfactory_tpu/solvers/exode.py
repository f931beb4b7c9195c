"""EXODE: phi-function combinations via adaptive explicit RK integration.

Capability parity with the reference's solvers/exode.py + the embedded-RK
engine of integrators/explicit_runge_kutta.py/butcher.py: the combination
w = phi_0(A)u_0 + phi_1(A)u_1 + ... equals y(1) of the augmented ODE

    y' = A y + sum_j t^j / j! * u_{j+1},   y(0) = u_0,

integrated over [0, 1] with an adaptive embedded Runge-Kutta pair.

Method names map onto proven adaptive integrators: BS3(2) -> Bogacki-
Shampine (RK23), DP5(4) -> Dormand-Prince (RK45), DP8(7)/F14(12)/F10(8) ->
DOP853 (the highest-order embedded method available here); M4(3), KC3(2)
and the EXLRK pairs fall back to RK45. The step size warm start persists
across calls like the reference's exode.first_step.
"""

import math
from typing import Callable

import numpy as np
from scipy.integrate import solve_ivp

from .stats import PhiStats

_METHOD_MAP = {
    "BS3(2)": "RK23",
    "KC3(2)": "RK23",
    "EXLRK3(2)": "RK23",
    "M4(3)": "RK45",
    "EXLRK4(3)": "RK45",
    "DP5(4)": "RK45",
    "DP8(7)": "DOP853",
    "F10(8)": "DOP853",
    "F14(12)": "DOP853",
}

_state = {"first_step": None}


def exode(
    tau_out,
    A: Callable,
    u: np.ndarray,
    method: str = "BS3(2)",
    controller: str = "",
    rtol: float = 1e-3,
    atol: float = 1e-6,
    task1: bool = False,
):
    u = np.asarray(u, dtype=np.float64)
    ppo, n = u.shape
    p = ppo - 1
    if p == 0:
        p = 1
        u = np.vstack((u, np.zeros(n)))

    y0 = u[0].copy()
    tau_f = float(np.atleast_1d(tau_out)[-1])

    def fun(t, x):
        ret = np.asarray(A(x)).copy()
        for j in range(p):
            ret += t**j / math.factorial(j) * u[j + 1]
        return ret

    ivp_method = _METHOD_MAP.get(method.upper().replace(" ", ""), None)
    if ivp_method is None:
        ivp_method = _METHOD_MAP.get(method, "RK45")

    kwargs = {}
    if _state["first_step"] is not None and 0 < _state["first_step"] < tau_f:
        kwargs["first_step"] = _state["first_step"]

    sol = solve_ivp(fun, (0.0, tau_f), y0, method=ivp_method, rtol=rtol, atol=atol, **kwargs)
    if not sol.success:
        raise RuntimeError(f"EXODE integration failed: {sol.message}")

    if len(sol.t) > 1:
        _state["first_step"] = float(np.median(np.diff(sol.t)))

    w = sol.y[:, -1][None, :]
    if task1:
        w = w / tau_f

    stats = PhiStats()
    stats.krylov_steps = int(sol.nfev)
    stats.substeps = len(sol.t) - 1
    stats.last_krylov_size = 1
    return w, stats
