"""In-engine runtime validator: accelerated state vs golden model.

The analog of the reference's opt-in ``readback_and_compare`` system
(reference: src/gpu/buffers.rs:554-695), which after a warmup compared GPU
rho/p/acc against the CPU state at 1% relative tolerance (+0.5 absolute on
acceleration) and panicked on failure (buffers.rs:564-567, :689).

Usage: at any point in a run, call ``validate(state, params)`` — it recomputes
density/pressure/forces for the CURRENT positions through the exact all-pairs
golden model and checks the accelerated solver's stored fields against them.
Raises ``ParityError`` on violation (the reference panicked), returns the
observed maxima otherwise.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.params import FluidParams
from ..core.state import FluidState
from ..models import reference as golden

# the reference's in-engine tolerances (buffers.rs:564-567)
REL_TOL = 0.01
ACC_ABS_TOL = 0.5


class ParityError(AssertionError):
    pass


@dataclasses.dataclass
class ParityReport:
    rho_max_rel: float
    p_max_rel: float
    acc_max_rel: float
    acc_max_abs: float

    def __str__(self):
        return (f"parity: rho {self.rho_max_rel:.2e} rel, "
                f"p {self.p_max_rel:.2e} rel, "
                f"acc {self.acc_max_rel:.2e} rel / "
                f"{self.acc_max_abs:.2e} abs")


def _max_rel(a, b, eps):
    return float(jnp.max(jnp.abs(a - b) / jnp.maximum(jnp.abs(b), eps)))


def validate(state: FluidState, params: FluidParams,
             rel_tol: float = REL_TOL, acc_abs_tol: float = ACC_ABS_TOL,
             raise_on_fail: bool = True) -> ParityReport:
    """Check state.rho/p/ax/ay against the golden model at the current
    positions/velocities.  O(N^2) — intended for spot checks, not every step
    (the reference likewise ran it once after 60 frames)."""
    truth = golden.accel_field(golden.density_pressure(state, params), params)

    report = ParityReport(
        rho_max_rel=_max_rel(state.rho, truth.rho, 1e-6),
        p_max_rel=_max_rel(state.p, truth.p, 1.0),   # reference guards small p
        acc_max_rel=max(_max_rel(state.ax, truth.ax, 1.0),
                        _max_rel(state.ay, truth.ay, 1.0)),
        acc_max_abs=float(jnp.maximum(jnp.max(jnp.abs(state.ax - truth.ax)),
                                      jnp.max(jnp.abs(state.ay - truth.ay)))),
    )
    ok = (report.rho_max_rel <= rel_tol and report.p_max_rel <= rel_tol
          and (report.acc_max_rel <= rel_tol
               or report.acc_max_abs <= acc_abs_tol))
    if not ok and raise_on_fail:
        raise ParityError(str(report))
    return report
