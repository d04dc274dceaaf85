"""In-engine runtime validator: accelerated state vs golden model.

The analog of the reference's opt-in ``readback_and_compare`` system
(reference: src/gpu/buffers.rs:554-695), which after a warmup compared GPU
rho/p/acc against the CPU state at 1% relative tolerance (+0.5 absolute on
acceleration) and panicked on failure (buffers.rs:564-567, :689).

Three entry points:

* ``validate(state, params)`` — full rho/p/acc check for states whose
  acceleration fields are populated (e.g. after
  ``grid_solver.compute_rho_p_acc``), at the in-engine tolerances.
* ``validate_fields(state, params)`` — rho/p-only check at the gpu_parity10
  tolerances (rho <=1% rel, p <=30 abs, reference:
  examples/gpu_parity10.rs:18-19); works on ANY solver's returned state
  (verlet/pallas don't materialize per-particle accelerations).
* ``validate_accelerated(state, params, grid, stencils)`` — full rho/p/acc
  check for ANY solver: re-evaluates the fields through the accelerated
  stencil path at the state's current positions (one extra density+forces
  eval — the analog of the reference's readback) and diffs against the
  golden model at the in-engine tolerances.  This is what
  ``Simulation(validate_every=K)`` runs for the verlet/pallas solvers,
  matching the reference validator's coverage (rho, p, AND acc,
  reference: src/gpu/buffers.rs:564-567).

On failure both raise ``ParityError`` (the reference panicked) with the
reference's failure diagnostics: the top-3 offending particles with their
positions and velocities (reference: examples/gpu_integration_parity.rs:
130-157) and the filtered relative-pressure metric over |p| > 30
(reference: examples/gpu_parity10.rs:120-139).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams
from ..core.state import FluidState
from ..models import reference as golden

# the reference's in-engine tolerances (buffers.rs:564-567)
REL_TOL = 0.01
ACC_ABS_TOL = 0.5
# the reference's parity-harness tolerances (gpu_parity10.rs:18-19)
P_ABS_TOL = 30.0
P_FILTER = 30.0  # |p| threshold for the filtered rel metric


class ParityError(AssertionError):
    pass


@dataclasses.dataclass
class ParityReport:
    rho_max_rel: float
    p_max_rel: float
    acc_max_rel: float
    acc_max_abs: float
    p_max_abs: float = 0.0
    p_rel_filtered: float = 0.0  # max rel err over |p_truth| > P_FILTER

    def __str__(self):
        return (f"parity: rho {self.rho_max_rel:.2e} rel, "
                f"p {self.p_max_rel:.2e} rel / {self.p_max_abs:.2e} abs "
                f"(filtered rel>|{P_FILTER:.0f}| {self.p_rel_filtered:.2e}), "
                f"acc {self.acc_max_rel:.2e} rel / "
                f"{self.acc_max_abs:.2e} abs")


def _max_rel(a, b, eps):
    return float(jnp.max(jnp.abs(a - b) / jnp.maximum(jnp.abs(b), eps)))


def top_offenders(name: str, err: np.ndarray, state: FluidState,
                  k: int = 3) -> str:
    """Reference-style failure diagnostics: the k worst particles with
    positions and velocities (gpu_integration_parity.rs:130-157)."""
    err = np.asarray(err)
    idx = np.argsort(err)[::-1][:k]
    x, y = np.asarray(state.x), np.asarray(state.y)
    vx, vy = np.asarray(state.vx), np.asarray(state.vy)
    lines = [f"top {len(idx)} {name} offenders:"]
    for rank, i in enumerate(idx):
        lines.append(
            f"  #{rank + 1} particle {int(i)}: err={err[i]:.3e} "
            f"pos=({x[i]:.4f}, {y[i]:.4f}) vel=({vx[i]:.4f}, {vy[i]:.4f})")
    return "\n".join(lines)


def _p_metrics(p_acc, p_truth):
    """p max-abs plus the reference's filtered relative metric: rel error
    computed only where the golden pressure is meaningfully large
    (gpu_parity10.rs:120-139 skips |p| <= 30 to avoid amplifying noise)."""
    abs_err = jnp.abs(p_acc - p_truth)
    big = jnp.abs(p_truth) > P_FILTER
    rel = jnp.where(big, abs_err / jnp.maximum(jnp.abs(p_truth), 1e-12), 0.0)
    return float(jnp.max(abs_err)), float(jnp.max(rel))


def validate(state: FluidState, params: FluidParams,
             rel_tol: float = REL_TOL, acc_abs_tol: float = ACC_ABS_TOL,
             raise_on_fail: bool = True) -> ParityReport:
    """Check state.rho/p/ax/ay against the golden model at the current
    positions/velocities.  O(N^2) — intended for spot checks, not every step
    (the reference likewise ran it once after 60 frames)."""
    truth = golden.accel_field(golden.density_pressure(state, params), params)
    p_abs, p_filt = _p_metrics(state.p, truth.p)

    report = ParityReport(
        rho_max_rel=_max_rel(state.rho, truth.rho, 1e-6),
        p_max_rel=_max_rel(state.p, truth.p, 1.0),   # reference guards small p
        acc_max_rel=max(_max_rel(state.ax, truth.ax, 1.0),
                        _max_rel(state.ay, truth.ay, 1.0)),
        acc_max_abs=float(jnp.maximum(jnp.max(jnp.abs(state.ax - truth.ax)),
                                      jnp.max(jnp.abs(state.ay - truth.ay)))),
        p_max_abs=p_abs, p_rel_filtered=p_filt,
    )
    ok = (report.rho_max_rel <= rel_tol and report.p_max_rel <= rel_tol
          and (report.acc_max_rel <= rel_tol
               or report.acc_max_abs <= acc_abs_tol))
    if not ok and raise_on_fail:
        rho_err = np.abs(np.asarray(state.rho) - np.asarray(truth.rho)) \
            / np.maximum(np.abs(np.asarray(truth.rho)), 1e-6)
        raise ParityError(
            f"{report}\n{top_offenders('rho-rel', rho_err, state)}")
    return report


def validate_accelerated(state: FluidState, params: FluidParams, grid,
                         stencils=None, rel_tol: float = REL_TOL,
                         acc_abs_tol: float = ACC_ABS_TOL,
                         raise_on_fail: bool = True) -> ParityReport:
    """Full-coverage runtime check for solvers whose states don't carry
    accelerations (verlet/pallas): recompute rho/p/ax/ay through the
    ACCELERATED path (binning + the given stencils) at the state's current
    positions/velocities, then run the in-engine rho/p/acc comparison
    against the O(N^2) golden model.  Checks the actual production kernels
    — exactly what the reference's readback_and_compare validated (GPU
    kernel output vs CPU model, reference: src/gpu/buffers.rs:554-695)."""
    from ..models import grid_solver
    acc_state, _ = grid_solver.compute_rho_p_acc(
        state, params, grid, stencils or grid_solver.XLA_STENCILS)
    return validate(acc_state, params, rel_tol, acc_abs_tol, raise_on_fail)


def validate_fields(state: FluidState, params: FluidParams,
                    rho_rel_tol: float = REL_TOL,
                    p_abs_tol: float = P_ABS_TOL,
                    raise_on_fail: bool = True) -> ParityReport:
    """gpu_parity10-style check of the stored density/pressure fields only
    (rho <=1% rel, p <=30 abs — reference: examples/gpu_parity10.rs:18-19,
    :152-163).  Works for every solver: verlet/pallas states don't carry
    accelerations, and the stored rho convention (computed at the last step's
    pre-integrate positions, one dt behind the positions) matches the
    reference's — its validator compared under the same one-frame skew."""
    truth = golden.density_pressure(state, params)
    p_abs, p_filt = _p_metrics(state.p, truth.p)
    report = ParityReport(
        rho_max_rel=_max_rel(state.rho, truth.rho, 1e-6),
        p_max_rel=_max_rel(state.p, truth.p, 1.0),
        acc_max_rel=0.0, acc_max_abs=0.0,
        p_max_abs=p_abs, p_rel_filtered=p_filt,
    )
    ok = report.rho_max_rel <= rho_rel_tol and report.p_max_abs <= p_abs_tol
    if not ok and raise_on_fail:
        rho_err = np.abs(np.asarray(state.rho) - np.asarray(truth.rho)) \
            / np.maximum(np.abs(np.asarray(truth.rho)), 1e-6)
        raise ParityError(
            f"{report}\n{top_offenders('rho-rel', rho_err, state)}")
    return report
