"""Checkpoint / resume for simulation state.

The reference had none — its closest feature was the GPU demo mirroring GPU
state back into ``SPHState`` every readback cycle as a de-facto snapshot
(reference: examples/gpu_demo.rs:116-127).  Here the SoA state is a pytree, so
save/restore is exact and trivial: npz for single-host, orbax available for
async/multi-host when needed.

Three granularities:

* ``save``/``load`` — per-particle ``FluidState`` (+ params/cfg), portable
  across grids and solvers;
* ``save_dense``/``load_dense`` — the verlet flagship's RESIDENT ``DenseSim``
  with its grid geometry: restore continues bitwise-identically (slot
  structure, skin references, and rebin counters all preserved — a re-init
  from an extracted FluidState would re-sort and reset the deferred-rebin
  state);
* ``save_sharded``/``load_sharded`` — the multi-chip ``ShardedDenseSim``
  with its ``ShardSpec``; identity (idx planes) round-trips, so a sharded
  run can also be restored onto a DIFFERENT device count via
  ``shard_verlet.extract_fluid_state`` + re-shard.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, IntegrateConfig, GridSpec2D
from ..core.state import FluidState


def _norm(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize so
    save('ckpt') / load('ckpt') round-trips."""
    return path if path.endswith(".npz") else path + ".npz"


def save(path: str, state: FluidState, params: FluidParams | None = None,
         cfg: IntegrateConfig | None = None) -> None:
    """Write state (and optionally params/config) to an .npz file."""
    path = _norm(path)
    arrays = {f"state.{k}": np.asarray(v)
              for k, v in dataclasses.asdict(state).items()}
    if params is not None:
        arrays.update({f"params.{k}": np.asarray(v)
                       for k, v in dataclasses.asdict(params).items()})
    if cfg is not None:
        arrays.update({f"cfg.{k}": np.asarray(v)
                       for k, v in dataclasses.asdict(cfg).items()})
    np.savez(path, **arrays)


def _group(z, prefix: str) -> dict:
    return {k[len(prefix):]: jnp.asarray(z[k])
            for k in z.files if k.startswith(prefix)}


def load(path: str) -> tuple[FluidState, FluidParams | None,
                             IntegrateConfig | None]:
    """Read back (state, params-or-None, cfg-or-None)."""
    z = np.load(_norm(path))
    state = FluidState(**_group(z, "state."))
    pkw = _group(z, "params.")
    ckw = _group(z, "cfg.")
    params = FluidParams(**pkw) if pkw else None
    cfg = IntegrateConfig(**ckw) if ckw else None
    return state, params, cfg


# ---------------------------------------------------------------------------
# Resident-state checkpointing (DenseSim / ShardedDenseSim)
# ---------------------------------------------------------------------------

_GRID_META = ("origin_x", "origin_y", "cell_size", "nx", "ny", "cap",
              "row_block")
_GRID_INTS = {"nx", "ny", "cap", "row_block"}


def _grid_arrays(prefix: str, grid: GridSpec2D) -> dict:
    return {f"{prefix}{k}": np.asarray(getattr(grid, k))
            for k in _GRID_META}


def _grid_from(z, prefix: str) -> GridSpec2D:
    kw = {k: (int(z[f"{prefix}{k}"]) if k in _GRID_INTS
              else float(z[f"{prefix}{k}"])) for k in _GRID_META}
    return GridSpec2D(**kw)


_FP_PREFIX = "meta.fp."


def _fp_arrays(fingerprint: dict | None) -> dict:
    if not fingerprint:
        return {}
    return {f"{_FP_PREFIX}{k}": np.asarray(v)
            for k, v in fingerprint.items()}


def load_fingerprint(path: str) -> dict | None:
    """Solver-knob fingerprint stored by save_dense/save_sharded (None for
    artifacts from before fingerprinting).  Values come back as python
    scalars/strings for direct comparison."""
    z = np.load(_norm(path))
    fp = {k[len(_FP_PREFIX):]: z[k][()] for k in z.files
          if k.startswith(_FP_PREFIX)}
    if not fp:
        return None
    return {k: (v.item() if getattr(v, "ndim", 0) == 0 and
                v.dtype.kind in "biuf" else str(v))
            for k, v in fp.items()}


def check_fingerprint(saved: dict | None, supplied: dict,
                      where: str) -> None:
    """Raise on solver-knob mismatch between a checkpoint and the knobs a
    restore re-supplies — a mismatch continues WITHOUT error but diverges
    from the uninterrupted run, which is the worst failure mode.  Legacy
    artifacts (saved is None) are accepted unchecked."""
    if saved is None:
        return
    bad = {k: (saved[k], v) for k, v in supplied.items()
           if k in saved and saved[k] != v}
    if bad:
        detail = ", ".join(f"{k}: saved={s!r} supplied={v!r}"
                           for k, (s, v) in bad.items())
        raise ValueError(
            f"{where}: solver knobs do not match the checkpoint's "
            f"({detail}) — continuing would silently diverge from the "
            f"saved run; re-supply the saved knobs (or re-save with the "
            f"new ones)")


def save_dense(path: str, sim, grid: GridSpec2D, params: FluidParams,
               cfg: IntegrateConfig, n: int,
               fingerprint: dict | None = None) -> None:
    """Snapshot a verlet ``DenseSim`` (models/verlet_solver.py) with its
    static grid geometry and physics — everything a ``Session.restore``
    needs to continue bitwise-identically.  ``fingerprint`` records the
    non-serializable solver knobs so restore can REJECT a mismatched
    continuation instead of silently diverging."""
    arrays = {f"sim.{k}": np.asarray(v)
              for k, v in dataclasses.asdict(sim).items()}
    arrays.update(_grid_arrays("grid.", grid))
    arrays.update({f"params.{k}": np.asarray(v)
                   for k, v in dataclasses.asdict(params).items()})
    arrays.update({f"cfg.{k}": np.asarray(v)
                   for k, v in dataclasses.asdict(cfg).items()})
    arrays["meta.n"] = np.asarray(n)
    arrays.update(_fp_arrays(fingerprint))
    np.savez(_norm(path), **arrays)


def load_dense(path: str):
    """Returns (DenseSim, GridSpec2D, FluidParams, IntegrateConfig, n)."""
    from ..models.verlet_solver import DenseSim, SPILL_CAP
    from ..ops.binning import FAR
    from ..ops import reslot as reslot_ops
    z = np.load(_norm(path))
    kw = _group(z, "sim.")
    grid = _grid_from(z, "grid.")
    if "sidx" not in kw:       # pre-recovery snapshot: empty spill buffer
        kw.update(sx=jnp.full((SPILL_CAP,), FAR, jnp.float32),
                  sy=jnp.full((SPILL_CAP,), FAR, jnp.float32),
                  svx=jnp.zeros((SPILL_CAP,), jnp.float32),
                  svy=jnp.zeros((SPILL_CAP,), jnp.float32),
                  sidx=jnp.full((SPILL_CAP,), -1, jnp.int32),
                  readmitted=jnp.int32(0))
    if "occ" not in kw:        # pre-cached-bounds snapshot: recompute both
        # (exact, not conservative: occ is a pure function of xd, disp2 of
        # the position/reference planes — the restored run continues
        # bitwise-identically to one that never stopped)
        kw["occ"] = reslot_ops.block_kmax3(kw["xd"], grid)
        ddx = kw["xd"] - kw["ref_xd"]
        ddy = kw["yd"] - kw["ref_yd"]
        kw["disp2"] = jnp.max(ddx * ddx + ddy * ddy)
    sim = DenseSim(**kw)
    params = FluidParams(**_group(z, "params."))
    cfg = IntegrateConfig(**_group(z, "cfg."))
    return sim, grid, params, cfg, int(z["meta.n"])


def save_sharded(path: str, sim, spec, params: FluidParams,
                 cfg: IntegrateConfig, n: int,
                 fingerprint: dict | None = None) -> None:
    """Snapshot a multi-chip ``ShardedDenseSim`` (parallel/shard_verlet.py)
    with its ``ShardSpec`` decomposition and physics.  ``fingerprint`` as
    in ``save_dense``."""
    arrays = {f"sim.{k}": np.asarray(v)
              for k, v in dataclasses.asdict(sim).items()}
    arrays.update(_grid_arrays("spec.local_grid.", spec.local_grid))
    for k in ("n_devices", "nx_local", "global_x0", "capacity", "mig_cap"):
        arrays[f"spec.{k}"] = np.asarray(getattr(spec, k))
    arrays.update({f"params.{k}": np.asarray(v)
                   for k, v in dataclasses.asdict(params).items()})
    arrays.update({f"cfg.{k}": np.asarray(v)
                   for k, v in dataclasses.asdict(cfg).items()})
    arrays["meta.n"] = np.asarray(n)
    arrays.update(_fp_arrays(fingerprint))
    np.savez(_norm(path), **arrays)


def load_sharded(path: str):
    """Returns (ShardedDenseSim, ShardSpec, FluidParams, IntegrateConfig,
    n).  The arrays come back host-resident; the first jitted step re-lays
    them out over whatever mesh the rebuilt step function runs on."""
    from ..parallel.shard import ShardSpec
    from ..parallel.shard_verlet import ShardedDenseSim, SPILL_CAP
    from ..ops.binning import FAR
    z = np.load(_norm(path))
    kw = _group(z, "sim.")
    spec = ShardSpec(
        n_devices=int(z["spec.n_devices"]),
        nx_local=int(z["spec.nx_local"]),
        local_grid=_grid_from(z, "spec.local_grid."),
        global_x0=float(z["spec.global_x0"]),
        capacity=int(z["spec.capacity"]),
        mig_cap=int(z["spec.mig_cap"]))
    D = int(kw["xd"].shape[0])
    if "sidx" not in kw:       # pre-recovery snapshot: empty spill buffers
        kw.update(sx=jnp.full((D, SPILL_CAP), FAR, jnp.float32),
                  sy=jnp.full((D, SPILL_CAP), FAR, jnp.float32),
                  svx=jnp.zeros((D, SPILL_CAP), jnp.float32),
                  svy=jnp.zeros((D, SPILL_CAP), jnp.float32),
                  sidx=jnp.full((D, SPILL_CAP), -1, jnp.int32),
                  readmitted=jnp.zeros((D,), jnp.int32))
    if "occ" not in kw:        # pre-cached-bounds snapshot: recompute both
        # occ = per-device block_kmax3 maxed with both neighbours' — the
        # same superset shard_verlet.occ_of builds with ppermute, computed
        # here with host-side shifts.  disp2 = per-device max over REAL
        # lanes (ghosts excluded), as the step stores it.  Both exact.
        from ..ops import reslot as reslot_ops
        g = spec.local_grid
        occ = jax.vmap(lambda xd: reslot_ops.block_kmax3(xd, g))(kw["xd"])
        if D > 1:
            from_left = jnp.concatenate([occ[:1], occ[:-1]])
            from_right = jnp.concatenate([occ[1:], occ[-1:]])
            occ = jnp.maximum(occ, jnp.maximum(from_left, from_right))
        kw["occ"] = occ
        nxl = spec.nx_local
        rl = lambda a: a[:, :, :, 1:nxl + 1]
        ddx = rl(kw["xd"]) - rl(kw["ref_xd"])
        ddy = rl(kw["yd"]) - rl(kw["ref_yd"])
        kw["disp2"] = jnp.max(ddx * ddx + ddy * ddy, axis=(1, 2, 3))
    sim = ShardedDenseSim(**kw)
    params = FluidParams(**_group(z, "params."))
    cfg = IntegrateConfig(**_group(z, "cfg."))
    return sim, spec, params, cfg, int(z["meta.n"])
