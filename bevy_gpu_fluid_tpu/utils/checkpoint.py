"""Checkpoint / resume for simulation state.

The reference had none — its closest feature was the GPU demo mirroring GPU
state back into ``SPHState`` every readback cycle as a de-facto snapshot
(reference: examples/gpu_demo.rs:116-127).  Here the SoA state is a pytree, so
save/restore is exact and trivial: npz for single-host, orbax available for
async/multi-host when needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import FluidParams, IntegrateConfig
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
