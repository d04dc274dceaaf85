"""The production multi-chip combination: sharded verlet (deferred
rebinning) + Pallas stencils (interpret mode), at D=4, on the shared scene
(conftest.sverlet_d4).

Round-1 gap: this exact pairing — the one the hardware perf numbers are
claimed on — had zero CI coverage.  Round-3 upgrade: with identity tracked
through the sharded path, the Pallas run is gated against the XLA-stencil
run of the SAME solver particle-i-to-particle-i (the kd-tree matching is
gone).  Identical algorithm, only the kernel backend differs, so the
tolerance is kernel-level: the known backend divergence is the Pallas
kernels' softened contact gate (rsqrt(r2 + EPS^2) vs the XLA stencils' hard
r >= EPS gate, see models/grid_solver.forces_xla docstring), O(1e-9)
relative per pair."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu.parallel import shard_verlet


def test_pallas_verlet_sharded_matches_xla_per_particle(sverlet_d4):
    runs = sverlet_d4
    a, b = runs["xla"], runs["pallas"]
    assert int(a.overflow.max()) == int(b.overflow.max()) == 0
    assert int(a.dropped.sum()) == int(b.dropped.sum()) == 0
    assert int(jnp.sum(a.alive)) == int(jnp.sum(b.alive)) == runs["n"]

    va = shard_verlet.extract_fluid_state(a, runs["spec"], runs["params"],
                                          runs["n"])
    vb = shard_verlet.extract_fluid_state(b, runs["spec"], runs["params"],
                                          runs["n"])
    dx = np.abs(np.asarray(va.x) - np.asarray(vb.x)).max()
    dy = np.abs(np.asarray(va.y) - np.asarray(vb.y)).max()
    assert max(dx, dy) <= 1e-4, f"kernel-backend position gap {max(dx, dy):.2e}"
    rho_rel = (np.abs(np.asarray(va.rho) - np.asarray(vb.rho))
               / np.maximum(np.asarray(vb.rho), 1e-6)).max()
    assert rho_rel <= 1e-4, rho_rel


def test_production_path_migrated_and_rebinned(sverlet_d4):
    # the runs must have exercised the collective machinery, not idled
    assert int(sverlet_d4["xla"].rebin_count.max()) > 1
    assert int(sverlet_d4["pallas"].rebin_count.max()) > 1
