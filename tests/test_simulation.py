"""Simulation facade (the GPUSPHPlugin analog) smoke tests."""

import jax.numpy as jnp
import numpy as np

from bevy_gpu_fluid_tpu import Simulation


def test_dam_break_facade():
    sim = Simulation.dam_break(n=256, solver="xla")
    s0_y = float(jnp.mean(sim.state.y))
    sim.run(50)
    assert int(sim.state.step) == 50
    assert sim.overflow == 0
    assert bool(jnp.isfinite(sim.state.x).all())

    img = np.asarray(sim.frame())
    assert img.dtype == np.uint8 and img.shape[2] == 3
    assert (img.sum(-1) > 30).any()

    sim.kick(0.3, 0.3, dir_x=1.0, dir_y=0.0)
    v_after = float(jnp.max(sim.state.vx))
    assert v_after >= 10.0  # IMPULSE * dir

    sim.run(10)
    assert bool(jnp.isfinite(sim.state.x).all())


def test_facade_checkpoint(tmp_path):
    sim = Simulation.dam_break(n=64, solver="golden")
    sim.run(5)
    path = str(tmp_path / "sim.npz")
    sim.save(path)
    x_saved = np.asarray(sim.state.x)
    sim.run(5)
    sim.load(path)
    np.testing.assert_array_equal(np.asarray(sim.state.x), x_saved)
