"""FramePump (render/pump.py): every frame exactly once, one push late."""

import numpy as np

from bevy_gpu_fluid_tpu.render.pump import FramePump


def test_pump_order_and_completeness():
    pump = FramePump(pull=True)
    frames = [np.full((2, 2), i, np.uint8) for i in range(5)]
    out = [pump.push(f) for f in frames]
    assert out[0] is None
    tail = pump.flush()
    got = [o for o in out if o is not None] + [tail]
    assert len(got) == len(frames)
    for i, g in enumerate(got):
        assert isinstance(g, np.ndarray) and int(g[0, 0]) == i
    assert pump.flush() is None          # drained


def test_pump_device_mode():
    import jax.numpy as jnp
    pump = FramePump(pull=False)
    a = pump.push(jnp.zeros((2,)))
    assert a is None
    b = pump.push(jnp.ones((2,)))
    assert float(b[0]) == 0.0            # frame k-1, ready
    assert float(pump.flush()[0]) == 1.0
