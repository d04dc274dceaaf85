"""Pipelined frame consumption: overlap transfer/dispatch across frames.

JAX dispatch is asynchronous, but a naive frame loop serializes anyway:
``np.asarray(sess.run_frame(...))`` blocks on frame k's compute AND its
device->host copy before dispatch k+1 even enters the pipe.  On a tunneled
rig that is ~27 ms dispatch latency + ~27 ms host transfer of dead time per
frame — more than the compute itself for small scenes (BASELINE.json
round3_fps_table).  The reference never had this problem only because its
renderer and sim shared one GPU queue (reference: examples/gpu_demo.rs —
its readback bridge was the analogous stall, ~5 ms/frame of its 188 FPS
budget).

``FramePump`` keeps exactly one frame in flight: ``push(img_k)`` starts
img_k's non-blocking device->host copy and returns img_{k-1}, whose bytes
landed while frame k was being dispatched and computed.  The consumer sees
every frame exactly once, one frame late — invisible in a live viewer and
irrelevant in a throughput bench.

Works with any producer (Session.run_frame, ShardedSession.run_frame,
Simulation.run_frame).  On backends where dispatch is effectively
synchronous (the CPU mesh in CI) it degrades to the plain loop.
"""

from __future__ import annotations

import numpy as np


class FramePump:
    """Double-buffer frame consumption (one frame of latency).

    pull=True (default): returned frames are host np.ndarrays; the
    device->host copy of frame k overlaps dispatch/compute of frame k+1.
    pull=False: returned frames are device arrays, block_until_ready'd one
    frame late — overlaps the dispatch round-trip only (the on-device
    streaming shape, e.g. feeding a device-side encoder).
    """

    def __init__(self, pull: bool = True):
        self.pull = pull
        self._pending = None

    def _materialize(self, img):
        if self.pull:
            return np.asarray(img)
        import jax
        return jax.block_until_ready(img)

    def push(self, img):
        """Submit frame k; returns frame k-1 fully materialized (or None on
        the first call — prime the pipe with one extra push)."""
        if self.pull and hasattr(img, "copy_to_host_async"):
            img.copy_to_host_async()
        prev, self._pending = self._pending, img
        return None if prev is None else self._materialize(prev)

    def flush(self):
        """Drain the in-flight frame (call once after the last push)."""
        prev, self._pending = self._pending, None
        return None if prev is None else self._materialize(prev)
