"""Multi-chip persistent session: the ``Session`` facade over slabs.

``models/verlet_solver.Session`` is the single-chip production shape —
state resident on the device, ``run(k)`` in one dispatch, frames straight
from the dense state.  This module is the same contract over a
``jax.sharding.Mesh``: one x-slab per device (parallel/shard_verlet.py),
per-slab on-device raster strips (parallel/shard_render.py), original-order
extraction via the tracked per-particle identity, resident checkpointing,
and AOT program export — so scaling from one chip to a mesh is a
constructor swap, not a rewrite of the driver loop (compare
examples/sharded_demo.py's hand-rolled loop, which predates this facade).

The reference has no multi-device story at all (single wgpu device,
reference: src/gpu/buffers.rs); its closest analog is the persistent
particle SSBO stepped in place.

CPU-mesh note: on a virtual CPU mesh this class synchronizes after every
dispatch — XLA:CPU collectives deadlock-abort when several multi-device
executions are in flight on low-core hosts.  On TPU dispatches stay async.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.params import FluidParams, IntegrateConfig
from ..core.state import FluidState
from ..ops.binning import FAR
from . import shard as sh
from . import shard_render, shard_verlet


def _sharded_fingerprint(fused: bool, stencils, recover: bool,
                         refless: bool = False) -> dict:
    """Solver-knob fingerprint for checkpoint compatibility (the sharded
    twin of verlet_solver._session_fingerprint; spill_cap/interpret are
    shape-carried or bit-neutral and deliberately absent; the refless
    trigger IS recorded — it changes the rebin schedule)."""
    return {
        "solver": "fused-pallas" if fused else
                  ("custom-stencils" if stencils is not None
                   else "xla-stencils"),
        "recovery": recover,
        "refless": refless,
    }


class ShardedSession:
    """Persistent multi-chip run over ``spec.n_devices`` spatial slabs.

    ``run(k)`` advances k steps as ONE scanned multi-device execution
    (collective rebins, ghost-column halos and the any-reduced trigger are all
    inside the program); ``run_frame``/``frame`` assemble a seamless RGB
    frame from per-slab raster strips; ``state()`` materializes the
    ORIGINAL-order FluidState on demand; ``save``/``restore`` round-trip
    the resident representation bitwise; ``export_run`` serializes the
    step program for retrace-free serving workers (utils/aot.py).
    """

    def __init__(self, state: FluidState | None, params: FluidParams,
                 cfg: IntegrateConfig, spec: sh.ShardSpec, mesh=None,
                 fused: bool = True, interpret: bool | None = None,
                 stencils=None, recover: bool = True,
                 spill_cap: int = shard_verlet.SPILL_CAP,
                 planar_rebin: bool | None = None,
                 init_chunks: int | None = None,
                 donate: bool = False,
                 segmented: bool | None = None,
                 refless_trigger: bool | None = None, _sim=None,
                 _n: int | None = None, _gen=None):
        """``planar_rebin``/``init_chunks``/``donate``/``segmented`` are
        the very-large-per-device-N knobs, the sharded twins of Session's
        (see models/verlet_solver.Session.__init__): plane-at-a-time
        collective rebin (bit-identical, lower rebin-peak HBM; default
        None auto-enables near the per-device HBM ceiling), chunked
        per-device init (O(m/K) sort transients), donation of the
        resident sim into ``run``'s dispatch (old and new dense planes
        never coexist — outside references to a previous ``sess.sim``
        are invalidated), and the segmented run driver (cond-free
        while_loop segments + the rebin as its own donated dispatch,
        ROTATED into the donor-chain form when refless — see
        shard_verlet.make_segmented; auto past the per-device segmented
        threshold).  For the top-of-HBM init use ``from_generator``
        (neither the [N] FluidState nor the [D, capacity] ShardedState
        ever exists on device)."""
        if mesh is None:
            mesh = sh.make_mesh(spec.n_devices)
        self.params = params
        self.cfg = cfg
        self.spec = spec
        self.mesh = mesh
        self.n = state.n if state is not None else int(_n)
        if planar_rebin is None:
            from ..models.verlet_solver import planar_rebin_default
            planar_rebin = planar_rebin_default(spec.local_grid)
        self.planar_rebin = planar_rebin
        if refless_trigger is None:
            from ..models.verlet_solver import refless_trigger_default
            refless_trigger = refless_trigger_default(spec.local_grid)
        self.refless_trigger = refless_trigger
        if segmented is None:
            from ..models.verlet_solver import segmented_run_default
            segmented = segmented_run_default(spec.local_grid)
        self.segmented = segmented
        bundle = shard_verlet.make_sharded_verlet_step(
            params, cfg, spec, mesh, stencils=stencils, fused=fused,
            interpret=interpret, n=self.n if recover else None,
            spill_cap=spill_cap, planar=planar_rebin,
            init_chunks=init_chunks, refless=refless_trigger,
            gen=_gen, gen_n=self.n if _gen is not None else None)
        init_fn, step_fn = bundle
        self._step = step_fn
        self._donate = donate
        self._make_segmented = bundle.make_segmented
        self._segmented_fns = None      # built lazily on first run
        self._interpret = interpret
        # kwargs needed to rebuild this session from a checkpoint
        # (planar_rebin is bit-neutral; init_chunks/donate are init/driver
        # knobs — refless_trigger alone enters the fingerprint)
        self._build_kw = dict(fused=fused, interpret=interpret,
                              stencils=stencils, recover=recover,
                              spill_cap=spill_cap,
                              refless_trigger=refless_trigger)
        # solver-knob fingerprint: save() records it, restore() rejects a
        # mismatched continuation (see utils.checkpoint.check_fingerprint)
        self._fingerprint = _sharded_fingerprint(fused, stencils, recover,
                                                 refless_trigger)

        @partial(jax.jit, static_argnums=1,
                 donate_argnums=(0,) if donate else ())
        def run_k(sim, k):
            return jax.lax.scan(lambda s, _: (step_fn(s), None), sim, None,
                                length=k)[0]

        @jax.jit
        def kick(sim, cx, cy, ux, uy, imp):
            # xd holds WORLD coordinates, so the impulse is elementwise on
            # the sharded dense planes — no collective, no per-slab origin.
            # Ghost-column copies get kicked too; harmless — they are
            # refreshed from their owner at the next step's halo exchange.
            from ..interact.impulse import apply_impulse_arrays
            vxd, vyd = apply_impulse_arrays(sim.xd, sim.yd, sim.vxd,
                                            sim.vyd, cx, cy, ux, uy, imp)
            live = sim.xd < FAR * 0.5
            return dataclasses.replace(sim,
                                       vxd=jnp.where(live, vxd, 0.0),
                                       vyd=jnp.where(live, vyd, 0.0))

        self._run_k = run_k
        self._kick = kick
        self._extract = jax.jit(lambda sim: shard_verlet.extract_fluid_state(
            sim, spec, params, self.n))
        self._frames: dict = {}      # (px_per_cell, mode) -> jitted fns
        # XLA:CPU collectives deadlock when several multi-device
        # executions overlap on low-core hosts; serialize there.
        self._sync = jax.default_backend() != "tpu"
        if state is not None:
            self.sim = init_fn(sh.shard_state(state, spec))
        elif _gen is not None:
            self.sim = init_fn(jnp.int32(0))
        else:
            self.sim = _sim
        if self._sync:
            jax.block_until_ready(self.sim.xd)

    @classmethod
    def from_generator(cls, gen, n: int, params: FluidParams,
                       cfg: IntegrateConfig, spec: sh.ShardSpec, mesh=None,
                       init_chunks: int = 16, donate: bool = True,
                       **kw) -> "ShardedSession":
        """Session whose initial scene is COMPUTED chunk-by-chunk per
        device by ``gen`` (see ``core.state.lattice_gen`` and
        ``shard_verlet.make_sharded_verlet_step``'s gen path) — the
        top-of-per-device-HBM init: neither the [N] FluidState nor the
        [D, capacity] ShardedState ever exists on device (together ~6-8
        GiB coexisting with the dense planes at 128M/device — the init
        OOM this path removes).  Bitwise the ShardedSession(state) init
        for the same scene.  Defaults flip to the very-large-N posture
        (``init_chunks=16``, ``donate=True``)."""
        return cls(None, params, cfg, spec, mesh=mesh,
                   init_chunks=init_chunks, donate=donate,
                   _gen=gen, _n=n, **kw)

    # ---- stepping -------------------------------------------------------

    def run(self, n_steps: int, chunk: int | None = None) -> None:
        """Advance n_steps: one compiled multi-device dispatch.

        ``chunk=K`` splits the work into ceil(n/K) sequential K-step
        dispatches of one reused program — the long-dispatch RPC-deadline
        mitigation for tunneled rigs at very large per-device N (the same
        contract as Session.run(chunk=), bitwise-identical trajectory)."""
        if self.segmented:
            self._run_segmented(n_steps, chunk)
        elif chunk is None or chunk >= n_steps:
            self.sim = self._run_k(self.sim, n_steps)
        else:
            done = 0
            while done < n_steps:
                k = min(chunk, n_steps - done)
                self.sim = self._run_k(self.sim, k)
                done += k
        if self._sync:
            jax.block_until_ready(self.sim.xd)

    def _run_segmented(self, n_steps: int, chunk: int | None) -> None:
        """The sharded HBM-ceiling run driver (auto past the per-device
        segmented threshold): the rebin runs as its OWN donated dispatch
        at the jit top level (ROTATED when refless — apply outputs land
        in the previous plane's dead buffers, rho seeding the chain, so
        no full-plane copies) and the hot while_loop program carries no
        rebin cond.  Bitwise the standard scan's trajectory — dispatched
        exactly when a step's pre-check would have rebinned."""
        if self._segmented_fns is None:
            self._segmented_fns = self._make_segmented(self._donate)
            if self._segmented_fns[2]:
                from jax.sharding import NamedSharding, PartitionSpec as P
                g = self.spec.local_grid
                shape = (self.spec.n_devices, g.ny_pad, g.cap, g.nx_pad)
                sh = NamedSharding(self.mesh, P(shard_verlet.AXIS))
                self._rho_zeros = jax.jit(
                    lambda: jnp.zeros(shape, jnp.float32),
                    out_shardings=sh)
                # the rotated rebin returns idx as an f32 bitcast (it
                # rides vyd's donated buffer); restore s32 in a separate
                # dispatch against the drained arena
                self._idx_back = jax.jit(
                    lambda a: jax.lax.bitcast_convert_type(a, jnp.int32))
        step_until, rebin_one, rotated = self._segmented_fns
        cap = n_steps if chunk is None else chunk
        done = 0
        while done < n_steps:
            k = min(cap, n_steps - done)
            self.sim, did, need = step_until(self.sim, jnp.int32(k))
            done += int(did)
            if done < n_steps and bool(need):
                if rotated:
                    s = self.sim
                    rest = (s.occ, s.disp2, s.alive, s.age, s.overflow,
                            s.lost, s.dropped, s.rebin_count, s.step,
                            s.sx, s.sy, s.svx, s.svy, s.sidx,
                            s.readmitted)
                    out = rebin_one(s.rho_d, s.xd, s.yd, s.vxd, s.vyd,
                                    s.idx_d, rest)
                    del s
                    self.sim = None     # drop old idx ref before fresh rho
                    # drain the rebin before allocating the fresh rho: the
                    # async zeros dispatch otherwise overlaps the rebin's
                    # still-live non-donated input + temps (measured: the
                    # 160M/device run cleared rebin_one and then
                    # RESOURCE_EXHAUSTED exactly here)
                    jax.block_until_ready(out.xd)
                    self.sim = dataclasses.replace(
                        out, rho_d=self._rho_zeros(),
                        idx_d=self._idx_back(out.idx_d))
                else:
                    self.sim = rebin_one(self.sim)

    def _frame_fns(self, px_per_cell: int, mode: str):
        key = (px_per_cell, mode)
        if key not in self._frames:
            frame_fn = shard_render.make_sharded_frame(
                self.params, self.spec, self.mesh, px_per_cell=px_per_cell,
                mode=mode, interpret=self._interpret)

            @partial(jax.jit, static_argnums=1)
            def run_frame(sim, k):
                sim = jax.lax.scan(lambda s, _: (self._step(s), None), sim,
                                   None, length=k)[0]
                return sim, frame_fn(sim)

            @partial(jax.jit, static_argnums=(1, 2))
            def run_frames(sim, f, k):
                def body(s, _):
                    s = jax.lax.scan(lambda s2, _: (self._step(s2), None),
                                     s, None, length=k)[0]
                    return s, frame_fn(s)
                return jax.lax.scan(body, sim, None, length=f)

            self._frames[key] = (frame_fn, run_frame, run_frames)
        return self._frames[key]

    def run_frame(self, substeps: int = 16, px_per_cell: int = 2,
                  mode: str = "density"):
        """substeps + per-slab raster strips in ONE dispatch; returns the
        assembled uint8 [H, W, 3] frame (W spans every device's slab)."""
        _, run_frame, _ = self._frame_fns(px_per_cell, mode)
        self.sim, img = run_frame(self.sim, substeps)
        if self._sync:
            jax.block_until_ready(img)
        return img

    def run_frames(self, n_frames: int, substeps: int = 16,
                   px_per_cell: int = 2, mode: str = "density"):
        """``n_frames`` frames in ONE multi-device dispatch (the batched
        throughput path — see ``verlet_solver.Session.run_frames``):
        stacked uint8 ``[n_frames, H, W, 3]``, same trajectory bitwise as
        sequential ``run_frame`` calls, frame bytes to ±1 rounding."""
        _, _, run_frames = self._frame_fns(px_per_cell, mode)
        self.sim, imgs = run_frames(self.sim, n_frames, substeps)
        if self._sync:
            jax.block_until_ready(imgs)
        return imgs

    def frame(self, px_per_cell: int = 2, mode: str = "density"):
        """Raster only (no stepping) from the resident state."""
        frame_fn, _, _ = self._frame_fns(px_per_cell, mode)
        img = frame_fn(self.sim)
        if self._sync:
            jax.block_until_ready(img)
        return img

    def kick(self, x: float, y: float, dir_x: float, dir_y: float,
             impulse: float | None = None) -> None:
        """Pointer-drag impulse (reference: examples/sph2d_cpu_demo.rs
        :135-140 semantics), applied across every slab in place."""
        from ..interact.impulse import IMPULSE
        self.sim = self._kick(self.sim, x, y, dir_x, dir_y,
                              IMPULSE if impulse is None else impulse)
        if self._sync:
            jax.block_until_ready(self.sim.xd)

    # ---- extraction / persistence --------------------------------------

    def state(self) -> FluidState:
        """ORIGINAL-order per-particle FluidState (off the hot path)."""
        return self._extract(self.sim)

    def save(self, path: str) -> None:
        """Snapshot the resident representation (counters included)."""
        from ..utils import checkpoint
        checkpoint.save_sharded(path, self.sim, self.spec, self.params,
                                self.cfg, self.n,
                                fingerprint=self._fingerprint)

    @classmethod
    def restore(cls, path: str, mesh=None, **build_kw) -> "ShardedSession":
        """Rebuild a session from ``save``; continues bitwise-identically
        (tests/test_sharded_session.py).  ``build_kw`` forwards
        fused/interpret/stencils/recover/spill_cap to the constructor; a
        mismatch against the artifact's solver-knob fingerprint raises
        (legacy artifacts without one are accepted unchecked)."""
        from ..utils import checkpoint
        sim, spec, params, cfg, n = checkpoint.load_sharded(path)
        refless = build_kw.get("refless_trigger")
        if refless is None:
            from ..models.verlet_solver import refless_trigger_default
            refless = refless_trigger_default(spec.local_grid)
            build_kw["refless_trigger"] = refless
        checkpoint.check_fingerprint(
            checkpoint.load_fingerprint(path),
            _sharded_fingerprint(build_kw.get("fused", True),
                                 build_kw.get("stencils"),
                                 build_kw.get("recover", True),
                                 refless),
            "ShardedSession.restore")
        return cls(None, params, cfg, spec, mesh=mesh, _sim=sim, _n=n,
                   **build_kw)

    def validate(self, rel_tol: float | None = None,
                 acc_abs_tol: float | None = None,
                 raise_on_fail: bool = True):
        """In-engine runtime validation for the multi-chip run: extract in
        original order, drop non-resident particles (spilled/dropped ones
        surface at FAR), and run the full rho/p/acc kernels-vs-golden
        check (utils/validator.validate_accelerated — the reference's
        readback_and_compare, src/gpu/buffers.rs:554-695) on a
        reconstructed GLOBAL grid.  O(N^2) golden recompute: meant for
        moderate N or sampled calls, like the reference's 60-frame gate."""
        import numpy as np

        from ..utils import validator

        fs = self.state()
        live = np.asarray(fs.x) < FAR * 0.5
        fs = FluidState(**{k: jnp.asarray(np.asarray(getattr(fs, k))[live])
                           for k in ("x", "y", "vx", "vy", "ax", "ay",
                                     "rho", "p")},
                        step=fs.step)
        g = dataclasses.replace(self.spec.local_grid,
                                nx=self.spec.nx_local * self.spec.n_devices)
        kw = {}
        if rel_tol is not None:
            kw["rel_tol"] = rel_tol
        if acc_abs_tol is not None:
            kw["acc_abs_tol"] = acc_abs_tol
        return validator.validate_accelerated(fs, self.params, g,
                                              raise_on_fail=raise_on_fail,
                                              **kw)

    def export_run(self, n_steps: int, path: str, platforms=None,
                   allow_tpu_custom_calls: bool = False) -> None:
        """AOT artifact of ``run(n_steps)``: mesh shape, halos and the
        collective rebin bake into the program (utils/aot.py)."""
        from ..utils import aot
        aot.export_sharded_run(self._step, self.sim, n_steps, path,
                               platforms=platforms,
                               allow_tpu_custom_calls=allow_tpu_custom_calls)

    # ---- diagnostics ----------------------------------------------------

    @property
    def alive(self) -> list[int]:
        """Live particles per device."""
        return [int(c) for c in self.sim.alive]

    @property
    def overflow(self) -> int:
        return int(jnp.sum(self.sim.overflow))

    @property
    def dropped(self) -> int:
        return int(jnp.sum(self.sim.dropped))

    @property
    def lost(self) -> int:
        return int(jnp.sum(self.sim.lost))

    @property
    def suspended(self) -> int:
        return int(self.sim.suspended)

    @property
    def readmitted(self) -> int:
        return int(jnp.sum(self.sim.readmitted))

    @property
    def rebin_count(self) -> int:
        return int(jnp.max(self.sim.rebin_count))

    @property
    def step(self) -> int:
        return int(self.sim.step)
