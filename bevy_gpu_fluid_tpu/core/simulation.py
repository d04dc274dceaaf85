"""Simulation facade — the composition root.

The one-stop equivalent of the reference's ``GPUSPHPlugin`` (reference:
src/gpu/buffers.rs:731-870), which wired 7 startup systems, 3 update systems,
6 extract systems, ~20 prepare systems and 10 render-graph nodes.  Under
XLA there is nothing to wire — jit tracing builds the whole step DAG — so the
facade just bundles params + config + grid + solver choice behind a small
stateful API and keeps the step counter (the reference's ``SimStep``).

    sim = Simulation.dam_break()            # demo_block_5k scene
    sim.run(100)                            # 100 steps on-device
    sim.kick(1.0, 0.3, dir_x=0.6, dir_y=0.45)   # mouse-drag impulse
    frame = sim.frame()                     # on-device raster -> uint8 RGB

With ``solver="verlet"`` (the default) the facade holds a RESIDENT
``verlet_solver.Session`` internally: the dense slot state stays on device
across ``run``/``run_frame``/``run_frames``/``kick`` calls (no per-call
re-binning or extraction — the round-4 ~20x frame-path cliff), and the
per-particle ``FluidState`` materializes lazily on ``.state`` access.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Literal

import jax
import jax.numpy as jnp

from .params import FluidParams, IntegrateConfig, GridSpec2D
from .state import FluidState, init_grid


class Simulation:
    """Stateful convenience wrapper over the pure solver functions."""

    def __init__(self, state: FluidState, params: FluidParams,
                 cfg: IntegrateConfig, grid: GridSpec2D,
                 solver: Literal["verlet", "pallas", "xla",
                                 "golden"] = "verlet",
                 raster_width: int = 512, y_view_max: float | None = None,
                 validate_every: int = 0):
        self._session = None
        self._dirty = False
        self.state = state
        self.params = params
        self.cfg = cfg
        self.grid = grid
        self.solver = solver
        self._overflow = 0
        self.validate_every = validate_every
        self.last_parity = None
        self._raster_width = raster_width
        self._y_view_max = y_view_max
        self._steps_since_validate = 0
        self._rebuild()

    def _rebuild(self) -> None:
        """(Re)build the jitted step/raster closures from the CURRENT
        params/cfg/grid — called by __init__ and by load() so a restored
        checkpoint's physics actually takes effect."""
        from ..models import grid_solver, pallas_solver, verlet_solver
        from ..models import reference as golden
        from ..ops.binning import FAR, bin_particles, to_dense
        from ..render import raster

        def _bin_dense(s):
            b = bin_particles(s.x, s.y, self.grid, with_csr=False)
            return to_dense(b, s.x, fill=FAR), to_dense(b, s.y, fill=FAR)
        self._bin_dense = jax.jit(_bin_dense)
        self._dense_cache = None  # (state object, (xd, yd))

        params, cfg, grid, solver = self.params, self.cfg, self.grid, \
            self.solver
        self._raster = raster
        self.spec = raster.RasterSpec.fit(
            float(cfg.x_min), float(cfg.x_max), float(cfg.floor_y),
            self._y_view_max if self._y_view_max is not None
            else float(cfg.floor_y) + grid.ny * grid.cell_size,
            width=self._raster_width)
        spec = self.spec

        self._frame = jax.jit(
            lambda s, mode: raster.to_rgb8(
                raster.render(s, params, self.spec, mode)),
            static_argnums=1)

        if solver == "verlet":
            # RESIDENT engine: the dense slot state lives on device across
            # calls (the Session is the production shape — zero per-call
            # re-binning/extraction); splat-mode frames extract + render at
            # the SAME 512-wide spec geometry as the other solvers, inside
            # one dispatch, so interactive pointer mapping is unchanged.
            self._session = sess = verlet_solver.Session(
                self._state, params, cfg, grid)
            self._dirty = True          # dense re-bin reorders f32 sums
            pure_step, rebin_fn, need_fn = sess._parts
            n = self._state.n

            def stepf(s):
                s = jax.lax.cond(need_fn(s), rebin_fn, lambda t: t, s)
                return pure_step(s)

            def steps(sim, k):
                return jax.lax.scan(lambda s, _: (stepf(s), None), sim,
                                    None, length=k)[0]

            def to_state(sim):
                x, y, vx, vy, rho = verlet_solver.extract_fields(
                    sim, grid, params, n)
                return FluidState(
                    x=x, y=y, vx=vx, vy=vy, ax=jnp.zeros_like(x),
                    ay=jnp.zeros_like(x), rho=rho,
                    p=verlet_solver.eos_pressure(rho, params),
                    step=sim.step)

            @partial(jax.jit, static_argnums=(1, 2))
            def run_frame_splat(sim, k, mode):
                sim = steps(sim, k)
                img = raster.to_rgb8(
                    raster.render(to_state(sim), params, spec, mode))
                return sim, img

            @partial(jax.jit, static_argnums=(1, 2, 3))
            def run_frames_splat(sim, f, k, mode):
                def body(s, _):
                    s = steps(s, k)
                    return s, raster.to_rgb8(
                        raster.render(to_state(s), params, spec, mode))
                return jax.lax.scan(body, sim, None, length=f)

            self._run_frame_splat = run_frame_splat
            self._run_frames_splat = run_frames_splat
            self._run = None
            return

        self._session = None
        if solver == "golden":
            self._run = jax.jit(
                lambda s, n: (golden.multi_step(s, params, cfg, n), None),
                static_argnums=1)
        elif solver == "xla":
            self._run = jax.jit(
                lambda s, n: grid_solver.multi_step(s, params, cfg, grid, n),
                static_argnums=1)
        else:
            self._run = jax.jit(
                lambda s, n: pallas_solver.multi_step(s, params, cfg, grid, n),
                static_argnums=1)

        def _run_frame(s, n, mode):
            s, diag = self._run(s, n)
            return s, diag, self._frame(s, mode)
        # one dispatch per frame: step + raster fused (dispatch latency is
        # the FPS ceiling for small scenes on tunneled rigs)
        self._run_frame = jax.jit(_run_frame, static_argnums=(1, 2))

        def _run_frames(s, f, n, mode):
            def body(st, _):
                st, diag = self._run(st, n)
                ov = diag.overflow if diag is not None else jnp.int32(0)
                return st, (self._frame(st, mode), ov)
            s, (imgs, ovs) = jax.lax.scan(body, s, None, length=f)
            return s, imgs, jnp.max(ovs)
        # f frames in one dispatch (throughput mode): transport latency
        # amortizes over the batch — see Session.run_frames
        self._run_frames = jax.jit(_run_frames, static_argnums=(1, 2, 3))

    # ---- state / diagnostics (resident-aware) ---------------------------
    @property
    def state(self) -> FluidState:
        """The per-particle FluidState.  On the resident verlet engine this
        materializes from the dense slot state ON DEMAND (one dense->[N]
        scatter) and caches until the next step/kick — repeated access is
        free, but at very large N prefer the dense-side APIs
        (``frame(mode='field')``, ``run_frame``) which never materialize."""
        if self._session is not None and self._dirty:
            self._state = self._session.state()
            self._dirty = False
        return self._state

    @state.setter
    def state(self, value: FluidState) -> None:
        self._state = value
        self._dirty = False
        if self._session is not None:
            self._session.reset(value)   # fresh binning, programs reused

    @property
    def overflow(self) -> int:
        """Cumulative capacity-overflow count (0 in all standard scenes)."""
        if self._session is not None:
            return max(self._overflow, self._session.overflow)
        return self._overflow

    @overflow.setter
    def overflow(self, v: int) -> None:
        self._overflow = v

    # ---- scene builders -------------------------------------------------
    @staticmethod
    def dam_break(n: int = 5041, solver: str = "verlet",
                  cap: int = 8, **kw) -> "Simulation":
        """The reference demo scene: sqrt(n)-square block in the [-5, 3]
        bounce box (reference: SPHState::demo_block_5k + IntegrateConfig
        defaults)."""
        from ..models import grid_solver, verlet_solver
        side = int(math.isqrt(n))
        state = init_grid(side, side, 0.04)
        params = FluidParams.demo()
        cfg = IntegrateConfig.create()
        if solver == "verlet":
            grid = verlet_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0,
                                              cap=cap)
        else:
            grid = grid_solver.default_grid(0.045, -5.0, 3.0, y_max=4.0,
                                            cap=cap)
        return Simulation(state, params, cfg, grid, solver=solver, **kw)

    @staticmethod
    def pool(n: int = 102_400, aspect: float = 16.0, solver: str = "verlet",
             cap: int = 8, bounce: float = -0.5, max_depth_rows: int = 25,
             **kw) -> "Simulation":
        """Physically-sane production scene: a wide, shallow pool.

        The reference's deep-column dam break scales badly past ~1M
        particles: free-fall impact speeds exceed what its weak EOS (k=3)
        can decelerate within h, and its default bounce=-3 INJECTS energy
        on every wall contact (reference: src/cpu/sph2d.rs:199-220 —
        velocity x3).  This preset is the recommended large-N scene:
        aspect-ratio-wide block, dissipative bounce, box fitted with
        splash margins.  Depth is additionally capped at ``max_depth_rows``
        (default 25 rows = 1 world unit): the reference's weak EOS (k=3)
        reaches cell capacity under hydrostatic compression for pools much
        deeper than ~1 unit on a 1000s-of-steps timescale, so the aspect
        is widened as needed to keep long-horizon runs in the validated
        overflow-0 regime (a 25-row 102k pool ran 20k steps, overflow 0).
        See CLAUDE.md physics notes."""
        rows = max(4, min(int(math.sqrt(n / aspect)), max_depth_rows))
        cols = max(4, n // rows)
        state = init_grid(cols, rows, 0.04)
        params = FluidParams.demo()
        width = cols * 0.04
        height = rows * 0.04
        cfg = IntegrateConfig.create(x_min=-0.5, x_max=width + 0.5,
                                     bounce=bounce)
        y_max = height * 3.0 + 0.5
        from ..models import grid_solver, verlet_solver
        if solver == "verlet":
            grid = verlet_solver.default_grid(0.045, -0.5, width + 0.5,
                                              y_max=y_max, cap=cap)
        else:
            grid = grid_solver.default_grid(0.045, -0.5, width + 0.5,
                                            y_max=y_max, cap=cap)
        return Simulation(state, params, cfg, grid, solver=solver,
                          y_view_max=y_max, **kw)

    # ---- stepping / interaction / rendering -----------------------------
    def run(self, n_steps: int) -> FluidState:
        """Advance n_steps on-device (one compiled scan).

        With ``validate_every=K`` set, an O(N^2) golden-model spot check runs
        whenever K or more steps have accumulated since the last one — the
        opt-in analog of the reference's periodic ``readback_and_compare``
        system (reference: src/gpu/buffers.rs:554-695, hook at
        examples/sph2d_cpu_demo.rs:53).  Raises ParityError on violation; the
        last passing report is kept on ``self.last_parity``."""
        if self._session is not None:
            self._session.run(n_steps)
            self._dirty = True
        else:
            self._state, diag = self._run(self._state, n_steps)
            if diag is not None:
                self._overflow = max(self._overflow, int(diag.overflow))
        if self.validate_every > 0:
            self._steps_since_validate += n_steps
            if self._steps_since_validate >= self.validate_every:
                self._steps_since_validate = 0
                self.last_parity = self.validate()
        return self.state

    def validate(self, raise_on_fail: bool = True, mode: str = "full"):
        """One golden-model parity spot check.

        mode='full' (default for accelerated solvers): re-evaluate rho, p,
        AND accelerations through this simulation's production stencils at
        the current positions and diff against the O(N^2) golden model at
        the reference's in-engine tolerances (1% rel + 0.5 abs acc,
        reference: src/gpu/buffers.rs:564-567).  mode='fields': the cheaper
        rho/p-only check of the STORED fields (also what the golden solver
        gets — there is no accelerated path to cross-check there)."""
        from ..utils import validator
        if mode == "fields" or self.solver == "golden":
            return validator.validate_fields(self.state, self.params,
                                             raise_on_fail=raise_on_fail)
        from ..models import grid_solver, pallas_solver
        stencils = (grid_solver.XLA_STENCILS if self.solver == "xla"
                    else pallas_solver.make_stencils(self.grid))
        return validator.validate_accelerated(
            self.state, self.params, self.grid, stencils,
            raise_on_fail=raise_on_fail)

    def kick(self, x: float, y: float, dir_x: float, dir_y: float,
             impulse: float | None = None) -> None:
        """Inject a drag impulse (reference: apply_drag,
        examples/sph2d_cpu_demo.rs:112-141)."""
        if self._session is not None:
            kw = {} if impulse is None else {"impulse": impulse}
            self._session.kick(x, y, dir_x, dir_y, **kw)
            self._dirty = True
            return
        from ..interact import impulse as imp
        kw = {} if impulse is None else {"impulse": impulse}
        self._state = imp.apply_impulse(self._state, x, y, dir_x, dir_y,
                                        **kw)

    def frame(self, mode: str = "density"):
        """Rasterize the current state on-device; returns uint8 [H, W, 3].

        Modes: 'density' / 'const' (per-particle Poly6 splats, like the
        reference's sprites) or 'field' / 'field_const' (the scalable
        density-field raster — use for N >> 100k).  On the resident verlet
        engine the field modes render STRAIGHT from the dense slot state
        (zero binning, zero extraction — any N); on the other solvers they
        bin into the dense layout once per distinct state."""
        if mode.startswith("field"):
            fmode = "const" if mode == "field_const" else "density"
            if self._session is not None:
                return self._session.frame(px_per_cell=2, mode=fmode)
            from ..render import raster
            if (self._dense_cache is None
                    or self._dense_cache[0] is not self.state):
                self._dense_cache = (self.state,
                                     self._bin_dense(self.state))
            xd, yd = self._dense_cache[1]
            return raster.field_frame(
                xd, yd, self.params, self.grid, px_per_cell=2, mode=fmode)
        return self._frame(self.state, mode)

    def run_frame(self, substeps: int = 16, mode: str = "density"):
        """Advance ``substeps`` and rasterize, in ONE device dispatch.

        Splat modes render at the fixed 512-wide ``spec`` geometry; field
        modes ('field'/'field_const', resident verlet engine) render the
        grid-aligned density-field raster with no extraction at all."""
        if self._session is not None:
            sess = self._session
            if mode.startswith("field"):
                img = sess.run_frame(
                    substeps,
                    mode="const" if mode == "field_const" else "density")
            else:
                sess.sim, img = self._run_frame_splat(sess.sim, substeps,
                                                      mode)
            self._dirty = True
            return img
        self._state, diag, img = self._run_frame(self._state, substeps,
                                                 mode)
        if diag is not None:
            self._overflow = max(self._overflow, int(diag.overflow))
        return img

    def run_frames(self, n_frames: int, substeps: int = 16,
                   mode: str = "density"):
        """``n_frames`` frames in ONE device dispatch (throughput mode):
        the same trajectory (bitwise) as ``n_frames`` sequential
        ``run_frame`` calls, frames stacked as uint8
        ``[n_frames, H, W, 3]`` (bytes agree to ±1 rounding across the
        separately compiled programs) — the per-dispatch transport
        latency amortizes over the batch.  See
        ``verlet_solver.Session.run_frames`` for the resident-dense
        variant this mirrors."""
        if self._session is not None:
            sess = self._session
            if mode.startswith("field"):
                imgs = sess.run_frames(
                    n_frames, substeps,
                    mode="const" if mode == "field_const" else "density")
            else:
                sess.sim, imgs = self._run_frames_splat(
                    sess.sim, n_frames, substeps, mode)
            self._dirty = True
            return imgs
        self._state, imgs, ov = self._run_frames(self._state, n_frames,
                                                 substeps, mode)
        self._overflow = max(self._overflow, int(ov))
        return imgs

    def save(self, path: str) -> None:
        from ..utils import checkpoint
        checkpoint.save(path, self.state, self.params, self.cfg)

    def load(self, path: str) -> None:
        """Restore a checkpoint.  If the checkpoint carries params/cfg they
        REPLACE the simulation's and the jitted step closures are rebuilt —
        resuming a run saved under different physics must simulate that
        physics, not the constructor's (the binning grid is kept: it is
        static geometry; callers changing the box should construct a new
        Simulation)."""
        from ..utils import checkpoint
        state, params, cfg = checkpoint.load(path)
        if params is not None or cfg is not None:
            if params is not None:
                self.params = params
            if cfg is not None:
                self.cfg = cfg
            self._state = state          # _rebuild re-seeds the session
            self._dirty = False
            self._rebuild()
        else:
            self.state = state           # setter re-seeds via reset()
