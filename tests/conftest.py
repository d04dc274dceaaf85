"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must run headless without TPU hardware (the reference had the same
story: only its CPU unit tests ran in CI, reference: .github/workflows/ci.yml).
Multi-chip sharding tests use the 8 virtual CPU devices.
"""

import os

# Must be set before the first backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Overrides the axon/TPU plugin the image forces via JAX_PLATFORMS.
jax.config.update("jax_platforms", "cpu")

# Warm compile cache across test runs (XLA CPU compiles of the interpreted
# Pallas parity suites are the bulk of suite wall time).
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

SVERLET_STEPS = 25
SVERLET_EXTRA_STEPS = 10  # continuation tail used by the re-shard gates


@pytest.fixture(scope="session")
def sverlet_d4():
    """ONE shared D=4 multi-chip scene, run through every solver the
    multi-chip gates compare (the D=4 compiles + stepwise block_until_ready
    loops on this 1-core rig are the dominant suite cost, so the
    test_shard_verlet*.py files all draw on this single fixture).

    Scene: a wide shallow block spanning ALL FOUR slabs (80 x 8 lattice,
    x in [-0.98, 2.18]), kicked right at 3.0 — migration crosses every
    interior slab boundary and several collective rebins fire within
    SVERLET_STEPS steps.

    Returns dict with keys:
      'spec', 'state', 'n'  — decomposition, initial state, particle count
      'xla'    — ShardedDenseSim after the sharded-verlet run, XLA stencils
      'pallas' — same, on the FUSED hardware path (Pallas density + fused
                 forces+integrate kernel, interpret mode) — the exact code
                 the perf claims rest on
      'eager'  — (ShardedState, ShardDiag) after the eager sharded run
      'single' — FluidState after the single-chip verlet flagship run on
                 the equivalent (same cell size) global grid
    """
    import jax.numpy as jnp

    import bevy_gpu_fluid_tpu as bgf
    from bevy_gpu_fluid_tpu.models import verlet_solver
    from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet

    params = bgf.FluidParams.demo()
    cfg = bgf.IntegrateConfig.create(x_min=-1.0, x_max=2.5)
    spec = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                 y_max=3.0, n_devices=4, capacity=1024)
    mesh = shard.make_mesh(4)

    state = bgf.init_grid(80, 8, 0.04)
    state = state.replace(x=state.x - 0.98,
                          vx=jnp.full((state.n,), 4.0))

    def run_sharded(**kw):
        init_fn, step_fn = shard_verlet.make_sharded_verlet_step(
            params, cfg, spec, mesh, **kw)
        sim = init_fn(shard.shard_state(state, spec))
        for _ in range(SVERLET_STEPS):
            sim = step_fn(sim)
            # low-core hosts: one multi-device execution in flight at a time
            jax.block_until_ready(sim.xd)
        return sim

    runs = {"spec": spec, "state": state, "n": state.n, "params": params,
            "cfg": cfg}
    runs["xla"] = run_sharded()
    runs["pallas"] = run_sharded(fused=True, interpret=True)

    eager = shard.make_sharded_step(params, cfg, spec, mesh)
    se = shard.shard_state(state, spec)
    diag = None
    for _ in range(SVERLET_STEPS):
        se, diag = eager(se)
        jax.block_until_ready(se.x)
    runs["eager"] = (se, diag)

    grid1 = verlet_solver.default_grid(0.045, -1.0, 2.5, y_max=3.0, cap=8)
    single, sdiag, _ = jax.jit(lambda s: verlet_solver.multi_step(
        s, params, cfg, grid1, SVERLET_STEPS))(state)
    assert int(sdiag.overflow) == 0
    runs["single"] = single
    return runs


@pytest.fixture(scope="session")
def sverlet_d2(sverlet_d4):
    """The shared sverlet_d4 scene re-run at D=2 (the other half of the
    re-shard identity gates — session-scoped so every module comparing
    decompositions draws on ONE run).  Returns (spec2, init2, step2,
    state_at[SVERLET_STEPS], state_at[SVERLET_STEPS + EXTRA])."""
    import jax

    from bevy_gpu_fluid_tpu.parallel import shard, shard_verlet

    runs = sverlet_d4
    spec2 = shard.ShardSpec.build(h=0.045 * 1.5, x_min=-1.0, x_max=2.5,
                                  y_max=3.0, n_devices=2, capacity=4096)
    mesh2 = shard.make_mesh(2)
    init2, step2 = shard_verlet.make_sharded_verlet_step(
        runs["params"], runs["cfg"], spec2, mesh2)
    sim = init2(shard.shard_state(runs["state"], spec2))
    snap = None
    for i in range(SVERLET_STEPS + SVERLET_EXTRA_STEPS):
        sim = step2(sim)
        jax.block_until_ready(sim.xd)
        if i == SVERLET_STEPS - 1:
            snap = shard_verlet.extract_fluid_state(
                sim, spec2, runs["params"], runs["n"])
    final = shard_verlet.extract_fluid_state(sim, spec2, runs["params"],
                                             runs["n"])
    assert int(sim.dropped.sum()) == 0 and int(sim.overflow.max()) == 0
    return spec2, init2, step2, snap, final
