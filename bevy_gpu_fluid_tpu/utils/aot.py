"""Ahead-of-time program export for serving deployments (jax.export).

Every jitted program in this framework must be re-TRACED in each fresh
process before the persistently-cached XLA compile can even be looked up
— and tracing+lowering the large verlet step graphs costs minutes of
single-core Python (measured: ~100 s for the XLA-stencil step on the CI
rig; the persistent compile cache cannot help, it only skips the XLA
compile AFTER lowering).  For a serving fleet that restarts workers, that
is the cold-start.  This module serializes the traced StableHLO once, at
build time; a worker deserializes and calls it with ZERO retracing.

The reference has no deployment story at all (its pipeline cache is
in-process only, /root/reference/src/gpu/pipeline.rs warmup); this is the
TPU-native equivalent of shipping a precompiled engine.

Contract and caveats:

* Pytrees cross the boundary as FLATTENED leaves: the artifact stores the
  program over leaf arrays only, so no pytree registration has to be
  serialized.  ``load_exported`` re-flattens call args with the CURRENT
  class definitions — loading is only valid against the same field
  ordering the artifact was built with (the dataclasses in ``core/`` and
  ``models/`` are append-only for this reason; a mismatch fails shape
  checking at call time rather than silently permuting fields).
* Artifacts are platform-checked by XLA: export under TPU runs on TPU.
  Pass ``platforms=("cpu", "tpu")`` to build one artifact for both (the
  program is lowered once per platform).
* Pallas kernels lower to ``tpu_custom_call``, whose Mosaic payload is
  tied to the exporting libtpu — jax.export refuses to serialize it
  unless explicitly waived.  ``allow_tpu_custom_calls=True`` opts in;
  such an artifact is valid for the exporting toolchain version only
  (fine for a pinned fleet; re-export on upgrades).  CPU/interpret-mode
  programs contain no custom calls and are portable across versions
  within jax.export's compatibility window.
* MULTI-CHIP programs export too: shardings ride along automatically
  (``exported_bytes`` copies each example leaf's ``NamedSharding`` into
  its spec, so the shard_map collectives and the mesh shape are baked
  into the artifact — ``nr_devices`` is recorded and enforced at call
  time).  ``export_sharded_run`` packages a sharded-verlet step program;
  the worker must call it with arrays sharded over an identically-shaped
  mesh (tests/test_aot.py proves D=2 bitwise round-trip on the CPU mesh).
"""

from __future__ import annotations

import jax
from jax import export as jexport
from jax import tree_util


def exported_bytes(fn, *example_args, platforms=None,
                   allow_tpu_custom_calls: bool = False) -> bytes:
    """Trace ``fn`` at ``example_args``'s shapes and serialize the program.

    ``fn`` takes and returns arbitrary pytrees of arrays; the artifact
    itself is over flattened leaves (see module docstring).  ``platforms``
    defaults to the current backend.
    """
    leaves, in_tree = tree_util.tree_flatten(example_args)

    def flat_fn(*flat):
        args = tree_util.tree_unflatten(in_tree, flat)
        out = fn(*args)
        return tuple(tree_util.tree_leaves(out))

    def spec_of(l):
        l = jax.numpy.asarray(l)
        # carry the leaf's sharding into the artifact (multi-chip export:
        # the mesh shape + in/out shardings become part of the program)
        sharding = getattr(l, "sharding", None)
        if sharding is not None and not isinstance(
                sharding, jax.sharding.NamedSharding):
            sharding = None        # single-device default: let export infer
        return jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sharding)

    specs = [spec_of(l) for l in leaves]
    checks = ([jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if allow_tpu_custom_calls else [])
    exp = jexport.export(jax.jit(flat_fn), platforms=platforms,
                         disabled_checks=checks)(*specs)
    return exp.serialize()


def save_exported(path: str, fn, *example_args, platforms=None,
                  allow_tpu_custom_calls: bool = False) -> None:
    """``exported_bytes`` to a file."""
    data = exported_bytes(fn, *example_args, platforms=platforms,
                          allow_tpu_custom_calls=allow_tpu_custom_calls)
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str, out_like=None):
    """Deserialize an artifact into a callable — NO retracing.

    The callable takes the same pytree arguments the program was exported
    with.  Outputs are returned restructured like ``out_like`` if given
    (e.g. a ``DenseSim`` template for a step program), else as the flat
    tuple of leaves.  The first call XLA-compiles the deserialized
    StableHLO (a persistent-cache hit when the exporting machine shares
    the cache); subsequent calls dispatch directly.
    """
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    out_tree = (None if out_like is None
                else tree_util.tree_structure(out_like))

    def call(*args):
        flat = tree_util.tree_leaves(args)
        out = exp.call(*flat)
        return (out if out_tree is None
                else tree_util.tree_unflatten(out_tree, list(out)))

    call.platforms = exp.platforms
    return call


def export_session_run(sess, n_steps: int, path: str, platforms=None,
                       allow_tpu_custom_calls: bool = False) -> None:
    """Export a Session's ``run(n_steps)`` program: DenseSim -> DenseSim.

    The serving shape of the framework: a worker restores the resident
    state (``checkpoint.load_dense``), loads this artifact, and streams
    ``n_steps``-sized dispatches without ever tracing the step.  Load
    with ``load_exported(path, out_like=sess.sim)``.
    """
    save_exported(path, lambda sim: sess._run_k(sim, n_steps), sess.sim,
                  platforms=platforms,
                  allow_tpu_custom_calls=allow_tpu_custom_calls)


def export_sharded_run(step_fn, sim, n_steps: int, path: str,
                       platforms=None,
                       allow_tpu_custom_calls: bool = False) -> None:
    """Export ``n_steps`` applications of a sharded-verlet ``step_fn``
    (from ``parallel.shard_verlet.make_sharded_verlet_step``) at ``sim``'s
    shapes AND shardings: ShardedDenseSim -> ShardedDenseSim.

    The artifact records the mesh size (``nr_devices``); a worker builds
    the same-shape mesh, restores the sharded state
    (``checkpoint.load_sharded``), and calls with its leaves — collectives
    (ppermute halos, psum'd rebin trigger) are baked into the program, so
    the multi-chip serving path is retrace-free end to end.

    The steps run under one ``lax.scan`` (same shape as
    tools/bench_sharded.py's run_k), so the artifact is one multi-device
    execution per call regardless of ``n_steps``.
    """
    def run(s):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), s, None,
                            length=n_steps)[0]

    save_exported(path, run, sim, platforms=platforms,
                  allow_tpu_custom_calls=allow_tpu_custom_calls)
