"""Failure detection & elastic recovery (SURVEY §5.3 — new scope).

The reference has NO failure handling beyond cooperative cancellation
(integrator.h:290 cancel/timeout); multi-hour TPU jobs need more.  The
renderer's statelessness (every pass is a pure function of the seed,
SURVEY §5.4) makes recovery cheap, so the utilities here are thin and
composable rather than a framework:

- ``retry_pass``: re-execute a failed spp pass with the SAME seed
  (transient device/runtime errors) — identical results on success, no
  bias.  Persistent failures re-raise after ``max_retries``.
- ``spp_shard_render``: split a render into independent spp shards and
  retry each shard individually — a dead pass costs one shard re-run,
  not the whole frame (the elastic analogue of integrator.cpp:249-265
  multi-pass splitting).
- ``nan_guard_step``: production optimization guard — skip an optimizer
  step whose gradients are non-finite (divergent MC estimates, rare
  fireflies through near-specular chains) and report it, instead of
  poisoning the parameter state.
- ``CheckpointedLoop``: periodic orbax/npz checkpoint of the
  (params, opt-state, step) pytree + resume — a killed job continues
  from the last checkpoint with the same seed sequence (seeds derive
  from the step index, so the restarted trajectory is identical).
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .checkpoint import load_checkpoint, save_checkpoint
from .logging import Info, Warn, log


# exception classes that can plausibly be a transient device/runtime
# fault and are worth retrying; programming errors (TypeError, shape
# mismatches, tracer leaks) re-raise immediately so they surface at the
# first attempt instead of after max_retries backoffs
_TRANSIENT = (RuntimeError, OSError, ConnectionError, TimeoutError)


def _is_transient(e: Exception) -> bool:
    if isinstance(e, _TRANSIENT):
        return True
    # jaxlib's XlaRuntimeError doesn't always subclass RuntimeError
    # across versions — match by name to stay version-robust
    return type(e).__name__ in ("XlaRuntimeError", "InternalError",
                                "UnavailableError", "AbortedError")


def retry_pass(fn, *args, max_retries: int = 3, backoff: float = 0.5,
               _sleep=time.sleep):
    """Run ``fn(*args)`` (a jitted render pass), re-executing on runtime
    failure.  Deterministic: same args -> same result, so a retry after
    a transient fault is bit-identical to an untroubled run.  Only
    runtime/device fault classes are retried; deterministic programming
    errors (TypeError, ValueError, ...) propagate immediately."""
    err = None
    for attempt in range(max_retries + 1):
        try:
            out = fn(*args)
            jax.block_until_ready(out)
            return out
        except Exception as e:  # noqa: BLE001 — classify below
            if not _is_transient(e):
                raise
            err = e
            if attempt < max_retries:
                log(Warn, "render pass failed (%r); retry %d/%d",
                    e, attempt + 1, max_retries)
                _sleep(backoff * (2 ** attempt))
    raise err


def spp_shard_render(scene, integrator, seed: int, spp: int,
                     spp_per_shard: int, max_retries: int = 3,
                     _fail_hook=None):
    """Render ``spp`` samples as independent shards with per-shard
    retry; returns the developed image.  ``_fail_hook(shard_idx)`` is a
    test seam that may raise to simulate device faults."""
    from ..models.integrators.common import _render_pass

    assert spp % spp_per_shard == 0
    n_shards = spp // spp_per_shard

    def one(pass_index):
        if _fail_hook is not None:
            _fail_hook(pass_index)
        return _render_pass(scene, integrator, jnp.uint32(seed), spp,
                            spp_per_shard, pass_index)

    image = None
    for p in range(n_shards):
        img = retry_pass(one, p, max_retries=max_retries)
        image = img if image is None else image + img
    return scene.sensor.film.develop(image)


def nan_guard_step(opt, params, grads, state):
    """Apply an optimizer step only when every gradient leaf is finite;
    returns (params, state, ok).  A skipped step leaves params/state
    untouched (the MC estimate is redrawn next iteration)."""
    leaves = jax.tree_util.tree_leaves(grads)
    ok = all(bool(jnp.isfinite(g).all()) for g in leaves)
    if not ok:
        log(Warn, "non-finite gradients: skipping optimizer step")
        return params, state, False
    params, state = opt.step(params, grads, state)
    return params, state, True


class CheckpointedLoop:
    """Resumable optimization driver: checkpoints (params, opt state,
    step) every ``every`` steps and resumes from disk when present.

    >>> loop = CheckpointedLoop(path, every=10)
    >>> params, state, start = loop.resume(params, state)
    >>> for it in range(start, iters):
    ...     params, state, _ = nan_guard_step(opt, params, grads, state)
    ...     loop.maybe_save(it, params, state)
    """

    def __init__(self, path: str, every: int = 10):
        self.path = path
        self.every = int(every)
        self.best = float("inf")

    def resume(self, params, state):
        """Returns (params, state, start_step); fresh state when no
        checkpoint exists.

        Restored leaves are cast back to the ORIGINAL pytree's exact
        leaf types (python scalars stay python, dtypes/weak-types
        match): a leaf that changed aval across the save/load
        round-trip would silently retrace the jitted step, and a
        22-surface lens gradient re-traced on a resume costs ~10 min
        of remote compile per sensor (observed round 5 as a
        restart-livelock under the stall watchdog)."""
        like = {"params": params, "state": state,
                "step": jnp.zeros((), jnp.int32)}
        try:
            ck = load_checkpoint(self.path, like)
        except Exception:
            return params, state, 0
        step = int(ck["step"]) + 1
        log(Info, "resumed optimization at step %d from %s", step,
            self.path)

        def like_cast(saved, orig):
            if isinstance(orig, bool) or isinstance(orig, int) \
                    or isinstance(orig, float):
                return type(orig)(np.asarray(saved))
            o = jnp.asarray(orig)
            return jnp.asarray(saved, o.dtype)

        p2 = jax.tree_util.tree_map(like_cast, ck["params"], params)
        s2 = jax.tree_util.tree_map(like_cast, ck["state"], state)
        return p2, s2, step

    def maybe_save(self, step: int, params, state, metric=None):
        """Periodic rolling checkpoint; when ``metric`` is given, the
        lowest-metric state is ALSO kept at <path>.best — a diverging
        optimizer (round 5: the Nikon run walked away from its best
        loss and the rolling checkpoint had already overwritten it)
        can then be rolled back to its best visited point."""
        if metric is not None and float(metric) < self.best:
            self.best = float(metric)
            save_checkpoint(self.path + ".best", {
                "params": params, "state": state,
                "step": jnp.asarray(step, jnp.int32)})
        if (step + 1) % self.every == 0:
            save_checkpoint(self.path, {
                "params": params, "state": state,
                "step": jnp.asarray(step, jnp.int32)})
            return True
        return False
