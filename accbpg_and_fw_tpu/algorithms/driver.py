"""Chunked-scan execution engine for all iteration drivers.

The reference runs every algorithm as a Python ``for`` loop with per-iteration
NumPy calls (e.g. /root/reference/accbpg/algorithms.py:45-67).  Here every
algorithm is a *pure step function* ``step(carry, k) -> (carry, hist)`` that
is compiled once and executed on device as ``lax.scan`` chunks:

* one XLA computation per chunk of iterations — no per-iteration host
  round-trips, no retracing;
* early stopping with the reference's exact truncation semantics: a step
  records ``_stop`` in its history; iterations after the stop run through a
  ``lax.cond`` dead-branch (no compute) and are sliced off on host;
* wall-clock ``T`` arrays measured at chunk boundaries and interpolated
  within a chunk (the reference's ``T[k] = time.time() - start`` is the same
  signal at 1-iteration granularity);
* the verbose progress tables are re-printed from device history at chunk
  boundaries with the reference's formats.

Contract for step functions (cached form):
  ``step(cfg, problem, carry, k) -> (carry, hist)`` where ``step`` is a
  MODULE-LEVEL function, ``cfg`` is hashable static config, ``problem`` is a
  traced pytree (oracles + scalars) and
  carry: a dict pytree that must contain ``done`` (bool scalar);
  hist:  a dict of scalar arrays; must contain ``_stop`` (bool: the stopping
         criterion fired at this iteration; this iteration is the last one
         recorded, matching the reference's ``break`` placement).

Because the problem is a traced ARGUMENT (not a closure constant), compiled
chunk executables are cached per (step, cfg, chunk, avals+shardings) and
REUSED across solver calls with the same shapes — repeat solves, sweeps and
line-search studies pay the (remote) compile exactly once per process.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EXEC_CACHE: dict = {}


def _aval_key(tree):
    return tuple(
        (leaf.shape, str(leaf.dtype), getattr(leaf, "sharding", None))
        for leaf in jax.tree_util.tree_leaves(tree)
    ) + (jax.tree_util.tree_structure(tree),)


def _get_compiled_chunk(step, cfg, chunk, problem, carry):
    """Compiled scan-chunk executable, cached across driver invocations."""
    key = (step, cfg, chunk, _aval_key(problem), _aval_key(carry))
    if key not in _EXEC_CACHE:
        def run(problem, carry, k0, maxitrs):
            def body(c, k):
                # freeze past the stop flag OR past the iteration budget; only
                # the true stop criterion persists into the carry (a budget
                # freeze must not poison checkpoints resumed with more budget)
                frozen = c["done"] | (k >= maxitrs)
                c2, h = step(cfg, problem, c, k)
                h = dict(h)
                h["_valid"] = jnp.logical_not(frozen)
                c2 = dict(c2)
                c2["done"] = c["done"] | c2["done"] | h["_stop"]
                out = jax.tree_util.tree_map(
                    lambda old, new: jnp.where(frozen, old, new), c, c2
                )
                return out, h

            ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
            return lax.scan(body, carry, ks)

        _EXEC_CACHE[key] = (
            jax.jit(run)
            .lower(problem, carry, jnp.int32(0), jnp.int32(1))
            .compile()
        )
    return _EXEC_CACHE[key]


def _wrap_step(step):
    """Wrap a raw step so the carry freezes once carry['done'] is set.

    Masking is a per-leaf ``where`` select, NOT a ``lax.cond``: a cond whose
    branches thread a large carry forces XLA to materialize both branch
    results through the conditional inside the scan (measured ~60x slower on
    TPU for the D-opt state).  The select costs one extra pass over the
    carry; compute after the stop runs on frozen values and is discarded,
    and is bounded by one chunk because the host loop stops launching chunks
    once done.
    """

    def wrapped(carry, k):
        done = carry["done"]
        c2, h = step(carry, k)
        h = dict(h)
        h["_valid"] = jnp.logical_not(done)
        c2 = dict(c2)
        c2["done"] = done | c2["done"] | h["_stop"]
        out = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), carry, c2
        )
        return out, h

    return wrapped


def _save_checkpoint(path, carry, hists, bounds, ci):
    """Atomically persist carry + per-chunk history + wall-time bounds."""
    import os

    payload = {"__ci": np.asarray(ci), "__bounds": np.asarray(bounds),
               "__nchunks_done": np.asarray(len(hists))}
    for k, v in jax.device_get(carry).items():
        payload[f"c::{k}"] = np.asarray(v)
    if hists:
        for name in hists[0]:
            payload[f"h::{name}"] = np.concatenate([h[name] for h in hists])
    tmp = path + ".tmp.npz"  # np.savez appends .npz unless already present
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _load_checkpoint(path, carry_proto):
    """Load a checkpoint if present; returns (carry, hists, bounds, ci)."""
    import os

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        ci = int(z["__ci"])
        bounds = list(z["__bounds"])
        ndone = int(z["__nchunks_done"])
        carry = {}
        for k, proto in carry_proto.items():
            arr = z[f"c::{k}"]
            carry[k] = jnp.asarray(arr, jnp.asarray(proto).dtype)
        hists = []
        hist_names = [n[3:] for n in z.files if n.startswith("h::")]
        if ndone and hist_names:
            per = len(z[f"h::{hist_names[0]}"]) // ndone
            for c in range(ndone):
                hists.append({name: z[f"h::{name}"][c * per:(c + 1) * per]
                              for name in hist_names})
    return carry, hists, bounds, ci


def run_driver(
    step: Callable,
    carry: Dict,
    maxitrs: int,
    *,
    verbose: bool = True,
    verbskip: int = 1,
    header: Optional[str] = None,
    print_row: Optional[Callable] = None,
    chunk: Optional[int] = None,
    include_compile_time: bool = False,
    between_chunks: Optional[Callable] = None,
    checkpoint: Optional[str] = None,
    problem=None,
    cfg=None,
):
    """Run ``step`` for up to ``maxitrs`` iterations in compiled scan chunks.

    Two step forms are supported:
    * cached (preferred): ``problem`` is a traced pytree and ``step`` a
      module-level ``step(cfg, problem, carry, k)`` — the compiled chunk is
      cached across solver calls with matching shapes/shardings;
    * legacy closure: ``problem is None`` and ``step(carry, k)`` closes over
      its data — compiled fresh per invocation.

    ``between_chunks(carry, k_next) -> carry``, if given, runs on host
    between chunks (e.g. periodic state refactorization) — it must preserve
    the carry structure.

    ``checkpoint``: path of an ``.npz`` checkpoint.  After every chunk the
    full solver state (carry + history so far + consumed wall time) is
    saved there atomically; if the file already exists when the driver
    starts, the run RESUMES from it (the reference has no checkpointing —
    SURVEY.md §5 — its state died with the process).  Delete the file to
    start fresh.

    Returns ``(carry, hist, T)`` where ``hist`` maps each history name to a
    host numpy array truncated at the stopping iteration (inclusive), and
    ``T`` is the wall-time array with the reference's semantics.
    """
    if maxitrs <= 0:
        raise ValueError("maxitrs must be positive")
    if chunk is None:
        # fixed default (not min(maxitrs, .)) so different maxitrs with the
        # same shapes share one cached executable; iterations past maxitrs
        # are masked done inside the chunk
        chunk = int(max(verbskip, 256)) if problem is not None else int(
            min(maxitrs, max(verbskip, 256)))
    chunk = max(1, chunk if problem is not None else min(chunk, maxitrs))

    carry = jax.tree_util.tree_map(jnp.asarray, carry)
    if problem is not None:
        try:
            problem_arrays = jax.tree_util.tree_map(jnp.asarray, problem)
        except (TypeError, ValueError):
            # the problem holds non-array leaves — e.g. user-defined
            # plain-class oracles in the reference's subclassing style
            # (functions.py:10-24/199-235).  Those cannot cross the jit
            # boundary as arguments; fall back to the closure path (correct,
            # just compiled per invocation instead of cached).
            problem_arrays = None
        if problem_arrays is None:
            raw = step
            cfg_, prob_ = cfg, problem
            step = lambda c, k: raw(cfg_, prob_, c, k)  # noqa: E731
            chunk = max(1, min(chunk, maxitrs))
            problem = None
        else:
            problem = problem_arrays
    if problem is not None:
        exe = _get_compiled_chunk(step, cfg, chunk, problem, carry)

        def compiled(c, k0):
            return exe(problem, c, k0, jnp.int32(maxitrs))
    else:
        wrapped = _wrap_step(step)

        def run_chunk(c, k0):
            ks = k0 + jnp.arange(chunk, dtype=jnp.int32)
            return lax.scan(wrapped, c, ks)

        compiled = jax.jit(run_chunk).lower(carry, jnp.int32(0)).compile()

    nchunks = -(-maxitrs // chunk)
    if verbose and header:
        print(header)

    hists = []
    bounds = [0.0]
    ci0 = 0
    if checkpoint is not None:
        state = _load_checkpoint(checkpoint, carry)
        if state is not None:
            carry, hists, bounds, ci0 = state

    t0 = time.time() - bounds[-1]
    for ci in range(ci0, nchunks):
        carry, hist = compiled(carry, jnp.int32(ci * chunk))
        hist = jax.device_get(jax.block_until_ready(hist))
        bounds.append(time.time() - t0)
        hists.append(hist)

        if verbose and print_row is not None:
            t_a, t_b = bounds[-2], bounds[-1]
            for j in range(chunk):
                k = ci * chunk + j
                if k >= maxitrs or not bool(hist["_valid"][j]):
                    break
                if k % verbskip == 0:
                    row = {name: v[j] for name, v in hist.items()}
                    print_row(k, row, t_a + (t_b - t_a) * j / chunk)

        if checkpoint is not None:
            _save_checkpoint(checkpoint, carry, hists, bounds, ci + 1)
        if bool(jax.device_get(carry["done"])):
            break
        if between_chunks is not None:
            carry = between_chunks(carry, (ci + 1) * chunk)

    # concatenate + truncate with the reference's inclusive-stop semantics
    full = {
        name: np.concatenate([h[name] for h in hists])
        for name in hists[0].keys()
    }
    valid = full.pop("_valid")
    n = int(valid.sum())
    n = min(n, maxitrs)
    out = {name: v[:n] for name, v in full.items()}
    out.pop("_stop", None)

    # wall-time interpolation at chunk granularity
    T = np.zeros(n)
    for ci in range(len(hists)):
        a, b = ci * chunk, min((ci + 1) * chunk, n)
        if a >= n:
            break
        t_a, t_b = bounds[ci], bounds[ci + 1]
        T[a:b] = t_a + (t_b - t_a) * (np.arange(a, b) - a) / chunk
    out["T"] = T
    return carry, out, T


def scan_full(step, carry, num_iters: int):
    """Fully-jitted alternative: run ``num_iters`` iterations as ONE scan.

    No host loop, no early exit — the form used by benchmarks, multi-chip
    dryruns and anything that wants a single XLA computation.
    """
    carry = jax.tree_util.tree_map(jnp.asarray, carry)
    wrapped = _wrap_step(step)

    def run(c):
        return lax.scan(wrapped, c, jnp.arange(num_iters, dtype=jnp.int32))

    return jax.jit(run)(carry)
