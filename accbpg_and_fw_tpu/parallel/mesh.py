"""Mesh construction and problem sharding.

The reference is single-process NumPy (SURVEY.md §2.6); this module is the
TPU-native distributed layer.  Sharding layout for every problem family:

* D-optimal design: H is m-by-n with n >> m.  H shards column-wise
  P(None, 'data'); the iterate x, the negative-gradient w and every other
  length-n vector shard P('data'); the Gram matrix H diag(x) H^T (m-by-m),
  its Cholesky/inverse and all scalars replicate.  The per-step collectives
  are then: one psum for the Gram accumulation (inserted by XLA inside the
  (H*x) @ H.T contraction), scalar psums inside the simplex-Newton
  multiplier solve, and a global arg-reduction for LMO / FW vertex picks.
* Regressions (Poisson/KL/logistic/SVM): A is m-by-n with m samples.  For
  sample-parallel scaling A shards row-wise P('data', None), b/y shard
  P('data'), and x replicates — gradients A^T r psum over the sample axis.

Because every algorithm step in this framework is pure jnp on pytree
oracles, the SAME step functions run sharded: placing the arrays with these
shardings and jitting is all that is needed (GSPMD propagates the rest).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..struct import replace


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize the multi-host JAX runtime (ICI within a slice, DCN across
    hosts).  No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices with one named axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_cols(H, x0, ndev):
    """Zero-pad design columns (and x entries) to a device-count multiple.

    Exactness: a zero column v = 0 with weight x = 0 contributes nothing to
    V diag(x) V^T, has gradient/w entry exactly 0, is never selected by the
    FW argmax (max w >= m >= 1 > 0) nor by the away argmin (masked on
    x > 1e-8), and x = 0 is a fixed point of every update (x * (1 -+ t)
    keeps 0; the Burg div_prox_map maps y = 0 to g + L/0 = inf and
    1/(inf + c) = 0).  So the padded problem's trajectory restricted to the
    first n coordinates IS the unpadded trajectory."""
    n = H.shape[1]
    rem = (-n) % ndev
    if rem:
        H = jnp.pad(jnp.asarray(H), ((0, 0), (0, rem)))
        x0 = jnp.pad(jnp.asarray(x0), (0, rem))
    return H, x0


def shard_dopt_problem(f, x0, mesh: Mesh, axis_name: str = "data",
                       pad: bool = True):
    """Place a DOptimalObj problem on a mesh: H columns and x shard over
    ``axis_name``; returns ``(f_sharded, x0_sharded)``.

    When n is not a multiple of the mesh size and ``pad=True`` (default),
    the design is zero-padded to the next multiple — exactly neutral for
    the D-opt solvers (see ``_pad_cols``); returned arrays have the padded
    length and the padding x entries stay identically 0 (slice them off
    with ``x[:n]``).  The zero-pad argument alone does NOT extend to
    ``h.prox_map`` used directly on arbitrary g (ABDA's dual averaging),
    so the returned oracle carries ``n_valid``: padded gradient entries
    report +1e30, which every prox maps to ~0 mass (DOptimalObj
    docstring) — ABDA on a padded mesh then matches the unpadded problem
    (tests/test_parallel.py::test_abda_padded_mesh).
    """
    ndev = int(mesh.shape[axis_name])
    H, x0 = jnp.asarray(f.H), jnp.asarray(x0)
    n = H.shape[1]
    n_valid = None
    if pad:
        H, x0 = _pad_cols(H, x0, ndev)
        if H.shape[1] != n:
            n_valid = n
    col_sharding = NamedSharding(mesh, P(None, axis_name))
    vec_sharding = NamedSharding(mesh, P(axis_name))
    H = jax.device_put(H, col_sharding)
    x0 = jax.device_put(x0, vec_sharding)
    if n_valid is None:
        # No padding occurred: don't require an n_valid field on the
        # oracle (DOptimalObjMixed/DOptimalObjDS carry H but not
        # n_valid; they remain shardable when n divides the mesh).
        return replace(f, H=H), x0
    if not hasattr(f, "n_valid"):
        raise ValueError(
            f"{type(f).__name__} has no n_valid field, so it cannot be "
            f"padded from n={n} to {H.shape[1]} safely (ABDA-style prox "
            "on duals would hand padded coordinates mass). Pass pad=False "
            "with a mesh-divisible n, or use DOptimalObj.")
    return replace(f, H=H, n_valid=n_valid), x0


def shard_dopt_design(V, x0, mesh: Mesh, axis_name: str = "data",
                      pad: bool = True):
    """Column-shard a raw design matrix + initial point for the
    ``D_opt_FW`` / ``D_opt_FW_away`` solvers, zero-padding n to a mesh-size
    multiple (exactly neutral; see ``_pad_cols``).  Returns
    ``(V_sharded, x0_sharded)``."""
    ndev = int(mesh.shape[axis_name])
    V, x0 = jnp.asarray(V), jnp.asarray(x0)
    if pad:
        V, x0 = _pad_cols(V, x0, ndev)
    V = jax.device_put(V, NamedSharding(mesh, P(None, axis_name)))
    x0 = jax.device_put(x0, NamedSharding(mesh, P(axis_name)))
    return V, x0


def shard_symnmf_problem(f, X0, mesh: Mesh, axis_name: str = "data"):
    """Place a SymNMF problem (FrobeniusSymLoss) on a mesh: the n x n
    similarity matrix M and the n x r factor X both shard row-wise over
    ``axis_name`` (M is the memory wall — n^2 entries; the factor is tiny).

    Per-step collectives under GSPMD: one all-gather of X (n*r values)
    feeding the row-local M @ X contraction, one psum for the r x r
    X^T X, and scalar psums for the kernel norms — all O(n*r + r^2)
    on the wire per iteration, never O(n^2)."""
    row_sharding = NamedSharding(mesh, P(axis_name, None))
    f = replace(f, M=jax.device_put(jnp.asarray(f.M), row_sharding))
    X0 = jax.device_put(jnp.asarray(X0), row_sharding)
    return f, X0


def shard_regression_problem(f, x0, mesh: Mesh, axis_name: str = "data"):
    """Place a row-major regression oracle (PoissonRegression, KLdivRegression,
    LogisticRegression, SVM_fun — fields A-or-X and b-or-y) on a mesh:
    samples shard over ``axis_name``, the iterate replicates."""
    row_sharding = NamedSharding(mesh, P(axis_name, None))
    vec_sharding = NamedSharding(mesh, P(axis_name))
    rep_sharding = NamedSharding(mesh, P())

    updates = {}
    for mat_field in ("A", "X"):
        if hasattr(f, mat_field) and getattr(f, mat_field) is not None:
            updates[mat_field] = jax.device_put(getattr(f, mat_field), row_sharding)
    for vec_field in ("b", "y"):
        if hasattr(f, vec_field) and getattr(f, vec_field) is not None:
            updates[vec_field] = jax.device_put(getattr(f, vec_field), vec_sharding)
    x0 = jax.device_put(x0, rep_sharding)
    return replace(f, **updates), x0
