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


def shard_dopt_problem(f, x0, mesh: Mesh, axis_name: str = "data"):
    """Place a DOptimalObj problem on a mesh: H columns and x shard over
    ``axis_name``; returns ``(f_sharded, x0_sharded)``.

    Requires n % mesh_size == 0 for an even layout (pad the design upstream
    otherwise — D-opt is invariant to zero-weight padding columns only if
    their x entries stay 0, so prefer true divisibility).
    """
    col_sharding = NamedSharding(mesh, P(None, axis_name))
    vec_sharding = NamedSharding(mesh, P(axis_name))
    H = jax.device_put(f.H, col_sharding)
    x0 = jax.device_put(x0, vec_sharding)
    return replace(f, H=H), x0


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
