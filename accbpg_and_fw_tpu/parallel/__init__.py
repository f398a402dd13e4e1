"""Distributed layer (absent in the reference — SURVEY.md §2.6).

Scale dimension of this workload is n (design points / samples / columns):
problems shard column-wise over a device mesh, the m-by-m Gram matrices and
all solver scalars replicate, and XLA inserts the psum / all-gather /
arg-reduction collectives automatically under jit.
"""

from .mesh import (
    data_mesh,
    distributed_init,
    shard_dopt_design,
    shard_dopt_problem,
    shard_regression_problem,
    shard_symnmf_problem,
)
from .batched import vmap_solver

__all__ = [
    "data_mesh",
    "distributed_init",
    "shard_dopt_design",
    "shard_dopt_problem",
    "shard_regression_problem",
    "shard_symnmf_problem",
    "vmap_solver",
]
