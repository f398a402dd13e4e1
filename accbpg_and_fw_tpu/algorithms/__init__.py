"""Algorithm drivers (L1): scan-compiled iteration kernels.

Public names and signatures match /root/reference/accbpg/__init__.py:7-18.
"""

from .bpg import ABDA, ABPG, ABPG_expo, ABPG_gain, BPG
from .d_opt import D_opt_FW, D_opt_FW_away
from .driver import run_driver, scan_full, solver_device
from .extras import (
    AIBM,
    AdaptFGM,
    PrimalDualSwitchingGradientMethod,
    UniversalGM,
)
from .fw import (
    FW_alg_descent_step,
    FW_alg_div_step,
    FW_alg_L0_L1_shortest_step,
    FW_l0l1_log_and_linear_step,
    FW_l0l1_log_only,
)
from .theta import solve_theta

__all__ = [
    "BPG",
    "ABPG",
    "ABPG_expo",
    "ABPG_gain",
    "ABDA",
    "AIBM",
    "AdaptFGM",
    "UniversalGM",
    "PrimalDualSwitchingGradientMethod",
    "FW_alg_div_step",
    "FW_alg_descent_step",
    "FW_alg_L0_L1_shortest_step",
    "FW_l0l1_log_and_linear_step",
    "FW_l0l1_log_only",
    "D_opt_FW",
    "D_opt_FW_away",
    "solve_theta",
    "run_driver",
    "solver_device",
    "scan_full",
]
