"""Sharded D-optimal design over a device mesh.

No reference equivalent (the reference is single-process NumPy —
SURVEY.md §2.6).  Shards the design matrix column-wise over all available
devices and runs the same solvers unchanged; on a CPU host run with

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/ex_multichip.py
"""

import numpy as np

import jax

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu.parallel import data_mesh, shard_dopt_problem


def start(m=40, n=1024, maxitrs=300, verbose=True):
    ndev = len(jax.devices())
    mesh = data_mesh()
    print(f"devices: {ndev}, mesh: {dict(mesh.shape)}")

    f, h, L, x0 = acc.D_opt_design(m, n, randseed=10)
    f_sh, x_sh = shard_dopt_problem(f, x0, mesh)

    x1, F1, _, _ = acc.BPG(f, h, L, x0, maxitrs=maxitrs, verbose=False)
    x2, F2, _, _ = acc.BPG(f_sh, h, L, x_sh, maxitrs=maxitrs, verbose=False)
    print(f"BPG single : F = {float(F1[-1]):.8e}")
    print(f"BPG sharded: F = {float(F2[-1]):.8e} "
          f"(max iterate diff {float(np.max(np.abs(np.asarray(x1) - np.asarray(x2)))):.2e})")

    xa, Fa, SP, SN, _ = acc.D_opt_FW_away(f_sh.H, x_sh, eps=1e-8,
                                          maxitrs=20 * maxitrs, verbose=False,
                                          chunk=1000)
    print(f"FW-away sharded: F = {float(Fa[-1]):.8e} slack=({float(SP[-1]):.1e},{float(SN[-1]):.1e})")
    return F1, F2, Fa


if __name__ == "__main__":
    start()
