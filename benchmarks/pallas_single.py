"""Benchmark the fused Pallas D-opt kernel on the reference's flagship
single-instance config: 30x1000, FW-away to slack 1e-8.

Reference numpy on this machine: 0.40 s / 5206 iterations (BASELINE.md).
Round-2 pre-block-exit kernel: ~1.0 s (launch round trips + full-chunk
runs past the stopping iteration).  This script measures the blocked
early-exit + device-resident-state version.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pallas_single.py
"""

import json
import time

import numpy as np


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from accbpg_and_fw_tpu.ops.pallas_dopt import dopt_fw_pallas

    m, n, seed, eps = 30, 1000, 10, 1e-8
    np.random.seed(seed)
    V = np.random.randn(m, n)
    x0 = np.full(n, 1.0 / n)

    # warmup/compile
    dopt_fw_pallas(V, x0, eps, 128, verbose=False)

    walls, iters = [], None
    for _ in range(3):
        t0 = time.time()
        x, F, SP, SN, T = dopt_fw_pallas(V, x0, eps, 200000, verbose=False)
        walls.append(time.time() - t0)
        iters = len(F)

    # certify: fresh f64 slack of the final iterate
    xs = np.maximum(x, 0.0)
    xs = xs / xs.sum()
    VXVT = (V * xs) @ V.T
    w = np.einsum("ij,ij->j", np.linalg.solve(VXVT, V), V)
    sp = w.max() / m - 1.0
    sn = 1.0 - w[xs > 1e-8].min() / m
    print(json.dumps({
        "config": f"{m}x{n} seed {seed} eps {eps}",
        "iters": iters,
        "walls_s": [round(w_, 4) for w_ in walls],
        "best_s": round(min(walls), 4),
        "us_per_iter": round(min(walls) / iters * 1e6, 2),
        "fresh_slack": [float(sp), float(sn)],
        "ref_numpy_s": 0.40,
        "speedup": round(0.40 / min(walls), 2),
    }))


if __name__ == "__main__":
    main()
