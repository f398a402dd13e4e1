"""Scaling-efficiency harness: iterations/second vs device count.

BASELINE target: >= 80% iterations/s scaling efficiency at 2+ hosts for the
column-sharded D-opt workload.  On a single-chip or CPU host this script
still runs (virtual devices measure the sharding overhead, not real
speedup); on a real multi-chip slice it measures true scaling.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/scaling.py --devices 1 2 4 8
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def measure(m, n, ndev, iters=200):
    import accbpg_and_fw_tpu as acc
    from accbpg_and_fw_tpu.algorithms.d_opt import (
        _dopt_factorize,
        _make_dopt_step,
    )
    from accbpg_and_fw_tpu.algorithms.driver import _wrap_step
    from accbpg_and_fw_tpu.parallel import data_mesh, shard_dopt_problem
    from jax import lax

    f, h, L, x0 = acc.D_opt_design(m, n, randseed=10)
    if ndev > 1:
        mesh = data_mesh(jax.devices()[:ndev])
        f, x0 = shard_dopt_problem(f, x0, mesh)

    V = f.H
    H, w, logdet = _dopt_factorize(V, x0)
    step = _wrap_step(_make_dopt_step(V, 1e-12, away=True))
    carry = dict(done=jnp.asarray(False), x=jnp.asarray(x0), w=w, H=H,
                 logdet=logdet)

    def run(c):
        return lax.scan(step, c, jnp.arange(iters, dtype=jnp.int32))[0]

    compiled = jax.jit(run).lower(carry).compile()
    jax.block_until_ready(compiled(carry))  # warm
    t0 = time.time()
    jax.block_until_ready(compiled(carry))
    dt = time.time() - t0
    return iters / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=100)
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--devices", type=int, nargs="+", default=None)
    a = p.parse_args()

    counts = a.devices or sorted({1, len(jax.devices())})
    results = {}
    for nd in counts:
        if nd > len(jax.devices()):
            print(f"skip {nd} devices (only {len(jax.devices())} available)")
            continue
        rate = measure(a.m, a.n, nd, a.iters)
        results[nd] = rate
        base = results[min(results)]
        eff = rate / (base * nd / min(results))
        print(json.dumps({"devices": nd, "iters_per_s": round(rate, 1),
                          "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
