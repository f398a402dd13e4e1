"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np

import jax.numpy as jnp

import accbpg_and_fw_tpu as acc
from accbpg_and_fw_tpu.ops.pallas_kernels import simplex_inv_multiplier_pallas
from accbpg_and_fw_tpu.ops.roots import simplex_inv_multiplier


def test_pallas_simplex_matches_xla():
    rng = np.random.default_rng(0)
    for n in (100, 200, 1000, 1111):  # incl. non-128-multiple
        gg64 = rng.standard_normal(n) * 3 + 1
        gg = jnp.asarray(gg64, jnp.float32)
        c_ref = float(simplex_inv_multiplier(gg, 1e-6))
        c_pal = float(simplex_inv_multiplier_pallas(gg, interpret=True))
        x = 1.0 / (np.asarray(gg, np.float64) + c_pal)
        assert abs(x.sum() - 1.0) < 1e-5, (n, c_pal)
        assert abs(c_ref - c_pal) <= 1e-3 * max(1.0, abs(c_ref))


def test_burg_simplex_pallas_prox_interpret(monkeypatch):
    # route the oracle's pallas branch through interpret mode on CPU
    import accbpg_and_fw_tpu.ops.pallas_kernels as pk
    import accbpg_and_fw_tpu.ops.h_oracles as ho

    orig = pk.simplex_inv_multiplier_pallas
    monkeypatch.setattr(pk, "simplex_inv_multiplier_pallas",
                        lambda gg: orig(gg, interpret=True))

    h_ref = acc.BurgEntropySimplex()
    h_pal = acc.BurgEntropySimplex(use_pallas=True)
    g = jnp.asarray(np.random.default_rng(1).standard_normal(96) + 2.0,
                    jnp.float32)
    x_ref = np.asarray(h_ref.prox_map(g, 1.0), np.float64)
    x_pal = np.asarray(h_pal.prox_map(g, 1.0), np.float64)
    assert abs(x_pal.sum() - 1.0) < 1e-5
    np.testing.assert_allclose(x_ref, x_pal, rtol=1e-3, atol=1e-6)
