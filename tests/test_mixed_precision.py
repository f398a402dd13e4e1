"""Exact-accumulation int8 digit contraction tests (ops/mixed_precision.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accbpg_and_fw_tpu.ops.mixed_precision import (
    digit_split_matrix,
    digit_split_vector,
    ozaki_gemv,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(300) * rng.uniform(0.1, 10, 300)
    B = rng.standard_normal((300, 700)) * rng.uniform(0.5, 2, 700)
    return a, B


def test_split_reconstructs(problem):
    a, B = problem
    digits, s = digit_split_vector(jnp.asarray(a), 7)
    recon = sum(np.asarray(digits[p], np.float64) * 64.0 ** -(p + 1)
                for p in range(7)) * float(s)
    assert np.max(np.abs(recon - a)) <= np.max(np.abs(a)) * 64.0**-7

    digitsB, sB = digit_split_matrix(jnp.asarray(B), 7)
    reconB = sum(np.asarray(digitsB[p], np.float64) * 64.0 ** -(p + 1)
                 for p in range(7)) * np.asarray(sB)
    assert np.max(np.abs(reconB - B)) <= np.max(np.abs(B)) * 64.0**-6


def test_digits_fit_int8(problem):
    a, B = problem
    digits, _ = digit_split_vector(jnp.asarray(a), 7)
    assert int(jnp.max(jnp.abs(digits.astype(jnp.int32)))) <= 64


def test_gemv_near_f64(problem):
    a, B = problem
    u_true = a @ B
    digitsB, sB = digit_split_matrix(jnp.asarray(B), 7)
    u = np.asarray(jax.jit(
        lambda a: ozaki_gemv(a, digitsB, sB, levels_a=7, max_diag=6)
    )(jnp.asarray(a)))
    rel = np.max(np.abs(u - u_true)) / np.max(np.abs(u_true))
    assert rel < 1e-10


def test_dopt_mixed_matches_exact():
    import accbpg_and_fw_tpu as acc

    f, h, L, x0 = acc.D_opt_design(20, 100, randseed=3)
    V = np.asarray(f.H)
    r_exact = acc.D_opt_FW_away(V, x0, eps=1e-7, maxitrs=2000, verbose=False,
                                chunk=500, u_mode="exact")
    r_mixed = acc.D_opt_FW_away(V, x0, eps=1e-7, maxitrs=2000, verbose=False,
                                chunk=500, u_mode="mixed")
    # both converge; final objectives agree to the digit-truncation level
    assert abs(float(r_exact[1][-1]) - float(r_mixed[1][-1])) < 1e-8
    assert r_mixed[2][-1] <= 1e-7 and r_mixed[3][-1] <= 1e-7

def test_packed_gemv_matches_loop(problem):
    a, B = problem
    from accbpg_and_fw_tpu.ops.mixed_precision import (
        ozaki_gemv_packed,
        pack_digit_planes,
    )

    u_true = a @ B
    digitsB, sB = digit_split_matrix(jnp.asarray(B), 7)
    packed = pack_digit_planes(digitsB)
    u = np.asarray(jax.jit(
        lambda a: ozaki_gemv_packed(a, packed, sB, levels_b=7)
    )(jnp.asarray(a)))
    rel = np.max(np.abs(u - u_true)) / np.max(np.abs(u_true))
    assert rel < 1e-10
