"""Coverage for the remaining data utilities (reference: utils.py) and the
four-scenario Poisson simplex factory."""

import numpy as np
import pytest
import scipy.sparse as sparse

import accbpg_and_fw_tpu as acc


def test_metrics_dense_and_sparse(rng):
    X = rng.standard_normal((40, 6))
    w = rng.standard_normal(6)
    y = np.sign(X @ w)
    assert acc.binary_error_rate(X, y, w) == 0.0
    Xs = sparse.csr_matrix(X)
    assert acc.binary_error_rate(Xs, y, w) == 0.0
    assert acc.rmse(X, X @ w, w) < 1e-12
    assert acc.rmse(Xs, X @ w, w) < 1e-12


def test_row_norm_squared(rng):
    X = sparse.csr_matrix(rng.standard_normal((10, 5)))
    np.testing.assert_allclose(acc.row_norm_squared(X),
                               np.asarray(X.todense()) ** 2 @ np.ones(5),
                               rtol=1e-12)


def test_shuffle_and_mnist_pair(rng):
    X = rng.standard_normal((30, 4))
    y = np.repeat(np.arange(3), 10).astype(float)
    np.random.seed(0)
    Xs, ys = acc.shuffle_data(X.copy(), y.copy())
    assert sorted(ys.tolist()) == sorted(y.tolist())
    X2, y2 = acc.mnist_2digits(X, y, 0, 1)
    assert set(np.unique(y2[np.isin(y2, [1, -1])])) <= {1.0, -1.0}
    assert len(y2) == 20


def test_load_sido_roundtrip(tmp_path, rng):
    X = sparse.csr_matrix(rng.standard_normal((6, 4)))
    y = rng.standard_normal(6)
    p = tmp_path / "sido.npz"
    np.savez(p, Xdata=X.data, Xindptr=X.indptr, Xindices=X.indices,
             y=y, shape=X.shape)
    X2, y2 = acc.load_sido(str(p))
    np.testing.assert_array_equal(np.asarray(X2.todense()),
                                  np.asarray(X.todense()))
    np.testing.assert_array_equal(y2, y)


def test_random_samplers(rng):
    np.random.seed(1)
    p = acc.random_point_in_l2_ball(np.zeros(8), 2.0)
    assert np.linalg.norm(p) <= 2.0 + 1e-12
    s = acc.random_point_on_simplex(10)
    assert s.shape == (10,) and abs(s.sum() - 1) < 1e-12 and (s >= 0).all()
    e = acc.edge_point_on_simplex(3, 10)
    assert abs(e.sum() - 1) < 1e-9 and e[3] > 0.9
    v = acc.get_random_vector(5, 2.0)
    assert v.shape == (5,) and (v > 0).all() and (v <= 2.0).all()
    assert acc.get_random_float(0) == 0


def test_poisson_regr_simplex_scenarios():
    np.random.seed(2)
    h, scenarios = acc.Poisson_regr_simplex(30, 12, noise=0.01)
    assert set(scenarios) == {"x0_center_sol_center", "x0_edge_sol_edge",
                              "x0_edge_sol_center", "x0_center_sol_edge"}
    for name, (f, L, sol, x0) in scenarios.items():
        assert float(np.asarray(x0).sum()) == pytest.approx(1.0, abs=1e-6), name
        x, F, Ls, T = acc.BPG(f, h, L, x0, maxitrs=30, verbose=False)
        assert np.isfinite(F).all(), name

