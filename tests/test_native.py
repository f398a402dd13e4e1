"""Native-component tests: the C++ LIBSVM parser must agree with the Python
parser on content and error behavior (reference contract: utils.py:22-95)."""

import gzip

import numpy as np
import pytest

from accbpg_and_fw_tpu.apps.utils import _load_libsvm_native, load_libsvm_file
from accbpg_and_fw_tpu.native import load_native_library

SAMPLE = """\
1 1:0.5 3:-1.25 7:3e-2
-1 2:1.0 3:2.5   # trailing comment
# full comment line

2.5 1:4 2:5 3:6 8:7.5
"""


@pytest.fixture
def svm_file(tmp_path):
    p = tmp_path / "sample.libsvm"
    p.write_text(SAMPLE)
    return str(p)


def test_native_library_builds():
    assert load_native_library("libsvm_parser") is not None


def test_native_matches_python(svm_file, tmp_path):
    X, y = load_libsvm_file(svm_file)  # native path
    gz = tmp_path / "sample.libsvm.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write(SAMPLE)
    Xp, yp = load_libsvm_file(str(gz))  # python path (compressed)
    np.testing.assert_array_equal(y, yp)
    assert X.shape == Xp.shape
    np.testing.assert_array_equal(X.toarray(), Xp.toarray())


def test_parsed_content(svm_file):
    X, y = load_libsvm_file(svm_file)
    np.testing.assert_array_equal(y, [1, -1, 2.5])
    assert X.shape == (3, 8)
    # auto zero_based: min index is 1 -> shifted down by one
    assert X[0, 0] == 0.5 and X[0, 2] == -1.25 and X[0, 6] == pytest.approx(0.03)
    assert X[2, 7] == 7.5


def test_unsorted_indices_raise(tmp_path):
    p = tmp_path / "bad.libsvm"
    p.write_text("1 3:1.0 2:2.0\n")
    with pytest.raises(ValueError, match="sorted and unique"):
        load_libsvm_file(str(p))


def test_native_speedup_on_larger_file(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(2000):
        idx = np.sort(rng.choice(100, size=20, replace=False)) + 1
        vals = rng.standard_normal(20)
        rows.append("1 " + " ".join(f"{i}:{v:.6f}" for i, v in zip(idx, vals)))
    p = tmp_path / "big.libsvm"
    p.write_text("\n".join(rows) + "\n")

    out = _load_libsvm_native(str(p))
    assert out is not None
    data, indices, indptr, labels = out
    assert len(labels) == 2000
    assert indptr[-1] == len(data) == 2000 * 20


def test_no_trailing_newline_page_multiple(tmp_path):
    """Round-1 advisor finding: a file whose size is an exact multiple of the
    page size and whose last line ends mid-token made strtod scan past the
    mmap.  The parser now NUL-terminates the trailing partial line."""
    page = 4096
    row = "1 1:0.5 2:-1.25\n"
    tail = "-1 1:2.5 2:0.125"  # final line: no newline, ends mid-token
    nrows = 100
    fixed = len(row) * nrows + 1 + len(tail)  # +1: the filler comment's \n
    total = -(-fixed // page) * page
    content = row * nrows + "#" * (total - fixed) + "\n" + tail
    assert len(content) % page == 0
    p = tmp_path / "exact.libsvm"
    p.write_bytes(content.encode())
    out = _load_libsvm_native(str(p))
    assert out is not None
    data, indices, indptr, labels = out
    assert len(labels) == nrows + 1
    assert labels[-1] == -1
    assert data[-1] == 0.125


def test_d_opt_libsvm_end_to_end(tmp_path):
    """LIBSVM file -> native parse -> D-opt problem -> solver."""
    import accbpg_and_fw_tpu as acc

    rng = np.random.default_rng(5)
    rows = []
    for _ in range(12):  # 12 samples x 30 features -> transposed to 12x30? m<n
        idx = np.arange(1, 31)
        vals = rng.standard_normal(30)
        rows.append("1 " + " ".join(f"{i}:{v:.5f}" for i, v in zip(idx, vals)))
    p = tmp_path / "design.txt"
    p.write_text("\n".join(rows) + "\n")

    f, h, L, x0 = acc.D_opt_libsvm(str(p))
    assert f.H.shape == (12, 30)  # transposed so m < n
    x, F, Ls, T = acc.BPG(f, h, L, x0, maxitrs=50, verbose=False)
    assert np.isfinite(F).all() and F[-1] < F[0]
