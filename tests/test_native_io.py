"""Native C++ point-cloud parser: build, parity vs np.loadtxt, fallback."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpa_tpu.data import native_io  # noqa: E402


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clouds")
    r = np.random.default_rng(0)
    paths = []
    for i in range(4):
        arr = np.column_stack(
            [r.normal(size=(500, 6)), r.integers(0, 50, 500)]
        )
        p = tmp / f"f{i}.txt"
        np.savetxt(p, arr, fmt="%.6f")
        paths.append(str(p))
    # comma-separated (ModelNet style)
    pc = tmp / "comma.txt"
    np.savetxt(pc, r.normal(size=(100, 6)), fmt="%.6f", delimiter=",")
    return paths, str(pc)


class TestNativeIO:
    def test_builds(self):
        assert native_io.native_available(), "g++ toolchain is baked in"

    def test_single_file_parity(self, files):
        paths, _ = files
        want = np.loadtxt(paths[0]).astype(np.float32)
        got = native_io.loadtxt(paths[0], 7)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_comma_separated(self, files):
        _, pc = files
        want = np.loadtxt(pc, delimiter=",").astype(np.float32)
        got = native_io.loadtxt(pc, 6)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_threaded_many(self, files):
        paths, _ = files
        data, counts = native_io.loadtxt_many(paths, 7, max_rows=1024)
        assert data.shape == (4, 1024, 7)
        for i, p in enumerate(paths):
            want = np.loadtxt(p).astype(np.float32)
            assert counts[i] == len(want)
            np.testing.assert_allclose(data[i, : counts[i]], want, atol=1e-5)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            native_io.loadtxt("/nonexistent/file.txt", 7)
