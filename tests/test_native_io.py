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


class TestNativeFPS:
    """Native host-side FPS (the ModelNet use_fps cache-build hot loop) must
    pick bit-for-bit the same indices as the reference-semantics numpy FPS
    (dataset/ModelNetDataLoader.py:20-41 lineage)."""

    def test_single_cloud_exact(self):
        r = np.random.default_rng(1)
        for _ in range(4):
            N = int(r.integers(100, 2500))
            C = int(r.integers(3, 7))
            n = int(r.integers(8, min(N, 256)))
            pts = r.normal(size=(N, C)).astype(np.float32)
            np.testing.assert_array_equal(
                native_io.fps_indices(pts, n), native_io._fps_numpy(pts, n)
            )

    def test_many_ragged_exact(self):
        r = np.random.default_rng(2)
        M, maxN = 6, 900
        counts = r.integers(200, maxN + 1, size=(M,))
        batch = r.normal(size=(M, maxN, 3)).astype(np.float32)
        got = native_io.fps_indices_many(batch, counts, 48, n_threads=3)
        for i in range(M):
            np.testing.assert_array_equal(
                got[i], native_io._fps_numpy(batch[i, : counts[i]], 48)
            )

    def test_oversample_repeats_like_numpy(self):
        # n > N keeps producing indices (argmax over exhausted dist table);
        # whatever numpy does, the native path must match it.
        pts = np.random.default_rng(3).normal(size=(10, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            native_io.fps_indices(pts, 16), native_io._fps_numpy(pts, 16)
        )
