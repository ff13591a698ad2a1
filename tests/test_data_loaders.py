"""Dataset reader tests against synthesized on-disk fixtures in the exact
on-disk formats the reference consumes (h5 ScanObjectNN, ModelNet txt tree,
ShapeNetPart synset tree), plus augmentation behaviour."""

import json
import os
import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpa_tpu.data import augment  # noqa: E402
from mpa_tpu.data.scanobjectnn import load_scanobjectnn  # noqa: E402
from mpa_tpu.data.modelnet import load_modelnet  # noqa: E402
from mpa_tpu.data.shapenetpart import (  # noqa: E402
    ShapeNetPartDataset,
    load_split,
    to_categorical,
    SEG_PARTS,
    NUM_CATEGORIES,
)


@pytest.fixture(scope="module")
def scanobjectnn_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scanobjectnn")
    r = np.random.default_rng(0)
    for split, m in [("training", 12), ("test", 6)]:
        d = root / "main_split"
        d.mkdir(exist_ok=True)
        with h5py.File(d / f"{split}_objectdataset_augmentedrot_scale75.h5", "w") as f:
            f["data"] = r.normal(size=(m, 2048, 3)).astype(np.float32)
            f["label"] = r.integers(0, 15, size=(m,))
    return str(root)


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("modelnet")
    r = np.random.default_rng(1)
    names = ["airplane", "bed"]
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    ids = []
    for name in names:
        (root / name).mkdir()
        for i in range(3):
            sid = f"{name}_{i:04d}"
            arr = r.normal(size=(300, 6)).astype(np.float32)
            np.savetxt(root / name / f"{sid}.txt", arr, fmt="%.6f", delimiter=",")
            ids.append(sid)
    (root / "modelnet40_train.txt").write_text("\n".join(ids) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(ids[:2]) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenetpart")
    r = np.random.default_rng(2)
    cats = {"Airplane": "02691156", "Chair": "03001627"}
    with open(root / "synsetoffset2category.txt", "w") as f:
        for name, syn in cats.items():
            f.write(f"{name}\t{syn}\n")
    (root / "train_test_split").mkdir()
    files = {"train": [], "val": [], "test": []}
    from mpa_tpu.data.shapenetpart import SEG_CLASSES

    for name, syn in cats.items():
        (root / syn).mkdir()
        for i in range(3):
            uid = f"uuid{name}{i}"
            n = int(r.integers(150, 400))
            parts = r.choice(SEG_CLASSES[name], size=n)
            arr = np.column_stack([r.normal(size=(n, 6)), parts])
            np.savetxt(root / syn / f"{uid}.txt", arr, fmt="%.6f")
            split = ["train", "val", "test"][i % 3]
            files[split].append(f"shape_data/{syn}/{uid}")
    for split, lst in files.items():
        with open(root / "train_test_split" / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump(lst, f)
    return str(root)


class TestScanObjectNN:
    def test_load(self, scanobjectnn_root):
        pts, labels = load_scanobjectnn(scanobjectnn_root, "training")
        assert pts.shape == (12, 2048, 3) and pts.dtype == np.float32
        assert labels.shape == (12,) and labels.dtype == np.int64
        pts_t, _ = load_scanobjectnn(scanobjectnn_root, "test")
        assert pts_t.shape[0] == 6


class TestModelNet:
    def test_load(self, modelnet_root):
        pts, labels, classes = load_modelnet(modelnet_root, "train", 40, num_point=128)
        assert pts.shape == (6, 128, 3)
        assert set(labels) == {0, 1}
        assert classes == ["airplane", "bed"]
        # pc_normalize: unit max radius
        radii = np.sqrt((pts**2).sum(-1)).max(1)
        np.testing.assert_allclose(radii, 1.0, atol=1e-5)

    def test_normals_and_fps(self, modelnet_root):
        pts, _, _ = load_modelnet(
            modelnet_root, "test", 40, num_point=64, use_normals=True, use_fps=True
        )
        assert pts.shape == (2, 64, 6)

    def test_npz_cache(self, modelnet_root):
        """The offline-preprocessing cache (reference's pickle cache,
        dataset/ModelNetDataLoader.py:60-100, done as one npz): second load
        hits the side-file and returns identical arrays; a different
        num_point keys a different cache entry."""
        import glob
        import os

        pts1, lab1, _ = load_modelnet(modelnet_root, "train", 40, num_point=96)
        files = glob.glob(os.path.join(str(modelnet_root), "mpa_cache_*_96pts_*.npz"))
        assert len(files) == 1, files
        # poison the source files: a cache hit must not re-read them
        for f in glob.glob(os.path.join(str(modelnet_root), "*", "*.txt")):
            os.rename(f, f + ".hidden")
        try:
            pts2, lab2, _ = load_modelnet(modelnet_root, "train", 40, num_point=96)
        finally:
            for f in glob.glob(os.path.join(str(modelnet_root), "*", "*.hidden")):
                os.rename(f, f[: -len(".hidden")])
        np.testing.assert_array_equal(pts1, pts2)
        np.testing.assert_array_equal(lab1, lab2)
        # different processing params -> distinct cache entry (fresh parse)
        pts3, _, _ = load_modelnet(modelnet_root, "train", 40, num_point=48)
        assert pts3.shape[1] == 48
        assert len(glob.glob(os.path.join(str(modelnet_root), "mpa_cache_*_48pts_*.npz"))) == 1

    def test_cache_invalidated_by_source_update(self, modelnet_root):
        """In-place dataset edits must re-parse, not serve stale cache
        (advisor r1 finding): the cache stores a source fingerprint
        (split-hash + every file's (mtime, size)) compared by EQUALITY, so
        even a replacement carrying an OLDER mtime (tar / rsync -t style
        re-extracts) invalidates it."""
        import glob
        import os
        import time

        pts1, _, _ = load_modelnet(modelnet_root, "train", 40, num_point=96)
        cache = glob.glob(os.path.join(str(modelnet_root), "mpa_cache_*_96pts_*.npz"))[0]
        digest0 = str(np.load(cache)["src_digest"])
        # "Fix" one shape in place: rewrite with doubled coordinates and an
        # mtime OLDER than the cached one (the case a newest-mtime ordering
        # check misses).
        path = os.path.join(str(modelnet_root), "airplane", "airplane_0000.txt")
        rows = [line.strip().split(",") for line in open(path)]
        with open(path, "w") as f:
            for r in rows:
                f.write(",".join(str(2 * float(v)) for v in r) + "\n")
        past = time.time() - 3600
        os.utime(path, (past, past))
        pts2, _, _ = load_modelnet(modelnet_root, "train", 40, num_point=96)
        # pc_normalize makes uniform scaling invisible; the re-parse is
        # observable through the rewritten cache fingerprint.
        digest1 = str(np.load(cache)["src_digest"])
        assert digest1 != digest0
        np.testing.assert_array_equal(pts1, pts2)  # scaling normalized away


class TestShapeNetPart:
    def test_dataset_items(self, shapenet_root):
        ds = ShapeNetPartDataset(shapenet_root, "trainval", npoints=256)
        assert len(ds) == 4  # 2 cats x (train + val)
        pts, cat, seg = ds[0]
        assert pts.shape == (256, 3) and seg.shape == (256,)
        assert set(np.unique(seg)) <= set(SEG_PARTS[cat])

    def test_load_split_dense(self, shapenet_root):
        pts, cats, segs = load_split(shapenet_root, "test", npoints=128)
        assert pts.shape == (2, 128, 3) and segs.shape == (2, 128)

    def test_to_categorical(self):
        oh = to_categorical(np.array([0, 3]), NUM_CATEGORIES)
        assert oh.shape == (2, NUM_CATEGORIES)
        assert oh[0, 0] == 1 and oh[1, 3] == 1 and oh.sum() == 2


class TestAugmentations:
    def test_all_keyed_and_shape_preserving(self):
        pts = jnp.asarray(np.random.default_rng(3).normal(size=(4, 32, 3)).astype(np.float32))
        k = jax.random.key(0)
        for fn in [
            augment.random_scale,
            augment.random_shift,
            augment.random_jitter,
            augment.random_rotate_y,
            augment.random_rotate_z,
            augment.random_rotate_perturb,
            augment.random_point_dropout,
            augment.shuffle_points,
        ]:
            out = fn(k, pts)
            assert out.shape == pts.shape
            assert np.all(np.isfinite(np.asarray(out)))

    def test_rotation_preserves_norms(self):
        pts = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16, 3)).astype(np.float32))
        out = augment.random_rotate_y(jax.random.key(1), pts)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(pts), axis=-1),
            atol=1e-5,
        )

    def test_shuffle_is_permutation(self):
        pts = jnp.asarray(np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3))
        out = np.asarray(augment.shuffle_points(jax.random.key(2), pts))
        for b in range(2):
            assert sorted(out[b, :, 0].tolist()) == sorted(np.asarray(pts)[b, :, 0].tolist())

    def test_normalize(self):
        pts = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16, 3)).astype(np.float32) * 7 + 3)
        out = np.asarray(augment.normalize_point_cloud(pts))
        np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.sqrt((out**2).sum(-1)).max(1), 1.0, atol=1e-5)

    def test_transform_point_cloud_gating(self):
        pts = jnp.ones((2, 8, 3))
        same = augment.transform_point_cloud(jax.random.key(0), pts)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(pts))  # both flags off
        scaled = augment.transform_point_cloud(
            jax.random.key(0), pts, aug_scale=True, scale_factor=0.5
        )
        assert not np.array_equal(np.asarray(scaled), np.asarray(pts))


class TestDryDataCheck:
    """--dry_data_check: the data-root rehearsal mode (VERDICT r2 item 6).
    Runs the real CLI entry against the format-exact on-disk fixtures above —
    the same validation a user runs the day real data lands."""

    def _run(self, argv, capsys):
        from mpa_tpu.cli import train as cli

        rc = cli.main(argv + ["--dry_data_check"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return rc, json.loads(out)

    def test_scanobjectnn_ok(self, scanobjectnn_root, capsys):
        rc, rep = self._run(
            ["--task", "cls", "--dataset", "scanobjectnn",
             "--data_root", scanobjectnn_root, "--batch_size", "4"],
            capsys,
        )
        assert rc == 0 and rep["ok"], rep
        assert rep["train"]["clouds"] == 12 and rep["test"]["clouds"] == 6
        assert rep["train"]["shapes"][0] == [12, 2048, 3]
        assert rep["epoch_plan"]["steps_per_epoch"] == 3

    def test_shapenetpart_ok(self, shapenet_root, capsys):
        rc, rep = self._run(
            ["--task", "partseg", "--dataset", "shapenetpart",
             "--data_root", shapenet_root, "--batch_size", "2",
             "--num_points", "128"],
            capsys,
        )
        assert rc == 0 and rep["ok"], rep
        assert rep["epoch_plan"]["total_steps"] > 0

    def test_missing_root_fails_with_error(self, tmp_path, capsys):
        rc, rep = self._run(
            ["--task", "cls", "--dataset", "scanobjectnn",
             "--data_root", str(tmp_path / "nope")],
            capsys,
        )
        assert rc == 1 and not rep["ok"] and "error" in rep

    def test_bad_labels_flagged(self, tmp_path, capsys):
        # A category whose seg labels violate SEG_PARTS must be reported.
        root = tmp_path / "shapenet_bad"
        syn = "02691156"  # Airplane: parts 0-3
        (root / syn).mkdir(parents=True)
        (root / "train_test_split").mkdir()
        with open(root / "synsetoffset2category.txt", "w") as f:
            f.write(f"Airplane\t{syn}\n")
        r = np.random.default_rng(3)
        arr = np.column_stack([r.normal(size=(64, 6)), np.full(64, 30.0)])  # part 30: Motorbike's
        np.savetxt(root / syn / "u0.txt", arr, fmt="%.6f")
        for split in ("train", "val", "test"):
            with open(root / "train_test_split" / f"shuffled_{split}_file_list.json", "w") as f:
                json.dump([f"shape_data/{syn}/u0"], f)
        rc, rep = self._run(
            ["--task", "partseg", "--dataset", "shapenetpart",
             "--data_root", str(root), "--batch_size", "1",
             "--num_points", "32"],
            capsys,
        )
        assert rc == 1 and not rep["ok"]
        assert any("part block" in p for p in rep["problems"]), rep["problems"]
