"""ModelNet10/40 reader.

Reference semantics: ``ModelNetDataLoader`` (dataset/ModelNetDataLoader.py:44-132):
per-shape comma-separated .txt of xyz+normal, catfile
``modelnet{10,40}_shape_names.txt``, split lists
``modelnet{10,40}_{train,test}.txt``, pc_normalize, optional offline FPS
down to ``num_point``, ``use_normals`` channel slice. The reference's pickle
cache of the processed split (dataset/ModelNetDataLoader.py:60-100) maps to a
versioned ``.npz`` side-file here (``cache=True``): one array pair instead of
10k pickled objects, atomic rename, keyed by every parameter that changes the
processed output, and carrying a source fingerprint (split-list hash + newest
source mtime) validated on load — so neither a config change nor an in-place
dataset update serves stale points.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from mpa_tpu.data.shapenetpart import pc_normalize


# Host-side FPS lives in native_io (C++ with a numpy fallback; both match the
# reference dataset/ModelNetDataLoader.py:20-41 semantics bit-for-bit).
from mpa_tpu.data.native_io import _fps_numpy  # noqa: F401  (re-export)


def load_modelnet(
    root: str,
    split: str = "train",
    num_category: int = 40,
    num_point: int = 1024,
    use_normals: bool = False,
    use_fps: bool = False,
    limit: Optional[int] = None,
    cache: bool = True,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Returns (points ``[M, num_point, C]``, labels ``[M]``, class names)."""
    catfile = os.path.join(root, f"modelnet{num_category}_shape_names.txt")
    classes = [line.strip() for line in open(catfile)]
    cls_index = {c: i for i, c in enumerate(classes)}

    ids = [
        line.strip()
        for line in open(os.path.join(root, f"modelnet{num_category}_{split}.txt"))
    ]
    if limit is not None:
        ids = ids[:limit]

    # The cache validates a stored source fingerprint (hash of the split-list
    # contents plus every source file's (mtime, size), compared by EQUALITY —
    # an ordering check like stored >= newest misses replacements that carry
    # older or equal mtimes, e.g. tar/rsync -t re-extracts) on load, so
    # fixing/updating dataset files in place re-parses instead of silently
    # serving stale points (advisor r1 finding). When the sources are gone
    # (offline/cache-only deployment), the fingerprint can't be recomputed
    # and the cache is trusted as-is.
    import hashlib

    ids_hash = hashlib.sha1("\n".join(ids).encode()).hexdigest()[:10]
    h = hashlib.sha1()
    any_src = False
    for shape_id in ids:
        name = "_".join(shape_id.split("_")[:-1])
        try:
            st = os.stat(os.path.join(root, name, shape_id + ".txt"))
            h.update(f"{shape_id}:{int(st.st_mtime)}:{st.st_size};".encode())
            any_src = True
        except OSError:
            pass
    src_digest = h.hexdigest()[:16] if any_src else ""
    cache_path = os.path.join(
        root,
        f"mpa_cache_mn{num_category}_{split}_{num_point}pts"
        f"_{'fps' if use_fps else 'head'}_{'n' if use_normals else 'xyz'}"
        f"_{len(ids)}.npz",
    )
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        stored_hash = str(z["ids_hash"]) if "ids_hash" in z else ""
        stored_digest = str(z["src_digest"]) if "src_digest" in z else None
        fresh = stored_hash == ids_hash and (
            src_digest == "" or stored_digest == src_digest
        )
        if fresh:
            return z["points"], z["labels"], classes

    C = 6 if use_normals else 3
    pts = np.zeros((len(ids), num_point, C), np.float32)
    labels = np.zeros((len(ids),), np.int64)
    for i, shape_id in enumerate(ids):
        name = "_".join(shape_id.split("_")[:-1])
        path = os.path.join(root, name, shape_id + ".txt")
        from mpa_tpu.data.native_io import loadtxt

        cloud = loadtxt(path, 6)  # comma xyz + normal
        if use_fps:
            from mpa_tpu.data.native_io import fps_indices

            cloud = cloud[fps_indices(cloud, num_point)]
        else:
            cloud = cloud[:num_point]
        cloud[:, :3] = pc_normalize(cloud[:, :3])
        pts[i] = cloud[:, :C]
        labels[i] = cls_index[name]
    if cache:
        try:
            tmp = cache_path + ".tmp.npz"
            np.savez(
                tmp, points=pts, labels=labels,
                ids_hash=ids_hash, src_digest=src_digest,
            )
            os.replace(tmp, cache_path)
        except OSError:
            pass  # read-only dataset root: run uncached
    return pts, labels, classes
