"""Synthetic datasets for smoke training, benchmarks, and CI — the image has
no real datasets mounted; real loaders live beside this and activate when
their files exist."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def synthetic_clouds(
    num: int, num_points: int = 1024, num_classes: int = 15, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Separable toy classification clouds: class c is a noisy ellipsoid with
    class-dependent axis ratios — learnable in a few steps, so loss descent is
    a meaningful smoke signal."""
    r = np.random.default_rng(seed)
    labels = r.integers(0, num_classes, size=(num,))
    pts = r.normal(size=(num, num_points, 3)).astype(np.float32)
    scales = 0.5 + np.stack(
        [
            1.0 + (labels % 3),
            1.0 + ((labels // 3) % 3),
            1.0 + ((labels // 9) % 3),
        ],
        axis=-1,
    ).astype(np.float32)
    pts = pts * scales[:, None, :] * 0.2
    return pts, labels.astype(np.int64)


def synthetic_partseg(
    num: int,
    num_points: int = 2048,
    num_categories: int = 16,
    num_parts: int = 50,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Toy part-seg: each cloud is split into axis-aligned halves whose part
    labels come from the shape's category block — (points, category, labels)."""
    r = np.random.default_rng(seed)
    cats = r.integers(0, num_categories, size=(num,))
    parts_per_cat = max(2, num_parts // num_categories)
    pts = r.uniform(-1, 1, size=(num, num_points, 3)).astype(np.float32)
    labels = np.zeros((num, num_points), dtype=np.int64)
    for i in range(num):
        base = cats[i] * parts_per_cat
        labels[i] = base + (pts[i, :, 2] > 0).astype(np.int64)
    return pts, cats.astype(np.int64), labels
