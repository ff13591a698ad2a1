"""S3DIS semantic-segmentation pipeline: block sampling + sliding-scene eval.

The reference ships no S3DIS code (SURVEY.md §0); this implements the
standard protocol the BASELINE config names: rooms are stored as
``[N, 6] xyzrgb`` + ``[N]`` labels; training samples 1m x 1m column blocks of
``num_points`` points with 9-dim features (block-centred xyz, rgb/255,
room-normalized xyz); whole-scene inference slides overlapping blocks across
the room and vote-averages per-point predictions.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

NUM_CLASSES = 13
CLASS_NAMES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
]


def load_room(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load one room: .npy ``[N, 7]`` (xyzrgb + label) — the standard
    preprocessed S3DIS format."""
    arr = np.load(path)
    return arr[:, :6].astype(np.float32), arr[:, 6].astype(np.int64)


def list_rooms(root: str, test_area: int = 5, split: str = "train") -> List[str]:
    rooms = sorted(
        f for f in os.listdir(root) if f.endswith(".npy") and "Area_" in f
    )
    tag = f"Area_{test_area}"
    if split == "train":
        rooms = [r for r in rooms if tag not in r]
    else:
        rooms = [r for r in rooms if tag in r]
    return [os.path.join(root, r) for r in rooms]


def block_features(
    pts: np.ndarray, room_min: np.ndarray, room_max: np.ndarray, centre_xy: np.ndarray
) -> np.ndarray:
    """``[n, 6] xyzrgb`` -> 9-dim block features:
    (xyz centred on the block column, rgb/255, room-normalized xyz)."""
    out = np.zeros((len(pts), 9), np.float32)
    out[:, 0] = pts[:, 0] - centre_xy[0]
    out[:, 1] = pts[:, 1] - centre_xy[1]
    out[:, 2] = pts[:, 2]
    out[:, 3:6] = pts[:, 3:6] / 255.0
    span = np.maximum(room_max - room_min, 1e-6)
    out[:, 6:9] = (pts[:, :3] - room_min) / span
    return out


def sample_blocks(
    xyzrgb: np.ndarray,
    labels: np.ndarray,
    num_blocks: int,
    num_points: int = 4096,
    block_size: float = 1.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random column blocks from one room -> (``[num_blocks, num_points, 9]``,
    ``[num_blocks, num_points]``)."""
    rng = rng or np.random.default_rng(0)
    room_min, room_max = xyzrgb[:, :3].min(0), xyzrgb[:, :3].max(0)
    out_x = np.zeros((num_blocks, num_points, 9), np.float32)
    out_y = np.zeros((num_blocks, num_points), np.int64)
    b = 0
    attempts = 0
    while b < num_blocks and attempts < num_blocks * 50:
        attempts += 1
        centre = xyzrgb[rng.integers(len(xyzrgb)), :2]
        half = block_size / 2.0
        mask = (
            (xyzrgb[:, 0] >= centre[0] - half) & (xyzrgb[:, 0] <= centre[0] + half)
            & (xyzrgb[:, 1] >= centre[1] - half) & (xyzrgb[:, 1] <= centre[1] + half)
        )
        idx = np.where(mask)[0]
        if len(idx) < 64:  # nearly-empty column, resample
            continue
        choice = rng.choice(idx, num_points, replace=len(idx) < num_points)
        out_x[b] = block_features(xyzrgb[choice], room_min, room_max, centre)
        out_y[b] = labels[choice]
        b += 1
    return out_x[:b], out_y[:b]


def sliding_blocks(
    xyzrgb: np.ndarray,
    num_points: int = 4096,
    block_size: float = 1.0,
    stride: float = 0.5,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic overlapping blocks covering the whole room.
    Yields (features ``[num_points, 9]``, point indices ``[num_points]``)."""
    room_min, room_max = xyzrgb[:, :3].min(0), xyzrgb[:, :3].max(0)
    xs = np.arange(room_min[0], room_max[0] + 1e-6, stride)
    ys = np.arange(room_min[1], room_max[1] + 1e-6, stride)
    rng = np.random.default_rng(0)
    half = block_size / 2.0
    for cx in xs:
        for cy in ys:
            centre = np.array([cx + half, cy + half])
            mask = (
                (xyzrgb[:, 0] >= centre[0] - half) & (xyzrgb[:, 0] <= centre[0] + half)
                & (xyzrgb[:, 1] >= centre[1] - half) & (xyzrgb[:, 1] <= centre[1] + half)
            )
            idx = np.where(mask)[0]
            if len(idx) == 0:
                continue
            # Cover EVERY in-block point: shuffle, pad to a multiple of
            # num_points with random repeats, emit fixed-size chunks (a single
            # random draw would leave points unvisited in dense blocks).
            perm = rng.permutation(idx)
            n_chunks = int(np.ceil(len(perm) / num_points))
            pad = n_chunks * num_points - len(perm)
            if pad:
                perm = np.concatenate([perm, rng.choice(idx, pad, replace=True)])
            for k in range(n_chunks):
                choice = perm[k * num_points : (k + 1) * num_points]
                yield (
                    block_features(xyzrgb[choice], room_min, room_max, centre),
                    choice,
                )


def scene_inference(
    forward,
    xyzrgb: np.ndarray,
    num_points: int = 4096,
    block_size: float = 1.0,
    stride: float = 0.5,
    batch_size: int = 8,
    num_classes: int = NUM_CLASSES,
) -> np.ndarray:
    """Whole-scene sliding inference: vote-average per-point log-probs across
    overlapping blocks. ``forward``: ``[B, num_points, 9] -> [B, num_points, C]``.
    Returns per-point predicted labels ``[N]``."""
    votes = np.zeros((len(xyzrgb), num_classes), np.float64)
    counts = np.zeros((len(xyzrgb),), np.int64)
    feats_buf, idx_buf = [], []

    def flush():
        if not feats_buf:
            return
        x = np.stack(feats_buf)
        logp = np.asarray(forward(x))
        for j, point_idx in enumerate(idx_buf):
            if len(point_idx) == 0:  # tail-padding duplicate
                continue
            np.add.at(votes, point_idx, logp[j])
            np.add.at(counts, point_idx, 1)
        feats_buf.clear()
        idx_buf.clear()

    for feats, idx in sliding_blocks(xyzrgb, num_points, block_size, stride):
        feats_buf.append(feats)
        idx_buf.append(idx)
        if len(feats_buf) == batch_size:
            flush()
    # Pad the tail batch to the compiled batch size (static shapes).
    if feats_buf:
        while len(feats_buf) < batch_size:
            feats_buf.append(feats_buf[-1])
            idx_buf.append(np.array([], dtype=np.int64))
        flush()
    # Coverage check: sliding_blocks guarantees every point is visited; a miss
    # here means block_size/stride are misconfigured for this scene.
    unvisited = int(np.sum(counts == 0))
    if unvisited:
        import warnings

        warnings.warn(
            f"scene inference left {unvisited}/{len(counts)} points unvisited "
            "(they default to class 0) — check block_size/stride",
            stacklevel=2,
        )
    return votes.argmax(-1)


def semseg_iou(
    pred: np.ndarray, target: np.ndarray, num_classes: int = NUM_CLASSES
) -> Tuple[float, float, np.ndarray]:
    """(mIoU, overall accuracy, per-class IoU) over concatenated scene points."""
    ious = np.zeros((num_classes,), np.float64)
    for c in range(num_classes):
        inter = np.sum((pred == c) & (target == c))
        union = np.sum((pred == c) | (target == c))
        ious[c] = inter / union if union else np.nan
    miou = float(np.nanmean(ious))
    acc = float(np.mean(pred == target))
    return miou, acc, ious
