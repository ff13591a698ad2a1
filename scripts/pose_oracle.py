"""Pose-task identifiability oracle (BASELINE.md extended-head bars).

The synthetic SO(3) task regresses the z-rotation applied to a canonical-frame
composed-primitive cloud (cli/train.py `_pose_arrays`; data/synthetic.py
`realistic_clouds(canonical_pose=True)`). Before spending chip time training
toward the self-set <10 deg bar, this script bounds what the task itself
permits: a non-learned class-template matcher (grid + refine over z-angles,
one-sided Chamfer against a dense canonical sample of the class) is run on the
pose eval split. Its error is an achievable-accuracy witness — any gap between
it and the trained model is model headroom, not task noise.

Measured (64 eval clouds, 2026-08-18): mean 1.11 deg, median 0.80 deg,
p90 2.42 deg, max 6.21 deg -> the 10 deg bar is comfortably inside what the
task supports.

Run: cd /root/repo && python scripts/pose_oracle.py [--num 64] [--platform cpu]
(pure numpy; --platform is accepted for interface symmetry but unused).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpa_tpu.data.synthetic import (  # noqa: E402
    _class_spec,
    _compose_cloud,
    realistic_clouds,
)


def _rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]], dtype=np.float32)


def _chamfer_one_sided(a: np.ndarray, b: np.ndarray) -> float:
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(d.min(1).mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--num_points", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=15)
    ap.add_argument("--platform", default=None, help="unused (numpy only)")
    args = ap.parse_args()

    # The pose eval split exactly as cli/train.py builds it (seed=1 clouds,
    # seed=1 rotation stream from _pose_arrays).
    te_p, te_lab = realistic_clouds(
        args.num, args.num_points, args.num_classes, seed=1, canonical_pose=True
    )
    angles = np.random.default_rng(1).uniform(0, 2 * np.pi, len(te_p))

    # Oracle side information: a dense canonical sample per class. The
    # trained model has to discover this from data; the oracle gets it free,
    # which is what makes its error a task-identifiability bound in practice.
    templates = [
        _compose_cloud(
            np.random.default_rng(5000 + c),
            _class_spec(1000 + c, 3),
            1024,
            base_rotation=False,
        )[0]
        for c in range(args.num_classes)
    ]

    errs = []
    for i in range(len(te_p)):
        cloud = te_p[i] @ _rotz(angles[i]).T
        tpl = templates[int(te_lab[i])]
        best, bt = np.inf, 0.0
        for t in np.linspace(0, 2 * np.pi, 73)[:-1]:
            v = _chamfer_one_sided(cloud @ _rotz(t), tpl)
            if v < best:
                best, bt = v, t
        for t in np.linspace(bt - 0.1, bt + 0.1, 21):
            v = _chamfer_one_sided(cloud @ _rotz(t), tpl)
            if v < best:
                best, bt = v, t
        err = abs(((bt - angles[i] + np.pi) % (2 * np.pi)) - np.pi)
        errs.append(np.degrees(err))

    errs = np.asarray(errs)
    print(
        f"pose oracle over {len(errs)} eval clouds: "
        f"mean {errs.mean():.2f} deg, median {np.median(errs):.2f}, "
        f"p90 {np.percentile(errs, 90):.2f}, max {errs.max():.2f}"
    )


if __name__ == "__main__":
    main()
