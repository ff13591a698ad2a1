"""Training config presets.

Sources: the reference's canonical launch scripts
(scripts/scanobjectnn/repsurf_ssg_umb.sh — batch 64, Adam 1e-3/wd 1e-4,
StepLR 20x0.7, 300 epochs, 1024 pts, seed 2800; the published training log ran
batch 40), its part-seg trainer defaults (tool/train_partseg.py — SGD
.1/.9/1e-4 cosine->1e-3, 300 epochs, 2048 pts, batch 26), and the BASELINE
driver configs (ModelNet40 cls, S3DIS 4096-pt blocks, pose, completion).
Batch sizes are per-GLOBAL-batch; scale with the data-parallel mesh.
"""

from __future__ import annotations

from mpa_tpu.utils.config import TrainConfig

PRESETS = {
    # Reference workload 1: ScanObjectNN classification (published 86.20% OA).
    "scanobjectnn_cls": TrainConfig(
        task="cls", model="markov_cls", dataset="scanobjectnn",
        num_classes=15, num_points=1024, batch_size=64,
        optimizer="adam-l2", learning_rate=1e-3, weight_decay=1e-4,
        scheduler="step", decay_step=20, decay_gamma=0.7,
        epochs=300, seed=2800, num_votes=3,
    ),
    # BASELINE config 1: ModelNet40 classification.
    "modelnet40_cls": TrainConfig(
        task="cls", model="markov_cls", dataset="modelnet40",
        num_classes=40, num_points=1024, batch_size=64,
        optimizer="adam-l2", learning_rate=1e-3, weight_decay=1e-4,
        scheduler="step", decay_step=20, decay_gamma=0.7,
        epochs=300, seed=2800, num_votes=3,
    ),
    # RepSurf-SSG-2x baseline on ScanObjectNN.
    "scanobjectnn_2x": TrainConfig(
        task="cls", model="repsurf_ssg_2x", dataset="scanobjectnn",
        num_classes=15, num_points=1024, batch_size=64,
        optimizer="adam-l2", learning_rate=1e-3, weight_decay=1e-4,
        scheduler="step", decay_step=20, decay_gamma=0.7,
        epochs=250, seed=2800, num_votes=3,
    ),
    # Reference workload 2: ShapeNetPart (published 86.76% ins-mIoU).
    "shapenetpart": TrainConfig(
        task="partseg", model="markov_partseg", dataset="shapenetpart",
        num_points=2048, batch_size=32,
        optimizer="sgd", learning_rate=0.1, weight_decay=1e-4, momentum=0.9,
        scheduler="cos", eta_min=1e-3, epochs=300, seed=2800,
        aug_scale=True, aug_shift=True,
    ),
    # Alternative FP-decoder part-seg architecture.
    "shapenetpart_fp": TrainConfig(
        task="partseg", model="markov_partseg_fp", dataset="shapenetpart",
        num_points=2048, batch_size=32,
        optimizer="sgd", learning_rate=0.1, weight_decay=1e-4, momentum=0.9,
        scheduler="cos", eta_min=1e-3, epochs=300, seed=2800,
        aug_scale=True, aug_shift=True,
    ),
    # BASELINE config 5: S3DIS semantic segmentation, 4096-pt blocks.
    "s3dis_semseg": TrainConfig(
        task="semseg", model="markov_semseg", dataset="s3dis",
        num_classes=13, num_points=4096, batch_size=16,
        optimizer="sgd", learning_rate=0.1, weight_decay=1e-4, momentum=0.9,
        scheduler="cos", eta_min=1e-3, epochs=100, seed=2800,
    ),
    # BASELINE config 3: pose regression over the Markov encoder.
    "pose_modelnet40": TrainConfig(
        task="pose", model="markov_pose", dataset="modelnet40",
        num_points=1024, batch_size=64,
        optimizer="adam-l2", learning_rate=1e-3, weight_decay=1e-4,
        scheduler="cos", eta_min=1e-5, epochs=200, seed=2800,
    ),
    # BASELINE config 4: shape completion (decoder stress).
    "completion": TrainConfig(
        task="completion", model="markov_completion", dataset="synthetic",
        num_points=1024, batch_size=64,
        optimizer="adam-l2", learning_rate=1e-3, weight_decay=1e-4,
        scheduler="cos", eta_min=1e-5, epochs=200, seed=2800,
    ),
}


def get_preset(name: str) -> TrainConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset '{name}'; available: {sorted(PRESETS)}")
    return PRESETS[name]
