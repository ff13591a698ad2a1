"""Dataclass config tree with CLI overrides.

Replaces the reference's per-tool argparse forests + shell-script config store
(tool/train_cls_scanobjectnn.py:31-76, scripts/scanobjectnn/*.sh) with one
typed config; no hardcoded data paths or device pins.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class TrainConfig:
    # task/model
    task: str = "cls"  # 'cls' | 'partseg' | 'semseg' | 'pose' | 'completion'
    model: str = "markov_cls"
    num_classes: int = 15
    num_points: int = 1024
    # semseg only: 'exact' (reference semantics) | 'window' (Morton-window
    # spatial neighbourhoods - the large-scene scalability mode, see
    # docs/PERF.md) | 'window_all' (feature-space kNN banded too - the full
    # scalability mode, a stronger documented approximation)
    neighbor_mode: str = 'exact'
    # window_all only: banded-FPS floors (ops/fps.py pick_fps_bands) — a
    # scale bands its FPS when every Morton band keeps >= fps_min_band points
    # and contributes >= fps_min_samples samples. The defaults engage banding
    # only at large-scene sizes; quality runs lower them to measure the
    # approximation at their own scale (scripts/extended_quality.py).
    fps_min_band: int = 512
    fps_min_samples: int = 64

    # data
    dataset: str = "synthetic"  # 'scanobjectnn' | 'modelnet40' | 'shapenetpart' | 's3dis' | 'synthetic'
    data_root: Optional[str] = None
    batch_size: int = 64
    # pose/completion synthetic-task train-set size (number of generated
    # clouds); the eval split stays fixed at 128 so metrics are comparable
    # across sizes.
    synthetic_train_clouds: int = 512

    # optimization (reference cls defaults: Adam 1e-3 / wd 1e-4 / StepLR 20x0.7)
    optimizer: str = "adam-l2"  # 'adam-l2' | 'sgd'
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    momentum: float = 0.9
    scheduler: str = "step"  # 'step' | 'cos'
    decay_step: int = 20
    decay_gamma: float = 0.7
    eta_min: float = 1e-3
    epochs: int = 300
    label_smoothing: float = 0.1

    # augmentation (reference part-seg uses scale+shift; cls flags default off)
    aug_scale: bool = False
    aug_shift: bool = False

    # eval
    num_votes: int = 3
    min_val_epoch: int = 0

    # init (reference --init, tool/train_cls_scanobjectnn.py:54,200-202)
    init: str = ""  # '' (flax default) | 'xavier' | 'kaiming' | 'zero'

    # system
    seed: int = 2800  # reference cls seed
    log_dir: str = "runs"
    mesh_axes: Tuple[str, ...] = ("data",)
    steps_per_epoch: Optional[int] = None  # derived when None

    def with_overrides(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def add_config_flags(parser, config: TrainConfig) -> None:
    """Register every config field as a --flag on an argparse parser."""
    for f in dataclasses.fields(config):
        default = getattr(config, f.name)
        if f.type == "bool" or isinstance(default, bool):
            parser.add_argument(
                f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
        elif isinstance(default, tuple):
            continue  # structured fields are code-level only
        else:
            typ = type(default) if default is not None else str
            parser.add_argument(f"--{f.name}", type=typ, default=default)


def config_from_args(args, base: Optional[TrainConfig] = None) -> TrainConfig:
    base = base or TrainConfig()
    kw = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(base)
        if hasattr(args, f.name)
    }
    return base.with_overrides(**kw)


def explicitly_passed(parser, argv) -> set:
    """Dests the user explicitly passed on the command line.

    Re-parses ``argv`` against a shadow parser whose defaults are all
    ``SUPPRESS``, so argparse itself resolves canonical option strings —
    including prefix abbreviations (``--num_point`` for ``--num_points``),
    which naive raw-argv string matching misses (advisor r1 finding).
    """
    import argparse

    aux = argparse.ArgumentParser(add_help=False)
    for action in parser._actions:
        if not action.option_strings or isinstance(action, argparse._HelpAction):
            continue
        if action.nargs == 0:  # store_true / store_false / count
            aux.add_argument(
                *action.option_strings, dest=action.dest,
                action="store_const", const=True, default=argparse.SUPPRESS,
            )
        else:
            aux.add_argument(
                *action.option_strings, dest=action.dest,
                nargs=action.nargs, default=argparse.SUPPRESS,
            )
    ns, _ = aux.parse_known_args(argv)
    return set(vars(ns))


def resolve_config(parser, args, argv=None) -> TrainConfig:
    """Final TrainConfig from parsed ``args`` + optional ``--preset``:
    the preset supplies the base and only explicitly-passed flags override it
    (one shared implementation for the train/eval/export CLIs)."""
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    if getattr(args, "preset", None):
        from mpa_tpu.configs import get_preset

        base = get_preset(args.preset)
        passed = explicitly_passed(parser, argv)
        overrides = {
            f.name: getattr(args, f.name)
            for f in dataclasses.fields(base)
            if f.name in passed and hasattr(args, f.name)
        }
        return base.with_overrides(**overrides)
    return config_from_args(args)
