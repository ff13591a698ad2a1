"""Export a trained model's inference function as a StableHLO artifact.

Usage:
  python -m mpa_tpu.cli.export --preset scanobjectnn_cls \
      --checkpoint runs/.../checkpoints --out model.shlo \
      [--serve_batch 64] [--platforms cpu,tpu]

The artifact is shape-specialized to ``--serve_batch`` clouds of
``--num_points`` points; load it anywhere with
``mpa_tpu.serve.load_inference(path)`` (no model code needed). See
mpa_tpu/serve/export.py for the deployment story.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from mpa_tpu import serve
from mpa_tpu import train as tr
from mpa_tpu.models import get_model
from mpa_tpu.train.checkpoint import BestCheckpointer
from mpa_tpu.utils.config import (
    TrainConfig, add_config_flags, resolve_config,
)

NUM_PARTS = 50
NUM_CATEGORIES = 16


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_config_flags(parser, TrainConfig())
    parser.add_argument("--preset", type=str, default=None,
                        help="named config preset (mpa_tpu.configs); explicit "
                             "flags still override")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint dir (omit to export a fresh init)")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--serve_batch", type=int, default=8)
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma list, e.g. 'cpu,tpu' (default: current)")
    parser.add_argument("--platform", type=str, default=None,
                        help="jax backend to trace on (e.g. cpu)")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = resolve_config(parser, args, argv)

    B, N = args.serve_batch, cfg.num_points
    if cfg.task == "partseg":
        model = get_model(cfg.model if cfg.model != "markov_cls" else "markov_partseg",
                          num_parts=NUM_PARTS, num_categories=NUM_CATEGORIES)
        example = (
            jnp.zeros((B, N, 3), jnp.float32),
            jnp.zeros((B, NUM_CATEGORIES), jnp.float32),
        )
    else:
        model = get_model(cfg.model, num_classes=cfg.num_classes)
        example = jnp.zeros((B, N, 3), jnp.float32)

    tx = tr.make_optimizer("sgd", 0.0)
    state = tr.create_train_state(model, jax.random.key(0), example, tx)
    best = None
    if args.checkpoint:
        # Weights only: export's tx is a dummy (lr 0 SGD); templating the
        # stored optimizer state would fail for any adam-trained checkpoint
        # (same cross-optimizer contract as cli/eval, fixed r5).
        restored = BestCheckpointer(args.checkpoint).restore(
            state, restore_optimizer=False
        )
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint}")
        state, best = restored

    platforms = args.platforms.split(",") if args.platforms else None
    exp = serve.export_inference(
        model, state.params, state.batch_stats, example, platforms=platforms
    )
    serve.save_exported(
        exp, args.out,
        manifest={
            "model": cfg.model, "task": cfg.task, "num_points": N,
            "serve_batch": B, "checkpoint": args.checkpoint,
            "train_best_metric": best,
        },
    )
    print(f"exported {cfg.model} ({cfg.task}) -> {args.out} "
          f"[batch={B}, n={N}, platforms={list(exp.platforms)}]")


if __name__ == "__main__":
    main()
