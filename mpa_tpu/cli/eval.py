"""Evaluation CLI — the TPU-native successor of tool/test_classification.py
and tool/test_partseg.py.

Classification reproduces the reference's published-eval protocol exactly:
NUM_REPEAT x num_votes TTA (vote 0 clean, later votes per-cloud per-axis
scaled 0.95-1.05), vote pool = mean log-probs, best instance/class accuracy
over repeats (tool/test_classification.py:114-162). Part-seg reproduces
tool/test_partseg.py:70-221: vote TTA + category-masked argmax + the
per-category/instance mIoU table. The reference's argmax-offset quirk at
tool/test_partseg.py:158 (global-label comparison without re-offsetting) is
NOT replicated — it is a bug the category-masked argmax makes moot; flagged
per SURVEY.md §3.4.

Usage:
  python -m mpa_tpu.cli.eval --task cls --dataset synthetic --num_repeat 3
  python -m mpa_tpu.cli.eval --task cls --dataset scanobjectnn --data_root ... \
      --checkpoint runs/cls_scanobjectnn/checkpoints --num_repeat 50 --num_votes 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import numpy as np

from mpa_tpu.utils.config import TrainConfig, add_config_flags, resolve_config
from mpa_tpu.utils.logging import make_logger
from mpa_tpu import train as tr
from mpa_tpu.models import get_model
from mpa_tpu.data.shapenetpart import to_categorical, SEG_PARTS, NUM_PARTS, NUM_CATEGORIES
from mpa_tpu.train.checkpoint import BestCheckpointer
from mpa_tpu.train.votes import vote_predict
from mpa_tpu.cli.train import load_dataset, batches


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_config_flags(parser, TrainConfig())
    parser.add_argument("--preset", type=str, default=None,
                        help="named config preset (mpa_tpu.configs); explicit "
                             "flags still override")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--import_torch", type=str, default=None,
                        help="reference best_model.pth to migrate and "
                             "evaluate (utils/torch_import)")
    parser.add_argument("--trust_torch_pickle", action="store_true",
                        help="allow full (arbitrary-code-execution) pickle "
                             "loading of --import_torch; default is the safe "
                             "weights-only loader")
    parser.add_argument("--num_repeat", type=int, default=1,
                        help="reference NUM_REPEAT (50 for the published number)")
    parser.add_argument("--replicate_argmax_quirk", action="store_true",
                        help="reproduce tool/test_partseg.py:158 (category-"
                             "local argmax not re-offset to global labels) "
                             "for golden-number replays of the published "
                             "eval.txt; NOT a correct evaluation")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cfg = resolve_config(parser, args, argv)
    if cfg.task == "partseg" and cfg.model == "markov_cls":
        cfg = cfg.with_overrides(model="markov_partseg")

    log = make_logger(os.path.join(cfg.log_dir, f"eval_{cfg.task}_{cfg.dataset}"), "eval")
    _, test_arrays = load_dataset(cfg)

    if cfg.task == "partseg":
        model = get_model(cfg.model, num_parts=NUM_PARTS, num_categories=NUM_CATEGORIES)
        example = (
            jax.numpy.asarray(test_arrays[0][:2]),
            jax.numpy.asarray(to_categorical(test_arrays[1][:2])),
        )
    else:
        model = get_model(cfg.model, num_classes=cfg.num_classes)
        example = jax.numpy.asarray(test_arrays[0][:2])

    tx = tr.make_optimizer("sgd", 0.0)
    state = tr.create_train_state(model, jax.random.key(0), example, tx)
    if args.import_torch:
        from mpa_tpu.utils.torch_import import import_reference_checkpoint

        task = "partseg" if cfg.task == "partseg" else "cls"
        template = {"params": state.params, "batch_stats": state.batch_stats}
        variables, report = import_reference_checkpoint(
            args.import_torch, task, template,
            allow_pickle=args.trust_torch_pickle,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        log.info(
            f"imported torch checkpoint {args.import_torch} "
            f"({len(report['skipped_torch_keys'])} dead/aux keys skipped)"
        )
    elif args.checkpoint:
        # Weights only: eval's tx is a dummy (lr 0 SGD), so templating the
        # stored optimizer state would fail for any training optimizer.
        restored = BestCheckpointer(args.checkpoint).restore(
            state, restore_optimizer=False
        )
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.checkpoint}")
        state, best = restored
        log.info(f"loaded checkpoint (train-best metric {best:.4f})")
    else:
        log.info("no --checkpoint given: evaluating a fresh init (protocol smoke)")

    eval_step = jax.jit(tr.make_eval_step())

    if cfg.task == "partseg":
        preds, tgts, cats_all = [], [], []
        vote_key = jax.random.key(7)
        for bi, batch in enumerate(batches(test_arrays, cfg.batch_size, drop_last=False)):
            pts, cats, segs = batch
            onehot = jax.numpy.asarray(to_categorical(cats))
            # Fresh per-batch vote scales, matching the reference's per-batch
            # draws (tool/test_classification.py:138).
            pool, _ = vote_predict(
                lambda x: eval_step(state, (x, onehot)),
                jax.numpy.asarray(pts), jax.random.fold_in(vote_key, bi), cfg.num_votes,
            )
            pred = tr.metrics.category_masked_argmax(
                np.asarray(pool), cats, SEG_PARTS,
                replicate_offset_quirk=args.replicate_argmax_quirk,
            )
            preds += list(pred)
            tgts += list(segs)
            cats_all += list(cats)
        ins, cls_m, cat_map = tr.part_iou_metrics(preds, tgts, cats_all, SEG_PARTS)
        acc = tr.metrics.point_accuracy(preds, tgts)
        cls_acc = tr.metrics.class_avg_point_accuracy(preds, tgts, SEG_PARTS)
        from mpa_tpu.data.shapenetpart import CATEGORIES

        # Field-for-field the reference eval.txt format
        # (log/part_seg/res/eval.txt:4-23).
        for c, iou in sorted(cat_map.items()):
            log.info(f"eval mIoU of {CATEGORIES[c]:<14s} {iou:.6f}")
        log.info(f"Accuracy is: {acc:.5f}")
        log.info(f"Class avg accuracy is: {cls_acc:.5f}")
        log.info(f"Class avg mIOU is: {cls_m:.5f}")
        log.info(f"Inctance avg mIOU is: {ins:.5f}")
        log.metrics(
            0, ins_miou=ins, class_miou=cls_m, point_acc=acc, class_acc=cls_acc
        )
        return

    # Classification: best-of-num_repeat vote eval.
    best_acc = best_cls = best_single = 0.0
    for rep in range(args.num_repeat):
        vote_key = jax.random.key(1000 + rep)
        votes, singles, labels_all = [], [], []
        for bi, batch in enumerate(batches(test_arrays, cfg.batch_size, drop_last=False)):
            pts, labels = batch
            pool, single = vote_predict(
                lambda x: eval_step(state, x),
                jax.numpy.asarray(pts), jax.random.fold_in(vote_key, bi), cfg.num_votes,
            )
            votes.append(np.asarray(pool))
            singles.append(np.asarray(single))
            labels_all.append(labels)
        pred = np.concatenate(votes).argmax(-1)
        labels_np = np.concatenate(labels_all)
        acc = tr.instance_accuracy(pred, labels_np)
        cls_acc = tr.class_average_accuracy(pred, labels_np, cfg.num_classes)
        single_acc = tr.instance_accuracy(np.concatenate(singles).argmax(-1), labels_np)
        if acc > best_acc:
            best_acc, best_cls, best_single = acc, cls_acc, single_acc
        log.info(f"repeat {rep}: vote-acc {acc:.4f} (best {best_acc:.4f})")
    log.info(
        f"BEST of {args.num_repeat}: vote-acc {best_acc:.4f} "
        f"single-acc {best_single:.4f} class-acc {best_cls:.4f}"
    )
    log.metrics(0, best_vote_acc=best_acc, best_class_acc=best_cls)


if __name__ == "__main__":
    main()
