"""Measured quality-bar runs for the extended heads (BASELINE.md table).

The reference ships no code or numbers for semseg/pose/completion (SURVEY §0),
so BASELINE.md sets each head a self-defined bar with a published point of
comparison. This script produces the committed evidence: it trains each head
on its synthetic task through the real CLI pipeline (same code path a user
runs), reads the final eval metrics from the run's train_metrics.jsonl, and
writes golden/extended_quality.json with pass/fail against the bars.

Usage:
  python scripts/extended_quality.py [--platform cpu] [--quick]

--quick shrinks the runs for smoke-testing the harness; the committed
artifact should come from a full (default) run — a few minutes on the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Relative-bar margin for the window-mode heads (VERDICT r4 item 4): a
# window run must land within this of its exact anchor's MEASURED value —
# absolute bars (r4 shipped 0.73 vs a measured 0.8192) tolerated ~4x the
# observed banding price before failing, so a regression that doubled the
# price would have passed silently.
REL_MARGIN = 0.03

BARS = {
    # head: (metric key, comparator, bar). bar is either an absolute float
    # (matches BASELINE.md) or ("rel", anchor_head, fallback_abs): resolved
    # to anchor's measured value - REL_MARGIN when the anchor result exists
    # (same run or the committed artifact), else fallback_abs.
    "semseg": ("block_miou", ">=", 0.95),
    # window mode is an APPROXIMATION (Morton-banded neighbourhoods,
    # docs/PERF.md); the relative bar documents that the banded graph still
    # learns the task to the exact-search standard minus a bounded price.
    "semseg_window": ("block_miou", ">=", ("rel", "semseg", 0.95)),
    # window_all additionally bands the FEATURE-space kNN (the strongest
    # approximation; ADVICE r1 asked for it to be measured, not silent).
    "semseg_window_all": ("block_miou", ">=", ("rel", "semseg", 0.95)),
    "pose": ("geodesic_error_deg", "<=", 10.0),
    "completion": ("chamfer", "<=", 2e-2),
    # Large-scene pair (VERDICT r3 item 4): window mode exists FOR large
    # scenes, so its quality price must be measured at a scale where the
    # production banding floors actually engage (4096 pts; the 512-pt runs
    # above lower the floors artificially). The exact run anchors the task;
    # window_all reproduces only 60-85% of exact kNN picks at this scale
    # (docs/PERF.md) and the artifact records the resulting mIoU delta as
    # the speedup's price tag.
    "semseg_4k": ("block_miou", ">=", 0.95),
    "semseg_4k_window_all": ("block_miou", ">=", ("rel", "semseg_4k", 0.90)),
    # r4 wired the window modes into the part-seg stack (markov_partseg
    # neighbor_mode); same methodology as the semseg_4k pair — exact anchors
    # the task at the published point count (2048) with PRODUCTION banding
    # floors, window_all's relative bar records the approximation's price.
    # The composed-primitive part task plateaus ~0.82 ins-mIoU (80 cosine
    # epochs measured 0.8192 exact; the 500-step golden partseg curves
    # plateau there too — overlapping-part ceiling, not undertraining).
    "partseg_2k": ("ins_miou", ">=", 0.78),
    "partseg_2k_window_all": ("ins_miou", ">=", ("rel", "partseg_2k", 0.73)),
    # 16k pair (VERDICT r4 item 3): the 3.32x window_all speedup headline is
    # measured at 16384 points, where the window covers a SMALLER fraction
    # of the scene than at 4k — so the 4k quality pair does not bound this
    # one. Production floors, same task family; epochs wall-budgeted for the
    # chip (exact at 16k is the expensive anchor).
    "semseg_16k": ("block_miou", ">=", 0.95),
    "semseg_16k_window_all": ("block_miou", ">=", ("rel", "semseg_16k", 0.90)),
}

RUNS = {
    # CLI args per head; synthetic-task convergence configs. semseg: 30
    # constant-lr epochs measured 0.85-0.96 mIoU across modes (r3) — noisy,
    # undertrained; 60 cosine-annealed epochs converge every mode past the bar.
    "semseg": ["--task", "semseg", "--dataset", "synthetic", "--num_points",
               "512", "--batch_size", "8", "--epochs", "60",
               "--learning_rate", "0.05", "--scheduler", "cos",
               "--eta_min", "1e-3"],
    "semseg_window": ["--task", "semseg", "--dataset", "synthetic",
                      "--num_points", "512", "--batch_size", "8", "--epochs",
                      "60", "--learning_rate", "0.05", "--scheduler", "cos",
                      "--eta_min", "1e-3", "--neighbor_mode", "window"],
    # pose/completion: enlarged synthetic train sets (512 clouds memorize
    # before generalizing — measured r2) + longer cosine schedules; sized for
    # the chip, where each run is minutes.
    # fps floors lowered so banded FPS (r3) actually engages at this scale
    # (512->256 bands 8x with these floors; the production defaults band only
    # at large-scene sizes) — the bar then covers ALL window_all
    # approximations: banded feature kNN, banded spatial searches, banded FPS.
    "semseg_window_all": ["--task", "semseg", "--dataset", "synthetic",
                          "--num_points", "512", "--batch_size", "8",
                          "--epochs", "60", "--learning_rate", "0.05",
                          "--scheduler", "cos", "--eta_min", "1e-3",
                          "--neighbor_mode", "window_all",
                          "--fps_min_band", "64", "--fps_min_samples", "16"],
    # The 4k pair: production banding floors (no --fps_min_band override —
    # banding engages on its own at this scale). Same task family as the
    # 512-pt runs, 8x the scene size; epochs sized for the chip.
    "semseg_4k": ["--task", "semseg", "--dataset", "synthetic", "--num_points",
                  "4096", "--batch_size", "16", "--epochs", "40",
                  "--learning_rate", "0.05", "--scheduler", "cos",
                  "--eta_min", "1e-3"],
    "semseg_4k_window_all": ["--task", "semseg", "--dataset", "synthetic",
                             "--num_points", "4096", "--batch_size", "16",
                             "--epochs", "40", "--learning_rate", "0.05",
                             "--scheduler", "cos", "--eta_min", "1e-3",
                             "--neighbor_mode", "window_all"],
    # The part-seg pair: reference-preset optimizer (SGD .1/.9/1e-4 cosine,
    # configs/presets.py) on the synthetic part task at the published 2048
    # points; production banding floors (no --fps_min_band override).
    "partseg_2k": ["--task", "partseg", "--dataset", "synthetic",
                   "--num_points", "2048", "--batch_size", "16", "--epochs",
                   "80", "--optimizer", "sgd", "--learning_rate", "0.1",
                   "--scheduler", "cos", "--eta_min", "1e-3"],
    "partseg_2k_window_all": ["--task", "partseg", "--dataset", "synthetic",
                              "--num_points", "2048", "--batch_size", "16",
                              "--epochs", "80", "--optimizer", "sgd",
                              "--learning_rate", "0.1", "--scheduler", "cos",
                              "--eta_min", "1e-3",
                              "--neighbor_mode", "window_all"],
    # The 16k pair: the scale of bench.py's window_all speedup headline.
    # Production floors; batch and epochs wall-budgeted for the chip (the
    # exact anchor is the expensive run at this scale). Room density scales
    # with num_points (cli/train.py _semseg_synthetic) so blocks hold ~2.4x
    # replacement like the 4k protocol rather than 10x.
    "semseg_16k": ["--task", "semseg", "--dataset", "synthetic",
                   "--num_points", "16384", "--batch_size", "4", "--epochs",
                   "24", "--learning_rate", "0.05", "--scheduler", "cos",
                   "--eta_min", "1e-3"],
    "semseg_16k_window_all": ["--task", "semseg", "--dataset", "synthetic",
                              "--num_points", "16384", "--batch_size", "4",
                              "--epochs", "24", "--learning_rate", "0.05",
                              "--scheduler", "cos", "--eta_min", "1e-3",
                              "--neighbor_mode", "window_all"],
    "pose": ["--task", "pose", "--dataset", "synthetic", "--num_points",
             "256", "--batch_size", "32", "--epochs", "100",
             "--synthetic_train_clouds", "4096",
             "--optimizer", "adam-l2", "--learning_rate", "1e-3",
             "--scheduler", "cos", "--eta_min", "1e-5"],
    # completion at 60ep/2048 clouds measured chamfer 0.0243 vs the 0.02 bar
    # (r3) — the pose-sized schedule converges it below the bar.
    "completion": ["--task", "completion", "--dataset", "synthetic",
                   "--num_points", "256", "--batch_size", "32", "--epochs",
                   "100", "--synthetic_train_clouds", "4096",
                   "--optimizer", "adam-l2", "--learning_rate", "1e-3",
                   "--scheduler", "cos", "--eta_min", "1e-5"],
}

QUICK = {"semseg": "2", "semseg_window": "2", "semseg_window_all": "2",
         "semseg_4k": "1", "semseg_4k_window_all": "1",
         "semseg_16k": "1", "semseg_16k_window_all": "1",
         "partseg_2k": "1", "partseg_2k_window_all": "1",
         "pose": "2", "completion": "2"}

# Per-head artifact notes (VERDICT r3 weak #6: record expected anomalies so
# the numbers are self-describing).
NOTES = {
    "semseg_window": (
        "~3x slower wall than exact at this 512-pt quality scale — banding "
        "overhead dominates at small N; the mode targets large scenes "
        "(see the semseg_4k pair and bench.py's semseg_16k block)"
    ),
    "semseg_window_all": (
        "~3x slower wall than exact at this 512-pt quality scale (banding "
        "floors lowered here so the approximation engages at all); speed is "
        "measured where it matters, at 4k/16k — this entry measures quality "
        "only"
    ),
    "semseg_4k_window_all": (
        "production banding floors at the scale window mode is built for; "
        "the mIoU delta vs semseg_4k is the quality price of the banded "
        "neighborhood approximation"
    ),
    "partseg_2k_window_all": (
        "production banding floors at the published part-seg point count; "
        "the ins-mIoU delta vs partseg_2k is the quality price of the banded "
        "approximation on the part-seg stack (wired r4)"
    ),
    "semseg_16k_window_all": (
        "quality price at the 16384-pt scale of the bench speedup headline "
        "itself — the window covers a smaller scene fraction here than at "
        "4k, so the 4k pair does not bound this one (VERDICT r4 item 3)"
    ),
}


def last_metric(run_root: str, key: str):
    vals = []
    for dirpath, _, files in os.walk(run_root):
        for f in files:
            if f == "train_metrics.jsonl":
                with open(os.path.join(dirpath, f)) as fh:
                    for line in fh:
                        rec = json.loads(line)
                        if key in rec:
                            vals.append(rec[key])
    return vals[-1] if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--heads", default=None,
                    help="comma-separated subset of heads to (re)run; "
                         "results merge into an existing --out file")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: the committed golden artifact "
                         "for full runs, a /tmp scratch file for --quick)")
    args = ap.parse_args()
    if args.out is None:
        # --quick must never clobber the committed full-run artifact
        args.out = (os.path.join(tempfile.gettempdir(), "extended_quality_quick.json")
                    if args.quick
                    else os.path.join(REPO, "golden", "extended_quality.json"))

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("results", {})

    def reconcile_relative_bars():
        """Re-derive every window head's bar from its anchor's CURRENT value
        so a --heads subset re-run of an anchor can't leave dependent bars
        stale (the artifact must satisfy test_window_bars_are_relative
        regardless of which subset last ran)."""
        for head, (_, cmp_, bar) in BARS.items():
            if not isinstance(bar, tuple) or head not in results:
                continue
            _, anchor, _ = bar
            aval = results.get(anchor, {}).get("value")
            wval = results[head].get("value")
            if aval is None or wval is None:
                continue
            newbar = round(aval - REL_MARGIN, 4)
            results[head]["bar"] = newbar
            results[head]["bar_rule"] = (
                f"{anchor} measured {aval} - margin {REL_MARGIN}"
            )
            results[head]["pass"] = bool(
                wval >= newbar if cmp_ == ">=" else wval <= newbar
            )

    def write_out():
        # incremental checkpointing: a crash or kill mid-run must not lose
        # finished heads (an r2 run lost a 40-minute semseg PASS this way)
        reconcile_relative_bars()
        payload = {
            "note": "synthetic-task convergence evidence for BASELINE.md's "
                    "self-set extended-head bars; full runs, real CLI pipeline",
            "quick": bool(args.quick),
            "results": results,
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")

    heads = args.heads.split(",") if args.heads else list(RUNS)
    for head in heads:
        cli = RUNS[head]
        key, cmp_, bar = BARS[head]
        bar_rule = None
        if isinstance(bar, tuple):
            _, anchor, fallback = bar
            aval = results.get(anchor, {}).get("value")
            if aval is not None:
                bar = round(aval - REL_MARGIN, 4)
                bar_rule = f"{anchor} measured {aval} - margin {REL_MARGIN}"
            else:
                bar = fallback
                bar_rule = (f"absolute fallback {fallback} "
                            f"(anchor {anchor} not measured)")
        with tempfile.TemporaryDirectory() as d:
            cmd = [sys.executable, "-m", "mpa_tpu.cli.train", *cli,
                   "--log_dir", d]
            if args.quick:
                cmd[cmd.index("--epochs") + 1] = QUICK[head]
                if "--synthetic_train_clouds" in cmd:
                    cmd[cmd.index("--synthetic_train_clouds") + 1] = "256"
            if args.platform:
                cmd += ["--platform", args.platform]
            t0 = time.time()
            p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
            if p.returncode != 0:
                results[head] = {
                    "metric": key, "value": None, "bar": bar,
                    "comparator": cmp_, "pass": False,
                    "error": p.stderr[-500:],
                }
                if bar_rule:
                    results[head]["bar_rule"] = bar_rule
                print(f"{head}: FAILED\n{p.stderr[-2000:]}", flush=True)
                write_out()
                continue
            val = last_metric(d, key)
            ok = val is not None and (val >= bar if cmp_ == ">=" else val <= bar)
            results[head] = {
                "metric": key, "value": round(val, 4) if val is not None else None,
                "bar": bar, "comparator": cmp_, "pass": bool(ok),
                "wall_s": round(time.time() - t0, 1),
                "config": " ".join(cli),
            }
            if bar_rule:
                results[head]["bar_rule"] = bar_rule
            if head in NOTES:
                results[head]["note"] = NOTES[head]
            print(f"{head}: {key}={val} (bar {cmp_} {bar}) -> "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
            write_out()
    write_out()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
