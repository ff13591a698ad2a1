"""Data-day parity runbook (scripts/parity_runbook.py, VERDICT r4 item 5).

The real-dataset parity flank is environmental (zero-egress image, no
dataset bytes), so the runbook's job is to make the day data arrives a
zero-decision day. These tests pin (a) the guard rails — real runs demand a
--data_root, stages fail fast with resume instructions — and (b) that the
synthetic --dry_run rehearsal drives the full check→train→eval chain
through the real CLIs end-to-end (slow tier).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNBOOK = os.path.join(REPO, "scripts", "parity_runbook.py")


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, RUNBOOK, *args],
        cwd=REPO, capture_output=True, text=True, **kw,
    )


def test_real_run_requires_data_root():
    p = _run(["scanobjectnn"])
    assert p.returncode != 0
    assert "--data_root" in (p.stderr + p.stdout)


def test_unknown_workload_rejected():
    p = _run(["modelnet999"])
    assert p.returncode != 0


def test_bars_match_reference_numbers():
    """The verdict bars must stay pinned to the reference's own eval.txt
    numbers (86.20% OA / 86.76% ins-mIoU)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import parity_runbook as rb
    finally:
        sys.path.pop(0)
    assert rb.WORKLOADS["scanobjectnn"]["bar"] == 0.8620
    assert rb.WORKLOADS["shapenetpart"]["bar"] == 0.8676
    # The published cls protocol is 50 repeats x 10 votes.
    ev = rb.WORKLOADS["scanobjectnn"]["eval"]
    assert ev[ev.index("--num_repeat") + 1] == "50"
    assert ev[ev.index("--num_votes") + 1] == "10"


def test_eval_stage_without_checkpoint_fails_fast(tmp_path):
    p = _run(["scanobjectnn", "--dry_run", "--stage", "eval",
              "--log_dir", str(tmp_path)])
    assert p.returncode != 0
    assert "checkpoint" in (p.stderr + p.stdout)


@pytest.mark.slow
def test_dry_run_chain_cls(tmp_path):
    """Full synthetic rehearsal: train 2 epochs -> checkpoint -> published
    eval protocol shape (repeats x votes) -> metric extracted + verdict
    line. CPU platform so the chain works off-chip. This rehearsal caught a
    real data-day blocker in r5 (cross-optimizer checkpoint restore)."""
    p = _run(["scanobjectnn", "--dry_run", "--platform", "cpu",
              "--log_dir", str(tmp_path)], timeout=1500)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "DRY RUN complete" in p.stdout
    jsonl = os.path.join(tmp_path, "eval_cls_synthetic", "eval_metrics.jsonl")
    with open(jsonl) as f:
        recs = [json.loads(line) for line in f]
    assert any("best_vote_acc" in r for r in recs)


@pytest.mark.slow
def test_dry_run_chain_partseg(tmp_path):
    """The part-seg chain exercises a different eval surface than cls: the
    checkpoint restore into the vote + category-masked-argmax + per-category
    mIoU table protocol."""
    p = _run(["shapenetpart", "--dry_run", "--platform", "cpu",
              "--log_dir", str(tmp_path)], timeout=1500)
    assert p.returncode == 0, p.stderr[-3000:]
    assert "DRY RUN complete" in p.stdout
    assert "Inctance avg mIOU" in p.stdout or "ins_miou" in p.stdout
    jsonl = os.path.join(tmp_path, "eval_partseg_synthetic", "eval_metrics.jsonl")
    with open(jsonl) as f:
        recs = [json.loads(line) for line in f]
    assert any("ins_miou" in r for r in recs)
