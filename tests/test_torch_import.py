"""Checkpoint migration: reference torch state dicts -> mpa_tpu variables.

Oracle: the golden-parity transplant builders (test_model_parity /
test_partseg_model_parity) extract variables by traversing live torch
modules. The import tool must reproduce their output EXACTLY from nothing
but the saved ``state_dict()`` — proving a real ``best_model.pth`` loads
without the reference code."""

import os
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mpa_tpu.utils import torch_import


def _tree_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        assert isinstance(a, dict) and isinstance(b, dict), f"type mismatch at {path}"
        assert set(a) == set(b), f"keys differ at {path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"leaf differs at {path}"
        )


def test_cls_state_dict_roundtrip(tmp_path):
    from torch_side import cls_model as CLS

    tmodel, variables_ref = CLS.build_transplanted()
    path = tmp_path / "best_model.pth"
    # Reference checkpoint format (tool/train_cls_scanobjectnn.py:295-304).
    torch.save({"epoch": 7, "model_state_dict": tmodel.state_dict()}, path)

    imported, report = torch_import.import_reference_checkpoint(
        str(path), "cls", variables_ref
    )
    _tree_equal(imported["params"], variables_ref["params"])
    _tree_equal(imported["batch_stats"], variables_ref["batch_stats"])
    # Dead branches are skipped, not silently absorbed. Allowed categories:
    # normal_Trans (never called), la*.fc1 / keepHigh.start / keepHigh.final
    # (constructed, absent from forward), conv_res on residual=False blocks,
    # the unused norm variant at each Linear site, BN bookkeeping counters.
    skipped = report["skipped_torch_keys"]
    assert any("normal_Trans" in k for k in skipped)
    allowed = ("normal_Trans", "num_batches_tracked", "norm1", "norm2",
               ".fc1.", "keepHigh.start.", "keepHigh.final.", "conv_res")
    unexplained = [k for k in skipped if not any(t in k for t in allowed)]
    assert not unexplained, unexplained


def test_partseg_state_dict_roundtrip(tmp_path):
    from torch_side import partseg_model as SEG

    tmodel, variables_ref = SEG.build_transplanted()
    path = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": tmodel.state_dict()}, path)

    imported, report = torch_import.import_reference_checkpoint(
        str(path), "partseg", variables_ref
    )
    _tree_equal(imported["params"], variables_ref["params"])
    _tree_equal(imported["batch_stats"], variables_ref["batch_stats"])


def test_dataparallel_prefix_stripped():
    sd = {"module.fc3.weight": torch.zeros(2, 3), "module.fc3.bias": torch.zeros(2)}
    out = torch_import._normalize_state_dict(sd)
    assert set(out) == {"fc3.weight", "fc3.bias"}
