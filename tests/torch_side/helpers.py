"""Weight-transplant helpers: map reference torch module weights into
mpa_tpu flax variable trees (moved here from test_nn_blocks so the test
modules stay torch-free; see torch_side/__init__.py)."""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ref_oracle import load_reference, _farthest_point_sample  # noqa: E402,F401


def t2j(t):
    """Torch tensor -> independent numpy copy (the copy matters: torch's
    in-place optimizer updates must not mutate transplanted arrays)."""
    return t.detach().numpy().copy()


def randomize_bn_(bn):
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_(0, 0.3)
        bn.running_mean.normal_(0, 0.2)
        bn.running_var.uniform_(0.5, 1.5)


def dense_params(tl):
    return {"kernel": t2j(tl.weight).T, "bias": t2j(tl.bias)}


def linear_unit_vars(ref_lin):
    """Map the reference `Linear` block (Dense+LN/BN+LReLU,
    modules/repsurface_utils.py) to LinearUnit vars."""
    params = {"linear": dense_params(ref_lin.linear)}
    stats = {}
    if ref_lin.bn_flag:  # inverted flag: True = LayerNorm
        params["norm"] = {
            "scale": t2j(ref_lin.norm1.weight), "bias": t2j(ref_lin.norm1.bias)
        }
    else:
        randomize_bn_(ref_lin.norm2)
        params["norm"] = {
            "scale": t2j(ref_lin.norm2.weight), "bias": t2j(ref_lin.norm2.bias)
        }
        stats["norm"] = {
            "mean": t2j(ref_lin.norm2.running_mean),
            "var": t2j(ref_lin.norm2.running_var),
        }
    return params, stats


def localtrans_vars(ref_lt, residual_proj):
    params = {
        "q": dense_params(ref_lt.q),
        "k": dense_params(ref_lt.k),
        "v": dense_params(ref_lt.v),
    }
    stats = {}
    p, s = linear_unit_vars(ref_lt.ffn)
    params["ffn"], stats["ffn"] = p, s
    if residual_proj:
        p, s = linear_unit_vars(ref_lt.conv_res)
        params["conv_res"], stats["conv_res"] = p, s
    return params, stats


def bn_vars(bn):
    randomize_bn_(bn)
    params = {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}
    stats = {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
    return params, stats
