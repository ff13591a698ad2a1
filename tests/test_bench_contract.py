"""Driver-interface contract for bench.py's stdout headline.

The driver captures only the TAIL of stdout and parses the last line as JSON;
round 3's detail blob grew past the capture and the recorded headline was
truncated from the front (BENCH_r03.json: parsed=null). These tests pin the
contract: one short, flat, front-truncation-proof line.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _line():
    import bench

    return bench.headline_line(374.8, 374.8, 2915.6)


def test_headline_is_short():
    assert len(_line()) <= 500


def test_headline_parses_with_driver_fields():
    d = json.loads(_line())
    assert d["metric"] == "partseg_train_clouds_per_sec_per_chip"
    assert d["unit"] == "clouds/s"
    assert isinstance(d["value"], float)
    assert isinstance(d["vs_baseline"], float)


def test_headline_survives_tail_capture():
    """Even a pessimistic 600-byte tail capture keeps the whole line intact
    (line + newline at the very end of stdout)."""
    line = _line()
    tail = (("x" * 4096) + "\n" + line + "\n")[-600:]
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    assert json.loads(last)["metric"] == "partseg_train_clouds_per_sec_per_chip"
