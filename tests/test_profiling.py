"""utils/profiling trace tooling: xplane proto round-trip, breakdown
aggregation on a synthetic trace, and a live jax.profiler capture parse."""

import os

import jax
import jax.numpy as jnp

from mpa_tpu.utils import profiling
from mpa_tpu.utils import xplane_pb2


def _synthetic_xspace(tmp_path):
    xs = xplane_pb2.XSpace()
    p = xs.planes.add()
    p.name = "/device:TPU:0"
    p.stat_metadata[1].name = "hlo_category"
    p.stat_metadata[2].name = "source"
    md = p.event_metadata
    md[1].name = "%fusion.1 = f32[8]"
    s = md[1].stats.add()
    s.metadata_id = 1
    s.str_value = "loop fusion"
    md[2].name = "%custom-call.2 = f32[8]"
    s = md[2].stats.add()
    s.metadata_id = 1
    s.str_value = "custom-call"
    s = md[2].stats.add()
    s.metadata_id = 2
    s.str_value = "mpa_tpu/ops/pallas/knn_pallas.py:99"
    line = p.lines.add()
    line.name = "XLA Ops"
    for mid, dur in [(1, 5_000_000), (2, 20_000_000), (1, 7_000_000)]:
        e = line.events.add()
        e.metadata_id = mid
        e.duration_ps = dur
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(xs.SerializeToString())
    return tmp_path


def test_breakdown_on_synthetic_trace(tmp_path):
    d = _synthetic_xspace(tmp_path)
    total_ms, rows = profiling.op_breakdown(str(d))
    assert abs(total_ms - 0.032) < 1e-9
    assert rows[0]["name"] == "%custom-call.2"
    assert rows[0]["count"] == 1 and abs(rows[0]["ms"] - 0.02) < 1e-12
    assert rows[0]["source"].endswith("knn_pallas.py:99")
    assert rows[1]["count"] == 2  # fusion.1 aggregated

    total_ms2, cats = profiling.category_breakdown(str(d))
    assert total_ms2 == total_ms
    assert {c["category"] for c in cats} == {"loop fusion", "custom-call"}


def test_live_trace_parses(tmp_path):
    """A real jax.profiler capture must parse (plane names vary by backend,
    so only the container format is asserted here)."""
    d = os.path.join(str(tmp_path), "live")
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((256, 256))
    float(f(x))  # compile outside the trace
    with jax.profiler.trace(d):
        for _ in range(3):
            float(f(x))
    xs = profiling.load_xspace(d)
    assert len(xs.planes) > 0
    assert any(p.lines for p in xs.planes)
