"""Artifact store, stats writers, profiling, distributed helpers."""

import io

import numpy as np
import pytest

from geometric_adv_tpu.utils import artifact_name, load_data, save_artifact
from geometric_adv_tpu.utils.profiling import ThroughputMeter
from geometric_adv_tpu.utils.stats import (
    write_attack_statistics_to_file,
    write_classification_statistics_to_file,
    write_defense_statistics_to_file,
    write_transfer_statistics_to_file,
)


def test_artifact_roundtrip(tmp_path, rng):
    d = str(tmp_path)
    data = rng.rand(5, 3)
    path = save_artifact(d, "point_clouds", data, "test_set", ["13l"])
    assert path.endswith("point_clouds_test_set_13l.npy")
    # substring lookup (reference: src/adversary_utils.py:13-23)
    loaded = load_data(d, base_name_list=["point_clouds_test_set"])
    np.testing.assert_array_equal(loaded, data)
    assert artifact_name("ae_loss", "test_set", ["13l"]) == "ae_loss_test_set_13l.npy"


def test_attack_stats_format(rng):
    buf = io.StringIO()
    vals = [rng.rand(4, 3).astype(np.float32) for _ in range(2)]
    write_attack_statistics_to_file(
        buf, ["chair", "table"], vals, [v * 100 for v in vals], vals, vals,
        vals,
    )
    out = buf.getvalue()
    # reference header layout (src/adversary_utils.py:184-186)
    assert out.startswith("Shape\t\tAttack\t\tAdv\t\tAdv\t\tAdv\t\tAdv\n")
    assert "over classes" in out
    assert out.count("\n\n") >= 2


def test_other_stats_writers(rng):
    vals = [rng.rand(3, 2).astype(np.float32)]
    for writer, header in [
        (write_defense_statistics_to_file, "Shape\t\tDef"),
        (write_transfer_statistics_to_file, "Shape\t\tTra"),
    ]:
        buf = io.StringIO()
        writer(buf, ["chair"], vals, vals, vals, vals)
        assert buf.getvalue().startswith(header)
    buf = io.StringIO()
    write_classification_statistics_to_file(
        buf, ["chair"], vals, "adversarial"
    )
    assert "Target accuracy" in buf.getvalue()


def test_throughput_meter():
    meter = ThroughputMeter("ops")
    with meter.measure(100):
        pass
    assert meter.total_items == 100
    assert meter.rate > 0
    assert "ops/s" in str(meter)


def test_host_local_batch_to_global(rng):
    from geometric_adv_tpu.parallel import get_mesh
    from geometric_adv_tpu.parallel.distributed import (
        host_local_batch_to_global,
    )

    mesh = get_mesh()
    local = rng.rand(8, 4, 3).astype(np.float32)
    arr = host_local_batch_to_global(local, mesh)
    assert arr.shape == (8, 4, 3)  # single process: global == local
    np.testing.assert_array_equal(np.asarray(arr), local)


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_plot_helpers_write_files(tmp_path, rng):
    """Smoke: the three report-plot helpers produce image files headlessly
    (reference: src/general_utils.py:168-223, evaluate_attack.py:232-327)."""
    from geometric_adv_tpu.utils import plots

    pc = rng.rand(64, 3).astype("float32") - 0.5
    p1 = str(tmp_path / "cloud.png")
    plots.plot_3d_point_cloud(pc, save_path=p1)
    p2 = str(tmp_path / "triplet.png")
    plots.plot_attack_triplet(pc, pc + 0.01, pc * 0.9, p2)
    p3 = str(tmp_path / "heat.png")
    plots.plot_heatmap_graph(
        rng.rand(3, 3), ["a", "b", "c"], ["d", "e", "f"], "sphere",
        "target", "source", ".2f", p3,
    )
    import os

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000, p


def test_profiler_trace_writes_a_capture(tmp_path):
    import jax
    import jax.numpy as jnp

    from geometric_adv_tpu.utils.profiling import trace

    @jax.jit
    def f(x):
        return jnp.sum(x * x)

    with trace(str(tmp_path)):
        float(f(jnp.arange(64, dtype=jnp.float32)))
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .pb) under the dir
    captured = [p for p in tmp_path.rglob("*") if p.is_file()]
    assert captured, "trace() produced no capture files"
