"""bench.py must always produce its one-JSON-line record.

The driver runs ``python bench.py`` once per round as the official perf
record (round 1's record was lost to a crash) — this smoke test runs the
same code path at tiny scale on CPU so an import/API regression fails the
suite instead of the round.
"""

import json

import numpy as np
import pytest

import bench


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_bench_attack_and_extras_tiny(monkeypatch):
    monkeypatch.setattr(bench, "N_POINTS", 32)
    monkeypatch.setattr(bench, "BATCH_PAIRS", 4)
    monkeypatch.setattr(bench, "NUM_ITERS", 3)
    monkeypatch.setattr(bench, "TIMED_REPS", 1)
    monkeypatch.setattr(bench, "MATRIX_CLOUDS", 6)
    monkeypatch.setattr(bench, "MATRIX_POINTS", 16)
    monkeypatch.setattr(bench, "N_POINTS_REF", 48)
    monkeypatch.setattr(bench, "BATCH_PAIRS_REF", 4)
    monkeypatch.setattr(bench, "NUM_ITERS_REF", 3)
    # no sleeping through retry backoff if something fails — fail fast
    monkeypatch.setattr(bench, "_retry", lambda fn, what, delays=(): fn())

    rate = bench.bench_attack()
    assert np.isfinite(rate) and rate > 0

    rate_bf16 = bench.bench_attack(ae_dtype="bfloat16")
    assert np.isfinite(rate_bf16) and rate_bf16 > 0

    evals = bench.bench_chamfer_matrix()
    assert np.isfinite(evals) and evals > 0

    monkeypatch.setattr(bench, "TRAIN_CLOUDS", 8)
    monkeypatch.setattr(bench, "TRAIN_POINTS", 16)
    monkeypatch.setattr(bench, "TRAIN_BATCH", 4)
    train_rate = bench.bench_train_ae()
    assert np.isfinite(train_rate) and train_rate > 0

    monkeypatch.setattr(bench, "EMD_BATCH", 2)
    monkeypatch.setattr(bench, "EMD_POINTS", 16)
    monkeypatch.setattr(bench, "EMD_POINTS_REF", 24)
    emd_rate = bench.bench_emd_train_loss()
    assert np.isfinite(emd_rate) and emd_rate > 0


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_bench_main_prints_one_json_line(monkeypatch, capsys):
    monkeypatch.setattr(bench, "N_POINTS", 32)
    monkeypatch.setattr(bench, "BATCH_PAIRS", 4)
    monkeypatch.setattr(bench, "NUM_ITERS", 3)
    monkeypatch.setattr(bench, "TIMED_REPS", 1)
    monkeypatch.setattr(bench, "MATRIX_CLOUDS", 6)
    monkeypatch.setattr(bench, "MATRIX_POINTS", 16)
    monkeypatch.setattr(bench, "N_POINTS_REF", 48)
    monkeypatch.setattr(bench, "BATCH_PAIRS_REF", 4)
    monkeypatch.setattr(bench, "NUM_ITERS_REF", 3)
    monkeypatch.setattr(bench, "TRAIN_CLOUDS", 8)
    monkeypatch.setattr(bench, "TRAIN_POINTS", 16)
    monkeypatch.setattr(bench, "TRAIN_BATCH", 4)
    monkeypatch.setattr(bench, "EMD_BATCH", 2)
    monkeypatch.setattr(bench, "EMD_POINTS", 16)
    monkeypatch.setattr(bench, "EMD_POINTS_REF", 24)
    monkeypatch.setattr(bench, "_retry", lambda fn, what, delays=(): fn())
    monkeypatch.setattr(bench, "probe_chip_state", lambda: 1.0)
    monkeypatch.setattr(bench, "probe_chip_state_vpu", lambda: 1.0)
    monkeypatch.setattr(bench, "probe_chamfer_kernel", lambda: 1.0)
    # tiny CPU rates always sit below the TPU throttle threshold — no
    # sleep-retry loops in the smoke test
    monkeypatch.setattr(bench, "RETRY_IF_BELOW", 0.0)
    # skip the real subprocess availability probe (tests run on CPU)
    monkeypatch.setattr(
        bench, "_probe_relay_subprocess", lambda *a, **k: True
    )

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline", "extras"}
    assert rec["value"] > 0
    # the EMD baseline comparison must land with its sensitivity band
    assert "emd_vs_baseline" in rec["extras"]
    assert "emd_vs_baseline_range" in rec["extras"]


def test_bench_main_outage_mode_still_prints_record(monkeypatch, capsys):
    """If the relay never answers, main() must still print ONE honest JSON
    line (value 0, outage documented) instead of crashing recordless."""
    monkeypatch.setattr(
        bench, "_probe_relay_subprocess", lambda *a, **k: False
    )

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline", "extras"}
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "outage" in rec["extras"]["error"]
    assert "unofficial_dev_captures" in rec["extras"]


def test_retry_recovers_and_propagates(monkeypatch):
    import time as _time

    monkeypatch.setattr(_time, "sleep", lambda s: None)

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE")
        return "ok"

    assert bench._retry(flaky, "flaky", delays=(1, 1, 1)) == "ok"
    assert calls["n"] == 3

    def always_fails():
        raise RuntimeError("still down")

    # the attempt AFTER the backoff ladder propagates the error
    import pytest

    with pytest.raises(RuntimeError, match="still down"):
        bench._retry(always_fails, "dead", delays=(1,))
