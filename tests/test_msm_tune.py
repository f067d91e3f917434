"""The measured MSM parameter table (ops/msm_tune.py): persistence, window
selection, and routing crossovers (VERDICT r03 item 3 — constants replaced
by measurements)."""

import json

from curdleproofs_tpu.ops import msm_tune
from curdleproofs_tpu.ops.msm_device import pad_n, pick_params


def _with_table(tmp_path, monkeypatch, entries):
    import jax

    path = tmp_path / "tune.json"
    path.write_text(json.dumps({jax.default_backend(): entries}))
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    return path


def test_tuned_c_feeds_pick_params(tmp_path, monkeypatch):
    n = pad_n(1 << 17)
    _with_table(tmp_path, monkeypatch, {
        str(n): {"c": 16, "device_warm_ms": 1.0, "fresh_prep_ms": 1.0,
                 "host_ms": 9.0}})
    try:
        assert msm_tune.tuned_c(n) == 16
        assert pick_params(1 << 17).c == 16
        # untuned family falls back to the static heuristic
        assert pick_params(1 << 10).c == 8
    finally:
        msm_tune._load_raw.cache_clear()


def test_route_to_device_crossovers(tmp_path, monkeypatch):
    _with_table(tmp_path, monkeypatch, {
        "65536": {"c": 8, "device_warm_ms": 300.0, "fresh_prep_ms": 500.0,
                  "host_ms": 650.0},
        "1024": {"c": 8, "device_warm_ms": 34.0, "fresh_prep_ms": 40.0,
                 "host_ms": 8.0}})
    try:
        # resident 2^16: 300 < 650 -> device
        assert msm_tune.route_to_device(65536, resident=True) is True
        # fresh 2^16: 300 + 500 > 650 -> host
        assert msm_tune.route_to_device(65536, resident=False) is False
        # small: host wins either way
        assert msm_tune.route_to_device(1024, resident=True) is False
        # nearest-family scaling: 2^15 resolves against the 2^16 entry
        assert msm_tune.route_to_device(32768, resident=True) is True
    finally:
        msm_tune._load_raw.cache_clear()


def test_untuned_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(tmp_path / "absent.json"))
    msm_tune._load_raw.cache_clear()
    try:
        assert msm_tune.route_to_device(65536, resident=True) is None
        assert msm_tune.tuned_c(65536) is None
    finally:
        msm_tune._load_raw.cache_clear()


def test_record_entry_round_trip(tmp_path, monkeypatch):
    path = tmp_path / "rw.json"
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    try:
        msm_tune.record_entry(2048, {"c": 8, "device_warm_ms": 5.0,
                                     "fresh_prep_ms": 6.0, "host_ms": 7.0})
        table = msm_tune.load_table()
        assert table[2048]["host_ms"] == 7.0
        # second write merges, not clobbers
        msm_tune.record_entry(4096, {"c": 16, "device_warm_ms": 1.0,
                                     "fresh_prep_ms": 1.0, "host_ms": 9.0})
        table = msm_tune.load_table()
        assert set(table) == {2048, 4096}
    finally:
        msm_tune._load_raw.cache_clear()
