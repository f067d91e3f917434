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


def test_contention_guard_quarantines_outlier(tmp_path, monkeypatch):
    """The exact r04 pollution: committed host_ms 359.1, a contended pass
    measures 964.4 (2.7x) — the guard must NOT let it overwrite live fields."""
    path = tmp_path / "g.json"
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    try:
        good = {"c": 8, "device_warm_ms": 319.7, "fresh_prep_ms": 257.1,
                "host_ms": 359.1}
        assert msm_tune.record_entry(65536, good) == "written"
        bad = {"c": 8, "device_warm_ms": 330.0, "fresh_prep_ms": 260.0,
               "host_ms": 964.4}
        assert msm_tune.record_entry(65536, bad) == "quarantined"
        table = msm_tune.load_table()
        assert table[65536]["host_ms"] == 359.1          # live value intact
        assert table[65536]["pending"]["host_ms"] == 964.4
        # a pass agreeing with the committed value clears nothing but writes
        ok2 = dict(good, host_ms=370.0)
        assert msm_tune.record_entry(65536, ok2) == "written"
        assert msm_tune.load_table()[65536]["host_ms"] == 370.0
    finally:
        msm_tune._load_raw.cache_clear()


def test_contention_guard_two_agreeing_passes_overwrite(tmp_path, monkeypatch):
    path = tmp_path / "g2.json"
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    try:
        msm_tune.record_entry(65536, {"c": 8, "device_warm_ms": 300.0,
                                      "fresh_prep_ms": 250.0,
                                      "host_ms": 359.1})
        slow = {"c": 8, "device_warm_ms": 300.0, "fresh_prep_ms": 250.0,
                "host_ms": 950.0}
        assert msm_tune.record_entry(65536, slow) == "quarantined"
        slow2 = dict(slow, host_ms=980.0)
        assert msm_tune.record_entry(65536, slow2) == "written"
        entry = msm_tune.load_table()[65536]
        assert entry["host_ms"] == 980.0                # platform really moved
        assert 359.1 in entry["host_ms_history"]        # spread preserved
    finally:
        msm_tune._load_raw.cache_clear()


def test_contention_guard_force_overrides(tmp_path, monkeypatch):
    path = tmp_path / "g3.json"
    monkeypatch.setenv("CURDLEPROOFS_TUNE", str(path))
    msm_tune._load_raw.cache_clear()
    try:
        msm_tune.record_entry(1024, {"c": 8, "device_warm_ms": 40.0,
                                     "fresh_prep_ms": 60.0, "host_ms": 17.0})
        outlier = {"c": 8, "device_warm_ms": 40.0, "fresh_prep_ms": 60.0,
                   "host_ms": 170.0}
        assert msm_tune.record_entry(1024, outlier, force=True) == "written"
        assert msm_tune.load_table()[1024]["host_ms"] == 170.0
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
