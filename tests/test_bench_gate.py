"""bench.py load-gate protocol: the artifact's quiet-box evidence must be
trustworthy, so the gate itself is under test — it waits while the 1-min
load average exceeds the threshold, records EVERY observation, and gives
up (recording clean=False) after the bounded wait."""

import importlib


def _fresh_bench(monkeypatch):
    import bench

    importlib.reload(bench)
    monkeypatch.setattr(bench, "GATE_WAIT_S", 60)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._LOAD_GATE_LOG.clear()
    return bench


def test_gate_records_single_clean_observation(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.2, 0.0, 0.0))
    bench.gate_load("phase_a")
    rec = bench._LOAD_GATE_LOG["phase_a"]
    assert rec == {
        "loadavg": 1.2, "observations": [1.2], "waited_s": 0,
        "gate": bench.LOAD_GATE, "clean": True,
    }


def test_gate_waits_until_quiet_and_keeps_every_observation(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    seq = iter([14.0, 11.5, 9.1, 3.0, 99.0])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(seq), 0.0, 0.0))
    bench.gate_load("phase_b")
    rec = bench._LOAD_GATE_LOG["phase_b"]
    assert rec["observations"] == [14.0, 11.5, 9.1, 3.0]   # stopped at quiet
    assert rec["loadavg"] == 3.0 and rec["clean"] is True
    assert rec["waited_s"] == 45                            # 3 waits x 15 s


def test_gate_bounded_give_up_is_recorded_dirty(monkeypatch):
    bench = _fresh_bench(monkeypatch)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (20.0, 0.0, 0.0))
    bench.gate_load("phase_c")
    rec = bench._LOAD_GATE_LOG["phase_c"]
    assert rec["clean"] is False                            # honest artifact
    assert rec["waited_s"] >= 60
    assert all(o == 20.0 for o in rec["observations"])
