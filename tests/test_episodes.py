"""Episode segmentation: window fast path == applyInPandas twin."""

import datetime as dt

import pytest

from knowledgegraphs_spark.operators.episodes import episode_ids, episode_ids_pandas


@pytest.fixture(scope="module")
def turns(spark):
    base = dt.datetime(2026, 1, 1)
    rows = []
    for conv, gaps in [("c1", [0, 10, 20, 400, 410, 1000]), ("c2", [0, 5]), ("c3", [0])]:
        for i, g in enumerate(gaps):
            rows.append((conv, i, base + dt.timedelta(seconds=g)))
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")


def test_episode_boundaries(spark, turns):
    out = {(r.conv_id, r.turn_idx): r.episode for r in episode_ids(turns, 300).collect()}
    # c1: gaps 10,10,380,10,590 → episodes 1,1,1,2,2,3
    assert [out[("c1", i)] for i in range(6)] == [1, 1, 1, 2, 2, 3]
    assert [out[("c2", i)] for i in range(2)] == [1, 1]
    assert out[("c3", 0)] == 1


def test_pandas_twin_matches_window(spark, turns):
    a = {tuple(r) for r in episode_ids(turns, 300).collect()}
    b = {tuple(r) for r in episode_ids_pandas(turns, 300).collect()}
    assert a == b
