"""As-of join + sessionization (operators/events.py).

Hand-worked timelines pin the semantics (backward-inclusive match,
equal-timestamp tie-breaks, NULL when nothing precedes, gap boundaries
exactly at/over the threshold); a plan test pins the single-exchange
shape of both operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_render_spark.operators.events import asof_join, session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_asof_backward_inclusive_and_null(spark):
    left = _events(
        spark,
        [
            (100, _ts(5), 1, "click", 0.0),   # matches view at t=3
            (101, _ts(10), 1, "click", 0.0),  # matches view at t=10 (inclusive)
            (102, _ts(1), 2, "click", 0.0),   # no view precedes -> NULL
            (103, _ts(9), 9, "click", 0.0),   # user has no views at all
        ],
    ).select("event_id", "user_id", "ts")
    right = _events(
        spark,
        [
            (1, _ts(3), 1, "view", 1.5),
            (2, _ts(10), 1, "view", 2.5),
            (3, _ts(2), 2, "view", 9.0),  # user 2's view AFTER t=1? no: t=2 > t=1
        ],
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(left, right).collect()
    }
    assert out[100] == (1, 1.5)
    assert out[101] == (2, 2.5)  # equal timestamp matches (inclusive)
    assert out[102] == (None, None)
    assert out[103] == (None, None)


def test_asof_equal_ts_tie_takes_max_event_id(spark):
    left = _events(spark, [(100, _ts(7), 1, "click", 0.0)]).select(
        "event_id", "user_id", "ts"
    )
    right = _events(
        spark,
        [(5, _ts(7), 1, "view", 1.0), (8, _ts(7), 1, "view", 2.0),
         (6, _ts(7), 1, "view", 3.0)],
    )
    row = asof_join(left, right).collect()[0]
    assert (row["asof_event_id"], row["asof_value"]) == (8, 2.0)


def test_asof_matches_python_reference(spark):
    # random-ish but deterministic timeline; compare against a direct
    # per-row scan reference
    lrows = [(100 + i, _ts((i * 37) % 120), 1 + i % 3, "click", 0.0) for i in range(40)]
    rrows = [(i, _ts((i * 53) % 120), 1 + i % 4, "view", float(i)) for i in range(30)]
    left = _events(spark, lrows).select("event_id", "user_id", "ts")
    right = _events(spark, rrows)

    def ref(lid, lu, lt):
        best = None
        for rid, rt, ru, _t, rv in [(r[0], r[1], r[2], r[3], r[4]) for r in rrows]:
            if ru == lu and rt <= lt and (best is None or (rt, rid) > (best[1], best[0])):
                best = (rid, rt, rv)
        return best[0] if best else None

    got = {r["event_id"]: r["asof_event_id"] for r in asof_join(left, right).collect()}
    for lid, lt, lu, _t, _v in lrows:
        assert got[lid] == ref(lid, lu, lt), lid


def test_sessionize_gap_boundaries(spark):
    # gaps: exactly 30 min stays in-session (> is strict), 30min+1us splits
    rows = [
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(30), 1, "view", 0.0),               # exactly 30' -> same session
        (3, _ts(60.0000001), 1, "view", 0.0),       # 30'+6us -> new session
        (4, _ts(61), 1, "view", 0.0),
        (5, _ts(0), 2, "view", 0.0),                # other user independent
    ]
    s = sessionize(_events(spark, rows), gap_minutes=30)
    seq = {r["event_id"]: r["session_seq"] for r in s.collect()}
    assert seq[1] == 1 and seq[2] == 1
    assert seq[3] == 2 and seq[4] == 2
    assert seq[5] == 1


def test_session_stats_aggregates(spark):
    rows = [
        (1, _ts(0), 1, "view", 1.004),      # floor(100.4+0.5) = 100
        (2, _ts(10), 1, "purchase", 2.006), # floor(200.6+0.5) = 201
        (3, _ts(120), 1, "view", 0.0),      # new session
    ]
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(_events(spark, rows)).collect()
    }
    a = out[(1, 1)]
    assert a["n_events"] == 2
    assert a["duration_us"] == 10 * 60 * 1_000_000
    assert a["value_cents"] == 301
    assert a["n_purchases"] == 1
    b = out[(1, 2)]
    assert b["n_events"] == 1 and b["duration_us"] == 0 and b["n_purchases"] == 0


def test_plan_single_exchange_no_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "view")
    import re

    plan = _plan(asof_join(left, right))
    # the union+window formulation must not plan any join operator …
    assert "Join" not in plan
    # … and exactly ONE exchange: hashpartitioning on the key column
    parts = re.findall(r"hashpartitioning\((\w+)", plan)
    assert parts == ["user_id"], (parts, plan)

    plan2 = _plan(session_stats(ev))
    assert "Join" not in plan2
    parts2 = re.findall(r"hashpartitioning\((\w+)", plan2)
    assert parts2 == ["user_id"], parts2


def test_od_matrix_hand_worked(spark):
    # user 1: cells A->A->B within gap, then a gap-break, then B->C
    rows = [
        (1, _ts(0), 1, "view", 0.0, 10),
        (2, _ts(5), 1, "view", 0.0, 10),    # A->A self transition
        (3, _ts(10), 1, "view", 0.0, 20),   # A->B
        (4, _ts(100), 1, "view", 0.0, 20),  # gap break: not counted
        (5, _ts(110), 1, "view", 0.0, 30),  # B->C
        (6, _ts(0), 2, "view", 0.0, 10),
        (7, _ts(3), 2, "view", 0.0, 20),    # A->B (second user)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, cell long",
    )
    from osm_render_spark.operators.events import od_matrix

    out = {
        (r["from_cell"], r["to_cell"]): (r["n_trips"], r["n_users"])
        for r in od_matrix(df, gap_minutes=30).collect()
    }
    assert out == {
        (10, 10): (1, 1),
        (10, 20): (2, 2),
        (20, 30): (1, 1),
    }
