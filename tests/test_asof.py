"""As-of join: point-in-time enrichment semantics and the single-shuffle
union-tag plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bop_consus_importing_rdf_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (2, _ts(20), 100), (3, _ts(5), 200),
         (4, _ts(30), 300)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(15), 2.0), (200, _ts(7), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_basic_and_boundary(spark):
    left, right = _frames(spark)
    out = {r.event_id: (r.asof_ts, r.asof_value)
           for r in asof_join(left, right, on="user_id").collect()}
    # boundary: right row AT left.ts matches (<= semantics)
    assert out[1] == (_ts(10), 1.0)
    # most recent prior, not first
    assert out[2] == (_ts(15), 2.0)
    # no right row at or before ts -> NULLs, row preserved (left join)
    assert out[3] == (None, None)
    # key with no right rows at all
    assert out[4] == (None, None)


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {r.event_id: r.asof_value
           for r in asof_join(left, right, on="user_id",
                              tolerance_seconds=5).collect()}
    assert out[1] == 1.0          # age 0 <= 5
    assert out[2] == 2.0          # age 5 <= 5 (boundary kept)
    assert out[3] is None and out[4] is None


def test_asof_tiebreak_duplicate_right_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(100, _ts(10), 1.0), (100, _ts(10), 7.0)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, on="user_id",
                    tiebreak_col="value").collect()
    assert out[0].asof_value == 7.0  # last under tiebreak ordering wins


def test_asof_single_exchange_plan(spark):
    """The at-scale contract: ONE hash exchange (the window's key
    partitioning) shared by both union branches — no range-join
    explosion, no extra shuffle per side."""
    left, right = _frames(spark)
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_matches_pandas_merge_asof(spark):
    """Property: asof_join == pandas.merge_asof(direction='backward',
    allow_exact_matches=True) over hypothesis-generated event streams
    (few keys → dense per-key histories; (key, ts) unique on the right,
    matching the operator's no-tiebreak contract)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ts_s = st.integers(min_value=0, max_value=50)

    @given(
        left=st.lists(st.tuples(st.sampled_from([1, 2, 3]), ts_s),
                      min_size=1, max_size=25),
        right=st.lists(st.tuples(st.sampled_from([1, 2, 3]), ts_s,
                                 st.integers(0, 99)),
                       min_size=0, max_size=25),
    )
    @settings(max_examples=15, deadline=None)
    def check(left, right):
        # unique (key, ts) on the right: keep the first generated value
        seen, r_rows = set(), []
        for k, t, v in right:
            if (k, t) not in seen:
                seen.add((k, t))
                r_rows.append((k, t, float(v)))
        l_rows = [(i, k, _ts(t)) for i, (k, t) in enumerate(left)]
        ldf = spark.createDataFrame(
            l_rows, "event_id long, user_id long, ts timestamp"
        )
        rdf = spark.createDataFrame(
            [(k, _ts(t), v) for k, t, v in r_rows] or
            [(0, _ts(0), 0.0)],
            "user_id long, ts timestamp, value double",
        )
        if not r_rows:
            rdf = rdf.filter(F.lit(False))
        got = {
            r.event_id: (r.asof_ts, r.asof_value)
            for r in asof_join(ldf, rdf, on="user_id").collect()
        }

        lp = pd.DataFrame(l_rows, columns=["event_id", "user_id", "ts"])
        rp = pd.DataFrame(
            [(k, _ts(t), v) for k, t, v in r_rows],
            columns=["user_id", "ts", "value"],
        )
        if rp.empty:
            want = {i: (None, None) for i in lp.event_id}
        else:
            m = pd.merge_asof(
                lp.sort_values("ts", kind="stable"),
                rp.sort_values("ts", kind="stable"),
                on="ts", by="user_id", direction="backward",
                allow_exact_matches=True, suffixes=("", "_r"),
            )
            want = {}
            for row in m.itertuples():
                matched = not pd.isna(row.value)
                want[row.event_id] = (
                    rp[(rp.user_id == row.user_id)
                       & (rp.ts <= row.ts)].ts.max().to_pydatetime()
                    if matched else None,
                    row.value if matched else None,
                )
        assert set(got) == set(want)
        for eid, (wts, wv) in want.items():
            gts, gv = got[eid]
            assert gts == wts and gv == wv, (eid, got[eid], (wts, wv))

    check()
