"""As-of join semantics: inclusive boundary, tie-break, no-match NULLs."""

from __future__ import annotations

import datetime as dt

from knowledge_graph_system_spark.operators.asof import asof_join

T = dt.datetime(2024, 1, 1)


def _m(minutes):
    return T + dt.timedelta(minutes=minutes)


def test_asof_semantics(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _m(0), 10, 100.0),
            ("A", _m(10), 11, 110.0),
            ("A", _m(10), 12, 120.0),  # tie at minute 10 with 11
            ("B", _m(5), 20, 200.0),
        ],
        "sym string, qts timestamp, qid long, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _m(0), 1),    # exactly at quote 10 → inclusive match
            ("A", _m(9), 2),    # between → quote 10
            ("A", _m(10), 3),   # tie timestamp → deterministic max-qid (12)
            ("A", _m(99), 4),   # far after → latest (tie winner 12)
            ("B", _m(4), 5),    # before any B quote → NULL
            ("C", _m(1), 6),    # unknown key → NULL
        ],
        "sym string, tts timestamp, tid long",
    )
    out = {
        r["tid"]: (r["qid"], r["px"])
        for r in asof_join(
            trades,
            quotes,
            on_key=("sym", "sym"),
            on_time=("tts", "qts"),
            payload=["qid", "px"],
            tiebreak="qid",
        ).collect()
    }
    assert out[1] == (10, 100.0)
    assert out[2] == (10, 100.0)
    assert out[3] == (12, 120.0)  # ties resolve to max tiebreak, both payload cols from SAME row
    assert out[4] == (12, 120.0)
    assert out[5] == (None, None)
    assert out[6] == (None, None)


def test_asof_null_payload_not_torn(spark):
    """A NULL field in the matched (latest) right row must stay NULL — not
    back-fill from an older row (payload carried as one struct)."""
    quotes = spark.createDataFrame(
        [
            ("A", _m(0), 10, 100.0),
            ("A", _m(10), 11, None),  # latest row has NULL px
        ],
        "sym string, qts timestamp, qid long, px double",
    )
    trades = spark.createDataFrame(
        [("A", _m(20), 1)], "sym string, tts timestamp, tid long"
    )
    row = asof_join(
        trades, quotes,
        on_key=("sym", "sym"), on_time=("tts", "qts"),
        payload=["qid", "px"], tiebreak="qid",
    ).collect()[0]
    assert row["qid"] == 11
    assert row["px"] is None  # genuine NULL, not 100.0 from the older row
