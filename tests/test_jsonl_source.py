"""JSONL quarantine source: parse/quarantine split, raw-line replay,
schema-drift-is-not-corruption semantics."""

from __future__ import annotations

import os

from knowledge_graph_system_spark.sources.jsonl import (
    ingest_report,
    read_jsonl_quarantine,
)

SCHEMA = "doc_id long, text string, lang string"

LINES = [
    '{"doc_id": 1, "text": "alpha beta", "lang": "en"}',
    '{"doc_id": 2, "text": "gamma", "lang": "fr"}',
    '{"doc_id": 3, "text": "truncated',                 # broken JSON
    'not json at all',                                  # garbage
    '{"doc_id": 4, "text": "delta"}',                   # missing lang: drift, NOT corrupt
    '{"doc_id": "five", "text": "epsilon", "lang": "de"}',  # type mismatch
]


def _write_feed(tmp_path) -> str:
    p = str(tmp_path / "feed.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(LINES) + "\n")
    return p


def test_split_and_quarantine(spark, tmp_path):
    qdir = str(tmp_path / "quarantine")
    good, bad = read_jsonl_quarantine(
        spark, _write_feed(tmp_path), SCHEMA, quarantine_dir=qdir
    )
    good_rows = {r["doc_id"]: r for r in good.collect()}
    # 1, 2 parse clean; 4 parses with NULL lang (drift != corruption);
    # "five" fails the long cast -> corrupt
    assert set(good_rows) == {1, 2, 4}
    assert good_rows[4]["lang"] is None
    raws = sorted(r["raw"] for r in bad.collect())
    assert len(raws) == 3
    assert any("truncated" in r for r in raws)
    assert any("not json" in r for r in raws)
    assert any("five" in r for r in raws)
    # quarantine dir holds the same raw lines, replayable as text
    requeued = sorted(r["value"] for r in spark.read.text(qdir).collect())
    assert requeued == raws


def test_ingest_report(spark, tmp_path):
    good, bad = read_jsonl_quarantine(spark, _write_feed(tmp_path), SCHEMA)
    row = ingest_report(good, bad).collect()[0]
    assert (row["n_good"], row["n_bad"]) == (3, 3)
    assert row["bad_frac"] == 0.5


def test_clean_feed_has_empty_quarantine(spark, tmp_path):
    p = str(tmp_path / "clean.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 9, "text": "ok", "lang": "en"}\n')
    good, bad = read_jsonl_quarantine(spark, p, SCHEMA)
    assert good.count() == 1 and bad.count() == 0


def test_csv_quarantine_split(spark, tmp_path):
    from knowledge_graph_system_spark.sources.jsonl import read_csv_quarantine

    p = str(tmp_path / "feed.csv")
    with open(p, "w") as f:
        f.write("1,alpha beta,en\n")
        f.write("2,gamma,fr\n")
        f.write("oops,not a long,de\n")      # type cast failure
        f.write("4,delta,\n")                 # empty lang: NULL, not corrupt
    good, bad = read_csv_quarantine(spark, p, SCHEMA)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[4]["lang"] is None
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 1 and "oops" in raws[0]


def test_release_drops_the_scan_cache(spark, tmp_path):
    """The shared scan cache must leave executor storage on release()
    — without it every feed read leaks one cached scan for the session
    lifetime."""
    feed = read_jsonl_quarantine(spark, _write_feed(tmp_path), SCHEMA)
    feed.good.count(), feed.bad.count()
    assert feed._cached.storageLevel.useMemory
    feed.release()
    assert not feed._cached.storageLevel.useMemory
