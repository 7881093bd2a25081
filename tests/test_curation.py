"""Contamination check + sequence packing: Spark vs inline DuckDB
oracle, plus semantic properties (broadcast plan shape, packing
invariants)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.curation import (
    contamination_check,
    contamination_sql,
    greedy_pack,
    greedy_pack_sql,
    word_ngrams,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    # eval set = every 25th doc; train = the rest (same carve both engines)
    con.execute("CREATE VIEW ev AS SELECT * FROM documents WHERE doc_id % 25 = 0")
    con.execute("CREATE VIEW tr AS SELECT * FROM documents WHERE doc_id % 25 <> 0")
    yield con
    con.close()


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*sorted(df.columns)).collect()
    )


def _duck_rows(con, sql):
    rel = con.sql(sql)
    order = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rel.fetchall())


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    out = df.select(word_ngrams(F.col("text"), 3).alias("g")).collect()
    assert out[0]["g"] == ["a b c", "b c d"]
    assert out[1]["g"] == []


def test_contamination_matches_oracle(docs, duck):
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    tr = docs.filter(F.col("doc_id") % 25 != 0)
    got = _rows(contamination_check(tr, ev, n=8))
    want = _duck_rows(duck, contamination_sql("tr", "ev", n=8))
    assert got == want
    assert len(got) > 0  # the synthetic corpus's tiny vocab guarantees hits


def test_contamination_self_is_total(docs, duck):
    """Every doc with >= n words collides with itself when eval=train."""
    out = contamination_check(docs, docs, n=8)
    n_docs = docs.filter(F.size(F.split(F.col("text"), " ")) >= 8).count()
    assert out.count() == n_docs


def test_contamination_broadcasts_eval(docs):
    """Eval side broadcast AND the train side must reach that join
    without any exchange — the corpus-wide (doc_id, gram) distinct
    that r6 shipped was a full shuffle the aggregation made redundant."""
    ev = docs.filter(F.col("doc_id") % 25 == 0)
    tr = docs.filter(F.col("doc_id") % 25 != 0)
    plan = (
        contamination_check(tr, ev, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the streamed train subtree (printed between the join node and its
    # BroadcastExchange build side) must be exchange-free: scan →
    # explode → join, no corpus-wide distinct; the eval-side distinct
    # exchange inside the broadcast subtree is over the tiny eval set
    join_pos = plan.index("BroadcastHashJoin")
    bx_pos = plan.index("BroadcastExchange", join_pos)
    assert "Exchange hashpartitioning" not in plan[join_pos:bx_pos]
    assert "FileScan" in plan[join_pos:bx_pos]


def test_greedy_pack_matches_oracle(docs, duck):
    got = _rows(greedy_pack(docs, seq_len=2048, n_groups=8))
    want = _duck_rows(duck, greedy_pack_sql("documents", 2048, 8))
    assert got == want


def test_greedy_pack_invariants(docs):
    out = greedy_pack(docs, seq_len=2048, n_groups=8).cache()
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["pack_group"] < 8
        assert r["bin_id"] >= 0
        assert 0 <= r["bin_offset"] < 2048
    # per (group, bin): offsets are dense — total tokens STARTING in a
    # bin equals seq_len when a later bin exists in the group
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r["pack_group"], r["bin_id"]), []).append(r)
    for (g, b), members in by_bin.items():
        starts = sorted(m["bin_offset"] for m in members)
        assert starts[0] == 0 or any(
            m["spans_boundary"] for bb in range(b) for m in by_bin.get((g, bb), [])
        ) or b > 0  # a spanning doc from the previous bin covers the gap
    # determinism
    again = _rows(greedy_pack(docs, seq_len=2048, n_groups=8))
    assert _rows(out) == again


def test_greedy_pack_fill_ratio(docs):
    """Contiguous packing wastes nothing except each group's tail bin:
    the sum of tokens in every non-tail bin's span is exactly seq_len."""
    out = greedy_pack(docs, seq_len=2048, n_groups=4)
    stats = (
        out.groupBy("pack_group")
        .agg(F.sum("n_tokens").alias("toks"), F.max("bin_id").alias("last_bin"))
        .collect()
    )
    for r in stats:
        # every bin before the last is fully covered by construction
        assert r["toks"] > r["last_bin"] * 2048


# ---- repetition stats / duplicate spans / PII redaction -------------------


def test_repetition_matches_oracle(docs, duck):
    from knowledge_graph_system_spark.operators.curation import (
        repetition_sql,
        repetition_stats,
    )

    got = _rows(repetition_stats(docs, n=2))
    want = _duck_rows(duck, repetition_sql("documents", n=2))
    assert got == want and len(got) > 0


def test_repetition_shuffle_free_plan(docs):
    from knowledge_graph_system_spark.operators.curation import repetition_stats

    plan = repetition_stats(docs, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-doc fold must not shuffle


def test_repetition_known_values(spark):
    from knowledge_graph_system_spark.operators.curation import (
        repetition_filter,
        repetition_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),   # 3 bigrams, all "spam spam"
            (2, "a b c d"),               # 3 distinct bigrams
            (3, "x"),                     # too short: no bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert rows[1]["n_grams"] == 3
    assert rows[1]["top_gram_frac"] == 1.0 and rows[1]["dup_gram_frac"] == 1.0
    assert rows[2]["top_gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows[2]["dup_gram_frac"] == 0.0
    assert rows[3]["n_grams"] == 0 and rows[3]["top_gram_frac"] is None
    # filter: repeated doc fails, diverse + unmeasurable pass (NULL
    # passes); top_frac threshold 0.5 because a 3-bigram doc's floor
    # is 1/3 (tiny-doc artifact the default 0.2 gate would trip on)
    kept = sorted(
        r["doc_id"] for r in repetition_filter(df, n=2, max_top_frac=0.5).collect()
    )
    assert kept == [2, 3]


def test_duplicate_spans_match_oracle(docs, duck):
    from knowledge_graph_system_spark.operators.curation import (
        duplicate_span_sql,
        duplicate_span_stats,
    )

    got = _rows(duplicate_span_stats(docs, n=8))
    want = _duck_rows(duck, duplicate_span_sql("documents", n=8))
    assert got == want and len(got) > 0


def test_duplicate_spans_semantics(spark):
    from knowledge_graph_system_spark.operators.curation import duplicate_span_stats

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "lazy the quick brown fox sleeps"),  # shares "the quick brown fox"
            (3, "completely different words entirely here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in duplicate_span_stats(df, n=4).collect()}
    assert rows[1]["n_shared_spans"] == 1  # "the quick brown fox"
    assert rows[2]["n_shared_spans"] == 1
    assert rows[3]["n_shared_spans"] == 0 and rows[3]["shared_frac"] == 0.0


def test_pii_redact_matches_oracle(spark, duck):
    from knowledge_graph_system_spark.operators.curation import (
        pii_redact,
        pii_redact_sql,
    )

    fixture = spark.createDataFrame(
        [
            (1, "contact me at alice.smith+x@example.co.uk or 10.0.0.1"),
            (2, "call +123 456 7890 now or 555-123-4567"),
            (3, "no pii here at all"),
            (4, "a@b.io and 192.168.254.254 and 321 654 0987"),
            (5, "edge cases: a@b@c.com 999.999.999.999 12-34-56"),
        ],
        ["doc_id", "text"],
    )
    duck.register("pii_docs", fixture.toPandas())
    got = _rows(pii_redact(fixture))
    want = _duck_rows(duck, pii_redact_sql("pii_docs"))
    assert got == want
    out = {r["doc_id"]: r for r in pii_redact(fixture).collect()}
    assert out[1]["text_redacted"] == "contact me at <EMAIL> or <IP>"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1
    assert out[3]["n_pii"] == 0
    assert out[4]["n_pii"] == 3


def test_pii_redact_no_shuffle_no_udf(spark):
    from knowledge_graph_system_spark.operators.curation import pii_redact

    df = spark.createDataFrame([(1, "x@y.zz")], ["doc_id", "text"])
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ---- r7 registration candidates: driver-shaped oracle runs ----------------


def _driver_style_compare(spark, duck, fn, oracle_sql):
    """Exactly the driver's t2 compare: rows, sorted columns, cells."""
    got = _rows(fn(spark, SF_DIR))
    want = _duck_rows(duck, oracle_sql)
    assert got == want and len(got) > 0


def test_r7_candidate_repetition_spans(spark, duck):
    from knowledge_graph_system_spark.operators.curation import (
        cur_repetition_spans,
        cur_repetition_spans_oracle,
    )

    _driver_style_compare(
        spark, duck, cur_repetition_spans, cur_repetition_spans_oracle()
    )


def test_r7_candidate_pii_redact(spark, duck):
    from knowledge_graph_system_spark.operators.curation import (
        cur_pii_redact,
        cur_pii_redact_oracle,
    )

    _driver_style_compare(spark, duck, cur_pii_redact, cur_pii_redact_oracle())


def test_r7_candidate_split_mix(spark, duck):
    from knowledge_graph_system_spark.operators.curation import (
        smp_split_mix,
        smp_split_mix_oracle,
    )

    _driver_style_compare(spark, duck, smp_split_mix, smp_split_mix_oracle())


def test_r10_candidate_span_dedup(spark):
    """Driver-style compare for the prepared cur_span_dedup row at BOTH
    gate scale factors, plus the rewrite semantics the parity alone
    would not show: a non-trivial removal set exists (planted near-dups
    share 8-gram spans), untouched docs pass through verbatim, and a
    canonical first occurrence survives for every removed span."""
    import duckdb

    from knowledge_graph_system_spark.operators.curation import (
        cur_span_dedup,
        cur_span_dedup_oracle,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = cur_span_dedup(spark, sf)
        got = sorted(map(tuple, out.collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(map(tuple, con.execute(cur_span_dedup_oracle()).fetchall()))
        assert len(got) > 0 and got == want

        by_id = {r[0]: r for r in got}
        orig = dict(
            con.execute("SELECT doc_id, text FROM documents").fetchall()
        )
        con.close()
        # the rewrite did something, but not everything
        removed = sum(r[3] for r in got)
        untouched = [d for d, r in by_id.items() if r[3] == 0]
        assert removed > 0 and untouched
        # untouched docs are byte-identical to their input text
        for d in untouched:
            assert by_id[d][1] == orig[d]
        # every doc's kept+removed adds up to its original word count
        for d, r in by_id.items():
            assert r[2] + r[3] == len(orig[d].split(" "))


def test_span_dedup_apply_keeps_first_occurrence(spark):
    """Two docs sharing an exact 8-word span: the lower doc_id keeps
    the span, the higher one loses exactly those 8 words; a doc with
    no duplicated span is untouched; a doc shorter than n passes
    through whole."""
    from knowledge_graph_system_spark.operators.curation import span_dedup_apply

    span = "a b c d e f g h"
    rows = [
        (1, f"x1 x2 {span} y1 y2"),
        (2, f"z1 z2 z3 {span}"),
        (3, "unique words only here nothing repeats at all"),
        (4, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup_apply(docs, n=8).collect()}
    assert out[1]["clean_text"] == rows[0][1] and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "z1 z2 z3" and out[2]["n_removed"] == 8
    assert out[3]["clean_text"] == rows[2][1] and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "tiny doc" and out[4]["n_removed"] == 0


def test_span_dedup_apply_matches_pure_python_reference(spark):
    """Randomized differential against a pure-Python reference of the
    same spec (tiny vocabulary forces heavy accidental gram collisions,
    plus one planted full clone): clean text, kept and removed counts
    must agree doc-for-doc. Also pins the scale shape: no cartesian or
    nested-loop join anywhere in the plan."""
    import random

    from knowledge_graph_system_spark.operators.curation import span_dedup_apply

    rnd = random.Random(7)
    vocab = list("abcdefgh")
    rows = []
    for d in range(30):
        n_words = rnd.randint(0, 25)
        rows.append((d, " ".join(rnd.choice(vocab) for _ in range(n_words))))
    rows[5] = (5, rows[3][1])  # planted exact clone

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out_df = span_dedup_apply(docs, n=4)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    out = {r["doc_id"]: r for r in out_df.collect()}

    n = 4
    grams = []
    for d, t in rows:
        w = t.split(" ")
        for i in range(len(w) - n + 1):
            grams.append((d, i, " ".join(w[i : i + n])))
    first: dict[str, tuple[int, int]] = {}
    dead: dict[int, set[int]] = {}
    for g, d, i in sorted((g, d, i) for d, i, g in grams):
        if g in first:
            dead.setdefault(d, set()).update(range(i, i + n))
        else:
            first[g] = (d, i)
    for d, t in rows:
        w = t.split(" ")
        keep = [x for j, x in enumerate(w) if j not in dead.get(d, set())]
        want = (" ".join(keep), len(keep), len(w) - len(keep))
        got = (out[d]["clean_text"], out[d]["n_kept"], out[d]["n_removed"])
        assert got == want, (d, got, want)


def test_span_dedup_apply_max_df_exempts_hot_grams(spark):
    """The hot-gram cap: a boilerplate span repeated in many docs is
    EXEMPT from dedup when its occurrence count exceeds max_df (the
    MinHash band-cap liveness discipline), while a 2-occurrence span
    still dedups; max_df=None keeps today's behavior. The df count
    rides the existing gram-window exchange (no new shuffle: exactly
    one Exchange over the gram stream either way)."""
    from knowledge_graph_system_spark.operators.curation import span_dedup_apply

    hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    rare = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(d, f"u{d} {hot}") for d in range(10)]
    rows += [(100, f"x0 {rare}"), (101, f"y0 {rare}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped_df = span_dedup_apply(docs, n=8, max_df=5)
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(gram") == 1
    capped = {r["doc_id"]: r for r in capped_df.collect()}
    # hot span (10 occurrences > 5): every copy survives
    for d in range(10):
        assert capped[d]["n_removed"] == 0
    # rare span (2 occurrences <= 5): second occurrence still dedups
    assert capped[100]["n_removed"] == 0 and capped[101]["n_removed"] == 8

    uncapped = {r["doc_id"]: r for r in span_dedup_apply(docs, n=8).collect()}
    assert all(uncapped[d]["n_removed"] == 8 for d in range(1, 10))


def test_r11_candidate_pack_segments(spark):
    """Driver-style compare for the prepared cur_pack_segments row at
    BOTH gate scale factors, plus the tiling invariants the parity
    alone would not show: per-doc segment lengths sum to n_tokens,
    every bin's segments tile [0, fill) with no gap or overlap, and
    every non-tail bin of a group is exactly seq_len full."""
    import duckdb
    from collections import defaultdict

    from knowledge_graph_system_spark.operators.curation import (
        cur_pack_segments,
        cur_pack_segments_oracle,
        greedy_pack,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = cur_pack_segments(spark, sf).collect()
        got = sorted(map(tuple, rows))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')"
        )
        want = sorted(
            map(tuple, con.execute(cur_pack_segments_oracle()).fetchall())
        )
        con.close()
        assert len(got) > 0 and got == want
        assert any(r["doc_offset"] > 0 for r in rows)  # real splits happened

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        packed = {
            r["doc_id"]: r for r in greedy_pack(docs, seq_len=128, n_groups=8).collect()
        }
        per_doc = defaultdict(int)
        bins = defaultdict(list)
        for r in rows:
            per_doc[r["doc_id"]] += r["seg_len"]
            bins[(r["pack_group"], r["bin_id"])].append(
                (r["bin_offset"], r["seg_len"])
            )
        for d, tot in per_doc.items():
            assert tot == packed[d]["n_tokens"], d
        max_bin = {}
        for (g, b), segs in bins.items():
            segs.sort()
            pos = 0
            for off, ln in segs:
                assert off == pos and ln > 0, (g, b, segs)
                pos += ln
            assert pos <= 128
            max_bin[g] = max(max_bin.get(g, -1), b)
        for (g, b), segs in bins.items():
            if b < max_bin[g]:
                assert sum(ln for _, ln in segs) == 128, (g, b)
