"""From-scratch BPE: parity against an independent pure-Python
reference implementation (the non-SQL-expressible-operator gate),
determinism, canonical greedy-left semantics, and the packing rewire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledge_graph_system_spark.operators.bpe import (
    bpe_segment_words,
    bpe_token_counts,
    learn_bpe,
)
from tests.conftest import SF_DIR


# ---- independent reference implementation (driver-side, no Spark) ---------


def _reference_learn(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n
                )
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            tuple(_reference_apply_one(list(s), best)): n
            for s, n in (
                (list(syms), n) for syms, n in vocab.items()
            )
        }
    return merges


def _reference_apply_one(syms, pair):
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _reference_segment(word: str, merges) -> list[str]:
    syms = list(word)
    for pair in merges:
        syms = _reference_apply_one(syms, pair)
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def merges(docs):
    return learn_bpe(docs, n_merges=24)


def test_learn_is_deterministic_and_matches_reference(docs, merges):
    """learn_bpe must equal the independent reference learner run on
    the same word-frequency table, and re-running must reproduce it."""
    counts = {
        r["word"]: r["n"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert merges == _reference_learn(counts, 24)
    assert merges == learn_bpe(docs, n_merges=24)
    assert len(merges) == 24
    # merged symbols really are pairs of previously available symbols
    available = set("abcdefghijklmnopqrstuvwxyz")
    for a, b in merges:
        assert a in available and b in available
        available.add(a + b)


def test_spark_segmentation_matches_reference(docs, merges):
    """The chained aggregate() folds must segment every distinct corpus
    word exactly like the reference implementation (canonical
    greedy-left per merge, merges in learned order)."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    out = bpe_segment_words(words, merges).collect()
    assert len(out) > 20  # the synthetic corpus vocabulary is tiny
    for r in out:
        want = _reference_segment(r["word"], merges)
        assert r["tokens"] == want, (r["word"], r["tokens"], want)
        assert r["n_bpe_tokens"] == len(want)


def test_greedy_left_run_semantics(spark):
    """['a','a','a'] under merge (a, a) -> ['aa', 'a'], the canonical
    greedy-left result (the corner where sequential string replacement
    diverges from real BPE)."""
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("ababab",)], ["word"])
    out = {
        r["word"]: r["tokens"]
        for r in bpe_segment_words(df, [("a", "a"), ("a", "b")]).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["ababab"] == ["ab", "ab", "ab"]


def test_token_counts_and_packing_rewire(docs, merges):
    """Per-doc counts equal the sum of per-word reference counts, BPE
    counts differ from the whitespace proxy (the calibration point),
    and greedy_pack consumes them through tokens_col."""
    counts = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    sample = docs.select("doc_id", "text").limit(20).collect()
    for r in sample:
        words = r["text"].split(" ")
        want = sum(len(_reference_segment(w, merges)) for w in words)
        assert counts[r["doc_id"]]["n_bpe_tokens"] == want
        assert counts[r["doc_id"]]["n_words"] == len(words)
    assert any(
        c["n_bpe_tokens"] != c["n_words"] for c in counts.values()
    )  # the whitespace proxy really was miscalibrated

    from knowledge_graph_system_spark.operators.curation import greedy_pack

    budgeted = docs.join(
        bpe_token_counts(docs, merges).select(
            "doc_id", F.col("n_bpe_tokens").alias("bpe")
        ),
        "doc_id",
    )
    packed = greedy_pack(
        budgeted, seq_len=2048, n_groups=4, tokens_col=F.col("bpe")
    )
    got = {r["doc_id"]: r["n_tokens"] for r in packed.collect()}
    assert all(
        got[d] == counts[d]["n_bpe_tokens"] for d in list(got)[:50]
    )


def test_segmentation_plan_is_jvm_side(docs, merges):
    """No Python evaluation anywhere: the folds are higher-order
    column expressions, and the corpus side joins a broadcast vocab."""
    df = bpe_token_counts(docs, merges)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan


def test_r8_candidate_bpe_counts(spark):
    """Driver-style run of the prepared r8 candidate: stable schema,
    one row per source, and totals consistent with bpe_token_counts."""
    from knowledge_graph_system_spark.operators.bpe import t_bpe_counts

    out = t_bpe_counts(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(out) == docs.select("source").distinct().count()
    assert all(r["bpe_tokens"] >= r["ws_tokens"] > 0 for r in out)


def test_segmentation_concat_roundtrip_random_words(spark, merges):
    """Invariant: merging never loses or reorders characters —
    concatenating the token array reproduces the word exactly, for 200
    seeded-random words over a hostile alphabet (runs, repeats)."""
    import random

    rng = random.Random(20260814)
    words = [
        "".join(rng.choice("aabbcz") for _ in range(rng.randint(1, 24)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in set(words)], ["word"])
    for r in bpe_segment_words(df, merges).collect():
        assert "".join(r["tokens"]) == r["word"]
        assert r["tokens"] == _reference_segment(r["word"], merges)


def test_r8_candidate_pack_bpe(spark):
    """Driver-style run of cur_pack_bpe plus value parity: the packed
    group totals must equal the independently gated per-doc BPE counts
    summed over the same quota set. greedy_pack's packing is
    driver-hash-exact via cur_pack_quota's SQL twin and
    bpe_token_counts is gated against the pure-Python reference above,
    so the composition's only new surface is the wiring this pins."""
    from knowledge_graph_system_spark.operators.bpe import cur_pack_bpe
    from knowledge_graph_system_spark.operators.sampling import domain_quota

    out = cur_pack_bpe(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = learn_bpe(docs, n_merges=24)
    quota = domain_quota(docs, "source", F.col("n_chars"), 200, "doc_id")
    counts = bpe_token_counts(quota, merges)
    assert sum(r["n_docs"] for r in out) == quota.count()
    assert (
        sum(r["total_tokens"] for r in out)
        == counts.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    assert {r["pack_group"] for r in out} == set(range(8))
    assert all(r["n_bins"] >= 1 for r in out)


def test_pack_bpe_plan_is_jvm_side(spark):
    """The returned pack/quota frame stays whole-stage JVM: the only
    driver work is learn_bpe's bounded vocab collect at build time."""
    from knowledge_graph_system_spark.operators.bpe import cur_pack_bpe

    plan = (
        cur_pack_bpe(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_merge_table_roundtrip(spark, docs, merges):
    """save/load preserves the merge table exactly, and segmentation
    under the loaded table is bit-identical to the in-memory one."""
    import tempfile

    from knowledge_graph_system_spark.operators.bpe import load_bpe, save_bpe

    with tempfile.TemporaryDirectory(prefix="kg_bpe_") as tmp:
        path = f"{tmp}/merges"
        save_bpe(merges, spark, path)
        loaded = load_bpe(spark, path)
        assert loaded == merges
        a = sorted(map(tuple, bpe_token_counts(docs, merges).collect()))
        b = sorted(map(tuple, bpe_token_counts(docs, loaded).collect()))
        assert a == b


def test_pack_bpe_saved_table_identity(spark, tmp_path):
    """train -> save -> load -> pack must be row-identical to the
    inline-learning graded row (cur_pack_bpe): the persisted merge
    table carries the full priority order, so the saved-table chain is
    the same function with a cheaper cost posture (VERDICT r8 next #7)."""
    from knowledge_graph_system_spark.operators.bpe import (
        cur_pack_bpe,
        cur_pack_bpe_from_saved,
        learn_bpe,
        save_bpe,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    table = str(tmp_path / "bpe_table")
    save_bpe(learn_bpe(docs, n_merges=24), spark, table)
    got = sorted(map(tuple, cur_pack_bpe_from_saved(spark, SF_DIR, table).collect()))
    want = sorted(map(tuple, cur_pack_bpe(spark, SF_DIR).collect()))
    assert len(got) > 0 and got == want


# ---------------------------------------------------------------------------
# r11: property test for the GENERATED SQL oracle (bpe_counts_oracle_sql)
# — three-way agreement on RANDOM corpora, not just the fixture: the
# Spark fold chain, the DuckDB replace()-chain oracle, and the pure-
# Python reference must produce identical per-source (n_docs,
# ws_tokens, bpe_tokens) rollups. Small 'a'/'b'-heavy alphabet
# maximizes merge interactions (greedy-left runs like 'aaaa'); the
# occasional non-alpha word exercises the learn-filter vs
# segment-everything split.
# ---------------------------------------------------------------------------


def test_bpe_oracle_three_way_property(spark):
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from knowledge_graph_system_spark.operators.bpe import (
        bpe_counts_oracle_sql,
        bpe_token_counts,
        learn_bpe,
    )

    word = st.text(alphabet="ab", min_size=1, max_size=6)
    odd = st.sampled_from(["a1b", "x!", "ba9"])  # non-alpha: segment-only
    doc = st.lists(st.one_of(word, word, word, odd), min_size=1, max_size=8)
    corpus = st.lists(doc, min_size=2, max_size=6)

    @settings(max_examples=10, deadline=None)
    @given(corpus=corpus)
    def check(corpus):
        n_merges = 4
        rows = [
            (i, " ".join(words), "s" + str(i % 2))
            for i, words in enumerate(corpus)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        merges = learn_bpe(docs, n_merges=n_merges)
        # r12: no assume(len(merges) == n_merges) — the oracle's LEFT
        # JOIN carry-forward (ADVICE r11) makes exhausted corpora
        # in-scope for the three-way check too

        # leg 1: Python reference, per-source rollup
        from collections import Counter

        wc = Counter(
            w
            for _i, text, _s in rows
            for w in text.split(" ")
            if w and w.isalpha() and w == w.lower() and w.isascii()
        )
        ref_merges = _reference_learn(dict(wc), n_merges)
        assert merges == ref_merges
        expect = {}
        for i, text, src in rows:
            words = text.split(" ")
            nd, ws, bp = expect.get(src, (0, 0, 0))
            expect[src] = (
                nd + 1,
                ws + len(words),
                bp + sum(len(_reference_segment(w, merges)) for w in words),
            )

        # leg 2: the Spark fold chain
        got_spark = {
            r["source"]: (r["n_docs"], r["ws_tokens"], r["bpe_tokens"])
            for r in bpe_token_counts(docs, merges)
            .join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_words").alias("ws_tokens"),
                F.sum("n_bpe_tokens").alias("bpe_tokens"),
            )
            .collect()
        }
        assert got_spark == expect

        # leg 3: the generated DuckDB oracle (learning INCLUDED)
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(rows, columns=["doc_id", "text", "source"]),
        )
        got_duck = {
            s: (nd, ws, bp)
            for s, nd, ws, bp in con.execute(
                bpe_counts_oracle_sql(n_merges=n_merges)
            ).fetchall()
        }
        con.close()
        assert got_duck == expect

    check()


# r12 (ADVICE r11, bpe.py:330): the generated oracle previously cross-
# joined b{k} into v{k}/s{k}, so a corpus with fewer than n_merges
# distinct pairs emptied the whole chain and the oracle silently
# returned zero rows while the Python learn_bpe just ended early. The
# LEFT JOIN ... ON TRUE + COALESCE carry-forward makes the exhausted
# case match Python exactly; this pins it with a corpus that exhausts
# after ONE merge ('aa' -> one pair, then all words single-symbol).


def test_bpe_oracle_exhausted_merges(spark):
    import duckdb
    import pandas as pd

    from knowledge_graph_system_spark.operators.bpe import (
        bpe_counts_oracle_sql,
        learn_bpe,
    )

    rows = [(0, "aa aa x9", "s0"), (1, "aa a", "s1")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    merges = learn_bpe(docs, n_merges=6)
    assert len(merges) < 6  # the corpus really does exhaust early
    assert merges[0] == ("a", "a")

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    got = {
        s: (nd, ws, bp)
        for s, nd, ws, bp in con.execute(
            bpe_counts_oracle_sql(n_merges=6)
        ).fetchall()
    }
    con.close()
    # 'aa' -> ['aa'] (1), 'a' -> ['a'] (1), 'x9' non-alpha -> chars (2)
    assert got == {"s0": (1, 3, 4), "s1": (1, 2, 2)}
