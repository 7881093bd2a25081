"""Raw-feed ingestion: JSONL with malformed-record quarantine.

Real document feeds arrive as JSONL, and at 100 TB some fraction of
lines is always broken (truncated writes, encoding damage, schema
drift). Dropping them silently corrupts provenance; failing the job on
one bad line at terabyte scale is worse. The production contract is
three-way: parse what parses, QUARANTINE the raw text of what doesn't
(for replay after a fix), and report both counts.

Spark-first: the JSON reader's PERMISSIVE mode with a corrupt-record
column does the classification in the scan itself — no Python, no
second pass over good rows. (The reference ingests via file upload +
serializer with its own malformed handling, `api/app/lib/
serialization/importer.py`; this is that duty for raw feeds.)

Gotcha encoded here: Spark refuses queries that select ONLY the
corrupt-record column from a JSON scan (the parser would need to
re-run per filter), so the split frame is cached before filtering —
one scan, both outputs. The cache lives until the CALLER invokes
`QuarantinedFeed.release()` (good/bad are lazy views over it, so the
reader cannot know when both have been consumed); a long-lived session
that skips release() accumulates one cached scan per feed read.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_record"


@dataclass
class QuarantinedFeed:
    """Result of a quarantine read: `good` (typed rows) and `bad` (raw
    unparseable lines) are lazy views over one cached scan; call
    `release()` after both are materialized to drop that cache.
    Iterable as (good, bad) for unpacking."""

    good: DataFrame
    bad: DataFrame
    _cached: DataFrame

    def release(self) -> None:
        self._cached.unpersist()

    def __iter__(self):
        return iter((self.good, self.bad))


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_dir: str | None = None,
) -> QuarantinedFeed:
    """(good, bad): parsed rows matching `schema`, and raw lines that
    failed to parse (one column `raw`); `.release()` drops the shared
    scan cache once the caller has materialized both.

    `schema` is the DDL for the EXPECTED fields (without the corrupt
    column). A line that is valid JSON but misses a non-null field
    still lands in `good` with NULLs — schema drift is a filter
    decision for the caller, not a parse failure. If `quarantine_dir`
    is given, bad raw lines are appended there as text for replay."""
    full = f"{schema}, {_CORRUPT} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    if quarantine_dir is not None:
        bad.write.mode("append").text(quarantine_dir)
    return QuarantinedFeed(good, bad, df)


def ingest_report(good: DataFrame, bad: DataFrame) -> DataFrame:
    """One-row (n_good, n_bad, bad_frac) frame — the feed-health metric
    a pipeline alerts on."""
    spark = good.sparkSession
    n_good, n_bad = good.count(), bad.count()
    total = n_good + n_bad
    from ..functions.scale import local_df

    return local_df(
        spark,
        [(n_good, n_bad, round(n_bad / total, 6) if total else 0.0)],
        "n_good long, n_bad long, bad_frac double",
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_dir: str | None = None,
    header: bool = False,
    sep: str = ",",
) -> QuarantinedFeed:
    """CSV twin of read_jsonl_quarantine — same three-way contract
    (parse / quarantine raw / report), same PERMISSIVE-scan
    classification. Malformed = wrong field count or a failed type
    cast; a NULL in a nullable field is data, not corruption."""
    full = f"{schema}, {_CORRUPT} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
        .cache()
    )
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    if quarantine_dir is not None:
        bad.write.mode("append").text(quarantine_dir)
    return QuarantinedFeed(good, bad, df)


# ---------------------------------------------------------------------------
# r7 registration: the quarantine contract as a driver row. The feed is
# derived from the documents table itself (every 37th doc serialized
# deliberately broken), so the DuckDB oracle predicts both the good-row
# aggregates and the quarantine count from the parquet source alone.
# ---------------------------------------------------------------------------

from ..registry import query  # noqa: E402


@query(
    "src_jsonl_quarantine",
    oracle="""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id % 37 <> 0 GROUP BY lang
UNION ALL
SELECT '__quarantined__', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
FROM documents WHERE doc_id % 37 = 0
""",
)
def src_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the documents table through a JSONL feed with every
    37th line corrupted (truncated JSON), read it back through the
    PERMISSIVE quarantine scan, and return per-lang good-row aggregates
    plus one '__quarantined__' row carrying the bad-line count. The
    result is materialized before the scratch feed dir is removed and
    the scan cache released."""
    import shutil
    import tempfile

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    line = F.to_json(F.struct("doc_id", "lang", "source", "n_chars"))
    broken = F.concat(
        F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(", BROKEN")
    )
    feed_dir = tempfile.mkdtemp(prefix="jsonl_feed_")
    try:
        docs.select(
            F.when(F.col("doc_id") % 37 == 0, broken).otherwise(line).alias("value")
        ).coalesce(4).write.mode("overwrite").text(feed_dir + "/feed")
        feed = read_jsonl_quarantine(
            spark,
            feed_dir + "/feed",
            "doc_id long, lang string, source string, n_chars long",
        )
        n_bad = feed.bad.count()
        good_agg = feed.good.groupBy("lang").agg(
            F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
        )
        from ..functions.scale import local_df

        quarantined = local_df(
            spark,
            [("__quarantined__", n_bad, None)],
            "lang string, n_docs long, total_chars long",
        )
        out = good_agg.unionByName(quarantined).localCheckpoint(eager=True)
        feed.release()
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)
    return out
