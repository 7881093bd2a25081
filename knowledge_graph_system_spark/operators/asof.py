"""As-of join — the classic time-series operator Spark lacks natively.

Named in the engine mandate alongside range joins: every event matched
to the most recent right-side row at-or-before its timestamp, per key.

Scale-first formulation: NOT a join at all. A naive
`events ⋈ orders ON key AND r.ts <= l.ts` explodes to |events|×|prior
orders| before the per-event max. Instead: tag both sides, UNION, and
carry the latest right-row payload forward with `last(..., ignorenulls)`
over a (key, ts)-ordered window — one shuffle + one sort, O(n log n),
the standard distributed as-of plan. Right rows sort BEFORE queries at
equal timestamps (inclusive <= semantics); ties among right rows at the
same timestamp resolve deterministically by the tiebreak column (last
= max wins).

Oracle: DuckDB's native ASOF JOIN — an independent engine's
implementation of the same semantics (date-only output, since ASOF's
choice among tied right rows is unspecified there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scale import maybe_broadcast
from ..registry import Ctx, query

# Replicated (band × spanned-bucket) rows above this stop being
# broadcast-hinted; the bucket equi-join then shuffles, which is the
# correct plan for a large band table.
BAND_BROADCAST_MAX = 2_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_key: tuple[str, str],
    on_time: tuple[str, str],
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join: each left row + the payload of the latest right
    row with right.time <= left.time for the same key (NULLs when no
    prior right row exists)."""
    lk, rk = on_key
    lt, rt = on_time
    rtypes = dict(right.dtypes)
    # ONE struct per right row, carried atomically: carrying columns
    # independently would back-fill a NULL field from an OLDER row (torn
    # rows). last(struct, ignorenulls) skips only all-NULL (left) markers,
    # so every payload field comes from the same matched row and genuine
    # NULL fields stay NULL.
    payload_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in payload) + ">"
    lhs = left.select(
        F.col(lk).alias("_k"),
        F.col(lt).alias("_ts"),
        F.lit(1).alias("_is_q"),
        F.lit(None).cast(rtypes[tiebreak]).alias("_tb"),
        F.lit(None).cast(payload_t).alias("_p"),
        F.struct(*left.columns).alias("_row"),
    )
    rhs = right.select(
        F.col(rk).alias("_k"),
        F.col(rt).alias("_ts"),
        F.lit(0).alias("_is_q"),
        F.col(tiebreak).alias("_tb"),  # native type: numeric keys order numerically
        F.struct(*[F.col(c) for c in payload]).alias("_p"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_q", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rhs.unionByName(lhs).select(
        "_is_q",
        "_row",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return carried.filter(F.col("_is_q") == 1).select(
        "_row.*", *[F.col(f"_p.{c}").alias(c) for c in payload]
    )


@query(
    "x1_asof_join",
    oracle="""
SELECT e.event_id, e.user_id,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_order_at
FROM events e
ASOF LEFT JOIN orders o
  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
""",
)
def x1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event joined to the user's most recent at-or-before order.
    Output is the matched ORDER DATE only: the testdata contains tied
    (custkey, orderdate) pairs, and DuckDB's ASOF leaves the choice
    among ties unspecified — the date itself is unambiguous. The library
    function returns full payloads with a deterministic tiebreak
    (tests/test_asof.py)."""
    ctx = Ctx.get(spark, sf_dir)
    ev = ctx.tables["events"].select("event_id", "user_id", "ts")
    joined = asof_join(
        ev,
        ctx.tables["orders"],
        on_key=("user_id", "o_custkey"),
        on_time=("ts", "o_orderdate"),
        payload=["o_orderdate"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_order_at"),
    )


# ---------------------------------------------------------------------------
# Range join (the other named custom operator): value-in-interval matching
# with the bucket-replication trick so Catalyst gets an EQUI join.
# ---------------------------------------------------------------------------

_BANDS = [  # (band, lo, hi) — deterministic value bands over events.value
    ("tiny", 0.0, 25.0),
    ("small", 25.0, 75.0),
    ("medium", 75.0, 150.0),
    ("large", 150.0, 400.0),
    # closed upper bound: an open-ended 1e9 band would replicate across
    # 40M buckets (sequence explosion) — cap at the domain max (~490)
    ("huge", 400.0, 1000.0),
]
_BUCKET_W = 25.0


def range_join(
    left: DataFrame,
    val_col: str,
    bands: DataFrame,
    bucket_width: float = _BUCKET_W,
) -> DataFrame:
    """Join rows to the interval [lo, hi) containing `val_col`.

    A naive theta-join plans as BroadcastNestedLoop (O(n·m) compares).
    Bucketizing makes it an equi-join: each row hashes to
    floor(value/W); each band replicates across the buckets it spans;
    join on bucket + residual range filter. Compares per row ≈ bands
    overlapping its bucket, not all bands — the standard range-join
    optimization, and it stays a hash join at 100 TB.
    """
    lhs = left.withColumn("_bucket", F.floor(F.col(val_col) / bucket_width))
    rhs = bands.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(cast(floor(lo / {bucket_width}) as long),"
                f" cast(floor((hi - 1e-9) / {bucket_width}) as long))"
            )
        ),
    )
    # `bands` is caller-provided: dimension-sized in the graded query
    # (5 literal bands) but unbounded in the general contract, and the
    # bucket replication multiplies it — so the hint is counted, not
    # forced (the shared guard class; see functions/scale.py). The
    # checkpoint makes the count and the join share one materialization
    # of the replicated band table.
    rhs = rhs.localCheckpoint(eager=True)
    rhs = maybe_broadcast(rhs, BAND_BROADCAST_MAX)
    return (
        lhs.join(rhs, "_bucket")
        .filter((F.col(val_col) >= F.col("lo")) & (F.col(val_col) < F.col("hi")))
        .drop("_bucket")
    )


@query(
    "x2_range_join",
    oracle=f"""
WITH bands(band, lo, hi) AS (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)})
SELECT b.band, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
""",
)
def x2_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events matched to value bands via the bucketized range join,
    aggregated per band. Oracle uses the plain inequality join — same
    semantics, independently planned."""
    from ..functions.scale import local_df

    ctx = Ctx.get(spark, sf_dir)
    bands = local_df(spark, _BANDS, "band string, lo double, hi double")
    return (
        range_join(ctx.tables["events"], "value", bands)
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
