"""From-scratch distributed cardinality sketch: HyperLogLog as pure
relational algebra.

At 100 TB, exact `count_distinct` of a high-cardinality column is a
full shuffle of every distinct value; the standard answer is a
mergeable register sketch. Spark ships `approx_count_distinct`, but
its HLL++ internals are opaque to an oracle — this module implements
classic HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007 — public
literature) as PLAIN COLUMN EXPRESSIONS, so (a) the register state is
an inspectable DataFrame, (b) registers merge across partitions /
corpora / days with a trivial groupBy-max — the property that makes
sketches useful — and (c) DuckDB can replay the identical arithmetic
for an exact cross-engine oracle.

Construction (string-domain bit tricks — identical in both engines):
  md5(value) hex → bucket = first 2 hex chars (m = 256 registers,
  string-keyed); rho = position of the first 1-bit in the remaining
  120 bits + 1, derived as 4 * (leading '0' hex chars) + clz4(first
  non-zero hex char) + 1 — regexp + CASE, no integer casts of hex
  needed anywhere.

Estimate: alpha_256 * m^2 / Z where Z = sum over registers of
2^-max_rho (absent registers contribute 2^0), with the standard
small-range linear-counting correction (E < 2.5 m and V empty
registers > 0 → m * ln(m / V)). 2^-rho terms are exact dyadic doubles;
ln() is the one transcendental, so estimates round to 4 dp (same
argument as `operators/lm.py`). Standard error ~ 1.04 / sqrt(256) =
6.5 %.

`hll_registers` is the mergeable state (persist it per shard/day;
`hll_merge` unions state frames); `hll_distinct` is the one-shot
group → estimate convenience.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..registry import query

M = 256  # registers (2 hex chars)
ALPHA = 0.7213 / (1.0 + 1.079 / M)  # alpha_m for m >= 128

# clz within one hex digit, +1 for the 1-bit position (8-f -> 1,
# 4-7 -> 2, 2-3 -> 3, 1 -> 4)
_CLZ4_SQL = (
    "CASE WHEN {c} IN ('8','9','a','b','c','d','e','f') THEN 1 "
    "WHEN {c} IN ('4','5','6','7') THEN 2 "
    "WHEN {c} IN ('2','3') THEN 3 ELSE 4 END"
)


def _rho_sql(tail: str) -> str:
    """1-based first-1-bit position over the hex-string tail — shared
    Spark SQL / DuckDB text (regexp + CASE only)."""
    lz = f"length(regexp_extract({tail}, '^0*', 0))"
    first_nz = f"substring(regexp_replace({tail}, '^0*', ''), 1, 1)"
    return f"(4 * {lz} + {_CLZ4_SQL.format(c=first_nz)})"


def hll_registers(
    df: DataFrame, value: "Column | str", group: list[str] | None = None
) -> DataFrame:
    """Mergeable HLL state: (group..., bucket, max_rho). One groupBy —
    map-side partial max, bounded at |groups| x 256 rows of output."""
    v = F.col(value) if isinstance(value, str) else value
    h = F.md5(v.cast("string"))
    tail = "substring(__h, 3, 30)"
    withh = df.withColumn("__h", h).withColumn(
        "bucket", F.substring("__h", 1, 2)
    ).withColumn("rho", F.expr(_rho_sql(tail)))
    keys = (group or []) + ["bucket"]
    return withh.groupBy(*keys).agg(F.max("rho").alias("max_rho"))


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union mergeability: max per (group, bucket) across shards."""
    out = register_frames[0]
    for r in register_frames[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "max_rho"]
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, group: list[str] | None = None) -> DataFrame:
    """(group..., est_distinct) from a register frame, 4 dp."""
    keys = group or []
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("z_present"),
        F.count("*").alias("n_present"),
    )
    z = F.col("z_present") + (F.lit(M) - F.col("n_present"))  # absent = 2^0
    raw = F.lit(ALPHA * M * M) / z
    v_empty = F.lit(M) - F.col("n_present")
    est = F.when(
        (raw < 2.5 * M) & (v_empty > 0), F.lit(float(M)) * F.log(F.lit(float(M)) / v_empty)
    ).otherwise(raw)
    return agg.select(*keys, F.round(est, 4).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, value: "Column | str", group: list[str] | None = None
) -> DataFrame:
    """One-shot grouped distinct-count estimate."""
    return hll_estimate(hll_registers(df, value, group), group)


def hll_distinct_sql(
    table: str, value_sql: str, group_cols: list[str] | None = None
) -> str:
    """DuckDB twin of hll_distinct — same hash, registers, estimator,
    and rounding."""
    keys = group_cols or []
    gsel = (", ".join(keys) + ", ") if keys else ""
    gby = ("GROUP BY " + ", ".join(keys)) if keys else ""
    gby_b = "GROUP BY " + ", ".join(keys + ["bucket"])
    rho = _rho_sql("substring(__h, 3, 30)")
    return f"""
WITH __hashed AS (
  SELECT {gsel}md5(CAST({value_sql} AS VARCHAR)) AS __h FROM {table}
),
__regs AS (
  SELECT {gsel}substring(__h, 1, 2) AS bucket, max({rho}) AS max_rho
  FROM __hashed {gby_b}
),
__agg AS (
  SELECT {gsel}sum(power(2.0, -max_rho)) AS z_present, count(*) AS n_present
  FROM __regs {gby}
)
SELECT {gsel}
  round(CASE WHEN ({ALPHA * M * M}) / (z_present + ({M} - n_present)) < {2.5 * M}
              AND ({M} - n_present) > 0
         THEN {M}.0 * ln({M}.0 / ({M} - n_present))
         ELSE ({ALPHA * M * M}) / (z_present + ({M} - n_present)) END, 4) AS est_distinct
FROM __agg
"""


# Prepared r8 registry candidate: per-source distinct-word estimates
# next to the exact count (the driver row shows the sketch AND its
# error in one frame).
def t_hll_words(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    est = hll_distinct(words, "w", ["source"])
    exact = words.groupBy("source").agg(
        F.count_distinct("w").alias("exact_distinct")
    )
    return est.join(exact, "source")


def t_hll_words_oracle() -> str:
    inner = hll_distinct_sql(
        "(SELECT source, u.w AS w FROM (SELECT source, string_split(text, ' ') AS ws "
        "FROM documents) d, unnest(ws) AS u(w))",
        "w",
        ["source"],
    )
    return f"""
WITH est AS ({inner}),
exact AS (
  SELECT source, CAST(count(DISTINCT u.w) AS BIGINT) AS exact_distinct
  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents) d,
       unnest(ws) AS u(w)
  GROUP BY source
)
SELECT est.source, est.est_distinct, exact.exact_distinct
FROM est JOIN exact ON exact.source = est.source
"""


# r8 driver row(s): prepared in r7, registered this round (prepared-plan
# discipline — registration only; candidate code and oracles unchanged).
query("t_hll_words", oracle=t_hll_words_oracle())(t_hll_words)
