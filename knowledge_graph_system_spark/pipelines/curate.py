"""The full training-corpus curation pipeline as ONE composition.

Every stage is an already-oracle-graded operator from the library; this
module is the user-facing chain a reference user would actually run to
turn a raw document table into packed, epoch-ordered training data:

    raw documents
      → exact dedup            (keep first per content hash)
      → near-dup dedup         (MinHash-LSH → CC groups → apply)
      → span dedup rewrite     (Lee-et-al duplicated-span removal)
      → quality cut            (global quantile on a quality score)
      → decontamination        (drop docs sharing n-grams with eval)
      → temperature mix        (flatten group shares ∝ natural^α)
      → greedy pack            (BPE-token-budgeted sequences)
      → epoch order            (deterministic per-epoch shard+pos)
      → shard sink (optional)  (files + exact manifest, honoring the
                                epoch order's shard membership)

Determinism: every stage keys off content hashes, so two runs over the
same input produce byte-identical output (pinned by test). Scale: the
chain introduces no operator not already plan-audited — the stages'
shuffles are documented at their definitions; this module only wires
DataFrames together (no collects beyond the stages' own documented
bounded ones: BPE vocab head, temperature group counts, the GK
quantile aggregate).

Stage accounting is returned alongside the data: (stage, rows_in,
rows_out) per stage, computed with one count per stage boundary —
pipeline observability, the first thing an operator asks of a corpus
build ("where did my rows go?").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class CurationResult:
    packed: DataFrame            # doc-level: pack/bin/order columns
    report: list[tuple[str, int, int]]  # (stage, rows_in, rows_out)
    manifest: DataFrame | None = None  # per-shard accounting (shards_path set)


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    span_n: int = 8,
    keep_frac: float = 0.75,
    alpha: float = 0.5,
    n_merges: int = 24,
    seq_len: int = 2048,
    n_groups: int = 8,
    epoch: int = 1,
    n_shards: int = 8,
    shards_path: str | None = None,
    files_per_shard: int = 1,
) -> CurationResult:
    """Run the full curation chain over (doc_id, text, source, n_chars).

    `eval_docs` (same shape) drives decontamination; None skips that
    stage. Returns the packed, epoch-ordered corpus plus the per-stage
    row accounting.

    `shards_path` (r17, VERDICT r16 next #4): when given, the pipeline
    ends at the training-shard SINK — `write_training_shards` honoring
    epoch_order's OWN shard column (the trainer-facing membership, not
    a re-hash), with the read-back manifest in the result. A corpus
    build then emits shards + manifest out the back, which is what a
    dataloader actually consumes."""
    from ..operators.bpe import bpe_token_counts, learn_bpe
    from ..operators.components import connected_components, dedup_apply
    from ..operators.curation import (
        contamination_check,
        greedy_pack,
        span_dedup_apply,
    )
    from ..operators.dedup import JACCARD_THRESHOLD, minhash_verified_pairs
    from ..operators.sampling import (
        epoch_order,
        quantile_filter_global,
        temperature_mix,
    )

    report: list[tuple[str, int, int]] = []

    def stage(name: str, before: DataFrame, after: DataFrame) -> DataFrame:
        # localCheckpoint: each stage's output feeds both the count and
        # the next stage — without it the whole chain re-executes per
        # count and the lineage grows past analysis budgets
        out = after.localCheckpoint(eager=True)
        report.append((name, before.count(), out.count()))
        return out

    cur = docs.select("doc_id", "text", "source", "n_chars")

    # 1. exact dedup: keep the first doc per content hash
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    cur = stage(
        "exact_dedup",
        cur,
        cur.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
    )

    # 2. near-dup dedup: LSH pairs → CC groups → anti-join apply
    # (r17: array-form pair pipeline — one checkpoint, one corpus
    # exchange; see dedup.minhash_verified_pairs)
    pairs = minhash_verified_pairs(cur).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    groups = comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("group_id"),
        (F.col("node") == F.col("comp")).alias("keeper"),
    )
    cur = stage("near_dedup", cur, dedup_apply(cur, groups))

    # 3. span dedup rewrite: texts replaced by their cleaned form
    cleaned = span_dedup_apply(cur, n=span_n)
    cur = stage(
        "span_dedup",
        cur,
        cur.drop("text", "n_chars")
        .join(cleaned.select("doc_id", "clean_text"), "doc_id")
        .withColumnRenamed("clean_text", "text")
        .withColumn("n_chars", F.length("text").cast("bigint")),
    )

    # 4. quality cut: global quantile on doc length post-cleaning
    cur = stage(
        "quality_cut", cur, quantile_filter_global(cur, "n_chars", keep_frac)
    )

    # 5. decontamination: drop training docs sharing spans with eval
    if eval_docs is not None:
        hits = contamination_check(cur, eval_docs, n=span_n).select("doc_id")
        cur = stage("decontaminate", cur, cur.join(hits, "doc_id", "left_anti"))

    # 6. temperature mix: flatten source shares (mix_copy keeps replicas
    # distinct downstream; the pack key must include it)
    mixed = temperature_mix(cur, "source", "doc_id", alpha=alpha)
    mixed = mixed.withColumn(
        "pack_key", F.concat_ws("#", F.col("doc_id"), F.col("mix_copy"))
    )
    cur = stage("temperature_mix", cur, mixed)

    # 7. greedy pack under tokenizer-real BPE budgets
    merges = learn_bpe(cur, n_merges=n_merges)
    counts = bpe_token_counts(cur.select("pack_key", "text"),
                              merges, id_col="pack_key")
    budgeted = cur.join(
        counts.select(F.col("doc_id").alias("pack_key"), "n_bpe_tokens"),
        "pack_key",
    )
    packed = greedy_pack(
        budgeted,
        seq_len=seq_len,
        n_groups=n_groups,
        tokens_col=F.col("n_bpe_tokens"),
        id_col="pack_key",
    ).withColumnRenamed("doc_id", "pack_key")
    cur = stage(
        "bpe_pack",
        cur,
        cur.join(
            packed.select(
                "pack_key",
                "n_tokens",
                "pack_group",
                "bin_id",
                "bin_offset",
                "spans_boundary",
            ),
            "pack_key",
        ),
    )

    # 8. deterministic per-epoch order
    cur = stage(
        "epoch_order", cur, epoch_order(cur, "pack_key", epoch, n_shards)
    )

    # 9 (optional): the shard SINK — materialize epoch_order's shard
    # membership as files + manifest (write_training_shards honors the
    # existing column via shard_col, so the written layout IS the
    # trainer-facing order; n_tokens here is the BPE budget the pack
    # stage used, so the manifest sizes epochs in real tokens)
    manifest = None
    if shards_path is not None:
        from ..sources.shards import write_training_shards

        manifest = write_training_shards(
            cur,
            shards_path,
            n_shards=n_shards,
            key="pack_key",
            tokens_col="n_tokens",
            files_per_shard=files_per_shard,
            shard_col="shard",
        )
    return CurationResult(packed=cur, report=report, manifest=manifest)


# ---------------------------------------------------------------------------
# Prepared r12 registry candidate (prepared-plan discipline; r11 plan
# is set — this drains in r12, or fills r11's one slack slot): the
# curation PIPELINE as a driver-gradable row. curate_corpus itself
# cannot be hash-graded end-to-end because its packing stage budgets
# in learned-BPE tokens (not SQL-expressible — t_bpe_counts is
# rows-only by design); this graded variant swaps exactly that one
# budget for whitespace tokens (cur_pack_quota's already-graded form)
# and keeps every other stage the real library operator, so the
# driver grades the full chain exact-dedup → MinHash/LSH/CC near-dedup
# → Lee-et-al span rewrite → global quantile cut → decontamination →
# temperature mix → greedy pack → epoch order in ONE hash compare.
# The BPE budget keeps its own parity gate (tests/test_bpe.py).
# ---------------------------------------------------------------------------

_PIPE_EVAL_MOD = 53     # eval slice: documents with doc_id % 53 == 1
_PIPE_CLONE_MOD = 37    # planted exact clones (the d_exact_dedup pattern)


def pipe_curation_graded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8-stage curation chain over documents WITH planted exact
    clones, graded hash-exact against one composed SQL oracle.

    Planting (all in SQL on both sides, the d_exact_dedup discipline —
    the raw fixture has no byte-identical texts, so an unplanted
    stage 1 would grade empty==empty):
    - doc_id % 37 == 0 docs get a +1_000_000-id clone: the ORIGINAL
      wins the min-id keeper election (the clone's removal is
      invisible in the final rows but exercised in the group);
    - doc_id % 53 == 0 docs get a −2_000_000-offset (negative-id)
      clone: the CLONE wins, so stage 1 provably reshapes the final
      output (negative ids flow through every later stage's hashes).
    Eval set for decontamination = the UNTOUCHED documents slice
    doc_id % 53 == 1 (a benchmark that leaked into training — the
    realistic decontamination scenario).

    Stage boundaries are localCheckpoint-ed exactly where a stage's
    output feeds an action AND the downstream plan (the GK quantile
    probe, temperature_mix's bounded per-group collect) or two plan
    consumers — the same policy as curate_corpus' stage(). Every
    stage keeps its documented scale shape; the pipeline adds none."""
    from pyspark.sql.window import Window

    from ..operators.components import connected_components, dedup_apply
    from ..operators.curation import (
        contamination_check,
        greedy_pack,
        span_dedup_apply,
    )
    from ..operators.dedup import JACCARD_THRESHOLD, minhash_verified_pairs
    from ..operators.sampling import epoch_order, quantile_filter_global, temperature_mix
    from ..registry import Ctx

    docs = Ctx.get(spark, sf_dir).tables["documents"]
    base = docs.select("doc_id", "text", "source")
    corpus = base.unionByName(
        base.filter(F.col("doc_id") % _PIPE_CLONE_MOD == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
        )
    ).unionByName(
        base.filter(F.col("doc_id") % _PIPE_EVAL_MOD == 0).select(
            (F.col("doc_id") - 2_000_000).alias("doc_id"), "text", "source"
        )
    )

    # 1. exact dedup: keep the min-id doc per content hash
    w1 = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    s1 = (
        corpus.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)  # feeds shingles AND the apply side
    )

    # 2. near-dup: LSH candidates -> exact jaccard -> CC -> anti-join
    # (r17: array-form pair pipeline, see dedup.minhash_verified_pairs)
    pairs = minhash_verified_pairs(s1).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    groups = comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("group_id"),
        (F.col("node") == F.col("comp")).alias("keeper"),
    )
    s2 = dedup_apply(s1, groups).localCheckpoint(eager=True)

    # 3. span rewrite: every duplicated 8-gram survives only at its
    # canonical first occurrence; texts rebuilt, n_chars recomputed
    cleaned = span_dedup_apply(s2, n=8)
    s3 = (
        s2.drop("text")
        .join(cleaned.select("doc_id", "clean_text"), "doc_id")
        .withColumnRenamed("clean_text", "text")
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .localCheckpoint(eager=True)  # GK probe is an action over it
    )

    # 4. quality cut: keep the top 75% by post-rewrite length (exact GK)
    s4 = quantile_filter_global(s3, "n_chars", keep_frac=0.75, rel_err=0.0)

    # 5. decontamination against the untouched eval slice
    eval_docs = docs.select("doc_id", "text").filter(
        F.col("doc_id") % _PIPE_EVAL_MOD == 1
    )
    hits = contamination_check(s4, eval_docs, n=8).select("doc_id")
    s5 = (
        s4.join(hits, "doc_id", "left_anti")
        .localCheckpoint(eager=True)  # temperature_mix collects its group counts
    )

    # 6. temperature mix (alpha=0.5) + replica-distinct pack key
    s6 = temperature_mix(s5, "source", "doc_id", alpha=0.5).withColumn(
        "pack_key", F.concat_ws("#", F.col("doc_id"), F.col("mix_copy"))
    )

    # 7. greedy pack under whitespace-token budgets of the CLEANED text
    packed = greedy_pack(s6, seq_len=512, n_groups=4, id_col="pack_key")
    s7 = s6.join(packed.withColumnRenamed("doc_id", "pack_key"), "pack_key")

    # 8. deterministic epoch order over the pack keys
    s8 = epoch_order(s7, "pack_key", epoch=1, n_shards=4)
    return s8.select(
        "doc_id",
        "source",
        "mix_copy",
        "n_tokens",
        "pack_group",
        "bin_id",
        "bin_offset",
        "spans_boundary",
        "shard",
        "pos",
    )


def pipe_curation_oracle() -> str:
    """One composed DuckDB statement for the whole graded chain.

    Byte-shares every sharable piece with the stages' registered
    oracles: the MinHash shingle/signature/band CTEs (dedup.py module
    constants, re-pointed at the deduped corpus with one FROM
    replacement), the recursive-CC fixpoint shape (components.py), the
    span-rewrite CTE shapes (cur_span_dedup's oracle, 128-word bound —
    fixture max is 99 words/doc, asserted in tests), contamination_sql
    / greedy_pack_sql / epoch_order_sql verbatim via their table
    parameters, and smp_temperature_mix's in-SQL rate derivation
    (ordered list_sum == Python's sorted-group accumulation). Stage
    CTEs carry AS MATERIALIZED: DuckDB re-inlines a CTE per reference,
    and this chain references each stage 2-3 times — unhinted, the
    evaluation grows geometrically (measured ~3x per stage at 500
    docs); materialized it runs in under a second."""
    from ..operators.curation import contamination_sql, greedy_pack_sql
    from ..operators.dedup import (
        _BANDS_SQL,
        _SHINGLES_SQL,
        _SIGS_SQL,
        JACCARD_THRESHOLD,
        MAX_BUCKET,
    )
    from ..operators.sampling import _BUCKETS, bucket_sql, epoch_order_sql

    minhash = ",".join(
        [
            _SHINGLES_SQL.replace("FROM documents", "FROM s1").replace(
                "shingles AS (", "shingles AS MATERIALIZED ("
            ),
            _SIGS_SQL,
            _BANDS_SQL,
        ]
    )
    contam = contamination_sql(
        "s4", "evdocs", n=8
    )
    pack = greedy_pack_sql(
        "s6", seq_len=512, n_groups=4, id_col="pack_key"
    )
    b = bucket_sql("d.doc_id", "tmix")
    epoch = epoch_order_sql(
        "(SELECT s6.doc_id, s6.source, s6.mix_copy, s6.pack_key,"
        " pk.n_tokens, pk.pack_group, pk.bin_id, pk.bin_offset,"
        " pk.spans_boundary"
        " FROM s6 JOIN pk ON pk.doc_id = s6.pack_key) j",
        "pack_key",
        epoch=1,
        n_shards=4,
    )
    return f"""
WITH RECURSIVE
corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, source FROM documents
  WHERE doc_id % {_PIPE_CLONE_MOD} = 0
  UNION ALL
  SELECT doc_id - 2000000 AS doc_id, text, source FROM documents
  WHERE doc_id % {_PIPE_EVAL_MOD} = 0
),
s1 AS MATERIALIZED (
  SELECT doc_id, text, source FROM (
    SELECT *, row_number() OVER (
      PARTITION BY sha256(text) ORDER BY doc_id) AS __rn
    FROM corpus
  ) WHERE __rn = 1
),
{minhash},
ok_bands AS (
  SELECT band FROM bands GROUP BY band HAVING count(*) <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN ok_bands o ON o.band = a.band
  JOIN bands b ON b.band = a.band AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.doc_a
  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
),
prs AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.inter / CAST(na.n + nb.n - i.inter AS DOUBLE) >= {JACCARD_THRESHOLD}
),
und AS (SELECT doc_a AS a, doc_b AS b FROM prs
        UNION ALL SELECT doc_b, doc_a FROM prs),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT u.b, r.comp FROM reach r JOIN und u ON u.a = r.node
),
s2 AS MATERIALIZED (
  SELECT * FROM s1 WHERE doc_id NOT IN (
    SELECT node FROM reach GROUP BY node HAVING min(comp) <> node)
),
ws AS MATERIALIZED (SELECT doc_id, source, string_split(text, ' ') AS w FROM s2),
g AS (
  SELECT doc_id, i AS start, array_to_string(w[i+1 : i+8], ' ') AS gram
  FROM ws, generate_series(0, 128) AS tg(i)
  WHERE i <= len(w) - 8
),
occ AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) AS rn
  FROM g
),
cov AS (
  SELECT DISTINCT d.doc_id, d.start + u AS pos
  FROM (SELECT doc_id, start FROM occ WHERE rn >= 2) d,
       unnest(range(0, 8)) AS tc(u)
),
wp AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS word
  FROM ws, generate_series(1, 128) AS tw(i)
  WHERE i <= len(w)
),
kept AS (
  SELECT wp.doc_id, wp.pos, wp.word
  FROM wp LEFT JOIN cov ON cov.doc_id = wp.doc_id AND cov.pos = wp.pos
  WHERE cov.pos IS NULL
),
s3 AS MATERIALIZED (
  SELECT b.doc_id, b.source,
         coalesce(a.clean_text, '') AS text,
         CAST(len(coalesce(a.clean_text, '')) AS BIGINT) AS n_chars
  FROM s2 b LEFT JOIN (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text
    FROM kept GROUP BY doc_id
  ) a ON a.doc_id = b.doc_id
),
s4 AS MATERIALIZED (
  SELECT * FROM s3 WHERE CAST(n_chars AS DOUBLE) >= (
    SELECT quantile_disc(CAST(n_chars AS DOUBLE), 0.25) FROM s3)
),
evdocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_PIPE_EVAL_MOD} = 1
),
contam AS ({contam}),
s5 AS MATERIALIZED (
  SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM contam)
),
counts AS (
  SELECT source AS gr, CAST(count(*) AS BIGINT) AS n FROM s5 GROUP BY source
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
sg AS (
  SELECT gr, n, pow(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 0.5) AS s
  FROM counts, tot
),
zs AS (SELECT list_sum(list(s ORDER BY gr)) AS z FROM sg),
rates AS (
  SELECT gr, round((s / z) * CAST(total AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate
  FROM sg, zs, tot
),
rated AS (
  SELECT d.doc_id, d.source, d.text, d.n_chars,
         CAST(floor(r.rate) AS INT)
         + CAST(({b}) < CAST(round((r.rate - floor(r.rate)) * {_BUCKETS}) AS BIGINT) AS INT)
         AS __n
  FROM s5 d JOIN rates r ON r.gr = d.source
),
s6 AS MATERIALIZED (
  SELECT doc_id, source, text, n_chars, CAST(u AS INT) AS mix_copy,
         CAST(doc_id AS VARCHAR) || '#' || CAST(u AS VARCHAR) AS pack_key
  FROM rated, unnest(range(CAST(__n AS BIGINT))) AS tt(u)
  WHERE __n > 0
),
pk AS MATERIALIZED ({pack})
SELECT doc_id, source, mix_copy, n_tokens, pack_group, bin_id,
       bin_offset, spans_boundary, shard, pos
FROM ({epoch}) z
"""


# Registered r11 (the pre-computed plan's one slack slot — registry.py
# "r12 CANDIDATE ... or fills r11's one slack slot if the window
# holds"): the end-to-end curation pipeline as one driver-graded row.
from ..registry import query as _query  # noqa: E402  (module tail)

_query("pipe_curation_graded", oracle=pipe_curation_oracle())(
    pipe_curation_graded
)
