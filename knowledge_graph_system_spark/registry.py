"""Query registry: the driver-facing inventory of implemented operators.

Every operator from SURVEY.md §2 that is "done" has a named entry here:
a Spark callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible)
a DuckDB oracle string over the same parquet tables. `__spark_entry__.py`
re-exports this registry to the driver.

Determinism rules every registered query follows:
- float outputs rounded (6 dp scores, 2 dp money sums) on BOTH sides;
- threshold filters compare the rounded value;
- any LIMIT is preceded by a total order (tie-break on a unique key);
- aggregate/computed columns aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .sources.graph_view import edges_df, nodes_df, nodes_with_embeddings, vocabulary_df
from .sources.tables import load_tables


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


class Ctx:
    """Per-(session, sf_dir) context: lazily built base tables + graph views."""

    _cache: dict[tuple[int, str], "Ctx"] = {}

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = load_tables(spark, sf_dir)

    @classmethod
    def get(cls, spark: SparkSession, sf_dir: str) -> "Ctx":
        key = (id(spark), sf_dir)
        if key not in cls._cache:
            cls._cache[key] = cls(spark, sf_dir)
        return cls._cache[key]

    # The cached edge/node DataFrames are this engine's analog of the
    # reference's Rust in-memory graph accelerator (`graph-accel/core/src/
    # graph.rs:77-260`): load once, traverse many times. On a cluster the
    # cache is per-executor columnar blocks; embeddings would normally be
    # precomputed in storage rather than derived per query.

    def _nparts(self) -> int:
        return self.spark.sparkContext.defaultParallelism

    @property
    def nodes(self) -> DataFrame:
        if not hasattr(self, "_nodes"):
            # repartition by key before caching: the single-file parquet
            # scan yields few splits, which would serialize every
            # downstream op on the cached data; hash-partitioning by
            # node_id is also the layout the iterative BFS joins want
            self._nodes = nodes_df(self.tables).repartition(self._nparts(), "node_id").cache()
        return self._nodes

    @property
    def edges(self) -> DataFrame:
        if not hasattr(self, "_edges"):
            self._edges = edges_df(self.tables).repartition(self._nparts(), "src").cache()
        return self._edges

    @property
    def nodes_emb(self) -> DataFrame:
        if not hasattr(self, "_nodes_emb"):
            self._nodes_emb = (
                nodes_with_embeddings(self.tables)
                .repartition(self._nparts(), "node_id")
                .cache()
            )
        return self._nodes_emb

    @property
    def vocab(self) -> DataFrame:
        if not hasattr(self, "_vocab"):
            self._vocab = vocabulary_df(self.spark)
        return self._vocab


# Driver-facing enumeration order. The driver records exactly the first
# 50 registered queries — a prefix cutoff — against an 81-query
# inventory (consolidated r7), so driver evidence alternates with ~19
# free slots per round.
#
# STANDING ALTERNATION RULE (VERDICT r4 #1 — keep this every round):
#   1. queries NEW this round first,
#   2. then queries whose code or oracle CHANGED this round,
#   3. then EVERY query whose last driver row is two rounds old
#      (the previous round's non-window tail),
#   4. bench headliners fill any remaining slots.
# Invariant after each round: no registered query's most recent driver
# row is older than ONE round. The tail (everything past slot 50) must
# be exactly the set recorded last round (minus any query that was
# consolidated away — see the r7 consolidation note below).
#
# r7 WINDOW (50 = 15 new + 7 changed + 27 rotating r6-tail + 1 bench
# headliner). The r6-prepared 3-slot plan executes first; the
# consolidation suites (operators/suites.py) fold 31 always-green
# member rows into 7 composites, which frees the slots that register
# the r6 lib backlog THIS round and leaves ~19 free slots/round from
# r8 on (registry total 81 vs the old 97/100).
#
# r6-tail members consolidated away (recorded via their suite):
#   a7/a8/a9/a10/a11 -> a_scores_suite; j2/j3/j4/j8/j9 ->
#   j_enrich_suite; v2/v3/v5/v6/v6b/v8 -> v_search_suite;
#   t_langid/t_quality/t_tokens/t_fingerprint -> t_textstats_suite.
# r6-window members consolidated away (fresh r6 evidence, leave the
# registry): p1/p3/p4/p5/p6/p8 -> p_filter_matrix; st_tumbling/
#   st_sliding/st_rollup -> st_windows_suite; f1/f2 -> f_catalog_suite.
#
# r8 REGISTRATION PLAN (capacity 100 - 81 = 19 slots; candidates are
# ALREADY BUILT and driver-style validated at sf0.01 — the driver's own
# scale factor (all 9 green, 8 hash-exact + 1 rows-only by design) —
# so registration is decorators + window slots only, exactly like the
# r6->r7 prepared plan):
#   1. p7_cypher_shortest — shortestPath() driver row with the
#      level-union min-dist DuckDB oracle (plans/cypher.py tail,
#      tests/test_cypher.py::test_r8_candidate_shortest_driver_row).
#   2. t_lm_quality — bigram-LM corpus quality profile, exact SQL twin
#      (operators/lm.py, tests/test_lm.py::test_r8_candidate_lm_quality).
#   3. t_bpe_counts — tokenizer-real token totals (operators/bpe.py);
#      rows-only driver row (no SQL twin for the canonical merge fold),
#      value parity pinned by the pure-Python reference gate in
#      tests/test_bpe.py.
#   4. g_pagerank — 5-sweep damped PageRank top-15, chained-CTE DuckDB
#      twin with per-sweep 10 dp rounding (operators/graphalgo.py,
#      tests/test_graphalgo.py).
#   5. g_communities — 4-sweep synchronous label propagation, exact
#      integer/string oracle parity (same module).
#   6. t_hll_words — from-scratch HyperLogLog distinct-word estimates
#      beside the exact counts, exact SQL twin
#      (operators/sketches.py, tests/test_sketches.py).
#   7. m_audio_frames — frame-level audio featurizer (windowed RMS +
#      mean-crossing), exact list-twin oracle
#      (operators/multimodal.py, tests/test_dedup_multimodal.py).
#   8. t_cms_words — count-min frequency estimates for the top-20
#      words beside exact counts — all-integer exact SQL twin
#      (operators/cms.py, tests/test_cms.py).
#   9. g_weighted_sssp — k-sweep Bellman-Ford over confidence costs,
#      SQL-derived source set so the chained-CTE oracle stays static
#      (operators/graphalgo.py, tests/test_graphalgo.py).
# Remaining headroom absorbs any round's changed queries without
# consolidation pressure; leave unused slots to rule-4 headliners.
_RECORD_FIRST = [
    # ---- new (r7): the three r6-prepared composites
    "cur_repetition_spans",
    "cur_pii_redact",
    "smp_split_mix",
    # ---- new (r7): the seven consolidation suites
    "a_scores_suite",
    "j_enrich_suite",
    "v_search_suite",
    "t_textstats_suite",
    "p_filter_matrix",
    "st_windows_suite",
    "f_catalog_suite",
    # ---- new (r7): the r6 lib backlog's driver rows
    "r_bm25_topk",
    "ann_ivf_persisted",
    "cur_pack_quota",
    "cur_contamination",
    "src_jsonl_quarantine",
    # ---- changed (r7): lsh_candidates' bucket cap moved ahead of the
    # member-list aggregation (window count; bounded state restored) —
    # these three consume it
    "d_minhash_lsh",
    "d_dup_groups",
    "t_corpus_filter",
    # ---- changed (r7, conservatively): the Cypher front end gained
    # list comprehensions / reduce() / shortestPath() and fail-closed
    # chain guards this round; these four compile through the touched
    # modules (results and plans unchanged — additive grammar — but
    # shared-module edits count as "changed" under the rule)
    "p7_cypher_varlen",
    "p7_cypher_trail",
    "p7_cypher_optional",
    "p7_cypher_with",
    # ---- last driver row is r5: the r6 non-window tail, minus the 20
    # members consolidated into the suites above, same order
    "a4_grounding",
    "o1_ontology_edges",
    "ep_status_measurement",
    "d_embedding_neardup",
    "j5_cross_ontology_affinity",
    "x2_skew_naive_join",
    "x2_skew_salted_join",
    "g1_bfs_both_depth2_conf",
    "g2_shortest_path",
    "g3_k_shortest_paths",
    "g4_subgraph",
    "a1_degree_top20",
    "lc_related",
    "lc_connect_by_search",
    "m_jpeg_decode",
    "m_audio_decode",
    "f5_projection",
    "f7_centroids",
    "so_program_demo",
    "so_dispatch_matrix",
    "md_blocks",
    "so_block_compiler",
    "p7_guarded_query",
    "p7_cypher_subset",
    "p7_cypher_union",
    "p7_cypher_unwind",
    "st_ingest_e2e",
    # ---- bench headliner fills the remaining slot (r6-window, so its
    # evidence stays fresh either way; the other four former filler
    # slots went to the cypher "changed" rows above)
    "q1_pricing_summary",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @query registrations run."""
    from .operators import (  # noqa: F401
        aggregates,
        ann,
        annealing,
        asof,
        catalog,
        components,
        curation,
        dedup,
        filters,
        joins,
        lifecycle,
        multimodal,
        projection,
        pruning,
        ranking,
        scores,
        setops,
        textstats,
        traversal,
        vector,
    )
    from .functions import markdown  # noqa: F401
    from .plans import blocks, cypher, guard, saved  # noqa: F401
    from .sources import export, jsonl  # noqa: F401
    from .streaming import epochs, ingest_stream, windows  # noqa: F401

    # LAST: the consolidation suites capture member fns/oracles from
    # QUERIES and then de-register the folded members, so every member
    # module above must already have run its @query registrations
    from .operators import suites  # noqa: F401

    ordered = {n: QUERIES[n] for n in _RECORD_FIRST if n in QUERIES}
    ordered.update({n: s for n, s in QUERIES.items() if n not in ordered})
    return ordered
