"""Saved queries + artifacts (SURVEY §2: ADR-083 persistence surface).

Reference shape: `kg_api.query_definitions` stores named, typed query
recipes that can be re-executed, and `kg_api.artifacts` stores computed
results stamped with the graph epoch for freshness validation
(`/root/reference/schema/00_baseline.sql:2723,1722`). The engine
executed programs/cypher but had no store/recall surface; this module
adds it Spark-first:

- `QueryStore`: named definitions, validated AT SAVE TIME (fail closed —
  a definition that would be rejected at execute time is rejected at
  save time, same contract as the reference's validator-backed POST).
  Serializes to/from JSON for cross-process persistence; validation
  re-runs on load, so a tampered file cannot smuggle an unvalidated
  definition in.
- `ArtifactStore`: execute-by-name materialized as an epoch-stamped
  `DerivedTable` (`streaming/epochs.py`) — the artifact carries
  `graph_epoch` like the reference's `artifacts.graph_epoch` column and
  recomputes only when the committed watermark moves past its stamp.

Definition types supported = the subset of the reference's CHECK
constraint this engine executes: cypher (guarded front end), program
(GraphProgram DSL), search (a single SO9 dispatch source).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query
from ..sources.graph_view import graph_ctes
from ..streaming.epochs import EPOCH_BUCKET, DerivedTable, committed_epoch


class SavedQueryError(ValueError):
    pass


VALID_TYPES = ("cypher", "program", "search")


@dataclass
class QueryDefinition:
    """One row of the query_definitions surface."""

    name: str
    definition_type: str
    definition: dict
    metadata: dict = field(default_factory=dict)


def _validate(definition_type: str, definition: dict) -> None:
    """The save-time gate: reuse the exact execute-time validators."""
    if definition_type == "cypher":
        from .cypher import check_cypher_safety

        if not isinstance(definition.get("cypher"), str):
            raise SavedQueryError("cypher definition needs a 'cypher' string")
        check_cypher_safety(definition["cypher"])
    elif definition_type == "program":
        from .program import validate_program

        if not isinstance(definition.get("statements"), list):
            raise SavedQueryError("program definition needs 'statements'")
        validate_program(definition["statements"])
    elif definition_type == "search":
        if not isinstance(definition.get("source"), dict) or "kind" not in definition["source"]:
            raise SavedQueryError("search definition needs a 'source' dict with 'kind'")
    else:
        raise SavedQueryError(
            f"unknown definition_type {definition_type!r} (valid: {VALID_TYPES})"
        )


class QueryStore:
    """Named, validated query definitions with JSON persistence."""

    def __init__(self) -> None:
        self._defs: dict[str, QueryDefinition] = {}

    def save(
        self,
        name: str,
        definition_type: str,
        definition: dict,
        metadata: dict | None = None,
        replace: bool = False,
    ) -> QueryDefinition:
        if not replace and name in self._defs:
            raise SavedQueryError(f"definition {name!r} already exists (pass replace=True)")
        _validate(definition_type, definition)
        d = QueryDefinition(name, definition_type, definition, metadata or {})
        self._defs[name] = d
        return d

    def get(self, name: str) -> QueryDefinition:
        if name not in self._defs:
            raise SavedQueryError(f"no saved definition {name!r}")
        return self._defs[name]

    def names(self) -> list[str]:
        return sorted(self._defs)

    def execute(self, name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Recall + re-execute by name through the engine's own paths."""
        d = self.get(name)
        ctx = Ctx.get(spark, sf_dir)
        if d.definition_type == "cypher":
            from .cypher import compile_cypher

            return compile_cypher(ctx, d.definition["cypher"])
        if d.definition_type == "program":
            from ..operators.setops import empty_working, make_dispatch
            from .program import execute_program

            res = execute_program(
                d.definition["statements"],
                make_dispatch(ctx),
                empty_working(ctx),
                collect_counts=False,
            )
            if res.aborted:
                raise SavedQueryError(f"saved program {name!r} aborted: {res.abort_reason}")
            return res.working.nodes
        # search: one SO9 dispatch source
        from ..operators.setops import make_dispatch

        return make_dispatch(ctx)(d.definition["source"]).nodes

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "name": d.name,
                    "definition_type": d.definition_type,
                    "definition": d.definition,
                    "metadata": d.metadata,
                }
                for d in self._defs.values()
            ],
            sort_keys=True,
        )

    @classmethod
    def from_json(cls, text: str) -> "QueryStore":
        store = cls()
        for row in json.loads(text):
            store.save(
                row["name"], row["definition_type"], row["definition"],
                metadata=row.get("metadata"),
            )
        return store


@dataclass
class Artifact:
    """One row of the artifacts surface: a named, epoch-stamped result."""

    name: str
    query_name: str
    artifact_type: str
    representation: str
    derived: DerivedTable

    @property
    def graph_epoch(self) -> int:
        return self.derived.stamp


class ArtifactStore:
    """Materialized execute-by-name results with freshness stamps."""

    def __init__(self, qstore: QueryStore) -> None:
        self.qstore = qstore
        self._arts: dict[str, Artifact] = {}

    def materialize(
        self,
        name: str,
        query_name: str,
        spark: SparkSession,
        sf_dir: str,
        artifact_type: str = "query_result",
        representation: str = "api_direct",
    ) -> Artifact:
        committed = committed_epoch(Ctx.get(spark, sf_dir).tables["events"])
        art = self._arts.get(name)
        if art is None:
            art = Artifact(
                name,
                query_name,
                artifact_type,
                representation,
                DerivedTable(
                    build=lambda _epoch: self.qstore.execute(query_name, spark, sf_dir)
                ),
            )
            self._arts[name] = art
        art.derived.refresh_if_stale(committed)
        return art

    def fresh(self, name: str, spark: SparkSession, sf_dir: str) -> bool:
        art = self._arts[name]
        committed = committed_epoch(Ctx.get(spark, sf_dir).tables["events"])
        return art.graph_epoch >= committed

    def result(self, name: str) -> DataFrame:
        df = self._arts[name].derived.df
        assert df is not None, "artifact was never materialized"
        return df


# ---------------------------------------------------------------------------
# registered query: store → recall → execute → epoch-stamped artifact
# ---------------------------------------------------------------------------

_SAVED_CYPHER = """
MATCH (s:Supplier)<-[:SUPPLIED_BY]-(p:Part)
WHERE p.weight > 915
RETURN s.node_id AS sid, count(*) AS parts
"""


@query(
    "sq_saved_query",
    oracle=graph_ctes()
    + f""",
epochw AS (SELECT greatest(-1, max(event_id) // {EPOCH_BUCKET} - 1) AS e FROM events)
SELECT 'supplier_heavy_parts' AS query_name,
       'query_result' AS artifact_type,
       CAST((SELECT e FROM epochw) AS BIGINT) AS graph_epoch,
       s.node_id AS sid, CAST(count(*) AS BIGINT) AS parts
FROM nodes s
JOIN edges e ON e.dst = s.node_id AND e.rel_type = 'SUPPLIED_BY'
JOIN nodes p ON p.node_id = e.src AND p.label = 'Part' AND p.weight > 915
WHERE s.label = 'Supplier'
GROUP BY s.node_id
""",
)
def sq_saved_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ADR-083 loop through the driver gate: save a validated
    cypher definition by name, recall + re-execute it via the store, and
    materialize the result as an artifact stamped with the committed
    graph epoch. The oracle replays the recalled query relationally and
    derives the same watermark from the events table."""
    store = QueryStore()
    store.save(
        "supplier_heavy_parts",
        "cypher",
        {"cypher": _SAVED_CYPHER},
        metadata={"description": "suppliers ranked by heavy-part volume"},
    )
    arts = ArtifactStore(store)
    art = arts.materialize("supplier_heavy_parts:latest", "supplier_heavy_parts", spark, sf_dir)
    return arts.result("supplier_heavy_parts:latest").select(
        F.lit(art.query_name).alias("query_name"),
        F.lit(art.artifact_type).alias("artifact_type"),
        F.lit(art.graph_epoch).cast("long").alias("graph_epoch"),
        "sid",
        "parts",
    )
