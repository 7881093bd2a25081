"""Generate an sf1-scale probe dataset by tiling the driver's sf0.1
tables 10x with key offsets (schemas and value distributions preserved).

The driver ships sf{0.001,0.01,0.1} only; SCALE_NOTES' measured-scaling
section needs one decade more. Keys are offset per replica so joins see
10x distinct keys (not 10x duplicates); document text in replicas 1-9
gets a PER-DOCUMENT deterministic word permutation (sort key
md5(word:rep:doc_id)) so each copy's shingle set diverges from every
other document's. A per-REP permutation is NOT enough: with a small
shared vocabulary it collapses all docs in a replica onto one global
word order, aligning shingles corpus-wide and exploding LSH candidate
pairs quadratically (measured: >100x slowdown). Replica 0 keeps the
original texts, so the source data's true near-dup pairs survive
unchanged; total shingle/minhash volume still scales 10x.

Events tile 10x users into the same wall-clock window (more concurrent
sessions — the realistic stream scale-up); embeddings tile 10x vectors
with a tiny per-replica direction perturbation (same labels, so IVF
cell populations grow 10x like clustered real data).

Usage: python tools/gen_sf1.py [out_dir]       (default /tmp/kg_sf1)
Writes every probe table as parquet (region/nation copied as-is).
Deterministic; ~180 MB; /root/testdata is never written.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10
OFFSETS = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
}


def main(out_dir: str = "/tmp/kg_sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({REPS})) AS r")

    for table, (key, off) in OFFSETS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r * {off} AS {c}" if c == key
            else (f"{c} + r * 15000 AS {c}" if c == "o_custkey" else c)
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet', reps) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT parquet)"
        )

    con.execute(
        f"""
COPY (
  SELECT l_orderkey + r * 150000 AS l_orderkey,
         l_partkey + r * 20000 AS l_partkey,
         l_suppkey + r * 1000 AS l_suppkey,
         * EXCLUDE (l_orderkey, l_partkey, l_suppkey, r)
  FROM '{SRC}/lineitem.parquet', reps
) TO '{out_dir}/lineitem.parquet' (FORMAT parquet)
"""
    )

    con.execute(
        f"""
COPY (
  SELECT doc_id + r * 5000 AS doc_id,
         CASE WHEN r = 0 THEN text ELSE array_to_string(
           list_transform(
             list_sort(list_transform(string_split(text, ' '),
                       w -> {{'k': md5(w || ':' || r || ':' || doc_id), 'w': w}})),
             s -> s.w), ' ') END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet', reps
) TO '{out_dir}/documents.parquet' (FORMAT parquet)
"""
    )
    # events: 10x users in the same wall-clock window (the realistic
    # stream scale-up — more concurrent sessions, not a longer tape);
    # event_id offset keeps ids unique, user_id offset keeps replica
    # sessions from merging
    con.execute(
        f"""
COPY (
  SELECT event_id + r * 100000 AS event_id, ts,
         user_id + r * 1500 AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet', reps
) TO '{out_dir}/events.parquet' (FORMAT parquet)
"""
    )
    # embeddings: 10x vectors; replicas keep their label (IVF cell
    # populations grow 10x — the clustered-data read) and get a tiny
    # per-replica, per-dimension direction perturbation so copies are
    # near- but not exact-duplicates (pure scaling would leave cosines
    # bit-identical and make top-k tie-degenerate)
    con.execute(
        f"""
COPY (
  SELECT vec_id + r * 2000 AS vec_id,
         CASE WHEN r = 0 THEN embedding ELSE
           list_transform(list_zip(embedding, range(1, len(embedding) + 1)),
                          t -> CAST(t[1] * (1.0 + 0.0001 * r * t[2]) AS FLOAT))
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', reps
) TO '{out_dir}/embeddings.parquet' (FORMAT parquet)
"""
    )
    # shared dims the probe queries don't scale: copy as-is
    # (nation/region keys are referenced unchanged by the tiled tables)
    import shutil

    for table in ("region", "nation"):
        shutil.copy(f"{SRC}/{table}.parquet", f"{out_dir}/{table}.parquet")
    print("wrote", out_dir)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
