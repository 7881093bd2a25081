"""Multimodal-column plumbing (training-data pipeline ops).

Pattern for 100 TB image/audio/video pipelines: media lives in opaque
`binary` columns with typed metadata beside it; decode / feature
extraction runs as Arrow-batched Pandas UDFs via `mapInPandas` so the
Python cost is per-batch, not per-row, and the schema contract is
explicit. The reference's image ingestion has the same shape — bytes →
visual embedding + vision-LLM prose (`/root/reference/api/app/workers/
ingestion_worker.py:209-330`), which we stub deterministically (the
real decoder libs aren't in this container; see `decode_stub`).

`m_decode_features` is oracle-checked: the deterministic fake features
(byte length + ascii checksum) are recomputable in pure SQL, so the
whole mapInPandas path — binary encode, Arrow transfer, batch iteration,
schema — is verified end-to-end, not just smoke-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import Ctx, query

FEATURE_SCHEMA = "doc_id long, n_bytes int, checksum int, feature array<double>"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque media column (here: utf-8 bytes of the text —
    in production this is the image/audio blob read via binaryFile)."""
    return docs.withColumn("payload", F.encode("text", "utf-8"))


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image/audio decoder.

    Real pipelines put PIL/librosa/ffmpeg here; those libs aren't in
    this container, so the "decode" derives reproducible features from
    the raw bytes: length, mod-65521 checksum (adler-style), and a tiny
    4-dim feature vector from byte-position sums. Raises cleanly if a
    payload is not bytes — the schema contract is enforced, not assumed.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes, checksums, feats = [], [], []
        for raw in payloads:
            if not isinstance(raw, (bytes, bytearray)):
                raise NotImplementedError(
                    "decode_stub expects binary payloads; real decoders plug in here"
                )
            b = bytes(raw)
            n_bytes.append(len(b))
            checksums.append(sum(b) % 65521)
            feats.append(
                [
                    float(sum(b[0::4]) % 997),
                    float(sum(b[1::4]) % 997),
                    float(sum(b[2::4]) % 997),
                    float(sum(b[3::4]) % 997),
                ]
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pd.array(n_bytes, dtype="int32"),
                "checksum": pd.array(checksums, dtype="int32"),
                "feature": feats,
            }
        )


def decode_features(docs: DataFrame) -> DataFrame:
    """binary payload → per-doc features via Arrow-batched mapInPandas."""
    return with_binary_payload(docs).select("doc_id", "payload").mapInPandas(
        decode_stub, schema=FEATURE_SCHEMA
    )


@query(
    "m_decode_features",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) % 65521 AS INT) AS checksum
FROM documents
""",
)
def m_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path, checked against a SQL recomputation
    of the deterministic fake (ascii text ⇒ bytes == char codes). The
    4-dim feature vector is exercised in tests; dropped here so the
    oracle stays pure SQL."""
    ctx = Ctx.get(spark, sf_dir)
    return decode_features(ctx.tables["documents"]).select(
        "doc_id", "n_bytes", "checksum"
    )
