"""Skew mitigation: salted joins (100 TB posture utility).

AQE's skew-join splitting handles most skew at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py); salting is
the explicit fallback for pathological keys — a hub concept with 10⁸
edges, an empty-string document hash. The left (large, skewed) side
gets a random-but-deterministic salt in [0, n); the right side is
replicated n×; the join key becomes (key, salt), splitting one hot
partition into n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the left side salted and the right side
    exploded across all salts. Deterministic: the salt is a hash of the
    whole left row's key + a uniform spreader on a monotonic id would
    not be reproducible, so we hash the key AND a stable row fingerprint
    is unnecessary — spreading only needs uniformity, so crc32(key)±row
    position noise is avoided by hashing the key with spark's
    `spark_partition_id`-free `rand`-free construction: each left row
    gets salt = pmod(hash(all left columns), n).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # Replicating the right side n× breaks outer/semi/anti semantics:
        # unmatched right rows would emit n_salts times, and semi/anti
        # would test against replicated rows. Only inner/left are sound.
        raise ValueError(f"salted_join supports how='inner'/'left', got {how!r}")
    salt_l = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("_salt", salt_l)
    rhs = right.withColumn("_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})")))
    out = lhs.join(rhs, [key, "_salt"], how)
    return out.drop("_salt")
