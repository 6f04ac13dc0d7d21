"""Similarity search over an embedding column (array<float>).

Two paths (task brief):
- brute-force cosine top-k — the correctness baseline: a blocked
  cross-join with native dot-product math (F.zip_with/F.aggregate) and a
  window top-k. Exact, O(n·m); fine when one side is small/broadcast.
- LSH-bucketed ANN — the scale path: sign-random-projection buckets
  (SimHash over the embedding), candidates only within a bucket (plus
  multi-probe via several hyperplane tables), then exact cosine re-rank.
  Sub-linear candidate sets at 100 TB; recall tunable via tables/bits.

No UDFs anywhere — dot products, norms, and projections are all native
column expressions (whole-stage codegen).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (F.greatest(_norm(a) * _norm(b), F.lit(1e-12)))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query. The query side is
    broadcast (it is the small side by construction — a query batch);
    the corpus side streams, so the plan is a single broadcast
    nested-loop with codegen'd arithmetic and a top-k window."""
    joined = vectors.crossJoin(F.broadcast(queries)).withColumn(
        "cos_sim", cosine(F.col(vec_col), F.col(q_vec_col))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "cos_sim", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype("float64").tolist()


def srp_bucket(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id: one bit per hyperplane —
    native column math (dot + sign), no UDF."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col, F.array(*[F.lit(x) for x in p]), lambda v, w: v * w
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ANN: candidates share an SRP bucket in at least one of ``tables``
    hyperplane tables; exact cosine re-rank on the candidate set.

    Plan shape: corpus is bucketed once per table (explode ×tables),
    shuffled on (table, bucket) — the same co-location join as the
    ER blocking stage. Recall rises with ``tables``; candidate volume
    falls with ``bits``."""
    all_planes = [_hyperplanes(dim, bits, seed + t) for t in range(tables)]
    v_bucketed = vectors.select(
        id_col,
        vec_col,
        F.posexplode(
            F.array(*[srp_bucket(F.col(vec_col), p) for p in all_planes])
        ).alias("table_id", "bucket"),
    )
    q_bucketed = queries.select(
        q_id_col,
        q_vec_col,
        F.posexplode(
            F.array(*[srp_bucket(F.col(q_vec_col), p) for p in all_planes])
        ).alias("table_id", "bucket"),
    )
    cands = v_bucketed.join(
        F.broadcast(q_bucketed), ["table_id", "bucket"]
    ).select(id_col, vec_col, q_id_col, q_vec_col).distinct()
    scored = cands.withColumn("cos_sim", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "cos_sim", "rnk")
    )
