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
    native column math, no UDF.

    Single-pass fold: ALL ``bits`` projections accumulate in one
    ``aggregate`` traversal of the vector (accumulator = array of
    partial dot products), instead of ``bits`` separate aggregates each
    re-traversing the vector — the same no-CSE-across-higher-order-
    functions trap minhash_signatures documents. The plane matrix is a
    nested literal array, constant-folded by Catalyst to one
    ArrayData."""
    bits = len(planes)
    # 2^i is exact in a double for any i here, but the long cast of
    # 2^63 overflows (and 2^62+2^61+… sums can too once accumulated) —
    # bound bits so every partial sum stays inside int64
    if bits > 62:
        raise ValueError(f"srp_bucket supports at most 62 bits, got {bits}")
    planes_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    )
    indexed = F.zip_with(
        vec_col,
        F.sequence(F.lit(0), F.size(vec_col) - 1),
        lambda v, j: F.struct(v.alias("v"), j.alias("j")),
    )
    projs = F.aggregate(
        indexed,
        F.array_repeat(F.lit(0.0), bits),
        lambda acc, s: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda a, i: a + s["v"] * F.get(F.get(planes_arr, i), s["j"]),
        ),
    )
    # sign bits → bucket id, again one traversal (powers of two are
    # exact in a double well past 53; bits <= 62 keeps the long cast
    # and the accumulated sum inside int64)
    return F.aggregate(
        F.zip_with(
            projs,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda pr, i: F.when(
                pr > 0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


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
    from .dedup import _rebalance

    # tiny-file guard (see dedup._rebalance): the per-vector projection
    # math inherits the scan's partitioning and serializes on one core
    # for single-row-group inputs; no-op on real multi-split corpora
    vectors = _rebalance(vectors, id_col)
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the task brief's alternative scale path
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    vectors: DataFrame,
    k: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Coarse quantizer for IVF: k-means on a DETERMINISTIC sample.

    Training runs driver-side on a bounded sample (k-means++ init,
    fixed seed, numpy Lloyd iterations) — the classic IVF recipe:
    centroid fitting needs only a representative sample, never the
    corpus; the corpus-sized work (assignment) stays distributed.
    Returns a (k, dim) list-of-lists, broadcast as a plan literal."""
    rows = (
        vectors.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("string")))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("ivf_train_centroids: empty vectors DataFrame")
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # k-means++ init; stop early when the sample has fewer distinct
    # points than k (duplicate-heavy corpora) — residual distances all
    # zero means every point is already covered
    cents = [x[rng.randint(len(x))]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((x - c) ** 2, axis=1) for c in cents], axis=0
        )
        total = d2.sum()
        if total <= 1e-12:
            break
        cents.append(x[rng.choice(len(x), p=d2 / total)])
    c = np.asarray(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)  # unit vectors: cosine argmax
        for j in range(len(c)):
            m = x[assign == j]
            if len(m):
                cj = m.mean(axis=0)
                c[j] = cj / max(np.linalg.norm(cj), 1e-12)
    return c.tolist()


def ivf_cell(vec_col, centroids: list[list[float]]):
    """Nearest-centroid id by cosine — ONE fold pass over the vector
    accumulating all k centroid dot products (same no-CSE-safe shape as
    srp_bucket), then an argmax over the k-array. Returns an expression
    usable in select(); the caller must materialize the scores array in
    a separate projection before argmax (Catalyst does not CSE across
    higher-order functions)."""
    k = len(centroids)
    cent_arr = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    indexed = F.zip_with(
        vec_col,
        F.sequence(F.lit(0), F.size(vec_col) - 1),
        lambda v, j: F.struct(v.alias("v"), j.alias("j")),
    )
    return F.aggregate(
        indexed,
        F.array_repeat(F.lit(0.0), k),
        lambda acc, s: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda a, i: a + s["v"] * F.get(F.get(cent_arr, i), s["j"]),
        ),
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest-centroid cell;
    each query probes its ``nprobe`` closest cells; candidates within
    probed cells get an exact cosine re-rank.

    Plan: one shuffle co-locating (cell) on both sides — identical
    join shape to the LSH and ER blocking stages. Recall rises with
    ``nprobe``; candidate volume ≈ nprobe/k of the corpus per query."""
    from .dedup import _rebalance

    vectors = _rebalance(vectors, id_col)  # tiny-file guard (no-op at scale)
    v_scored = vectors.select(id_col, vec_col, ivf_cell(F.col(vec_col), centroids).alias("cs"))
    v_cells = v_scored.select(
        id_col,
        vec_col,
        (F.array_position(F.col("cs"), F.array_max("cs")) - 1).alias("cell"),
    )
    q_scored = queries.select(
        q_id_col, q_vec_col, ivf_cell(F.col(q_vec_col), centroids).alias("cs")
    )
    # top-nprobe cells per query: sort (score, idx) structs descending
    probe = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    "cs",
                    F.sequence(F.lit(0), F.size("cs") - 1),
                    lambda s, i: F.struct(s.alias("s"), i.alias("i")),
                )
            )
        ),
        1,
        nprobe,
    )
    q_cells = q_scored.select(
        q_id_col, q_vec_col, F.explode(probe).alias("p")
    ).select(q_id_col, q_vec_col, F.col("p.i").cast("long").alias("cell"))
    cands = v_cells.join(q_cells, "cell").select(
        id_col, vec_col, q_id_col, q_vec_col
    )
    scored = cands.withColumn("cos_sim", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "cos_sim", "rnk")
    )
