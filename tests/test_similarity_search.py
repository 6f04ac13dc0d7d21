"""Similarity search: brute-force cosine exactness + LSH recall."""

import math

import pytest
from pyspark.sql import functions as F

from t_res_spark.operators import similarity_search as ss


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=(20, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # vec 19 = near-copy of vec 0
    rows[19] = (19, [float(x + 0.01) for x in base[0]])
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_self_top1(vectors):
    queries = vectors.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).filter(F.col("q_id").isin(0, 5))
    out = ss.brute_force_topk(vectors, queries, k=3)
    top1 = {r["q_id"]: r["vec_id"] for r in out.filter(F.col("rnk") == 1).collect()}
    assert top1 == {0: 0, 5: 5}  # self is nearest
    near = {r["q_id"]: r["vec_id"] for r in out.filter(F.col("rnk") == 2).collect()}
    assert near[0] == 19  # planted near-copy


def test_lsh_finds_planted_neighbor(vectors):
    queries = vectors.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    ).filter(F.col("q_id") == 0)
    out = ss.lsh_topk(vectors, queries, dim=8, k=5, bits=6, tables=6)
    ids = [r["vec_id"] for r in out.collect()]
    assert 0 in ids and 19 in ids  # self + near-copy recalled


def test_cosine_matches_numpy(spark, vectors):
    import numpy as np

    rows = {r["vec_id"]: r["embedding"] for r in vectors.collect()}
    got = (
        vectors.filter(F.col("vec_id").isin(0, 1))
        .crossJoin(
            vectors.filter(F.col("vec_id") == 2).select(
                F.col("embedding").alias("other")
            )
        )
        .select("vec_id", ss.cosine(F.col("embedding"), F.col("other")).alias("c"))
        .collect()
    )
    for r in got:
        a, b = np.array(rows[r["vec_id"]]), np.array(rows[2])
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(r["c"], want, rel_tol=1e-9)
