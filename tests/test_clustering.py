"""Connected-components correctness: chains, stars, determinism under
partitioning (SURVEY §7.3 #2)."""

from t_res_spark.operators import clustering


def _labels(spark, edges, n_part=1):
    df = spark.createDataFrame(edges, "src string, dst string").repartition(n_part)
    out = clustering.connected_components(df)
    return {r["mention_id"]: r["cluster_id"] for r in out.collect()}


def test_chain(spark):
    # a-b-c-d-e chain must collapse to min label 'a'
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    labels = _labels(spark, edges)
    assert all(labels[x] == "a" for x in ["b", "c", "d", "e"])


def test_two_components(spark):
    edges = [("a", "b"), ("c", "d"), ("d", "e"), ("x", "y")]
    labels = _labels(spark, edges)
    assert labels["b"] == "a"
    assert labels["d"] == labels["e"] == "c"
    assert labels["y"] == "x"


def test_partitioning_invariance(spark):
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(0, 40)] + [
        ("z1", "z2"),
        ("z2", "z3"),
    ]
    l1 = _labels(spark, edges, n_part=1)
    l8 = _labels(spark, edges, n_part=8)
    assert l1 == l8
    assert l1["n040"] == "n000"


def test_cluster_mentions_nil_singletons(spark):
    linked = spark.createDataFrame(
        [
            ("c:0:0", "Tarvik", "E1"),
            ("c:1:0", "Tarvyk", "E1"),
            ("c:2:0", "Xqzul", "NIL"),
            ("c:3:0", "Belford", "E2"),
        ],
        "mention_id string, mention string, prediction string",
    )
    out = {r["mention_id"]: r["cluster_id"] for r in
           clustering.cluster_mentions(linked).collect()}
    # prediction-space labels: same entity -> same label (the QID)
    assert out["c:0:0"] == out["c:1:0"] == "E1"
    assert out["c:2:0"] == "c:2:0"  # NIL singleton labels itself
    assert out["c:3:0"] == "E2"  # lone entity mention


def test_prerank_truncation_bounds_candidates(spark):
    """W4 — top-keep_ctx_ent by context score ∪ top-keep_p_e_m by prior
    bounds every mention's candidate rows at ≤ 7
    (entity_disambiguation.py:137-139, 740-776)."""
    from t_res_spark.operators.context import context_disambiguate, prerank_truncate
    from t_res_spark.datagen import EMB_DIM, hashed_ngram_embedding
    from pyspark.sql import functions as F

    # one mention with 20 candidates
    cands = spark.createDataFrame(
        [("alpha", f"Q{i}", float(i), float(i * 100)) for i in range(20)],
        "mention string, qid string, relv double, abs_relv double",
    )
    mentions = spark.createDataFrame(
        [("c1", "m1", "alpha"), ("c1", "m2", "alpha")],
        "conv_id string, mention_id string, mention string",
    )
    out = context_disambiguate(mentions, cands)
    assert out.count() == 2  # still one prediction per mention

    rows = (
        mentions.join(
            cands.groupBy("mention", "qid").agg(F.max("abs_relv").alias("abs_relv"))
            .withColumn("prior", F.col("abs_relv") / F.lit(1.0)),
            "mention",
        )
        .withColumn("emb", F.array(*[F.lit(0.1)] * EMB_DIM))
        .withColumn("is_prior", F.lit(False))
        .withColumn("prior_qid", F.lit(None).cast("string"))
    )
    kept = prerank_truncate(rows)
    per_mention = kept.groupBy("mention_id").count().collect()
    assert all(r["count"] <= 7 for r in per_mention)
    assert all(r["count"] >= 4 for r in per_mention)


def test_attention_topn_bounds_context():
    """W5 — with > ATT_TOP_N mentions in a conversation, each mention's
    coherence context uses only the top-n most similar others (pure
    pandas function test; deterministic output regardless)."""
    import numpy as np
    import pandas as pd

    from t_res_spark.operators import context as ctx

    rng = np.random.RandomState(0)
    n = ctx.ATT_TOP_N + 5
    rows = []
    for i in range(n):
        for q in ("Qa", "Qb"):
            rows.append({
                "conv_id": "c1", "mention_id": f"m{i:03d}", "mention": f"x{i}",
                "qid": q, "prior": 0.6 if q == "Qa" else 0.4,
                "emb": rng.normal(size=16).tolist(),
                "is_prior": False, "prior_qid": None,
            })
    out = ctx._conv_coherence(pd.DataFrame(rows))
    assert len(out) == n
    assert set(out["prediction"]).issubset({"Qa", "Qb"})
    # determinism: same input -> same output
    out2 = ctx._conv_coherence(pd.DataFrame(rows))
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True)
    )


def test_local_and_distributed_cc_agree(spark):
    """The size-gated union-find and the distributed star algorithm
    assign identical cluster labels (min node id per component)."""
    import random

    from t_res_spark.operators.clustering import connected_components

    rng = random.Random(11)
    edges = [(f"n{rng.randrange(60):02d}", f"n{rng.randrange(60):02d}")
             for _ in range(80)]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = {r["mention_id"]: r["cluster_id"]
             for r in connected_components(df).collect()}
    dist = {r["mention_id"]: r["cluster_id"]
            for r in connected_components(df, local_threshold=0).collect()}
    for node, label in dist.items():
        assert local[node] == label, (node, label, local.get(node))
    # local path may additionally carry root->root rows; every extra
    # row must be a self-label
    for node in set(local) - set(dist):
        assert local[node] == node
