"""End-to-end golden-cluster tests: the distributed pipeline must match
the single-process oracle exactly, and hit pairwise F1 >= 0.99 on the
generator's planted ground truth (BASELINE.json metric)."""

import pandas as pd
import pytest

from t_res_spark import datagen, oracle
from t_res_spark.plans.pipeline import PipelineConfig, resolve
from t_res_spark.sources.tables import CheckpointCatalog, read_fixture


def _spark_clusters(spark, fixture_dir, catalog=None):
    transcripts = read_fixture(spark, fixture_dir, "transcripts")
    aliases = read_fixture(spark, fixture_dir, "aliases")
    res = resolve(spark, transcripts, aliases, config=PipelineConfig(), catalog=catalog)
    return res


def test_e2e_matches_oracle_tiny(spark, tiny_fx, tiny_dir):
    res = _spark_clusters(spark, tiny_dir)
    got = {
        r["mention_id"]: (r["prediction"], r["cluster_id"])
        for r in res.clusters.select("mention_id", "prediction", "cluster_id").collect()
    }
    orc = oracle.resolve_oracle(tiny_fx)
    want = {
        r.mention_id: (r.prediction, r.cluster_id) for r in orc.itertuples()
    }
    assert got == want


def test_pairwise_f1_against_planted_truth(spark, tiny_fx, tiny_dir):
    res = _spark_clusters(spark, tiny_dir)
    clusters = res.clusters.select("mention_id", "cluster_id").toPandas()
    stats = oracle.pairwise_f1(clusters, tiny_fx.labeled_pairs)
    assert stats["f1"] >= 0.99, stats


def test_resume_from_checkpoint(spark, tiny_dir, tmp_path):
    """Kill-between-stages resumability (experiment.py:133-157 analog):
    a catalog-backed run persists stage tables; a second run must reuse
    them (same config hash) and produce identical clusters."""
    cat = CheckpointCatalog(spark, str(tmp_path / "ckpt"))
    r1 = _spark_clusters(spark, tiny_dir, catalog=cat)
    c1 = sorted(map(tuple, r1.clusters.select("mention_id", "cluster_id").collect()))
    assert cat.exists("mentions", _cfg_hash()) and cat.exists("clusters", _cfg_hash())
    # resume: stage tables exist → read, not recompute
    cat2 = CheckpointCatalog(spark, str(tmp_path / "ckpt"))
    r2 = _spark_clusters(spark, tiny_dir, catalog=cat2)
    c2 = sorted(map(tuple, r2.clusters.select("mention_id", "cluster_id").collect()))
    assert c1 == c2


def _cfg_hash():
    from t_res_spark.sources.tables import config_hash

    return config_hash(PipelineConfig().as_dict())


def test_metrics_table(spark, tiny_dir):
    res = _spark_clusters(spark, tiny_dir)
    m = res.metrics.toPandas()
    assert m["rows"].sum() > 0
    assert (m["clusters"] > 0).any()


@pytest.mark.slow
def test_e2e_matches_oracle_small(spark, small_dir):
    fx = datagen.generate(seed=42, **datagen.SCALES["small"])
    res = _spark_clusters(spark, small_dir)
    clusters = res.clusters.select("mention_id", "cluster_id").toPandas()
    stats = oracle.pairwise_f1(clusters, fx.labeled_pairs)
    assert stats["f1"] >= 0.99, stats


def test_config_dispatch_all_ranking_methods(spark, tiny_dir):
    """Every PipelineConfig.ranking_method is runnable end-to-end and
    resolves the exact surfaces identically (fuzzy variants differ only
    on non-exact surfaces)."""
    transcripts = read_fixture(spark, tiny_dir, "transcripts")
    aliases = read_fixture(spark, tiny_dir, "aliases")
    base = None
    for method in ("perfectmatch", "fuzzy", "jarowinkler", "levenshtein"):
        cfg = PipelineConfig(
            ranking_method=method,
            fuzzy_threshold=0.85 if method == "jarowinkler" else 0.7,
        )
        res = resolve(spark, transcripts, aliases, config=cfg)
        got = {
            r["mention_id"]: r["prediction"]
            for r in res.clusters.select("mention_id", "prediction").collect()
        }
        assert got, method
        exact_hits = {
            k: v for k, v in got.items() if v != "NIL"
        }
        if base is None:
            base = exact_hits
        else:
            # perfectmatch's resolutions are a subset every fuzzy method
            # must agree on (exact match short-circuits identically)
            for k, v in base.items():
                assert got.get(k) == v, (method, k, v, got.get(k))


def test_bucketed_resume_no_exchange(spark, tiny_fx, tiny_dir, tmp_path):
    """VERDICT r4 #8 — opt-in bucketed stage persistence: a resolve()
    run with `bucketed_stage_prefix` persists mentions+predictions
    bucketed on `mention`; a resumed session's label join runs with
    ZERO Exchange on either side even with broadcast disabled (the
    at-scale regime where predictions outgrow broadcast range), and
    the clusters equal the unbucketed run's."""
    from t_res_spark.plans.pipeline import resume_from_bucketed
    from t_res_spark.sources.tables import read_fixture

    spark.sql("DROP TABLE IF EXISTS tres_bkt_mentions")
    spark.sql("DROP TABLE IF EXISTS tres_bkt_predictions")
    transcripts = read_fixture(spark, tiny_dir, "transcripts")
    aliases = read_fixture(spark, tiny_dir, "aliases")
    base = resolve(spark, transcripts, aliases, config=PipelineConfig())
    want = sorted(
        map(tuple, base.clusters.select("mention_id", "cluster_id").collect())
    )
    res = resolve(
        spark, transcripts, aliases,
        config=PipelineConfig(extra={"bucketed_stage_prefix": "tres_bkt"}),
    )
    got = sorted(
        map(tuple, res.clusters.select("mention_id", "cluster_id").collect())
    )
    assert got == want

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the SMJ regime: with bucketed+sorted tables the join
        # must still need no shuffle and no sort
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        resumed = resume_from_bucketed(spark, "tres_bkt")
        plan = resumed.linked._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        rgot = sorted(
            map(tuple, resumed.clusters.select("mention_id", "cluster_id").collect())
        )
        assert rgot == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        base.unpersist()
        res.unpersist()
