"""Span alignment (J6), pairwise-F1 evaluator (A7), cross-candidate
normalization (A6), alias-casing dedup (W8), and the context
disambiguator (ML4/ML5 analog)."""

import pytest
from pyspark.sql import functions as F

from t_res_spark.operators import alignment
from t_res_spark.operators.context import context_disambiguate


def test_align_spans_max_overlap(spark):
    pred = spark.createDataFrame(
        [("c", 0, "New York", 10, 18), ("c", 0, "Boston", 30, 36)],
        "conv_id string, turn_idx int, mention string, start_char int, end_char int",
    )
    gold = spark.createDataFrame(
        [("c", 0, "New York City", 10, 23, "Q60"), ("c", 0, "York", 14, 18, "Q1")],
        "conv_id string, turn_idx int, gold_mention string, gold_start int, "
        "gold_end int, gold_qid string",
    )
    out = {r["mention"]: r for r in alignment.align_spans(pred, gold).collect()}
    # 'New York' overlaps gold 'New York City' by 8 chars > 'York' by 4
    assert out["New York"]["gold_qid"] == "Q60"
    assert out["New York"]["overlap_chars"] == 8
    assert out["Boston"]["gold_qid"] is None  # unaligned kept (left join)


def test_evaluate_pairwise_f1(spark):
    clusters = spark.createDataFrame(
        [("a", "r1"), ("b", "r1"), ("c", "r2"), ("d", "r3")],
        "mention_id string, cluster_id string",
    )
    pairs = spark.createDataFrame(
        [("k", "a", "b", True), ("k", "a", "c", False),
         ("k", "b", "c", True), ("k", "c", "d", False)],
        "block_key string, mention_id_a string, mention_id_b string, same_entity boolean",
    )
    row = alignment.evaluate_pairwise_f1(clusters, pairs).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 0, 1, 2)
    assert row["precision"] == 1.0 and row["recall"] == 0.5
    assert row["f1"] == pytest.approx(2 / 3)


def test_cross_cand_normalize(spark):
    scored = spark.createDataFrame(
        [("m", "Q1", 4.0), ("m", "Q2", 2.0), ("m", "Q3", 2.0),
         ("n", "Q4", 7.0), ("n", "Q5", 7.0)],
        "mention string, qid string, raw_score double",
    )
    out = {(r["mention"], r["qid"]): r["norm_score"]
           for r in alignment.cross_cand_normalize(scored).collect()}
    assert out[("m", "Q1")] == 1.0  # rescaled 1.0 / sum 1.0
    assert out[("m", "Q2")] == 0.0
    assert out[("n", "Q4")] == 0.0  # all-equal group → zeros (ed.py:445-449)


def test_dedup_alias_casing(spark):
    aliases = spark.createDataFrame(
        [("London", "Q84"), ("London", "Q170"), ("LONDON", "Q84"),
         ("london", "Q84"), ("Paris", "Q90")],
        "alias string, qid string",
    )
    out = {r["alias"] for r in alignment.dedup_alias_casing(aliases).collect()}
    assert out == {"London", "Paris"}  # most-entities casing kept


def test_context_disambiguation_flips_ambiguous(spark):
    """Two mentions of an ambiguous surface must follow the
    conversation's coherent entity, not just the global prior —
    the distributed analog of the reference's reldisamb-vs-mostpopular
    E2E difference (tests/test_pipeline.py:168-179)."""
    mentions = spark.createDataFrame(
        [
            ("conv1", "conv1:0:0", "Tarvik"),      # unambiguous E1 anchor-ish
            ("conv1", "conv1:1:0", "Avalon"),      # ambiguous surface
            ("conv2", "conv2:0:0", "Belford"),     # unambiguous E9 context
            ("conv2", "conv2:1:0", "Avalon"),
        ],
        "conv_id string, mention_id string, mention string",
    )
    # Avalon maps to E1 (small prior) and E8 (big prior); Tarvik→E1, Belford→E9≈E8-ish context
    candidates = spark.createDataFrame(
        [
            ("Tarvik", "E1", 0.9, 900.0),
            ("Avalon", "E1", 0.1, 100.0),
            ("Avalon", "E8", 0.9, 900.0),
            ("Belford", "E8", 0.9, 900.0),
        ],
        "mention string, qid string, relv double, abs_relv double",
    )
    out = {r["mention_id"]: r["prediction"]
           for r in context_disambiguate(mentions, candidates).collect()}
    # conv2's Avalon should follow its strong E8 context
    assert out["conv2:1:0"] == "E8"
    assert out["conv1:0:0"] == "E1"
    # determinism
    out2 = {r["mention_id"]: r["prediction"]
            for r in context_disambiguate(mentions, candidates).collect()}
    assert out == out2


def test_align_gold_tokens_bio_rules(spark):
    """J7 — B-/I-/O position rules (process_data.py:160-190 goldens):
    start==gold_start -> B-, inside -> I-, overhang/no-span -> O."""
    from t_res_spark.operators.alignment import align_gold_tokens

    tokens = spark.createDataFrame(
        [("c", 0, 10, 14), ("c", 0, 15, 18), ("c", 0, 16, 25), ("c", 0, 40, 44)],
        "conv_id string, turn_idx int, tok_start int, tok_end int",
    )
    gold = spark.createDataFrame(
        [("c", 0, 10, 18, "loc", "Q84")],
        "conv_id string, turn_idx int, gold_start int, gold_end int, gold_type string, gold_qid string",
    )
    got = {r["tok_start"]: (r["entity"], r["link"]) for r in align_gold_tokens(tokens, gold).collect()}
    assert got[10] == ("B-LOC", "B-Q84")
    assert got[15] == ("I-LOC", "I-Q84")
    assert got[16] == ("O", "O")   # overhangs gold_end -> reference fall-through
    assert got[40] == ("O", "O")   # no gold span
