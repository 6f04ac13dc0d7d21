"""Lineage/skew metrics + turn-context window."""

from pyspark.sql import functions as F

from t_res_spark.operators.extraction import with_turn_context
from t_res_spark.plans.pipeline import blocking_metrics


def test_blocking_metrics_surfaces_hot_key(spark):
    rows = [("Avalon",)] * 50 + [("Tarvik",), ("Belford",), ("Wexmere",)]
    surfaces = spark.createDataFrame(rows, "mention string").distinct()
    # distinct surfaces: hot key visible only via alias side normally;
    # simulate with raw mentions (pre-distinct) to see the skew
    raw = spark.createDataFrame(rows, "mention string")
    m = blocking_metrics(raw).collect()[0]
    assert m["max_block"] == 50  # the hot key is measured
    assert m["p50"] <= 2
    assert m["n_blocks"] >= 4


def test_with_turn_context(spark):
    t = spark.createDataFrame(
        [("c", 0, "first"), ("c", 1, "second"), ("c", 2, "third"), ("d", 0, "solo")],
        "conv_id string, turn_idx int, text string",
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in with_turn_context(t).collect()}
    assert out[("c", 1)]["prev_text"] == "first"
    assert out[("c", 1)]["next_text"] == "third"
    assert out[("c", 0)]["prev_text"] is None
    assert out[("d", 0)]["next_text"] is None
