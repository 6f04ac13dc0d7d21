"""applyInPandasWithState: cumulative per-conversation state across
micro-batches, surviving via the state store."""

import os
from datetime import datetime

from t_res_spark.streaming.incremental import stream_transcripts
from t_res_spark.streaming.stateful import conversation_state_stream


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_stateful_accumulates_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t = datetime(2024, 1, 1)
    _write_batch(spark, in_dir, [
        ("c1", 0, "user", "we visited Tarvik today", None, t),
        ("c1", 1, "assistant", "indeed Tarvik is lovely", None, t),
    ])

    out_dir = str(tmp_path / "out")

    def run_once(_qname):
        # file sink (memory sink cannot recover from a checkpoint);
        # each micro-batch appends one summary row per active conv
        q = (
            conversation_state_stream(stream_transcripts(spark, in_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        df = spark.read.parquet(out_dir)
        # latest cumulative row per conversation
        rows = {}
        for r in df.collect():
            cur = rows.get(r["conv_id"])
            if cur is None or r["turns_seen"] > cur["turns_seen"]:
                rows[r["conv_id"]] = r
        return rows

    out1 = run_once("conv_state_1")
    assert out1["c1"]["turns_seen"] == 2
    assert out1["c1"]["mentions_seen"] == 2
    assert out1["c1"]["distinct_surfaces"] == 1  # same surface twice

    # batch 2: same conversation continues + a new one
    _write_batch(spark, in_dir, [
        ("c1", 2, "user", "then on to Belford", None, t),
        ("c2", 0, "user", "hello from Wexford", None, t),
    ])
    out2 = run_once("conv_state_2")
    # state restored from the store: counters are cumulative
    assert out2["c1"]["turns_seen"] == 3
    assert out2["c1"]["mentions_seen"] == 3
    assert out2["c1"]["distinct_surfaces"] == 2
    assert out2["c1"]["last_turn_idx"] == 2
    assert out2["c2"]["turns_seen"] == 1
