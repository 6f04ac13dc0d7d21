"""Streaming ingest + incremental clustering: two micro-batches must
produce the same cluster assignment for the same entity (stable roots
across batches), and the watermarked window agg must run."""

import os

import pytest
from pyspark.sql import functions as F

from t_res_spark.streaming.incremental import (
    IncrementalResolver,
    stream_transcripts,
    windowed_turn_counts,
)


@pytest.fixture()
def alias_kb(spark):
    rows = [
        ("Tarvik", "E1", 0.875, 1000.0),
        ("Tarvvik", "E1", 0.125, 100.0),
        ("Belford", "E2", 0.75, 800.0),
    ]
    return spark.createDataFrame(
        rows, "alias string, qid string, relv double, abs_relv double"
    )


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_incremental_two_batches(spark, alias_kb, tmp_path):
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    from datetime import datetime

    t = datetime(2024, 1, 1)
    _write_batch(spark, in_dir, [("c1", 0, "user", "we saw Tarvik today", None, t)])

    stream = stream_transcripts(spark, in_dir)
    resolver = IncrementalResolver(spark, alias_kb, state)
    q = resolver.start(stream)
    assert q.awaitTermination(120), 'stream did not drain in 120s'

    # batch 2: same entity via OCR variant + a new entity
    _write_batch(
        spark, in_dir,
        [("c2", 0, "user", "report from Tarvvik and Belford", None, t)],
    )
    q2 = resolver.start(stream_transcripts(spark, in_dir))
    assert q2.awaitTermination(120), 'stream did not drain in 120s'

    out = spark.read.parquet(os.path.join(state, "clusters"))
    rows = {r["mention_id"]: r for r in out.collect()}
    tarvik = [r for r in rows.values() if r["prediction"] == "E1"]
    assert len(tarvik) >= 2
    assert len({r["cluster_id"] for r in tarvik}) == 1  # stable across batches
    assert any(r["prediction"] == "E2" for r in rows.values())


def test_windowed_counts_runs(spark, tmp_path):
    in_dir = str(tmp_path / "win_in")
    from datetime import datetime

    _write_batch(
        spark, in_dir,
        [("c1", i, "user" if i % 2 else "tool", f"turn {i}", None,
          datetime(2024, 1, 1, 0, i % 5)) for i in range(10)],
    )
    agg = windowed_turn_counts(stream_transcripts(spark, in_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(120), 'stream did not drain in 120s'
    # append mode emits only closed windows; the aggregation ran end-to-end
    assert spark.table("win_counts").columns == ["window", "role", "turns"]


def test_streaming_equals_batch_partition(spark, alias_kb, tmp_path):
    """VERDICT r4 #7 — cross-path equivalence: IncrementalResolver over
    3 micro-batch splits induces EXACTLY the same partition of mentions
    into clusters as the batch path (extract → rank → link →
    cluster_mentions) over the whole corpus. Labels differ by design
    (streaming pins mention-space roots for the state-table pattern;
    batch labels in prediction space), so the invariant is the induced
    partition, not the label strings."""
    import random
    from datetime import datetime

    from t_res_spark.operators import extraction, linking, ranking
    from t_res_spark.operators.clustering import cluster_mentions

    rng = random.Random(7)
    # exact surfaces, known OCR variants, an unseen-but-close variant
    # (fuzzy path), and junk (NIL singletons)
    surfaces = ["Tarvik", "Tarvvik", "Belford", "Belfordd", "zzjunk", "qq"]
    t0 = datetime(2024, 1, 1)
    corpus = [
        (f"c{i // 4}", i % 4, "user", f"we saw {rng.choice(surfaces)} today",
         None, t0)
        for i in range(24)
    ]

    # --- batch path over the full corpus -----------------------------
    full = spark.createDataFrame(
        corpus, "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp"
    )
    mentions = extraction.extract_mentions(full)
    cands = ranking.find_candidates(
        extraction.distinct_mentions(mentions), alias_kb,
        method="fuzzy", threshold=0.7, top_k=3,
    )
    linked = linking.link_mentions(mentions, linking.most_popular(cands))
    batch_pairs = [
        (r["mention_id"], r["cluster_id"])
        for r in cluster_mentions(linked).select("mention_id", "cluster_id").collect()
    ]

    # --- streaming path: same corpus in 3 splits ---------------------
    in_dir = str(tmp_path / "eq_in")
    state = str(tmp_path / "eq_state")
    resolver = IncrementalResolver(spark, alias_kb, state)
    for lo, hi in ((0, 8), (8, 16), (16, 24)):
        _write_batch(spark, in_dir, corpus[lo:hi])
        q = resolver.start(stream_transcripts(spark, in_dir))
        assert q.awaitTermination(120), 'stream did not drain in 120s'

    out = spark.read.parquet(os.path.join(state, "clusters"))
    stream_pairs = [
        (r["mention_id"], r["cluster_id"])
        for r in out.select("mention_id", "cluster_id").collect()
    ]

    def partition(pairs):
        clusters = {}
        for mid, cid in pairs:
            clusters.setdefault(cid, set()).add(mid)
        return {frozenset(v) for v in clusters.values()}

    assert dict(stream_pairs), "streaming produced no mentions"
    assert len(dict(stream_pairs)) == len(stream_pairs), "duplicate mention rows"
    assert partition(stream_pairs) == partition(batch_pairs)
