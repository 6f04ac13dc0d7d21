"""S7/S10/S15/J8 source surfaces + F9/F10/F13 normalizers."""

import os

from pyspark.sql import functions as F


def test_experiment_tsv_roundtrip(spark, tmp_path):
    """S7 -> M1: TSV scan feeding the from_json ingest."""
    from t_res_spark.sources.ingest import annotated_sentences
    from t_res_spark.sources.readers import read_experiment_tsv

    p = str(tmp_path / "exp.tsv")
    with open(p, "w") as f:
        f.write("article_id\tsentences\tannotations\n")
        f.write(
            'a1\t"[{""sentence_pos"":1,""sentence_text"":""London town""}]"\t'
            '"[{""sent_pos"":1,""mention"":""London"",""entity_type"":""LOC"",'
            '""wkdt_qid"":""Q84"",""mention_start"":0,""mention_end"":6}]"\n'
        )
    rows = read_experiment_tsv(spark, p)
    out = annotated_sentences(rows).collect()
    assert len(out) == 1 and out[0]["mention"] == "London" and out[0]["qid"] == "Q84"


def test_hf_json_load_with_limit(spark, tmp_path):
    """S10 — JSON-lines + the train[:10] test-mode slice."""
    from t_res_spark.sources.readers import read_hf_json

    p = str(tmp_path / "ds.json")
    with open(p, "w") as f:
        for i in range(25):
            f.write('{"id": %d, "tokens": ["a", "b"], "ner_tags": [0, 0]}\n' % i)
    assert read_hf_json(spark, p).count() == 25
    assert read_hf_json(spark, p, limit=10).count() == 10


def test_wiki_title_lookup(spark):
    """S15 — title->QID as a mapping-table join on the normalized key."""
    from t_res_spark.functions.text import wikipedia_to_wikidata_key
    from t_res_spark.sources.readers import wiki_title_lookup

    titles = spark.createDataFrame(
        [("New_York_City",), ("San Francisco",), ("Atlantis",)], "page_title string"
    )
    mapping = spark.createDataFrame(
        [("new_york_city", "Q60"), ("san_francisco", "Q62")], "wiki_key string, qid string"
    )
    got = {r["page_title"]: r["qid"] for r in wiki_title_lookup(titles, mapping).collect()}
    assert got["New_York_City"] == "Q60"
    assert got["San Francisco"] == "Q62"
    assert got["Atlantis"] is None  # miss -> None, like title_to_id


def test_merge_splits(spark):
    """J8 — left equi-join of split labels by article id."""
    from t_res_spark.sources.readers import merge_splits

    mentions = spark.createDataFrame(
        [(1, "London"), (2, "Paris"), (3, "Ghost")],
        "article_id int, mention string",
    )
    splits = spark.createDataFrame(
        [("1", "train"), ("2", "test")], "article_id string, originalsplit string"
    )
    got = {r["mention"]: r["originalsplit"] for r in merge_splits(mentions, splits).collect()}
    assert got == {"London": "train", "Paris": "test", "Ghost": None}


def test_f9_f10_f13_normalizers(spark):
    from t_res_spark.functions.text import (
        normalize_vocab_token,
        normalize_wiki_url,
        wikipedia_to_wikidata_key,
        zfill_code,
    )

    df = spark.createDataFrame(
        [("Python_(programming_language)#Overview", "-LSB-", "R2D2", 7)],
        "u string, b string, t string, c int",
    )
    r = df.select(
        normalize_wiki_url(F.col("u")).alias("nu"),
        wikipedia_to_wikidata_key(F.col("u")).alias("wk"),
        normalize_vocab_token(F.col("b")).alias("nb"),
        normalize_vocab_token(F.col("t"), lower=True, digit_0=True).alias("nt"),
        normalize_vocab_token(F.col("t")).alias("nt_default"),
        normalize_vocab_token(F.lit("#UNK#")).alias("unk"),
        zfill_code(F.col("c")).alias("z"),
        # zfill semantics: >width codes pass through UNTRUNCATED
        zfill_code(F.lit(123456789)).alias("z_long"),
        # zfill semantics: zeros fill AFTER the sign, either sign
        zfill_code(F.lit(-12)).alias("z_neg"),
        zfill_code(F.lit("+12")).alias("z_plus"),
        # malformed percent-escape must pass through, not abort the job
        wikipedia_to_wikidata_key(F.lit("100%_wool")).alias("bad_pct"),
    ).collect()[0]
    # form-encoding variant: space -> '+' (documented delta vs quote())
    assert r["nu"] == "python+%28programming+language%29"
    assert r["wk"] == "python_(programming_language)"
    assert r["nb"] == "["
    assert r["nt"] == "r0d0"
    assert r["nt_default"] == "R2D2"  # reference defaults: no lower/digit_0
    assert r["unk"] == "#UNK#"   # special tokens pass through
    assert r["z"] == "0000007"
    assert r["z_long"] == "123456789"  # str.zfill never truncates
    assert r["z_neg"] == str(-12).zfill(7)  # '-000012'
    assert r["z_plus"] == "+12".zfill(7)  # '+000012' (ADVICE r03)
    assert r["bad_pct"] == "100%_wool"
