"""M1/S7 — from_json ingest of stringified list-of-dict columns
(process_data.py:18-128)."""


def test_parse_annotated_rows(spark):
    from t_res_spark.sources.ingest import (
        annotated_sentences,
        parse_annotations,
        parse_sentences,
    )

    rows = spark.createDataFrame(
        [
            (
                "a1",
                '[{"sentence_pos":1,"sentence_text":"London town"},'
                '{"sentence_pos":2,"sentence_text":"no mentions here"}]',
                '[{"sent_pos":1,"mention":"London","entity_type":"LOC",'
                '"wkdt_qid":"Q84","mention_start":0,"mention_end":6}]',
            ),
            ("a2", "not valid json", '[{"sent_pos":1,"mention":"X","entity_type":"LOC",'
             '"wkdt_qid":"*","mention_start":0,"mention_end":1}]'),
        ],
        "article_id string, sentences string, annotations string",
    )
    s = parse_sentences(rows).collect()
    assert {(r["article_id"], r["sent_pos"]) for r in s} == {("a1", 1), ("a1", 2)}
    a = {r["article_id"]: r for r in parse_annotations(rows).collect()}
    assert a["a1"]["qid"] == "Q84"
    assert a["a2"]["qid"] == "NIL"  # the '*' rule (process_data.py:92-96)
    j = annotated_sentences(rows).collect()
    by_pos = {(r["article_id"], r["sent_pos"]): r for r in j}
    assert by_pos[("a1", 1)]["mention"] == "London"
    assert by_pos[("a1", 2)]["mention"] is None  # unannotated sentences kept


def test_parse_python_repr_cells(spark):
    """The reference's REAL TSV cells are single-quoted str() reprs
    (why it uses literal_eval) — the Arrow-batched fallback must parse
    them identically to JSON cells."""
    from t_res_spark.sources.ingest import parse_annotations, parse_sentences

    rows = spark.createDataFrame(
        [
            (
                "a1",
                "[{'sentence_pos': 1, 'sentence_text': \"Bob's house in London\"}]",
                "[{'sent_pos': 1, 'mention': 'London', 'entity_type': 'LOC', "
                "'wkdt_qid': 'Q84', 'mention_start': 14, 'mention_end': 20}]",
            ),
        ],
        "article_id string, sentences string, annotations string",
    )
    s = parse_sentences(rows).collect()
    assert len(s) == 1 and s[0]["sentence_text"] == "Bob's house in London"
    a = parse_annotations(rows).collect()
    assert len(a) == 1 and a[0]["qid"] == "Q84" and a[0]["mention_start"] == 14
