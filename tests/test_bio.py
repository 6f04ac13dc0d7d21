"""ML2 — BIO repair chain goldens (straight from the reference
docstrings, utils/ner.py:351-543) + aggregation."""

from t_res_spark.operators.bio import (
    aggregate_mentions,
    collect_named_entities,
    fix_capitalization,
    fix_hyphens,
    fix_nested,
    fix_start_entity,
    repair_bio,
)


def _tok(entity, word, start, end, score=0.9):
    return {"entity": entity, "word": word, "start": start, "end": end, "score": score}


def test_fix_hyphens_ashton_golden():
    """'Ashton - under - Lyne' B,B,B,B,B -> B,I,I,I,I (ner.py:373-380)."""
    toks = [
        _tok("B-LOC", "Ashton", 0, 6),
        _tok("B-LOC", "-", 6, 7),
        _tok("B-LOC", "under", 7, 12),
        _tok("B-LOC", "-", 12, 13),
        _tok("B-LOC", "Lyne", 13, 17),
    ]
    assert [t["entity"] for t in fix_hyphens(toks)] == [
        "B-LOC", "I-LOC", "I-LOC", "I-LOC", "I-LOC",
    ]


def test_fix_nested_island_golden():
    """'Island of Terceira' B,I,B -> B,I,I (ner.py:458-465)."""
    toks = [
        _tok("B-LOC", "Island", 0, 6),
        _tok("I-LOC", "of", 7, 9),
        _tok("B-LOC", "Terceira", 10, 18),
    ]
    assert [t["entity"] for t in fix_nested(toks)] == ["B-LOC", "I-LOC", "I-LOC"]


def test_fix_start_entity_rules():
    """I- at start -> B-; I- after O or type change -> B- (ner.py:483-543)."""
    toks = [
        _tok("I-LOC", "Paris", 0, 5),
        _tok("O", "and", 6, 9),
        _tok("I-LOC", "London", 10, 16),
        _tok("I-BUILDING", "Tower", 17, 22),
    ]
    got = [t["entity"] for t in fix_start_entity(toks)]
    assert got == ["B-LOC", "O", "B-LOC", "B-BUILDING"]


def test_fix_capitalization_reslices_from_sentence():
    s = "We saw LONDON"
    t = fix_capitalization(_tok("B-LOC", "london", 7, 13), s)
    assert t["word"] == "LONDON"
    t2 = fix_capitalization(_tok("I-LOC", "##don", 10, 13), s)
    assert t2["word"] == "##DON"


def test_collect_and_aggregate_mentions():
    """Spans split at O / B- / type change; text reconstruction honors
    char gaps and ## subwords; score = round-3dp mean (ner.py:70-307)."""
    toks = [
        _tok("B-LOC", "New", 0, 3, 0.9),
        _tok("I-LOC", "York", 4, 8, 0.8),
        _tok("I-LOC", "##shire", 8, 13, 0.7),
        _tok("O", "is", 14, 16, 0.5),
        _tok("B-LOC", "Kent", 17, 21, 0.6),
    ]
    spans = collect_named_entities(toks)
    assert [(s["start_offset"], s["end_offset"]) for s in spans] == [(0, 2), (4, 4)]
    mentions = aggregate_mentions(toks)
    assert mentions[0]["mention"] == "New Yorkshire"   # gap=1 space; ## joins
    assert mentions[0]["ner_score"] == 0.8             # (0.9+0.8+0.7)/3
    assert mentions[0]["start_char"] == 0 and mentions[0]["end_char"] == 13
    assert mentions[1]["mention"] == "Kent"


def test_repair_chain_order_end_to_end():
    """Hyphen fix feeds nested fix feeds start fix (recogniser.py:388-396)."""
    toks = [
        _tok("I-LOC", "Isle", 0, 4),       # start fix -> B-
        _tok("I-LOC", "of", 5, 7),
        _tok("B-LOC", "Wight", 8, 13),     # nested fix -> I-
    ]
    out = repair_bio(toks)
    assert [t["entity"] for t in out] == ["B-LOC", "I-LOC", "I-LOC"]
    assert len(collect_named_entities(out)) == 1


def test_repair_and_aggregate_spark(spark):
    from t_res_spark.operators.bio import repair_and_aggregate

    toks = spark.createDataFrame(
        [
            ("c1", 0, "B-LOC", "Ashton", 5, 11, 0.9, "near Ashton-under-Lyne x"),
            ("c1", 0, "B-LOC", "-", 11, 12, 0.9, "near Ashton-under-Lyne x"),
            ("c1", 0, "B-LOC", "under", 12, 17, 0.9, "near Ashton-under-Lyne x"),
            ("c1", 0, "B-LOC", "-", 17, 18, 0.9, "near Ashton-under-Lyne x"),
            ("c1", 0, "B-LOC", "Lyne", 18, 22, 0.9, "near Ashton-under-Lyne x"),
        ],
        "conv_id string, turn_idx int, entity string, word string, "
        "start int, end int, score double, text string",
    )
    out = repair_and_aggregate(toks).collect()
    assert len(out) == 1
    assert out[0]["mention"] == "Ashton-under-Lyne"
    assert out[0]["ner_score"] == 0.9


def test_bio_wellformedness_property():
    """§5.5 analog — after the repair chain, no I- token follows an O or
    a different-type token (the reference's processing-alignment
    invariant, tests/test_process_data.py:73-183), for arbitrary tag
    sequences."""
    import random

    from t_res_spark.operators.bio import repair_bio

    rng = random.Random(13)
    tags = ["O", "B-LOC", "I-LOC", "B-BUILDING", "I-BUILDING"]
    words = ["London", "-", "of", "x", "Tower", "9", "the"]
    for _ in range(300):
        n = rng.randrange(1, 12)
        toks = [
            {
                "entity": rng.choice(tags),
                "word": rng.choice(words),
                "start": i * 5,
                "end": i * 5 + 4,
                "score": 0.9,
            }
            for i in range(n)
        ]
        out = repair_bio(toks)
        prev = "O"
        for t in out:
            if t["entity"].startswith("I-"):
                assert prev != "O" and prev[2:] == t["entity"][2:], (
                    toks, [x["entity"] for x in out],
                )
            prev = t["entity"]
