"""Candidate-ranking parity tests — semantics lifted from
/root/reference/tests/test_ranking.py."""

import pytest
from pyspark.sql import functions as F

from t_res_spark.operators import ranking


@pytest.fixture(scope="module")
def kb(spark):
    rows = [
        ("London", "Q84", 0.875, 43000000.0),
        ("London", "Q2477346", 0.125, 620000.0),
        ("Lancaster", "Q211583", 0.75, 300000.0),
        ("New York City", "Q60", 0.875, 9000000.0),
        ("New York", "Q60", 0.5, 5000000.0),
        ("Sheffield", "Q42448", 0.875, 4000000.0),
        ("Shefneld", "Q42448", 0.125, 1000.0),
        # noisy aliases dropped at load (ranking.py:221-227)
        ("London, Greater London", "Q84", 0.5, 100.0),
        ("London (fictional)", "Q84", 0.5, 100.0),
    ]
    return spark.createDataFrame(rows, "alias string, qid string, relv double, abs_relv double")


def _queries(spark, *surfaces):
    return spark.createDataFrame([(s,) for s in surfaces], "mention string")


def test_clean_aliases_filter_pushdown(kb):
    cleaned = ranking.clean_aliases(kb)
    got = {r["alias"] for r in cleaned.select("alias").distinct().collect()}
    assert "London, Greater London" not in got
    assert "London (fictional)" not in got
    assert "London" in got


def test_perfect_match(spark, kb):
    """ranking.py:286-325 — exact match score 1.0, misses absent."""
    out = ranking.perfect_match(
        _queries(spark, "London", "Lvndon"), ranking.clean_aliases(kb)
    ).collect()
    assert {(r["mention"], r["variation"], r["score"]) for r in out} == {
        ("London", "London", 1.0)
    }


def test_partial_match_containment_golden(spark, kb):
    """tests/test_ranking.py:77-80 — containment('New York',
    'New York City') == 8/13; keep-all-ties top-1."""
    out = ranking.partial_match(
        _queries(spark, "York New"),  # not an exact match; contains nothing
        ranking.clean_aliases(kb),
        damlev=False,
        use_blocking=False,
    ).collect()
    assert out == []  # no containment either direction

    out = ranking.partial_match(
        _queries(spark, "ork Cit"),
        ranking.clean_aliases(kb),
        damlev=False,
        use_blocking=False,
    ).collect()
    # 'ork Cit' ⊂ 'New York City' → 7/13
    assert len(out) == 1
    assert out[0]["variation"] == "New York City"
    assert abs(out[0]["score"] - 7 / 13) < 1e-12


def test_partial_match_damlev_golden(spark, kb):
    """tests/test_ranking.py:55-57 — damlev('Lvndon','London') == 5/6,
    and it is the unique top-1 distinct score."""
    out = ranking.partial_match(
        _queries(spark, "Lvndon"),
        ranking.clean_aliases(kb),
        damlev=True,
        use_blocking=False,
    ).collect()
    best = {r["variation"]: r["score"] for r in out}
    assert set(best) == {"London"}
    assert abs(best["London"] - 5 / 6) < 1e-9


def test_fuzzy_blocked_finds_ocr_variant(spark, kb):
    """The 'Shefiield' → Sheffield golden path
    (tests/test_ranking.py:240-247 analog) through real blocking."""
    cands = ranking.find_candidates(
        _queries(spark, "Shefiield", "London"),
        kb,
        method="fuzzy",
        threshold=0.7,
        top_k=3,
    )
    rows = cands.collect()
    got = {(r["mention"], r["qid"]) for r in rows}
    assert ("Shefiield", "Q42448") in got
    assert ("London", "Q84") in got and ("London", "Q2477346") in got
    # exact match short-circuits at 1.0
    assert {r["score"] for r in rows if r["mention"] == "London"} == {1.0}


def test_embedding_match(spark, kb):
    from t_res_spark.datagen import hashed_ngram_embedding

    kb_clean = ranking.clean_aliases(kb)
    emb_rows = [
        (a, hashed_ngram_embedding(a).tolist())
        for a in [r["alias"] for r in kb_clean.select("alias").distinct().collect()]
    ]
    emb = spark.createDataFrame(emb_rows, "key string, emb array<float>")
    out = ranking.embedding_match(
        _queries(spark, "Shefiield"), kb_clean, emb, threshold=0.5, top_k=3
    ).collect()
    assert any(r["variation"] == "Sheffield" for r in out)


def test_salting_preserves_results(spark, kb):
    q = _queries(spark, "Lvndon", "Shefiield", "Lancastor")
    a = ranking.find_candidates(q, kb, method="fuzzy", salt_factor=1)
    b = ranking.find_candidates(q, kb, method="fuzzy", salt_factor=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_no_forced_broadcast_on_unbounded_sides(spark, kb):
    """Scale guard: neither the alias-surface side of perfect_match nor
    the query-embedding side of embedding_match may carry a broadcast
    hint — both grow with the KB / corpus (10M+ aliases; most surfaces
    miss exact match on OCR-noisy text). AQE is free to promote small
    sides at runtime; what we assert is that the plan doesn't FORCE it."""
    from t_res_spark.datagen import EMB_DIM, hashed_ngram_embedding

    aliases = ranking.clean_aliases(kb)
    queries = _queries(spark, "London", "Lvndon")
    emb_kb = spark.createDataFrame(
        [(r["alias"], hashed_ngram_embedding(r["alias"], EMB_DIM).tolist())
         for r in kb.collect()],
        "key string, emb array<float>",
    )
    for df in (
        ranking.perfect_match(queries, aliases),
        ranking.embedding_match(queries, aliases, emb_kb),
    ):
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, analyzed
        assert "UnresolvedHint" not in analyzed, analyzed


def test_jarowinkler_method_golden(spark, kb):
    """method='jarowinkler' in find_candidates: exact surfaces
    short-circuit at 1.0; the OCR variant scores its JW value
    (jaro_winkler_similarity('shefneld','sheffield') with the 0.7
    boost) and resolves through the alias map."""
    from t_res_spark.functions.similarity import jaro_winkler_similarity

    out = ranking.find_candidates(
        _queries(spark, "Sheffield", "Sheffeild"), kb, method="jarowinkler",
        threshold=0.8,
    )
    rows = {(r["mention"], r["variation"]): r["score"] for r in out.collect()}
    assert rows[("Sheffield", "Sheffield")] == 1.0
    # 'Sheffeild' is NOT a KB alias (no exact short-circuit) but shares
    # the phonetic block with 'Sheffield'
    expected = jaro_winkler_similarity("sheffeild", "sheffield")
    assert abs(rows[("Sheffeild", "Sheffield")] - expected) < 1e-12


def test_classify_ocr_variants(spark):
    """F4 — half-split fuzz.ratio gate (deezy_processing.py:52-85)."""
    pairs = spark.createDataFrame(
        [
            ("sheffield", "shetfield", False),   # OCR variant -> positive
            ("sheffield", "stratford", True),    # dissimilar English -> negative
            ("sheffield", "sheffield", True),    # identical English -> neutral
        ],
        "word string, nn_word string, nn_is_english boolean",
    )
    got = {r["nn_word"]: r["label"] for r in ranking.classify_ocr_variants(pairs).collect()}
    assert got["shetfield"] == "positive"
    assert got["stratford"] == "negative"
    assert got["sheffield"] == "neutral"


def test_classify_ocr_variants_containment_guard(spark):
    """deezy_processing.py:52 — containment pairs are skipped outright,
    never labelled positive/negative."""
    pairs = spark.createDataFrame(
        [("care", "carex", False), ("blackpool", "pool", True)],
        "word string, nn_word string, nn_is_english boolean",
    )
    got = {r["nn_word"]: r["label"] for r in ranking.classify_ocr_variants(pairs).collect()}
    assert got == {"carex": "neutral", "pool": "neutral"}
