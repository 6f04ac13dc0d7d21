"""Golden-scalar tests for the similarity kernels — constants lifted
from the reference suite where semantics carry over
(/root/reference/tests/test_ranking.py, tests/test_linking.py)."""

import math

from t_res_spark.functions.similarity import (
    damlev_similarity,
    dl_distance,
    dl_similarity,
    jaro_winkler_similarity,
    osa_distance,
)


def test_damlev_golden():
    # /root/reference/tests/test_ranking.py:55-57 (float32-rounded there)
    assert abs(damlev_similarity("Lvndon", "London") - 5 / 6) < 1e-9
    assert damlev_similarity("apple", "apple") == 1.0
    # reference docstring example ranking.py:355-357: 1 - 5/6
    assert abs(damlev_similarity("apple", "orange") - (1 - 5 / 6)) < 1e-9


def test_osa_transposition():
    assert osa_distance("ab", "ba") == 1
    assert osa_distance("ca", "abc") == 3  # OSA restriction
    assert dl_distance("ca", "abc") == 2  # unrestricted DL


def test_dl_similarity_case_insensitive():
    assert dl_similarity("LONDON", "london") == 1.0
    assert dl_similarity("", "") == 1.0


def test_jaro_winkler_basics():
    assert jaro_winkler_similarity("london", "london") == 1.0
    assert jaro_winkler_similarity("", "x") == 0.0
    # prefix boost applies above 0.7 threshold
    jw = jaro_winkler_similarity("sheffield", "shefiield")
    assert 0.9 < jw < 1.0
    assert math.isclose(
        jaro_winkler_similarity("dixon", "dicksonx"),
        0.8133333333333332,
        rel_tol=1e-9,
    )


def test_fuzz_ratio_goldens():
    """F4 — Indel-normalized ratio, rapidfuzz semantics (exact rational,
    no rounding): 100 * 2*LCS / (len1+len2)."""
    from t_res_spark.functions.similarity import fuzz_ratio

    assert fuzz_ratio("", "") == 100.0
    assert fuzz_ratio("abc", "abc") == 100.0
    assert fuzz_ratio("abc", "") == 0.0
    # thefuzz/rapidfuzz canonical example: LCS=14, lens 14+15
    assert abs(fuzz_ratio("this is a test", "this is a test!") - 2800 / 29) < 1e-12
    # one substitution in the middle: LCS=5, lens 6+6
    assert fuzz_ratio("london", "lvndon") == 1000 / 12


def test_lr_confidence_golden(spark):
    """ML6 — sigmoid(a*x+b) closed form (entity_disambiguation.py:473-494)."""
    import math

    from pyspark.sql import functions as F

    from t_res_spark.operators.linking import lr_confidence

    df = spark.createDataFrame([(0.5,), (1.0,), (0.0,)], "s double")
    got = {r["s"]: r["c"] for r in df.select("s", lr_confidence(F.col("s")).alias("c")).collect()}
    assert abs(got[0.5] - 0.5) < 1e-12
    assert abs(got[1.0] - 1 / (1 + math.exp(-3.0))) < 1e-12
    assert abs(got[0.0] - 1 / (1 + math.exp(3.0))) < 1e-12


def test_xxh64_matches_spark(spark):
    """The from-spec python XXH64 (functions/xxh64.py — used to author
    the d3/d3b golden oracles) is bit-exact vs Spark's builtin
    xxhash64 (seed 42) across every length branch (empty, <4, <8,
    tail bytes, 4-byte word, 8-byte word, >=32 stripe) and unicode."""
    from pyspark.sql import functions as F

    from t_res_spark.functions.xxh64 import xxh64_str

    cases = [
        "", "a", "ab", "abc", "abcd", "hello", "hello world",
        "x" * 7, "y" * 8, "z" * 15, "w" * 16, "q" * 31, "m" * 32,
        "n" * 33, "long text " * 10, "Łódź İstanbul 北京", "nation_5",
    ]
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for c in cases:
        assert xxh64_str(c) == got[c], repr(c)
