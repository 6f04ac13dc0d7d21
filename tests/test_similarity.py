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
