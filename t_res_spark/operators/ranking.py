"""Stage 3 — candidate ranking (the reference's Ranker re-expressed).

Method map (reference dispatch: /root/reference/geoparser/ranking.py:609-617):

- ``perfect_match`` (ranking.py:286-325): broadcast hash equi-join of
  distinct mention surfaces against the alias table; match score 1.0.
- ``partial_match`` containment (ranking.py:363-397): blocked theta
  join with a native `instr` predicate, score = length ratio.
- ``partial_match`` damlev (ranking.py:327-361): blocked pair space +
  Arrow-batched pandas UDF computing normalized Damerau-Levenshtein;
  keep-all-ties top-1 via dense_rank (ranking.py:456-465 semantics).
- ``deezy-analog`` (ranking.py:471-568): the DeezyMatch GRU + faiss ANN
  stage becomes hashed char-n-gram embeddings + **native column-math
  cosine** (embeddings are unit vectors, so dot == cosine; computed with
  zip_with/aggregate — whole-stage-codegen, no UDF) over the blocked
  pair space, threshold + top-k per query (W7).

All methods share:
- query dedup before scoring (ranking.py:674 / pipeline.py:682) —
  scoring cost scales with |distinct surfaces|, not |mention instances|;
- alias noise filtering pushed to the scan (ranking.py:216-247);
- variation→QID resolution join (ranking.py:679-705) producing the
  exploded candidate rows (mention, variation, score, qid, relv, abs_relv);
- a persisted candidate-cache anti-join hook (ranking.py:315-316) — see
  ``plans.pipeline`` (J12; doubles as the resumability checkpoint).

Output contract: candidates(mention, variation, score, qid, relv, abs_relv).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.similarity import (
    containment_score,
    damlev_sim_batch,
    dl_sim_batch,
    fuzz_ratio_batch,
    jaro_winkler_batch,
)
from ..functions.text import alias_noise_filter
from .blocking import salted, with_block_keys


@pandas_udf(T.DoubleType())
def damlev_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return damlev_sim_batch(a, b)


@pandas_udf(T.DoubleType())
def dl_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return dl_sim_batch(a, b)


@pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return jaro_winkler_batch(a, b)


@pandas_udf(T.DoubleType())
def fuzz_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return fuzz_ratio_batch(a, b)


def classify_ocr_variants(
    pairs: DataFrame,
    fuzz_ratio_threshold: float = 50.0,
) -> DataFrame:
    """F4 — the reference's fuzz.ratio OCR-variant classifier
    (/root/reference/utils/deezy_processing.py:52-85), re-expressed as
    one DataFrame pass.

    Input: pairs(word, nn_word, nn_is_english). Each word is split in
    half (native substring math); the two half-ratios gate the label:

    - ``positive`` (an OCR variation): nn_word is NOT an English word
      and both half-ratios exceed the threshold;
    - ``negative``: nn_word IS English, both half-ratios are below
      100 - threshold, and the lengths differ by ≤ 2;
    - ``neutral`` otherwise (the reference simply skips these).

    The halves are computed as columns so the only Python is the
    Arrow-batched fuzz_ratio kernel on the half strings."""
    half_w = (F.length("word") / 2).cast("int")
    half_n = (F.length("nn_word") / 2).cast("int")
    scored = (
        pairs.withColumn("w1", F.substring(F.col("word"), 1, half_w))
        .withColumn("w2", F.col("word").substr(half_w + 1, F.length("word")))
        .withColumn("n1", F.substring(F.col("nn_word"), 1, half_n))
        .withColumn("n2", F.col("nn_word").substr(half_n + 1, F.length("nn_word")))
        .withColumn("r1", fuzz_ratio_udf("n1", "w1"))
        .withColumn("r2", fuzz_ratio_udf("n2", "w2"))
    )
    thr = F.lit(fuzz_ratio_threshold)
    len_diff = F.length("word") - F.length("nn_word")
    # the reference skips containment pairs outright
    # (deezy_processing.py:52: 'not nn_word in word and not word in
    # nn_word') — suffix/prefix extensions must never become examples
    contained = (F.instr("word", F.col("nn_word")) > 0) | (
        F.instr("nn_word", F.col("word")) > 0
    )
    return scored.withColumn(
        "label",
        F.when(contained, F.lit("neutral"))
        .when(
            (~F.col("nn_is_english")) & (F.col("r1") > thr) & (F.col("r2") > thr),
            F.lit("positive"),
        )
        .when(
            F.col("nn_is_english")
            & (F.col("r1") < 100 - thr)
            & (F.col("r2") < 100 - thr)
            & (len_diff >= -2)
            & (len_diff <= 2),
            F.lit("negative"),
        )
        .otherwise(F.lit("neutral")),
    ).select("word", "nn_word", "nn_is_english", "r1", "r2", "label")


def clean_aliases(aliases: DataFrame) -> DataFrame:
    """Load-time alias noise filter (ranking.py:216-247). Written as a
    filter directly over the scan so Catalyst pushes it into the parquet
    reader (verified: shows up in PushedFilters)."""
    return aliases.filter(alias_noise_filter(F.col("alias")))


def perfect_match(queries: DataFrame, aliases: DataFrame) -> DataFrame:
    """J1 — exact surface match, score 1.0 (ranking.py:286-325).

    ``queries`` is the distinct mention surface table (one column
    ``mention``). No broadcast hint: a real KB has tens of millions of
    alias surfaces (hundreds of MB per executor + a driver collect if
    forced), so the join strategy is left to AQE — it broadcasts when
    the side is actually small and sort-merges otherwise."""
    alias_surfaces = aliases.select(F.col("alias").alias("variation")).distinct()
    return (
        queries.join(
            alias_surfaces,
            queries["mention"] == alias_surfaces["variation"],
            "inner",
        )
        .withColumn("score", F.lit(1.0))
        .select("mention", "variation", "score")
    )


def _blocked_pairs(
    queries: DataFrame, aliases: DataFrame, salt_factor: int = 8
) -> DataFrame:
    """(mention, variation) candidate pair space via block keys + salt."""
    m = with_block_keys(queries.select("mention"), "mention")
    a = with_block_keys(
        aliases.select(F.col("alias")).distinct(), "alias"
    ).withColumnRenamed("alias", "variation")
    m_s, a_s = salted(m, a.withColumnRenamed("variation", "alias"), salt_factor)
    a_s = a_s.withColumnRenamed("alias", "variation")
    pairs = m_s.join(a_s, ["block_key", "block_salt"], "inner")
    # a pair may share both keys — dedup before scoring
    return pairs.select("mention", "variation").distinct()


def partial_match(
    queries: DataFrame,
    aliases: DataFrame,
    damlev: bool,
    salt_factor: int = 8,
    use_blocking: bool = True,
) -> DataFrame:
    """J2/J3 — containment or Damerau-Levenshtein partial match with the
    reference's keep-all-ties top-1 (ranking.py:399-469).

    Semantics: surfaces that perfect-match are returned with score 1.0
    and skip fuzzy scoring (the reference's `remainers` logic,
    ranking.py:441-444); every other surface is scored against the
    blocked alias space and keeps only its best distinct score
    (ties all kept — dense_rank == 1 reproduces `[:1]` of sorted unique
    scores, ranking.py:456-465).

    ``use_blocking=False`` reproduces the reference's unblocked full
    scan for small KBs (parity testing only — never at scale).
    """
    exact = perfect_match(queries, aliases)
    missed = queries.join(exact.select("mention"), "mention", "left_anti")

    if use_blocking:
        pairs = _blocked_pairs(missed, aliases, salt_factor)
    else:
        pairs = missed.crossJoin(
            aliases.select(F.col("alias").alias("variation")).distinct()
        )

    if damlev:
        scored = pairs.withColumn(
            "score", damlev_sim_udf(F.col("mention"), F.col("variation"))
        )
    else:
        scored = pairs.withColumn(
            "score", containment_score(F.col("mention"), F.col("variation"))
        ).filter(F.col("score").isNotNull())

    w = Window.partitionBy("mention").orderBy(F.desc("score"))
    top1 = (
        scored.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    return exact.unionByName(top1.select("mention", "variation", "score"))


def cosine_score(emb_a, emb_b):
    """Native dot product of unit vectors (cosine) — zip_with + aggregate,
    stays inside whole-stage codegen; the Spark-first replacement for the
    reference's faiss cosine (ranking.py:549-562)."""
    return F.aggregate(
        F.zip_with(emb_a, emb_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embedding_match(
    queries: DataFrame,
    aliases: DataFrame,
    embeddings_kb: DataFrame,
    threshold: float = 0.75,
    top_k: int = 3,
    salt_factor: int = 8,
) -> DataFrame:
    """J4 — the DeezyMatch-analog ANN join (ranking.py:471-568).

    Query surfaces missing an exact match are compared to blocked alias
    candidates by embedding cosine; ``score = cosine`` (the reference's
    ``1 - dist`` cosine branch, ranking.py:558-562), thresholded and
    top-k'd per query with deterministic (score desc, variation asc)
    tie-break.

    Query-side embeddings are computed on the fly with the same hashed
    n-gram encoder used for the KB (datagen.hashed_ngram_embedding) via
    an Arrow-batched UDF; KB-side embeddings come from the embeddings
    table (equi-join, not point queries — S6)."""
    from ..datagen import EMB_DIM, hashed_ngram_embedding

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(s: pd.Series) -> pd.Series:
        return s.astype(str).map(lambda x: hashed_ngram_embedding(x, EMB_DIM).tolist())

    exact = perfect_match(queries, aliases)
    missed = queries.join(exact.select("mention"), "mention", "left_anti")
    pairs = _blocked_pairs(missed, aliases, salt_factor)

    q_emb = missed.select("mention").withColumn("q_emb", embed_udf("mention"))
    kb = embeddings_kb.select(
        F.col("key").alias("variation"), F.col("emb").alias("v_emb")
    )
    # No broadcast hint on q_emb: on OCR-noisy corpora most surfaces
    # miss the exact match, so this side grows with the corpus — AQE
    # promotes it to broadcast only when actually small.
    scored = (
        pairs.join(q_emb, "mention")
        .join(kb, "variation", "inner")
        .withColumn("score", cosine_score(F.col("q_emb"), F.col("v_emb")))
        .filter(F.col("score") >= F.lit(threshold))
    )
    w = Window.partitionBy("mention").orderBy(F.desc("score"), F.asc("variation"))
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("mention", "variation", "score")
    )
    return exact.unionByName(topk)


def resolve_candidates(matches: DataFrame, aliases: DataFrame) -> DataFrame:
    """J5 — variation → {qid: relv} resolution (ranking.py:679-705),
    exploded to rows instead of the reference's 3-level dict."""
    return matches.join(
        aliases.select(
            F.col("alias").alias("variation"), "qid", "relv", "abs_relv"
        ),
        "variation",
        "inner",
    ).select("mention", "variation", "score", "qid", "relv", "abs_relv")


def _blocked_udf_match(
    queries: DataFrame,
    aliases: DataFrame,
    score_udf,
    threshold: float,
    top_k: int,
    salt_factor: int,
) -> DataFrame:
    """Shared shape of the UDF-scored methods: exact short-circuit +
    blocked pair space + Arrow-batched score + threshold + deterministic
    top-k per query surface."""
    exact = perfect_match(queries, aliases)
    missed = queries.join(exact.select("mention"), "mention", "left_anti")
    pairs = _blocked_pairs(missed, aliases, salt_factor)
    scored = pairs.withColumn(
        "score", score_udf(F.col("mention"), F.col("variation"))
    ).filter(F.col("score") >= F.lit(threshold))
    w = Window.partitionBy("mention").orderBy(F.desc("score"), F.asc("variation"))
    topk = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("mention", "variation", "score")
    )
    return exact.unionByName(topk)


def find_candidates(
    queries: DataFrame,
    aliases: DataFrame,
    embeddings_kb: DataFrame | None = None,
    method: str = "fuzzy",
    threshold: float = 0.7,
    top_k: int = 3,
    salt_factor: int = 8,
) -> DataFrame:
    """Method dispatch (ranking.py:609-617 analog) → resolved candidates.

    ``fuzzy`` (the engine default; DeezyMatch role): exact short-circuit
    + blocked Damerau-Levenshtein with threshold + top-k — the string
    measure the north star names, cheap enough without an ANN model.
    ``jarowinkler``: same shape with the Jaro-Winkler measure (the other
    measure the north star names; reference ANN role,
    /root/reference/geoparser/ranking.py:471-568). JW thresholds run
    higher than DL — 0.85+ is typical for OCR variants.
    """
    aliases = clean_aliases(aliases)
    if method == "perfectmatch":
        matches = perfect_match(queries, aliases)
    elif method == "partialmatch":
        matches = partial_match(queries, aliases, damlev=False, salt_factor=salt_factor)
    elif method == "levenshtein":
        matches = partial_match(queries, aliases, damlev=True, salt_factor=salt_factor)
    elif method == "embcosine":
        assert embeddings_kb is not None
        matches = embedding_match(
            queries, aliases, embeddings_kb, threshold, top_k, salt_factor
        )
    elif method == "fuzzy":
        matches = _blocked_udf_match(
            queries, aliases, damlev_sim_udf, threshold, top_k, salt_factor
        )
    elif method == "jarowinkler":
        matches = _blocked_udf_match(
            queries, aliases, jaro_winkler_udf, threshold, top_k, salt_factor
        )
    else:
        raise ValueError(f"unknown ranking method: {method}")
    return resolve_candidates(matches, aliases)
