"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the t_res_spark engine operators (SURVEY.md §2)
over the driver-generated testdata tables; ``oracle_sql()`` carries the
DuckDB-dialect equivalents. The ER-shaped queries derive a deterministic
mention/alias workload from the `customer`/`nation` tables (pure SQL
transforms mirrored exactly on both sides); `documents`/`embeddings`
feed the dedup / similarity-search / text-analysis operators.

Float discipline: every oracle-checked value column is either (a) pure
integer-derived doubles (exact in binary, order-insensitive sums), or
(b) IEEE expressions evaluated in the same operation order on both
engines — no transcendentals, no engine-divergent rounding.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# shared derivations (identical SQL text runs on Spark and DuckDB)
# ---------------------------------------------------------------------------

# alias knowledge base derived from nation: canonical + vowel-rotated
# OCR variant (analog of mentions_to_wikidata, ranking.py:202-214);
# relv/abs_relv are exact-binary-fraction doubles.
ALIASES_SQL = """
SELECT lower(n_name) AS alias,
       'Q' || CAST(n_nationkey AS STRING) AS qid,
       (n_nationkey % 8 + 1) / 8 AS relv,
       CAST((n_nationkey + 1) * 100 AS DOUBLE) AS abs_relv
FROM nation
UNION ALL
SELECT translate(lower(n_name), 'aeiou', 'eioua') AS alias,
       'Q' || CAST(n_nationkey AS STRING) AS qid,
       (n_nationkey % 4 + 1) / 16 AS relv,
       CAST((n_nationkey + 1) * 25 AS DOUBLE) AS abs_relv
FROM nation
"""

# mention instances derived from customer: exact surface / known OCR
# variant / unseen left-chop corruption (fuzzy path) / NIL junk
MENTIONS_SQL = """
SELECT c_custkey AS mention_id,
       CASE CAST(c_custkey % 4 AS INT)
         WHEN 0 THEN lower(n_name)
         WHEN 1 THEN translate(lower(n_name), 'aeiou', 'eioua')
         WHEN 2 THEN substr(lower(n_name), 1, length(n_name) - 1)
         ELSE 'zz' || lower(c_mktsegment)
       END AS mention
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""

# exact-match resolved candidates (J1+J5): mention surfaces ⋈ alias KB
CANDIDATES_SQL = f"""
SELECT m.mention, a.alias AS variation, CAST(1.0 AS DOUBLE) AS score,
       a.qid, a.relv, a.abs_relv
FROM (SELECT DISTINCT mention FROM ({MENTIONS_SQL})) m
JOIN ({ALIASES_SQL}) a ON m.mention = a.alias
"""

# synthetic gazetteer coordinates per entity — exact binary fractions
# (halves/sixteenths), so distance math is bit-stable
COORDS_SQL = """
SELECT 'Q' || CAST(n_nationkey AS STRING) AS qid,
       CAST((n_nationkey * 37) % 140 - 70 AS DOUBLE) + (n_nationkey % 8) / 16 AS lat,
       CAST((n_nationkey * 53) % 360 - 180 AS DOUBLE) + (n_nationkey % 16) / 32 AS lon
FROM nation
"""


def _aliases_df(spark: SparkSession) -> DataFrame:
    return spark.sql(ALIASES_SQL)


def _mentions_df(spark: SparkSession) -> DataFrame:
    return spark.sql(MENTIONS_SQL)


def _candidates_df(spark: SparkSession) -> DataFrame:
    return spark.sql(CANDIDATES_SQL)


# ---------------------------------------------------------------------------
# ER-pipeline queries (engine operators over the derived workload)
# ---------------------------------------------------------------------------


def q_s2_alias_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — load-time alias noise filter (ranking.py:216-247),
    pushed to the scan by Catalyst."""
    from t_res_spark.operators.ranking import clean_aliases

    _register(spark, sf_dir)
    noisy = spark.sql(
        """
        SELECT CASE CAST(p_partkey % 5 AS INT)
                 WHEN 0 THEN p_name || ', junk'
                 WHEN 1 THEN p_name || ' (old'
                 ELSE p_name
               END AS alias,
               'Q' || CAST(p_partkey AS STRING) AS qid
        FROM part
        """
    )
    return clean_aliases(noisy).select("alias", "qid")


def q_j1_perfect_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — broadcast hash equi-join exact match, score 1.0
    (ranking.py:286-325)."""
    from t_res_spark.operators.ranking import perfect_match

    _register(spark, sf_dir)
    queries = _mentions_df(spark).select("mention").distinct()
    return perfect_match(queries, _aliases_df(spark)).select(
        "mention", "variation", "score"
    )


def q_j2_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — containment partial match, score = length ratio
    (ranking.py:363-397)."""
    from t_res_spark.operators.ranking import partial_match

    _register(spark, sf_dir)
    queries = spark.sql("SELECT DISTINCT lower(n_name) AS mention FROM nation")
    gaz = spark.sql(
        """
        SELECT 'port of ' || lower(n_name) AS alias,
               'Q' || CAST(n_nationkey AS STRING) AS qid,
               CAST(1.0 AS DOUBLE) AS relv, CAST(1.0 AS DOUBLE) AS abs_relv
        FROM nation
        """
    )
    return partial_match(queries, gaz, damlev=False, use_blocking=False).select(
        "mention", "variation", "score"
    )


def q_j3_fuzzy_damlev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — Damerau-Levenshtein fuzzy join for surfaces with no exact
    match (ranking.py:327-361): Arrow-batched pandas UDF kernel,
    keep-all-ties top-1 via dense_rank (ranking.py:456-465)."""
    from pyspark.sql import Window

    from t_res_spark.operators.ranking import dl_sim_udf, perfect_match

    _register(spark, sf_dir)
    queries = _mentions_df(spark).select("mention").distinct()
    aliases = _aliases_df(spark)
    exact = perfect_match(queries, aliases)
    missed = queries.join(exact.select("mention"), "mention", "left_anti")
    pairs = missed.crossJoin(
        aliases.select(F.col("alias").alias("variation")).distinct()
    )
    scored = pairs.withColumn(
        "score", dl_sim_udf(F.col("mention"), F.col("variation"))
    ).filter(F.col("score") >= 0.7)
    w = Window.partitionBy("mention").orderBy(F.desc("score"))
    return (
        scored.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") == 1)
        .select("mention", "variation", "score")
    )


def q_a2_most_popular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — most-popular disambiguation (linking.py:216-264):
    argmax abs relevance, link_score = max/total."""
    from t_res_spark.operators.linking import most_popular

    _register(spark, sf_dir)
    return most_popular(_candidates_df(spark)).select(
        "mention", "prediction", "link_score"
    )


def q_a5_rank_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — REL-prep candidate scoring (rel_utils.py:180-231) with the
    (score, qid)-desc tie-break (rel_utils.py:227)."""
    from t_res_spark.operators.linking import rank_candidates

    _register(spark, sf_dir)
    return rank_candidates(_candidates_df(spark), round_dp=None).select(
        "mention", "variation", "qid", "qc_score", "cand_rank"
    )


def q_f5_bydistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5-shape — by-distance disambiguation (linking.py:266-330) with a
    squared-degree surrogate metric (bit-stable across engines; the
    haversine path is covered by unit tests with golden values)."""
    from pyspark.sql import Window

    _register(spark, sf_dir)
    cands = _candidates_df(spark)
    coords = spark.sql(COORDS_SQL)
    origins = spark.sql(
        f"""
        SELECT m.mention, 'Q' || CAST(CAST(xmin % 25 AS INT) AS STRING) AS origin_qid
        FROM (SELECT mention, min(mention_id) AS xmin
              FROM ({MENTIONS_SQL}) GROUP BY mention) m
        """
    )
    ocoords = coords.select(
        F.col("qid").alias("origin_qid"),
        F.col("lat").alias("olat"),
        F.col("lon").alias("olon"),
    )
    scored = (
        cands.join(F.broadcast(coords), "qid")
        .join(origins, "mention")
        .join(F.broadcast(ocoords), "origin_qid")
        .withColumn(
            "dist2",
            (F.col("lat") - F.col("olat")) * (F.col("lat") - F.col("olat"))
            + (F.col("lon") - F.col("olon")) * (F.col("lon") - F.col("olon")),
        )
    )
    w = Window.partitionBy("mention").orderBy(
        F.asc("dist2"), F.asc("qid"), F.asc("variation")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("mention", F.col("qid").alias("prediction"), "dist2")
    )


def q_w1_top1_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — keep-all-ties top-1 (dense_rank) per group
    (ranking.py:456-465 semantics on a generic table)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_quantity FROM (
          SELECT l_orderkey, l_partkey, l_quantity,
                 dense_rank() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_quantity DESC) AS rnk
          FROM lineitem
        ) WHERE rnk = 1
        """
    )


def q_w2_top7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — top-7 truncation per group (pipeline.py:348-353)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders
        ) WHERE rn <= 7
        """
    )


def q_w10_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — prev/next context via lag/lead over stable ordering
    (pipeline.py:467-471; the input_hint ordering invariant)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, user_id, event_type,
               lag(event_type)  OVER w AS prev_type,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )


def q_m4_edges_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — star-edge construction (clustering stage 5): connect each
    member to its group min (map-side-combinable)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT src, dst FROM (
          SELECT o_orderkey AS src,
                 min(o_orderkey) OVER (PARTITION BY o_custkey) AS dst
          FROM orders
        ) WHERE src <> dst
        """
    )


def q_j12_anti_join_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — memo-cache anti-join (ranking.py:315-316): only surfaces
    missing from the candidate cache go to scoring."""
    _register(spark, sf_dir)
    queries = _mentions_df(spark).select("mention").distinct()
    cache = _aliases_df(spark).filter(
        (F.regexp_extract("qid", "Q(\\d+)", 1).cast("int") % 2) == 0
    )
    return queries.join(
        cache.select(F.col("alias").alias("mention")).distinct(),
        "mention",
        "left_anti",
    )


def q_j9_decorate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/J10 — metadata-enrichment join (pipeline.py:358-385): linked
    mention instances decorated with gazetteer coordinates + entity
    class; NIL/missing predictions keep NULL decoration. lr_conf is
    excluded from the gate select (exp() is not bit-identical across
    engines' libm); link_score is an exact binary fraction."""
    from t_res_spark.operators.linking import link_mentions, most_popular

    _register(spark, sf_dir)
    mentions = _mentions_df(spark).select(
        F.col("mention_id").cast("string").alias("mention_id"), "mention"
    )
    preds = most_popular(_candidates_df(spark))
    entities = spark.sql(COORDS_SQL).withColumn(
        "wkdt_class",
        F.concat(
            F.lit("C"),
            (F.regexp_extract("qid", "Q(\\d+)", 1).cast("int") % 5).cast("string"),
        ),
    )
    return link_mentions(mentions, preds, entities=entities).select(
        "mention_id", "mention", "prediction", "link_score",
        "lat", "lon", "wkdt_class",
    )


def q_opt_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew pattern — salted two-phase aggregation (SURVEY §4 hot-key
    row): partial agg on (key, salt), final agg on key; result must be
    identical to the plain aggregation the oracle runs."""
    _register(spark, sf_dir)
    orders = spark.table("orders")
    salted = orders.withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(16)).cast("int")
    )
    partial = salted.groupBy("o_custkey", "salt").agg(
        F.count(F.lit(1)).alias("c"), F.sum("o_orderkey").alias("s")
    )
    return partial.groupBy("o_custkey").agg(
        F.sum("c").alias("n_orders"), F.sum("s").alias("sum_orderkey")
    )


def q_j6_align_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — pred↔gold span alignment by max char overlap (range join +
    window, experiment.py:404-416). Spans derived from lineitem line
    numbers; every arithmetic is integer."""
    from t_res_spark.operators.alignment import align_spans

    _register(spark, sf_dir)
    pred = spark.sql(
        """
        SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
               'p' || CAST(l_linenumber AS STRING) AS mention,
               l_linenumber * 10 AS start_char,
               l_linenumber * 10 + 8 AS end_char
        FROM lineitem WHERE l_linenumber <= 3
        """
    )
    gold = spark.sql(
        """
        SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
               'g' || CAST(l_linenumber AS STRING) AS gold_mention,
               l_linenumber * 10 + CAST(l_partkey % 6 AS INT) AS gold_start,
               l_linenumber * 10 + CAST(l_partkey % 6 AS INT) + 7 AS gold_end,
               'Q' || CAST(l_partkey AS STRING) AS gold_qid
        FROM lineitem WHERE l_linenumber <= 2
        """
    )
    return align_spans(pred, gold).select(
        "conv_id", "mention", "start_char", "gold_mention", "gold_qid", "overlap_chars"
    )


def q_a6_cross_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — min-max rescale + ratio-over-sum per mention
    (entity_disambiguation.py:432-457). Scores are multiples of 256 so
    every rescaled quotient and sum is an exact binary fraction."""
    from t_res_spark.operators.alignment import cross_cand_normalize

    _register(spark, sf_dir)
    scored = spark.sql(
        f"""
        SELECT mention, qid,
               CAST((CAST(regexp_extract(qid, 'Q(\\\\d+)', 1) AS INT) % 4) * 256 AS DOUBLE)
                 AS raw_score
        FROM (SELECT DISTINCT mention, qid FROM ({CANDIDATES_SQL}))
        """
    )
    return cross_cand_normalize(scored).select("mention", "qid", "norm_score")


def q_w8_alias_casing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 — lowercase-dedup keeping the casing with most entities
    (deezy_processing.py:346-368)."""
    from t_res_spark.operators.alignment import dedup_alias_casing

    _register(spark, sf_dir)
    cased = spark.sql(
        """
        SELECT CASE CAST(c_custkey % 3 AS INT)
                 WHEN 0 THEN lower(n_name)
                 WHEN 1 THEN upper(n_name)
                 ELSE n_name
               END AS alias,
               'Q' || CAST(CAST(c_custkey % 40 AS INT) AS STRING) AS qid
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        """
    ).distinct()
    return dedup_alias_casing(cased).select("alias", "qid")


def q_a7_pairwise_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — the distributed pairwise-F1 evaluator (the BASELINE.json
    metric; counting shape of entity_disambiguation.py:1074-1104).
    Clusters come from exact-match most-popular predictions; labeled
    pairs are consecutive customers with truth = same nation."""
    from t_res_spark.operators.alignment import evaluate_pairwise_f1
    from t_res_spark.operators.linking import most_popular

    _register(spark, sf_dir)
    mentions = _mentions_df(spark)
    preds = most_popular(_candidates_df(spark))
    clusters = (
        mentions.join(preds, "mention", "inner")
        .select(
            F.col("mention_id").cast("string").alias("mention_id"),
            F.col("prediction").alias("cluster_id"),
        )
    )
    pairs = spark.sql(
        """
        SELECT 'k' AS block_key,
               CAST(a.c_custkey AS STRING) AS mention_id_a,
               CAST(b.c_custkey AS STRING) AS mention_id_b,
               a.c_nationkey = b.c_nationkey AS same_entity
        FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
        """
    )
    return evaluate_pairwise_f1(clusters, pairs)


# spacing/hyphen variants of canonical surfaces: norm-key-blockable
# mention workload for the blocked fuzzy path (J3b)
VARIANT_MENTIONS_SQL = """
SELECT DISTINCT CASE CAST(c_custkey % 2 AS INT)
         WHEN 0 THEN replace(lower(n_name), ' ', '')
         ELSE replace(lower(n_name), ' ', '-')
       END AS mention
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_j3b_blocked_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3b — the BLOCKED fuzzy path, oracle-checked: norm-key blocking
    (RE2-expressible — mirrored in DuckDB) + salted co-location join +
    Arrow-batched DL scoring + keep-all-ties top-1. Unlike q_j3 (which
    cross-joins for oracle parity), this drives the engine's actual
    scale path: only pairs sharing a block key are ever scored."""
    from pyspark.sql import Window

    from t_res_spark.operators.blocking import salted, with_block_keys
    from t_res_spark.operators.ranking import dl_sim_udf

    _register(spark, sf_dir)
    mentions = spark.sql(VARIANT_MENTIONS_SQL)
    aliases = spark.sql(f"SELECT DISTINCT alias FROM ({ALIASES_SQL})")
    m = with_block_keys(mentions, "mention").filter(
        F.col("block_key").startswith("n:")
    )
    a = with_block_keys(aliases, "alias").filter(
        F.col("block_key").startswith("n:")
    )
    m_s, a_s = salted(m, a, salt_factor=8)
    pairs = (
        m_s.join(a_s, ["block_key", "block_salt"])
        .select("mention", F.col("alias").alias("variation"))
        .distinct()
    )
    scored = pairs.withColumn(
        "score", dl_sim_udf(F.col("mention"), F.col("variation"))
    ).filter(F.col("score") >= 0.5)
    w = Window.partitionBy("mention").orderBy(F.desc("score"))
    return (
        scored.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") == 1)
        .select("mention", "variation", "score")
    )


# --- fixed literal fixtures for the golden-VALUES oracles (VERDICT
# r03 #4). Expected outputs are generated by tools/make_goldens_r4.py
# with the SAME python kernels the Arrow UDFs execute; DuckDB's own
# jaro_winkler / Indel / libm variants are thereby taken out of the
# loop while the DISTRIBUTED plumbing (blocking, salting, top-k,
# resolve joins, window tie-breaks) stays value-gated end-to-end.
J4B_ALIASES = [
    ("london", "Q84", 0.5, 100.0),
    ("londinium", "Q84", 0.25, 50.0),
    ("amsterdam", "Q727", 0.5, 80.0),
    ("new york", "Q60", 0.75, 120.0),
    ("paris", "Q90", 0.5, 90.0),
    ("pares", "Q90", 0.125, 10.0),
]
# exact hit / vowel-OCR variants (phonetic-blockable) / consonant break
# (legitimately unblockable) / multi-variation surface / junk
J4B_MENTIONS = [
    "london", "landon", "amsterdem", "nev york", "paris", "pariis", "qq"
]


def q_j4b_jarowinkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b — Jaro-Winkler as a first-class find_candidates method
    (the reference ANN role names JW, ranking.py:471-568), ORACLE-GATED
    via golden VALUES (VERDICT r03 #4): the real blocked+salted+top-k
    operator runs over a fixed mention/alias fixture whose expected
    output is precomputed with the engine's own JW kernel (DuckDB's
    jaro_winkler is the rapidfuzz non-greedy variant — recomputation
    in SQL stays impossible; kernel goldens in tests/test_similarity)."""
    from t_res_spark.operators.ranking import find_candidates

    _register(spark, sf_dir)
    queries = spark.createDataFrame(
        [(m,) for m in J4B_MENTIONS], "mention string"
    )
    aliases = spark.createDataFrame(
        J4B_ALIASES, "alias string, qid string, relv double, abs_relv double"
    )
    return find_candidates(queries, aliases, method="jarowinkler", threshold=0.85)


F4_PAIRS = [
    # OCR vowel/char noise, non-English neighbour, both halves similar
    ("sheffield", "shefiield", False),   # positive
    ("liverpool", "levirpaol", False),   # positive (vowel scramble)
    ("birmingham", "bermingam", False),  # positive-ish — kernel decides
    # English neighbour, both halves dissimilar, |len diff| <= 2
    ("london", "zigzag", True),          # negative
    ("bristol", "quamvy", True),         # negative-ish
    # containment pairs are skipped outright (reference rule)
    ("london", "londonx", True),         # neutral (containment)
    ("don", "london", False),            # neutral (contained)
    # mixed half-ratios / wrong english flag → neutral
    ("london", "landon", True),
    ("london", "lndn", False),
    ("bristol", "xy", True),             # len gate blocks negative
]


def q_f4_ocr_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — fuzz.ratio OCR-variant classification
    (deezy_processing.py:52-85): half-split Indel ratios gate
    positive/negative labels. ORACLE-GATED via golden VALUES (VERDICT
    r03 #4) over a fixed pair fixture that exercises every branch —
    positive, negative, containment-neutral, mixed-ratio neutral, and
    the ±2 length gate; expected ratios/labels precomputed with the
    engine's fuzz_ratio kernel (Indel has no DuckDB analog —
    recomputation in SQL stays impossible; kernel goldens in
    tests/test_similarity)."""
    from t_res_spark.operators.ranking import classify_ocr_variants

    _register(spark, sf_dir)
    pairs = spark.createDataFrame(
        F4_PAIRS, "word string, nn_word string, nn_is_english boolean"
    )
    return classify_ocr_variants(pairs)


def q_a1_alias_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — alias-map inversion with per-QID normalized relevance
    (wikidata_to_mentions orientation, geoparser/ranking.py:154-184)."""
    from t_res_spark.operators.linking import invert_alias_map

    _register(spark, sf_dir)
    return invert_alias_map(_aliases_df(spark))


def q_j7_align_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — B-/I-/O position-rule token labelling
    (process_data.py:130-196): tokens built so all three labels occur
    (start==gold_start → B-, inside → I-, overhang/no-span → O)."""
    from t_res_spark.operators.alignment import align_gold_tokens

    _register(spark, sf_dir)
    tokens = spark.sql(
        """
        SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
               l_linenumber * 10 + CASE WHEN l_partkey % 7 = 0 THEN 7
                                        ELSE CAST(l_partkey % 3 AS INT) END AS tok_start,
               l_linenumber * 10 + CASE WHEN l_partkey % 7 = 0 THEN 7
                                        ELSE CAST(l_partkey % 3 AS INT) END + 3 AS tok_end
        FROM lineitem WHERE l_linenumber <= 4
        """
    )
    gold = spark.sql(
        """
        SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
               l_linenumber * 10 AS gold_start,
               l_linenumber * 10 + 8 AS gold_end,
               'loc' AS gold_type,
               'Q' || CAST(CAST(l_partkey % 50 AS INT) AS STRING) AS gold_qid
        FROM lineitem WHERE l_linenumber <= 3
        """
    )
    return align_gold_tokens(tokens, gold)


# stringified list-of-dict experiment rows (the reference's TSV batch
# shape, process_data.py:47-128) — built identically on both engines;
# only Spark PARSES it (from_json), the oracle constructs the expected
# output rows directly.
ANNOT_ROWS_SQL = """
SELECT c_custkey AS article_id,
       '[{"sentence_pos":1,"sentence_text":"' || lower(n_name)
         || ' one"},{"sentence_pos":2,"sentence_text":"' || lower(n_name)
         || ' two"}]' AS sentences,
       '[{"sent_pos":1,"mention":"' || lower(n_name)
         || '","entity_type":"LOC","wkdt_qid":'
         || CASE CAST(c_custkey % 3 AS INT)
              WHEN 0 THEN '"*"'
              WHEN 1 THEN 'null'
              ELSE '"Q' || CAST(c_nationkey AS STRING) || '"'
            END
         || ',"mention_start":0,"mention_end":5}]' AS annotations
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def q_m1_parse_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/S7 — from_json parse of stringified sentences/annotations
    list-of-dict columns + double explode + sent_pos join
    (process_data.py:18-128), incl. the NIL rule for '*'/non-string
    links. The oracle builds the expected rows directly — the parse
    itself is what's under test."""
    from t_res_spark.sources.ingest import annotated_sentences

    _register(spark, sf_dir)
    rows = spark.sql(ANNOT_ROWS_SQL)
    return annotated_sentences(rows).select(
        "article_id", "sent_pos", "sentence_text", "mention",
        "entity_type", "mention_start", "mention_end", "qid",
    )


# ---------------------------------------------------------------------------
# dedup / text-analysis / similarity-search queries
# ---------------------------------------------------------------------------


def q_d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — exact dedup by digest groups (md5 here: the one digest both
    engines share; the engine's xxhash64 path is covered rows-only)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, dup_group, doc_id = dup_group AS is_canonical FROM (
          SELECT doc_id,
                 min(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS dup_group
          FROM documents
        )
        """
    )


def q_d4_word_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — n-gram (word) Jaccard verify on candidate pairs
    (consecutive doc ids as the deterministic pair source)."""
    _register(spark, sf_dir)
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.lower(F.trim("text")), "\\s+")).alias("w"),
    )
    a = toks.select(F.col("doc_id").alias("a"), F.col("w").alias("wa"))
    b = toks.select((F.col("doc_id") - 1).alias("a"), F.col("doc_id").alias("b"),
                    F.col("w").alias("wb"))
    return (
        a.join(b, "a")
        .withColumn("ninter", F.size(F.array_intersect("wa", "wb")))
        .withColumn("na", F.size("wa"))
        .withColumn("nb", F.size("wb"))
        .select(
            "a", "b",
            (F.col("ninter") / (F.col("na") + F.col("nb") - F.col("ninter"))).alias("jaccard"),
        )
    )


def q_t1_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 — heuristic language ID (marker-word overlap)."""
    from t_res_spark.operators.text_analysis import with_language_id

    _register(spark, sf_dir)
    return with_language_id(spark.table("documents")).select("doc_id", "lang_pred")


def q_t2_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 — quality features (length/punct/stopword ratios)."""
    from t_res_spark.operators.text_analysis import with_quality_score

    _register(spark, sf_dir)
    return with_quality_score(spark.table("documents"), round_dp=None).select(
        "doc_id", "n_words", "punct_ratio", "stopword_ratio", "quality_score"
    )


def q_t3_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 — token counting (whitespace + chars/token)."""
    from t_res_spark.operators.text_analysis import with_token_counts

    _register(spark, sf_dir)
    return with_token_counts(spark.table("documents"), round_dp=None).select(
        "doc_id", "ws_tokens", "chars_per_token"
    )


def q_t4_decade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — year/decade extraction (preprocess_data.py:302-303) over
    the events timestamps; one codegen projection."""
    from t_res_spark.operators.text_analysis import with_decade

    _register(spark, sf_dir)
    return with_decade(spark.table("events")).select("event_id", "year", "decade")


def q_ml1_extract_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML1-shape — regex token extraction + explode + count (the
    SQL-expressible skeleton of the mention-extraction stage)."""
    _register(spark, sf_dir)
    docs = spark.table("documents")
    return (
        docs.select(
            F.explode(F.regexp_extract_all("text", F.lit("[a-z]{4,}"), 0)).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_s6_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/ANN baseline — brute-force cosine top-k (embedding join, not
    point queries). Cosine on double-cast vectors; ranked on the rounded
    value so both engines agree on ties."""
    from pyspark.sql import Window

    from t_res_spark.operators.similarity_search import cosine

    _register(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    joined = emb.crossJoin(F.broadcast(queries)).withColumn(
        "cos_sim", F.round(cosine(F.col("v"), F.col("qv")), 6)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: iterative CC, hash-seeded LSH,
# Arrow-UDF extraction) — driver records the weaker rows-only check
# ---------------------------------------------------------------------------


def _derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) derived
    deterministically from documents ⋈ nation (input_hint shape; plants
    one proper-noun mention per turn).

    The filler document text is LOWERCASED so the planted capitalized
    nation surface is the only extractable mention per turn — this
    makes the full er_pipeline output SQL-derivable (the ml2/s8
    constructed-expectation strategy, VERDICT r03 item #2): the oracle
    can state mention/start/prediction/cluster in closed form. The
    bench corpus (bench.derived_transcripts_amplified) deliberately
    keeps mixed-case filler so throughput numbers still measure
    extraction over realistic mention-bearing text."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'conv' || CAST(CAST(floor(d.doc_id / 8) AS BIGINT) AS STRING) AS conv_id,
               CAST(d.doc_id % 8 AS INT) AS turn_idx,
               CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'user'
                    WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
               lower(substr(d.text, 1, 40)) || ' '
                 || upper(substr(lower(n.n_name), 1, 1)) || substr(lower(n.n_name), 2)
                 || ' ' || lower(substr(d.text, 41)) AS text,
               CASE WHEN d.doc_id % 3 = 2 THEN 'search' ELSE NULL END AS tool,
               timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, d.doc_id) AS ts
        FROM documents d JOIN nation n ON CAST(d.doc_id % 25 AS INT) = n.n_nationkey
        """
    )


def _derived_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT upper(substr(lower(n_name), 1, 1)) || substr(lower(n_name), 2) AS alias,
               'Q' || CAST(n_nationkey AS STRING) AS qid,
               (n_nationkey % 8 + 1) / 8 AS relv,
               CAST((n_nationkey + 1) * 100 AS DOUBLE) AS abs_relv
        FROM nation
        """
    )


# cross-entity merge evidence (prediction_a, prediction_b): chains of 5
# consecutive QIDs — the closure is non-trivial (paths of length 4), so
# the CC label genuinely propagates, and both engines must walk it
ER_EXTRA_EDGES_SQL = """
SELECT 'Q' || CAST(n_nationkey AS STRING) AS prediction_a,
       'Q' || CAST(n_nationkey + 1 AS STRING) AS prediction_b
FROM nation
WHERE n_nationkey % 5 != 4 AND n_nationkey + 1 <= 24
"""


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER flagship clustering, ORACLE-GATED (VERDICT r02 #1): the
    linking + transitive-clustering stages value-exact. Spark runs the
    real operators — most_popular → link_mentions → cluster_mentions
    with cross-entity ``extra_edges`` (so connected components actually
    executes and its labels are checked, not just the trivial
    projection shortcut); the oracle recomputes the same clusters with
    a recursive-CTE transitive closure over the prediction graph.
    Labels = min prediction (QID) of the component (clustering.py r4
    convention); NIL mentions are their own singletons. The fuzzy
    candidate path feeding this at scale is oracle-covered by j3/j3b;
    the reference's implicit clusters: /root/reference/geoparser/
    pipeline.py:336 (grouping by prediction IS its closure)."""
    from t_res_spark.operators import clustering, linking

    _register(spark, sf_dir)
    mentions = _mentions_df(spark)
    preds = linking.most_popular(_candidates_df(spark))
    linked = linking.link_mentions(mentions, preds)
    extra = spark.sql(ER_EXTRA_EDGES_SQL)
    clusters = clustering.cluster_mentions(linked, extra_edges=extra)
    return clusters.select("mention_id", "mention", "prediction", "cluster_id")


def q_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ER pipeline end-to-end (extract → block → score → link →
    cluster), ORACLE-GATED (VERDICT r03 item #2): the gate corpus
    lowercases its filler text (see ``_derived_transcripts``), so the
    Arrow-UDF extraction output — and therefore every downstream
    stage — is fully determined: one mention per turn, surface =
    capitalized nation name at start_char 41, exact-match candidate,
    most-popular prediction Q(doc_id%25), prediction-space cluster
    label. The oracle states that closed form directly (the ml2/s8
    constructed-expectation strategy). Reference flow:
    /root/reference/geoparser/pipeline.py:387-490."""
    from t_res_spark.plans.pipeline import PipelineConfig, resolve

    transcripts = _derived_transcripts(spark, sf_dir)
    aliases = _derived_aliases(spark, sf_dir)
    res = resolve(spark, transcripts, aliases, config=PipelineConfig())
    return res.clusters.select(
        "mention_id", "mention", "prediction", "cluster_id"
    )


def q_d2_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — MinHash+LSH near-dup clusters, ORACLE-GATED (VERDICT r02
    #1): the engine runs the full probabilistic path (seeded MinHash →
    LSH banding → in-bucket estimate filter → exact Jaccard verify →
    connected components), while the oracle computes ground truth the
    brute-force way — all-pairs exact 5-gram Jaccard ≥ threshold +
    transitive closure via recursive CTE. They agree exactly iff the
    LSH stage has perfect recall on true pairs and the verify stage
    kills every false candidate — which is precisely the correctness
    claim of the operator (verified: label-exact at sf0.001/sf0.01).
    Scale-conditionality, stated plainly: the equality is with respect
    to THIS corpus at the gate's scale factor — LSH recall for an
    organic pair with true Jaccard barely above threshold is
    probabilistic (miss prob (1-J^4)^16), and buckets above the cap
    (exact-dup families > 50 docs) are intentionally skipped, so the
    oracle is a per-corpus verification, not a theorem; the testdata's
    duplicate families are near-exact (J ≥ ~0.9, miss prob ~4e-8) and
    far below the cap at every driver scale factor."""
    from t_res_spark.operators.dedup import near_duplicate_clusters

    _register(spark, sf_dir)
    return near_duplicate_clusters(spark.table("documents"), threshold=0.5)


# --- fixed corpus for the SimHash golden oracles (r4): exact copies
# (hamming 0, pigeonhole-guaranteed recall), a one-word edit (small
# hamming), and unrelated texts. Expected fingerprints/pairs are
# computed by tools/make_goldens_r4.py with a from-spec pure-python
# XXH64 (functions/xxh64.py, verified bit-exact against Spark's
# builtin) + exact mirrors of the vote/banding/hamming column math —
# an INDEPENDENT recomputation, not an engine snapshot.
_D3_BASE = (
    "ships sail across the wide harbor at dawn carrying spices silk wool "
    "amber and letters from distant ports toward the old market square "
    "where traders gather before sunrise to weigh coins inspect cargo and "
    "argue prices under faded awnings near the custom house steps"
)
D3_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river "
        "bank while birds sing softly in morning light"),
    (1, _D3_BASE),
    (2, "rain fell on the cobbled streets of the town as lanterns "
        "flickered behind fogged windows late into the night"),
    (3, "the engine roared over the plains pulling freight through "
        "tunnels and over bridges toward the northern depot"),
    (4, "a quiet garden grew behind the stone wall where bees moved "
        "between rows of lavender mint and climbing roses"),
    (10, "the quick brown fox jumps over the lazy dog near the river "
         "bank while birds sing softly in morning light"),  # copy of 0
    (11, _D3_BASE.replace("dawn", "dusk")),        # hamming 3 vs 1: at the verify edge
    (12, "rain fell on the cobbled streets of the town as lanterns "
         "flickered behind fogged windows late into the night"),  # copy of 2
    (13, _D3_BASE + " gulls"),                      # hamming 1 vs 1
    (14, _D3_BASE.replace("silk", "linen")),        # hamming 4 vs 1: bucket-proposed, verify-EXCLUDED
]


def q_d3_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — 64-bit SimHash fingerprints, ORACLE-GATED via golden VALUES
    (r4): the real operator (xxhash64 token hashes → single-pass 64-bit
    vote fold → sign-safe fingerprint assembly) over the fixed D3
    corpus; expected fingerprints recomputed independently with a
    from-spec python XXH64 + the same vote arithmetic."""
    from t_res_spark.operators.dedup import simhash

    _register(spark, sf_dir)
    docs = spark.createDataFrame(D3_DOCS, "doc_id long, text string")
    return simhash(docs)


def q_d3b_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3b — SimHash near-pair proposal (4 disjoint 16-bit bands +
    bucket cap) with exact Hamming verify, ORACLE-GATED via golden
    VALUES (r4) over the fixed D3 corpus: exact copies land at hamming
    0 (pigeonhole recall is provable for hamming < bands), the
    one-word edit exercises the verify threshold, unrelated texts must
    produce nothing."""
    from t_res_spark.operators.dedup import simhash, simhash_near_pairs

    _register(spark, sf_dir)
    docs = spark.createDataFrame(D3_DOCS, "doc_id long, text string")
    return simhash_near_pairs(simhash(docs), max_hamming=3)


_EMB_DIM_CACHE: dict = {}


def _embeddings_dim(spark: SparkSession, sf_dir: str) -> int:
    """Embedding dimensionality per sf_dir, probed at most once per
    process (VERDICT r03 #9: operators take ``dim`` from the caller;
    the gate's caller-side knowledge is this cached probe)."""
    if sf_dir not in _EMB_DIM_CACHE:
        first = (
            spark.table("embeddings").select(F.size("embedding").alias("d")).first()
        )
        _EMB_DIM_CACHE[sf_dir] = first["d"] if first else 0
    return _EMB_DIM_CACHE[sf_dir]


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path — SRP-bucketed LSH top-k with exact cosine
    re-rank, ORACLE-GATED via full SQL recomputation (r4): the oracle
    embeds the seeded hyperplane CONSTANTS (algorithm parameters, not
    results) and re-derives buckets, candidates, cosines and the top-k
    window in DuckDB over the same embeddings table. Determinism
    across engines is audited, not assumed
    (tools/make_goldens_r4.ann_margin_audit): every SRP sign decision
    sits ≥ 8e-5 from zero and every adjacent top-30 cosine gap
    ≥ 5e-6 — orders of magnitude above ~1e-13 cross-engine float
    noise — and the output cosine is rounded to 6 dp on both sides."""
    from t_res_spark.operators.similarity_search import lsh_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = lsh_topk(emb, queries, dim=_embeddings_dim(spark, sf_dir), k=10)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
    )


F5B_COORDS = [
    ("Q84", 51.5, -0.125),
    ("Q92561", 42.359375, -71.0625),
    ("Q90", 48.859375, 2.34375),
    ("Q172", 43.703125, -79.421875),
    ("QVENUS", 95.5, 10.0),  # invalid latitude — the Venus guard case
]
F5B_ORIGINS = [("london", "Q84"), ("boston", "Q84"), ("toronto", "Q172")]
F5B_CANDS = [
    ("london", "london", 1.0, "Q84", 0.5, 100.0),
    ("london", "london", 1.0, "Q92561", 0.125, 10.0),
    ("boston", "boston", 1.0, "Q92561", 0.25, 50.0),
    ("boston", "bostan", 0.9375, "Q84", 0.5, 100.0),
    ("toronto", "toronto", 1.0, "QVENUS", 0.5, 100.0),
    ("toronto", "toronto", 1.0, "Q92561", 0.25, 50.0),
    ("nowhere", "nowhere", 1.0, "Q90", 0.5, 10.0),  # no origin → dropped
]


def q_f5b_bydistance_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b — the real by_distance operator (haversine + 1000 km cap +
    Venus guard + final-score rounding, linking.py:266-338),
    ORACLE-GATED via golden VALUES (VERDICT r03 #4): fixed candidate/
    coord/origin fixtures (exact binary-fraction coordinates) whose
    expected rounded-3dp scores are precomputed with a python mirror
    of the haversine column math; every score sits far from a rounding
    boundary, so 1-ulp libm differences cannot flip a value. Exercises
    zero-distance scoring, the Venus guard, the distance cap, and the
    missing-origin inner join."""
    from t_res_spark.operators.linking import by_distance

    _register(spark, sf_dir)
    cands = spark.createDataFrame(
        F5B_CANDS,
        "mention string, variation string, score double, qid string, "
        "relv double, abs_relv double",
    )
    coords = spark.createDataFrame(F5B_COORDS, "qid string, lat double, lon double")
    origins = spark.createDataFrame(F5B_ORIGINS, "mention string, origin_qid string")
    return by_distance(cands, coords, origins)


def q_ml2_bio_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML2 — BIO repair chain + mention aggregation, ORACLE-GATED
    (recogniser.py:388-396 chain, ner.py:70-307). The chain is
    sequential with self-dependencies (each fix reads the PREVIOUS
    token's repaired tag) so it is not SQL-expressible — but the
    FIXTURE is three fixed tag patterns over a fixed 3-token sentence,
    so the repaired/aggregated output per pattern is fully determined
    and the oracle constructs it directly (the s8 strategy):
      B,B,B  --fix_nested--> B,B,I  -> mentions 'Port' + 'of Spain'
      B,I,B  --fix_nested--> B,I,I  -> mention  'Port of Spain'
      I,O,I  --fix_start -->  B,O,B -> mentions 'Port' + 'Spain'
    Rule goldens stay in tests/test_bio.py. Scores step by 1/64 (exact
    dyadic, never an exact half at 3 dp — Python banker's rounding and
    DuckDB round agree on every value)."""
    from t_res_spark.operators.bio import repair_and_aggregate

    _register(spark, sf_dir)
    toks = spark.sql(
        """
        SELECT CAST(o_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
               CASE CAST(o_custkey % 3 AS INT)
                 WHEN 0 THEN CASE t.i WHEN 0 THEN 'B-LOC' WHEN 1 THEN 'B-LOC' ELSE 'B-LOC' END
                 WHEN 1 THEN CASE t.i WHEN 0 THEN 'B-LOC' WHEN 1 THEN 'I-LOC' ELSE 'B-LOC' END
                 ELSE        CASE t.i WHEN 0 THEN 'I-LOC' WHEN 1 THEN 'O'     ELSE 'I-LOC' END
               END AS entity,
               CASE t.i WHEN 0 THEN 'Port' WHEN 1 THEN 'of' ELSE 'Spain' END AS word,
               CASE t.i WHEN 0 THEN 0 WHEN 1 THEN 5 ELSE 8 END AS `start`,
               CASE t.i WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 13 END AS `end`,
               CAST(0.75 + (o_orderkey % 4) / 64 AS DOUBLE) AS score
        FROM orders
        LATERAL VIEW explode(array(0, 1, 2)) t AS i
        WHERE o_orderkey % 37 = 0
        """
    )
    return repair_and_aggregate(toks)


# WebAnno-format token lines derived from customer/nation: a 2-token
# bracket-group mention per article (token1 = nation name, token2 =
# market segment), identical text on both engines; only Spark PARSES it.
WEBANNO_LINES_SQL = """
SELECT 'mem' AS file, c_custkey * 2 AS line_no,
       '1-1' || chr(9) || '0-' || CAST(length(n_name) AS STRING) || chr(9)
        || lower(n_name) || chr(9) || 'Q' || CAST(c_nationkey AS STRING)
        || '[' || CAST(c_custkey AS STRING) || ']' || chr(9)
        || 'LOC[' || CAST(c_custkey AS STRING) || ']' AS line
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey % 11 = 0
UNION ALL
SELECT 'mem', c_custkey * 2 + 1,
       '1-2' || chr(9) || CAST(length(n_name) + 1 AS STRING) || '-'
        || CAST(length(n_name) + 1 + length(c_mktsegment) AS STRING) || chr(9)
        || lower(c_mktsegment) || chr(9) || 'Q' || CAST(c_nationkey AS STRING)
        || '[' || CAST(c_custkey AS STRING) || ']' || chr(9)
        || 'LOC[' || CAST(c_custkey AS STRING) || ']'
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey % 11 = 0
"""


def q_s8_webanno(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — declarative WebAnno TSV parse (bracket-group windows +
    gap-aware mention fold, preprocess_data.py:710-871). The token
    lines are built identically on both engines; only Spark parses
    them — the oracle constructs the expected mention rows directly."""
    from t_res_spark.sources.annotations import parse_webanno

    _register(spark, sf_dir)
    lines = spark.sql(WEBANNO_LINES_SQL)
    _tokens, mentions = parse_webanno(lines)
    return mentions.select(
        "sent_pos", "start_char", "end_char", "mention", "wkpd", "label"
    )


# HIPE-2022 fixture lines: TAB-separated (the real format), with
# multi-word nation names kept as ONE token — whitespace-splitting
# would mis-column them, which is exactly what the tab parser fixes.
HIPE_LINES_SQL = """
SELECT 'mem' AS file, c_custkey * 3 AS line_no,
       '# hipe2022:document_id = doc' || CAST(c_custkey AS STRING) AS line
FROM customer WHERE c_custkey % 13 = 0
UNION ALL
SELECT 'mem', c_custkey * 3 + 1,
       concat_ws(chr(9), lower(n_name), 'B-loc', 'O', 'B-loc', 'O', 'O', 'O',
                 'Q' || CAST(c_nationkey AS STRING), 'O', '_') AS line
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey % 13 = 0
UNION ALL
SELECT 'mem', c_custkey * 3 + 2,
       concat_ws(chr(9), 'endtoken', 'O', 'O', 'O', 'O', 'O', 'O', 'O', 'O',
                 'EndOfSentence') AS line
FROM customer WHERE c_custkey % 13 = 0
"""


def q_s9_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9a — the DECLARATIVE half of the HIPE parse (doc-id propagation
    window + tab column split), oracle-gated: the oracle constructs the
    expected token table directly, mirroring s8_webanno's strategy."""
    from t_res_spark.sources.annotations import hipe_token_table

    _register(spark, sf_dir)
    return hipe_token_table(spark.sql(HIPE_LINES_SQL))


def q_s9_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9b — full HIPE-2022 parse: declarative doc-id propagation +
    per-doc applyInPandas offset reconstruction
    (preprocess_data.py:464-707), ORACLE-GATED: the sequential
    reconstruction is not SQL-expressible, but the fixture documents
    are one-sentence two-token patterns, so the expected sentence +
    annotation rows (offsets included) are fully determined and the
    oracle constructs them directly (the s8 strategy)."""
    from t_res_spark.sources.annotations import parse_hipe

    _register(spark, sf_dir)
    return parse_hipe(spark.sql(HIPE_LINES_SQL))


def q_s15_title_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 — wiki-title → QID lookup as a normalized-key mapping join
    (the Spark-first replacement of the SQLite point query,
    process_wikipedia.py:69-108). Titles here are percent-free, so the
    engine's url_decode/url_encode normalizer reduces to
    lower + space→underscore — which DuckDB can mirror exactly."""
    from t_res_spark.sources.readers import wiki_title_lookup

    _register(spark, sf_dir)
    titles = spark.sql(
        """
        SELECT DISTINCT CASE CAST(c_custkey % 2 AS INT)
                 WHEN 0 THEN initcap(lower(replace(n_name, ' ', '_')))
                 ELSE n_name
               END AS page_title
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        """
    )
    mapping = spark.sql(
        """
        SELECT lower(replace(n_name, ' ', '_')) AS wiki_key,
               'Q' || CAST(n_nationkey AS STRING) AS qid
        FROM nation WHERE n_nationkey % 3 != 0
        """
    )
    return wiki_title_lookup(titles, mapping).select("page_title", "qid")


def q_e2e_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.3 — the batch experiment driver analog end-to-end,
    ORACLE-GATED: stringified-TSV rows → from_json parse →
    deterministic NER → gold span alignment → blocked ranking →
    linking → gold-joined results. Mentions are planted at fixed
    offsets in fully-determined sentences, so the oracle constructs
    the expected end-to-end output directly (the s8_webanno strategy —
    the whole parse→extract→align→rank→link chain is what's under
    test); DuckDB lacks initcap, so the oracle title-cases with a
    list_transform."""
    from t_res_spark.jobs.experiment_job import run_experiment

    _register(spark, sf_dir)
    # capitalized mention planted at a fixed offset ('We visited ' = 11)
    rows = spark.sql(
        """
        SELECT CAST(c_custkey AS STRING) AS article_id,
               '[{"sentence_pos":1,"sentence_text":"We visited '
                 || initcap(lower(n_name)) || ' today"}]' AS sentences,
               '[{"sent_pos":1,"mention":"' || initcap(lower(n_name))
                 || '","entity_type":"LOC","wkdt_qid":"Q'
                 || CAST(c_nationkey AS STRING)
                 || '","mention_start":11,"mention_end":'
                 || CAST(11 + length(n_name) AS STRING) || '}]' AS annotations
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey % 7 = 0
        """
    )
    aliases = spark.sql(
        """
        SELECT initcap(lower(n_name)) AS alias,
               'Q' || CAST(n_nationkey AS STRING) AS qid,
               (n_nationkey % 8 + 1) / 8 AS relv,
               CAST((n_nationkey + 1) * 100 AS DOUBLE) AS abs_relv
        FROM nation
        """
    )
    results, _metrics = run_experiment(spark, rows, aliases)
    return results.select(
        "conv_id", "turn_idx", "mention", "prediction", "gold_qid"
    )


def _ivf_fixture_centroids(dim: int, k: int = 8, seed: int = 7) -> list[list[float]]:
    """Fixture coarse quantizer for the ORACLE-GATED IVF query: k
    unit-normalized seeded gaussian directions. Training itself is a
    driver-side numpy stage (unit-tested incl. recall-vs-brute-force
    and degenerate samples); supplying the quantizer as a seed-derived
    constant lets the oracle INDEPENDENTLY re-derive every distributed
    step (assignment, nprobe selection, cosine re-rank, top-k)."""
    import numpy as np

    from t_res_spark.operators.similarity_search import _hyperplanes

    H = np.asarray(_hyperplanes(dim, k, seed), dtype=np.float64)
    H = H / np.maximum(np.linalg.norm(H, axis=1, keepdims=True), 1e-12)
    return H.tolist()


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path #2 — IVF: nearest-cell assignment, nprobe cell
    co-location join, exact cosine re-rank; ORACLE-GATED via full SQL
    recomputation (r4) against a fixture quantizer (see
    ``_ivf_fixture_centroids``; the numpy training stage is covered by
    unit tests — ivf_train_centroids recall + degenerate-sample). The
    oracle embeds the same seed-derived centroid constants and
    re-derives assignment/probes/re-rank/top-k in DuckDB; cross-engine
    float margins audited by tools/make_goldens_r4.ann_margin_audit."""
    from t_res_spark.operators.similarity_search import ivf_topk

    _register(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = _ivf_fixture_centroids(_embeddings_dim(spark, sf_dir))
    out = ivf_topk(emb, queries, cents, k=10, nprobe=3)
    return out.select(
        "q_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
    )


# --- constructed-fixpoint fixture for the FULL 10-loop coherence oracle
# (VERDICT r03 #5). Design: every mention has one DOMINANT candidate —
# highest prior AND highest fixed-point score (verified numerically by
# tools/make_goldens_r4.py) — and conv A carries a pinned anchor (U4),
# so argmax never moves, each candidate's coherence c is CONSTANT
# across iterations, and the damped recursion s_{t+1} = ½s_t + ½(p+c)/2
# has the closed form s_10 = f + (p - f)/2^10 with f = (p+c)/2. The
# oracle states those closed-form scores; the engine must reproduce
# them through prerank + applyInPandas + 10 real loop iterations.
# Reference math: mulrel_ranker.py:403-421, rel_utils.py:180-231.
CTX10_ORIGINS = [("cA", "Q84", "london")]
CTX10_MENTIONS = [
    ("cA", "cA:0:0", "london"),
    ("cA", "cA:1:0", "paris"),
    ("cA", "cA:2:0", "berlin"),
    ("cB", "cB:0:0", "madrid"),
    ("cB", "cB:1:0", "lisbon"),
]
CTX10_CANDS = [
    ("london", "Q84", 0.5, 100.0),
    ("london", "Q1000", 0.25, 10.0),
    ("london", "Q1001", 0.125, 5.0),
    ("paris", "Q90", 0.5, 100.0),
    ("paris", "Q1002", 0.25, 10.0),
    ("berlin", "Q64", 0.5, 100.0),
    ("berlin", "Q1003", 0.25, 10.0),
    ("berlin", "Q1004", 0.125, 5.0),
    ("madrid", "Q2807", 0.5, 100.0),
    ("madrid", "Q1005", 0.25, 10.0),
    ("lisbon", "Q597", 0.5, 100.0),
    ("lisbon", "Q1006", 0.25, 10.0),
]


def q_ctx10_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML5 — the FULL 10-loop damped coherence disambiguator,
    ORACLE-GATED via constructed fixpoint (VERDICT r03 #5): see the
    CTX10 fixture notes above. ``round_dp=3`` — the loop rounds in
    python, the oracle embeds the same closed-form values. The
    corpus-scale run stays covered by ctx_disambiguate (rows-only)
    and the n_loops=0 slice by ctx0_prior_argmax (oracle)."""
    from t_res_spark.operators.context import context_disambiguate

    _register(spark, sf_dir)
    mentions = spark.createDataFrame(
        CTX10_MENTIONS, "conv_id string, mention_id string, mention string"
    ).select(
        "conv_id",
        F.lit(0).alias("turn_idx"),
        "mention_id",
        "mention",
        F.lit(0).alias("start_char"),
        F.length("mention").alias("end_char"),
        F.lit(1.0).alias("ner_score"),
        F.lit("LOC").alias("tag"),
    )
    cands = spark.createDataFrame(
        CTX10_CANDS, "mention string, qid string, relv double, abs_relv double"
    )
    origins = spark.createDataFrame(
        CTX10_ORIGINS, "conv_id string, origin_qid string, origin_name string"
    )
    return context_disambiguate(mentions, cands, origins=origins)


def q_ctx_disambiguate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML4/ML5 analog — per-conversation applyInPandas coherence loop
    (document = group = minibatch, entity_disambiguation.py:222,507;
    LBP constants mulrel_ranker.py:403-421) → rows-only."""
    from t_res_spark.operators.context import context_disambiguate

    _register(spark, sf_dir)
    mentions = spark.sql(
        f"""
        SELECT 'conv' || CAST(CAST(floor(mention_id / 8) AS BIGINT) AS STRING) AS conv_id,
               CAST(mention_id AS STRING) AS mention_id,
               mention
        FROM ({MENTIONS_SQL})
        """
    )
    return context_disambiguate(mentions, _candidates_df(spark))


# ambiguous candidate table for the ctx family: every mention surface
# carries TWO candidates with distinct exact-integer popularity masses
# (128/64 multiples — no rank ties possible, see q_ctx0 docstring)
CTX_CANDS_SQL = """
SELECT lower(n_name) AS mention, 'Q' || CAST(n_nationkey AS STRING) AS qid,
       CAST((n_nationkey % 8 + 1) * 128 AS DOUBLE) AS abs_relv
FROM nation
UNION ALL
SELECT lower(n_name) AS mention,
       'Q' || CAST(CAST((n_nationkey + 7) % 25 AS INT) AS STRING) AS qid,
       CAST((n_nationkey % 4 + 1) * 64 AS DOUBLE) AS abs_relv
FROM nation
"""

CTX_MENTIONS_SQL = f"""
SELECT 'conv' || CAST(CAST(floor(mention_id / 8) AS BIGINT) AS STRING) AS conv_id,
       CAST(mention_id AS STRING) AS mention_id,
       mention
FROM ({MENTIONS_SQL})
"""


def q_ctx0_prior_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML5 oracle slice (VERDICT r02 #3): with ``n_loops=0`` the
    coherence model reduces exactly to argmax(normalized prior) per
    mention (reference math: /root/reference/utils/rel_utils.py:180-231
    — the prior term of the MulRelRanker score), which IS
    DuckDB-expressible. The same applyInPandas operator runs — only the
    loop count differs — so the gate checks the operator's group
    plumbing, prior normalization, argmax tie-break (first in qid-sorted
    order) and anchor handling value-exact; the full 10-loop coherence
    path stays rows-only (ctx_disambiguate). round_dp=None keeps raw
    IEEE doubles (both engines divide in the same order); candidate
    masses are 128/64 multiples so no rank ties exist."""
    from t_res_spark.operators.context import context_disambiguate

    _register(spark, sf_dir)
    mentions = spark.sql(CTX_MENTIONS_SQL)
    cands = spark.sql(CTX_CANDS_SQL)
    return context_disambiguate(
        mentions, cands, prerank=False, n_loops=0, round_dp=None
    )


def q_d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — embedding-cosine near-duplicate clusters (SRP-LSH propose,
    exact cosine verify, CC close), ORACLE-GATED: near-dups are planted
    as 1.5×-scaled copies of every 7th vector (cosine ≈ 1; the scaling
    preserves every projection SIGN, so the copies collide with their
    originals in every SRP table — recall is structural, not
    seed-lucky), and the oracle recomputes clusters from brute-force
    all-pairs cosine ≥ 0.95 + recursive-CTE closure. Checks both
    directions: no missed planted pair, no spurious merge among the
    ~125k non-planted pairs."""
    from t_res_spark.operators.dedup import embedding_near_duplicates

    _register(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (-F.col("vec_id") - 1).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    return embedding_near_duplicates(
        emb.unionByName(planted),
        threshold=0.95,
        dim=_embeddings_dim(spark, sf_dir),
    )


def q_mm_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — binary payload → feature extraction via
    mapInPandas. The gate output keeps only scalar columns (the driver's
    canonicalizer cannot sort an array column); n_bytes + sha256 digest
    are oracle-checked against DuckDB's sha256(VARCHAR), which hashes
    the same UTF-8 bytes hashlib sees. The feature vector itself is
    covered by tests/test_similarity_search.py-style unit goldens."""
    from t_res_spark.operators.multimodal import extract_media_features

    _register(spark, sf_dir)
    media = spark.sql(
        """
        SELECT CAST(doc_id AS STRING) AS media_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               encode(text, 'utf-8') AS payload
        FROM documents
        """
    )
    return extract_media_features(media).select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes"), "digest"
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full ER pipeline."""
    return q_er_pipeline(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s2_alias_filter": q_s2_alias_filter,
        "j1_perfect_match": q_j1_perfect_match,
        "j2_containment": q_j2_containment,
        "j3_fuzzy_damlev": q_j3_fuzzy_damlev,
        "a2_most_popular": q_a2_most_popular,
        "a5_rank_candidates": q_a5_rank_candidates,
        "f5_bydistance": q_f5_bydistance,
        "w1_top1_ties": q_w1_top1_ties,
        "w2_top7": q_w2_top7,
        "w10_context_window": q_w10_context_window,
        "m4_edges_star": q_m4_edges_star,
        "j12_anti_join_cache": q_j12_anti_join_cache,
        "opt_salted_agg": q_opt_salted_agg,
        "j9_decorate": q_j9_decorate,
        "j6_align_spans": q_j6_align_spans,
        "a6_cross_norm": q_a6_cross_norm,
        "w8_alias_casing": q_w8_alias_casing,
        "a7_pairwise_f1": q_a7_pairwise_f1,
        "d1_exact_dedup": q_d1_exact_dedup,
        "d4_word_jaccard": q_d4_word_jaccard,
        "t1_langid": q_t1_langid,
        "t2_quality": q_t2_quality,
        "t3_token_counts": q_t3_token_counts,
        "t4_decade": q_t4_decade,
        "ml1_extract_tokens": q_ml1_extract_tokens,
        "s6_embedding_topk": q_s6_embedding_topk,
        "mm_media_features": q_mm_media_features,
        "m1_parse_ingest": q_m1_parse_ingest,
        "j3b_blocked_fuzzy": q_j3b_blocked_fuzzy,
        "a1_alias_invert": q_a1_alias_invert,
        "j7_align_gold": q_j7_align_gold,
        "s8_webanno": q_s8_webanno,
        "s15_title_lookup": q_s15_title_lookup,
        # rows-only (non-SQL-expressible)
        "j4b_jarowinkler": q_j4b_jarowinkler,
        "f4_ocr_variants": q_f4_ocr_variants,
        "ml2_bio_repair": q_ml2_bio_repair,
        "e2e_experiment": q_e2e_experiment,
        "s9_tokens": q_s9_tokens,
        "s9_mentions": q_s9_mentions,
        "f5b_bydistance_op": q_f5b_bydistance_op,
        "er_clusters": q_er_clusters,
        "er_pipeline": q_er_pipeline,
        "ctx0_prior_argmax": q_ctx0_prior_argmax,
        "ctx_disambiguate": q_ctx_disambiguate,
        "ctx10_fixpoint": q_ctx10_fixpoint,
        "d2_minhash_clusters": q_d2_minhash_clusters,
        "d3_simhash": q_d3_simhash,
        "d3b_simhash_pairs": q_d3b_simhash_pairs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "d5_embedding_neardup": q_d5_embedding_neardup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "s2_alias_filter": """
            SELECT alias, qid FROM (
              SELECT CASE CAST(p_partkey % 5 AS INT)
                       WHEN 0 THEN p_name || ', junk'
                       WHEN 1 THEN p_name || ' (old'
                       ELSE p_name
                     END AS alias,
                     'Q' || CAST(p_partkey AS STRING) AS qid
              FROM part
            ) WHERE alias NOT LIKE '%, %' AND alias NOT LIKE '% (%'
        """,
        "j1_perfect_match": f"""
            SELECT m.mention, a.alias AS variation, CAST(1.0 AS DOUBLE) AS score
            FROM (SELECT DISTINCT mention FROM ({MENTIONS_SQL})) m
            JOIN (SELECT DISTINCT alias FROM ({ALIASES_SQL})) a
              ON m.mention = a.alias
        """,
        "j2_containment": """
            SELECT mention, variation, score FROM (
              SELECT m.mention, g.alias AS variation,
                     CASE WHEN strpos(g.alias, m.mention) > 0
                            THEN CAST(length(m.mention) AS DOUBLE) / length(g.alias)
                          WHEN strpos(m.mention, g.alias) > 0
                            THEN CAST(length(g.alias) AS DOUBLE) / length(m.mention)
                     END AS score
              FROM (SELECT DISTINCT lower(n_name) AS mention FROM nation) m
              CROSS JOIN (SELECT 'port of ' || lower(n_name) AS alias FROM nation) g
            ) s
            QUALIFY dense_rank() OVER (PARTITION BY mention ORDER BY score DESC) = 1
              AND score IS NOT NULL
        """,
        "j3_fuzzy_damlev": f"""
            WITH q AS (
              SELECT DISTINCT mention FROM ({MENTIONS_SQL}) m
              WHERE NOT EXISTS (SELECT 1 FROM ({ALIASES_SQL}) a
                                WHERE a.alias = m.mention)
            ),
            al AS (SELECT DISTINCT alias AS variation FROM ({ALIASES_SQL})),
            scored AS (
              SELECT q.mention, al.variation,
                     1.0 - CAST(damerau_levenshtein(q.mention, al.variation) AS DOUBLE)
                           / greatest(length(q.mention), length(al.variation)) AS score
              FROM q CROSS JOIN al
            )
            SELECT mention, variation, score FROM scored
            WHERE score >= 0.7
            QUALIFY dense_rank() OVER (PARTITION BY mention ORDER BY score DESC) = 1
        """,
        "a2_most_popular": f"""
            SELECT mention, qid AS prediction, abs_relv / total AS link_score
            FROM (
              SELECT mention, qid, abs_relv,
                     sum(abs_relv) OVER (PARTITION BY mention) AS total,
                     row_number() OVER (PARTITION BY mention
                                        ORDER BY abs_relv DESC, qid ASC, variation ASC) AS rn
              FROM ({CANDIDATES_SQL})
            ) WHERE rn = 1
        """,
        "a5_rank_candidates": f"""
            SELECT mention, variation, qid,
                   ((abs_relv / mx + qcm2w) / 2) * 0.9 AS qc_score,
                   row_number() OVER (PARTITION BY mention
                                      ORDER BY ((abs_relv / mx + qcm2w) / 2) * 0.9 DESC,
                                               qid DESC) AS cand_rank
            FROM (
              SELECT mention, variation, qid, abs_relv,
                     max(abs_relv) OVER (PARTITION BY mention) AS mx,
                     CASE WHEN score <> 0.0 THEN (relv + score) / 2 ELSE relv END AS qcm2w
              FROM ({CANDIDATES_SQL})
            )
        """,
        "f5_bydistance": f"""
            WITH coords AS ({COORDS_SQL}),
            origins AS (
              SELECT m.mention,
                     'Q' || CAST(CAST(xmin % 25 AS INT) AS STRING) AS origin_qid
              FROM (SELECT mention, min(mention_id) AS xmin
                    FROM ({MENTIONS_SQL}) GROUP BY mention) m
            )
            SELECT mention, qid AS prediction, dist2 FROM (
              SELECT c.mention, c.qid, c.variation,
                     (k.lat - o2.lat) * (k.lat - o2.lat)
                       + (k.lon - o2.lon) * (k.lon - o2.lon) AS dist2
              FROM ({CANDIDATES_SQL}) c
              JOIN coords k ON c.qid = k.qid
              JOIN origins o ON c.mention = o.mention
              JOIN coords o2 ON o.origin_qid = o2.qid
            )
            QUALIFY row_number() OVER (PARTITION BY mention
                                       ORDER BY dist2 ASC, qid ASC, variation ASC) = 1
        """,
        "w1_top1_ties": """
            SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
            QUALIFY dense_rank() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_quantity DESC) = 1
        """,
        "w2_top7": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey ASC) <= 7
        """,
        "w10_context_window": """
            SELECT event_id, user_id, event_type,
                   lag(event_type)  OVER w AS prev_type,
                   lead(event_type) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "m4_edges_star": """
            SELECT src, dst FROM (
              SELECT o_orderkey AS src,
                     min(o_orderkey) OVER (PARTITION BY o_custkey) AS dst
              FROM orders
            ) WHERE src <> dst
        """,
        "j12_anti_join_cache": f"""
            SELECT DISTINCT mention FROM ({MENTIONS_SQL}) m
            WHERE NOT EXISTS (
              SELECT 1 FROM ({ALIASES_SQL}) a
              WHERE CAST(regexp_extract(a.qid, 'Q(\\d+)', 1) AS INT) % 2 = 0
                AND a.alias = m.mention
            )
        """,
        "j9_decorate": f"""
            WITH preds AS (
              SELECT mention, qid AS prediction, abs_relv / total AS link_score
              FROM (
                SELECT mention, qid, abs_relv,
                       sum(abs_relv) OVER (PARTITION BY mention) AS total,
                       row_number() OVER (PARTITION BY mention
                                          ORDER BY abs_relv DESC, qid ASC,
                                                   variation ASC) AS rn
                FROM ({CANDIDATES_SQL})
              ) WHERE rn = 1
            ), ents AS (
              SELECT qid, lat, lon,
                     'C' || CAST(CAST(regexp_extract(qid, 'Q(\\d+)', 1) AS INT) % 5
                                 AS STRING) AS wkdt_class
              FROM ({COORDS_SQL})
            )
            SELECT CAST(m.mention_id AS STRING) AS mention_id, m.mention,
                   COALESCE(p.prediction, 'NIL') AS prediction,
                   COALESCE(p.link_score, 0.0) AS link_score,
                   e.lat, e.lon, e.wkdt_class
            FROM ({MENTIONS_SQL}) m
            LEFT JOIN preds p ON m.mention = p.mention
            LEFT JOIN ents e ON COALESCE(p.prediction, 'NIL') = e.qid
        """,
        "opt_salted_agg": """
            -- CAST: DuckDB sum(BIGINT) returns HUGEINT (stringifies as a
            -- float via pandas), Spark returns BIGINT — align the types.
            SELECT o_custkey, count(*) AS n_orders,
                   CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey
            FROM orders GROUP BY o_custkey
        """,
        "j6_align_spans": """
            WITH pred AS (
              SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
                     'p' || CAST(l_linenumber AS STRING) AS mention,
                     l_linenumber * 10 AS start_char,
                     l_linenumber * 10 + 8 AS end_char
              FROM lineitem WHERE l_linenumber <= 3
            ), gold AS (
              SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
                     'g' || CAST(l_linenumber AS STRING) AS gold_mention,
                     l_linenumber * 10 + CAST(l_partkey % 6 AS INT) AS gold_start,
                     l_linenumber * 10 + CAST(l_partkey % 6 AS INT) + 7 AS gold_end,
                     'Q' || CAST(l_partkey AS STRING) AS gold_qid
              FROM lineitem WHERE l_linenumber <= 2
            )
            SELECT conv_id, mention, start_char, gold_mention, gold_qid,
                   COALESCE(greatest(overlap, 0), 0) AS overlap_chars
            FROM (
              SELECT p.conv_id, p.mention, p.start_char, g.gold_mention,
                     g.gold_qid, g.gold_start,
                     least(p.end_char, g.gold_end)
                       - greatest(p.start_char, g.gold_start) AS overlap,
                     row_number() OVER (
                       PARTITION BY p.conv_id, p.turn_idx, p.start_char
                       ORDER BY least(p.end_char, g.gold_end)
                                  - greatest(p.start_char, g.gold_start) DESC,
                                g.gold_start ASC, g.gold_qid ASC) AS rn
              FROM pred p LEFT JOIN gold g
                ON p.conv_id = g.conv_id AND p.turn_idx = g.turn_idx
               AND p.start_char < g.gold_end AND g.gold_start < p.end_char
            ) WHERE rn = 1
        """,
        "a6_cross_norm": f"""
            WITH s AS (
              SELECT mention, qid,
                     CAST((CAST(regexp_extract(qid, 'Q(\\d+)', 1) AS INT) % 4) * 256
                          AS DOUBLE) AS raw_score
              FROM (SELECT DISTINCT mention, qid FROM ({CANDIDATES_SQL}))
            ), r AS (
              SELECT mention, qid, raw_score,
                     min(raw_score) OVER (PARTITION BY mention) AS mn,
                     max(raw_score) OVER (PARTITION BY mention) AS mx
              FROM s
            ), resc AS (
              SELECT mention, qid,
                     CASE WHEN mx > mn THEN (raw_score - mn) / (mx - mn)
                          ELSE 0.0 END AS resc
              FROM r
            )
            SELECT mention, qid,
                   CASE WHEN total > 0 THEN resc / total ELSE 0.0 END AS norm_score
            FROM (SELECT mention, qid, resc,
                         sum(resc) OVER (PARTITION BY mention) AS total
                  FROM resc)
        """,
        "w8_alias_casing": """
            WITH cased AS (
              SELECT DISTINCT
                     CASE CAST(c_custkey % 3 AS INT)
                       WHEN 0 THEN lower(n_name)
                       WHEN 1 THEN upper(n_name)
                       ELSE n_name
                     END AS alias,
                     'Q' || CAST(CAST(c_custkey % 40 AS INT) AS STRING) AS qid
              FROM customer JOIN nation ON c_nationkey = n_nationkey
            ), counts AS (
              SELECT alias, count(DISTINCT qid) AS n FROM cased GROUP BY alias
            ), keep AS (
              SELECT alias FROM (
                SELECT alias,
                       row_number() OVER (PARTITION BY lower(alias)
                                          ORDER BY n DESC, alias ASC) AS rn
                FROM counts
              ) WHERE rn = 1
            )
            SELECT c.alias, c.qid FROM cased c JOIN keep k ON c.alias = k.alias
        """,
        "a7_pairwise_f1": f"""
            WITH preds AS (
              SELECT mention, qid AS prediction FROM (
                SELECT mention, qid,
                       row_number() OVER (PARTITION BY mention
                                          ORDER BY abs_relv DESC, qid ASC,
                                                   variation ASC) AS rn
                FROM ({CANDIDATES_SQL})
              ) WHERE rn = 1
            ), clusters AS (
              SELECT CAST(m.mention_id AS STRING) AS mention_id,
                     p.prediction AS cluster_id
              FROM ({MENTIONS_SQL}) m JOIN preds p ON m.mention = p.mention
            ), pairs AS (
              SELECT CAST(a.c_custkey AS STRING) AS ida,
                     CAST(b.c_custkey AS STRING) AS idb,
                     a.c_nationkey = b.c_nationkey AS same_entity
              FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
            ), scored AS (
              SELECT (ca.cluster_id IS NOT NULL AND cb.cluster_id IS NOT NULL
                      AND ca.cluster_id = cb.cluster_id) AS pred_same,
                     p.same_entity
              FROM pairs p
              LEFT JOIN clusters ca ON p.ida = ca.mention_id
              LEFT JOIN clusters cb ON p.idb = cb.mention_id
            ), agg AS (
              SELECT
                CAST(sum(CASE WHEN pred_same AND same_entity THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN pred_same AND NOT same_entity THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN NOT pred_same AND same_entity THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                CAST(sum(CASE WHEN NOT pred_same AND NOT same_entity THEN 1 ELSE 0 END) AS BIGINT) AS tn
              FROM scored
            )
            SELECT tp, fp, fn, tn,
                   tp / greatest(tp + fp, 1) AS precision,
                   tp / greatest(tp + fn, 1) AS recall,
                   2 * tp / greatest(2 * tp + fp + fn, 1) AS f1
            FROM agg
        """,
        "d1_exact_dedup": """
            SELECT doc_id, dup_group, doc_id = dup_group AS is_canonical FROM (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS dup_group
              FROM documents
            )
        """,
        "d4_word_jaccard": """
            WITH toks AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM documents
            )
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
                     / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
            FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
        """,
        "t1_langid": """
            WITH m AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(lower(text), '[^a-zà-ÿ]+')) AS w
              FROM documents
            ), hits AS (
              SELECT doc_id,
                len(list_intersect(w, ['the','and','of','to','in','is','that','for','with','was'])) AS h_en,
                len(list_intersect(w, ['der','die','und','das','ist','nicht','mit','ein','von','zu'])) AS h_de,
                len(list_intersect(w, ['le','la','les','et','des','est','pas','pour','que','une'])) AS h_fr,
                len(list_intersect(w, ['el','los','las','es','por','una','para','con','del','se'])) AS h_es
              FROM m
            )
            SELECT doc_id,
                   CASE WHEN h_en + h_de + h_fr + h_es = 0 THEN 'und'
                        WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
                        WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
                        WHEN h_fr >= h_es THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM hits
        """,
        "t2_quality": """
            WITH f AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(string_split_regex(trim(text), '\\s+')) AS n_words,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                     len(list_intersect(
                       list_distinct(list_transform(
                         string_split_regex(trim(text), '\\s+'), x -> lower(x))),
                       ['the','and','of','to','in','is','that','for','with','was'])) AS stop_hits
              FROM documents
            )
            SELECT doc_id, n_words,
                   CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
                   CASE WHEN n_words > 0 THEN stop_hits / 10.0 ELSE 0.0 END AS stopword_ratio,
                   least(n_words / 50.0, 1.0) * 0.4
                     + least(CASE WHEN n_words > 0 THEN stop_hits / 10.0 ELSE 0.0 END, 1.0) * 0.3
                     + (1.0 - least(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END * 5.0, 1.0)) * 0.2
                     + CASE WHEN n_words > 0
                             AND CAST(n_chars AS DOUBLE) / n_words >= 3
                             AND CAST(n_chars AS DOUBLE) / n_words <= 10
                            THEN 0.1 ELSE 0.0 END AS quality_score
            FROM f
        """,
        "t3_token_counts": """
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
                   CAST(length(text) AS DOUBLE)
                     / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS chars_per_token
            FROM documents
        """,
        "t4_decade": """
            -- CAST: DuckDB year() returns BIGINT, Spark's returns INT
            SELECT event_id, CAST(year(ts) AS INT) AS year,
                   CAST(year(ts) - year(ts) % 10 AS INT) AS decade
            FROM events
        """,
        "ml1_extract_tokens": """
            SELECT token, count(*) AS n FROM (
              SELECT unnest(regexp_extract_all(text, '[a-z]{4,}')) AS token
              FROM documents
            ) GROUP BY token
        """,
        "j3b_blocked_fuzzy": f"""
            WITH m AS (
              SELECT mention,
                     regexp_replace(mention, '[^a-z0-9]', '', 'g') AS bk
              FROM ({VARIANT_MENTIONS_SQL})
            ), a AS (
              SELECT DISTINCT alias AS variation,
                     regexp_replace(lower(alias), '[^a-z0-9]', '', 'g') AS bk
              FROM ({ALIASES_SQL})
            ), scored AS (
              SELECT m.mention, a.variation,
                     1.0 - CAST(damerau_levenshtein(m.mention, a.variation) AS DOUBLE)
                           / greatest(length(m.mention), length(a.variation)) AS score
              FROM m JOIN a ON m.bk = a.bk
              WHERE length(m.bk) > 0
            )
            SELECT mention, variation, score FROM scored
            WHERE score >= 0.5
            QUALIFY dense_rank() OVER (PARTITION BY mention ORDER BY score DESC) = 1
        """,
        "a1_alias_invert": f"""
            SELECT qid, alias, abs_relv,
                   abs_relv / sum(abs_relv) OVER (PARTITION BY qid) AS relv_norm
            FROM (
              SELECT qid, alias, max(abs_relv) AS abs_relv
              FROM ({ALIASES_SQL}) GROUP BY qid, alias
            )
        """,
        "j7_align_gold": """
            WITH tokens AS (
              SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
                     l_linenumber * 10 + CASE WHEN l_partkey % 7 = 0 THEN 7
                                              ELSE CAST(l_partkey % 3 AS INT) END AS tok_start,
                     l_linenumber * 10 + CASE WHEN l_partkey % 7 = 0 THEN 7
                                              ELSE CAST(l_partkey % 3 AS INT) END + 3 AS tok_end
              FROM lineitem WHERE l_linenumber <= 4
            ), gold AS (
              SELECT CAST(l_orderkey AS STRING) AS conv_id, 0 AS turn_idx,
                     l_linenumber * 10 AS gold_start,
                     l_linenumber * 10 + 8 AS gold_end,
                     'LOC' AS gold_type,
                     'Q' || CAST(CAST(l_partkey % 50 AS INT) AS STRING) AS gold_qid
              FROM lineitem WHERE l_linenumber <= 3
            )
            SELECT conv_id, turn_idx, tok_start, tok_end,
                   CASE WHEN gold_start IS NULL THEN 'O'
                        WHEN tok_start = gold_start THEN 'B-' || gold_type
                        ELSE 'I-' || gold_type END AS entity,
                   CASE WHEN gold_start IS NULL THEN 'O'
                        WHEN tok_start = gold_start THEN 'B-' || gold_qid
                        ELSE 'I-' || gold_qid END AS link,
                   1.0 AS score
            FROM (
              SELECT t.conv_id, t.turn_idx, t.tok_start, t.tok_end,
                     g.gold_start, g.gold_type, g.gold_qid,
                     row_number() OVER (
                       PARTITION BY t.conv_id, t.turn_idx, t.tok_start, t.tok_end
                       ORDER BY g.gold_start ASC, g.gold_qid ASC) AS rn
              FROM tokens t LEFT JOIN gold g
                ON t.conv_id = g.conv_id AND t.turn_idx = g.turn_idx
               AND t.tok_start >= g.gold_start AND t.tok_end <= g.gold_end
            ) WHERE rn = 1
        """,
        "s15_title_lookup": """
            WITH titles AS (
              SELECT DISTINCT
                     CASE CAST(c_custkey % 2 AS INT)
                       WHEN 0 THEN upper(substr(lower(replace(n_name, ' ', '_')), 1, 1))
                                    || substr(lower(replace(n_name, ' ', '_')), 2)
                       ELSE n_name
                     END AS page_title,
                     lower(replace(n_name, ' ', '_')) AS k
              FROM customer JOIN nation ON c_nationkey = n_nationkey
            ), mapping AS (
              SELECT lower(replace(n_name, ' ', '_')) AS k,
                     'Q' || CAST(n_nationkey AS STRING) AS qid
              FROM nation WHERE n_nationkey % 3 != 0
            )
            SELECT t.page_title, m.qid
            FROM titles t LEFT JOIN mapping m ON t.k = m.k
        """,
        "s9_mentions": """
            -- expected parse output built directly: one sentence
            -- (mention token + 'endtoken') and one annotation per doc,
            -- sentence-relative offsets
            SELECT 'doc' || CAST(c_custkey AS STRING) AS article_id,
                   0 AS sent_pos, 'sentence' AS kind,
                   lower(n_name) || ' endtoken' AS text,
                   CAST(NULL AS STRING) AS mention,
                   CAST(NULL AS STRING) AS entity_type,
                   CAST(NULL AS STRING) AS wkdt_qid,
                   CAST(NULL AS INT) AS mention_start,
                   CAST(NULL AS INT) AS mention_end
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 13 = 0
            UNION ALL
            SELECT 'doc' || CAST(c_custkey AS STRING), 0, 'annotation',
                   CAST(NULL AS STRING), lower(n_name), 'loc',
                   'Q' || CAST(c_nationkey AS STRING),
                   0, CAST(length(n_name) AS INT)
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 13 = 0
        """,
        "s9_tokens": """
            -- expected declarative token table constructed directly
            -- (the Spark side window-propagates doc ids + tab-splits)
            SELECT 'doc' || CAST(c_custkey AS STRING) AS article_id,
                   c_custkey * 3 + 1 AS line_no,
                   lower(n_name) AS token, 'B-loc' AS etag,
                   'Q' || CAST(c_nationkey AS STRING) AS elink, '_' AS misc
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 13 = 0
            UNION ALL
            SELECT 'doc' || CAST(c_custkey AS STRING), c_custkey * 3 + 2,
                   'endtoken', 'O', 'O', 'EndOfSentence'
            FROM customer WHERE c_custkey % 13 = 0
        """,
        "s8_webanno": """
            -- expected parse output constructed directly (the Spark
            -- side actually parses the WebAnno lines)
            SELECT 1 AS sent_pos, 0 AS start_char,
                   length(n_name) + 1 + length(c_mktsegment) AS end_char,
                   lower(n_name) || ' ' || lower(c_mktsegment) AS mention,
                   'Q' || CAST(c_nationkey AS STRING) AS wkpd,
                   'LOC' AS label
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 11 = 0
        """,
        "m1_parse_ingest": """
            WITH base AS (
              SELECT c_custkey AS article_id, lower(n_name) AS nm,
                     CAST(c_custkey % 3 AS INT) AS r,
                     'Q' || CAST(c_nationkey AS STRING) AS qid
              FROM customer JOIN nation ON c_nationkey = n_nationkey
            ), s AS (
              SELECT article_id, 1 AS sent_pos, nm || ' one' AS sentence_text,
                     nm, r, qid FROM base
              UNION ALL
              SELECT article_id, 2 AS sent_pos, nm || ' two' AS sentence_text,
                     nm, r, qid FROM base
            )
            SELECT article_id, sent_pos, sentence_text,
                   CASE WHEN sent_pos = 1 THEN nm END AS mention,
                   CASE WHEN sent_pos = 1 THEN 'LOC' END AS entity_type,
                   CASE WHEN sent_pos = 1 THEN 0 END AS mention_start,
                   CASE WHEN sent_pos = 1 THEN 5 END AS mention_end,
                   CASE WHEN sent_pos = 1 THEN
                     CASE WHEN r IN (0, 1) THEN 'NIL' ELSE qid END
                   END AS qid
            FROM s
        """,
        "mm_media_features": """
            -- DuckDB sha256(VARCHAR) hashes the UTF-8 bytes — identical
            -- to hashlib.sha256(text.encode()) inside the mapInPandas op.
            SELECT CAST(doc_id AS STRING) AS media_id,
                   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS digest
            FROM documents
        """,
        "ml2_bio_repair": """
            -- expected repaired mentions constructed directly per tag
            -- pattern (see q_ml2_bio_repair docstring for the trace)
            WITH sel AS (
              SELECT CAST(o_orderkey AS STRING) AS conv_id,
                     CAST(o_custkey % 3 AS INT) AS pat,
                     round(0.75 + (o_orderkey % 4) / 64.0, 3) AS s
              FROM orders WHERE o_orderkey % 37 = 0
            )
            SELECT conv_id, 0 AS turn_idx, 'Port' AS mention,
                   0 AS start_char, 4 AS end_char, s AS ner_score,
                   'LOC' AS tag
            FROM sel WHERE pat IN (0, 2)
            UNION ALL
            SELECT conv_id, 0, 'of Spain', 5, 13, s, 'LOC'
            FROM sel WHERE pat = 0
            UNION ALL
            SELECT conv_id, 0, 'Port of Spain', 0, 13, s, 'LOC'
            FROM sel WHERE pat = 1
            UNION ALL
            SELECT conv_id, 0, 'Spain', 8, 13, s, 'LOC'
            FROM sel WHERE pat = 2
        """,
        "d5_embedding_neardup": """
            -- brute-force ground truth for the SRP-LSH path: all-pairs
            -- exact cosine >= 0.95 over originals + planted 1.5x copies,
            -- recursive-CTE closure, min-id labels, singletons self
            WITH RECURSIVE e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              UNION ALL
              SELECT -vec_id - 1,
                     list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5)
              FROM embeddings WHERE vec_id % 7 = 0
            ), edges AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM e a JOIN e b ON a.vec_id < b.vec_id
              WHERE list_dot_product(a.v, b.v)
                      / greatest(sqrt(list_dot_product(a.v, a.v))
                                 * sqrt(list_dot_product(b.v, b.v)), 1e-12)
                    >= 0.95
            ), sym AS (
              SELECT a AS s, b AS d FROM edges
              UNION ALL
              SELECT b, a FROM edges
            ), reach AS (
              SELECT s, d FROM sym
              UNION
              SELECT r.s, e2.d FROM reach r JOIN sym e2 ON r.d = e2.s
            ), labels AS (
              SELECT s AS vec_id, least(s, min(d)) AS lbl
              FROM reach GROUP BY s
            )
            SELECT CAST(e.vec_id AS STRING) AS doc_id,
                   CAST(COALESCE(l.lbl, e.vec_id) AS STRING) AS dup_cluster
            FROM e LEFT JOIN labels l ON e.vec_id = l.vec_id
        """,
        "e2e_experiment": """
            -- expected end-to-end rows built directly: each planted
            -- article yields exactly one mention at offset 11, exact
            -- alias match, most-popular single-candidate prediction,
            -- gold aligned by identical span
            SELECT CAST(c_custkey AS STRING) AS conv_id,
                   1 AS turn_idx,
                   array_to_string(
                     list_transform(
                       string_split(lower(n_name), ' '),
                       w -> upper(substr(w, 1, 1)) || substr(w, 2)
                     ), ' ') AS mention,
                   'Q' || CAST(c_nationkey AS STRING) AS prediction,
                   'Q' || CAST(c_nationkey AS STRING) AS gold_qid
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_custkey % 7 = 0
        """,
        "ctx0_prior_argmax": f"""
            -- n_loops=0 coherence == argmax(normalized prior), pinned
            -- anchors excluded (none in this fixture); prior =
            -- max(abs_relv) per (mention,qid) / sum over the mention —
            -- mirrors context.py's priored aggregation exactly
            WITH pr AS (
              SELECT mention, qid, max(abs_relv) AS abs_relv
              FROM ({CTX_CANDS_SQL}) GROUP BY mention, qid
            ), normed AS (
              SELECT mention, qid,
                     abs_relv / sum(abs_relv) OVER (PARTITION BY mention)
                       AS prior
              FROM pr
            )
            SELECT conv_id, mention_id, mention, prediction, link_score
            FROM (
              SELECT m.conv_id, m.mention_id, m.mention,
                     n.qid AS prediction, n.prior AS link_score,
                     row_number() OVER (PARTITION BY m.mention_id
                                        ORDER BY n.prior DESC, n.qid ASC) AS rn
              FROM ({CTX_MENTIONS_SQL}) m
              JOIN normed n ON m.mention = n.mention
            ) WHERE rn = 1
        """,
        "er_clusters": f"""
            -- linking + transitive clustering, ground-truthed: a2-style
            -- mostpopular predictions, then closure directly over the
            -- PREDICTION graph (clustering.py r4 convention): edges
            -- restricted to predictions present in the corpus,
            -- recursive-CTE closure, label = min prediction (QID) of
            -- the component; NIL mentions label themselves
            WITH RECURSIVE preds AS (
              SELECT mention, qid AS prediction FROM (
                SELECT mention, qid,
                       row_number() OVER (PARTITION BY mention
                                          ORDER BY abs_relv DESC, qid ASC,
                                                   variation ASC) AS rn
                FROM ({CANDIDATES_SQL})
              ) WHERE rn = 1
            ), linked AS (
              SELECT m.mention_id, m.mention,
                     COALESCE(p.prediction, 'NIL') AS prediction
              FROM ({MENTIONS_SQL}) m
              LEFT JOIN preds p ON m.mention = p.mention
            ), present AS (
              SELECT DISTINCT prediction FROM linked
              WHERE prediction != 'NIL'
            ), ent_edges AS (
              SELECT e.prediction_a AS s, e.prediction_b AS d
              FROM ({ER_EXTRA_EDGES_SQL}) e
              JOIN present pa ON e.prediction_a = pa.prediction
              JOIN present pb ON e.prediction_b = pb.prediction
            ), sym AS (
              SELECT s, d FROM ent_edges WHERE s != d
              UNION ALL
              SELECT d, s FROM ent_edges WHERE s != d
            ), reach AS (
              SELECT s, d FROM sym
              UNION
              SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s
            ), labels AS (
              SELECT s AS node, least(s, min(d)) AS lbl
              FROM reach GROUP BY s
            )
            SELECT lk.mention_id, lk.mention, lk.prediction,
                   CASE WHEN lk.prediction = 'NIL'
                        THEN CAST(lk.mention_id AS STRING)
                        ELSE COALESCE(l.lbl, lk.prediction)
                   END AS cluster_id
            FROM linked lk
            LEFT JOIN labels l ON lk.prediction = l.node
        """,
        "j4b_jarowinkler": """
            -- golden VALUES (tools/make_goldens_r4.py): expected output
            -- of the real blocked JW top-k operator over the fixed
            -- J4B fixture, scores from the engine's own JW kernel
            SELECT * FROM (VALUES
              ('amsterdem', 'amsterdam', CAST('0.9555555555555556' AS DOUBLE), 'Q727', CAST('0.5' AS DOUBLE), CAST('80.0' AS DOUBLE)),
              ('landon', 'london', CAST('0.9' AS DOUBLE), 'Q84', CAST('0.5' AS DOUBLE), CAST('100.0' AS DOUBLE)),
              ('london', 'london', CAST('1.0' AS DOUBLE), 'Q84', CAST('0.5' AS DOUBLE), CAST('100.0' AS DOUBLE)),
              ('pariis', 'pares', CAST('0.8755555555555556' AS DOUBLE), 'Q90', CAST('0.125' AS DOUBLE), CAST('10.0' AS DOUBLE)),
              ('pariis', 'paris', CAST('0.9666666666666667' AS DOUBLE), 'Q90', CAST('0.5' AS DOUBLE), CAST('90.0' AS DOUBLE)),
              ('paris', 'paris', CAST('1.0' AS DOUBLE), 'Q90', CAST('0.5' AS DOUBLE), CAST('90.0' AS DOUBLE))
            ) AS t(mention, variation, score, qid, relv, abs_relv)
        """,
        "f4_ocr_variants": """
            -- golden VALUES (tools/make_goldens_r4.py): fuzz.ratio
            -- half-split classification over the fixed F4 pair fixture
            SELECT * FROM (VALUES
              ('sheffield', 'shefiield', FALSE, CAST('100.0' AS DOUBLE), CAST('80.0' AS DOUBLE), 'positive'),
              ('liverpool', 'levirpaol', FALSE, CAST('50.0' AS DOUBLE), CAST('80.0' AS DOUBLE), 'neutral'),
              ('birmingham', 'bermingam', FALSE, CAST('66.66666666666667' AS DOUBLE), CAST('80.0' AS DOUBLE), 'positive'),
              ('london', 'zigzag', TRUE, CAST('0.0' AS DOUBLE), CAST('0.0' AS DOUBLE), 'negative'),
              ('bristol', 'quamvy', TRUE, CAST('0.0' AS DOUBLE), CAST('0.0' AS DOUBLE), 'negative'),
              ('london', 'londonx', TRUE, CAST('100.0' AS DOUBLE), CAST('85.71428571428571' AS DOUBLE), 'neutral'),
              ('don', 'london', FALSE, CAST('0.0' AS DOUBLE), CAST('80.0' AS DOUBLE), 'neutral'),
              ('london', 'landon', TRUE, CAST('66.66666666666667' AS DOUBLE), CAST('100.0' AS DOUBLE), 'neutral'),
              ('london', 'lndn', FALSE, CAST('80.0' AS DOUBLE), CAST('80.0' AS DOUBLE), 'positive'),
              ('bristol', 'xy', TRUE, CAST('0.0' AS DOUBLE), CAST('0.0' AS DOUBLE), 'neutral')
            ) AS t(word, nn_word, nn_is_english, r1, r2, label)
        """,
        "f5b_bydistance_op": """
            -- golden VALUES (tools/make_goldens_r4.py): by_distance
            -- over the fixed coord/origin fixture; python haversine
            -- mirror, scores far from 3dp rounding boundaries
            SELECT * FROM (VALUES
              ('boston', 'Q84', CAST('0.859' AS DOUBLE)),
              ('london', 'Q84', CAST('0.875' AS DOUBLE)),
              ('toronto', 'Q92561', CAST('0.465' AS DOUBLE))
            ) AS t(mention, prediction, link_score)
        """,
        "ctx10_fixpoint": """
            -- constructed-fixpoint golden VALUES
            -- (tools/make_goldens_r4.py): closed-form s_10 of the
            -- damped coherence recursion on the CTX10 fixture
            SELECT * FROM (VALUES
              ('cA', 'cA:0:0', 'london', 'Q84', CAST('0.724' AS DOUBLE)),
              ('cA', 'cA:1:0', 'paris', 'Q90', CAST('0.455' AS DOUBLE)),
              ('cA', 'cA:2:0', 'berlin', 'Q64', CAST('0.435' AS DOUBLE)),
              ('cB', 'cB:0:0', 'madrid', 'Q2807', CAST('0.599' AS DOUBLE)),
              ('cB', 'cB:1:0', 'lisbon', 'Q597', CAST('0.599' AS DOUBLE))
            ) AS t(conv_id, mention_id, mention, prediction, link_score)
        """,
        "d3_simhash": """
            -- golden VALUES (tools/make_goldens_r4.py): independent
            -- recomputation with a from-spec python XXH64 + the exact
            -- vote/fingerprint arithmetic over the fixed D3 corpus
            SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(simhash AS BIGINT) AS simhash FROM (
            SELECT * FROM (VALUES
              (0, 4518801340735652051),
              (1, 2963762874044959150),
              (2, -1008705296979338747),
              (3, 4026695856805700506),
              (4, -1521799210754787044),
              (10, 4518801340735652051),
              (11, -6259046204266460754),
              (12, -1008705296979338747),
              (13, 2963758475998448046),
              (14, -6115498372780471894)
            ) AS t(doc_id, simhash)
            )
        """,
        "d3b_simhash_pairs": """
            -- golden VALUES (tools/make_goldens_r4.py): banding +
            -- hamming-verify mirror over the D3 corpus — exact copies
            -- at 0, planted edits at 1 and 3, the hamming-4 edit
            -- bucket-proposed but verify-excluded
            SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, CAST(hamming AS INTEGER) AS hamming FROM (
            SELECT * FROM (VALUES
              (0, 10, 0),
              (1, 11, 3),
              (1, 13, 1),
              (2, 12, 0),
              (13, 14, 3)
            ) AS t(a, b, hamming)
            )
        """,
        "ann_lsh_topk": """
            -- full SQL recomputation (tools/make_goldens_r4.py):
            -- seeded hyperplane constants embedded; margins audited
            -- (ann_margin_audit) so sign/rank decisions are orders of
            -- magnitude above cross-engine float noise
            WITH planes(table_id, bit, w) AS (VALUES
              (0, 0, [4.96714153011232673e-01, -1.38264301171184656e-01, 6.47688538100692490e-01, 1.52302985640802535e+00, -2.34153374723335972e-01, -2.34136956949180547e-01, 1.57921281550739145e+00, 7.67434729152908779e-01, -4.69474385934952110e-01, 5.42560043585964658e-01, -4.63417692812462256e-01, -4.65729753570256866e-01, 2.41962271566034115e-01, -1.91328024465779789e+00, -1.72491783251303277e+00, -5.62287529240972694e-01, -1.01283112033442380e+00, 3.14247332595273876e-01, -9.08024075521210894e-01, -1.41230370133529148e+00, 1.46564876892155405e+00, -2.25776300486535658e-01, 6.75282046879238373e-02, -1.42474818621345678e+00, -5.44382724525182660e-01, 1.10922589709866085e-01, -1.15099357742230279e+00, 3.75698018345671958e-01, -6.00638689918804980e-01, -2.91693749793276780e-01, -6.01706612229396920e-01, 1.85227818450893778e+00, -1.34972247379339209e-02, -1.05771092895590035e+00, 8.22544912103189030e-01, -1.22084364997102224e+00, 2.08863595004755404e-01, -1.95967012387977557e+00, -1.32818604889843050e+00, 1.96861235869123519e-01, 7.38466579995410433e-01, 1.71368281189970495e-01, -1.15648282388240528e-01, -3.01103695589288789e-01, -1.47852199036742737e+00, -7.19844208394708640e-01, -4.60638770959787502e-01, 1.05712222621891572e+00, 3.43618289568461410e-01, -1.76304015536273395e+00, 3.24083969394795002e-01, -3.85082280416316536e-01, -6.76922000305958727e-01, 6.11676288840867888e-01, 1.03099952249595095e+00, 9.31280119116198568e-01, -8.39217523222638540e-01, -3.09212375851214583e-01, 3.31263431403563957e-01, 9.75545127122359190e-01, -4.79174237845289952e-01, -1.85658976663817116e-01, -1.10633497400602820e+00, -1.19620662408067080e+00]),
              (0, 1, [8.12525822394198016e-01, 1.35624002857082293e+00, -7.20101215803338468e-02, 1.00353289789202416e+00, 3.61636025047634146e-01, -6.45119754605124274e-01, 3.61395605508413931e-01, 1.53803656646596920e+00, -3.58260391099515380e-02, 1.56464365581400622e+00, -2.61974510408974437e+00, 8.21902504375223830e-01, 8.70470682381712241e-02, -2.99007350465867461e-01, 9.17607765355022975e-02, -1.98756891460089280e+00, -2.19671887837511931e-01, 3.57112571511746413e-01, 1.47789404474151609e+00, -5.18270218273647387e-01, -8.08493602893187613e-01, -5.01757043584536544e-01, 9.15402117702074136e-01, 3.28751109659684460e-01, -5.29760203767038806e-01, 5.13267433113356097e-01, 9.70775493480403873e-02, 9.68644990532889216e-01, -7.02053093877352374e-01, -3.27662146597768211e-01, -3.92108153132157633e-01, -1.46351494813211858e+00, 2.96120277064576054e-01, 2.61055272179889331e-01, 5.11345664246088977e-03, -2.34587133375146917e-01, -1.41537074205041424e+00, -4.20645322765359042e-01, -3.42714516526769486e-01, -8.02277269221618905e-01, -1.61285711666009135e-01, 4.04050856814538395e-01, 1.88618590121053020e+00, 1.74577812831838958e-01, 2.57550390722764366e-01, -7.44459157661672144e-02, -1.91877121529904149e+00, -2.65138754492168782e-02, 6.02302099410264372e-02, 2.46324211248528613e+00, -1.92360964781122523e-01, 3.01547342333612467e-01, -3.47117697052433116e-02, -1.16867803761953204e+00, 1.14282281451502055e+00, 7.51933032686774139e-01, 7.91031947043046912e-01, -9.09387454794738925e-01, 1.40279431093609919e+00, -1.40185106279228089e+00, 5.86857093800270291e-01, 2.19045562580997855e+00, -9.90536325130688344e-01, -5.66297729602771915e-01]),
              (0, 2, [9.96513650876412194e-02, -5.03475654116199212e-01, -1.55066343106613269e+00, 6.85629748060273270e-02, -1.06230371372610488e+00, 4.73592430635181583e-01, -9.19424234233803150e-01, 1.54993440501753943e+00, -7.83253292336237084e-01, -3.22061516205675580e-01, 8.13517217369669754e-01, -1.23086431643395522e+00, 2.27459934604129416e-01, 1.30714275428242810e+00, -1.60748323456122755e+00, 1.84633858532304213e-01, 2.59882794248423532e-01, 7.81822871777310358e-01, -1.23695071087808195e+00, -1.32045661308427631e+00, 5.21941565616897640e-01, 2.96984673233186058e-01, 2.50492850345876539e-01, 3.46448209496975690e-01, -6.80024721578490809e-01, 2.32253697161003553e-01, 2.93072473298681246e-01, -7.14351418026367813e-01, 1.86577451114475656e+00, 4.73832920911787525e-01, -1.19130349720264861e+00, 6.56553608633829722e-01, -9.74681670227321439e-01, 7.87084603742452038e-01, 1.15859557900740406e+00, -8.20682318351710460e-01, 9.63376129244321810e-01, 4.12780926936498316e-01, 8.22060159994490003e-01, 1.89679298265394736e+00, -2.45388116002870499e-01, -7.53736164357489580e-01, -8.89514429625523295e-01, -8.15810284965438282e-01, -7.71017094141041998e-02, 3.41151974816643888e-01, 2.76690799330019055e-01, 8.27183249036023804e-01, 1.30018918779070194e-02, 1.45353407715731686e+00, -2.64656833237956080e-01, 2.72016916658961883e+00, 6.25667347765006210e-01, -8.57157556416282551e-01, -1.07089249806111231e+00, 4.82472415243185293e-01, -2.23462785325850899e-01, 7.14000494092091986e-01, 4.73237624573544846e-01, -7.28289126568727740e-02, -8.46793718068404977e-01, -1.51484722468586464e+00, -4.46514952067021076e-01, 8.56398794323472323e-01]),
              (0, 3, [2.14093744130203961e-01, -1.24573877871198802e+00, 1.73180925851181999e-01, 3.85317379728836784e-01, -8.83857436201132995e-01, 1.53725105945527907e-01, 5.82087184459998963e-02, -1.14297029783062309e+00, 3.57787360348283290e-01, 5.60784526368234393e-01, 1.08305124317527701e+00, 1.05380205203490296e+00, -1.37766936795709105e+00, -9.37825039915122782e-01, 5.15035267208659775e-01, 5.13785950912208800e-01, 5.15047686306047914e-01, 3.85273149065472120e+00, 5.70890510693166986e-01, 1.13556564018059891e+00, 9.54001763493202315e-01, 6.51391251305798002e-01, -3.15269244640345614e-01, 7.58969220493267427e-01, -7.72825214537571803e-01, -2.36818606740008875e-01, -4.85363547829103459e-01, 8.18741393863225558e-02, 2.31465856667350867e+00, -1.86726519259174806e+00, 6.86260190374513468e-01, -1.61271587118965165e+00, -4.71931865789433469e-01, 1.08895059696736607e+00, 6.42800190954627704e-02, -1.07774477792930612e+00, -7.15303709259968223e-01, 6.79597748934675838e-01, -7.30366631717136672e-01, 2.16458589581974864e-01, 4.55718399038137836e-02, -6.51600347605817087e-01, 2.14394408932532565e+00, 6.33919022318011227e-01, -2.02514258665760716e+00, 1.86454314769427643e-01, -6.61786464768387983e-01, 8.52433334796223963e-01, -7.92520738432700655e-01, -1.14736441466899014e-01, 5.04987278980457144e-01, 8.65755194170121478e-01, -1.20029640705577623e+00, -3.34501235840948374e-01, -4.74945311160956174e-01, -6.53329232573711893e-01, 1.76545424028109688e+00, 4.04981710960955532e-01, -1.26088395433504519e+00, 9.17861947054776084e-01, 2.12215619701263325e+00, 1.03246526055114685e+00, -1.51936996595401341e+00, -4.84234072866251364e-01]),
              (0, 4, [1.26691114918662273e+00, -7.07669465618780746e-01, 4.43819428146228434e-01, 7.74634053429336777e-01, -9.26930471578082948e-01, -5.95253560618000804e-02, -3.24126734006907258e+00, -1.02438764133428983e+00, -2.52568151393160301e-01, -1.24778318196484950e+00, 1.63241130393163525e+00, -1.43014137796063268e+00, -4.40044486696983761e-01, 1.30740577286091342e-01, 1.44127328906611551e+00, -1.43586215117943938e+00, 1.16316375215495960e+00, 1.02330610195870489e-02, -9.81508651047950931e-01, 4.62103474263270753e-01, 1.99059695573470030e-01, -6.00216877158794682e-01, 6.98020849900189144e-02, -3.85313596861760199e-01, 1.13517345251248042e-01, 6.62130674521046680e-01, 1.58601681614535206e+00, -1.23781549882684905e+00, 2.13303337465626663e+00, -1.95208779952250189e+00, -1.51785095035583323e-01, 5.88317206484576527e-01, 2.80991867735032652e-01, -6.22699519820593794e-01, -2.08122250357275218e-01, -4.93000934658832823e-01, -5.89364756944211532e-01, 8.49602097021024627e-01, 3.57015485965047341e-01, -6.92909595260654210e-01, 8.99599875433250706e-01, 3.07299520876609333e-01, 8.12862118838960090e-01, 6.29628841923612237e-01, -8.28995010922072284e-01, -5.60181040196969571e-01, 7.47293605123261817e-01, 6.10370265433464843e-01, -2.09015939641481324e-02, 1.17327383308781993e-01, 1.27766489578842490e+00, -5.91571388835829937e-01, 5.47097381170037922e-01, -2.02192652433894060e-01, -2.17681203227220288e-01, 1.09877685198719011e+00, 8.25416348988029847e-01, 8.13509636000638525e-01, 1.30547880715432907e+00, 2.10038416327590488e-02, 6.81952971294963906e-01, -3.10266756593456039e-01, 3.24166352488442111e-01, -1.30143054367684585e-01]),
              (0, 5, [9.69959649927181894e-02, 5.95157025436913623e-01, -8.18220683233472523e-01, 2.09238727568546024e+00, -1.00601738149970199e+00, -1.21418861278773216e+00, 1.15811087350006781e+00, 7.91662693962935871e-01, 6.24119817052155135e-01, 6.28345509264279900e-01, -1.22467728469146230e-02, -8.97254371485831537e-01, 7.58045581937263346e-02, -6.77161711512111686e-01, 9.75119733417751156e-01, -1.47057381502138651e-01, -8.25497196792511545e-01, -3.21385841652993443e-01, 4.12931454275624332e-01, -5.63724552803974710e-01, -8.22220395566431450e-01, 2.43687211491912303e-01, 2.44966571108722775e-01, -5.06943175371129762e-01, -4.71038305618322772e-01, 2.32049937357636293e-01, -1.44808434149732412e+00, -1.40746377437655523e+00, -7.18444221252436011e-01, -2.13447151711847249e-01, 3.10907565598004587e-01, 1.47535621694955199e+00, 8.57659623202019383e-01, -1.59938529963427112e-01, -1.90162079026888302e-02, -1.00252936463780884e+00, -1.85131359923899307e-02, -2.88658638920138322e-01, 3.22718560338089488e-01, -8.27230943552322961e-01, 5.19346514241172286e-01, 1.53273891300257770e+00, -1.08760148456857594e-01, 4.01711722098941459e-01, 6.90143991711112514e-01, -4.01220471885836261e-01, 2.24092481810416772e-01, 1.25924007817948599e-02, 9.76760985488317190e-02, -7.73009783855466481e-01, 2.45101742589427136e-02, 4.97998291245449753e-01, 1.45114360779504170e+00, 9.59270826085206862e-01, 2.15318245751155635e+00, -7.67347562888049506e-01, 8.72320636720678166e-01, 1.83342005738351743e-01, 2.18980293321767228e+00, -8.08298285355151469e-01, -8.39721842180776057e-01, -5.99392645444022154e-01, -2.12389572430980689e+00, -5.25755021680761048e-01]),
              (0, 6, [-7.59132661553697963e-01, 1.50393786476207630e-01, 3.41755975777159438e-01, 1.87617083921588623e+00, 9.50423838186050252e-01, -5.76903655662403092e-01, -8.98414671348357952e-01, 4.91919171506505715e-01, -1.32023320702064217e+00, 1.83145876585435374e+00, 1.17944012072128701e+00, -4.69175652104704799e-01, -1.71313452909087749e+00, 1.35387237416541284e+00, -1.14539845252617886e-01, 1.23781631197346176e+00, -1.59442765879436710e+00, -5.99375022953772874e-01, 5.24369971818316582e-03, 4.69805937647420555e-02, -4.50065471479243639e-01, 6.22849932347498747e-01, -1.06762042938259438e+00, -1.42379485021293495e-01, 1.20295631711898859e-01, 5.14438834058749017e-01, 7.11614878088889791e-01, -1.12464209183786923e+00, -1.53411417073562228e+00, 1.27767682189850906e+00, 3.32314011979591650e-01, -7.48486536556553617e-01, 1.55115197552252293e+00, 1.15674634292858666e-01, 1.17929718406382644e+00, 6.75184814101089520e-02, 2.06074792488198710e+00, 1.75534084244320443e+00, -2.48964148479073499e-01, 9.71570950954355417e-01, 6.45375949585147546e-01, 1.36863155753234866e+00, -9.64923460580104475e-01, 6.86051459998439306e-01, 1.05842448684958779e+00, -1.75873948642311428e+00, -1.18325851266577509e+00, -2.03923217776010057e+00, -2.69406834444557763e-01, 7.17542255795962314e-01, 1.50235705209602810e+00, 7.40947804197751858e-02, 1.62861554557129184e+00, -1.38010145821489139e+00, -1.70338243935515465e+00, -5.55476988966187787e-02, 3.84065448939307275e-01, -3.26947480940931109e-02, -2.06744210003987661e+00, -8.91200395127884071e-02, -1.30446950050485322e+00, 6.69672548830038461e-01, 3.66598246096848268e-01, -9.39879786327355249e-01]),
              (0, 7, [-5.13866917336693541e-01, -1.05921352188895157e+00, -6.26790972731718771e-02, 9.55142320501238262e-01, -9.85726046335543726e-01, 5.04046515517844407e-01, -5.30257618372440787e-01, -7.92872832262344174e-01, -1.07030359954557827e-01, -1.03524232241937408e+00, -5.53649305347182041e-01, -1.19787789258884847e+00, 1.96472513291638928e+00, 3.52635519717286114e-02, -6.99725507992585594e-01, 2.13979910734222012e-01, -1.12328049690829823e-01, -2.20969599533222982e-01, 6.14166700043425218e-01, 7.57507710047305105e-01, -5.30501147610527468e-01, -5.75818240644680013e-01, -2.75051697151644015e-01, -2.30192116473558483e+00, -1.51519106219855226e+00, 1.36687426744452467e+00, 1.64496771350128368e+00, -2.49036039556378319e-01, 5.76556963055766425e-01, 3.11250154543536106e-01, 3.07888080845523771e+00, 1.11957491143457677e+00, -1.27917591480766535e-01, -9.55540440600425756e-01, -1.60644632025757250e+00, 2.03463635867223103e-01, -7.56350745284303350e-01, -1.42225370959767417e+00, -6.46572884242526569e-01, -1.08154800361439496e+00, 1.68714163507256476e+00, 8.81639756949450515e-01, -7.97264131661737201e-03, 1.47994413889002585e+00, 7.73683076476183035e-02, -8.61284201328263666e-01, 1.52312407726965726e+00, 5.38910043684658668e-01, -1.03724615432645639e+00, -1.90338678083608187e-01, -8.75618253384757184e-01, -1.38279973096433606e+00, 9.26177547531641387e-01, 1.90941664047013049e+00, -1.39856757381914121e+00, 5.62969236690570862e-01, -6.50642569121826941e-01, -4.87125383764696052e-01, -5.92393924238869163e-01, -8.63990769679816029e-01, 4.85216279448269922e-02, -8.30950116411037776e-01, 2.70456825779838816e-01, -5.02381094491369529e-02]),
              (1, 0, [2.57399925344693359e-01, -9.08481432780661069e-01, -3.78503106058823258e-01, -5.34915598775570711e-01, 8.58073346071625220e-01, -4.13009982314726964e-01, 4.98188584487282871e-01, 2.01019924757198565e+00, 1.26286154451765431e+00, -4.39214856867634063e-01, -3.46437892988650631e-01, 4.55319659557246681e-01, -1.66866270701363217e+00, -8.62085495009812797e-01, 4.92910848123741530e-01, -1.24313396145486019e-01, 1.93513628740034216e+00, -6.18442654984388440e-01, -1.04683898621505733e+00, -8.89617588660202574e-01, 1.40405371971283506e-02, -1.60829686165783831e-01, 2.23035964883193838e+00, -3.99115718525523633e-01, 5.44445633645718532e-02, 8.84181815195119070e-01, -1.07980561342933892e-01, 5.55606984251820202e-01, 3.94906635950176887e-01, 8.37205022647297570e-01, -1.40787817039657726e+00, 8.07849413634902258e-01, -1.38283644641010006e-01, 1.87178585333995756e-01, -3.86658135513398338e-01, 1.65904872979199269e+00, -2.04706913109252264e+00, 1.39931698630617429e+00, -6.79007121202191866e-01, 1.52898513459595931e+00, 1.22121596325346848e+00, 1.01498851678269841e+00, 8.28129982349701255e-01, 2.26629270821019135e+00, -5.94955670133428871e-01, -5.81269537528415925e-01, -6.55894146183866655e-01, 9.25148853356873246e-01, -1.29916134425085361e+00, 1.01116686721076166e+00, -2.88440182766673436e-01, -1.06771306535530597e+00, -1.07760089755636379e+00, -7.96773763019412273e-01, -1.48604258186038662e+00, 5.14128765673556365e-01, 8.51790864443070173e-01, 9.58673437273429796e-01, -6.26484049126983744e-01, 3.07931012875535703e-01, 5.20568493555305118e-03, 6.91531907642524368e-01, 4.44862159077311692e-01, 9.02795324910445757e-02]),
              (1, 1, [-1.85834289934011054e+00, -1.66580043918831661e-01, 1.10876480137454630e-01, -6.94772644010993368e-01, -2.69175565938980788e-01, -1.29922515001078076e+00, -3.21105447102589314e-01, 5.05868742160464624e-01, 2.08905957120396435e+00, -1.01270925480027785e+00, -2.39740702696507671e-02, -9.61469050038540440e-01, -9.25661889665922860e-02, -2.23732081133194233e-01, 8.32892162099332034e-01, 9.74119578390406415e-01, 1.62818157698100430e-01, -1.14492020104335387e-01, 1.18646843261664547e+00, 1.79791650863178526e-01, 1.51644161763348539e+00, -1.63403201962811817e+00, 1.78197090099576538e+00, -6.17727700887187758e-01, -1.08639929285875669e+00, -4.47533280047115040e-02, -1.16370241974825661e+00, 5.68939495004218809e-01, -4.62643855540426363e-01, 2.87355104832527464e-01, -9.77338710838287383e-01, -2.22436258435933593e-01, 9.69317678801955573e-02, -1.88384348880479585e-01, 1.59160215837294450e+00, 5.85810827274781842e-01, 2.03675392015041534e-01, -1.85652070039857442e+00, 3.78189456170464178e-01, 1.23614031517166967e+00, -6.89971803535029848e-01, -1.98354692211746647e-01, -3.02573987292259972e+00, -1.24562622341173634e+00, -2.08403947151332147e+00, 1.04121646292625186e-01, -1.50233494071330770e-01, -1.05816503110712168e-01, -4.36954138975864048e-01, 1.01913631626523205e+00, -1.23280322633097228e+00, -7.41245382994439594e-02, 5.96389182751540403e-01, -1.79392562131269778e-01, -9.07950677743530471e-02, -8.25079628915643459e-01, -3.34969461095684595e-01, 7.18350807509532285e-01, -2.01946218467865979e+00, -1.58029049031140456e-01, -5.84215128072194334e-01, -7.03064977144652048e-02, 1.77318123002607542e+00, -4.46629292587387983e-01]),
              (1, 2, [1.48937457860916367e+00, 1.10030872137273206e+00, 2.98963179541422673e-02, 8.71058109166267525e-02, 1.81234942191612680e-01, -8.25171797187226663e-01, 6.26838766902041655e-01, -6.12697847098390813e-01, 3.57423355170694568e-02, -2.19596261149313055e+00, -8.63282689328387365e-01, 5.35099363039417630e-01, -1.12346329521130794e+00, 3.33965092721352330e-01, -5.07230455214017106e-01, 9.90150171128128420e-01, 1.25794396887216586e+00, 1.77624918714568925e-01, -1.48674164572243483e-02, 4.04361143270991208e-02, -2.14447696439440359e-02, 1.19165658299641652e+00, 2.50486468530244721e+00, -1.33346112677494899e+00, -1.02827265368744381e+00, 1.36316966408662621e+00, -1.14227459349274585e+00, -1.37202546491249144e+00, 2.11537143551649542e+00, -2.74274885505058519e-01, -2.50145423341225526e-01, -5.08830399932222788e-01, 5.81340729408416856e-01, -1.13310008061105250e+00, 1.77438922458731652e+00, 7.53046324002641154e-01, -5.18002317679008492e-02, -5.51705599461086660e-01, 1.08256940059672846e-01, 1.04396965142439613e+00, 2.61744262863620758e+00, 1.50876837435899303e+00, 1.01290248707266706e+00, 4.30457405473906249e-02, 1.23250461063862149e+00, -3.46410840938198017e-01, 3.31883383439652402e-01, 1.17069592838540659e+00, 6.06773691718519470e-01, -6.64692992764982171e-01, -1.53277387360108186e+00, 5.01496609652552272e-01, 1.34636439624915144e-01, 9.29989768560403829e-01, 5.78894617631870029e-02, -3.79583633532603826e-01, 1.05395310379753782e+00, 9.96313353084622544e-01, -2.10919341803676685e+00, -1.51911560484125241e+00, 1.29834625577475576e-01, -6.52378677591805012e-02, -1.86985049809639842e-01, 8.23932498241773614e-01]),
              (1, 3, [2.01549841496099846e+00, -1.03144813329409724e+00, -6.75177762757691313e-02, -2.53815583969659031e-02, 2.05293194831954712e-01, -1.22363973103576318e+00, 4.67429878339979454e-01, 3.67010157039632523e-02, 2.03889936493765545e+00, 3.84810791178717582e-01, -7.00527555084867748e-01, -1.49715470687529684e+00, -9.79447157378260519e-02, -7.49649593443272977e-01, -4.23670688355942848e-01, 3.45652458882612812e-01, 2.35017802568528944e-01, 1.93900517750985268e-01, 1.39226254928892468e+00, 4.07955693077045323e-01, 2.71348025569370455e+00, 1.61334925041512811e-01, -4.06896190305905014e-01, -1.49709346111233343e+00, -1.31437154706214843e+00, 9.06815142502474858e-01, 6.48932328633111566e-01, -8.96987259327300945e-02, -2.24378814215082323e-01, -8.87604847202426495e-01, -1.66367579959496359e-01, 1.23488974106825702e-01, -2.01768590087043620e+00, 7.25193107136715920e-01, -2.02724386048521810e+00, 3.36978331448997637e-01, -4.46983236929056824e-02, 2.92074071780861755e-01, -6.48498896228907662e-01, 1.69347824781947831e+00, 7.18092480238416875e-01, 6.35416171463702439e-01, -1.78935605046968232e-01, -7.52543547510636512e-02, 8.85698087500590092e-01, 1.30229071716928613e+00, 1.40017512555311052e+00, -4.63872983688201415e-02, 5.67013483931042214e-02, 3.31080217681842370e-01, -2.61780893538263615e-01, -7.09264919508022063e-01, 1.66459185530194037e-01, 4.73322651266026739e-01, 5.23704177015663852e-01, -7.55356577153806080e-02, -6.58039055094993164e-01, 4.99266013251092600e-01, 4.00997731966053650e-01, -9.19046917466136204e-01, 9.48829262538173013e-01, 7.59829845097256706e-01, -4.18670297074870135e-02, -1.25424169432711485e+00]),
              (1, 4, [-1.21413783672269138e+00, 4.34454723362752204e-01, -5.25444702150689058e-01, -2.74106356322583844e-01, -1.12888872582733701e+00, 8.23260251031410206e-01, -1.89178864638521516e+00, -4.76699908762730426e-02, 3.55195223688814232e-01, 6.11935762972933950e-01, 4.82252880116266769e-01, -1.21953097550522127e+00, -4.12492669730212203e-01, -7.44533144991319062e-01, -1.17209654648999706e+00, -1.76027645040330349e+00, 4.78578952367076815e-01, 1.17958863590154683e+00, -5.71415763477237104e-01, 7.66578579356784751e-01, 5.36613501878269505e-01, -9.04201140996410468e-01, -1.14481565528779042e-01, 4.15553125663578188e-02, 7.39158051237460034e-01, 1.09715434058049760e-01, -1.74291769831243193e+00, 1.83089364715106817e+00, 3.89009487920547015e-01, -9.94222188306302379e-01, -1.53735764648624995e+00, -8.71499073613383746e-01, -3.50581140301966576e-01, -6.79180620088271070e-01, -4.75297561542307789e-01, -1.01948081435160876e+00, 5.55473079984536766e-01, -1.04839440034884168e+00, 5.38877640750552001e-01, 6.78812314828498575e-01, -1.50368792985209132e+00, -4.72395665399720333e-01, 9.09275237994588648e-01, 1.57828234483856383e-01, 8.66318670847879391e-01, 1.08370715145315399e+00, -1.12692140285324860e+00, -4.36226132170735525e-01, 2.89316625715592912e-01, -2.83656706114920498e-01, 3.30181725702170137e-01, 1.46217801616097987e+00, -2.05153177036319412e-01, 2.12907413394436223e-01, -1.33382695707326582e-01, -2.06399379047089759e+00, -8.46096071705886077e-01, -2.22642369379004695e-01, -4.70058573460373108e-01, 7.83656441157365213e-01, 1.06945864264307877e+00, -7.05701227782109197e-01, 1.05539476280830846e+00, -5.36968123571989975e-01]),
              (1, 5, [2.90380757359273489e-01, -4.08366200296959636e-01, -1.36069391139877593e+00, -7.95709976503926830e-01, -1.66481906849153583e+00, 7.96988177466055214e-01, 1.34768234830877498e+00, 8.97694106053531948e-01, -3.18029813938665751e-01, 6.93112466542390782e-01, -1.96009030177169530e+00, 1.02299151574131497e+00, 1.85003508574199671e+00, 6.63744498117987192e-01, -5.10977121774206844e-01, 8.32570293830430574e-01, 5.44898172065014091e-02, -1.04336035541844296e+00, -1.36078278170400879e+00, -2.33627921363438767e-01, 2.10869578803085413e-02, -2.58093017788679591e+00, 2.90953327996890021e+00, -4.45434602976252259e-01, 1.29569825973915820e+00, 2.45551985276367540e-02, 1.26703653235642788e+00, 2.21587578912734617e+00, -5.48330614398357952e-01, -3.44829270116212561e-01, 5.93419368672475245e-01, 9.78155337448249673e-01, 2.15580049544059321e-01, -1.64852502931205902e-01, -1.40117540493374171e+00, 8.74782797927771000e-02, -1.03004241857909817e+00, 1.83332175538857803e-03, 1.21184944725475385e+00, 3.83789526957164950e-01, 3.48452618269746883e-01, -1.55169290936155924e+00, 4.79254710076703838e-01, -5.36605266193145747e-01, -1.94615666006638866e+00, 1.32265582075198962e+00, -2.55208826112315157e-01, 3.95285152714973526e-02, 4.71903462077983948e-01, 1.25848053010913197e+00, -7.54922211108585706e-01, 1.45808596522147171e+00, -4.49763565850725411e-02, -8.04700671402570067e-01, 1.09454755872626305e-01, -6.36966106152934364e-01, -1.03020210729669659e-01, 1.50493288208661724e+00, -1.89118126186978897e+00, 6.55671176807508110e-02, -1.70209575016319475e-02, -3.15571819432156175e-01, -4.66158507528985855e-01, 6.80421666468401853e-01]),
              (1, 6, [-6.06089422503253705e-01, -2.89466967358237337e+00, -1.50968467362059289e+00, -3.09903922664334031e-01, 9.05380959570516453e-01, 5.54224986823359078e-01, -2.15865464897641068e+00, 5.53621808439614727e-01, 1.07561074199213375e-01, -5.27852690655564283e-01, -5.10176920410566170e-01, 5.85797689352198780e-01, 2.91447762616228012e-01, -1.01056644330080525e+00, -1.08896299820770426e+00, 1.10536490837562867e-01, 1.85240097550504057e+00, 1.05020801416297016e+00, 5.94209232993707093e-01, -1.06745431235042276e+00, -8.14792368655924526e-01, 6.61038362174310112e-01, 7.99761918929172588e-01, -8.08993116668911716e-01, -1.68054860983169047e-01, -8.38370540372745610e-01, -5.80083017077296148e-01, 1.00553980954046440e+00, -2.83459059667454827e-01, -9.29610334058592613e-01, -1.48503877198857537e+00, -1.46995396497642483e-01, -3.09823385958004627e-01, 1.44467924460322905e+00, -8.52792580706362102e-01, -9.57753171417768501e-01, 6.26641791660170200e-01, 2.17937488097232152e-01, -5.93940625446770596e-03, 1.61012618900032850e-01, -4.61982112809414924e-01, 7.61419246863893756e-02, 7.63228318703368158e-01, -1.12172369323692056e+00, 8.87250509678549570e-01, 1.06826228494887165e+00, -5.19773174438143415e-01, 2.89684206936214306e+00, 1.88678513119487690e+00, -1.70327797349280652e+00, 1.01967808314878550e+00, 7.52137370915798908e-01, -1.08231076892542211e+00, 5.14951565793820953e-01, -4.70521562753713596e-01, 8.95820881500921873e-01, -9.71184449742948486e-01, -9.89626530675162597e-01, 1.88788287739297900e+00, 3.88455389932647263e-02, 7.76030293609137778e-01, 9.88192382980133788e-01, -1.31855786063129476e-01, -4.17463181770706016e-01]),
              (1, 7, [5.11268782705396330e-01, 1.78870888037749198e+00, 1.58627516575395339e-01, 4.28495219378810244e-01, -1.82155957171559274e-01, 3.48195006686342623e-01, -4.97230996838316119e-01, 3.70526133557036452e-01, 9.92352070377579554e-01, 1.44199713097715598e+00, 9.47170554700965117e-01, 4.66414661041672507e-01, 1.98314675203258273e+00, -5.42293024100908433e-02, -1.70077635555664852e-01, -1.82114392664641578e+00, 3.32444318477480016e-01, 6.81666259451639611e-01, 1.12688971997073306e+00, -1.02582556294558272e-01, 2.33328152314545267e+00, 8.94565501784872263e-01, -1.05598580016988164e+00, 4.02942971765975710e-01, -4.91536405943287808e-03, 1.34543025649978709e+00, 5.61183349008055610e-02, -8.24605123239827376e-01, 3.25967157628623938e-01, -5.33558658123313934e-01, -1.74309776382270942e+00, -8.36409109009803142e-01, 1.59499168737916669e-01, -5.37975971574542022e-01, 1.31101436505690683e+00, -1.31502343399889488e+00, -7.67540028771493632e-01, -9.94839618172252305e-01, 1.71386002811840105e-01, 1.38665542784780871e+00, 2.29793015841509678e-02, -1.92333861010604928e-01, 1.25677608346784431e+00, 2.31918197253016922e+00, 3.99549645669584452e-01, -1.93109493340136185e+00, -1.25372107207125261e+00, 5.49800034056756148e-01, 3.79980034608958794e-01, -2.12970338103283874e+00, 5.19211021559075614e-01, 6.45046743433821956e-01, -1.34151827452328853e+00, 1.63940804472367407e+00, 1.77661749976288280e-01, 5.63809792759718653e-01, -5.41851239118301131e-01, 1.71503770805498568e+00, 2.35857415662459502e+00, 2.02698454626444341e-01, 1.53312305856564279e+00, -1.09498613358007613e+00, 7.66234151908941896e-02, -9.15877812357450694e-01]),
              (2, 0, [-7.50614717255872810e-01, 1.31635732471181943e+00, 1.24614002864343032e+00, -1.60491574125859437e+00, -1.46814367897990494e+00, -1.71507045797336843e+00, 1.85878369151255440e+00, 8.75879762658034883e-02, -5.23221964247341312e-02, 5.55471636654649603e-01, -9.63403694149562950e-01, -1.80321465480221321e-01, -1.18340915610954456e+00, 6.05445920693865602e-01, -9.51650553421984791e-01, 3.60856059778754179e-01, 1.06061025610087745e+00, -1.17152178412646468e-01, 8.25664850541312667e-01, -1.20981355181422523e+00, -1.19050361630273160e+00, 2.19871821031379172e-01, -2.12919130124275352e-01, -1.41149914340518934e+00, -4.82981015542279180e-01, 1.20176208238220439e+00, -7.05803032501851613e-01, 2.51813547185542677e-02, -3.91128154803728811e-01, 1.93139123519037892e-01, 3.49290931944860883e-01, 5.91188382125507061e-01, 5.20409869690360294e-01, 8.25222389118929422e-01, 4.26203507195573983e-01, 1.95640025819843216e-01, -5.14112178218311344e-01, -3.07368881525976523e+00, -3.95159070342554375e-01, -7.95399183962078093e-01, -7.03201511663048007e-01, -1.73739267703832390e+00, 7.50808257987122696e-01, -1.86395314445365257e+00, 4.18510984387386653e-01, -2.35333837160404624e-01, 4.32107174188148868e-01, 8.70291930391128732e-01, 2.00862218690993100e+00, 1.37177090774911070e+00, 1.05859788663535559e+00, 1.44533756415979187e+00, 4.88232904402643580e-02, 9.03295202905331635e-02, -4.80256812760897212e-01, 3.00662735595154940e-01, 1.11297982822227848e+00, -1.93150462082181291e-02, -8.07598399454374284e-04, -6.38530233574452377e-01, 1.59468336560420876e+00, 1.86129868484506550e-02, 5.61408670017661926e-01, -1.98476821683682914e-01]),
              (2, 1, [4.63207552049193672e-01, -1.81909398116494136e+00, 1.32924819210730932e-01, -6.17079638047052459e-01, 1.30817950411396100e+00, 7.75837712559967141e-01, -2.80170397182772146e-01, -7.23937712902752328e-01, -9.43310038605451262e-01, 5.61686243050293799e-01, -6.92792641357375838e-01, 1.70175957827658531e+00, -1.05172260506901472e+00, -6.61151556796549356e-01, -1.01089971023414327e+00, -1.45888071277078835e+00, 3.90553333338638675e-01, -8.10444200969480111e-01, 1.15767193305931215e+00, 3.17631166889461650e-02, -1.89692831008194496e+00, -8.64950953608445317e-01, -5.71974963108037374e-02, 1.23101785397713681e+00, -5.33551498118602141e-01, -3.35974342433364714e-01, -1.55572380757061657e+00, 1.21863875226534124e+00, -2.25764274644114904e+00, 2.21017835604506996e-01, -5.51716491790576261e-02, 2.81184497777352438e-01, 5.98645680991067075e-01, 1.02717436181964761e+00, 6.94197135750995210e-03, -1.75330972967395526e+00, 1.54923037649383288e+00, -6.45376818916813755e-01, 8.79338161505063276e-01, -3.18381869739501888e-01, 7.27357906709251156e-01, -6.55816767790946692e-02, -4.51052294410122567e-01, 8.53530308296249651e-01, -2.53568225946540737e+00, -3.87483505908246817e-01, -2.10749839022721305e-02, 3.16222124704127083e-01, -6.29815553976953990e-01, -1.97968150264463771e+00, 2.76684719411388669e-01, -1.23644370662930414e+00, 5.73334637956413928e-01, 3.18485718740180002e-01, -7.87196879711560826e-02, 1.47719316851682048e+00, 1.12812903620506488e+00, -1.08470931934807746e+00, -1.85112688265550718e+00, 1.33313831195647703e+00, 2.24091373058207743e+00, -7.83068448693316266e-01, 2.43543789755077594e-01, -1.01005284201048773e+00]),
              (2, 2, [-7.17658004741453914e-01, 2.90084818249586318e+00, 3.85936083600488311e-01, 3.98201730737797882e-02, 1.07510717961753613e-01, -1.28453573023370726e+00, 3.41980156021178427e-01, 1.83181262659276656e+00, 1.44934311419000283e+00, -5.28121836798092659e-01, -9.10642767842196887e-01, 6.51202061235257035e-01, 1.63481317543739540e-02, -1.36787137293712752e-01, -7.77654562325133303e-01, 7.96829721407332658e-01, 3.83116318893309271e-02, -6.00691301860341795e-02, 7.48799733863823175e-03, 3.84785473611847118e-01, -1.02671931428316032e+00, -1.07990219323238490e+00, -2.57441122999997907e+00, 3.04598285985431205e-01, 1.89247752467841690e+00, 1.01624907728080816e+00, -4.37399978287402458e-02, -1.15757609471777179e+00, -3.95646716270137033e-01, -6.70121784228343564e-01, 3.19785559398839292e-01, -2.95580520234526078e-01, 4.07370099887368720e-01, -4.44788842874923374e-01, -1.39087700310740603e+00, 1.67561130251715529e+00, -1.38062671936775549e+00, -1.27675760646872805e+00, -7.76060461637561927e-01, -5.93263821099295874e-01, 7.55447995004902451e-01, 3.60840508205365118e-01, -4.93165930395149610e-01, 4.75999802862422605e-01, 2.20415805220731542e+00, 3.66666582090333315e-01, 2.14712074134759290e-01, 7.06339106224431079e-01, -9.03900216756758690e-01, 2.79546779646416921e+00, 1.51680791752234856e+00, -5.71381072389216427e-01, 5.59225029353458192e-01, -2.09877141484704799e+00, 3.26303554959700148e-01, 2.09628247731247393e-03, 3.82765375304905398e-01, -6.51913952858256041e-01, 1.08621303251801216e+00, -9.43873516836900461e-01, 1.19601141371462938e+00, -4.15405877915933419e-01, -1.85641804713602765e+00, -5.00293793144382160e-01]),
              (2, 3, [1.78572082413108624e+00, -1.63732652994322669e+00, -1.07880916102128377e+00, 3.19483706518369603e-01, -1.00178327609008933e+00, -4.56294107291915885e-01, -8.10443481434107271e-01, 6.33946711398636453e-01, -2.59975518701640096e-01, 1.19709218912083304e+00, -1.63828855535828177e+00, 1.42868923279552629e+00, 7.68557920726892996e-01, 1.72604597090356249e-01, 3.82312977326173031e-01, -5.08245773830942715e-01, -9.73836590360926513e-01, 1.70833885467564595e+00, -1.42748445644195532e-01, -1.19235545353293015e+00, 4.20415518698710911e-01, 2.10562839543256136e-01, 7.93614879985287902e-01, -4.94471703471103252e-01, -9.24122448734726931e-01, -1.12531089772778303e+00, -1.09798290336660487e+00, 6.58223755716422221e-01, 4.48532263090237249e-01, 8.36437878394443945e-01, 4.38321524373292415e-01, -5.49413910226539293e-01, 2.32749537999290323e+00, -1.95127512337576192e-01, -1.76831306606998773e+00, 8.16731776376452112e-01, -3.95341583881020919e-01, -2.96542745115813189e-01, -2.43974328332817431e-01, 3.30637074947616350e-01, -1.18980735834005524e+00, -4.42183975947340158e-01, -2.87435385286529278e-03, 1.29576269443860714e+00, -8.63947856748723542e-01, -6.02024473652161607e-01, 1.16977573053432438e+00, 5.92351422570742248e-01, 1.60566756754429912e-01, -7.47435884037589093e-01, 1.04016265411701325e+00, -4.33021006555187465e-02, 7.13276464955231448e-02, 7.74721315021763141e-02, 9.00842166419655865e-02, 8.31625212926943469e-01, -3.08715505672099821e-01, -2.33406878232404313e+00, -3.62265857824691562e-01, -6.55788475477796506e-02, 1.02739437044941512e-01, -7.21686037589730156e-01, -1.35838920181605194e+00, 5.13200038819580207e-01]),
              (2, 4, [7.39198315390523386e-01, -1.68496372818357698e+00, -3.15856113444774933e-01, -7.98068568725952443e-01, 2.82745893789034197e-01, -3.90413866561636125e-01, -1.52486309103036244e+00, 1.14199506742614165e+00, 4.18777311950729925e-01, -4.45320335181682569e-01, -1.04103843713181843e+00, -1.19685385392715515e+00, -2.63833768395782764e-01, -1.92896319014635775e+00, 1.70612558231896294e+00, -7.15680189539896427e-01, -6.97327642874644021e-02, -4.26111955146813270e-01, 2.02447350566546308e-01, 9.03836114210014974e-01, -2.65991901149757437e+00, 6.94797951897870414e-01, -1.29671280656900423e-01, 1.08101380594695606e+00, 4.00063866633757870e-01, -1.55756723119151808e+00, -1.23040778954435082e+00, 1.19930052040877388e+00, 8.18238627348410130e-01, -2.79438965271769257e-01, 6.57947572595861341e-01, -6.14740292362096930e-01, 9.85176529006827617e-01, -2.81625780245805424e-01, -7.84137232165319609e-01, 1.65156033804526647e-01, -2.46203690495747973e-01, 4.99333286326712089e-01, -4.40086404595756597e-01, -1.00713952684308439e-01, 2.50550925067489771e+00, 9.43319816216952156e-01, -2.95344414051102677e-01, 1.74079164703278277e-01, -1.13408416247577537e+00, 1.48910798026375923e+00, -1.67259090084124706e-01, 1.05472038905056120e+00, 9.82369509016598919e-01, 8.51689715147259774e-01, 8.47502141394064656e-01, 9.89684252392548536e-01, 2.01002793918950706e+00, 4.30408122013519079e-01, 4.96413854503302221e-01, -1.96928246215293101e+00, -6.00462512623832323e-01, -1.20497626788844392e+00, 3.09427373837097897e-01, 7.19785883636636981e-01, 5.64630006294979503e-01, -1.35485653695188302e+00, 1.23631232664601431e+00, 6.18576671344322371e-01]),
              (2, 5, [-4.87003448003717546e-03, -1.13862309386307747e+00, 1.32836767935409494e-01, 4.84776353036821039e-01, 1.11584979088026870e+00, -7.86413167766967791e-01, -3.67192335548669369e-01, -7.72667652251699977e-01, 3.46435884036407515e-01, -1.35870456085729230e-01, -5.83473109086318428e-02, -6.26833515382961615e-01, 9.00293723595009920e-01, 9.74359373391967765e-01, 7.76156395668025301e-01, -1.60638086547048586e+00, 3.64282663433434684e-01, 6.88325897778393148e-01, 5.54367300082222944e-02, 4.66659663264391844e-01, 1.16721146087652561e+00, 7.00063690542396477e-01, 1.10866608588404869e+00, 1.76651022372972855e+00, 1.12836245117468548e+00, 4.50592231690045364e-01, 4.49668794634032365e-01, 3.41955627831802889e-01, 8.63236269163229597e-01, 2.87076420487324790e-01, 6.71685609241971515e-01, -1.59297266673810806e-01, -2.06793119784645429e-01, 6.44471879911321488e-01, -2.54045893039246407e-01, -6.62709418803833938e-01, -8.49795130137023097e-02, 4.20560322899642514e-01, -4.79147672484587173e-01, 1.68378227715698103e+00, -1.66870107851803083e-02, -9.23033176869107574e-01, 2.73696690462327696e+00, -2.97538442956807925e-01, 1.88396702445155317e+00, 7.15268705367305135e-01, 4.90914139163007857e-01, -6.60771265943196906e-01, 1.88106338600000644e-01, -7.49711149081124684e-01, 7.75335758605051661e-01, -9.75295677229848501e-02, 6.36820391204888092e-02, 2.25784307752873392e+00, -9.65632552343660078e-01, -1.21011762520463328e+00, -4.28610485957036824e-01, 6.13109096403117282e-01, 1.71595976647541959e+00, -3.99952212465746748e-01, 9.37186164519030140e-01, -6.63941390454491742e-01, 1.32031622935570876e-02, -1.81633901087363014e+00]),
              (2, 6, [-1.37797720144888070e+00, 9.40868608522748562e-01, 1.10884824864986586e+00, 1.00234500132737669e+00, 4.66387301637812113e-01, -2.69210037309418704e+00, -6.88601716322026824e-01, -1.44214618767551661e+00, 3.31792617178720342e-02, -2.08384654808690784e-01, 9.70269066054361473e-01, 1.61573878304022278e+00, 1.15043976363383393e+00, 4.08361551940055023e-01, 1.68591349812710778e+00, -3.08257009182548725e-01, 1.03645871109372911e+00, -5.94983386599481023e-01, 3.63771666252413861e-01, 1.05483070801246748e+00, 4.38313502015375889e-01, -7.06100682031825300e-01, 2.16981452593915242e-01, 1.01161491762924016e+00, 9.66350460210579021e-01, 2.66137067595597721e+00, 7.41336889441417179e-01, 4.84381885828743031e-01, -1.56274270170612284e+00, -3.48978314976664705e-01, -1.14475224696698152e+00, 1.69570063237273150e+00, -1.47098055395533917e-01, -1.22355358876554110e+00, 1.38596309337783385e-01, 6.56113829142374733e-02, 6.91272579784064312e-01, 4.79722440790142812e-01, 6.34217423303804151e-01, -1.75590442188121761e-02, 3.60184570965945472e-01, -1.71750986477220069e+00, -1.56478892698414440e+00, -2.42976607969651509e-01, -2.72370911092043477e-01, -1.42602571873040551e+00, 1.19183004454001651e+00, 1.20814142244798986e-01, -4.01824209803857024e-01, 3.41034975312066502e-01, 8.12183139229198381e-01, -1.67380937584359146e+00, 8.18564218251203068e-01, 2.43517088496764650e-01, 7.02375521981730144e-01, 7.16637502196379561e-01, -1.05465519706885713e+00, 1.25542851339183237e+00, 9.78878561720908591e-01, 1.45686736520669258e+00, -9.41303082151071502e-01, 5.97628828566979964e-01, -7.70682369605529716e-01, -1.06485848397177740e+00]),
              (2, 7, [1.33225199040741216e+00, -6.35013391888420209e-01, 5.06263583707465825e-01, -1.26487553154554816e-01, 9.84829804701235267e-01, -4.08630421317721426e-01, 4.51972551127659938e-01, 8.59424573259520153e-01, -2.85201442618226730e+00, -1.47141197260137108e-01, -1.23375870672156340e+00, 1.61226407223407353e+00, 8.14644898832810105e-01, 1.13140691034528118e-01, 8.95815072740936302e-01, 3.94524213585652650e-01, -6.17578605804495862e-01, 1.56785316658352514e+00, 1.84722286781129830e+00, 1.04416756518709741e+00, 1.07092308923152224e+00, 5.87769434424494364e-02, -3.97481124805259489e-01, 9.25707784404178669e-01, -6.27155916848384676e-01, -2.42409442398976820e-02, -2.91328442320877623e-01, -9.56733415544446575e-01, 5.95173449860730286e-01, -5.57561447807372670e-02, -1.11383901966107923e-01, 1.69081167839231861e+00, -5.46500028197257404e-01, -1.03580749134652894e+00, -7.19374022116417655e-01, 4.22197411601479777e-01, 1.32515717926330656e+00, 1.48627877197310271e-01, -1.04587788823391192e+00, -1.75385426863797234e+00, -3.83988034821659663e-01, 1.43918470017309308e+00, 3.61083725270547717e-01, -8.79129427295033516e-01, 2.74736788325632586e-01, -6.78710944603027166e-01, -2.40220389853425115e-01, 8.15805019349478244e-01, 9.11363096095758385e-01, 4.15503043841694675e-01, -7.64923638807769035e-01, 5.81254397228316622e-01, -6.99924768119622870e-02, -7.16978812380879238e-01, -9.91926945896613343e-01, -3.12446609993468516e-01, 1.22562131024172682e-01, -6.63009797722475674e-02, -3.01623036487298801e+00, -3.70292412388324110e-01, 1.86979507420510993e+00, -1.27218578333408971e+00, 1.04937562767363102e+00, 7.98932753740109636e-01]),
              (3, 0, [2.63747728495618457e-02, 2.60321701422650764e-01, -3.95145541517793020e-01, -2.04300905038261843e-01, -1.27163265471940257e+00, -2.59687863025701393e+00, 2.89680911850546452e-01, -8.73304643812227166e-01, 3.94072656561282708e-01, 9.35105543884909962e-01, -1.56847075559871964e-02, 2.59595966253330923e-01, -1.47331424109024200e+00, 8.01926596076253717e-01, -1.75075238667151933e+00, -4.95051931424386527e-01, -1.00860080932311447e+00, 2.52441858744020947e-02, -1.21506854681313420e-01, -1.54687318192001411e+00, -6.06943973539644466e-01, -1.39381267235595208e+00, -6.27695494561452794e-01, 3.32632154355982035e-01, -1.54136684184657868e+00, 1.67029982037159708e+00, -4.99545865311317228e-01, 6.73128964566060861e-01, 2.24808957318187508e+00, -1.65426275104924247e+00, -4.74397016173274344e-01, -3.01915240900657356e-01, -9.31026377087505796e-01, 1.11098605969337361e+00, -1.89682958446137750e-01, 1.27840959099342455e+00, -5.54077118956402437e-01, 3.54302739992636173e-01, -4.40276172333955773e-01, -4.24448827288050889e-01, 2.28081624851448339e-01, 5.79044166957351947e-01, -8.54188353200650563e-01, -8.41340333552470065e-01, -6.55704112197296074e-01, -1.46882701549920891e-01, -1.41197550095084745e+00, -2.70556824555200193e-01, 1.12930330449674732e+00, -1.34025807157618382e+00, -2.49296028258278873e-01, 1.76349221254545818e+00, -5.91959426839178793e-01, -9.07811681217370214e-01, 2.71799617386903669e-01, -4.56167057055302874e-03, 8.54106936278774764e-01, -1.59000488392722783e+00, 5.60489869110758626e-02, 1.05862566516007992e-01, -9.08375776464142581e-02, -7.13876056026259920e-01, 2.03715393901839015e-01, 1.20303183742202879e+00]),
              (3, 1, [8.43130685233932642e-02, 1.63933923342093557e-01, 3.73751549973191488e-01, -2.26906850280202604e-01, -6.71274404587539619e-01, 3.14109879425016725e-01, 1.48441811309434302e+00, 6.52164157993826321e-01, -2.32573367583071677e-01, 1.18474618655969599e+00, 9.20947312019239628e-01, 1.21650078867657219e+00, -1.88326280520718137e+00, 2.21291977336542350e-01, 1.81659525459501259e+00, 1.74288397507663650e+00, -6.04777874290613193e-02, -5.89547848109502226e-01, -8.22029592653203633e-01, -5.22181571015284396e-02, -8.52374685916292008e-02, 4.31052828382546604e-01, -1.96679559473172755e-01, -6.60591412336292483e-01, -2.46496644517057412e-01, -2.09542803758410029e-01, -5.06211009632515418e-01, -1.43862119574540959e+00, -2.04010995916634519e-01, -5.67434387216601110e-01, -3.48778935969484616e-01, -1.03018823283291705e+00, 5.85846256826165201e-01, 3.71829740546901377e-01, -2.40714546772078153e+00, 9.63983151743084021e-01, 9.65040941376785200e-02, 4.28766026857869520e-01, 5.97333648484635549e-01, 7.30086371690938263e-01, -1.19146081615011257e+00, 1.51457751132208340e+00, -6.97644336541765275e-01, -3.26239369778320465e-01, 7.83164836122184127e-01, -1.68712473568196142e+00, 1.41641081049158868e+00, -6.29154711511367259e-01, -5.16196368503516245e-01, 2.44659326832201574e+00, -1.58220064721940545e+00, -1.80563588488263771e+00, 3.77999300158592511e-01, -1.02358618031803084e+00, -9.57976479322890984e-01, -2.01070650652903554e-01, 3.03923047483026287e-01, -2.38567200482070862e-01, 5.59678624984495388e-01, -1.37887509057371016e+00, 1.36981118033208893e+00, -1.81244200107464137e+00, 1.31677202568750790e-01, 1.76020474452450459e+00]),
              (3, 2, [-5.29086172812306077e-01, 9.78129154223037811e-01, -1.06102262860408114e+00, -1.36769402230189607e+00, -1.84261361242853638e+00, -5.17962947830153508e-01, 1.62741182010376906e+00, 3.22508421484905439e-01, 6.98535709046193443e-01, 2.99363397582906243e+00, 2.28435327590787635e-01, -2.79146114248086386e-01, 2.32192766197966888e-01, 9.82159164860141431e-01, 2.32344383967099839e-02, 3.26129736255465708e-01, -2.78427484814781134e-01, -8.75744783521764658e-02, 1.47116859045588044e+00, -4.71773949220419320e-01, 3.09844580753603105e-01, -1.60237314373107897e-01, 2.00864355434983127e-01, -8.92667943605218173e-01, 1.95882748856179817e-01, -2.57309681854578746e-02, 9.26871358532111000e-01, -2.92842266807112506e-01, 1.03782647743388723e+00, 1.42150844573246982e+00, 3.94952127249544982e-01, 1.39935425592233376e-01, 2.65630509774912316e-01, 8.53374379517300885e-01, -1.01551274878551340e-01, 1.21482876860628530e+00, 1.09508508358118939e+00, 1.31640606636786950e-01, -4.01440910602159917e-01, 1.30835935692397309e+00, -9.31337209017290335e-01, -5.81923538993003087e-01, -1.13892814599029779e+00, -5.24104121352266583e-01, 1.12368377066697689e+00, 5.34572181293532012e-01, 2.00263953842446524e-01, 4.80094331858292200e-01, 1.30269681181493002e+00, -4.22085609991393329e-01, 4.76633140952207879e-01, 5.13156583718715087e-01, -1.82779004801744999e-01, -7.96836825805816162e-01, -1.43145937172396964e+00, -1.37173821505895943e+00, -5.02561468710143955e-01, 6.94990739639679056e-01, 4.46050861203066196e-01, 1.67882964070875396e+00, -3.18674734669862847e-01, 8.79243841784043023e-01, -9.38281958224110646e-01, 8.97185130387446628e-01]),
              (3, 3, [8.78532366108610852e-02, 1.18543033384478780e+00, 5.82390633658413162e-02, -2.42703647959865254e+00, 8.76657784868948631e-01, 7.91510392020175368e-01, -1.67547143444425695e+00, -9.82354296989926490e-01, 6.43440698446950621e-01, 5.48016409735339716e-01, 1.71840188667950011e+00, 1.29455947735253019e+00, 2.71203870667047816e-03, -1.59757497260185444e+00, -2.03133827356496183e-01, -9.81692816329224061e-02, 4.91916278585730268e-02, 1.52655133248041297e+00, -9.27989404184522582e-01, 9.24659789860007075e-01, 2.11015533360678287e+00, -6.43596285655317790e-01, -5.89602980633330831e-01, 8.63182206865814483e-01, 1.17697126893516568e+00, -2.48156145978358084e-01, 1.33364600818610429e-01, -1.28395035996469287e+00, 7.59125058083326643e-01, -5.95459987730078799e-01, 6.03357011314676409e-02, -2.69500577640288397e-01, 8.55155315929603810e-01, -4.81571390714901515e-01, -9.25456914011599130e-01, -4.64454455214374021e-02, 1.09452089637664773e+00, -1.78284400633414913e-01, 1.81978493651522699e+00, 6.62324966290445905e-01, -2.88364864230386264e-01, -6.19009112332273848e-02, 4.90461248121122573e-01, 1.22622422398183395e+00, 2.17381557781986068e+00, 1.17705987199122686e+00, 9.00201895908851357e-01, 7.94379944272124661e-01, 1.18822765031645083e+00, -1.29462942173994833e+00, 9.87445741750894834e-01, -4.44868002784706840e-02, 1.18239776309033573e+00, 1.54290984102827955e+00, 4.07448003347540944e-01, -1.22132638866777299e+00, -8.23977128860685970e-01, -1.24405286640640655e+00, 1.27443687277854512e+00, 2.74026197170992060e-02, -1.84168264966141226e+00, -5.33434467500322418e-01, -1.59859945045227736e+00, 2.07409977971125481e-01]),
              (3, 4, [1.50136364433823744e+00, 3.10202551508653679e+00, 6.95919878664025049e-01, -7.26133214729356102e-01, -1.04099380183913470e+00, -1.20678361435197057e+00, 1.02096400282777267e+00, 1.75370289056747952e-01, -3.12798435249522833e-01, -4.00611536757385533e-01, -9.25781117821912192e-01, -1.26407497521487411e+00, -2.11891668554423040e-01, 3.21801654062730091e-01, -9.62391925138874837e-01, -5.76778336262806612e-01, 9.28027701565329100e-01, -5.77983036945258766e-01, 4.65991995069520604e-01, -2.33404070405148234e+00, -1.81580834628819110e+00, -4.89798537601926487e-01, 1.08234728201689578e+00, -2.75956014387458204e-01, 1.13934051070462461e+00, 6.78184560353195964e-01, 1.10393578621502675e+00, 2.35839423297795348e+00, 8.40628754453499050e-01, -3.36497179850536510e-01, 1.83685312788486377e-01, 4.06361033179532261e-01, 2.19488876333858135e-01, 9.39081466258539055e-01, 2.58928767777366176e-01, 8.20043962778598590e-01, -1.95194622805644535e-01, 7.01824190888971411e-01, -5.56458255575608685e-01, 8.90396310867963003e-02, -1.10350912604584267e-01, 7.60509953458668009e-01, 3.41091136683611129e-01, -4.29816726250169603e-02, 1.04498414772198189e+00, 7.51103047993249118e-01, -8.26128199126465623e-01, -1.94184452829377741e-01, 3.43066834649529695e-01, 2.05971161497999899e+00, 1.26906011699074717e+00, -4.09477146137855075e-01, -9.44055371870859639e-01, 1.37324151006825712e+00, 1.11461876568892462e-01, -1.07504701527299829e+00, -7.26213156310008490e-01, 9.35942411394723894e-01, 8.34386799949933256e-01, -1.30265670703882758e-01, -9.30688249809566881e-01, -6.74562109797321785e-01, -4.09372067685281393e-01, -1.35066784801618156e+00]),
              (3, 5, [-2.23987502416739731e-01, -8.76075282590327742e-01, -1.76089039259360175e-01, -1.18734686159766767e+00, 5.60112685856698711e-01, -3.36180288644733538e-01, 8.50604159523615788e-01, 3.88191970142414355e-01, -2.91080042877461601e-02, -1.00636843370068707e+00, 3.11201538022624846e-01, -1.19527872393106693e+00, -1.00866448497455297e+00, -2.46214551881973970e-01, -1.68411892823691600e+00, 2.61694239002229123e+00, -2.38583153268193182e-01, -2.05652888432723824e+00, 1.35116291782931208e+00, 5.62451674450034189e-01, 5.04301347460527016e-01, 2.82205870933359415e-01, -1.36665869275190666e+00, 7.10387610452127838e-01, -5.63690189560551280e-01, -1.01816538197519946e+00, -4.49020047914858833e-01, -3.47801674393298177e-01, 4.66789179525440245e-01, 1.61832941847687728e+00, 1.01077678360745882e+00, -8.52217625881928509e-01, 1.47097801099147940e-01, 5.76133516759647635e-01, -1.94441155370300911e+00, -2.70356495484291015e+00, -2.17583431783989178e+00, -1.82389553794592651e-01, -3.19229477882258639e-01, -6.57475564283819952e-02, 5.89611490161063623e-01, -7.45254701708798706e-01, -2.78242783415488082e-01, -1.20060272195463735e+00, -1.03393303884456023e+00, 4.41237590113977285e-02, -7.57190953304712339e-02, 5.66512631226180119e-01, 1.15886653457697553e+00, -2.67734915672524831e-01, 2.34336723466812918e-01, -7.05960365091904740e-01, -7.26434267436925296e-01, -4.25682452656042876e-01, -1.37455621329807398e+00, -1.48973029798802914e+00, -8.28406995357155451e-01, -8.91965159710260691e-01, -9.54706828710554234e-01, -3.91646553317839263e-01, -4.30182494311636826e-02, -1.05418133557595300e-01, 6.93381759778551765e-01, -3.35566757613404043e-01]),
              (3, 6, [-4.81628299654770997e-01, 1.15764207506801733e-01, 1.89048491296665699e+00, 1.00765400790540793e+00, 2.00620977800504002e-01, -6.50058984361182257e-01, 7.78638833678347575e-02, -4.29892288797595445e-01, -6.23554141416649110e-01, -8.89772697203091822e-01, 6.03425547210766466e-01, 1.92394516566347940e+00, -1.07172234647345377e-01, -1.38731292674922790e+00, 9.14549518664858119e-01, 6.50933167096226950e-01, -5.59570297870373046e-01, -1.14940277093498100e+00, -4.97554190531796170e-01, 1.02657863652715134e-01, -1.90534168204265109e-01, 1.43734338316585331e-01, 2.91255053925756902e-01, 1.74773532209443305e-01, -4.47836609439964062e-01, -5.94494331194847070e-01, -3.17572587814243801e-01, 2.58893949856879690e-01, -4.78847900056545914e-02, 6.73814169829381915e-01, 1.57878296625757764e+00, 4.33686823798045296e-01, 9.37113938969565963e-01, 1.18079379381975857e+00, -1.65816336937247866e+00, -9.93249347159884888e-01, -9.68189957334958495e-01, 1.49754849083535202e+00, 6.68082776393194022e-01, -1.17984531637652434e+00, -1.18326060254096421e+00, -1.98383048223597558e+00, -1.72814014896574553e+00, 2.06086944397655314e+00, 4.18722029074034996e-01, 1.39887301893975358e+00, -9.66476574188560145e-01, 2.83826204748043320e-01, -4.14289550466946044e-01, -1.34614659485762317e-01, -1.01125535557266399e+00, -3.09616188652566526e+00, 2.48069187294149479e-01, -1.24320841747004818e+00, 1.06517063979446069e+00, -2.06428955953913001e-01, -1.09973170922505536e+00, -5.86306019622588215e-01, 9.31688632928019178e-01, 4.07426638996033097e-01, -1.99001961200547939e+00, 1.08329457260192297e+00, 2.69801251791481136e-02, 2.71139381898171861e+00]),
              (3, 7, [-7.68070673003456550e-01, 1.04200799531884525e+00, -3.98265478072588122e-02, -1.15213522229725052e+00, -2.37211147018689866e-01, -3.95904538118875660e-01, 1.43239172749366928e-01, -1.63845673371009681e+00, 1.02714231671076428e+00, -5.78707807566976373e-01, 1.00801388659800040e+00, -8.70481471954068886e-01, 2.06158281593370152e+00, -8.45028641221995613e-01, -2.98267732068345087e-02, -1.55309847337639328e+00, -5.24585456929705263e-01, 1.84058482903824649e-01, 6.94243120515639967e-01, 9.65369628365717825e-01, -9.48825871315996161e-01, 5.85096228712719546e-02, -5.83337087066208793e-01, 5.41068066264544290e-01, 1.99475881033118307e-01, -1.74567463700893849e-01, 1.62369834649737887e+00, 8.54271178544046217e-01, 2.93798617947622354e-01, -3.89178690092675583e-01, -1.03927499214407582e+00, 4.95418765391687943e-01, -1.52819568436898079e+00, 3.82804640808685093e-01, 1.62231136549414101e+00, -1.12201904229329519e+00, 1.30255584757067222e+00, -8.19437190344544097e-01, 1.44482749410844824e-01, -3.26200518125439709e-01, -9.61577944075506341e-01, 4.35849004447789734e-01, -1.20195628590595494e+00, 7.48929395769936224e-01, -2.06878857829322971e-01, -1.10438279394527861e+00, -3.84824486065927118e-01, 1.45010340768871537e-01, 7.96728416165253139e-01, -8.49645647807066196e-01, 9.22393288168576353e-01, -1.34097376183549644e+00, -5.53353050291826576e-01, -2.67751651580236283e+00, 1.09315426131608073e+00, -1.86945372563843204e+00, -5.88537991461351551e-01, -4.14345772451254313e-01, 9.35366913984641446e-01, 1.15862158467474732e-01, 5.64431718463120791e-01, -1.30586532954559353e-01, -6.08541410332321009e-01, 1.14166274112512833e+00])
            ), e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ), proj AS (
              SELECT e.vec_id, p.table_id, p.bit,
                     list_dot_product(e.v, p.w) AS pr
              FROM e CROSS JOIN planes p
            ), buckets AS (
              SELECT vec_id, table_id,
                     SUM(CASE WHEN pr > 0
                         THEN CAST(pow(2, bit) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END) AS bucket
              FROM proj GROUP BY vec_id, table_id
            ), qb AS (
              SELECT vec_id AS q_id, table_id, bucket
              FROM buckets WHERE vec_id < 3
            ), cands AS (
              SELECT DISTINCT b.vec_id, q.q_id
              FROM buckets b
              JOIN qb q ON b.table_id = q.table_id AND b.bucket = q.bucket
            ), scored AS (
              SELECT c.q_id, c.vec_id,
                     list_dot_product(ev.v, eq.v)
                       / greatest(sqrt(list_dot_product(ev.v, ev.v))
                                  * sqrt(list_dot_product(eq.v, eq.v)),
                                  1e-12) AS cos_raw
              FROM cands c
              JOIN e ev ON ev.vec_id = c.vec_id
              JOIN e eq ON eq.vec_id = c.q_id
            ), ranked AS (
              SELECT q_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_raw DESC, vec_id ASC)
                       AS rnk
              FROM scored
            )
            SELECT q_id, vec_id, round(cos_raw, 6) AS cos_sim,
                   CAST(rnk AS INTEGER) AS rnk
            FROM ranked WHERE rnk <= 10
        """,
        "ann_ivf_topk": """
            -- full SQL recomputation (tools/make_goldens_r4.py):
            -- fixture-quantizer IVF — assignment, nprobe selection,
            -- cosine re-rank and top-k re-derived; margins audited
            WITH cents(cell, c) AS (VALUES
              (0, [1.96963804431106754e-01, -5.42865434829180732e-02, 3.82388998029043175e-03, 4.74798799486900874e-02, -9.19177275874104166e-02, 2.40660699195974383e-04, -1.03739201122804721e-04, -2.04443608475499888e-01, 1.18567728343115283e-01, 6.99643146418055945e-02, -7.28689719635782912e-02, -1.99871543465397414e-02, 5.88726257723929738e-02, -3.04507371481540015e-02, -2.82827891643446447e-02, -1.69317719758743573e-01, 6.46143669080324473e-02, 1.44334122497236164e-02, 3.19774320059779682e-02, -1.77855964377579112e-01, 1.92323660278245323e-01, 1.79816930047614239e-02, -4.51058247180221583e-02, 2.36407990229399373e-01, -5.28794391548179261e-03, -1.69019137034559952e-01, -4.72132543664189816e-02, -2.66612478714925216e-01, 1.22265598358469355e-01, -4.85235841366673665e-02, -8.65151987865270672e-02, 1.24953910359937054e-01, -1.92367456325355540e-01, 6.23830816585678877e-02, -2.40525768187113270e-01, -7.71484410956737032e-02, -1.40304120562945417e-01, 1.70335346498544343e-01, 2.05776087859724760e-01, -3.83801238057865299e-02, 9.79541556286479542e-02, -2.09702853123333692e-02, 6.61851104830332021e-02, -8.77133533025129947e-02, -1.99039262140864620e-01, -2.10079722976359906e-01, 4.46376753179268393e-02, 2.61868170017377722e-01, 3.13892534041515653e-02, -6.11218873673672822e-02, 2.22770058108155367e-01, 2.76481300503836867e-02, 1.18181128988310326e-02, 2.94279297840504585e-02, -1.54233185535602099e-02, -3.60572082913454620e-02, -1.67188149138836201e-01, 5.84444208532566567e-02, -1.10423244339607485e-02, 1.39006902852643166e-01, -4.29711825893188890e-02, -2.22111892817792450e-01, -1.16056732977755754e-02, 1.98013748615156998e-01]),
              (1, [-5.52649014887018064e-02, -1.28260005258319626e-01, -1.72039024399400192e-01, -1.51344747238748412e-01, -4.32685884068333693e-02, -1.70077364283134302e-01, 2.15863032871679100e-01, -4.07377843034571127e-02, 1.56600924369307282e-02, 2.07301439784856961e-01, 2.16681636990947751e-01, -3.06623825285694609e-02, 4.78492850809052392e-02, 1.05943458669412474e-01, -2.77973272355110934e-02, -2.56274854821286424e-01, 9.43663646120437155e-02, 1.28907958508617970e-01, 5.98886965186479978e-02, -1.33115614111748937e-01, -2.82545038519488936e-02, -8.51509308889574351e-02, -4.31990430815459847e-02, 1.86927256421615978e-01, 2.20466796869985826e-01, 9.64869573610400155e-02, 7.90936779062544476e-02, 9.75262894066125513e-02, -1.76453426084120508e-03, -1.09057943960354509e-02, -9.70962174478107037e-02, -8.05248546263026554e-03, 3.25738694710641763e-01, 1.25259458933567935e-01, -4.93112242494323297e-02, -6.80214060660877806e-02, -1.24603737661092201e-01, 5.39600750741199980e-02, 5.64356526395792882e-02, -2.08005129165396513e-01, 7.00981895941937827e-02, -8.20811971122921008e-02, 2.05641234078958901e-01, 2.26067933572580773e-02, 2.47585960003805755e-01, -6.60323558073532962e-02, -4.15087120774644963e-02, 4.32130407968263630e-02, 1.52199685517960315e-01, 8.15637819364407601e-02, -1.77794648149677242e-01, 2.63624926417388473e-02, 3.20625755350073668e-03, -6.18440363572002813e-02, -9.34150107905731830e-02, 2.51888001010704465e-01, -5.62685689637487593e-02, -1.21927521873222158e-01, 9.18306065460128829e-02, 1.88274142554746178e-02, -1.09274730768455838e-02, 1.12613363770349292e-01, 7.04282915117998010e-02, 5.22044538412731671e-02]),
              (2, [1.25224110241015707e-01, 3.68368605716619182e-02, -8.01218246760880271e-02, -4.70508679931093618e-02, -6.76605106559805686e-02, 2.72373416192450944e-02, -1.40001691993552307e-01, -2.37983609198198720e-01, 1.14489903032621680e-02, -1.73578627470482111e-01, -2.53510265299801196e-01, 4.84857827659501486e-02, -9.23469810065510738e-02, 6.44335546118815494e-02, -6.89438450083608989e-02, -1.45713203904485195e-01, -1.61499995864477192e-01, -6.68754106078356808e-02, -3.55051871695831953e-02, -1.06945659133334731e-01, -3.65084739466689998e-02, -1.99499011249513691e-01, 1.88173027534877684e-03, -2.32947474527187642e-01, -2.51768021258735215e-02, 9.05600400403890338e-02, 1.41813935133060065e-01, 2.22652596119010698e-01, -2.02120553775411410e-01, 9.85383119951875608e-02, 1.56664113846698067e-01, 1.27348386517821072e-01, -1.20694554458680353e-01, 5.34815037031604740e-02, 2.41571976289160578e-01, -1.94456197322669527e-01, 6.18636535187137085e-02, 1.44457079882220840e-01, -9.04687267324829208e-02, 7.57124049486416900e-02, -1.39080578830107771e-01, -1.05484386895017893e-01, -1.06117087225105253e-01, 2.49756776385528720e-02, -1.18160572121529701e-02, 1.23914299866620128e-01, -1.22117357712282534e-01, -1.70492306789495722e-02, 1.24818382668150749e-01, 7.28301049142467544e-02, -1.72035832092876179e-01, 8.63923436321979710e-02, -6.21338137573473823e-02, 5.00515059761495740e-02, 3.90504236905758750e-02, 1.58357234638203476e-01, 1.51380495855287112e-02, -2.40760292674658538e-01, -1.77908502682874003e-01, 9.49575932040233189e-02, -3.35484512962248085e-02, 1.47793345450486974e-01, 3.55124616042691368e-02, -9.72838033316444084e-02]),
              (3, [1.52145701175507603e-01, -1.13489762771941310e-01, -2.88523390914664724e-01, 2.90092073408376838e-01, -2.68579464369274601e-01, 8.94557242891553667e-02, 1.31967265914534310e-01, 2.06719319327741680e-02, -2.36622314884144758e-01, 1.42672944040740740e-01, -2.02626856838172970e-01, -1.88863667275115416e-01, -5.08369691237377033e-02, 1.10834102089128486e-01, 4.21847334283166273e-02, 1.13963543024758765e-01, -6.23596453592254393e-02, -2.42024974700441875e-02, -1.59838685793222385e-01, -4.45393712906845402e-02, 8.33715215961192829e-02, -4.21445534170513669e-02, 6.68317401919795717e-02, -8.05808095564457816e-02, -8.32679890862099426e-02, 5.50563974528845042e-03, -2.73930134162188796e-02, 8.32670964884486692e-02, 2.50609057807676464e-02, 2.44627266988287767e-01, -3.08526762171518684e-02, -3.19431797986977004e-02, -1.46203327531409827e-01, 3.20172596227237668e-03, 9.59800802461500818e-02, -1.04057738393785265e-01, -6.98205289153049080e-03, 1.01002068889442465e-01, -1.78386556517404968e-02, -7.29711894165875896e-02, 1.36780317015385899e-01, 1.36373038108849095e-02, 5.57420620719313031e-02, 1.64653884719132920e-01, 1.60988364048642862e-01, -4.88038561465444290e-02, -7.38556668918989717e-02, 3.99631484409234336e-02, -1.86649357783397127e-02, -2.67049082945816918e-01, 1.79267917194800119e-01, 2.72147482598528168e-03, 1.03507060593907116e-01, -1.64867977301256685e-01, 1.81072994919394575e-01, -8.26876368794186023e-02, -1.51339431687429402e-02, -1.96987626975693692e-01, -2.34668571014736253e-02, -3.23017942728547544e-02, -2.60547238329517337e-02, 6.16372828015504665e-02, 8.48235772227773875e-03, 1.37158356002813647e-01]),
              (4, [-5.69663108325690892e-02, -1.21196966301166345e-01, -2.32489931240402632e-03, 7.64609270337264502e-02, 1.51450198431182986e-01, 9.90393907715471922e-02, -2.14821923257307840e-01, 4.58811237005074743e-02, 1.77700603977669042e-01, 7.61440223696566599e-03, -6.27929583779557043e-02, 3.76192359154514655e-02, -6.12353691033936942e-02, 7.77684132883853241e-02, -1.58119012514886057e-03, 1.69502704058839077e-01, 6.07803723279247282e-02, -8.80835609147131021e-02, 7.35725972811449025e-02, 1.13895548753669570e-01, -6.91707074901947577e-02, -5.18114112424551618e-02, -2.80498752162781362e-01, 1.09928028501314931e-01, -7.15189864355412208e-02, -2.58251213851856343e-01, -2.15227249136731968e-01, -2.71289668780925024e-02, 9.25584420855099232e-02, -1.08375393506292880e-02, 5.74067468945676854e-02, -1.34032410499610039e-01, -1.63219726993806130e-01, 1.07776064436921448e-01, 5.98850027515187705e-02, -3.71237048111902265e-03, 1.56007283929646606e-01, -1.15742526686800032e-01, -5.11387446685944089e-02, 1.24890667412694251e-01, 2.23626051623221855e-01, 1.02524181218055098e-03, 2.04366873324297205e-01, -7.33145505573651185e-02, 4.01245410657509807e-02, -2.11511590818156854e-02, -1.93260863569427482e-01, 3.13905879632610033e-02, 1.13498621995115359e-01, -1.80413920570526992e-02, -8.57310346826932988e-03, 1.69493844036853025e-01, -1.52067343632285329e-01, -1.82229178644075590e-01, -7.95846326065627746e-02, -1.45607163710696041e-01, 1.63818845304695510e-01, 3.76835161098142968e-02, -1.05144367586338952e-01, -7.47709045784356319e-02, 3.48139684181329678e-01, -7.42368290607905157e-02, -9.27245008295932704e-02, 3.70286312662200454e-02]),
              (5, [7.60235274141937700e-02, 2.64049673082187089e-02, -1.08228244830131382e-01, -1.38073091083933536e-01, 7.10074939870921767e-02, -6.45470147465825126e-03, -1.95514365076066704e-01, 1.39480271120588001e-01, 9.23509896313204348e-02, -2.87005387539194731e-02, -3.10005565362675220e-02, 2.75696384736456752e-02, -8.18310454695638095e-02, -1.60600194678674757e-01, 3.84157352521890955e-02, -1.71412480656673555e-01, 4.65402512611628530e-02, -1.71665105017546837e-01, -1.18170099066324738e-02, -1.61568923693532346e-02, 2.12332537596142706e-01, -1.26780825500666189e-01, -1.68537027333596601e-01, -7.69674716880881654e-02, -1.33850017549980438e-01, -7.02477872642016804e-02, 5.01224464722135471e-02, 9.19517760524253547e-02, 1.97673663840419733e-01, -8.77467344301105096e-02, 3.14281635592283337e-01, 2.36102060443224571e-01, -2.42424843470806645e-02, -2.72935618120432488e-01, -9.89967303549090308e-03, 8.63653526283091229e-03, -2.73868133921378709e-01, 8.79426027006929324e-03, -2.38407746909974037e-02, -9.35876430518816221e-02, 7.46390574414618618e-02, 1.19749056942760099e-01, -5.79095419652407642e-02, 2.73337933954332125e-02, -7.79935693204097252e-02, -9.36941576171649304e-02, 9.46901343501860109e-03, 6.23457891026442390e-02, -6.70949393740857686e-02, -2.63674634166669974e-01, 6.97740045832866695e-02, -1.90169195348242226e-01, 1.45315000942393743e-02, 2.11903373672912926e-01, -2.00460081191122580e-03, -1.41713503370321986e-01, -1.74043959602256049e-01, 1.39416014009004857e-01, -2.01876920908130014e-03, 6.42893316221264666e-02, 1.10333660391450664e-01, -5.83676125728615353e-03, -3.67584682840863611e-02, -1.12840479556197915e-01]),
              (6, [-3.91647965297239775e-01, -1.92869711473677902e-01, -8.84221027727345038e-03, -2.22679338049985263e-02, 5.12743418649719077e-02, -1.60962094741611203e-02, 2.02471854094990085e-02, 1.00093857839627348e-01, -1.12449477206461160e-01, -3.64848769005862508e-02, -2.04204594386931698e-01, 1.23610994898546558e-01, 4.88119296117835340e-03, 6.22344028462845089e-02, 1.95980357930595095e-01, 1.37161810265257256e-01, -7.62348961614466285e-03, 1.00079443434501106e-01, -1.81905315973707765e-01, 5.51304100717279200e-02, 1.76492340983773026e-02, -2.05609338160235328e-01, 1.69913335972095847e-01, -8.94565992435683577e-02, 8.68076964187719374e-02, -5.33548766391880938e-02, 1.26234695761237192e-01, 1.66729555563989024e-01, -1.05462023221467846e-01, -1.94444966060530883e-01, -1.66963175930108093e-02, 1.07859192075345875e-01, -4.71771056425183341e-02, -7.79513031060859035e-02, 6.20387531028022687e-02, -3.50864890634078774e-01, -8.44555066878145549e-02, -1.75818383769417858e-01, 3.74575859661219063e-02, -9.35442306211274749e-02, -1.41687743398088178e-01, -4.49560567958622315e-02, -1.86568785597697490e-01, -1.66743858910480295e-03, -8.66988903542989797e-02, -4.79530151783521055e-02, -9.11160558142577182e-02, 1.15907658248777121e-01, -1.38304159280585939e-02, 6.66419057384627506e-02, 6.09591774916288728e-02, -1.02425593688061242e-01, 7.24180233810149954e-02, 4.43560136956211992e-02, 3.98506516230356100e-02, -5.06560165793371112e-02, -5.42327205739102716e-02, 9.98083891471246848e-02, 2.77229100943582218e-01, -1.05471892719643467e-01, 6.79043729112054351e-02, -4.65342532691807795e-02, 9.97200372843988769e-02, 5.56899430926373271e-02]),
              (7, [1.34560088340070383e-01, -3.54737686153278442e-01, -7.62944901556268790e-02, -1.25428813916274029e-01, -1.37067072873315338e-02, -9.18791585562426932e-02, -8.13580313139129346e-02, 8.65474072172730258e-02, 2.41408783390755166e-01, -3.58424424989012780e-01, -3.94049368370018721e-02, 3.96085028119929072e-02, 6.00764970184064213e-04, -4.38074599616027210e-02, -1.71793533057305409e-01, -1.19651937126683885e-01, 9.20208350914050455e-02, 1.36544857136007364e-01, 1.22707545893463183e-02, -1.06134059350553228e-01, 1.21484446130276629e-02, -3.04678759544449659e-02, 6.92527464460446079e-02, 1.50155231471621291e-02, -7.89227768545410630e-02, 2.42018358316723331e-02, -1.49700003469615622e-01, 1.04082838397552765e-01, 1.50071972755338429e-01, -1.49585689823886009e-01, 5.34428368699881445e-02, -1.25819377839046814e-01, 1.36027230301194679e-01, 1.14758371005334953e-01, -2.92161541948024218e-02, 1.26285389413030580e-01, -5.47177304341566265e-02, -8.16162385462605583e-02, -7.21867323153691787e-02, -1.78779734996606827e-02, -4.10501347425850580e-02, 1.95907692441760969e-02, -7.80684250912120070e-02, 9.70616881221279260e-02, 1.29590040213434510e-01, -6.29389839300719539e-02, -1.81149074208610511e-01, 9.18801046996317455e-02, 1.44515221511735820e-01, -2.07208649531229576e-02, -1.63295610595516061e-01, 3.38595486853377758e-02, 1.93523755974790601e-01, -2.38159218646177367e-01, 6.06623657576070216e-02, -3.98091445378861361e-02, -1.08609343562815569e-01, 6.32356938612911867e-02, -1.64858458528618274e-01, 3.76907304491276088e-02, 1.66689917329871817e-01, 2.24269043990367317e-02, -1.11230243870261536e-01, -2.25844889689309380e-01])
            ), e AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ), vs AS (
              SELECT e.vec_id, e.v, c.cell,
                     list_dot_product(e.v, c.c) AS s
              FROM e CROSS JOIN cents c
            ), vcell AS (
              SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY s DESC, cell ASC) AS rc
                FROM vs
              ) WHERE rc = 1
            ), qcell AS (
              SELECT vec_id AS q_id, v AS qv, cell FROM (
                SELECT vec_id, v, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY s DESC, cell DESC) AS rc
                FROM vs WHERE vec_id < 3
              ) WHERE rc <= 3
            ), scored AS (
              SELECT q.q_id, vc.vec_id,
                     list_dot_product(vc.v, q.qv)
                       / greatest(sqrt(list_dot_product(vc.v, vc.v))
                                  * sqrt(list_dot_product(q.qv, q.qv)),
                                  1e-12) AS cos_raw
              FROM vcell vc JOIN qcell q ON vc.cell = q.cell
            ), ranked AS (
              SELECT q_id, vec_id, cos_raw,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cos_raw DESC, vec_id ASC)
                       AS rnk
              FROM scored
            )
            SELECT q_id, vec_id, round(cos_raw, 6) AS cos_sim,
                   CAST(rnk AS INTEGER) AS rnk
            FROM ranked WHERE rnk <= 10
        """,
        "er_pipeline": """
            -- constructed expectation (ml2/s8 strategy): the gate
            -- corpus lowercases all filler text, so the planted
            -- capitalized nation surface at char 41 is the ONLY
            -- extractable mention per turn; candidates are exact
            -- matches, prediction = Q(doc_id % 25), and the r4
            -- prediction-space cluster label equals the prediction
            SELECT 'conv' || CAST(CAST(floor(d.doc_id / 8) AS BIGINT) AS VARCHAR)
                     || ':' || CAST(CAST(d.doc_id % 8 AS INT) AS VARCHAR)
                     || ':41' AS mention_id,
                   upper(substr(lower(n.n_name), 1, 1))
                     || substr(lower(n.n_name), 2) AS mention,
                   'Q' || CAST(CAST(d.doc_id % 25 AS INT) AS VARCHAR) AS prediction,
                   'Q' || CAST(CAST(d.doc_id % 25 AS INT) AS VARCHAR) AS cluster_id
            FROM documents d
            JOIN nation n ON CAST(d.doc_id % 25 AS INT) = n.n_nationkey
        """,
        "d2_minhash_clusters": """
            -- ground truth for the LSH pipeline: ALL-pairs exact
            -- word-5-gram Jaccard >= 0.5 (mirrors _shingles), then
            -- transitive closure by recursive CTE; label = min doc_id
            -- of the component, singletons label themselves — the
            -- min-id convention of operators/clustering.py
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     list_distinct(
                       list_transform(
                         range(0, greatest(len(w) - 5, 0) + 1),
                         i -> array_to_string(list_slice(w, i + 1, i + 5), ' ')
                       )
                     ) AS s
              FROM (SELECT doc_id,
                           string_split_regex(lower(trim(text)), '\\s+') AS w
                    FROM documents)
            ), edges AS (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / greatest(len(a.s) + len(b.s)
                                 - len(list_intersect(a.s, b.s)), 1) >= 0.5
            ), sym AS (
              SELECT a AS s, b AS d FROM edges
              UNION ALL
              SELECT b, a FROM edges
            ), reach AS (
              SELECT s, d FROM sym
              UNION
              SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s
            ), labels AS (
              SELECT s AS doc_id, least(s, min(d)) AS lbl
              FROM reach GROUP BY s
            )
            SELECT CAST(d.doc_id AS STRING) AS doc_id,
                   CAST(COALESCE(l.lbl, d.doc_id) AS STRING) AS dup_cluster
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        """,
        "s6_embedding_topk": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), q AS (
              SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3
            ), scored AS (
              SELECT q.q_id, e.vec_id,
                     round(list_dot_product(e.v, q.qv)
                       / greatest(sqrt(list_dot_product(e.v, e.v))
                                  * sqrt(list_dot_product(q.qv, q.qv)), 1e-12), 6) AS cos_sim
              FROM e CROSS JOIN q
            )
            SELECT q_id, vec_id, cos_sim,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos_sim DESC, vec_id ASC) AS rnk
            FROM scored
            QUALIFY rnk <= 10
        """,
    }
