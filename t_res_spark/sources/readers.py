"""S7/S10/S15/J8 — the remaining reference input surfaces, Spark-first.

- S7: the experiment TSV (one article per row, stringified
  sentences/annotations columns — /root/reference/experiments/
  experiment.py:83-86 ``pd.read_csv(sep="\\t")``) → ``spark.read.csv``
  feeding ``sources.ingest`` for the from_json parse.
- S10: HF-style JSON dataset load with the recogniser's test-mode limit
  (``split="train[:10]"`` — /root/reference/geoparser/recogniser.py:
  190-202) → ``spark.read.json().limit(n)``.
- S15: the SQLite wiki-title → QID point lookup (``title_to_id``,
  /root/reference/utils/process_wikipedia.py:69-108) re-expressed as a
  broadcast-able equi-join against a mapping table on the normalized
  title key — point queries don't exist at 10^12 scale; the join IS
  the lookup.
- J8: the experiment split-column merge (left equi-join of the
  originalsplit/traindevtest frame onto mentions by article id,
  /root/reference/experiments/experiment.py:495-502).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import wikipedia_to_wikidata_key


def read_experiment_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S7 — tab-separated experiment rows with header; all columns
    strings (the stringified list columns are parsed downstream by
    ``sources.ingest``, never by the CSV reader)."""
    return spark.read.csv(path, sep="\t", header=True, escape='"')


def read_hf_json(
    spark: SparkSession, path: str, limit: int | None = None
) -> DataFrame:
    """S10 — JSON-lines dataset load; ``limit`` mirrors the
    ``train[:10]`` test-mode slice. The limit is applied BEFORE any
    wide transform so Spark prunes the scan (LocalLimit pushes into the
    file scan)."""
    df = spark.read.json(path)
    return df.limit(limit) if limit is not None else df


def wiki_title_lookup(
    titles: DataFrame,
    mapping: DataFrame,
    title_col: str = "page_title",
) -> DataFrame:
    """S15 — resolve Wikipedia page titles to Wikidata QIDs.

    ``mapping`` is the offline-prepared (wiki_key, qid) table (the
    content of the reference's SQLite db); both sides key on the same
    normalizer so the join is consistent by construction. The shared
    normalizer lowercases unconditionally (make_wikilinks_consistent
    does too), so there is no case-sensitive lookup variant — the
    reference's title_to_id ``lower`` flag is subsumed. Misses keep
    NULL qid (the reference returns None)."""
    keyed = titles.withColumn(
        "wiki_key", wikipedia_to_wikidata_key(F.col(title_col))
    )
    m = mapping.select(
        F.col("wiki_key").alias("wiki_key"), F.col("qid").alias("qid")
    )
    return keyed.join(m, "wiki_key", "left")


def merge_splits(mentions: DataFrame, splits: DataFrame) -> DataFrame:
    """J8 — attach experiment split labels to mention rows by
    article id (string-cast equi-join, left: unknown articles keep
    NULL split — experiment.py:495-502)."""
    s = splits.select(
        F.col("article_id").cast("string").alias("article_id"),
        "originalsplit",
    )
    return mentions.withColumn(
        "article_id", F.col("article_id").cast("string")
    ).join(s, "article_id", "left")
