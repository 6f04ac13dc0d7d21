"""S7/M1 — batch ingest of the reference's experiment-row shape.

The reference's primary batch input is a TSV whose ``sentences`` and
``annotations`` columns hold STRINGIFIED lists of dicts, parsed row by
row with ``ast.literal_eval``
(/root/reference/utils/process_data.py:18-128 ``eval_with_exception`` /
``prepare_sents``). Spark-first re-expression: ``from_json`` with an
explicit array-of-struct schema + ``explode`` — JSON parsing stays in
the JVM (whole-stage codegen), no Python anywhere.

Malformed cells degrade to empty lists exactly like the reference's
``eval_with_exception(..., in_case=[])`` (``from_json`` yields NULL on
parse failure; we coalesce to an empty array).

Output contracts mirror ``prepare_sents``'s three dicts, as frames:
- sentences(article_id, sent_pos, sentence_text)      (dSentences)
- annotations(article_id, sent_pos, mention, entity_type,
  mention_start, mention_end, qid)                    (dAnnotated,
  with the NIL rule: non-string or ``"*"`` links → "NIL",
  process_data.py:92-96)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SENTENCES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("sentence_pos", T.IntegerType()),
            T.StructField("sentence_text", T.StringType()),
        ]
    )
)

ANNOTATIONS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("sent_pos", T.IntegerType()),
            T.StructField("mention", T.StringType()),
            T.StructField("entity_type", T.StringType()),
            T.StructField("wkdt_qid", T.StringType()),
            T.StructField("mention_start", T.IntegerType()),
            T.StructField("mention_end", T.IntegerType()),
        ]
    )
)


def parse_sentences(rows: DataFrame, id_col: str = "article_id") -> DataFrame:
    """Stringified ``sentences`` column → one row per sentence."""
    parsed = rows.select(
        F.col(id_col),
        F.coalesce(
            F.from_json("sentences", SENTENCES_SCHEMA),
            F.array().cast(SENTENCES_SCHEMA),
        ).alias("s"),
    )
    return parsed.select(
        id_col, F.explode("s").alias("sent")
    ).select(
        id_col,
        F.col("sent.sentence_pos").alias("sent_pos"),
        F.col("sent.sentence_text").alias("sentence_text"),
    )


def parse_annotations(rows: DataFrame, id_col: str = "article_id") -> DataFrame:
    """Stringified ``annotations`` column → one row per annotation,
    with the reference's NIL link rule applied."""
    parsed = rows.select(
        F.col(id_col),
        F.coalesce(
            F.from_json("annotations", ANNOTATIONS_SCHEMA),
            F.array().cast(ANNOTATIONS_SCHEMA),
        ).alias("a"),
    )
    exploded = parsed.select(id_col, F.explode("a").alias("ann"))
    qid = F.col("ann.wkdt_qid")
    return exploded.select(
        id_col,
        F.col("ann.sent_pos").alias("sent_pos"),
        F.col("ann.mention").alias("mention"),
        F.col("ann.entity_type").alias("entity_type"),
        F.col("ann.mention_start").alias("mention_start"),
        F.col("ann.mention_end").alias("mention_end"),
        F.when(qid.isNull() | (qid == "*"), F.lit("NIL"))
        .otherwise(qid)
        .alias("qid"),
    )


def annotated_sentences(rows: DataFrame, id_col: str = "article_id") -> DataFrame:
    """The joined view the NER stage consumes: every annotation row
    decorated with its sentence text (annotations bind to sentences via
    ``sent_pos`` — prepare_sents' inner loop, process_data.py:86-105).
    Sentences without annotations are kept (left join, NULL mention) —
    the reference also keeps them (process_data.py:117-121)."""
    s = parse_sentences(rows, id_col)
    a = parse_annotations(rows, id_col)
    return s.join(a, [id_col, "sent_pos"], "left")
