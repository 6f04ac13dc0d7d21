"""S7/M1 — batch ingest of the reference's experiment-row shape.

The reference's primary batch input is a TSV whose ``sentences`` and
``annotations`` columns hold STRINGIFIED lists of dicts, parsed row by
row with ``ast.literal_eval``
(/root/reference/utils/process_data.py:18-128 ``eval_with_exception`` /
``prepare_sents``). Spark-first re-expression: ``from_json`` with an
explicit array-of-struct schema + ``explode`` as the JVM fast path,
plus an Arrow-batched ``literal_eval`` fallback for the reference's
actual single-quoted-repr cells (see ``_parsed_list``); genuinely
malformed cells degrade to empty lists exactly like the reference's
``eval_with_exception(..., in_case=[])``.

Output contracts mirror ``prepare_sents``'s three dicts, as frames:
- sentences(article_id, sent_pos, sentence_text)      (dSentences)
- annotations(article_id, sent_pos, mention, entity_type,
  mention_start, mention_end, qid)                    (dAnnotated,
  with the NIL rule: non-string or ``"*"`` links → "NIL",
  process_data.py:92-96)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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


def _parsed_list(col: str, schema: T.ArrayType) -> Column:
    """JSON fast path + Python-repr fallback for a stringified-list
    column.

    The reference's REAL TSV cells are ``str()`` reprs with single
    quotes (hence its ``ast.literal_eval``), which are NOT valid JSON —
    ``from_json`` alone would silently null every well-formed reference
    cell. So: try ``from_json`` (JVM, codegen), and where it nulls out,
    fall back to an Arrow-batched ``literal_eval`` that converts the
    repr to JSON and re-parses. Cells neither format can parse degrade
    to an empty list — the reference's ``eval_with_exception(..., [])``
    behavior, now applied to genuinely malformed cells only."""

    @pandas_udf(T.StringType())
    def pyrepr_to_json(s: pd.Series) -> pd.Series:
        import json
        from ast import literal_eval

        def conv(x):
            if x is None:
                return None
            try:
                v = literal_eval(x)
                return json.dumps(v) if isinstance(v, list) else None
            except (ValueError, SyntaxError):
                return None

        return s.map(conv)

    direct = F.from_json(col, schema)
    fallback = F.from_json(pyrepr_to_json(F.col(col)), schema)
    return F.coalesce(direct, fallback, F.array().cast(schema))


def _parse_rows(
    rows: DataFrame, id_col: str, col: str, schema: T.ArrayType, out: str
) -> DataFrame:
    """(id, parsed array) — JSON rows stay fully JVM-side; only
    non-JSON-shaped rows route through the literal_eval UDF.

    Spark evaluates Python UDFs for every row of a projection even
    inside an untaken CASE branch (BatchEvalPython extraction), so the
    split is a pair of filtered branches + union: a pure-JSON corpus
    never starts a Python worker, a repr corpus pays Arrow once. The
    shape probe is a cheap anchored regex (JSON object lists open with
    '[{"'; reprs with \"[{'\")."""
    jsonish = F.coalesce(
        F.col(col).rlike('^\\s*(\\[\\s*\\{\\s*"|\\[\\s*\\])'), F.lit(False)
    )
    jvm = rows.filter(jsonish).select(
        F.col(id_col),
        F.coalesce(F.from_json(col, schema), F.array().cast(schema)).alias(out),
    )
    py = rows.filter(~jsonish).select(
        F.col(id_col), _parsed_list(col, schema).alias(out)
    )
    return jvm.unionByName(py)


def parse_sentences(rows: DataFrame, id_col: str = "article_id") -> DataFrame:
    """Stringified ``sentences`` column → one row per sentence."""
    parsed = _parse_rows(rows, id_col, "sentences", SENTENCES_SCHEMA, "s")
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
    parsed = _parse_rows(rows, id_col, "annotations", ANNOTATIONS_SCHEMA, "a")
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
