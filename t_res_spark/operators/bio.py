"""ML2 — the full BIO repair chain + mention aggregation over
token-level NER predictions.

The reference post-processes raw BERT token predictions through a fixed
chain (/root/reference/geoparser/recogniser.py:388-396):
``fix_capitalization`` per token, then ``fix_hyphens`` → ``fix_nested``
→ ``fix_startEntity`` over the sentence, then
``aggregate_mentions``/``collect_named_entities``
(/root/reference/utils/ner.py:70-307) to group BIO tokens into mention
spans with whitespace-faithful text reconstruction and round-3dp mean
scores.

The rules here reimplement those semantics 1:1 (goldens straight from
the reference docstrings); the per-sentence chain is inherently
sequential, so the Spark surface batches it per (conv_id, turn_idx)
group through ``applyInPandas`` — same Arrow-batched no-per-row-Python
discipline as the extraction stage. This module is how externally
produced BIO predictions (e.g. S10 HF datasets, or a real NER model on
a GPU cluster) enter the pipeline; the deterministic extractor
(operators/extraction.py) remains the model-free default path.

Token dict shape (reference's pipeline shape): ``entity`` (BIO tag),
``word``, ``start``, ``end``, ``score``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# numbers + punctuation are common OCR errors (ner.py:385-391)
_CONNECTOR_WORDS = frozenset(
    ["-", ",", ".", "’", "'", "?"] + [str(x) for x in range(10)]
)
_NUMBERS = frozenset(str(x) for x in range(10))


def fix_capitalization(tok: dict, sentence: str) -> dict:
    """Replace the model-processed word with the true surface form
    sliced from the sentence by char offsets, keeping any ``##``
    subword marker (ner.py:309-348)."""
    word = sentence[tok["start"] : tok["end"]]
    if tok["word"].startswith("##"):
        word = "##" + word
    return {**tok, "word": word}


def fix_hyphens(toks: list[dict]) -> list[dict]:
    """Re-prefix hyphen/number-connected same-entity runs to I-
    (ner.py:351-426): 'Ashton - under - Lyne' tagged B,B,B,B,B becomes
    B,I,I,I,I."""
    if not toks:
        return []
    out = [toks[0]]
    for cur in toks[1:]:
        prev = out[-1]
        if (
            (prev["word"] in _CONNECTOR_WORDS or cur["word"] in _CONNECTOR_WORDS)
            and (
                prev["entity"][2:] == cur["entity"][2:]
                or (cur["word"][:1].islower() if cur["word"] else False)
                or cur["word"] in _NUMBERS
                or prev["end"] == cur["start"]
            )
            and prev["entity"] != "O"
            and cur["entity"] != "O"
        ):
            out.append({**cur, "entity": "I-" + prev["entity"][2:]})
        else:
            out.append(cur)
    return out


def fix_nested(toks: list[dict]) -> list[dict]:
    """Re-prefix the token after an entity-tagged 'of' to I-
    (ner.py:429-480): 'Island of Terceira' B,I,B becomes B,I,I."""
    if not toks:
        return []
    out = [toks[0]]
    for cur in toks[1:]:
        prev = out[-1]
        if (
            prev["word"].lower() == "of"
            and prev["entity"] != "O"
            and cur["entity"] != "O"
        ):
            out.append({**cur, "entity": "I-" + prev["entity"][2:]})
        else:
            out.append(cur)
    return out


def fix_start_entity(toks: list[dict]) -> list[dict]:
    """I- at sentence start, or I- whose predecessor is O / a different
    type, becomes B- (ner.py:483-543)."""
    if not toks:
        return []
    first = toks[0]
    if first["entity"].startswith("I-"):
        first = {**first, "entity": "B-" + first["entity"][2:]}
    out = [first]
    for cur in toks[1:]:
        prev = out[-1]
        if (
            prev["entity"] == "O" or prev["entity"][2:] != cur["entity"][2:]
        ) and cur["entity"].startswith("I-"):
            out.append({**cur, "entity": "B-" + cur["entity"][2:]})
        else:
            out.append(cur)
    return out


def repair_bio(toks: list[dict], sentence: str | None = None) -> list[dict]:
    """The full chain in the reference's order
    (recogniser.py:388-396)."""
    if sentence is not None:
        toks = [fix_capitalization(t, sentence) for t in toks]
    return fix_start_entity(fix_nested(fix_hyphens(toks)))


def collect_named_entities(toks: list[dict]) -> list[dict]:
    """Group repaired BIO tokens into entity spans (ner.py:70-180):
    a span ends at O, at a type change, or at an explicit B-."""
    spans: list[dict] = []
    start = None
    etype = None
    for i, t in enumerate(toks):
        tag = t["entity"]
        if tag == "O":
            if etype is not None:
                spans.append({"e_type": etype, "start_offset": start, "end_offset": i - 1})
                start = etype = None
        elif etype is None:
            etype, start = tag[2:], i
        elif etype != tag[2:] or tag[:1] == "B":
            spans.append({"e_type": etype, "start_offset": start, "end_offset": i - 1})
            etype, start = tag[2:], i
    if etype is not None:
        spans.append(
            {"e_type": etype, "start_offset": start, "end_offset": len(toks) - 1}
        )
    return spans


def aggregate_mentions(toks: list[dict]) -> list[dict]:
    """Spans → mention dicts with whitespace-faithful text
    reconstruction (gaps between token char offsets become spaces),
    subword-marker collation (``##`` fragments join without a gap),
    label consolidation, and round-3dp mean score (ner.py:182-307)."""
    mentions = []
    for sp in collect_named_entities(toks):
        rng = range(sp["start_offset"], sp["end_offset"] + 1)
        text = ""
        for r in rng:
            gap = ""
            word = toks[r]["word"]
            if word.startswith("##"):
                word = word[2:]
            elif r - 1 in rng:
                gap = " " * (toks[r]["start"] - toks[r - 1]["end"])
            text += gap + word
        scores = [float(toks[r]["score"]) for r in rng]
        mentions.append(
            {
                "mention": text,
                "start_char": toks[sp["start_offset"]]["start"],
                "end_char": toks[sp["end_offset"]]["end"],
                "ner_score": round(sum(scores) / len(scores), 3),
                "ner_label": sp["e_type"],
            }
        )
    return mentions


REPAIRED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("start_char", T.IntegerType(), False),
        T.StructField("end_char", T.IntegerType(), False),
        T.StructField("ner_score", T.DoubleType(), False),
        T.StructField("tag", T.StringType(), False),
    ]
)


def repair_and_aggregate(bio_tokens: DataFrame) -> DataFrame:
    """Spark surface: token rows
    (conv_id, turn_idx, entity, word, start, end, score[, text]) →
    mention rows. ``groupBy(conv_id).applyInPandas`` — groups are
    conversations (bounded: turns × tokens/turn), and applyInPandas
    guarantees WHOLE groups per Arrow batch, which the sequential
    repair chain requires (mapInPandas could split a turn across
    batches and silently sever a mention)."""

    def _per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {k: [] for k in (
            "conv_id", "turn_idx", "mention", "start_char",
            "end_char", "ner_score", "tag",
        )}
        for (conv_id, turn_idx), grp in pdf.groupby(
            ["conv_id", "turn_idx"], sort=True
        ):
            grp = grp.sort_values("start")
            toks = grp.to_dict("records")
            sentence = grp["text"].iloc[0] if "text" in grp else None
            for m in aggregate_mentions(repair_bio(toks, sentence)):
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                out["mention"].append(m["mention"])
                out["start_char"].append(m["start_char"])
                out["end_char"].append(m["end_char"])
                out["ner_score"].append(m["ner_score"])
                out["tag"].append(m["ner_label"])
        return pd.DataFrame(out)

    cols = ["conv_id", "turn_idx", "entity", "word", "start", "end", "score"]
    if "text" in bio_tokens.columns:
        cols.append("text")
    # explicit-N AQE-coalesce-exempt pin for the Arrow group stage —
    # rationale + measurements in functions.shuffle.pinned_repartition
    from ..functions.shuffle import pinned_repartition

    return (
        pinned_repartition(bio_tokens.select(*cols), "conv_id")
        .groupBy("conv_id")
        .applyInPandas(_per_conv, schema=REPAIRED_SCHEMA)
    )
