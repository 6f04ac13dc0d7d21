"""The reference's primary interactive API, re-expressed.

``Pipeline.run_text(text, ...)`` (/root/reference/geoparser/pipeline.py:
387-490; output contract README.md:75-105) returns one dict per mention
with the prediction, scores, and gazetteer decoration. This module
reproduces that surface on top of the distributed stages: the text is
sentence-split (offset-preserving), run through the same
extract → rank → link plan as any batch, and collected into the
reference's dict shape.

This is the INTERACTIVE convenience path — it collects one text's
mentions to the driver by design (the reference's API is synchronous
too; its HTTP app calls exactly this). Batch/cluster work goes through
``plans.pipeline.resolve`` / ``jobs.*`` and never collects.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Second alternative captures punctuation-only runs (a text starting
# with '...' or '?!'), so every character lands in exactly one chunk
# and concatenation restores the text — the stated invariant — instead
# of silently dropping leading sentence punctuation. Terminators cover
# the common non-ASCII sentence punctuation too (CJK full stops,
# fullwidth !/?, Arabic question mark, ellipsis — r4, widened in
# lockstep with the unicode extraction classes).
_TERM = ".!?。！？．؟…"
_SENTENCE = re.compile(rf"[^{_TERM}]+[{_TERM}]*\s*|[{_TERM}]+\s*")
_PUNCT_ONLY = re.compile(rf"^[{_TERM}\s]*$")


def split_sentences(text: str) -> list[tuple[int, str, int]]:
    """(sent_idx, sentence, start_offset) — offset-preserving splitter
    (the reference uses an external sentence splitter,
    pipeline.py:462; same contract: concatenation restores the text).

    Punctuation-only chunks (a mid-text '...' run) are merged into the
    PRECEDING sentence — like a real sentence splitter, they never
    become standalone turns that would shift ``sent_idx`` for the
    sentences after them; a punctuation-only prefix attaches to the
    following sentence instead."""
    chunks: list[tuple[str, int]] = []
    pending = ""  # punctuation-only prefix awaiting a real sentence
    pending_start = 0
    for m in _SENTENCE.finditer(text):
        s = m.group()
        if _PUNCT_ONLY.match(s):
            if chunks:
                prev_s, prev_off = chunks[-1]
                chunks[-1] = (prev_s + s, prev_off)
            else:
                if not pending:
                    pending_start = m.start()
                pending += s
        elif pending:
            chunks.append((pending + s, pending_start))
            pending = ""
        else:
            chunks.append((s, m.start()))
    if pending:
        chunks.append((pending, pending_start))
    return [(i, s, off) for i, (s, off) in enumerate(chunks)]


def run_text(
    spark: SparkSession,
    text: str,
    aliases,
    entities=None,
    ranking_method: str = "fuzzy",
    threshold: float = 0.7,
    top_k: int = 7,
) -> list[dict]:
    """One text → list of mention dicts in the reference's README
    shape: mention, ner_score, pos, sent_idx, end_pos, tag, sentence,
    prediction, ed_score, string_match_score, prior_cand_score,
    cross_cand_score, latlon, wkdt_class.

    Script-agnostic like the reference's model NER (r5): the cased
    rule tagger is unioned with the gazetteer-anchored uncased tagger,
    using the alias KB itself as the gazetteer — a CJK/Arabic/Hebrew
    toponym present in the KB is tagged and linked exactly like a
    cased one. On an all-cased KB the uncased branch is empty by
    construction and the output is unchanged."""
    from ..operators.gazetteer import extract_mentions_full
    from ..operators.linking import NIL, link_mentions, most_popular
    from ..operators.ranking import find_candidates

    sentences = split_sentences(text)
    transcripts = spark.createDataFrame(
        [("t0", i, "user", s, None, None) for i, s, _ in sentences],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    mentions = extract_mentions_full(transcripts, aliases, alias_col="alias")
    surfaces = mentions.select("mention").distinct()
    candidates = find_candidates(
        surfaces, aliases, method=ranking_method, threshold=threshold, top_k=top_k
    )
    linked = link_mentions(mentions, most_popular(candidates), entities=entities)

    # string_match_score: {variation: (match_score, [qids])} per mention
    matches = (
        candidates.groupBy("mention", "variation", "score")
        .agg(F.sort_array(F.collect_set("qid")).alias("qids"))
        .collect()
    )
    match_map: dict[str, dict] = {}
    for r in matches:
        match_map.setdefault(r["mention"], {})[r["variation"]] = (
            round(float(r["score"]), 3),
            list(r["qids"]),
        )
    # cross_cand_score (normalized candidate map, linking.py:259-262)
    # and prior_cand_score (normalized p_e_m prior — the reference's
    # REL path fills it from its get_candidates priors,
    # pipeline.py:288-324 / rel_utils.py:180-231; its mostpopular path
    # leaves it empty, pipeline.py:346 — we emit the real map on every
    # path, same normalization as operators/context.py's priored
    # aggregation) in ONE aggregation job + collect: the two maps
    # differ only in denominator (sum of all pair scores vs sum of
    # per-QID maxima), both computable from the same grouped frame.
    from pyspark.sql import Window

    w = Window.partitionBy("mention")
    both = (
        candidates.withColumn("total_all", F.sum("abs_relv").over(w))
        .groupBy("mention", "qid")
        .agg(
            F.max("abs_relv").alias("best"),
            F.first("total_all").alias("total_all"),
        )
        .withColumn("total_max", F.sum("best").over(w))
        .select(
            "mention",
            "qid",
            (F.col("best") / F.col("total_all")).alias("norm_score"),
            (F.col("best") / F.col("total_max")).alias("prior"),
        )
        .collect()
    )
    cross_map: dict[str, dict] = {}
    prior_map: dict[str, dict] = {}
    for r in both:
        cross_map.setdefault(r["mention"], {})[r["qid"]] = round(
            float(r["norm_score"]), 3
        )
        prior_map.setdefault(r["mention"], {})[r["qid"]] = round(
            float(r["prior"]), 3
        )
    prior_map = {
        m: dict(sorted(d.items(), key=lambda kv: (-kv[1], kv[0])))
        for m, d in prior_map.items()
    }

    sent_text = {i: s for i, s, _ in sentences}
    out = []
    for r in sorted(
        linked.collect(), key=lambda r: (r["turn_idx"], r["start_char"])
    ):
        d = {
            "mention": r["mention"],
            "ner_score": r["ner_score"],
            "pos": r["start_char"],
            "sent_idx": r["turn_idx"],
            "end_pos": r["end_char"],
            "tag": r["tag"],
            "sentence": sent_text.get(r["turn_idx"], ""),
            "prediction": r["prediction"],
            "ed_score": round(float(r["link_score"]), 3),
            "string_match_score": match_map.get(r["mention"], {}),
            "prior_cand_score": prior_map.get(r["mention"], {}),
            "cross_cand_score": cross_map.get(r["mention"], {}),
        }
        if entities is not None:
            d["latlon"] = (
                [r["lat"], r["lon"]]
                if r["prediction"] != NIL and r["lat"] is not None
                else None
            )
            d["wkdt_class"] = r["wkdt_class"]
        out.append(d)
    return out
