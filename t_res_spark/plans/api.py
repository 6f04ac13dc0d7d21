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
# of silently dropping leading sentence punctuation.
_SENTENCE = re.compile(r"[^.!?]+[.!?]*\s*|[.!?]+\s*")


def split_sentences(text: str) -> list[tuple[int, str, int]]:
    """(sent_idx, sentence, start_offset) — offset-preserving splitter
    (the reference uses an external sentence splitter,
    pipeline.py:462; same contract: concatenation restores the text)."""
    out = []
    for i, m in enumerate(_SENTENCE.finditer(text)):
        out.append((i, m.group(), m.start()))
    return out


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
    cross_cand_score, latlon, wkdt_class."""
    from ..operators.extraction import extract_mentions
    from ..operators.linking import (
        NIL,
        candidate_score_map,
        link_mentions,
        most_popular,
    )
    from ..operators.ranking import find_candidates

    sentences = split_sentences(text)
    transcripts = spark.createDataFrame(
        [("t0", i, "user", s, None, None) for i, s, _ in sentences],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    mentions = extract_mentions(transcripts)
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
    # cross_cand_score analog: normalized candidate map (linking.py:259-262)
    cross = candidate_score_map(candidates).collect()
    cross_map: dict[str, dict] = {}
    for r in cross:
        cross_map.setdefault(r["mention"], {})[r["qid"]] = round(
            float(r["norm_score"]), 3
        )
    # prior_cand_score: the normalized p_e_m prior per candidate, sorted
    # score-desc — the reference's REL path fills this from its
    # get_candidates priors (pipeline.py:288-324, rel_utils.py:180-231;
    # its mostpopular path leaves it empty, pipeline.py:346 — we emit
    # the real map on every path, same normalization as the contextual
    # disambiguator's prior (operators/context.py priored aggregation))
    from pyspark.sql import Window

    w = Window.partitionBy("mention")
    prior_rows = (
        candidates.groupBy("mention", "qid")
        .agg(F.max("abs_relv").alias("m"))
        .withColumn("p", F.col("m") / F.sum("m").over(w))
        .collect()
    )
    prior_map: dict[str, dict] = {}
    for r in prior_rows:
        prior_map.setdefault(r["mention"], {})[r["qid"]] = round(float(r["p"]), 3)
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
