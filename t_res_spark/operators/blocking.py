"""Stage 2 — blocking: bound the candidate pair space.

The reference bounds its fuzzy-match pair space with a faiss ANN index
(/root/reference/geoparser/ranking.py:534-545) or doesn't bound it at
all (partial_match scans every alias per query,
ranking.py:399-469). At 10^12 turns neither works; this engine blocks
on two cheap deterministic keys:

- ``norm_key``: lowercase alphanumeric skeleton (exact-ish forms);
- ``phonetic_key``: consonant skeleton, OCR-vowel tolerant.

Every (mention, alias) candidate pair shares at least one key. Keys are
exploded to rows so one shuffle co-locates mention and alias sides.

Skew: hot aliases (the "London" problem — Zipfian, asserted hot in the
reference, pipeline.py:139) make some block keys huge. Mitigation here
is **salting** (north rule requires explicit skew handling): the alias
side of a hot block is split into ``salt_factor`` sub-blocks and the
mention side is replicated across them, bounding per-task pair counts;
AQE skew-join splitting covers residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_key, phonetic_key


def with_block_keys(df: DataFrame, text_col: str) -> DataFrame:
    """Explode df to (block_key, ...) rows — one per key family."""
    keyed = df.withColumn(
        "block_key",
        F.explode(
            F.array_distinct(
                F.array(
                    F.concat(F.lit("n:"), norm_key(F.col(text_col))),
                    F.concat(F.lit("p:"), phonetic_key(F.col(text_col))),
                )
            )
        ),
    )
    return keyed.filter(F.length("block_key") > 2)


def salted(
    mention_side: DataFrame,
    alias_side: DataFrame,
    salt_factor: int,
) -> tuple[DataFrame, DataFrame]:
    """Return (mention_side', alias_side') joinable on
    (block_key, block_salt).

    Alias rows are assigned a deterministic salt from their alias string;
    mention rows are replicated over all salts. Replication factor is
    ``salt_factor`` on the (small) distinct-mention side only — the
    classic replicated-fragment join for skewed keys."""
    if salt_factor <= 1:
        return (
            mention_side.withColumn("block_salt", F.lit(0)),
            alias_side.withColumn("block_salt", F.lit(0)),
        )
    a = alias_side.withColumn(
        "block_salt", F.pmod(F.xxhash64("alias"), F.lit(salt_factor)).cast("int")
    )
    m = mention_side.withColumn(
        "block_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))),
    )
    return m, a
