"""Text normalization — native column expressions where possible.

Reference parity:
- n-dash fix: replace ``—`` with ``,`` everywhere except position 0
  (/root/reference/geoparser/recogniser.py:369-379).
- alias noise filter: drop variants containing ``", "`` or ``" ("``
  (/root/reference/geoparser/ranking.py:216-247).
- normalized blocking key + vowel-stripped phonetic-ish key (our analog
  of the DeezyMatch candidate blocking; SURVEY §7.0 stage 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fix_ndash(text: Column) -> Column:
    """``—`` → ``,`` except at char 0 (recogniser.py:374-379)."""
    return F.when(F.length(text) <= 1, text).otherwise(
        F.concat(
            F.substring(text, 1, 1),
            F.regexp_replace(F.substring(text, 2, 0x7FFFFFF), "—", ","),
        )
    )


def alias_noise_filter(alias: Column) -> Column:
    """Predicate: alias is clean (ranking.py:221-227). Catalyst pushes
    this to the alias-table scan."""
    return (~alias.contains(", ")) & (~alias.contains(" ("))


def norm_key(s: Column) -> Column:
    """Primary blocking key: lowercase, alphanumerics only.

    'Ashton-under-Lyne' and 'Ashton under Lyne' share a key; OCR noise
    does not (the phonetic key below catches most of it)."""
    return F.regexp_replace(F.lower(s), "[^a-z0-9]", "")


def phonetic_key(s: Column) -> Column:
    """Secondary blocking key tolerant to OCR vowel noise: first char +
    consonant skeleton with runs collapsed.

    Our deterministic analog of the reference's DeezyMatch ANN blocking
    (/root/reference/geoparser/ranking.py:471-568): 'Shefiield' and
    'Sheffield' share 'sfld'-style keys. Uses a Java-regex backreference
    (run collapse), so it is Spark-side only; oracle-gated blocking
    queries use a norm-key prefix block instead (RE2/DuckDB has no
    backreferences)."""
    lowered = norm_key(s)
    skeleton = F.regexp_replace(lowered, "[aeiouy0-9]", "")
    collapsed = F.regexp_replace(skeleton, "(.)\\1+", "$1")
    return F.concat(F.substring(lowered, 1, 1), collapsed)


def mention_sanity_filter(mention: Column) -> Column:
    """Keep mentions of length > 1 that are not all-lowercase
    (/root/reference/geoparser/pipeline.py:618)."""
    return (F.length(mention) > 1) & (mention != F.lower(mention))
