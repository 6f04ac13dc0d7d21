"""Golden-VALUES authoring for the round-5 gate additions.

t5_fingerprint: expected output of ``text_analysis.with_fingerprint``
over the fixed T5 fixture corpus, recomputed INDEPENDENTLY with the
from-spec pure-python XXH64 (functions/xxh64.py — bit-exact vs Spark's
builtin, unit-asserted) plus a python mirror of the normalization
(Java ``\\s`` = the explicit ASCII class ``[ \\t\\n\\x0b\\f\\r]``; the
fixture stays inside characters where Java toLowerCase == python
str.lower so the mirror is exact).

Usage: python tools/make_goldens_r5.py   # prints the VALUES block
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t_res_spark.functions.xxh64 import to_signed, xxh64_str  # noqa: E402

# fixture corpus — covers: short text (<64 chars → fp_prefix ==
# fp_hash), exact-duplicate pair, case-folded twin, whitespace-collapse
# twin (tab/newline/multi-space), >64-char text (distinct
# prefix/suffix), len_band boundary lengths (63 / 64 / 128 after
# normalization), and a unicode (accented, already-lowercase) doc
T5_DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
    (3, "The  quick\tbrown\nfox jumps\r\nover   the lazy dog"),
    (4, "a" * 63),
    (5, "b" * 64),
    (6, ("clause one of a much longer document body " * 4).strip()),
    (7, "café métro naïve façade résumé déjà vu über straße"),
    (8, "x y " * 32),  # trailing space survives normalization
]

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def fingerprint(text: str) -> tuple[int, int, int, int]:
    norm = _WS.sub(" ", text).lower()
    return (
        to_signed(xxh64_str(norm)),
        to_signed(xxh64_str(norm[:64])),
        to_signed(xxh64_str(norm[::-1][:64])),
        int(len(norm) / 64),
    )


def values_block() -> str:
    rows = []
    for doc_id, text in T5_DOCS:
        h, p, s, b = fingerprint(text)
        rows.append(f"              ({doc_id}, {h}, {p}, {s}, {b})")
    return ",\n".join(rows)


if __name__ == "__main__":
    print(values_block())
