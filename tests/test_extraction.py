"""Extraction invariants — the per-turn text-equality contract
(/root/reference/tests/test_ner.py:117-190 analog; BASELINE.json
input_hint)."""

from pyspark.sql import functions as F

from t_res_spark.operators.extraction import (
    extract_mentions,
    extract_mentions_from_text,
)
from t_res_spark.sources.tables import read_fixture


def test_guards():
    # short-turn guard (recogniser.py:369-371)
    assert extract_mentions_from_text("a") == []
    assert extract_mentions_from_text("") == []
    assert extract_mentions_from_text(None) == []
    # OCR garbage golden (tests/test_pipeline.py:85-90)
    assert extract_mentions_from_text(" • - ST G pOllO-P• FERRIS - • - , i ") == []


def test_shapes():
    assert extract_mentions_from_text("we saw New York City then") == [
        ("New York City", 7, 20)
    ]
    assert extract_mentions_from_text("near Ashton-under-Lyne today") == [
        ("Ashton-under-Lyne", 5, 22)
    ]
    assert extract_mentions_from_text("the Isle of Wight ferry") == [
        ("Isle of Wight", 4, 17)
    ]
    # n-dash split (recogniser.py:374-379)
    assert extract_mentions_from_text("Plymouth—Kingston line") == [
        ("Plymouth", 0, 8),
        ("Kingston", 9, 17),
    ]
    # sanity filter: single char + all-lowercase dropped (pipeline.py:618)
    assert extract_mentions_from_text("to salop and X marks") == []


def test_text_equality_invariant_spark(spark, tiny_dir):
    """end_char - start_char == len(mention) and
    substring(text, start+1, len) == mention, under stable
    (conv_id, turn_idx) ordering — tests/test_ner.py:147-153 analog."""
    transcripts = read_fixture(spark, tiny_dir, "transcripts")
    mentions = extract_mentions(transcripts)
    joined = mentions.join(transcripts, ["conv_id", "turn_idx"])
    bad = joined.filter(
        (F.col("end_char") - F.col("start_char") != F.length("mention"))
        | (
            F.expr("substring(text, start_char + 1, end_char - start_char)")
            != F.col("mention")
        )
    )
    assert bad.count() == 0
    assert mentions.count() > 0


def test_extraction_matches_planted(spark, tiny_dir):
    transcripts = read_fixture(spark, tiny_dir, "transcripts")
    planted = read_fixture(spark, tiny_dir, "planted")
    got = extract_mentions(transcripts).select(
        "conv_id", "turn_idx", "mention", "start_char", "end_char"
    )
    want = planted.select("conv_id", "turn_idx", "mention", "start_char", "end_char")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_unicode_extraction_goldens():
    """VERDICT r03 item #3: accented / non-Latin capitalized toponyms
    ARE extracted (the reference's HF NER tags these,
    recogniser.py:331); uncased scripts yield nothing (documented
    scope limit of a rule-based tagger)."""
    from t_res_spark.operators.extraction import extract_mentions_fast

    cases = {
        "we reached Łódź by night": [("Łódź", 11, 15)],
        "flying into İstanbul today": [("İstanbul", 12, 20)],
        "the waters of Évian are cold": [("Évian", 14, 19)],
        "train to Москва tonight": [("Москва", 9, 15)],
        "São Paulo and Córdoba": [("São Paulo", 0, 9), ("Córdoba", 14, 21)],
        "Ōsaka and Ærø and Þingvellir": [
            ("Ōsaka", 0, 5), ("Ærø", 10, 13), ("Þingvellir", 18, 28)
        ],
        # uncased scripts: no capitalization signal
        "去 北京 and التاريخ and עברית": [],
        # all-caps OCR stays rejected in any script
        "ŁÓDŹ MOCKBA ISTANBUL": [],
    }
    for text, want in cases.items():
        assert extract_mentions_from_text(text) == want, text
        assert extract_mentions_fast(text) == want, text


def test_mention_ner_score_goldens():
    """A3 — mean of deterministic token scores, round 3dp
    (utils/ner.py:254-260 consolidation)."""
    from t_res_spark.operators.extraction import mention_ner_score, token_ner_score

    assert token_ner_score("New") == 0.93          # 0.9 + 3/100
    assert token_ner_score("of") == 0.85           # connector
    assert token_ner_score("Ashton-under-Lyne") == 0.99  # len-capped
    assert mention_ner_score("New York City") == 0.937   # (.93+.94+.94)/3
    assert mention_ner_score("Isle of Wight") == 0.913   # (.94+.85+.95)/3
    assert mention_ner_score("") == 0.0


def test_extract_mentions_carries_real_ner_score(spark):
    from t_res_spark.operators.extraction import extract_mentions

    df = spark.createDataFrame(
        [("c1", 0, "user", "we saw New York City then", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = extract_mentions(df).collect()
    assert len(rows) == 1 and rows[0]["ner_score"] == 0.937


def test_prefilter_is_semantically_neutral(spark):
    """The RLIKE prefilter drops only rows that yield zero mentions."""
    from t_res_spark.operators.extraction import (
        extract_mentions,
        extract_mentions_from_text,
    )

    texts = [
        "all lowercase tool output with no mentions",
        "WE SAW ALL CAPS OCR GARBAGE",
        "a York trip",        # survives: capital+lower
        "numbers 123 only",
        "Δx = 4 unicode",
    ]
    for t in texts[:2] + texts[3:4]:
        assert extract_mentions_from_text(t) == [] or any(
            c.isupper() for c in t
        )
    df = spark.createDataFrame(
        [("c", i, "user", t, None, None) for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {(r["turn_idx"], r["mention"]) for r in extract_mentions(df).collect()}
    expected = {
        (i, m)
        for i, t in enumerate(texts)
        for m, _s, _e in extract_mentions_from_text(t)
    }
    assert got == expected


class TestFastPathParity:
    """extract_mentions_fast must be BIT-IDENTICAL to the reference
    kernel — same mentions, same offsets — on every input. The fast
    path is what runs inside the Spark UDF; the kernel is the oracle."""

    CASES = [
        "We visited Port of Spain today and then Ashton-under-Lyne quickly.",
        "London The Hague",          # stop-cap breaks the span
        "London the Hague",          # lowercase connector bridges it
        "London Of Paris",           # capitalized Of is stop, not connector
        "Isle of the Sea",           # double connector does not bridge
        "Plymouth—Kingston sailed",  # n-dash comma fix splits tokens
        "London, Ontario is not London Ontario",
        "«London» and (Paris) and 'Brest'",
        "Lon»don is broken but Berlin works",
        "xLondon LOndon O'Brien London-on-Sea London- -Paris",
        "a.. ..b Nice... ...Nice",
        "We of London",              # leading stop + connector orphan
        "London of' Paris London 'of Paris London of· Paris",
        "_London __Berlin_ 7-London x-London",
        "Ab Cd of Ef the Gh upon Ij",
        " • - ST G pOllO-P• FERRIS …",
        "London\tof\nParis",         # any whitespace joins
        "London  of   Paris",        # multi-space gaps
        "So Paris then",             # 'So' stop-capitalized
        "",
        "x",
        "—Leading ndash City",
        # unicode: full Lu/Ll classes (r4) — non-ASCII capitals start
        # mentions in both paths; uncased scripts still yield nothing
        "Visiting Zürich and München today",
        "Ávila is old",
        "Los Ángeles-style Füßgänger toward Kyōto",
        "João went to São Paulo",
        "L'Aquila O’Connor D’Arcy",
        "Ciudad de México",
        "北京 and Tōkyō and Москва",
        "İstanbul ıı",
    ]

    def test_adversarial_goldens(self):
        from t_res_spark.operators.extraction import (
            extract_mentions_fast,
            extract_mentions_from_text,
        )

        for t in self.CASES:
            assert extract_mentions_fast(t) == extract_mentions_from_text(t), t

    def test_property_random_texts(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from t_res_spark.operators.extraction import (
            extract_mentions_fast,
            extract_mentions_from_text,
        )

        word = st.text(
            alphabet="abcdefgALONToOf'’-_»«(),.—·7 \t\nŁłİıÉéÓóŻżМмоÅß",
            min_size=0,
            max_size=8,
        )
        texts = st.lists(word, min_size=0, max_size=12).map(" ".join)

        @settings(max_examples=400, deadline=None)
        @given(texts)
        def check(t):
            assert extract_mentions_fast(t) == extract_mentions_from_text(t), repr(t)

        check()

    def test_connector_and_stopcap_vocab_sweep(self):
        """Every connector and a sample of stop-caps, in bridge
        position, against the kernel."""
        from t_res_spark.operators.extraction import (
            _CONNECTORS,
            _STOP_CAPS,
            extract_mentions_fast,
            extract_mentions_from_text,
        )

        mids = sorted(_CONNECTORS) + sorted(_STOP_CAPS)[:15] + ["xx", "-", ","]
        for mid in mids:
            t = f"London {mid} Paris"
            assert extract_mentions_fast(t) == extract_mentions_from_text(t), t


def test_prefilter_unicode_parity(spark):
    """ADVICE r4: the JVM RLIKE prefilter must keep every row the
    Python kernel can extract a mention from. Full-BMP sweep: for each
    Python-classified Lu char X the bigram 'Xa' must pass, and for
    each Ll char y the bigram 'Ay' must pass. If either Unicode table
    moves (newer Python, different JRE), this pinpoints the new delta
    for extraction._JVM_DELTA_LU/_LL."""
    import unicodedata

    from t_res_spark.operators.extraction import PREFILTER_PATTERN

    lu = [chr(c) for c in range(0x41, 0x10000)
          if unicodedata.category(chr(c)) == "Lu"]
    ll = [chr(c) for c in range(0x41, 0x10000)
          if unicodedata.category(chr(c)) == "Ll"]
    rows = [(f"lu:{ord(c):04x}", c + "a") for c in lu] + [
        (f"ll:{ord(c):04x}", "A" + c) for c in ll
    ]
    df = spark.createDataFrame(rows, "k string, s string")
    kept = {r.k for r in df.filter(df.s.rlike(PREFILTER_PATTERN)).collect()}
    missing = sorted(k for k, _ in rows if k not in kept)
    assert missing == [], (
        f"JVM prefilter drops {len(missing)} kernel-extractable bigrams; "
        f"update _JVM_DELTA_LU/_LL: {missing[:20]}"
    )
