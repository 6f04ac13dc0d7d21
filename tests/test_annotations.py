"""S8/S9 — WebAnno + HIPE format parsers on synthetic samples in the
public formats (the reference downloads real files; downloads are out
of scope, the parsing capability is not)."""

import pytest


WEBANNO = "\n".join([
    "#FORMAT=WebAnno TSV 3.2",
    "#T_SP=webanno.custom.Toponym|label|wkpd",
    "",
    "#Text=I saw San Francisco yesterday",
    "1-1\t0-1\tI\t_\t_",
    "1-2\t2-5\tsaw\t_\t_",
    "1-3\t6-9\tSan\tQ62[1]\tLOC[1]",
    "1-4\t10-19\tFrancisco\tQ62[1]\tLOC[1]",
    "1-5\t20-29\tyesterday\t_\t_",
    "#Text=Paris is lovely",
    "2-1\t30-35\tParis\tQ90\tLOC",
    "2-2\t36-38\tis\t_\t_",
    "2-3\t39-45\tlovely\t_\t_",
])

HIPE = "\n".join([
    "TOKEN\tNE-COARSE-LIT\t...header...",
    "# hipe2022:document_id = sn83030214-1918-01-01",
    "# date = 1918-01-01",
    "We O O O O O O O O _",
    "left O O O O O O O O _",
    "London B-loc O B-loc O O O Q84 O _",
    "today O O O O O O O O EndOfSentence",
    "New B-loc O B-loc O O O Q60 O _",
    "York I-loc O I-loc O O O Q60 O _",
    "calls O O O O O O O O EndOfSentence",
    "# hipe2022:document_id = sn83030214-1918-01-02",
    "Berlin B-loc O B-loc O O O _ O EndOfSentence",
])


@pytest.fixture(scope="module")
def webanno_lines(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("webanno") / "sample.tsv"
    p.write_text(WEBANNO)
    from t_res_spark.sources.annotations import read_annotation_lines

    return read_annotation_lines(spark, str(p))


def test_parse_webanno_tokens_and_mentions(webanno_lines):
    from t_res_spark.sources.annotations import parse_webanno

    tokens, mentions = parse_webanno(webanno_lines)
    tok = {(r["sent_pos"], r["tok_pos"]): r for r in tokens.collect()}
    assert tok[(1, 3)]["bio"] == "B-LOC" and tok[(1, 3)]["wkpd"] == "Q62"
    assert tok[(1, 4)]["bio"] == "I-LOC"
    assert tok[(2, 1)]["bio"] == "B-LOC"
    assert tok[(1, 1)]["bio"] == "O"
    m = {r["mention"]: r for r in mentions.collect()}
    # multi-token collation with offset-faithful whitespace
    assert "San Francisco" in m
    assert m["San Francisco"]["start_char"] == 6
    assert m["San Francisco"]["end_char"] == 19
    assert m["San Francisco"]["wkpd"] == "Q62"
    assert m["Paris"]["label"] == "LOC"


def test_parse_hipe_documents(spark, tmp_path):
    from t_res_spark.sources.annotations import parse_hipe, read_annotation_lines

    p = tmp_path / "hipe.tsv"
    p.write_text(HIPE)
    out = parse_hipe(read_annotation_lines(spark, str(p))).collect()
    sents = {(r["article_id"], r["sent_pos"]): r["text"]
             for r in out if r["kind"] == "sentence"}
    anns = [r for r in out if r["kind"] == "annotation"]
    assert sents[("sn83030214-1918-01-01", 0)] == "We left London today"
    assert sents[("sn83030214-1918-01-01", 1)] == "New York calls"
    assert sents[("sn83030214-1918-01-02", 0)] == "Berlin"
    by_mention = {r["mention"]: r for r in anns}
    assert by_mention["London"]["wkdt_qid"] == "Q84"
    assert by_mention["London"]["mention_start"] == 8
    s = sents[("sn83030214-1918-01-01", 0)]
    r = by_mention["London"]
    assert s[r["mention_start"]:r["mention_end"]] == "London"
    assert by_mention["New York"]["wkdt_qid"] == "Q60"
    assert by_mention["New York"]["mention_start"] == 0
    assert by_mention["Berlin"]["wkdt_qid"] == "NIL"  # '_' link -> NIL


# Real HIPE-2022 format: TAB-separated, tokens may contain spaces and
# columns may be empty — whitespace split() would mis-column both.
HIPE_TABS = "\n".join([
    "# hipe2022:document_id = tabdoc",
    "\t".join(["de la Rue", "B-loc", "O", "B-loc", "", "", "O", "Q123", "O", "_"]),
    "\t".join(["stands", "O", "O", "O", "", "", "O", "O", "O", "EndOfSentence"]),
    "badline with too few columns",
    "\t".join(["Paris", "B-loc", "O", "B-loc", "", "", "O", "Q90", "O",
               "EndOfSentence"]),
])


def test_parse_hipe_tab_separated(spark, tmp_path):
    """Tab split keeps internal-space tokens and empty columns intact;
    malformed lines surface as a 'malformed' diagnostic row, not a
    silent skip (ADVICE r02)."""
    from t_res_spark.sources.annotations import parse_hipe, read_annotation_lines

    p = tmp_path / "hipe_tabs.tsv"
    p.write_text(HIPE_TABS)
    out = parse_hipe(read_annotation_lines(spark, str(p))).collect()
    anns = {r["mention"]: r for r in out if r["kind"] == "annotation"}
    assert "de la Rue" in anns and anns["de la Rue"]["wkdt_qid"] == "Q123"
    sents = [r["text"] for r in out if r["kind"] == "sentence"]
    assert "de la Rue stands" in sents
    bad = [r for r in out if r["kind"] == "malformed"]
    assert len(bad) == 1 and bad[0]["mention_start"] == 1  # dropped count


def test_hipe_token_table_declarative(spark, tmp_path):
    """S9a — the declarative half alone: doc-id propagation + tab
    column split, no sequential state."""
    from t_res_spark.sources.annotations import (
        hipe_token_table,
        read_annotation_lines,
    )

    p = tmp_path / "hipe_tok.tsv"
    p.write_text(HIPE_TABS)
    rows = {r["token"]: r for r in
            hipe_token_table(read_annotation_lines(spark, str(p))).collect()}
    assert "badline" not in " ".join(rows)  # malformed line filtered
    assert rows["de la Rue"]["article_id"] == "tabdoc"
    assert rows["de la Rue"]["etag"] == "B-loc"
    assert rows["de la Rue"]["elink"] == "Q123"
    assert rows["Paris"]["misc"] == "EndOfSentence"
