"""Dump formatted physical plans for the engine's key operators and
grep the properties that matter at 100 TB: PushedFilters reaching the
parquet scan, broadcast vs shuffle joins, whole-stage codegen coverage,
exchange (shuffle) counts.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from t_res_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _codegen_spans(df) -> int:
    """Count DISTINCT whole-stage-codegen regions. Under AQE the
    pre-execution formatted plan is the NON-final AdaptiveSparkPlan,
    which carries no ``codegen id`` annotations (they appear only per
    executed stage) — counting on it silently reads 0 for every query.
    Re-explain with AQE off for this metric only; join/exchange counts
    stay on the production (AQE) plan above."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # the audit's first explain already cached this df's
        # QueryExecution (with the AQE wrapper); wrap in a trivial
        # Project so a FRESH execution is planned under AQE-off — the
        # Project collapses away in optimization
        p = plan_of(df.select("*"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(set(re.findall(r"codegen id : (\d+)", p)))


def audit(name: str, df) -> None:
    p = plan_of(df)
    n_exchange = len(re.findall(r"\bExchange\b", p))
    n_codegen = _codegen_spans(df)
    bhj = len(re.findall(r"BroadcastHashJoin", p))
    smj = len(re.findall(r"SortMergeJoin", p))
    shj = len(re.findall(r"ShuffledHashJoin", p))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    print(f"== {name}: exchanges={n_exchange} codegen_spans={n_codegen} "
          f"BHJ={bhj} SMJ={smj} SHJ={shj}")
    for pf in pushed:
        if pf.strip():
            print(f"   PushedFilters: {pf}")
    if os.environ.get("TRES_EXPLAIN_FULL"):
        print(p)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=8)

    import __spark_entry__ as entry_mod
    from t_res_spark.datagen import ensure_fixture
    from t_res_spark.operators import extraction, linking, ranking
    from t_res_spark.operators.dedup import minhash_signatures
    from t_res_spark.sources.tables import read_fixture

    fdir = ensure_fixture("tiny", root=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"))
    transcripts = read_fixture(spark, fdir, "transcripts")
    aliases_raw = read_fixture(spark, fdir, "aliases")

    # S2: noise filter must reach the parquet scan as PushedFilters
    audit("clean_aliases scan", ranking.clean_aliases(aliases_raw))

    mentions = extraction.extract_mentions(transcripts)
    surfaces = extraction.distinct_mentions(mentions)
    audit("extract+distinct", surfaces)

    aliases = ranking.clean_aliases(aliases_raw)
    # no forced hint — AQE may promote to BHJ at runtime, the STATIC
    # plan must not carry a broadcast on the alias side
    audit("perfect_match (no forced hint)", ranking.perfect_match(surfaces, aliases))

    cands = ranking.find_candidates(surfaces, aliases, method="fuzzy")
    audit("fuzzy candidates", cands)
    audit("most_popular", linking.most_popular(cands))

    entry_mod._register(spark, sf_dir)
    audit("minhash signatures", minhash_signatures(spark.table("documents")))
    audit("q_w2_top7", entry_mod.q_w2_top7(spark, sf_dir))
    audit("q_opt_salted_agg", entry_mod.q_opt_salted_agg(spark, sf_dir))

    from t_res_spark.operators.dedup import simhash, simhash_near_pairs
    fps = simhash(spark.table("documents"))
    audit("simhash (single-fold)", fps)
    audit("simhash_near_pairs (banded)", simhash_near_pairs(fps))
    audit("q_j3b_blocked_fuzzy", entry_mod.q_j3b_blocked_fuzzy(spark, sf_dir))
    audit("q_m1_parse_ingest (from_json)", entry_mod.q_m1_parse_ingest(spark, sf_dir))


if __name__ == "__main__":
    main()
