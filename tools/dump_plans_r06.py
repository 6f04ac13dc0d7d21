"""Dump `.explain("formatted")` for named gate queries into
plans/r06/<query>_<tag>.txt — the before/after plan evidence for the
round-6 optimization record (OPTIMIZATION_r06.md).

Usage: python tools/dump_plans_r06.py <tag> [query ...]
       (no query args = the default round-6 touch list)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from t_res_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "d2_minhash_clusters",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "d5_embedding_neardup",
    "s6_embedding_topk",
    "ctx_disambiguate",
    "j6_align_spans",
    "j7_align_gold",
    "g1_uncased_gazetteer",
    "er_pipeline",
    "d3b_simhash_pairs",
    "e2e_experiment",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="plans-r06",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
    )
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"[plans] wrote {path}")


if __name__ == "__main__":
    main()
