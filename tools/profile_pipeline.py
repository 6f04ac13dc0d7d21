"""Attribute the ER pipeline's fixed serial floor (VERDICT r03 item #1).

Runs the identical job bench_scaling times (derive -> resolve -> count)
once at a given parallelism, with the Spark UI enabled, then dumps the
job/stage timeline from the local REST API: per-job wall span, gaps
between jobs (pure driver/scheduler time), and per-stage task counts.

Usage: python tools/profile_pipeline.py [cpus] [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = sys.argv[1] if len(sys.argv) > 1 else "8"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

os.environ["SPARK_GRAFT_CPUS"] = CPUS
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from t_res_spark.session import get_spark, warm_python_workers

    spark = get_spark(
        app_name="t_res_spark-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    import bench as bench_mod
    import __spark_entry__ as entry_mod
    from t_res_spark.plans.pipeline import PipelineConfig, resolve

    transcripts = bench_mod.derived_transcripts_amplified(spark, sf_dir, FACTOR)
    aliases = entry_mod._derived_aliases(spark, sf_dir)
    n_turns = transcripts.count()
    warm_python_workers(spark)

    t0 = time.time()
    res = resolve(spark, transcripts, aliases, config=PipelineConfig())
    n_clusters = res.clusters.count()
    e2e = time.time() - t0
    print(f"e2e={e2e:.2f}s turns={n_turns} clusters={n_clusters} cpus={CPUS}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.loads(r.read())

    jobs = sorted(get("/jobs"), key=lambda j: j["submissionTime"])
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    # only jobs inside the timed region
    t0_wall = t0
    # REST times are in GMT; our t0 is local epoch. Use relative ordering:
    # find the first job submitted after the warmup count job.
    print("\n-- job timeline (all jobs; timed region = after warmup) --")
    prev_end = None
    total_gap = 0.0
    for j in jobs:
        sub = ts(j["submissionTime"])
        end = ts(j.get("completionTime", j["submissionTime"]))
        gap = sub - prev_end if prev_end is not None else 0.0
        total_gap += max(gap, 0.0)
        stages = j.get("stageIds", [])
        print(
            f"job {j['jobId']:>3} dur={end - sub:7.2f}s gap_before={gap:6.2f}s "
            f"tasks={j['numTasks']:>5} stages={stages} desc={j.get('description', j.get('name', ''))[:90]}"
        )
        prev_end = end
    print(f"total inter-job gap: {total_gap:.2f}s")

    print("\n-- stages (completed) --")
    stages = sorted(get("/stages?status=complete"), key=lambda s: s["submissionTime"])
    for s in stages:
        sub = ts(s["submissionTime"])
        # firstTaskLaunchedTime vs submission = scheduling delay
        launch = ts(s.get("firstTaskLaunchedTime", s["submissionTime"]))
        end = ts(s.get("completionTime", s["submissionTime"]))
        print(
            f"stage {s['stageId']:>3} dur={end - sub:6.2f}s sched={launch - sub:5.2f}s "
            f"tasks={s['numCompleteTasks']:>5} in={s['inputBytes']:>11} sh_r={s['shuffleReadBytes']:>10} "
            f"sh_w={s['shuffleWriteBytes']:>10} name={s['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
