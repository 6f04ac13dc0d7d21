"""Scaling-efficiency evidence (north rule): run the identical ER
pipeline job on the identical input at two parallelism levels —
local[N] and local[4N] — in fresh JVMs, and report throughput at both
plus scaling efficiency = (T_N / T_4N) / 4.

N comes from argv[3] and defaults to 2 (i.e. local[2] vs local[8]);
the N actually used is recorded in BENCH/BASELINE.md's methodology
line. Low N keeps both runs inside the box's free capacity (ambient
neighbor load ~10-14 cores) so the ratio measures the engine, not
contention.

The sandbox has no multi-executor cluster; two local parallelism levels
on the same 32-core box are the driver-sanctioned stand-in (task
instructions). Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [sf_dir] [turns_factor] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, sf_dir: str, factor: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        TRES_BENCH_TURNS_FACTOR=str(factor),
        TRES_BENCH_PIPELINE_ONLY="1",
        # identical logical job at both parallelism levels: fix the
        # shuffle partitioning so only executor-thread count varies
        TRES_SHUFFLE_PARTITIONS="64",
        TRES_DRIVER_MEM="16g",
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.environ.get("TRES_TASKSET") == "1":
        # Pin the whole process tree (JVM task threads, python workers,
        # GC) to exactly `cpus` cores — the cgroup-limited-executor
        # model. Without pinning, local-mode low-N legs silently borrow
        # idle cores for their python workers and GC (measured: the
        # "1-thread" leg consumes ~2 cores of CPU), overstating the
        # N-leg and understating the ratio.
        cmd = ["taskset", "-c", f"0-{cpus - 1}" if cpus > 1 else "0"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    # N and 4N thread counts. The sandbox box carries ambient external
    # load (~10-14 cores observed via loadavg), so the default pair
    # (4, 16) stays inside the genuinely free capacity — oversubscribing
    # to local[32] measures contention with neighbors, not the engine.
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = n_lo * 4
    # best-of-2 per level: the ambient load spikes unpredictably, and a
    # spike during one leg would measure the neighbors, not the engine
    runs_lo = [run_once(n_lo, sf_dir, factor) for _ in range(2)]
    runs_hi = [run_once(n_hi, sf_dir, factor) for _ in range(2)]
    r8 = min(runs_lo, key=lambda r: r["value"])
    r32 = min(runs_hi, key=lambda r: r["value"])
    t8, t32 = r8["value"], r32["value"]
    eff = (t8 / t32) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    pinned = os.environ.get("TRES_TASKSET") == "1"
    pin_note = (
        "\nCPU affinity: each leg pinned (taskset) to exactly its core"
        "\ncount — the cgroup-limited-executor model; unpinned local-mode"
        "\nlow-N legs borrow idle cores for python workers/GC and"
        "\noverstate the N-leg (see run_once)." if pinned else ""
    )
    md = f"""# BENCH — throughput + scaling efficiency

Same job (full ER pipeline: extract → block → score → link → CC-cluster),
same input ({sf_dir}, {r8['turns']} turns derived at factor {factor}),
two parallelism levels in fresh JVMs. Config: AQE on (coalesce + skew
join), shuffle partitions fixed at 64 for both levels, salt_factor=8,
Arrow batches 10k. Same logical plan; only executor-thread count varies.{pin_note}

| parallelism | wall (s) | turns/sec |
|---|---|---|
| local[{n_lo}]  (N)  | {t8:.2f} | {r8['turns_per_sec']:.1f} |
| local[{n_hi}] (4N) | {t32:.2f} | {r32['turns_per_sec']:.1f} |

**Scaling efficiency (N→4N) = (T_N / T_4N) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json; sandbox evidence in lieu of a real
multi-executor cluster, per round instructions)

Methodology notes:
- best-of-2 runs per level (fresh JVM each); the sandbox box carries
  ambient external load (loadavg 5-14 observed while our side is idle),
  so single runs measure neighbors as much as the engine;
- python workers warmed before the timed region (steady-state
  throughput — a long-lived cluster amortizes worker spin-up to zero);
- the timed job: derive transcripts → extract (Arrow UDF) → block →
  score → link → entity-level connected components → count clusters;
- at 10^12 turns the same plan shape holds: extraction scales with
  input splits, scoring with |distinct surfaces|, CC with |entities|.

Raw JSON:

```
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
