#!/usr/bin/env python
"""Per-job time attribution for one registry query.

Usage: python scripts/job_profile.py <query> [repeat]

Runs the query through the same warmup + noop-sink harness as
``bench.py`` with the Spark event log enabled, then parses the event
log into a per-job table: job id, wall seconds, the job group /
description active when it was submitted, and the DRIVER GAP since the
previous job ended (query-build work, scalar decisions, py4j
round-trips — time no task is running). This is the guide §1.1
"decide whether the time is going to compute, scheduler delay, or
driver" step for queries whose work spans many jobs (fold loops,
convergence checks, lazy-checkpoint chains), where a single plan
explains nothing.

The numbers drive OPTIMIZATION notes only; nothing here runs in the
bench or correctness paths.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

EVDIR = tempfile.mkdtemp(prefix="spark-events-")

from cam_location_addressing_feature_service_etl_spark.session import (  # noqa: E402
    _BUILDER_CONF,
)

_BUILDER_CONF["spark.eventLog.enabled"] = "true"
_BUILDER_CONF["spark.eventLog.dir"] = EVDIR
_BUILDER_CONF["spark.eventLog.compress"] = "false"

from cam_location_addressing_feature_service_etl_spark.benchwarm import (  # noqa: E402
    timed_noop_run,
    warm_session,
)
from cam_location_addressing_feature_service_etl_spark.session import (  # noqa: E402
    get_spark,
)
from cam_location_addressing_feature_service_etl_spark.workload import (  # noqa: E402
    QUERIES,
)


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if repeats < 1:
        raise SystemExit("repeats must be >= 1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cam-etl-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    warm_session(spark, sf_dir)

    # marker epoch: only jobs submitted after this are the query's
    for r in range(repeats):
        t_mark = time.time() * 1000.0
        dt = timed_noop_run(spark, QUERIES[name], sf_dir)
        print(f"[{r}] {name} wall={dt:.3f}s", file=sys.stderr)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling layout: eventlog_v2_<appId>/events_*; classic
    # layout: a single file named <appId>[.inprogress]
    paths = []
    for p in os.listdir(EVDIR):
        full = os.path.join(EVDIR, p)
        if os.path.isdir(full) and app_id in p:
            paths.extend(
                os.path.join(full, f)
                for f in sorted(os.listdir(full))
                if f.startswith("events")
            )
        elif p.startswith(app_id):
            paths.append(full)
    jobs: dict[int, dict] = {}
    for path in paths:
        _parse(path, jobs)

    rows = _select_rows(jobs, t_mark, dt)
    _report(rows)


def _parse(path: str, jobs: dict) -> None:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:60],
                    "stages": len(ev.get("Stage IDs", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

def _select_rows(jobs: dict, t_mark: float, dt: float) -> list[dict]:
    rows = sorted(
        (j for j in jobs.values() if "end" in j),
        key=lambda j: j["start"],
    )
    # keep only the LAST repeat's window (t_mark is the last marker;
    # strictly >= so a previous repeat's tail jobs can't inflate the
    # first gap row)
    return [j for j in rows if j["start"] >= t_mark]


def _report(rows: list[dict]) -> None:
    prev_end = None
    tot_job = 0.0
    tot_gap = 0.0
    print(f"{'job_s':>7} {'gap_s':>7} {'stg':>3}  desc")
    for j in rows:
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        dur = (j["end"] - j["start"]) / 1000.0
        tot_job += dur
        tot_gap += max(gap, 0.0)
        print(f"{dur:7.3f} {gap:7.3f} {j['stages']:3d}  {j['desc']}")
        prev_end = max(prev_end or j["end"], j["end"])
    print(
        f"-- {len(rows)} jobs, job-time {tot_job:.2f}s, "
        f"inter-job driver gaps {tot_gap:.2f}s"
    )


if __name__ == "__main__":
    main()
