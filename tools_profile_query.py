#!/usr/bin/env python
"""Per-job profile of one registered query (optimization-round tooling).

Runs the named queries once (after an optional warm-up) in a fresh
session with the Spark event log enabled, then parses the event log and
prints one line per job: wall ms, stage count, task count, shuffle
read/write bytes. This is the guide-§1 "where does the time actually
go" measurement for driver-loop operators whose cost is spread over
many small jobs (trainers, iterative graph ops) where a single
`.explain` can't show the split.

    python tools_profile_query.py v16_ivfpq_audit [--sf-dir DIR] [--no-warm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    warm = "--no-warm" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for i, a in enumerate(sys.argv):
        if a == "--sf-dir":
            sf_dir = sys.argv[i + 1]

    import tempfile

    evdir = tempfile.mkdtemp(prefix="dlw_eventlog_")
    from datalake_worker_spark.session import get_spark
    from datalake_worker_spark import registry

    spark = get_spark(
        app_name="dlw-profile",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
        ),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.dir": evdir,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in argv:
        fn = qs[name]
        if warm:
            fn(spark, sf_dir).count()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        print(f"== {name}: {dt:.3f}s (timed run)")
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: job start/end, stage shuffle metrics
    path = None
    for f in os.listdir(evdir):
        if app_id in f:
            path = os.path.join(evdir, f)
    if path is None:  # fall back to the newest file in the log dir
        cands = sorted(
            (os.path.join(evdir, f) for f in os.listdir(evdir)),
            key=os.path.getmtime,
        )
        path = cands[-1] if cands else None
    if path is not None and os.path.isdir(path):
        # rolling event-log layout: a directory of events_* files
        paths = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        paths = [path] if path else []
    jobs = {}
    stage_of_job = {}
    stages = {}
    import itertools
    def _lines():
        for p in paths:
            with open(p) as fh:
                yield from fh
    if True:
        for line in _lines():
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                jobs[jid] = {
                    "t0": e["Submission Time"],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                    "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                }
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                }
                stages[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"][:40],
                    "sr": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    + acc.get("internal.metrics.shuffle.read.localBytesRead", 0),
                    "sw": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                }
    print(f"\n{'job':>4} {'ms':>7} {'stages':>6} {'tasks':>6} "
          f"{'shuf_r':>9} {'shuf_w':>9}  first-stage")
    tot = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        ms = j["t1"] - j["t0"]
        tot += ms
        ss = [stages[s] for s in j["stages"] if s in stages]
        tasks = sum(s["tasks"] for s in ss)
        sr = sum(s["sr"] for s in ss)
        sw = sum(s["sw"] for s in ss)
        nm = ss[0]["name"] if ss else ""
        print(f"{jid:>4} {ms:>7} {len(ss):>6} {tasks:>6} {sr:>9} {sw:>9}  {nm}")
    print(f"sum of job wall ms: {tot}")


if __name__ == "__main__":
    main()
