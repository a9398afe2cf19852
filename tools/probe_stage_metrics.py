"""Ground-truth per-stage metrics via the Spark event log: task
counts, wall/CPU time per stage — answers 'how parallel is the verify
stage actually?' for the LSH family.

Usage: python tools/probe_stage_metrics.py [store|self] [threshold]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.operators import dedup  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark.plans import llm_ops  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events-r13opt"


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "store"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9
    os.makedirs(EVDIR, exist_ok=True)
    import shutil
    for f in glob.glob(f"{EVDIR}/*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    spark = get_spark(
        "probe-stage-metrics",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": EVDIR,
        },
    )
    docs = llm_ops._docs(spark, SF_DIR)
    docs.limit(10).count()
    spark.sparkContext.setJobDescription("TARGET")
    if which == "store":
        llm_ops.doc_arrivals_dedup_store(spark, SF_DIR).write.format(
            "noop"
        ).mode("overwrite").save()
    else:
        dedup.minhash_near_dups(docs, threshold=threshold).write.format(
            "noop"
        ).mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse (event log v2: a directory with zstd-compressed event files)
    stages = {}
    target_stage_ids = set()
    paths = []
    for root, _dirs, files in os.walk(EVDIR):
        paths += [os.path.join(root, f) for f in files if "events" in f]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                t = ev.get("Event")
                if t == "SparkListenerJobStart":
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    if desc == "TARGET":
                        for si in ev.get("Stage Infos", []):
                            target_stage_ids.add(si["Stage ID"])
                elif t == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                        "wall_ms": (si.get("Completion Time", 0) or 0)
                        - (si.get("Submission Time", 0) or 0),
                    }
                elif t == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    st["cpu_ms"] = st.get("cpu_ms", 0) + (
                        m.get("Executor CPU Time", 0) / 1e6
                    )
                    st["run_ms"] = st.get("run_ms", 0) + m.get(
                        "Executor Run Time", 0
                    )
                    st["max_task_ms"] = max(
                        st.get("max_task_ms", 0), m.get("Executor Run Time", 0)
                    )
                    st["in_rows"] = st.get("in_rows", 0) + (
                        (m.get("Input Metrics") or {}).get("Records Read", 0)
                    ) + ((m.get("Shuffle Read Metrics") or {}).get(
                        "Total Records Read", 0
                    ))
    for sid in sorted(stages):
        if target_stage_ids and sid not in target_stage_ids:
            continue
        s = stages[sid]
        print(
            json.dumps(
                {
                    "stage": sid,
                    "tasks": s.get("tasks"),
                    "wall_ms": s.get("wall_ms"),
                    "sum_run_ms": round(s.get("run_ms", 0)),
                    "max_task_ms": s.get("max_task_ms"),
                    "rows_in": s.get("in_rows"),
                    "name": s.get("name"),
                }
            )
        )


if __name__ == "__main__":
    main()
