"""Parse a Spark event log dir: per-stage task count, wall, total/max
task run time, GC, input/shuffle rows — the per-stage ground truth the
(disabled) UI would show.

Usage: python tools/parse_eventlog.py [evdir]
"""

from __future__ import annotations

import json
import os
import sys

EVDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events-r13opt"


def main() -> None:
    stages: dict[int, dict] = {}
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
                if t == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    st = stages.setdefault(si["Stage ID"], {})
                    st["name"] = si["Stage Name"].split("\n")[0][:60]
                    st["tasks"] = si["Number of Tasks"]
                    st["wall_ms"] = (si.get("Completion Time") or 0) - (
                        si.get("Submission Time") or 0
                    )
                elif t == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    run = m.get("Executor Run Time", 0)
                    st["run_ms"] = st.get("run_ms", 0) + run
                    st["max_task_ms"] = max(st.get("max_task_ms", 0), run)
                    st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                    st["rows_in"] = (
                        st.get("rows_in", 0)
                        + ((m.get("Input Metrics") or {}).get("Records Read", 0))
                        + (
                            (m.get("Shuffle Read Metrics") or {}).get(
                                "Total Records Read", 0
                            )
                        )
                    )
    total_run = sum(s.get("run_ms", 0) for s in stages.values())
    for sid in sorted(stages):
        s = stages[sid]
        if s.get("run_ms", 0) < 50 and (s.get("wall_ms") or 0) < 50:
            continue
        print(
            json.dumps(
                {
                    "stage": sid,
                    "tasks": s.get("tasks"),
                    "wall_ms": s.get("wall_ms"),
                    "sum_run_ms": s.get("run_ms", 0),
                    "max_task_ms": s.get("max_task_ms", 0),
                    "gc_ms": s.get("gc_ms", 0),
                    "rows_in": s.get("rows_in", 0),
                }
            )
        )
    print(json.dumps({"total_task_run_ms": total_run}))


if __name__ == "__main__":
    main()
