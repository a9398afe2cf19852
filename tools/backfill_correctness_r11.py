"""One-shot backfill of CORRECTNESS_r11.json (driver gap, VERDICT r11).

The round-11 driver committed VERDICT/ADVICE/BENCH but wrote no
CORRECTNESS_r11.json; the judge substituted an independent full-registry
oracle run (153/153 green — VERDICT r11 headline).  Without the artifact
the rotation-staleness arithmetic in tests/test_registry_rotation.py
breaks: the 19 r7-checked queries re-verified inside the r11 window
would read as never-re-checked and force a 69-wide r12 window.

This script re-runs the SAME driver-equivalent gate
(tests/oracle_harness.compare, sf0.01) over the first-50 window of the
UNMODIFIED r11 end-of-round tree (git clean at invocation) and writes
the artifact in the driver's format, plus a ``_provenance`` key naming
this script so the trail is honest.  Run exactly once, at the first
commit of round 12, before any round-12 code change.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import oracle_harness as oh  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from etl_with_s3__dynamodb_and_glue_spark import get_spark  # noqa: E402

WINDOW = 50


def main() -> None:
    dirty = subprocess.run(
        ["git", "-C", "/root/repo", "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    tree_note = "git clean (r11 end-of-round tree)" if not dirty else f"DIRTY: {dirty[:200]}"

    spark = get_spark("correctness-backfill-r11")
    qs, oracles = e.queries(), e.oracle_sql()
    window = list(qs)[:WINDOW]
    out: dict[str, dict] = {}
    failures = 0
    for name in window:
        try:
            r = oh.compare(spark, oh.SF_DIR_DEFAULT, name, qs[name], oracles.get(name))
            row = {
                "rows_match": bool(
                    r.get("oracle_rows", r["spark_rows"]) == r["spark_rows"]
                ),
                "schema_match": bool(r.get("cols_match", True)),
                "hash_match": bool(r.get("values_match", False))
                if "values_match" in r
                else None,
                "spark_rows": r["spark_rows"],
                "oracle_rows": r.get("oracle_rows"),
                "err": None,
            }
            ok = r.get("ok", False)
        except Exception as exc:  # noqa: BLE001
            row = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}",
            }
            ok = False
        if not ok:
            failures += 1
        out[name] = row
        print(("OK  " if ok else "FAIL"), name, flush=True)

    out["_provenance"] = {
        "source": "tools/backfill_correctness_r11.py (local oracle_harness run)",
        "reason": (
            "round-11 driver wrote no CORRECTNESS_r11.json; judge's own "
            "full-registry run was 153/153 green (VERDICT r11). This "
            "backfill re-ran the driver-equivalent gate over the r11 "
            "window on the unmodified end-of-round tree."
        ),
        "tree": tree_note,
        "sf_dir": oh.SF_DIR_DEFAULT,
        "failures": failures,
    }
    with open("/root/repo/CORRECTNESS_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote CORRECTNESS_r11.json: {len(window)} queries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
