"""Rotation-policy conformance for the 50-slot driver window.

The grading driver checks only the FIRST 50 entries of
``__spark_entry__.queries()`` each round; ``_CHECK_FIRST`` /
``_CHECK_LAST`` encode which queries rotate in. With 133+ queries the
policy is load-bearing — these tests make its invariants executable
instead of comment-only (VERDICT r5 item 8):

1. list hygiene: every listed name exists in the registry, no name in
   both lists (a stale/misspelled name would silently drop out of the
   ordering because ``_reorder`` filters unknown keys);
2. nothing ships unchecked: every registry query that has NEVER
   appeared in any ``CORRECTNESS_r*.json`` artifact must be inside the
   current window;
3. bounded staleness: every query either sits in the current window or
   was driver-checked within the last THREE artifacts AS OF WINDOW
   CONSTRUCTION — artifacts with round < ``_WINDOW_ROUND`` (the
   4-round full-coverage cycle a 50-slot window allows at this
   registry size; bound moved from two in round 9 per VERDICT r8
   item 3, and evaluated as-of-construction since round 10 per
   ADVICE r9 so the current round's own artifact — which re-checks
   the current window and never shrinks coverage — cannot
   retro-invalidate a legal parking decision). Capacity is
   4×WINDOW − 3; the ceiling is executable below
   (``test_registry_within_window_capacity``), never a hardcoded
   registry count;
4. rotation freshness: an artifact with round > ``_WINDOW_ROUND`` on
   disk means a new round began. ``test_window_rotated_for_every_artifact``
   goes red BY DESIGN until that round's first commit rotates the
   window and bumps ``_WINDOW_ROUND`` — the driver's end-of-round
   artifact commit co-lands with the NEXT round's rotation, and this
   test (not an incidentally-stale bound) is the forcing function.
"""

from __future__ import annotations

import glob
import json
import re

import __spark_entry__ as entry_mod

WINDOW = 50


def _registry():
    return entry_mod.queries()


def _artifacts():
    """(round_number, {query: row}) sorted ascending.

    Backfilled artifacts (self-attested, driver-equivalent harness —
    e.g. CORRECTNESS_r11.json, see __spark_entry__.py) carry a
    ``_provenance`` key. Surface it (ADVICE r12): consumers of the
    driver-owned namespace must keep self-attested rounds visibly
    distinct from driver-attested ones rather than trusting the
    namespace blindly."""
    out = []
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            data = json.load(open(f))
            prov = data.get("_provenance")
            if prov is not None:
                print(
                    f"NOTE: {f.rsplit('/', 1)[-1]} is backfilled/"
                    f"self-attested, not driver-written: "
                    f"{str(prov)[:200]}"
                )
            out.append((int(m.group(1)), data))
    return sorted(out)


def test_check_lists_are_clean():
    names = set(_registry())
    first, last = entry_mod._CHECK_FIRST, entry_mod._CHECK_LAST
    assert len(first) == len(set(first)), "duplicates in _CHECK_FIRST"
    assert len(last) == len(set(last)), "duplicates in _CHECK_LAST"
    assert not set(first) & set(last), sorted(set(first) & set(last))
    stale = [n for n in first + last if n not in names]
    assert not stale, f"listed but not in registry: {stale}"


def test_never_checked_queries_are_in_window():
    reg = list(_registry())
    window = set(reg[:WINDOW])
    checked = set()
    for _, rows in _artifacts():
        checked |= set(rows)
    never = [n for n in reg if n not in checked]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"never driver-checked and outside the first {WINDOW}: {outside}"
    )


def test_diff_touched_queries_are_in_window():
    """Rule 2 (executable since r7, per ADVICE r6): every query whose
    code or oracle this round's diff touched — recorded in the
    ``_TOUCHED_THIS_ROUND`` ledger next to the window lists, updated
    as part of the diff — must sit inside the current window, even if
    it was green in a recent artifact."""
    reg = list(_registry())
    touched = entry_mod._TOUCHED_THIS_ROUND
    unknown = [n for n in touched if n not in set(reg)]
    assert not unknown, f"touched but not in registry: {unknown}"
    window = set(reg[:WINDOW])
    outside = [n for n in touched if n not in window]
    assert not outside, (
        f"lineage touched this round but outside the window: {outside}"
    )


def test_no_query_stale_beyond_three_artifacts():
    """Bound evaluated as of window construction: only artifacts the
    window could have seen (round < _WINDOW_ROUND) count. The current
    round's own artifact re-checks the current window, so excluding it
    never hides staleness; artifacts NEWER than the window are the
    rotation-freshness test's job."""
    arts = [a for a in _artifacts() if a[0] < entry_mod._WINDOW_ROUND]
    if len(arts) < 3:
        return
    reg = list(_registry())
    window = set(reg[:WINDOW])
    recent = set(arts[-1][1]) | set(arts[-2][1]) | set(arts[-3][1])
    stale = [n for n in reg if n not in window and n not in recent]
    assert not stale, (
        "parked for more than three rounds (as of window construction, "
        f"round {entry_mod._WINDOW_ROUND}) and not in the current "
        f"window: {stale}"
    )


def test_window_rotated_for_every_artifact():
    """The designed forcing function (rule 4 above): the driver writes
    CORRECTNESS_r{N}.json after round N ends, so an artifact with
    round > _WINDOW_ROUND means round N+1 has begun and its rotation
    has not landed yet. Red HERE is the signal to rotate — construct
    the next window (the precomputed queue lives in the
    __spark_entry__.py policy comment) and bump _WINDOW_ROUND."""
    arts = _artifacts()
    if not arts:
        return
    newest = arts[-1][0]
    assert newest <= entry_mod._WINDOW_ROUND, (
        f"CORRECTNESS_r{newest:02d}.json has landed: construct the "
        f"round-{newest + 1} window (queue precomputed in "
        "__spark_entry__.py) and bump _WINDOW_ROUND"
    )


def test_registry_within_window_capacity():
    """The ≤3-artifact bound sustains 4×WINDOW − 3 queries (rule 3
    pins one slot per round); growing past that silently breaks the
    rotation arithmetic, so make the ceiling executable."""
    assert len(_registry()) <= 4 * WINDOW - 3
