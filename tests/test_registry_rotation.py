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
   was driver-checked within the last THREE committed artifacts (the
   4-round full-coverage cycle a 50-slot window allows at this
   registry size — bound moved from two in round 9 per VERDICT r8
   item 3; capacity 4×50 − 3 = 197 with the registry at 150, see the
   capacity note in ``__spark_entry__.py``).
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
    """(round_number, {query: row}) sorted ascending."""
    out = []
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            out.append((int(m.group(1)), json.load(open(f))))
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
    arts = _artifacts()
    if len(arts) < 3:
        return
    reg = list(_registry())
    window = set(reg[:WINDOW])
    recent = set(arts[-1][1]) | set(arts[-2][1]) | set(arts[-3][1])
    stale = [n for n in reg if n not in window and n not in recent]
    assert not stale, (
        "parked for more than three rounds and not in the current "
        f"window: {stale}"
    )


def test_registry_within_window_capacity():
    """The ≤3-artifact bound sustains 4×WINDOW − 3 queries (rule 3
    pins one slot per round); growing past that silently breaks the
    rotation arithmetic, so make the ceiling executable."""
    assert len(_registry()) <= 4 * WINDOW - 3
