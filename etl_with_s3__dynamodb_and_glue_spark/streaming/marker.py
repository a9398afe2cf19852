"""Run-scoped replay marker shared by the foreachBatch gates
(``ingest_dedup``, ``vector_ingest``, ``decontam_gate``).

The marker records the last FULLY-landed (run_id, batch_id) so an
at-least-once replay of a landed batch short-circuits instead of
re-running its writes. Contract details the three gates previously
each hand-rolled (now in one place, ADVICE r7):

- **Atomic writes** (temp file + ``os.replace``): a crash mid-write can
  no longer leave a truncated marker that poisons every later batch.
- **Empty-file tolerance**: a zero-byte marker (legacy non-atomic
  writer, killed mid-write) reads as ABSENT — the worst case is one
  redundant re-run of an idempotent batch (every gate lands per-batch
  ``batch_id=N`` subtrees with overwrite), which beats failing forever.
- **Legacy single-line markers** (pre run-scoping, no run_id line)
  carry no run identity, so the replay check discriminates on the
  batch_id instead: the original checkpoint resuming after an upgrade
  replays AT the landed batch_id (at-least-once redelivery of the last
  landed batch — the safe-resume scenario, skipped and the marker
  rewritten run-scoped), while a fresh checkpoint renumbering from 0
  regresses BELOW it (raises, same as a scoped cross-run regression).
  The single ambiguous residual — landed == 0 and a fresh run's batch
  0 — is irreducible without a recorded run and resolves to skip.
- **Cross-run regression fails loudly**: a batch_id at or below the
  landed one from a DIFFERENT run means a fresh checkpoint is
  re-numbering from 0 against state another run built; skipping would
  silently drop arrivals and landing would clobber the old run's
  same-numbered subtree.
"""

from __future__ import annotations

import os

MARKER_NAME = "_last_batch_id"


def marker_path(state_dir: str) -> str:
    return os.path.join(state_dir, MARKER_NAME)


def read_marker(state_dir: str) -> tuple[str, int] | None:
    """(run_id, batch_id) of the last fully-landed batch, or None.

    Legacy single-line markers (pre run-scoping) read as run_id ``''``;
    an empty/whitespace-only file reads as absent (see module doc). A
    non-integer batch_id line raises with the offending path — that is
    corruption no retry can fix."""
    path = marker_path(state_dir)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        lines = f.read().splitlines()
    # tolerance keys on the BATCH-ID line (a hand-restored marker may
    # carry a trailing newline; only a missing/empty id line means a
    # torn legacy write)
    if not lines or (len(lines) == 1 and not lines[0].strip()):
        return None
    try:
        if len(lines) >= 2 and lines[1].strip():
            return lines[0], int(lines[1])
        if not lines[0].strip():
            return None
        return "", int(lines[0].strip())
    except ValueError as exc:
        raise ValueError(
            f"corrupt batch marker {path!r}: expected '<run_id>\\n"
            f"<batch_id>' with an integer batch_id, got {lines!r} — "
            "delete the marker (batches re-land idempotently) or "
            "restore it from the landed batch_id=N subtrees"
        ) from exc


def last_batch_id(state_dir: str) -> int | None:
    """Batch id of the last fully-landed batch, or None — the shared
    accessor behind every gate's ``last_*_batch_id``. Generation-swap
    stores must heal their crash windows before reading; they go
    through ``genstore.last_swapped_batch_id`` instead."""
    marker = read_marker(state_dir)
    return None if marker is None else marker[1]


def write_marker(state_dir: str, run_id: str, batch_id: int) -> None:
    """Atomically record (run_id, batch_id): temp file + os.replace so
    a crash leaves either the old marker or the new one, never a
    truncated file."""
    path = marker_path(state_dir)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        f.write(f"{run_id}\n{batch_id}")
    os.replace(tmp, path)


def is_replay(
    state_dir: str, run_id: str, batch_id: int, resume_hint: str
) -> bool:
    """True → this batch already landed (skip it). Raises on a
    cross-run batch_id regression; ``resume_hint`` names the gate's
    safe recovery in the error message."""
    marker = read_marker(state_dir)
    if marker is None or batch_id > marker[1]:
        return False
    marker_run, landed = marker
    if marker_run == run_id:
        return True
    if marker_run == "" and batch_id == landed:
        # Pre-run-scoping marker, replay AT the landed id: the
        # original checkpoint's at-least-once redelivery of its last
        # landed batch (the safe-resume scenario). Adopt it under the
        # current run_id so the next comparison is properly scoped. A
        # legacy batch_id BELOW the landed one falls through to the
        # raise — that is a fresh checkpoint renumbering from 0, and
        # skipping would silently drop its batches.
        write_marker(state_dir, run_id, landed)
        return True
    raise ValueError(
        f"batch_id {batch_id} regressed below the landed {landed} but "
        f"came from a different run ({run_id!r} vs "
        f"{marker_run or '<legacy unscoped>'!r}): {resume_hint}"
    )
