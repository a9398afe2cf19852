"""Crash-safe generation swap shared by the whole-store sketch
maintainers (``sketches.py`` HLL, ``cms_store.py`` CMS): parquet
cannot be read and atomically self-overwritten in one job, so a new
generation lands beside the store and promotes by rename-aside —
every intermediate state is recoverable and the store is never
missing. Factored (r8 review) so the swap discipline and its two
fixes live once:

- the replay marker is written INTO the new generation before
  promotion, so marker and data move atomically (no lost-marker
  window at all);
- a swap WITHOUT a batch_id (manual backfill through the same merge
  function) carries the existing marker forward instead of silently
  destroying the stream's replay guard — a destroyed marker would let
  the stream's next at-least-once redelivery double-merge a
  non-idempotent sum.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from .marker import last_batch_id, read_marker, write_marker


def last_swapped_batch_id(store_dir: str) -> int | None:
    """``marker.last_batch_id`` with the swap crash windows healed
    first: a crash between rename-aside and promotion leaves the
    marker (and the store) recoverable in ``<store>.old`` — reading
    without healing would report "nothing ever landed" and invite a
    renumbered re-seed that the next merge then rejects (or, with
    ``batch_id=None`` backfills, double-merges non-idempotent
    sums).

    NOT a pure read (ADVICE r8): the heal MUTATES the store directory
    (promotes or drops ``<store>.old``), and it assumes the store's
    declared single-writer contract — calling it concurrently with an
    in-flight swap (between rename-aside and promotion) can promote
    ``.old`` back under the writer and fail its
    ``os.replace``. Monitoring/readonly pollers that must coexist
    with a live stream should call ``marker.last_batch_id`` directly
    and treat a missing store as "swap in flight", not this."""
    recover_store(store_dir)
    return last_batch_id(store_dir)


def recover_store(store_dir: str) -> None:
    """Heal the swap's two crash windows: a crash after the old
    generation was set aside but before the new one was promoted
    leaves only ``<store>.old`` (restore it); a crash after promotion
    leaves both (drop the leftover)."""
    old = store_dir + ".old"
    if os.path.isdir(old):
        if os.path.isdir(store_dir):
            shutil.rmtree(old)
        else:
            os.replace(old, store_dir)


def swap_in_generation(
    merged: DataFrame,
    store_dir: str,
    run_id: str = "",
    batch_id: int | None = None,
) -> None:
    """Write ``merged`` as the store's next generation and promote it.
    The store is sketch-sized by construction (rows bounded by days /
    d·w cells, never by the stream), so ``coalesce(1)`` and the
    rewrite cost O(store), not O(history)."""
    tmp = tempfile.mkdtemp(
        prefix="gen_store_", dir=os.path.dirname(store_dir) or "."
    )
    try:
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        if batch_id is not None:
            write_marker(tmp, run_id, batch_id)
        else:
            # unscoped backfill: the guard state must survive the swap
            existing = (
                read_marker(store_dir) if os.path.isdir(store_dir) else None
            )
            if existing is not None:
                write_marker(tmp, existing[0], existing[1])
    except BaseException:
        # a failed write must not leave a full-store-sized orphan per
        # attempt (a crash can still strand one; the next successful
        # swap of the SAME tmp name cannot exist — mkdtemp is unique —
        # so orphans are bounded by hard crashes, not by failures)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = store_dir + ".old"
    if os.path.isdir(store_dir):
        os.replace(store_dir, old)
    os.replace(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)
