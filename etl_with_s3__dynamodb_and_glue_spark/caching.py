"""Cache-lifetime discipline for lazily-returned plans.

Operators that persist an intermediate consumed by multiple branches of
the plan they RETURN face a lifecycle problem: the cache must outlive
the (lazy) result — any action on the result re-reads it — but nothing
in the caller's hands references the intermediate, so it can never be
released and leaks for the rest of the session. ``clearCache()``
workarounds punish unrelated queries.

:func:`unpersist_on_release` ties the intermediate's storage to the
result's own lifetime: when the caller drops the result DataFrame (its
Python object is garbage-collected), the caches are unpersisted. While
the result is reachable it can still be recomputed cheaply; the moment
it isn't, the memory is handed back. Same discipline as
``plans.music_pipeline.unpersist_all``, without requiring the caller to
know the operator's internals.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def unpersist_on_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` intermediates when ``result`` is
    garbage-collected. Returns ``result`` for chaining.

    The finalizer is a no-op on a stopped SparkContext (session
    shutdown races GC at interpreter exit) and ``unpersist`` is
    idempotent, so double-release is safe. Re-registering on a frame
    that already carries deps (an operator layering another cache onto
    a frame it got from a helper) MERGES the dep sets under one
    finalizer, so :func:`carry_cache_deps` can always transfer the
    whole set by detaching one handle.
    """
    prior = getattr(result, "_graft_finalizer", None)
    if prior is not None:
        prior.detach()
        cached = tuple(getattr(result, "_graft_cache_deps", ())) + cached

    def _release() -> None:
        for df in cached:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — context may already be gone
                pass

    # Strong ref: while the caller can still reach the result, the
    # cached intermediates (and hence their storage) stay alive even if
    # every other reference to them is dropped.
    result._graft_cache_deps = cached
    result._graft_finalizer = weakref.finalize(result, _release)
    return result


def carry_cache_deps(result: DataFrame, *sources: DataFrame) -> DataFrame:
    """Transfer cache ownership from ``sources`` (frames returned by
    :func:`unpersist_on_release`) to ``result``, a frame COMPOSED from
    them.

    Without this, a lazy composition defeats the operator's persist
    (ADVICE r9): ``weights.select(...).orderBy(...)`` drops the
    ``weights`` object the moment the expression finishes, CPython
    refcounting fires its finalizer, and the cache is gone before the
    caller's action ever runs — the persist becomes pure overhead.
    Transferring detaches each source's finalizer and re-ties the
    SAME cached intermediates to ``result``'s lifetime.

    Sources without transferred deps pass through untouched, so this
    is safe to call unconditionally at composition boundaries. Frames
    registered via :func:`unpersist_on_release_all` (shared countdown)
    are deliberately NOT transferable and keep their own lifecycle.
    """
    deps: list[DataFrame] = []
    for s in sources:
        fin = getattr(s, "_graft_finalizer", None)
        if fin is None:
            continue
        fin.detach()
        deps.extend(getattr(s, "_graft_cache_deps", ()))
        # clear the source's registration so a SECOND transfer (or a
        # later re-registration reading the stale dep tuple) cannot
        # double-own the caches — two independent finalizers would
        # recreate the early-unpersist class this helper exists to fix
        del s._graft_finalizer
        s._graft_cache_deps = ()
    return unpersist_on_release(result, *deps) if deps else result


def unpersist_on_release_all(
    results: list[DataFrame], *cached: DataFrame
) -> list[DataFrame]:
    """Unpersist ``cached`` only after EVERY DataFrame in ``results``
    has been garbage-collected (for operators that return multiple
    views over one cached scan, e.g. a clean/quarantine split)."""
    remaining = {"n": len(results)}

    def _one_down() -> None:
        remaining["n"] -= 1
        if remaining["n"] == 0:
            for df in cached:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001
                    pass

    for r in results:
        r._graft_cache_deps = cached
        weakref.finalize(r, _one_down)
    return results
