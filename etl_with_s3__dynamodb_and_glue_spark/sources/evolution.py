"""Schema conformance for evolving sources: map whatever arrived onto
the declared target schema, loudly.

Upstream schemas drift — columns get renamed, added, retyped, dropped.
A scale pipeline cannot hand-patch every consumer; it declares ONE
target schema and conforms every incoming frame to it at the boundary
(the same stance as schemas.py's no-inferSchema rule). All work is a
single projection: renames, casts, default-fills — per-row map, no
shuffle, codegen'd.

Strictness contract: missing columns without a declared default and
unknown extra columns raise (silent drops are how quality incidents
ship); casts that Spark cannot perform raise at plan time via the
cast expression itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


class SchemaDriftError(ValueError):
    pass


def conform_schema(
    df: DataFrame,
    target: StructType,
    renames: dict[str, str] | None = None,
    defaults: dict[str, object] | None = None,
    allow_extra: bool = False,
) -> DataFrame:
    """Project ``df`` onto ``target``: apply ``renames``
    (old → new), cast every column to the target type, fill declared
    ``defaults`` for missing columns, and emit fields in target order.

    Raises :class:`SchemaDriftError` for missing-without-default and
    (unless ``allow_extra``) for unexpected extras — drift is a
    decision, not a side effect.
    """
    renames = renames or {}
    defaults = defaults or {}
    renamed = df
    for old, new in renames.items():
        if old not in df.columns:
            raise SchemaDriftError(f"rename source column missing: {old}")
        renamed = renamed.withColumnRenamed(old, new)

    have = set(renamed.columns)
    want = [f.name for f in target.fields]
    missing = [c for c in want if c not in have and c not in defaults]
    if missing:
        raise SchemaDriftError(
            f"missing columns without defaults: {missing}"
        )
    extra = sorted(have - set(want))
    if extra and not allow_extra:
        raise SchemaDriftError(f"unexpected extra columns: {extra}")

    cols = []
    for field in target.fields:
        if field.name in have:
            cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(
                F.lit(defaults[field.name])
                .cast(field.dataType)
                .alias(field.name)
            )
    return renamed.select(*cols)
