"""Composed query plans.

Each plans module exports:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  named queries over the driver testdata star schema.
- ``ORACLE: dict[str, str]`` — the DuckDB-runnable ANSI-SQL twin for
  every oracle-checkable query (omitted for approximate /
  non-SQL-expressible operators).

``__spark_entry__.py`` merges them into the driver contract.
"""
