"""Processed-file archival (reference dag.py:168-229 re-expressed).

The reference copies every processed S3 object to
``archive/raw-data/{YYYY-MM-DD}/...`` preserving subfolders, then
deletes the original — 62 lines of boto3. On Spark the batch
equivalent is a Hadoop FileSystem rename (metadata-only on HDFS;
copy+delete on S3A, same as the reference), which works uniformly for
file://, hdfs:// and s3a:// paths through the JVM already attached to
the session. The streaming pipeline doesn't need this at all: the
file source's ``cleanSource=archive`` option does it natively
(streaming/file_pipeline.py).
"""

from __future__ import annotations

import datetime

from pyspark.sql import SparkSession


def archive_files(
    spark: SparkSession,
    src_dir: str,
    archive_root: str,
    date: str | None = None,
) -> list[str]:
    """Move every file under ``src_dir`` (recursively) to
    ``archive_root/{date}/<relative path>``. Returns archived paths."""
    if date is None:
        date = datetime.date.today().isoformat()

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path

    src_path = Path(src_dir)
    fs = src_path.getFileSystem(conf)
    if not fs.exists(src_path):
        return []

    src_uri = fs.makeQualified(src_path).toString().rstrip("/")
    moved: list[str] = []
    it = fs.listFiles(src_path, True)  # recursive
    files = []
    while it.hasNext():
        status = it.next()
        if status.isFile():
            files.append(status.getPath())
    for f in files:
        rel = f.toString()[len(src_uri) :].lstrip("/")
        dest = Path(f"{archive_root}/{date}/{rel}")
        fs.mkdirs(dest.getParent())
        if not fs.rename(f, dest):
            raise IOError(f"archive rename failed: {f} -> {dest}")
        moved.append(dest.toString())
    return moved
