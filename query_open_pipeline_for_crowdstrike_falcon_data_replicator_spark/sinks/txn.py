"""Exactly-once batch commits for the streaming sink (manifest fencing).

The plain ``foreachBatch`` parquet append is at-least-once: a failure
after some files landed but before the checkpoint advances makes the
replayed batch append duplicates (same behavior as the reference's
Firehose path).  This module upgrades that to effectively-once with a
Delta-style, dependency-free commit protocol over the Hadoop
FileSystem API (works on local FS, HDFS, s3a://):

1. ``_commits/<id>.done`` exists -> the batch fully committed; skip.
2. ``_commits/<id>.manifest`` exists -> a previous attempt died
   mid-publish; delete exactly the listed destination files (no table
   listing needed), then fall through.
3. Write the batch's tables under ``_staging/<id>/`` (normal partitioned
   writes — failures here leave nothing in the tables).
4. List staging recursively, compute destination paths (same partition
   subpath, file renamed to ``b<id>-<name>``), write the manifest.
5. Publish: per-file rename into the table directories.
6. Write the ``.done`` marker, drop staging + manifest.

A crash at any point either replays from a clean table state (1-3), or
replays the delete-then-publish of a known file list (4-5) — never a
duplicate row.  The marker check costs one FS stat per batch; no table
scans anywhere.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from .parquet import write_ocsf_tables


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _qualified(spark: SparkSession, fs, path: str) -> str:
    """Fully-qualified URI string (scheme + authority) for ``path`` on
    ``fs``.  ALL path strings that get compared or stored in a manifest
    must be qualified: ``toUri().getPath()`` strips the scheme, so on
    s3a:///hdfs:// a prefix match against the raw base_path silently
    fails and paths resolve against the wrong filesystem."""
    return fs.makeQualified(_jpath(spark, path)).toString()


def _list_files(spark: SparkSession, fs, root: str) -> list[str]:
    """Recursive file listing under root (staging only — small).
    Returns fully-qualified URI strings."""
    out: list[str] = []
    it = fs.listFiles(_jpath(spark, root), True)
    while it.hasNext():
        st = it.next()
        if st.isFile():
            out.append(st.getPath().toString())
    return out


def _write_text(spark: SparkSession, fs, path: str, text: str) -> None:
    stream = fs.create(_jpath(spark, path), True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def _read_text(spark: SparkSession, fs, path: str) -> str:
    # NB: py4j passes byte[] by value, so stream.read(buf) cannot fill a
    # Python bytearray — route through IOUtils.toString instead
    stream = fs.open(_jpath(spark, path))
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def json_meta_io(spark: SparkSession, root: str, filename: str):
    """(read, write) closures for a JSON model-state file next to a
    table root — the shared helper behind the streaming maintainers'
    ``_meta_io`` (annmaint/tripletmaint).  ``read`` returns None when
    the file is missing or unreadable (callers treat that as
    first-batch: retrain deterministic model state)."""
    import json

    fs, _ = _fs(spark, root)
    meta_path = posixpath.join(root, filename)

    def read() -> dict | None:
        try:
            return json.loads(_read_text(spark, fs, meta_path))
        except Exception:
            return None

    def write(meta: dict) -> None:
        _write_text(spark, fs, meta_path, json.dumps(meta))

    return read, write


def append_batch_exactly_once(
    df: DataFrame, output_path: str, batch_id: int
) -> bool:
    """Idempotent single-table parquet append for a foreachBatch sink —
    the one-DataFrame form of ``commit_batch_exactly_once`` (same
    marker/manifest/rename protocol, same crash analysis).  A micro-batch
    replayed after a crash either no-ops (``.done`` exists) or first
    un-publishes exactly the files its dead predecessor listed, so the
    table never holds duplicate rows.  Returns False on a replay no-op."""
    spark = df.sparkSession
    fs, _ = _fs(spark, output_path)
    commits = posixpath.join(output_path, "_commits")
    done = posixpath.join(commits, f"{batch_id}.done")
    manifest = posixpath.join(commits, f"{batch_id}.manifest")
    staging = posixpath.join(output_path, "_staging", str(batch_id))

    if fs.exists(_jpath(spark, done)):
        return False

    if fs.exists(_jpath(spark, manifest)):
        for dest in _read_text(spark, fs, manifest).splitlines():
            if dest:
                fs.delete(_jpath(spark, dest), False)
        fs.delete(_jpath(spark, manifest), False)

    fs.delete(_jpath(spark, staging), True)
    df.write.mode("overwrite").parquet(staging)

    staged = _list_files(spark, fs, staging)
    prefix = _qualified(spark, fs, staging).rstrip("/") + "/"
    base_q = _qualified(spark, fs, output_path)
    moves: list[tuple[str, str]] = []
    for src in staged:
        rel = src[len(prefix):] if src.startswith(prefix) else None
        if rel is None:
            raise IOError(f"staged file {src} outside staging prefix {prefix}")
        if rel.rsplit("/", 1)[-1].startswith("_"):
            continue
        moves.append((src, posixpath.join(base_q, f"b{batch_id}-{rel}")))

    fs.mkdirs(_jpath(spark, commits))
    _write_text(spark, fs, manifest, "\n".join(dest for _, dest in moves))
    for src, dest in moves:
        if not fs.rename(_jpath(spark, src), _jpath(spark, dest)):
            raise IOError(f"rename failed: {src} -> {dest}")
    _write_text(spark, fs, done, "")
    fs.delete(_jpath(spark, staging), True)
    fs.delete(_jpath(spark, manifest), False)
    return True


def commit_batch_exactly_once(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    base_path: str,
    batch_id: int,
    *,
    region: str = "us-east-1",
    account_id: str = "000000000000",
    side_outputs: dict[str, DataFrame] | None = None,
) -> bool:
    """Publish one micro-batch's tables idempotently.  Returns False when
    the batch was already committed (replay no-op), True when published.

    ``side_outputs`` maps a relative path (e.g. ``_quarantine/cast_failures``)
    to a DataFrame written unpartitioned INSIDE the same staged commit:
    quarantine rows publish atomically with the tables, so a crash between
    table publish and quarantine append cannot lose them (the whole batch
    either replays or is fully done)."""
    fs, _ = _fs(spark, base_path)
    commits = posixpath.join(base_path, "_commits")
    done = posixpath.join(commits, f"{batch_id}.done")
    manifest = posixpath.join(commits, f"{batch_id}.manifest")
    staging = posixpath.join(base_path, "_staging", str(batch_id))

    if fs.exists(_jpath(spark, done)):
        return False  # fully committed previously — replay is a no-op

    if fs.exists(_jpath(spark, manifest)):
        # previous attempt died mid-publish: un-publish exactly its files
        for dest in _read_text(spark, fs, manifest).splitlines():
            if dest:
                fs.delete(_jpath(spark, dest), False)
        fs.delete(_jpath(spark, manifest), False)

    fs.delete(_jpath(spark, staging), True)  # stale partial staging
    write_ocsf_tables(
        tables, staging, region=region, account_id=account_id, mode="overwrite"
    )
    for rel, df in (side_outputs or {}).items():
        df.write.mode("overwrite").parquet(posixpath.join(staging, rel))

    staged = _list_files(spark, fs, staging)
    moves: list[tuple[str, str]] = []
    prefix = _qualified(spark, fs, staging).rstrip("/") + "/"
    base_q = _qualified(spark, fs, base_path)
    for src in staged:
        rel = src[len(prefix):] if src.startswith(prefix) else None
        if rel is None:
            raise IOError(f"staged file {src} outside staging prefix {prefix}")
        if rel.rsplit("/", 1)[-1].startswith("_"):
            continue  # _SUCCESS markers stay behind
        parent, name = (rel.rsplit("/", 1) + [""])[:2] if "/" in rel else ("", rel)
        dest = posixpath.join(base_q, parent, f"b{batch_id}-{name}")
        moves.append((src, dest))

    fs.mkdirs(_jpath(spark, commits))
    _write_text(spark, fs, manifest, "\n".join(dest for _, dest in moves))

    for src, dest in moves:
        fs.mkdirs(_jpath(spark, dest).getParent())
        if not fs.rename(_jpath(spark, src), _jpath(spark, dest)):
            raise IOError(f"rename failed: {src} -> {dest}")

    _write_text(spark, fs, done, "")
    fs.delete(_jpath(spark, staging), True)
    fs.delete(_jpath(spark, manifest), False)
    return True
