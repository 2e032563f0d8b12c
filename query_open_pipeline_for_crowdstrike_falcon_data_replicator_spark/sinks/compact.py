"""Small-file compaction for the partitioned parquet sinks (OPTIMIZE).

The streaming path lands one file set per micro-batch per partition
(`sinks/txn.py` renames them in as ``b<id>-*``); at the reference's 120 s
cadence that is ~720 files/partition/day — death by file-listing at
100 TB.  The reference has no answer (Firehose just keeps appending and
Athena eats the listing cost); a lakehouse needs a compactor.

``compact_table`` rewrites every leaf partition whose file count exceeds a
threshold into ~``target_file_bytes``-sized files, using the same
dependency-free Hadoop-FS manifest protocol as ``txn.py``:

1. ``_compact/manifest`` exists -> a previous run died mid-swap; re-apply
   it to convergence (rename staged files in if still staged, delete the
   old files it lists), then clear it.
2. Rewrite each selected partition dir into ``_compact/staging/<n>/``
   (``repartition(ceil(bytes/target))`` — a shuffle ONLY over the
   partitions being compacted, never the whole table).
3. Write one manifest naming every (staged -> dest) move and every old
   file to delete, then apply: rename the new files in (``c<token>-*``
   names cannot collide with batch files), delete the olds, drop the
   manifest.

Crash at any point is safe to retry: step 1 replays the manifest
idempotently (renames of already-moved files are skipped because the
source is gone; deletes of already-deleted files are no-ops).  Readers
concurrent with the swap window may see a partition twice-counted for the
instant between rename-in and delete-old — run per partition during a
maintenance window, exactly like Hive/Iceberg ``OPTIMIZE`` without a
metastore lock.

Writer-recovery hazard: a txn.py batch that is published-but-uncommitted
(``_commits/<id>.manifest`` without ``.done``) lists destination files by
name; compacting them away and then replaying the batch would re-publish
it — duplicating its rows.  ``compact_table`` therefore refuses to run
while any uncommitted batch manifest exists (the streaming pipeline's
inline ordering — compact only after the batch's ``.done`` — never trips
this; an out-of-band OPTIMIZE job might, and must wait or finish the
batch replay first).  ``sinks/snapshot.py`` removes both this hazard and
the reader window entirely — prefer it for new tables.
"""

from __future__ import annotations

import math
import posixpath
import uuid

from pyspark.sql import SparkSession

from .txn import _fs, _jpath, _qualified, _read_text, _write_text

_COMPACT_DIR = "_compact"
_SERVICE_DIRS = ("_compact", "_staging", "_commits")


def _leaf_partitions(spark: SparkSession, fs, root: str) -> dict[str, list]:
    """Map each directory that directly holds data files to its file
    statuses.  Service dirs and ``_*`` marker files are skipped.

    All paths are fully-qualified URI strings (see ``txn._qualified``): a
    scheme-stripped prefix match would fail on s3a://hdfs:// roots, which
    would both break the service-dir filter AND hand ``spark.read`` paths
    that resolve against the wrong (default) filesystem."""
    out: dict[str, list] = {}
    it = fs.listFiles(_jpath(spark, root), True)
    rootp = _qualified(spark, fs, root).rstrip("/") + "/"
    while it.hasNext():
        st = it.next()
        if not st.isFile():
            continue
        path = st.getPath().toString()
        if not path.startswith(rootp):
            raise IOError(f"listed file {path} outside root {rootp}")
        rel = path[len(rootp):]
        if rel.split("/", 1)[0] in _SERVICE_DIRS:
            continue
        if rel.rsplit("/", 1)[-1].startswith("_"):
            continue
        parent = path.rsplit("/", 1)[0]
        out.setdefault(parent, []).append(st)
    return out


def _uncommitted_batches(spark: SparkSession, fs, table_path: str) -> list[str]:
    """txn.py batch ids that are published-but-uncommitted: a
    ``_commits/<id>.manifest`` with no ``<id>.done`` marker."""
    commits = posixpath.join(table_path, "_commits")
    if not fs.exists(_jpath(spark, commits)):
        return []
    names = {
        st.getPath().getName() for st in fs.listStatus(_jpath(spark, commits))
    }
    return sorted(
        n[: -len(".manifest")]
        for n in names
        if n.endswith(".manifest") and f"{n[:-len('.manifest')]}.done" not in names
    )


def recover_compaction(spark: SparkSession, table_path: str) -> bool:
    """Re-apply (or finish) an interrupted compaction swap.  Returns True
    when a manifest was found and applied."""
    fs, _ = _fs(spark, table_path)
    manifest = posixpath.join(table_path, _COMPACT_DIR, "manifest")
    if not fs.exists(_jpath(spark, manifest)):
        return False
    for line in _read_text(spark, fs, manifest).splitlines():
        if not line:
            continue
        op, rest = line.split(" ", 1)
        if op == "MV":
            src, dest = rest.split("\t")
            if fs.exists(_jpath(spark, src)):
                fs.mkdirs(_jpath(spark, dest).getParent())
                if not fs.rename(_jpath(spark, src), _jpath(spark, dest)):
                    raise IOError(f"rename failed: {src} -> {dest}")
        elif op == "DEL":
            fs.delete(_jpath(spark, rest), False)
    fs.delete(_jpath(spark, posixpath.join(table_path, _COMPACT_DIR)), True)
    return True


def compact_table(
    spark: SparkSession,
    table_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
    compression: str = "gzip",
) -> dict:
    """Compact every leaf partition of ``table_path`` holding at least
    ``min_files`` data files.  Returns counters for observability."""
    fs, _ = _fs(spark, table_path)
    recover_compaction(spark, table_path)

    # a published-but-uncommitted txn batch lists its destination files by
    # name; compacting them away would make the batch's crash replay
    # re-publish (= duplicate) its rows.  Refuse until the batch commits
    # or its recovery replay runs (see module docstring).
    pending = _uncommitted_batches(spark, fs, table_path)
    if pending:
        raise RuntimeError(
            f"compact_table: uncommitted batch manifest(s) {pending} under "
            f"{table_path}/_commits — finish or recover the batch before "
            "compacting (compaction would orphan the manifest's files and "
            "the replay would duplicate the batch)"
        )

    parts = {
        d: sts
        for d, sts in _leaf_partitions(spark, fs, table_path).items()
        if len(sts) >= min_files
    }
    stats = {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "bytes": 0,
    }
    if not parts:
        return stats

    token = uuid.uuid4().hex[:8]
    staging_root = posixpath.join(table_path, _COMPACT_DIR, "staging")
    moves: list[tuple[str, str]] = []
    deletes: list[str] = []
    for i, (part_dir, sts) in enumerate(sorted(parts.items())):
        nbytes = sum(st.getLen() for st in sts)
        n_out = max(1, math.ceil(nbytes / target_file_bytes))
        staged_dir = posixpath.join(staging_root, str(i))
        # direct-path read: partition values stay encoded in the dir name,
        # so the rewrite is partition-local — no table-wide shuffle
        (
            spark.read.parquet(part_dir)
            .repartition(n_out)
            .write.option("compression", compression)
            .mode("overwrite")
            .parquet(staged_dir)
        )
        n_staged = 0
        it = fs.listFiles(_jpath(spark, staged_dir), False)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not st.isFile() or name.startswith("_"):
                continue
            src = st.getPath().toString()
            moves.append((src, posixpath.join(part_dir, f"c{token}-{name}")))
            n_staged += 1
        deletes.extend(st.getPath().toString() for st in sts)
        stats["partitions_compacted"] += 1
        stats["files_before"] += len(sts)
        stats["files_after"] += n_staged
        stats["bytes"] += nbytes

    manifest = posixpath.join(table_path, _COMPACT_DIR, "manifest")
    lines = [f"MV {src}\t{dest}" for src, dest in moves]
    lines += [f"DEL {p}" for p in deletes]
    _write_text(spark, fs, manifest, "\n".join(lines))

    for src, dest in moves:
        if not fs.rename(_jpath(spark, src), _jpath(spark, dest)):
            raise IOError(f"rename failed: {src} -> {dest}")
    for p in deletes:
        fs.delete(_jpath(spark, p), False)
    fs.delete(_jpath(spark, posixpath.join(table_path, _COMPACT_DIR)), True)
    return stats
