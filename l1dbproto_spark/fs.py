"""Hadoop FileSystem access for the APDB storage layer.

All table-root metadata operations (existence probes, mkdir, recursive
delete, partition-directory listing) go through the JVM's
``org.apache.hadoop.fs.FileSystem`` — the same abstraction Spark's own
readers/writers use — so an ApdbSpark root can be any Hadoop-supported URI
(``file:``, ``hdfs:``, ``s3a:``, ``gs:``, ``abfs:``), not just a local
directory. The reference binds its store to a database URI the same way
(``Apdb.from_uri``); at the 100 TB design point the root is object storage
and local ``os.*`` calls would simply be wrong.

Only metadata passes through py4j (a handful of calls per visit); data moves
via Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .checkpoint import pin


class TableFS:
    """Thin wrapper over the Hadoop FileSystem owning a root URI."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        jvm = spark._jvm
        self._jvm = jvm
        self._jpath = jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def _local_os_path(self, path: str) -> str | None:
        """The OS path when this FS is the local one (scheme ``file`` or a
        bare path), else None. Lets primitives that need REAL atomicity
        (the exclusive-create lock) use a syscall where Hadoop's local FS
        emulation is check-then-act.

        URI paths resolve through the JVM ``Path``'s ``toUri().getPath()``
        so the syscall lands on the SAME file Hadoop's own resolution
        uses: the previous string-strip folded a ``file://host/...``
        authority into the path ('/host/tmp/x'). Note Hadoop ``Path`` is
        NOT an RFC URI — '%' is a literal path character — and
        ``toUri().getPath()`` preserves that, so percent sequences stay
        literal exactly as Hadoop opens them (r14 advice item 4; pinned
        by test)."""
        scheme = self._fs.getScheme()
        if scheme != "file":
            return None
        if ":" in path.split("/", 1)[0]:
            # URI form (file:/..., file:///...) — decode via the JVM Path
            return self._jpath(path).toUri().getPath()
        return path

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._jpath(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._jpath(path))

    def delete(self, path: str) -> bool:
        """Recursive delete; False when the path did not exist."""
        return self._fs.delete(self._jpath(path), True)

    def touch(self, path: str) -> None:
        """Create (or truncate) an empty file — the write-ahead intent
        marker primitive. On object stores the create is atomic on close."""
        self._fs.create(self._jpath(path), True).close()

    def create_exclusive(self, path: str, content: str = "") -> bool:
        """Create ``path`` only if it does not exist — the check-and-set
        a fail-fast writer lock needs (``touch`` overwrites, so two racing
        writers would both 'win'). Returns False when the file already
        exists; ``content`` (e.g. owner run/epoch) is written for
        diagnostics. Atomic on HDFS (create(overwrite=false) is a
        namenode-level CAS). On LOCAL filesystems Hadoop's
        ``RawLocalFileSystem.create`` is check-then-act — two racing
        callers can BOTH win (observed: both visit stores proceeded and
        their appends clashed in the shared ``_temporary`` dir) — so
        ``file:`` roots go through a real ``O_CREAT|O_EXCL`` syscall
        instead. On eventually-consistent object stores the Hadoop path is
        best-effort — still strictly better than no check."""
        local = self._local_os_path(path)
        if local is not None:
            import os

            try:
                fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            except FileNotFoundError:  # parent missing — match Hadoop create
                os.makedirs(os.path.dirname(local), exist_ok=True)
                try:
                    fd = os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    return False
            try:
                if content:
                    os.write(fd, content.encode("utf-8"))
            except Exception:
                pass
            finally:
                os.close(fd)
            return True
        try:
            out = self._fs.create(self._jpath(path), False)
        except Exception:  # FileAlreadyExistsException (py4j-wrapped)
            return False
        # the lock is HELD from this point: the content is diagnostics
        # only, so a failure writing it must not escape — the caller's
        # try/finally has not started yet and an escaped exception would
        # orphan the lock forever (r11 review find)
        try:
            if content:
                out.write(bytearray(content.encode("utf-8")))
        except Exception:
            pass
        finally:
            try:
                out.close()
            except Exception:
                pass
        return True

    def read_text(self, path: str) -> str:
        """Small-file read (lock diagnostics, markers); '' when absent.
        One JVM call via commons-io (ships with Spark) — the first cut
        looped stream.read() one BYTE per py4j round-trip, fine for a
        30-byte lock but quadratically wrong the day someone points this
        at a manifest (r11 review find)."""
        p = self._jpath(path)
        if not self._fs.exists(p):
            return ""
        stream = self._fs.open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def list_names(self, path: str) -> list[str]:
        """Child entry names of a directory ([] when absent)."""
        p = self._jpath(path)
        if not self._fs.exists(p):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(p)]

    def partition_file_counts(self, path: str) -> dict[str, int]:
        """Parquet data files per hive partition directory under ``path`` —
        the small-file health metric (driver-side FS metadata only, no
        Spark job). Mirrors ApdbSpark.partition_file_counts for any
        hive-partitioned store."""
        counts: dict[str, int] = {}
        for child in self.list_names(path):
            if "=" not in child:
                continue
            counts[child] = sum(
                1
                for name in self.list_names(f"{path}/{child}")
                if name.endswith(".parquet")
            )
        return counts

    def compact_store(
        self,
        spark: SparkSession,
        path: str,
        schema: str,
        part_col: str,
        sort_cols: list[str] | None = None,
        num_tasks: int = 64,
        dedup_cols: list[str] | None = None,
    ) -> None:
        """Fold an append-per-batch hive-partitioned store back to ONE data
        file per partition directory: each micro-batch append leaves one
        file per touched partition, so read fan-in grows linearly with
        batch count until this rewrite folds it back. ``repartition`` on
        the partition column routes every value to exactly one of
        ``num_tasks`` tasks, so the partitioned write emits one file per
        value; ``num_tasks`` only bounds rewrite parallelism. The read is
        pinned (localCheckpoint) before the same-path overwrite — the
        standard read-then-overwrite hazard guard, same as
        ApdbSpark.compact. Partition-scoped maintenance, run OUTSIDE the
        per-batch hot path (a scheduled job at scale); rows are preserved
        exactly — unless the caller passes ``dedup_cols``, which collapses
        key-duplicate rows (the repair path for stores whose appends
        assume a single writer and a concurrent-writer race double-
        inserted a key; safe only when duplicate-keyed rows are known
        bit-identical, as in the PQ code store)."""
        if not self.has_parquet_file(path):
            return
        df = spark.read.schema(schema).parquet(path)
        if dedup_cols:
            df = df.dropDuplicates(dedup_cols)
        compacted = df.repartition(num_tasks, F.col(part_col)).transform(pin, 
            eager=True
        )
        if sort_cols:
            compacted = compacted.sortWithinPartitions(part_col, *sort_cols)
        compacted.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(part_col).parquet(path)

    def has_parquet_file(self, path: str) -> bool:
        """True when any .parquet data file exists under path (recursive) —
        the 'table has data' probe (partition subdirectories included)."""
        p = self._jpath(path)
        if not self._fs.exists(p):
            return False
        it = self._fs.listFiles(p, True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                return True
        return False
