"""Hadoop FileSystem facade for store metadata operations.

Every path operation the archive store needs (existence, child listing,
recursive delete, atomic-swap rename) goes through the JVM's
``org.apache.hadoop.fs.FileSystem`` — the same abstraction Spark itself
uses for reads/writes — so the store works unchanged on ``file:``,
``hdfs:``, ``s3a:``, ``abfs:`` etc. The reference ties bucket bookkeeping
to Cassandra tables (`ChannelMetaDataDAOImpl.java:2092-2123`); at 100 TB
on an object store the equivalents are directory-listing RPCs (one per
call, driver-side, O(#children) — never a recursive walk).

``replace`` emulates ``os.replace`` (delete-then-rename). On HDFS the
rename is atomic; on S3-family stores it is copy+delete — fine for the
store's swap targets because readers go through Spark jobs that list
before reading, but a production deployment wanting transactional swaps
should put the samples table in Delta/Iceberg instead (SURVEY.md §1.5
maps bucket bookkeeping onto Delta ACID); this facade keeps the engine
free of local-filesystem-only primitives without adding a table-format
dependency the test container lacks.
"""

from __future__ import annotations


class HadoopFS:
    """Thin driver-side wrapper over the Hadoop FileSystem for one root."""

    def __init__(self, spark, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def listdir(self, path: str) -> list[str]:
        """Child names of a directory (empty if it does not exist) — one
        listStatus RPC, no recursion."""
        p = self._Path(path)
        if not self._fs.exists(p):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(p)]

    def count_files(self, path: str) -> int:
        return len([n for n in self.listdir(path) if not n.startswith("_")])

    def delete(self, path: str) -> None:
        p = self._Path(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def replace(self, src: str, dst: str) -> None:
        """os.replace semantics: atomically swap ``dst`` to ``src``'s
        content (delete-then-rename; atomic on HDFS, copy+delete on S3)."""
        self.delete(dst)
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")
