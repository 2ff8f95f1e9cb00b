"""Filesystem I/O for TableStore metadata & partition maintenance.

Routes every metadata/maintenance filesystem operation (meta-file
read/write, partition-directory listing, staged-directory swaps,
drop/rename) through the Hadoop FileSystem API of the active
SparkSession's JVM instead of Python ``os``/``shutil``. The same code
path therefore works wherever Spark itself can write — ``file://``,
``hdfs://``, ``s3a://``, ``abfss://`` — which is what makes TableStore
viable off a single node (reference keeps this state in ClickHouse
system tables; we keep it next to the data).

Semantics notes (stated limitations, not silent assumptions):

- ``rename`` is atomic on HDFS and local FS, copy+delete (non-atomic)
  on raw object stores without a committer; TableStore's two-phase swap
  keeps staged state outside ``data/`` so a mid-swap crash never leaves
  a half-renamed directory where readers scan.
- ``write_text`` (meta file) is create-overwrite: last writer wins.
  TableStore is SINGLE WRITER PER TABLE by design — same operating
  envelope as the reference's Airflow ``max_active_runs=1``
  (``v1/dag.py:32``, ``v2/dag.py:59``); ``try_lock`` gives a
  best-effort guard (atomic create-no-overwrite on HDFS/local).
"""

from __future__ import annotations

import posixpath
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


def join(*parts: str) -> str:
    """URI-safe path join (posix rules; schemes pass through)."""
    return posixpath.join(*parts)


class Fs:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for the
    filesystem that owns ``root`` (resolved once; all paths passed to
    methods must live on the same filesystem)."""

    def __init__(self, spark: "SparkSession", root: str):
        self._jvm = spark._jvm
        self._jpath = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(root).getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, path: str):
        return self._jpath(path)

    # -- predicates ---------------------------------------------------------

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return self._fs.getFileStatus(self._p(path)).isDirectory()

    def mtime_ms(self, path: str) -> int:
        return self._fs.getFileStatus(self._p(path)).getModificationTime()

    # -- directory ops ------------------------------------------------------

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def listdir(self, path: str) -> list[str]:
        """Child names (not paths), sorted."""
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(self._p(path))
        )

    def list_dirs(self, path: str) -> list[str]:
        """Child DIRECTORY names, sorted."""
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
            if st.isDirectory()
        )

    def file_sizes(self, path: str) -> list[tuple[str, int]]:
        """(name, bytes) of plain FILES directly under ``path``, sorted
        by name — the input to small-file compaction decisions."""
        return sorted(
            (st.getPath().getName(), st.getLen())
            for st in self._fs.listStatus(self._p(path))
            if st.isFile()
        )

    def delete(self, path: str, recursive: bool = True) -> bool:
        return self._fs.delete(self._p(path), recursive)

    def rename(self, src: str, dst: str) -> None:
        """Move src to dst (dst must not exist). Raises on failure —
        Hadoop signals most rename problems with a False return."""
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise IOError(f"rename failed: {src} -> {dst}")

    # -- small-file text I/O (meta json) ------------------------------------

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        """Create-overwrite write; visible atomically on close for HDFS,
        last-writer-wins everywhere (single-writer contract above)."""
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- advisory lock ------------------------------------------------------

    def try_lock(self, path: str) -> bool:
        """Best-effort create-no-overwrite lock file. Atomic on HDFS and
        local FS; object stores may race — see module docstring."""
        try:
            out = self._fs.create(self._p(path), False)
            out.close()
            return True
        except Exception:
            return False

    def unlock(self, path: str) -> None:
        self._fs.delete(self._p(path), False)
