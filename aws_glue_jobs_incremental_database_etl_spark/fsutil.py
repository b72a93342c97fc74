"""Filesystem abstraction for the metadata-plumbing modules (the
dedup-index snapshots/compaction and the staged-commit transaction
log): plain local paths use the ``os``/``shutil`` fast path, any
``scheme://`` path resolves through the Hadoop FileSystem API — so
``file://`` (the hermetic object-store stand-in in tests), ``hdfs://``
and ``s3a://`` (given the connector jars on the Spark classpath) all
work with the same pinned-listing / staging-rename / manifest
contracts.  An unsupported scheme fails loudly at ``getFileSystem``,
never silently reads an empty directory.

Note on atomicity: ``rename`` is every caller's commit point — atomic
on POSIX and HDFS, a copy on S3A; all callers pair it with an
idempotent heal/recover pass, which is what absorbs the non-atomic
window on object stores.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator


def join_path(base: str, *parts: str) -> str:
    """Path join valid for both plain local paths and scheme'd URIs:
    the layouts under management only ever nest simple entry names,
    so '/'-joining is exact."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p
    return out


class LocalFS:
    """``os``/``shutil``-backed filesystem for scheme-less local
    paths — no JVM round-trips on the (default) local fast path."""

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def listdir(self, p: str) -> list[str]:
        return sorted(os.listdir(p))

    def getsize(self, p: str) -> int:
        return os.path.getsize(p)

    def delete(self, p: str) -> None:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)

    def rename(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def mkdirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def rmdir_if_empty(self, p: str) -> None:
        try:
            if os.path.isdir(p) and not os.listdir(p):
                os.rmdir(p)
        except OSError:
            pass

    def walk_files(self, root: str) -> Iterator[str]:
        """Yield every file under ``root`` as a path RELATIVE to
        ``root`` (contract shared with :class:`HadoopFS` — relative
        yields sidestep backend URI normalization entirely: Hadoop
        renders ``file:///x`` as ``file:/x``, so absolute yields would
        force every caller to re-derive the prefix length)."""
        out = []
        for r, _dirs, files in os.walk(root):
            for f in files:
                out.append(
                    os.path.relpath(os.path.join(r, f), root).replace(
                        os.sep, "/"
                    )
                )
        yield from sorted(out)

    def read_text(self, p: str) -> str:
        with open(p) as f:
            return f.read()

    def write_text(self, p: str, text: str) -> None:
        with open(p, "w") as f:
            f.write(text)


class HadoopFS:
    """Hadoop ``FileSystem``-backed twin of :class:`LocalFS` for
    scheme'd paths.  Same contract; ``replace`` emulates overwriting
    rename (delete-then-rename — callers' heal passes cover the
    non-atomic window, same as S3A rename itself)."""

    def __init__(self, spark, base: str) -> None:
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        try:
            self._fs = self._jpath(base).getFileSystem(self._conf)
        except Exception as e:  # e.g. no connector jar for the scheme
            raise NotImplementedError(
                f"non-local path {base!r}: no Hadoop FileSystem for "
                "this scheme on the Spark classpath (for s3a:// add "
                "hadoop-aws + aws sdk jars; for gs:// the "
                f"gcs-connector): {e}"
            ) from e

    def _jpath(self, s: str):
        return self._jvm.org.apache.hadoop.fs.Path(s)

    def exists(self, p: str) -> bool:
        return bool(self._fs.exists(self._jpath(p)))

    def isdir(self, p: str) -> bool:
        jp = self._jpath(p)
        return bool(self._fs.exists(jp)) and bool(
            self._fs.getFileStatus(jp).isDirectory()
        )

    def listdir(self, p: str) -> list[str]:
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(self._jpath(p))
        )

    def getsize(self, p: str) -> int:
        return int(self._fs.getFileStatus(self._jpath(p)).getLen())

    def delete(self, p: str) -> None:
        self._fs.delete(self._jpath(p), True)

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._jpath(src), self._jpath(dst)):
            raise OSError(f"rename {src!r} -> {dst!r} failed")

    def replace(self, src: str, dst: str) -> None:
        jd = self._jpath(dst)
        if self._fs.exists(jd):
            self._fs.delete(jd, True)
        self.rename(src, dst)

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._jpath(p))

    def rmdir_if_empty(self, p: str) -> None:
        jp = self._jpath(p)
        try:
            if self._fs.exists(jp) and not list(self._fs.listStatus(jp)):
                self._fs.delete(jp, False)
        except Exception:
            pass

    def walk_files(self, root: str) -> Iterator[str]:
        """Yield every file under ``root`` RELATIVE to ``root``.

        The prefix to strip is the backend-normalized root
        (``getFileStatus(root).getPath()``) — the exact string form
        ``listFiles`` renders children in — NOT the caller's ``root``
        string: Hadoop normalizes empty-authority URIs
        (``file:///x`` → ``file:/x``), so slicing by the caller's
        string length would eat leading characters of the first
        relative component (corrupting e.g. partition directory
        names)."""
        jroot = self._jpath(root)
        prefix = (
            self._fs.getFileStatus(jroot).getPath().toString().rstrip("/")
            + "/"
        )
        it = self._fs.listFiles(jroot, True)
        out = []
        while it.hasNext():
            p = it.next().getPath().toString()
            if not p.startswith(prefix):
                raise ValueError(
                    f"walk_files: listed path {p!r} is not under the "
                    f"normalized root {prefix!r}"
                )
            out.append(p[len(prefix) :])
        yield from sorted(out)

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self._jpath(p))
        reader = self._jvm.java.io.BufferedReader(
            self._jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        try:
            lines = []
            while True:
                ln = reader.readLine()
                if ln is None:
                    break
                lines.append(ln)
            return "\n".join(lines)
        finally:
            reader.close()

    def write_text(self, p: str, text: str) -> None:
        out = self._fs.create(self._jpath(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()


def fs_for(path: str, spark=None):
    """Backend for ``path``: plain paths → :class:`LocalFS`; any
    ``scheme://`` path → :class:`HadoopFS` (using the active
    SparkSession when one isn't passed — the metadata plumbing always
    runs driver-side next to a live session)."""
    if "://" not in path:
        return LocalFS()
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"scheme'd path {path!r} needs a live SparkSession to "
                "reach the Hadoop FileSystem API"
            )
    return HadoopFS(spark, path)
