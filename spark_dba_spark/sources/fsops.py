"""FileSystem metadata operations — the engine's "catalog" layer.

Python re-expression of the reference's HDFS utility suite
(`hdfsutil/HadoopFileSystemOperation.scala:19-197`,
`hdfsutil/HDFSAvroOperations.scala:19-136`,
`hdfsutil/HDFSStringUtil.scala:13-28` — see SURVEY.md §2.2 M1-M25), built on
the JVM Hadoop FileSystem through py4j so the same code path works on
file://, hdfs:// and (with rename caveats) object stores. These ops are
integral to the compaction job's transactional semantics (snapshot
consistency check, trash-then-swap commit).
"""

from __future__ import annotations

import os
import random
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession


def is_ignore_file(name: str) -> bool:
    """Hidden-file convention: '.'/'_' prefixes (Hadoop `_SUCCESS`, `.crc`).
    Mirrors HadoopFileSystemOperation.scala:157-164 (M20)."""
    base = name.rstrip("/").rsplit("/", 1)[-1]
    return base.startswith(".") or base.startswith("_")


def is_valid_data_file(name: str, ext: str) -> bool:
    """Suffix + not-hidden predicate (HDFSAvroOperations.scala:128-136, M8)."""
    base = name.rstrip("/").rsplit("/", 1)[-1]
    return base.lower().endswith(f".{ext.lower()}") and not is_ignore_file(base)


def unique_session_id() -> str:
    """Time-sortable unique token for tmp/trash naming
    (HDFSStringUtil.scala:22-28, M25)."""
    return f"{int(time.time() * 1000)}_{os.getpid()}_{random.randint(0, 10**6)}"


@dataclass(frozen=True)
class FileStat:
    """The consistency-checkpoint unit (HadoopFileSystemOperation.scala:59-65,
    M12): path identity + length + modification time (+ the dir flag the
    listing already carries — saves a getFileStatus RPC per child)."""

    path: str
    length: int
    mtime: int
    is_dir: bool = False


class FsOps:
    """Hadoop FileSystem wrapper (driver-side metadata ops via py4j)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    # -- predicates (M19) --------------------------------------------------
    def exists(self, p: str) -> bool:
        return self._fs(p).exists(self._path(p))

    def is_dir(self, p: str) -> bool:
        fs = self._fs(p)
        return fs.exists(self._path(p)) and fs.getFileStatus(self._path(p)).isDirectory()

    def is_file(self, p: str) -> bool:
        fs = self._fs(p)
        return fs.exists(self._path(p)) and fs.getFileStatus(self._path(p)).isFile()

    # -- listings ----------------------------------------------------------
    def list_status(self, p: str) -> list[FileStat]:
        """Raw child listing as FileStats (M12)."""
        out = []
        for st in self._fs(p).listStatus(self._path(p)):
            out.append(
                FileStat(
                    st.getPath().toUri().getPath(),
                    int(st.getLen()),
                    int(st.getModificationTime()),
                    bool(st.isDirectory()),
                )
            )
        return sorted(out, key=lambda s: s.path)

    def list_visible_status(self, p: str) -> list[FileStat]:
        """Non-hidden children (M11)."""
        return [s for s in self.list_status(p) if not is_ignore_file(s.path)]

    def list_files_recursive(self, p: str) -> list[FileStat]:
        """Recursive file listing (M14). NameNode-bound on huge trees —
        the reference flags this as its own perf hazard."""
        out = []
        it = self._fs(p).listFiles(self._path(p), True)
        while it.hasNext():
            st = it.next()
            out.append(
                FileStat(
                    st.getPath().toUri().getPath(),
                    int(st.getLen()),
                    int(st.getModificationTime()),
                )
            )
        return sorted(out, key=lambda s: s.path)

    def list_leaf_data_folders(self, root: str, ext: str) -> list[str]:
        """Distinct parent dirs of every valid data file under root —
        leaf partition discovery (HDFSAvroOperations.scala:19-33, M1)."""
        parents = {
            s.path.rsplit("/", 1)[0]
            for s in self.list_files_recursive(root)
            if is_valid_data_file(s.path, ext)
        }
        return sorted(parents)

    def count_data_files(self, folder: str, ext: str) -> int:
        """Valid data files directly in folder (M2)."""
        return sum(
            1
            for s in self.list_status(folder)
            if not s.is_dir and is_valid_data_file(s.path, ext)
        )

    def is_valid_data_directory(self, folder: str, ext: str) -> bool:
        """Exact M4 semantics (HDFSAvroOperations.scala:56-75): after
        ignoring hidden entries the folder must be non-empty, contain no
        foreign files, and hold EITHER only valid data files OR only
        subdirectories (the latter is a partitioned root — the reference
        applies this same predicate at root level,
        DefragmentAvroFolder.scala:152)."""
        if not self.is_dir(folder):
            return False
        visible = self.list_visible_status(folder)
        if not visible:
            return False
        n_data = n_foreign = n_dirs = 0
        for st in visible:
            if st.is_dir:
                n_dirs += 1
            elif is_valid_data_file(st.path, ext):
                n_data += 1
            else:
                n_foreign += 1
        if n_foreign > 0 or (n_data > 0 and n_dirs > 0):
            return False
        return True

    def is_valid_data_root_directory(self, folder: str, ext: str) -> bool:
        """Strict root variant of :meth:`is_valid_data_directory` (M5,
        HDFSAvroOperations.scala:78-98): the folder must exist, be
        non-empty after ignoring hidden entries, and contain only valid
        data FILES — subdirectories disqualify it (the root check rejects
        partitioned layouts; dead code in the reference, kept for parity)."""
        if not self.is_dir(folder):
            return False
        visible = self.list_visible_status(folder)
        if not visible:
            return False
        for st in visible:
            if st.is_dir or not is_valid_data_file(st.path, ext):
                return False
        return True

    def copy_from_local(self, local_path: str, target_folder: str,
                        overwrite: bool = False) -> str:
        """Upload a driver-local file into a (possibly remote) folder (M15,
        HadoopFileSystemOperation.scala:95-101). Returns the destination
        path. Unused by the reference's main job but part of its utility
        surface."""
        name = local_path.rstrip("/").rsplit("/", 1)[-1]
        dest = target_folder.rstrip("/") + "/" + name
        fs = self._fs(target_folder)
        if fs.exists(self._path(dest)) and not overwrite:
            raise FileExistsError(dest)
        self.mkdirs(target_folder)
        fs.copyFromLocalFile(
            False,  # keep the local source
            overwrite,
            self._path(local_path),
            self._path(dest),
        )
        return dest

    def data_size(self, folder: str, ext: str) -> int:
        """Total bytes of valid data files (M6) — input to dynamic file
        sizing (the reference's 'In Progress' feature, README.md:21)."""
        return sum(
            s.length
            for s in self.list_status(folder)
            if not s.is_dir and is_valid_data_file(s.path, ext)
        )

    def latest_modified_file(self, folder: str, ext: str) -> str | None:
        """Path of the newest data file (M7): 'latest file has latest
        schema' (DefragmentAvroFolder.scala:91-103)."""
        cands = [
            s
            for s in self.list_status(folder)
            if not s.is_dir and is_valid_data_file(s.path, ext)
        ]
        if not cands:
            return None
        return max(cands, key=lambda s: (s.mtime, s.path)).path

    def default_block_size(self, p: str) -> int:
        """(M18)"""
        return int(self._fs(p).getDefaultBlockSize(self._path(p)))

    # -- snapshot consistency (M12/M13) ------------------------------------
    def snapshot(self, folder: str) -> list[FileStat]:
        return self.list_status(folder)

    @staticmethod
    def equals_snapshot(a: list[FileStat], b: list[FileStat]) -> bool:
        """Element-wise equality → the optimistic-concurrency check
        (HadoopFileSystemOperation.scala:73-79, M13)."""
        return a == b

    # -- mutations ---------------------------------------------------------
    def rename(self, src: str, dst: str) -> bool:
        """The commit primitive (M10). Atomic on HDFS/posix; on object
        stores this is copy+delete — callers must treat non-atomicity as a
        deployment constraint (same caveat as the reference)."""
        return self._fs(src).rename(self._path(src), self._path(dst))

    def mkdirs(self, p: str) -> bool:
        return self._fs(p).mkdirs(self._path(p))

    def delete(self, p: str, recursive: bool = False) -> bool:
        return self._fs(p).delete(self._path(p), recursive)

    def write_text_file(self, p: str, lines: list[str], overwrite: bool = True) -> None:
        """Small driver-side file write (M9; used for the audit log)."""
        out = self._fs(p).create(self._path(p), overwrite)
        try:
            out.write(bytearray("\n".join(lines).encode("utf-8")))
        finally:
            out.close()

    def read_bytes(self, p: str, max_bytes: int) -> bytes:
        """Read up to max_bytes from the head of a file (M17 variant) —
        e.g. container-format headers without pulling the whole file."""
        stream = self._fs(p).open(self._path(p))
        try:
            # InputStream.readNBytes (Java 9+): one bulk py4j byte[] transfer
            return bytes(stream.readNBytes(max_bytes))
        finally:
            stream.close()

    def read_text_file(self, p: str) -> str:
        """Open and read a small text file (M17; .avsc / DDL schemas)."""
        stream = self._fs(p).open(self._path(p))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def resolved_path(self, p: str) -> str:
        """Scheme-independent resolved path component (M22): qualifies the
        path against its FileSystem and follows symlinks via
        ``fs.resolvePath`` (HadoopFileSystemOperation.scala:173-180), so
        hdfs://nn/path and /path compare equal. Falls back to qualification
        only when the path does not exist yet."""
        jp = self._path(p)
        fs = self._fs(p)
        try:
            return fs.resolvePath(jp).toUri().getPath()
        except Exception:
            return fs.makeQualified(jp).toUri().getPath()

    def relative_partition(self, root: str, child: str) -> str:
        """Partition-relative path over *resolved* URIs (M21 + M22) — safe
        for qualified roots (hdfs://nn/path vs /path) and symlinks."""
        return self.partition_path(self.resolved_path(root), self.resolved_path(child))

    @staticmethod
    def partition_path(root: str, child: str) -> str:
        """Partition-relative path = child minus root prefix
        (HadoopFileSystemOperation.scala:167-169, M21). String-only: callers
        with possibly-qualified URIs should use :meth:`relative_partition`."""
        root = root.rstrip("/")
        child = child.rstrip("/")
        if child == root:
            return ""
        if not child.startswith(root + "/"):
            raise ValueError(f"{child} is not under {root}")
        return child[len(root):]
