"""DBA utilities beyond the defragmenter: folder statistics and trash
vacuum.

The reference repo's name (spark-dba) frames it as a suite of
Spark-powered data-management utilities of which only the defragmenter
shipped (SURVEY.md §0). These two round out the obvious lifecycle gaps:

- ``folder_stats``: what a DBA asks before/after compacting — file count,
  bytes, small-file ratio, newest file — per leaf partition folder. Pure
  driver-side metadata (M1/M2/M6/M7 composition), no Spark job.
- ``vacuum_trash``: the reference's trash-then-swap commit (C5) never
  cleans the trash; vacuum deletes trashed sessions older than a TTL,
  never touching anything younger — the recover window stays intact.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from ..sources.fsops import FsOps, is_valid_data_file, unique_session_id


@dataclass(frozen=True)
class FolderStats:
    partition: str  # relative partition path ('' = root)
    n_files: int
    total_bytes: int
    avg_bytes: int
    small_files: int  # files below the small threshold
    newest_mtime: int


def folder_stats(
    fs: FsOps,
    root: str,
    ext: str = "parquet",
    small_threshold_bytes: int = 32 * 1024 * 1024,
) -> list[FolderStats]:
    """Per-leaf-folder file statistics — the compaction-need report."""
    out = []
    for leaf in fs.list_leaf_data_folders(root, ext):
        files = [
            s for s in fs.list_status(leaf) if is_valid_data_file(s.path, ext)
        ]
        if not files:
            continue
        total = sum(s.length for s in files)
        out.append(
            FolderStats(
                partition=fs.relative_partition(root, leaf) or "",
                n_files=len(files),
                total_bytes=total,
                avg_bytes=total // len(files),
                small_files=sum(
                    1 for s in files if s.length < small_threshold_bytes
                ),
                newest_mtime=max(s.mtime for s in files),
            )
        )
    return out


def needs_compaction(
    stats: list[FolderStats],
    min_files: int = 2,
    small_ratio: float = 0.5,
) -> list[FolderStats]:
    """Folders worth compacting: ≥min_files files and mostly small ones."""
    return [
        s
        for s in stats
        if s.n_files >= min_files and s.small_files / s.n_files >= small_ratio
    ]


def restore_from_trash(
    fs: FsOps,
    trash_folder: str,
    target: str,
    session_id: str | None = None,
    ext: str = "parquet",
) -> list[str]:
    """Undo an overwrite compaction: move a trashed snapshot of ``target``
    back into place (the recoverable half of the trash-then-swap commit,
    C5 — the reference trashes but never ships the restore).

    Picks the trash entry for ``target``'s name with the given
    ``session_id``, else the NEWEST session (ids are time-sortable, M25).
    The currently-committed target partitions are swapped out of the way
    into the trash under a fresh ``restored_<sessionId>`` entry first, so
    restore itself is also undoable. Returns the restored partition paths.
    """
    target_name = target.rstrip("/").rsplit("/", 1)[-1]
    prefix = f"{target_name}_"
    entries = [
        s
        for s in fs.list_status(trash_folder)
        if s.is_dir and s.path.rsplit("/", 1)[-1].startswith(prefix)
    ]
    if session_id is not None:
        entries = [
            s
            for s in entries
            if s.path.rsplit("/", 1)[-1] == f"{target_name}_{session_id}"
        ]
    if not entries:
        raise FileNotFoundError(
            f"no trashed snapshot of '{target_name}' in {trash_folder}"
        )
    chosen = max(entries, key=lambda s: s.path)  # session ids time-sort
    backup = (
        trash_folder.rstrip("/") + f"/restored_{unique_session_id()}"
    )
    restored = []
    for leaf in fs.list_leaf_data_folders(chosen.path, ext) or [chosen.path]:
        rel = fs.partition_path(chosen.path, leaf)
        dest = target.rstrip("/") + rel
        if fs.exists(dest):
            bdest = backup + rel
            _mkparent(fs, bdest)
            fs.rename(dest, bdest)
        _mkparent(fs, dest)
        fs.rename(leaf, dest)
        restored.append(dest)
    return restored


def _mkparent(fs: FsOps, p: str) -> None:
    parent = p.rstrip("/").rsplit("/", 1)[0]
    if parent:
        fs.mkdirs(parent)


def vacuum_trash(
    fs: FsOps,
    trash_folder: str,
    older_than_ms: int,
    now_ms: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete trashed compaction sessions older than ``older_than_ms``.

    Trash entries are ``<targetName>_<sessionId>`` dirs whose sessionId
    starts with the creation epoch-millis (fsops.unique_session_id, M25) —
    the age check uses that timestamp, falling back to the FS mtime when
    the name doesn't parse. Returns the deleted (or would-delete) paths.
    """
    now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
    removed = []
    for st in fs.list_status(trash_folder):
        name = st.path.rstrip("/").rsplit("/", 1)[-1]
        created_ms = None
        # <targetName>_<millis>_<pid>_<rand>: timestamp is 3rd-from-last
        # part. Plausibility-gate the parse (epoch-millis after 2001):
        # arbitrary numeric name fragments must NOT make an entry look
        # ancient and get it deleted.
        parts = name.split("_")
        if len(parts) >= 3 and parts[-3].isdigit():
            candidate = int(parts[-3])
            if candidate > 1_000_000_000_000:
                created_ms = candidate
        if created_ms is None:
            created_ms = st.mtime
        if now_ms - created_ms > older_than_ms:
            removed.append(st.path)
            if not dry_run:
                fs.delete(st.path, recursive=True)
    return removed
