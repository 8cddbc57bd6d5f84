"""Thread-aware in-memory audit logger, flushed to the target filesystem.

Parity with the reference's CustomLogger (`common/CustomLogger.scala:1-73`):
records accumulate in memory tagged (thread, seq, level); the flush renders
them sorted header → parent thread → per-partition threads, preserving
in-thread order (CustomLogger.scala:39-49); overall status is SUCCESS only
if no ERROR record exists (CustomLogger.scala:66-72).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

HEADER_THREAD = "header"
PARENT_THREAD = "parent"

INFO = "INFO"
ERROR = "ERROR"


@dataclass
class _Record:
    thread: str
    seq: int
    ts_ms: int
    level: str
    message: str


@dataclass
class AuditLogger:
    _records: list[_Record] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _seq: int = 0

    def _log(self, thread: str, level: str, message: str) -> None:
        with self._lock:
            self._seq += 1
            self._records.append(
                _Record(thread, self._seq, int(time.time() * 1000), level, message)
            )

    def header(self, message: str) -> None:
        self._log(HEADER_THREAD, INFO, message)

    def info(self, message: str, thread: str = PARENT_THREAD) -> None:
        self._log(thread, INFO, message)

    def error(self, message: str, thread: str = PARENT_THREAD) -> None:
        self._log(thread, ERROR, message)

    @property
    def has_errors(self) -> bool:
        with self._lock:
            return any(r.level == ERROR for r in self._records)

    def error_count(self) -> int:
        with self._lock:
            return sum(1 for r in self._records if r.level == ERROR)

    def render(self) -> list[str]:
        """Sorted render: header, then parent, then partition threads
        alphabetically; in-thread arrival order preserved."""
        def group_rank(t: str) -> tuple:
            if t == HEADER_THREAD:
                return (0, "")
            if t == PARENT_THREAD:
                return (1, "")
            return (2, t)

        with self._lock:
            recs = sorted(self._records, key=lambda r: (group_rank(r.thread), r.seq))
            return [
                f"{r.ts_ms}\t{r.thread}\t{r.level}\t{r.message}" for r in recs
            ]
