"""Transcription history store: SQLite (WAL), migrations, leases, stats.

Port of the reference's history service (``history_service.rs``):

- schema v2 with additive migrations (``workflow``/``source_text`` columns,
  legacy assistant-mode backfill) and the same indexes;
- optional WAV attachments as files with **refcounted leases** — a reprocess
  can hold audio alive after its source row is deleted; unreferenced files
  are collected on release/startup (orphan sweep);
- retention-day cleanup on insert, filtered paged listing (cap 200/page),
- latency percentile stats over successful rows (sorted nearest-rank:
  index = round((n-1)·p));
- JSON / Markdown export.

Everything is synchronous (callers thread as needed); one connection per
operation mirrors the reference's spawn_blocking usage.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import math
import os
import re
import sqlite3
import time
from typing import Any, Dict, List, Optional

SCHEMA_VERSION = 2
MAX_PAGE_SIZE = 200
DB_FILE = "transcription_history.sqlite3"
AUDIO_DIR = "history_audio"

_SAFE_AUDIO_NAME = re.compile(r"^[A-Za-z0-9._-]+\.wav$")


def _now_ms() -> int:
    return int(time.time() * 1000)


@dataclasses.dataclass
class HistoryDraft:
    session_id: int
    mode: str = "dictation"
    workflow: str = "dictation"
    status: str = "success"
    text: str = ""
    original_text: str = ""
    source_text: Optional[str] = None
    duration_sec: Optional[float] = None
    language: Optional[str] = None
    engine: str = ""
    provider: Optional[str] = None
    model: Optional[str] = None
    app_process: Optional[str] = None
    app_window_title: Optional[str] = None
    app_rule_name: Optional[str] = None
    audio_file: Optional[str] = None
    asr_ms: Optional[int] = None
    polish_ms: Optional[int] = None
    total_ms: Optional[int] = None
    error: Optional[str] = None
    reprocessed_from_id: Optional[int] = None


class HistoryStore:
    def __init__(self, data_dir: str):
        self.data_dir = data_dir
        os.makedirs(data_dir, exist_ok=True)
        self.db_path = os.path.join(data_dir, DB_FILE)
        self.audio_dir = os.path.join(data_dir, AUDIO_DIR)
        with self._connect() as conn:
            self._migrate(conn)
            # Leases can only be crash leftovers at startup.
            conn.execute("DELETE FROM history_audio_leases")
            conn.commit()
            self._cleanup_orphan_audio(conn)

    # ------------------------------------------------------------------

    @contextlib.contextmanager
    def _connect(self):
        """One transaction per call site, and the handle actually CLOSES:
        ``with conn`` alone only commits — the fd and WAL mapping would wait
        for GC, risking fd exhaustion under sustained use."""
        conn = sqlite3.connect(self.db_path)
        try:
            conn.execute("PRAGMA journal_mode = WAL")
            conn.execute("PRAGMA foreign_keys = ON")
            conn.row_factory = sqlite3.Row
            with conn:
                yield conn
        finally:
            conn.close()

    def _migrate(self, conn: sqlite3.Connection) -> None:
        version = conn.execute("PRAGMA user_version").fetchone()[0]
        if version > SCHEMA_VERSION:
            raise RuntimeError(
                f"history db version {version} newer than supported {SCHEMA_VERSION}"
            )
        if version == SCHEMA_VERSION:
            return
        conn.executescript(
            """
            CREATE TABLE IF NOT EXISTS transcription_history (
                id                  INTEGER PRIMARY KEY AUTOINCREMENT,
                session_id          INTEGER NOT NULL,
                created_at          INTEGER NOT NULL,
                updated_at          INTEGER NOT NULL,
                mode                TEXT NOT NULL,
                status              TEXT NOT NULL,
                text                TEXT NOT NULL,
                original_text       TEXT NOT NULL,
                source_text         TEXT,
                duration_sec        REAL,
                language            TEXT,
                engine              TEXT NOT NULL,
                provider            TEXT,
                model               TEXT,
                app_process         TEXT,
                app_window_title    TEXT,
                app_rule_name       TEXT,
                audio_file          TEXT,
                asr_ms              INTEGER,
                polish_ms           INTEGER,
                total_ms            INTEGER,
                raw_first_status    TEXT,
                error               TEXT,
                reprocessed_from_id INTEGER,
                workflow            TEXT NOT NULL DEFAULT 'dictation'
            );
            CREATE INDEX IF NOT EXISTS idx_history_created_at
                ON transcription_history(created_at DESC);
            CREATE INDEX IF NOT EXISTS idx_history_mode_status
                ON transcription_history(mode, status);
            CREATE INDEX IF NOT EXISTS idx_history_audio_file
                ON transcription_history(audio_file);
            CREATE TABLE IF NOT EXISTS history_audio_leases (
                audio_file TEXT PRIMARY KEY,
                lease_count INTEGER NOT NULL CHECK (lease_count > 0),
                updated_at INTEGER NOT NULL
            );
            """
        )
        columns = {
            row[1]
            for row in conn.execute("PRAGMA table_info(transcription_history)")
        }
        if "workflow" not in columns:
            conn.execute(
                "ALTER TABLE transcription_history"
                " ADD COLUMN workflow TEXT NOT NULL DEFAULT 'dictation'"
            )
        if "source_text" not in columns:
            conn.execute("ALTER TABLE transcription_history ADD COLUMN source_text TEXT")
        conn.execute(
            "UPDATE transcription_history SET workflow = 'assistant'"
            " WHERE mode = 'assistant' AND workflow = 'dictation'"
        )
        conn.execute(f"PRAGMA user_version = {SCHEMA_VERSION}")
        conn.commit()

    # -- audio files ---------------------------------------------------

    def _safe_audio_path(self, file_name: str) -> Optional[str]:
        if not _SAFE_AUDIO_NAME.fullmatch(file_name):
            return None
        return os.path.join(self.audio_dir, file_name)

    def save_audio(self, session_id: int, wav_bytes: bytes) -> str:
        os.makedirs(self.audio_dir, exist_ok=True)
        file_name = f"{_now_ms()}-{session_id}.wav"
        path = os.path.join(self.audio_dir, file_name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(wav_bytes)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return file_name

    def read_audio(self, file_name: str) -> bytes:
        path = self._safe_audio_path(file_name)
        if path is None:
            raise ValueError(f"invalid audio file name: {file_name!r}")
        with open(path, "rb") as f:
            return f.read()

    def _cleanup_audio_if_unreferenced(self, conn: sqlite3.Connection, audio_file: str) -> None:
        refs = conn.execute(
            "SELECT COUNT(*) FROM transcription_history WHERE audio_file = ?",
            (audio_file,),
        ).fetchone()[0]
        leases = conn.execute(
            "SELECT COALESCE(SUM(lease_count), 0) FROM history_audio_leases WHERE audio_file = ?",
            (audio_file,),
        ).fetchone()[0]
        if refs == 0 and leases == 0:
            path = self._safe_audio_path(audio_file)
            if path and os.path.isfile(path):
                try:
                    os.remove(path)
                except OSError:
                    pass

    def _cleanup_orphan_audio(self, conn: sqlite3.Connection) -> None:
        if not os.path.isdir(self.audio_dir):
            return
        referenced = {
            row[0]
            for row in conn.execute(
                "SELECT DISTINCT audio_file FROM transcription_history"
                " WHERE audio_file IS NOT NULL"
            )
        }
        # .wav.tmp: a save_audio killed mid-write before os.replace — never
        # referenced by any row, would otherwise accumulate forever
        for name in os.listdir(self.audio_dir):
            if name.endswith((".wav", ".wav.tmp")) and name not in referenced:
                try:
                    os.remove(os.path.join(self.audio_dir, name))
                except OSError:
                    pass

    def acquire_audio_lease(self, audio_file: str) -> None:
        with self._connect() as conn:
            self._acquire_lease(conn, audio_file)
            conn.commit()

    @staticmethod
    def _acquire_lease(conn: sqlite3.Connection, audio_file: str) -> None:
        conn.execute(
            """
            INSERT INTO history_audio_leases(audio_file, lease_count, updated_at)
            VALUES (?, 1, ?)
            ON CONFLICT(audio_file)
            DO UPDATE SET lease_count = lease_count + 1, updated_at = excluded.updated_at
            """,
            (audio_file, _now_ms()),
        )

    def release_audio_lease(self, audio_file: str) -> None:
        with self._connect() as conn:
            conn.execute(
                "UPDATE history_audio_leases SET lease_count = lease_count - 1, updated_at = ?"
                " WHERE audio_file = ? AND lease_count > 1",
                (_now_ms(), audio_file),
            )
            conn.execute(
                "DELETE FROM history_audio_leases WHERE audio_file = ? AND lease_count = 1",
                (audio_file,),
            )
            conn.commit()
            self._cleanup_audio_if_unreferenced(conn, audio_file)

    # -- rows ----------------------------------------------------------

    def insert(self, draft: HistoryDraft, retention_days: int = 0) -> int:
        now = _now_ms()
        with self._connect() as conn:
            cursor = conn.execute(
                """
                INSERT INTO transcription_history (
                    session_id, created_at, updated_at, mode, workflow, status,
                    text, original_text, source_text, duration_sec, language,
                    engine, provider, model, app_process, app_window_title,
                    app_rule_name, audio_file, asr_ms, polish_ms, total_ms,
                    error, reprocessed_from_id
                ) VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)
                """,
                (
                    draft.session_id, now, now, draft.mode, draft.workflow,
                    draft.status, draft.text, draft.original_text,
                    draft.source_text, draft.duration_sec, draft.language,
                    draft.engine, draft.provider, draft.model,
                    draft.app_process, draft.app_window_title,
                    draft.app_rule_name, draft.audio_file, draft.asr_ms,
                    draft.polish_ms, draft.total_ms, draft.error,
                    draft.reprocessed_from_id,
                ),
            )
            conn.commit()
            row_id = cursor.lastrowid
        if retention_days > 0:
            self.cleanup(retention_days)
        return row_id

    @staticmethod
    def _record(row: sqlite3.Row) -> Dict[str, Any]:
        record = dict(row)
        record["audio_available"] = record.get("audio_file") is not None
        record.pop("raw_first_status", None)
        return record

    def get(self, row_id: int) -> Optional[Dict[str, Any]]:
        with self._connect() as conn:
            row = conn.execute(
                "SELECT * FROM transcription_history WHERE id = ?", (row_id,)
            ).fetchone()
        return self._record(row) if row else None

    def get_for_reprocess(self, row_id: int) -> Optional[Dict[str, Any]]:
        """Fetch a record and lease its audio so deletion can't race the
        reprocess (``history_service.rs:448-495``).

        Fetch + lease run in ONE transaction — with two, a concurrent
        delete could unlink the WAV between them, which is exactly the
        race the lease exists to prevent."""
        with self._connect() as conn:
            row = conn.execute(
                "SELECT * FROM transcription_history WHERE id = ?", (row_id,)
            ).fetchone()
            if row is None:
                return None
            record = self._record(row)
            if record.get("audio_file"):
                self._acquire_lease(conn, record["audio_file"])
        return record

    def list(
        self,
        query: str = "",
        mode: str = "",
        status: str = "",
        limit: int = 50,
        offset: int = 0,
    ) -> Dict[str, Any]:
        limit = max(1, min(int(limit), MAX_PAGE_SIZE))
        clauses: List[str] = []
        args: List[Any] = []
        if query:
            # escape LIKE metacharacters: searching the literal "100%" must
            # not match every row containing "100"
            escaped = (
                query.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
            )
            clauses.append(
                "(text LIKE ? ESCAPE '\\' OR original_text LIKE ? ESCAPE '\\')"
            )
            like = f"%{escaped}%"
            args += [like, like]
        if mode:
            clauses.append("mode = ?")
            args.append(mode)
        if status:
            clauses.append("status = ?")
            args.append(status)
        where = f"WHERE {' AND '.join(clauses)}" if clauses else ""
        with self._connect() as conn:
            total = conn.execute(
                f"SELECT COUNT(*) FROM transcription_history {where}", args
            ).fetchone()[0]
            rows = conn.execute(
                f"SELECT * FROM transcription_history {where}"
                " ORDER BY created_at DESC, id DESC LIMIT ? OFFSET ?",
                args + [limit, offset],
            ).fetchall()
        items = [self._record(r) for r in rows]
        return {
            "items": items,
            "total": total,
            "has_more": offset + len(items) < total,
        }

    def delete(self, row_id: int) -> bool:
        with self._connect() as conn:
            row = conn.execute(
                "SELECT audio_file FROM transcription_history WHERE id = ?", (row_id,)
            ).fetchone()
            removed = conn.execute(
                "DELETE FROM transcription_history WHERE id = ?", (row_id,)
            ).rowcount > 0
            conn.commit()
            if row and row[0]:
                self._cleanup_audio_if_unreferenced(conn, row[0])
        return removed

    def cleanup(self, retention_days: int) -> int:
        if retention_days <= 0:
            return 0
        cutoff = _now_ms() - retention_days * 86_400_000
        with self._connect() as conn:
            audio_files = [
                row[0]
                for row in conn.execute(
                    "SELECT DISTINCT audio_file FROM transcription_history"
                    " WHERE created_at < ? AND audio_file IS NOT NULL",
                    (cutoff,),
                )
            ]
            removed = conn.execute(
                "DELETE FROM transcription_history WHERE created_at < ?", (cutoff,)
            ).rowcount
            conn.commit()
            for audio_file in audio_files:
                self._cleanup_audio_if_unreferenced(conn, audio_file)
        return removed

    # -- stats / export ------------------------------------------------

    @staticmethod
    def _percentile(values: List[int], p: float) -> Optional[int]:
        if not values:
            return None
        values = sorted(values)
        # half-away-from-zero like Rust f64::round — Python's banker's
        # round((n-1)*p) picks the LOWER rank at .5 (round(0.5)=0) and
        # diverges from the reference's nearest-rank formula
        index = int(math.floor((len(values) - 1) * p + 0.5))
        return values[index]

    def stats(self) -> Dict[str, Any]:
        with self._connect() as conn:
            total, success, failed, chars = conn.execute(
                """
                SELECT COUNT(*),
                       COALESCE(SUM(CASE WHEN status = 'success' THEN 1 ELSE 0 END), 0),
                       COALESCE(SUM(CASE WHEN status != 'success' THEN 1 ELSE 0 END), 0),
                       COALESCE(SUM(LENGTH(text)), 0)
                FROM transcription_history
                """
            ).fetchone()
            rows = conn.execute(
                "SELECT asr_ms, polish_ms, total_ms FROM transcription_history"
                " WHERE status = 'success'"
            ).fetchall()
        asr = [r[0] for r in rows if r[0] is not None]
        polish = [r[1] for r in rows if r[1] is not None]
        total_latency = [r[2] for r in rows if r[2] is not None]
        return {
            "total": total,
            "success": success,
            "failed": failed,
            "total_characters": chars,
            "asr": {"p50_ms": self._percentile(asr, 0.5), "p95_ms": self._percentile(asr, 0.95)},
            "polish": {
                "p50_ms": self._percentile(polish, 0.5),
                "p95_ms": self._percentile(polish, 0.95),
            },
            "total_latency": {
                "p50_ms": self._percentile(total_latency, 0.5),
                "p95_ms": self._percentile(total_latency, 0.95),
            },
        }

    def export_json(self) -> str:
        with self._connect() as conn:
            rows = conn.execute(
                "SELECT * FROM transcription_history ORDER BY created_at DESC, id DESC"
            ).fetchall()
        return json.dumps([self._record(r) for r in rows], ensure_ascii=False, indent=2)

    def export_markdown(self) -> str:
        with self._connect() as conn:
            rows = conn.execute(
                "SELECT * FROM transcription_history ORDER BY created_at DESC, id DESC"
            ).fetchall()
        lines = [
            "| time | mode | status | engine | text |",
            "|---|---|---|---|---|",
        ]
        for row in rows:
            created = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.localtime(row["created_at"] / 1000)
            )
            text = (row["text"] or "").replace("|", "\\|").replace("\n", " ")
            lines.append(
                f"| {created} | {row['mode']} | {row['status']} | {row['engine']} | {text} |"
            )
        return "\n".join(lines) + "\n"
