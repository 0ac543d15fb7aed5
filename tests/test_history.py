"""History store: schema, leases, retention, stats, export."""

import os
import sqlite3
import time

import pytest

from light_whisper_tpu.storage.history import HistoryDraft, HistoryStore


@pytest.fixture
def store(tmp_path):
    return HistoryStore(str(tmp_path))


def draft(**kw):
    base = dict(
        session_id=1,
        mode="dictation",
        status="success",
        text="你好世界",
        original_text="你好世界",
        engine="qwen3-asr-0.6b",
        asr_ms=120,
        polish_ms=300,
        total_ms=450,
    )
    base.update(kw)
    return HistoryDraft(**base)


def test_insert_get_roundtrip(store):
    row_id = store.insert(draft())
    record = store.get(row_id)
    assert record["text"] == "你好世界"
    assert record["workflow"] == "dictation"
    assert record["audio_available"] is False
    assert store.get(9999) is None


def test_list_filters_and_paging(store):
    for i in range(5):
        store.insert(draft(text=f"alpha {i}", status="success"))
    store.insert(draft(text="beta", status="error", mode="assistant"))

    page = store.list(limit=3)
    assert page["total"] == 6 and page["has_more"] and len(page["items"]) == 3

    filtered = store.list(query="alpha")
    assert filtered["total"] == 5

    by_mode = store.list(mode="assistant")
    assert by_mode["total"] == 1 and by_mode["items"][0]["status"] == "error"

    by_status = store.list(status="error")
    assert by_status["total"] == 1


def test_page_size_cap(store):
    assert store.list(limit=100000)["items"] == []  # no crash, capped internally


def test_stats_percentiles(store):
    for ms in (100, 200, 300, 400, 500):
        store.insert(draft(asr_ms=ms, total_ms=ms * 2))
    store.insert(draft(status="error", asr_ms=99999))
    stats = store.stats()
    assert stats["total"] == 6 and stats["success"] == 5 and stats["failed"] == 1
    assert stats["asr"]["p50_ms"] == 300  # failures excluded
    assert stats["asr"]["p95_ms"] == 500
    assert stats["total_latency"]["p50_ms"] == 600


def test_audio_lifecycle_and_leases(store):
    wav = b"RIFF" + b"\x00" * 100
    name = store.save_audio(7, wav)
    assert store.read_audio(name) == wav
    row_id = store.insert(draft(audio_file=name))

    # reprocess leases the audio; deleting the row keeps the file alive
    record = store.get_for_reprocess(row_id)
    assert record["audio_file"] == name
    assert store.delete(row_id)
    assert store.read_audio(name) == wav  # lease holds it

    # releasing the lease collects the unreferenced file
    store.release_audio_lease(name)
    with pytest.raises(FileNotFoundError):
        store.read_audio(name)


def test_audio_path_traversal_rejected(store):
    with pytest.raises(ValueError):
        store.read_audio("../../etc/passwd")
    with pytest.raises(ValueError):
        store.read_audio("x/../../y.wav")


def test_retention_cleanup(store, tmp_path):
    old_id = store.insert(draft())
    # age the row artificially
    db = os.path.join(str(tmp_path), "transcription_history.sqlite3")
    with sqlite3.connect(db) as conn:
        old = int(time.time() * 1000) - 10 * 86_400_000
        conn.execute(
            "UPDATE transcription_history SET created_at = ? WHERE id = ?", (old, old_id)
        )
    fresh_id = store.insert(draft(), retention_days=7)
    assert store.get(old_id) is None
    assert store.get(fresh_id) is not None


def test_orphan_audio_swept_on_startup(tmp_path):
    store = HistoryStore(str(tmp_path))
    name = store.save_audio(1, b"12345")
    # no history row references it → new startup sweeps it
    HistoryStore(str(tmp_path))
    assert not os.path.isfile(os.path.join(str(tmp_path), "history_audio", name))


def test_legacy_assistant_backfill(tmp_path):
    """A v0 database without workflow/source_text migrates in place."""
    db = os.path.join(str(tmp_path), "transcription_history.sqlite3")
    with sqlite3.connect(db) as conn:
        conn.executescript(
            """
            CREATE TABLE transcription_history (
                id INTEGER PRIMARY KEY AUTOINCREMENT,
                session_id INTEGER NOT NULL,
                created_at INTEGER NOT NULL,
                updated_at INTEGER NOT NULL,
                mode TEXT NOT NULL,
                status TEXT NOT NULL,
                text TEXT NOT NULL,
                original_text TEXT NOT NULL,
                duration_sec REAL, language TEXT,
                engine TEXT NOT NULL,
                provider TEXT, model TEXT, app_process TEXT,
                app_window_title TEXT, app_rule_name TEXT, audio_file TEXT,
                asr_ms INTEGER, polish_ms INTEGER, total_ms INTEGER,
                raw_first_status TEXT, error TEXT, reprocessed_from_id INTEGER
            );
            INSERT INTO transcription_history
                (session_id, created_at, updated_at, mode, status, text,
                 original_text, engine)
            VALUES (1, 1, 1, 'assistant', 'success', 'q', 'q', 'e');
            """
        )
    store = HistoryStore(str(tmp_path))
    record = store.list()["items"][0]
    assert record["workflow"] == "assistant"
    assert "source_text" in record


def test_export_formats(store):
    store.insert(draft(text="line|with|pipes\nand newline"))
    js = store.export_json()
    assert "line|with|pipes" in js
    md = store.export_markdown()
    assert "line\\|with\\|pipes and newline" in md
    assert md.startswith("| time |")


def test_percentile_rounds_half_away_from_zero(tmp_path):
    from light_whisper_tpu.storage.history import HistoryStore

    # Rust f64::round semantics: index round((n-1)*p) with .5 going UP
    assert HistoryStore._percentile([10, 20], 0.5) == 20
    assert HistoryStore._percentile(list(range(10)), 0.5) == 5


def test_list_escapes_like_metacharacters(tmp_path):
    from light_whisper_tpu.storage.history import HistoryDraft, HistoryStore

    store = HistoryStore(str(tmp_path))
    for text in ("progress 100% done", "progress 1009 done", "aXb", "a_b"):
        store.insert(HistoryDraft(session_id=1, mode="dictation", status="success",
                                  text=text))
    hits = store.list(query="100%")["items"]
    assert [r["text"] for r in hits] == ["progress 100% done"]
    hits = store.list(query="a_b")["items"]
    assert [r["text"] for r in hits] == ["a_b"]


def test_orphan_sweep_removes_stale_wav_tmp(tmp_path):
    import os

    from light_whisper_tpu.storage.history import HistoryStore

    store = HistoryStore(str(tmp_path))
    stale = os.path.join(store.audio_dir, "123-9.wav.tmp")
    os.makedirs(store.audio_dir, exist_ok=True)
    with open(stale, "wb") as f:
        f.write(b"partial")
    HistoryStore(str(tmp_path))  # fresh startup triggers the sweep
    assert not os.path.exists(stale)


def test_get_for_reprocess_leases_atomically(tmp_path):
    from light_whisper_tpu.storage.history import HistoryDraft, HistoryStore

    store = HistoryStore(str(tmp_path))
    name = store.save_audio(1, b"RIFF-fake-wav-bytes")
    rid = store.insert(HistoryDraft(session_id=1, mode="dictation",
                                    status="success", text="x", audio_file=name))
    rec = store.get_for_reprocess(rid)
    assert rec["audio_file"] == name
    # leased: delete must keep the audio file alive
    import os
    store.delete(rid)
    assert os.path.exists(os.path.join(store.audio_dir, name))
    store.release_audio_lease(name)
    assert not os.path.exists(os.path.join(store.audio_dir, name))
