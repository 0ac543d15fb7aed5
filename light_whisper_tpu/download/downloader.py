"""Model downloader: HF cache layout, byte-range resume, verified manifests.

Wire/behavior parity targets (the *schema*, not the reference's code shape —
see ``download_models.py:136-434`` for the behavior being matched):

- progress lines on stdout with fields ``{stage, model, progress,
  overall_progress, completed, total[, error][, message]}``, at most one per
  percent — the Rust shell forwards each line to the UI verbatim;
- ``.incomplete`` partials resumed via Range requests. A 416 means the
  server can't serve the range: if it confirms we already hold every byte
  the partial is promoted, otherwise the partial is untrusted. 206 bodies
  must match their ``Content-Range`` declaration (offset, totals, end); a
  200 answer to a ranged request means resume was ignored — start over,
  never append a full body to a partial;
- completed files are fsynced then atomically renamed; a repo-level
  completion manifest (size/sha256 per file) is the durable "checkpoint
  valid" marker that load-time validation checks;
- endpoint fallback to the mirror only when the user did not pin
  ``HF_ENDPOINT``.

Architecture: one download attempt is a straight-line function whose
trust failures raise ``_UntrustedPartial``; ``download_file`` catches that,
discards the partial, and grants exactly one full-range retry. Range
bookkeeping lives in pure classifier helpers so every protocol edge case is
testable without I/O. The HTTP transport is injectable (the offline test
suite drives the same edge cases through a fake transport).
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import sys
from typing import Callable, Dict, Iterable, List, Optional, Tuple

from light_whisper_tpu.download.cache import (
    MANIFEST_NAME,
    QWEN3_ASR_MODELS,
    cleanup_incomplete_blobs,
    find_snapshot_file,
    hf_cache_root,
    sha256_file,
)

DEFAULT_ENDPOINT = "https://huggingface.co"
DEFAULT_FALLBACK = "https://hf-mirror.com"
CHUNK_SIZE = 1 << 20

PARTIAL_SUFFIX = ".incomplete"


# ---------------------------------------------------------------------------
# transport


@dataclasses.dataclass
class HttpResponse:
    status: int
    headers: Dict[str, str]
    chunks: Iterable[bytes]
    close: Callable[[], None] = lambda: None

    def header(self, name: str) -> Optional[str]:
        for key, value in self.headers.items():
            if key.lower() == name.lower():
                return value
        return None


class UrllibTransport:
    """Default transport over the stdlib (no requests dependency)."""

    def get(self, url: str, headers: Dict[str, str], timeout: float = 60.0) -> HttpResponse:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=headers)
        try:
            resp = urllib.request.urlopen(req, timeout=timeout)
        except urllib.error.HTTPError as err:  # 4xx/5xx still carry headers
            body = err.read() if err.fp else b""
            return HttpResponse(err.code, dict(err.headers or {}), iter([body]))

        def chunks():
            while True:
                block = resp.read(CHUNK_SIZE)
                if not block:
                    return
                yield block

        return HttpResponse(resp.status, dict(resp.headers), chunks(), resp.close)

    def head_size(self, url: str, timeout: float = 30.0) -> Optional[int]:
        import urllib.request

        req = urllib.request.Request(url, method="HEAD")
        try:
            resp = urllib.request.urlopen(req, timeout=timeout)
            value = resp.headers.get("Content-Length")
            return int(value) if value else None
        except Exception:
            return None


# ---------------------------------------------------------------------------
# range-protocol classifiers (pure; no I/O)


class _UntrustedPartial(Exception):
    """The partial on disk (or the server's story about it) can't be trusted.

    Raising this inside an attempt discards the partial and retries once
    with a full-range request.
    """


_RANGE_FORM = re.compile(r"bytes\s+(\*|\d+-\d+)/(\*|\d+)")


def _content_range(resp: HttpResponse) -> Optional[Tuple[Optional[int], Optional[int], Optional[int]]]:
    """Parse ``Content-Range`` into (start, end, total); ``*`` fields → None.

    Returns None for a missing or malformed header.
    """
    raw = resp.header("Content-Range")
    if raw is None:
        return None
    m = _RANGE_FORM.fullmatch(raw.strip())
    if m is None:
        return None
    span, total_s = m.groups()
    total = None if total_s == "*" else int(total_s)
    if span == "*":
        return None, None, total
    start_s, end_s = span.split("-")
    return int(start_s), int(end_s), total


def _partial_covers_everything(resp: HttpResponse, offset: int, expected: Optional[int]) -> bool:
    """A 416 can mean "you already have the whole file". True iff the bytes
    on disk provably equal the full artifact."""
    if offset <= 0:
        return False
    parsed = _content_range(resp)
    remote_total = parsed[2] if parsed else None
    if expected is not None:
        return offset == expected and remote_total in (None, expected)
    return remote_total is not None and offset == remote_total


def _accept_206(resp: HttpResponse, offset: int, expected: Optional[int]) -> Tuple[int, int]:
    """Validate a partial-content answer against our resume offset.

    Returns ``(total, declared_end)`` or raises ``_UntrustedPartial``. The
    total is the server-declared size when we had no expectation (0 if it
    stays unknowable — which is itself grounds for distrust on blind
    resumes, since nothing else bounds the file).
    """
    parsed = _content_range(resp)
    if parsed is None or parsed[0] is None:
        raise _UntrustedPartial("206 without a parseable Content-Range")
    start, end, total = parsed
    if start != offset or end < start:
        raise _UntrustedPartial(
            f"range starts at {start}, resume offset is {offset}"
        )
    if total is not None and end >= total:
        raise _UntrustedPartial(f"range end {end} outside declared total {total}")
    if expected is not None:
        if total is not None and total != expected:
            raise _UntrustedPartial(
                f"server total {total} != expected size {expected}"
            )
        return expected, end
    if total is None:
        raise _UntrustedPartial("resume without any known total size")
    return total, end


def _declared_length(resp: HttpResponse) -> int:
    try:
        return max(0, int(resp.header("Content-Length") or 0))
    except (TypeError, ValueError):
        return 0


# ---------------------------------------------------------------------------
# single-file download


def _discard(path: str) -> None:
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def _reconcile_existing(dest_path: str, expected: Optional[int]) -> bool:
    """True if ``dest_path`` already holds the finished artifact.

    A final file of the wrong size is demoted to a resume candidate — unless
    an even larger partial already exists, in which case the smaller of the
    two is dropped.
    """
    if not os.path.exists(dest_path):
        return False
    have = os.path.getsize(dest_path)
    if (expected is None and have > 0) or have == expected:
        return True
    partial = dest_path + PARTIAL_SUFFIX
    try:
        existing = os.path.getsize(partial) if os.path.exists(partial) else -1
        if existing < have:
            os.replace(dest_path, partial)
        else:
            os.remove(dest_path)
    except OSError:
        os.remove(dest_path)
    return False


def _resume_offset(partial: str, expected: Optional[int]) -> int:
    if not os.path.exists(partial):
        return 0
    have = os.path.getsize(partial)
    if expected is not None and have > expected:
        os.remove(partial)  # longer than the artifact: garbage
        return 0
    return have


def _pump(
    resp: HttpResponse,
    partial: str,
    offset: int,
    total: int,
    on_progress: Optional[Callable[[int, int], None]],
) -> int:
    """Stream the body onto disk (append at ``offset``); returns bytes held
    after the write. The file is fsynced so a crash can't leave the partial
    longer than its content."""
    written = offset
    with open(partial, "ab" if offset else "wb") as f:
        for block in resp.chunks:
            if not block:
                continue
            f.write(block)
            written += len(block)
            if on_progress and total > 0:
                on_progress(written, total)
        f.flush()
        os.fsync(f.fileno())
    return written


def download_file(
    url: str,
    dest_path: str,
    transport,
    expected_size: Optional[int] = None,
    on_progress: Optional[Callable[[int, int], None]] = None,
) -> None:
    """Fetch one file with resume + range validation (see module doc)."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    if expected_size is None:
        expected_size = transport.head_size(url)
    if _reconcile_existing(dest_path, expected_size):
        return

    partial = dest_path + PARTIAL_SUFFIX
    offset = _resume_offset(partial, expected_size)

    retries = 1
    while True:
        try:
            _fetch_once(url, dest_path, partial, offset, expected_size, transport, on_progress)
            return
        except _UntrustedPartial as why:
            _discard(partial)
            offset = 0
            if retries == 0:
                raise RuntimeError(f"{dest_path}: {why}") from None
            retries -= 1


def _fetch_once(
    url: str,
    dest_path: str,
    partial: str,
    offset: int,
    expected: Optional[int],
    transport,
    on_progress,
) -> None:
    """One request/stream/verify cycle; raises ``_UntrustedPartial`` when the
    partial must be thrown away before another try."""
    headers = {"Accept-Encoding": "identity"}
    if offset > 0:
        headers["Range"] = f"bytes={offset}-"
    resp = transport.get(url, headers)

    declared_end: Optional[int] = None
    try:
        if resp.status == 416:
            if _partial_covers_everything(resp, offset, expected):
                os.replace(partial, dest_path)
                return
            raise _UntrustedPartial("server refused a full-range request")
        if resp.status == 206:
            total, declared_end = _accept_206(resp, offset, expected)
        elif resp.status == 200:
            # Resume ignored (or plain first request): the body is the whole
            # file, so any partial bytes must be overwritten, not extended.
            offset = 0
            total = expected if expected is not None else _declared_length(resp)
        else:
            raise RuntimeError(f"{dest_path}: unexpected status {resp.status}")

        written = _pump(resp, partial, offset, total, on_progress)
    finally:
        resp.close()

    if declared_end is not None and written - 1 != declared_end:
        raise _UntrustedPartial(
            f"body ended at {written - 1}, Content-Range declared {declared_end}"
        )
    for bound in (expected, total or None):
        if bound is not None and written != bound:
            raise RuntimeError(f"{dest_path}: incomplete ({written} != {bound})")

    os.replace(partial, dest_path)


# ---------------------------------------------------------------------------
# progress reporting (stdout JSON line schema = UI wire contract)


class ProgressReporter:
    """Aggregates per-model percentages into the line schema the shell
    forwards to the UI."""

    def __init__(self, total: int, stream=None) -> None:
        self._total = total
        self._done = 0
        self._percent: Dict[str, float] = {}
        self._stream = stream or sys.stdout

    def emit(self, model: str, stage: str, percent: float, error=None, message=None) -> None:
        terminal = stage in ("completed", "error")
        if terminal:
            self._done += 1
        if stage == "downloading" or terminal:
            self._percent[model] = 100.0 if stage == "completed" else (
                0.0 if stage == "error" else percent
            )
        overall = (
            sum(self._percent.values()) / self._total if self._total else 0.0
        )
        line = {
            "stage": stage,
            "model": model,
            "progress": percent,
            "overall_progress": round(overall, 1),
            "completed": self._done,
            "total": self._total,
        }
        if error:
            line["error"] = error
        if message:
            line["message"] = message
        print(json.dumps(line, ensure_ascii=False), file=self._stream, flush=True)


def candidate_endpoints() -> List[str]:
    """Primary endpoint, plus the mirror unless the user pinned their own."""
    pinned = "HF_ENDPOINT" in os.environ
    primary = os.environ.get("HF_ENDPOINT", DEFAULT_ENDPOINT).rstrip("/")
    if pinned:
        return [primary]
    fallback = os.environ.get("HF_FALLBACK_ENDPOINT", DEFAULT_FALLBACK).rstrip("/")
    return [primary] + [fallback] * bool(fallback and fallback != primary)


# ---------------------------------------------------------------------------
# repo-level orchestration


def _safe_relpath(rel: str) -> str:
    """Reject rfilenames that would escape the snapshot dir (absolute paths
    or ``..`` segments) — mirror of the read-side manifest validation."""
    if not rel or rel.startswith(("/", "\\")) or os.path.isabs(rel):
        raise ValueError(f"unsafe repo filename {rel!r}")
    parts = re.split(r"[/\\]", rel)
    if any(p in ("", ".", "..") for p in parts):
        raise ValueError(f"unsafe repo filename {rel!r}")
    return os.path.join(*parts)


def _verified_manifest_entry(snapshot_dir: str, item: Dict) -> Dict:
    rel = item["rfilename"]
    path = os.path.join(snapshot_dir, _safe_relpath(rel))
    actual = os.path.getsize(path)
    size = item.get("size", actual)
    if size is None:
        size = actual
    if actual != size:
        raise RuntimeError(f"{rel}: size check failed ({actual} != {size})")
    entry = {"path": rel, "size": size}
    want_sha = item.get("sha256")
    if want_sha:
        got_sha = sha256_file(path)
        if got_sha.lower() != want_sha.lower():
            raise RuntimeError(f"{rel}: sha256 mismatch")
        entry["sha256"] = want_sha
    return entry


def write_completion_manifest(snapshot_dir: str, repo_id: str, commit: str, files: List[Dict]) -> None:
    manifest = {
        "repo_id": repo_id,
        "commit_hash": commit,
        "files": [_verified_manifest_entry(snapshot_dir, item) for item in files],
    }
    final = os.path.join(snapshot_dir, MANIFEST_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _clear_stale_locks(repo_id: str) -> None:
    """Drop leftover hub lock files and orphaned partials once per run —
    before any endpoint is tried, so a mirror fallback can still resume a
    partial begun against the primary."""
    import glob

    cleanup_incomplete_blobs(repo_id)
    lock_dir = os.path.join(
        hf_cache_root(), ".locks", "models--" + repo_id.replace("/", "--")
    )
    if os.path.isdir(lock_dir):
        for lock in glob.glob(os.path.join(lock_dir, "*.lock")):
            _discard(lock)


def _prepare_snapshot(repo_id: str, revision: str) -> str:
    """Create the HF cache directory skeleton and pin refs/main; returns the
    snapshot dir."""
    repo_dir = os.path.join(hf_cache_root(), "models--" + repo_id.replace("/", "--"))
    snapshot_dir = os.path.join(repo_dir, "snapshots", revision)
    refs_dir = os.path.join(repo_dir, "refs")
    os.makedirs(snapshot_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)
    with open(os.path.join(refs_dir, "main"), "w") as f:
        f.write(revision)
    return snapshot_dir


def download_repo(
    repo_id: str,
    model_type: str,
    files: List[Dict],
    revision: str,
    reporter: ProgressReporter,
    transport=None,
) -> Dict:
    """Download explicit files of one repo into the HF cache structure."""
    transport = transport or UrllibTransport()

    if all(find_snapshot_file(repo_id, item["rfilename"]) for item in files):
        reporter.emit(model_type, "completed", 100, message=f"{repo_id} 已在本地缓存，跳过")
        return {"success": True, "model": model_type}

    _clear_stale_locks(repo_id)

    failure: Optional[Exception] = None
    for nth, endpoint in enumerate(candidate_endpoints()):
        note = (
            f"开始下载 {repo_id} ..."
            if nth == 0
            else f"切换到镜像端点 {endpoint} 重试..."
        )
        reporter.emit(model_type, "downloading", 0, message=note)
        try:
            snapshot_dir = _prepare_snapshot(repo_id, revision)
            for file_idx, item in enumerate(files, 1):
                rel = item["rfilename"]
                tracker = _PercentTracker(
                    reporter, model_type, f"[{file_idx}/{len(files)}] {rel}"
                )
                download_file(
                    f"{endpoint}/{repo_id}/resolve/{revision}/{rel}",
                    os.path.join(snapshot_dir, _safe_relpath(rel)),
                    transport,
                    expected_size=item.get("size"),
                    on_progress=tracker,
                )
            write_completion_manifest(snapshot_dir, repo_id, revision, files)
            reporter.emit(model_type, "completed", 100, message=f"{repo_id} 全部文件下载完成")
            return {"success": True, "model": model_type, "endpoint": endpoint}
        except Exception as exc:
            failure = exc

    reason = str(failure) if failure else "所有下载端点均失败"
    reporter.emit(model_type, "error", 0, reason, message=f"{repo_id} 下载出错: {reason}")
    return {"success": False, "model": model_type, "error": reason}


class _PercentTracker:
    """Rate-limits byte progress into one reporter line per whole percent."""

    def __init__(self, reporter: ProgressReporter, model: str, label: str) -> None:
        self._reporter = reporter
        self._model = model
        self._label = label
        self._last = -1

    def __call__(self, current: int, total: int) -> None:
        pct = int(current * 100 / total)
        if pct != self._last:
            self._last = pct
            self._reporter.emit(
                self._model, "downloading", pct, message=f"{self._label} {pct}%"
            )


def download_model(engine: str, transport=None, stream=None) -> Dict:
    """CLI entry: download the registered artifact for one engine id."""
    if engine not in QWEN3_ASR_MODELS:
        raise ValueError(f"unknown engine {engine!r}")
    spec = QWEN3_ASR_MODELS[engine]
    return download_repo(
        spec["repo_id"],
        engine,
        [{"rfilename": spec["filename"], "size": spec["size"], "sha256": spec["sha256"]}],
        spec["revision"],
        ProgressReporter(total=1, stream=stream),
        transport=transport,
    )
