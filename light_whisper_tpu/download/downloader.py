"""Model downloader: HF cache layout, byte-range resume, verified manifests.

Behavioral parity with the reference downloader
(``download_models.py:136-434``), which the Rust shell drives as a child
process and whose stdout JSON lines feed the UI progress events:

- progress schema ``{stage, model, progress, overall_progress, completed,
  total[, error][, message]}``, one line per percent;
- ``.incomplete`` partials with Range resume; a 416 either completes the file
  (server says we have all bytes) or restarts from zero; 206 responses are
  validated against their ``Content-Range`` (start must equal our offset,
  totals must agree, end must lie inside the file); a 200 after a Range
  request means the server ignored resume — restart, never append;
- after the body: declared range end and expected sizes are re-checked, the
  partial is fsynced and atomically renamed;
- a completion manifest (``.light_whisper_complete.json``) with per-file
  size/sha256 is written via fsync + atomic rename — it is the "checkpoint
  valid" marker both engines validate at load;
- endpoint fallback hf.co → hf-mirror.com only when the user didn't pin
  ``HF_ENDPOINT``.

The HTTP transport is injectable so the protocol edge cases are testable
offline (the reference does the same with a fake requests layer,
``test_download_models_regression.py``).
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

_CONTENT_RANGE = re.compile(r"^bytes (\d+)-(\d+)/(\d+|\*)$")
_UNSATISFIED_RANGE = re.compile(r"^bytes \*/(\d+)$")


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


class ProgressReporter:
    """Aggregated per-model progress lines on stdout (UI contract)."""

    def __init__(self, total: int, stream=None) -> None:
        self.total = total
        self.completed = 0
        self.progress: Dict[str, float] = {}
        self.stream = stream or sys.stdout

    def emit(self, model: str, stage: str, percent: float, error=None, message=None) -> None:
        if stage == "downloading":
            self.progress[model] = percent
        elif stage in ("completed", "error"):
            self.progress[model] = 100 if stage == "completed" else 0
            self.completed += 1
        overall = sum(self.progress.values()) / self.total if self.total else 0
        status = {
            "stage": stage,
            "model": model,
            "progress": percent,
            "overall_progress": round(overall, 1),
            "completed": self.completed,
            "total": self.total,
        }
        if error:
            status["error"] = error
        if message:
            status["message"] = message
        self.stream.write(json.dumps(status, ensure_ascii=False) + "\n")
        self.stream.flush()


def candidate_endpoints() -> List[str]:
    primary = os.environ.get("HF_ENDPOINT", DEFAULT_ENDPOINT).rstrip("/")
    endpoints = [primary]
    fallback = os.environ.get("HF_FALLBACK_ENDPOINT", DEFAULT_FALLBACK).rstrip("/")
    # A user-pinned HF_ENDPOINT is respected; only auto-fallback otherwise.
    if "HF_ENDPOINT" not in os.environ and fallback and fallback not in endpoints:
        endpoints.append(fallback)
    return endpoints


def _parse_content_range(value: Optional[str]) -> Optional[Tuple[int, int, Optional[int]]]:
    if not value:
        return None
    m = _CONTENT_RANGE.fullmatch(value.strip())
    if not m:
        return None
    start, end, total = m.groups()
    return int(start), int(end), None if total == "*" else int(total)


def _parse_unsatisfied_total(value: Optional[str]) -> Optional[int]:
    if not value:
        return None
    m = _UNSATISFIED_RANGE.fullmatch(value.strip())
    return int(m.group(1)) if m else None


def _remove_quiet(path: str) -> None:
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def download_file(
    url: str,
    dest_path: str,
    transport,
    expected_size: Optional[int] = None,
    on_progress: Optional[Callable[[int, int], None]] = None,
) -> None:
    """Download one file with resume + range validation (see module doc)."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)

    if expected_size is None:
        expected_size = transport.head_size(url)

    if os.path.exists(dest_path):
        final_size = os.path.getsize(dest_path)
        if expected_size is None and final_size > 0:
            return
        if expected_size is not None and final_size == expected_size:
            return
        # Wrong-size artifact: keep the larger candidate as the partial.
        stale = dest_path + ".incomplete"
        try:
            if not os.path.exists(stale) or os.path.getsize(stale) < final_size:
                os.replace(dest_path, stale)
            else:
                os.remove(dest_path)
        except OSError:
            os.remove(dest_path)

    tmp_path = dest_path + ".incomplete"
    downloaded = 0
    if os.path.exists(tmp_path):
        downloaded = os.path.getsize(tmp_path)
        if expected_size is not None and downloaded > expected_size:
            os.remove(tmp_path)
            downloaded = 0

    for attempt in range(2):
        headers = {"Accept-Encoding": "identity"}
        if downloaded > 0:
            headers["Range"] = f"bytes={downloaded}-"

        resp = transport.get(url, headers)

        if resp.status == 416:
            remote_total = _parse_unsatisfied_total(resp.header("Content-Range"))
            complete = (
                expected_size is not None
                and downloaded == expected_size
                and (remote_total is None or remote_total == expected_size)
            ) or (
                expected_size is None
                and remote_total is not None
                and downloaded == remote_total
            )
            resp.close()
            if complete and downloaded > 0:
                os.replace(tmp_path, dest_path)
                return
            _remove_quiet(tmp_path)
            downloaded = 0
            if attempt == 0:
                continue
            raise RuntimeError(f"{dest_path}: server refused a full-range request")

        if resp.status not in (200, 206):
            resp.close()
            raise RuntimeError(f"{dest_path}: unexpected status {resp.status}")

        total_size = expected_size or 0
        declared_end: Optional[int] = None

        if resp.status == 206:
            parsed = _parse_content_range(resp.header("Content-Range"))
            ok = parsed is not None
            if parsed is not None:
                start, end, total = parsed
                ok = start == downloaded and end >= start
                declared_end = end
                if expected_size is not None and total is not None:
                    ok = ok and total == expected_size
                if total is not None:
                    ok = ok and end < total
                if expected_size is None:
                    ok = ok and total is not None
                    if total is not None:
                        total_size = total
            if not ok:
                resp.close()
                _remove_quiet(tmp_path)
                downloaded = 0
                if attempt == 0:
                    continue
                raise RuntimeError(f"{dest_path}: invalid Content-Range")
            mode = "ab" if downloaded > 0 else "wb"
        else:  # 200 — server ignored Range; restart, never append.
            downloaded = 0
            mode = "wb"
            if total_size == 0:
                try:
                    length = int(resp.header("Content-Length") or 0)
                except (TypeError, ValueError):
                    length = 0
                if length > 0:
                    total_size = length

        current = downloaded
        try:
            with open(tmp_path, mode) as f:
                for chunk in resp.chunks:
                    if not chunk:
                        continue
                    f.write(chunk)
                    current += len(chunk)
                    if on_progress and total_size > 0:
                        on_progress(current, total_size)
                f.flush()
                os.fsync(f.fileno())
        finally:
            resp.close()

        if declared_end is not None and current - 1 != declared_end:
            # Body disagreed with the declared range; partial bytes untrusted.
            _remove_quiet(tmp_path)
            downloaded = 0
            if attempt == 0:
                continue
            raise RuntimeError(
                f"{dest_path}: Content-Range/body mismatch (end={declared_end}, got={current - 1})"
            )
        if expected_size is not None and current != expected_size:
            raise RuntimeError(f"{dest_path}: incomplete ({current} != {expected_size})")
        if total_size > 0 and current != total_size:
            raise RuntimeError(f"{dest_path}: incomplete ({current} != {total_size})")

        os.replace(tmp_path, dest_path)
        return

    raise RuntimeError(f"{dest_path}: download failed")


def write_completion_manifest(snapshot_dir: str, repo_id: str, commit: str, files: List[Dict]) -> None:
    entries = []
    for item in files:
        rel = item["rfilename"]
        path = os.path.join(snapshot_dir, rel.replace("/", os.sep))
        size = item.get("size")
        actual = os.path.getsize(path)
        if size is None:
            size = actual
        if actual != size:
            raise RuntimeError(f"{rel}: size check failed ({actual} != {size})")
        entry = {"path": rel, "size": size}
        expected_sha = item.get("sha256")
        if expected_sha:
            actual_sha = sha256_file(path)
            if actual_sha.lower() != expected_sha.lower():
                raise RuntimeError(f"{rel}: sha256 mismatch")
            entry["sha256"] = expected_sha
        entries.append(entry)

    manifest = {"repo_id": repo_id, "commit_hash": commit, "files": entries}
    tmp = os.path.join(snapshot_dir, MANIFEST_NAME + ".tmp")
    final = os.path.join(snapshot_dir, MANIFEST_NAME)
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f, ensure_ascii=False, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _cleanup_locks(repo_id: str) -> None:
    import glob

    cleanup_incomplete_blobs(repo_id)
    locks = os.path.join(hf_cache_root(), ".locks", "models--" + repo_id.replace("/", "--"))
    if os.path.isdir(locks):
        for path in glob.glob(os.path.join(locks, "*.lock")):
            _remove_quiet(path)


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
    _cleanup_locks(repo_id)

    if all(find_snapshot_file(repo_id, item["rfilename"]) for item in files):
        reporter.emit(model_type, "completed", 100, message=f"{repo_id} 已缓存，跳过下载")
        return {"success": True, "model": model_type}

    last_error: Optional[Exception] = None
    for idx, endpoint in enumerate(candidate_endpoints(), 1):
        if idx > 1:
            reporter.emit(
                model_type, "downloading", 0, message=f"主站不可用，正在切换镜像 {endpoint} ..."
            )
        else:
            reporter.emit(model_type, "downloading", 0, message=f"正在下载 {repo_id} ...")
        try:
            base = repo_dir = os.path.join(
                hf_cache_root(), "models--" + repo_id.replace("/", "--")
            )
            snapshot_dir = os.path.join(repo_dir, "snapshots", revision)
            refs_dir = os.path.join(repo_dir, "refs")
            os.makedirs(snapshot_dir, exist_ok=True)
            os.makedirs(refs_dir, exist_ok=True)
            with open(os.path.join(refs_dir, "main"), "w") as f:
                f.write(revision)

            total_files = len(files)
            for file_idx, item in enumerate(files, 1):
                rel = item["rfilename"]
                dest = os.path.join(snapshot_dir, rel.replace("/", os.sep))
                url = f"{endpoint}/{repo_id}/resolve/{revision}/{rel}"
                last_pct = -1

                def on_progress(current: int, total: int) -> None:
                    nonlocal last_pct
                    pct = int(current * 100 / total)
                    if pct != last_pct:
                        last_pct = pct
                        reporter.emit(
                            model_type,
                            "downloading",
                            pct,
                            message=f"[{file_idx}/{total_files}] {rel} {pct}%",
                        )

                download_file(
                    url,
                    dest,
                    transport,
                    expected_size=item.get("size"),
                    on_progress=on_progress,
                )

            write_completion_manifest(snapshot_dir, repo_id, revision, files)
            reporter.emit(model_type, "completed", 100, message=f"{repo_id} 下载完成")
            return {"success": True, "model": model_type, "endpoint": endpoint}
        except Exception as exc:
            last_error = exc

    message = str(last_error) if last_error else "模型下载失败"
    reporter.emit(model_type, "error", 0, message, message=f"{repo_id} 下载失败: {message}")
    return {"success": False, "model": model_type, "error": message}


def download_model(engine: str, transport=None, stream=None) -> Dict:
    """CLI entry: download the registered artifact for one engine id."""
    if engine not in QWEN3_ASR_MODELS:
        raise ValueError(f"unknown engine {engine!r}")
    spec = QWEN3_ASR_MODELS[engine]
    reporter = ProgressReporter(total=1, stream=stream)
    return download_repo(
        spec["repo_id"],
        engine,
        [{"rfilename": spec["filename"], "size": spec["size"], "sha256": spec["sha256"]}],
        spec["revision"],
        reporter,
        transport=transport,
    )
