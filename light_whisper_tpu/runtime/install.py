"""Engine-archive installer: fingerprint gate, staged extraction, atomic swap.

Install-side counterpart of ``scripts/package_engine.py``, mirroring the
reference's bundled-engine lifecycle (``funasr_service.rs:348-663``):

- a build stamps the archive with a sha256 fingerprint; the installed engine
  directory carries a ``.version`` marker holding the fingerprint it was
  extracted from;
- on startup the runtime compares marker vs expected fingerprint and only
  re-extracts on mismatch (first launch or upgrade);
- extraction lands in a staging directory that is validated (non-empty,
  entry file present, marker written) before an atomic backup-and-rename
  swap; a failure at any point leaves the previous install untouched;
- progress callbacks are gated through an ``is_current`` predicate so a
  cancelled/superseded install can't emit stale status
  (``EngineProgressGate``, ``funasr_service.rs:217-235``).

Differences from the reference are deliberate: archives are tar.xz only (no
zip — we produce only one format), the entry sentinel is the packaged
Python tree rather than ``engine.exe``, and extraction refuses path-traversal
member names (the Rust tar crate sanitizes these implicitly; Python's
``tarfile`` needs the filter).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tarfile
import time
from dataclasses import dataclass
from typing import Callable, Optional

from light_whisper_tpu.utils.errors import AsrError

VERSION_MARKER = ".version"
ENTRY_SENTINEL = os.path.join("light_whisper_tpu", "__init__.py")
_PROGRESS_EVERY = 200


def file_fingerprint(path: str) -> str:
    """sha256 of a file, streamed (matches the packager's ``.version`` stamp)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 23)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def baked_fingerprint() -> Optional[str]:
    """Build-time stamped archive fingerprint, if this is a release build.

    ``scripts/release_gate.py build`` generates
    ``light_whisper_tpu/_build_stamp.py`` after verifying the archive — the
    analogue of the reference stamping
    ``LIGHT_WHISPER_ENGINE_ARCHIVE_FINGERPRINT`` into the binary at build
    time (``build.rs:18-51``). Dev builds have no stamp and return None.
    """
    try:
        from light_whisper_tpu._build_stamp import ENGINE_ARCHIVE_FINGERPRINT

        return ENGINE_ARCHIVE_FINGERPRINT or None
    except Exception:
        return None


def expected_fingerprint(archive_path: str) -> str:
    """Fingerprint an install should carry for this archive.

    A release build's baked stamp (see :func:`baked_fingerprint`) is
    authoritative: an archive that doesn't match it is the wrong archive for
    this build and must be refused (``build_support.rs:28-50`` semantics).
    Otherwise the packager's sidecar stamp (``<archive>.version``) is
    verified against the archive — a mismatch means a torn download or a
    stale sidecar, both of which must fail loudly rather than install
    silently. Without either, the archive hash itself is authoritative.
    """
    stamp_path = archive_path + VERSION_MARKER
    actual = file_fingerprint(archive_path)
    baked = baked_fingerprint()
    if baked is not None and baked != actual:
        raise AsrError(
            f"引擎归档与本构建不符: 构建标记 {baked[:12]}…, 实际 {actual[:12]}…"
        )
    if os.path.isfile(stamp_path):
        with open(stamp_path, "r", encoding="utf-8") as f:
            stamped = f.read().strip()
        if stamped and stamped != actual:
            raise AsrError(
                f"引擎归档指纹不匹配: 标记 {stamped[:12]}…, 实际 {actual[:12]}…"
            )
    return actual


def fingerprint_matches(installed: str, expected: str) -> bool:
    """Marker comparison, tolerant of the legacy ``<semver>+<sha>`` format.

    Reference: ``engine_install_fingerprint_matches``
    (``funasr_service.rs:356-363``) — old builds wrote ``version+fingerprint``
    markers; those still count as installed if the fingerprint half matches.
    """
    installed = installed.strip()
    if installed == expected:
        return True
    _, sep, suffix = installed.rpartition("+")
    return bool(sep) and suffix == expected


@dataclass
class InstalledEngine:
    """Result of :func:`ensure_installed`."""

    engine_dir: str
    fingerprint: str
    extracted: bool  # False when the existing install was reused


def installed_fingerprint(engine_dir: str) -> Optional[str]:
    marker = os.path.join(engine_dir, VERSION_MARKER)
    try:
        with open(marker, "r", encoding="utf-8") as f:
            return f.read().strip()
    except OSError:
        return None


def _safe_members(tar: tarfile.TarFile):
    """Yield members whose names stay inside the extraction root."""
    for member in tar:
        name = member.name
        if os.path.isabs(name) or name.startswith(("/", "\\")):
            raise AsrError(f"引擎归档包含非法路径: {name}")
        parts = name.replace("\\", "/").split("/")
        if ".." in parts:
            raise AsrError(f"引擎归档包含越界路径: {name}")
        if member.islnk() or member.issym():
            # The packager never emits links; anything claiming otherwise is
            # a crafted archive.
            raise AsrError(f"引擎归档包含链接条目: {name}")
        yield member


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _swap_in(engine_dir: str, staging_dir: str, backup_dir: str) -> None:
    """Promote staging → engine_dir; previous install survives any failure.

    Reference: ``replace_engine_dir`` (``funasr_service.rs:644-663``).
    """
    if os.path.exists(backup_dir):
        shutil.rmtree(backup_dir, ignore_errors=True)
    had_previous = os.path.exists(engine_dir)
    if had_previous:
        os.rename(engine_dir, backup_dir)
    try:
        os.rename(staging_dir, engine_dir)
    except OSError as err:
        if had_previous:
            try:
                os.rename(backup_dir, engine_dir)
            except OSError as restore_err:
                raise AsrError(
                    f"替换引擎目录失败: {err}; 恢复旧引擎也失败: {restore_err}"
                    f"（备份保留在 {backup_dir}）"
                ) from err
        raise AsrError(f"替换引擎目录失败: {err}") from err
    shutil.rmtree(backup_dir, ignore_errors=True)


def ensure_installed(
    archive_path: str,
    engine_dir: str,
    progress: Optional[Callable[[int, bool], None]] = None,
    is_current: Callable[[], bool] = lambda: True,
) -> InstalledEngine:
    """Make ``engine_dir`` hold the engine from ``archive_path``.

    No-op (fast path) when the installed ``.version`` marker already matches
    the archive's fingerprint. Otherwise extracts through a staging directory
    and atomically swaps it in. ``progress(entries_done, final)`` fires every
    ~200 entries, suppressed once ``is_current()`` turns false (superseded
    install), matching the reference's generation-gated status events.
    """
    if not os.path.isfile(archive_path):
        raise AsrError(f"引擎归档不存在: {archive_path}")
    expected = expected_fingerprint(archive_path)

    marker = installed_fingerprint(engine_dir)
    if marker is not None and fingerprint_matches(marker, expected) and os.path.isfile(
        os.path.join(engine_dir, ENTRY_SENTINEL)
    ):
        return InstalledEngine(engine_dir, expected, extracted=False)

    parent = os.path.dirname(os.path.abspath(engine_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    stamp = time.time_ns()
    staging_dir = os.path.join(parent, f".engine.staging.{stamp}")
    backup_dir = os.path.join(parent, f".engine.backup.{stamp}")
    if os.path.exists(staging_dir):
        shutil.rmtree(staging_dir, ignore_errors=True)
    os.makedirs(staging_dir)

    def emit(done: int, final: bool) -> None:
        if progress is not None and is_current():
            progress(done, final)

    try:
        entries = 0
        with tarfile.open(archive_path, "r:xz") as tar:
            if hasattr(tarfile, "data_filter"):
                # Second line of defense behind _safe_members (and the 3.14
                # default): strips setuid bits, rejects device nodes.
                tar.extraction_filter = tarfile.data_filter
            for member in _safe_members(tar):
                tar.extract(member, staging_dir)
                entries += 1
                if entries % _PROGRESS_EVERY == 0:
                    emit(entries, False)
        if entries == 0:
            raise AsrError("引擎归档为空")
        if not os.path.isfile(os.path.join(staging_dir, ENTRY_SENTINEL)):
            raise AsrError(f"引擎归档缺少 {ENTRY_SENTINEL}")
        # Marker goes into staging first; only a fully validated tree is ever
        # visible at engine_dir with a marker claiming completeness.
        _atomic_write(
            os.path.join(staging_dir, VERSION_MARKER), expected.encode() + b"\n"
        )
    except BaseException:
        shutil.rmtree(staging_dir, ignore_errors=True)
        raise

    if not is_current():
        # Superseded mid-extract (engine switch / shutdown): abandon quietly,
        # the current owner will run its own install.
        shutil.rmtree(staging_dir, ignore_errors=True)
        raise AsrError("引擎安装已被取消")

    _swap_in(engine_dir, staging_dir, backup_dir)
    emit(entries, True)
    return InstalledEngine(engine_dir, expected, extracted=True)
