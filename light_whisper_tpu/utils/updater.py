"""Update checking: GitHub latest-release poll + semver compare + URL gate.

Port of the reference's updater (``commands/updater.rs``): fetch
``releases/latest``, compare versions numerically segment-by-segment (a
``v`` prefix is stripped; non-numeric segments compare as 0), and only
surface release notes when an update is actually available. The
``release page`` opener is host-allowlisted — the command surface accepts a
URL from the UI, so the backend pins https + github.com rather than trusting
the caller.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import List, Optional
from urllib.parse import urlparse

from light_whisper_tpu import __version__
from light_whisper_tpu.utils.errors import AppError, DownloadError

RELEASE_API = "https://api.github.com/repos/sypsyp97/light-whisper/releases/latest"
RELEASES_URL = "https://github.com/sypsyp97/light-whisper/releases"
ALLOWED_RELEASE_HOSTS = ("github.com", "www.github.com")
REQUEST_TIMEOUT_SECONDS = 15.0


@dataclasses.dataclass
class UpdateInfo:
    available: bool
    current_version: str
    latest_version: Optional[str]
    notes: Optional[str]
    published_at: Optional[str]
    release_url: Optional[str]


def normalize_version(version: str) -> str:
    return version.strip().lstrip("v")


def parse_version(version: str) -> List[int]:
    """Leading digits per dot segment; non-numeric (pre-release) parts
    compare as 0, so '1.2.3-rc1' never outranks '1.2.3'."""
    parts = []
    for segment in normalize_version(version).split("."):
        m = re.match(r"\d+", segment)
        parts.append(int(m.group()) if m else 0)
    return parts


def is_version_newer(candidate: str, current: str) -> bool:
    a, b = parse_version(candidate), parse_version(current)
    length = max(len(a), len(b))
    a += [0] * (length - len(a))
    b += [0] * (length - len(b))
    return a > b


def validate_release_url(url: str) -> None:
    parsed = urlparse(url)
    if parsed.scheme != "https":
        raise AppError(f"Release URL 仅支持 https，收到 scheme: {parsed.scheme}")
    if parsed.hostname not in ALLOWED_RELEASE_HOSTS:
        raise AppError(f"Release URL host 不在白名单内: {parsed.hostname}")


def check_app_update(transport=None, current_version: Optional[str] = None) -> UpdateInfo:
    current = current_version or __version__
    release = _fetch_latest_release(transport)
    latest = normalize_version(release.get("tag_name", ""))
    available = is_version_newer(latest, current)
    notes = release.get("body")
    return UpdateInfo(
        available=available,
        current_version=current,
        latest_version=latest or None,
        notes=notes if available and notes and notes.strip() else None,
        published_at=release.get("published_at"),
        release_url=release.get("html_url"),
    )


def _fetch_latest_release(transport=None) -> dict:
    if transport is not None:
        return transport.get_json(RELEASE_API)
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        RELEASE_API,
        headers={
            "User-Agent": f"light-whisper-tpu/{__version__}",
            "Accept": "application/vnd.github+json",
        },
    )
    try:
        with urllib.request.urlopen(req, timeout=REQUEST_TIMEOUT_SECONDS) as resp:
            return json.loads(resp.read().decode("utf-8", "replace"))
    except urllib.error.HTTPError as err:
        raise DownloadError(f"GitHub Release 检查失败: HTTP {err.code}") from err
    except OSError as err:
        raise DownloadError(f"请求 GitHub Release 失败: {err}") from err
