"""Downloader protocol edge cases over a fake HTTP transport.

Mirrors the reference's offline regression strategy
(``test_download_models_regression.py``): resume, 416 reconciliation,
Content-Range validation, 200-after-Range restart, completion manifests.
"""

import io
import json
import os

import numpy as np
import pytest

from light_whisper_tpu.download import cache
from light_whisper_tpu.download.downloader import (
    HttpResponse,
    ProgressReporter,
    download_file,
    download_repo,
    write_completion_manifest,
)


class FakeTransport:
    """Serves one blob with configurable Range behavior."""

    def __init__(self, blob: bytes, mode: str = "range"):
        self.blob = blob
        self.mode = mode  # "range" | "ignore_range" | "lying_range"
        self.requests = []

    def head_size(self, url, timeout=30.0):
        return len(self.blob)

    def get(self, url, headers, timeout=60.0):
        self.requests.append(dict(headers))
        start = 0
        if "Range" in headers:
            start = int(headers["Range"].split("=")[1].rstrip("-"))
            if self.mode == "ignore_range":
                return HttpResponse(200, {"Content-Length": str(len(self.blob))}, iter([self.blob]))
            if start >= len(self.blob):
                return HttpResponse(
                    416, {"Content-Range": f"bytes */{len(self.blob)}"}, iter([b""])
                )
            end = len(self.blob) - 1
            headers_out = {
                "Content-Range": f"bytes {start}-{end}/{len(self.blob)}",
                "Content-Length": str(len(self.blob) - start),
            }
            if self.mode == "lying_range":
                headers_out["Content-Range"] = f"bytes {start + 1}-{end}/{len(self.blob)}"
            return HttpResponse(206, headers_out, iter([self.blob[start:]]))
        return HttpResponse(200, {"Content-Length": str(len(self.blob))}, iter([self.blob]))


@pytest.fixture
def blob():
    return bytes(np.random.default_rng(0).integers(0, 256, size=1_200_000, dtype=np.uint8))


def test_fresh_download(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    download_file("http://x/f", dest, FakeTransport(blob), expected_size=len(blob))
    assert open(dest, "rb").read() == blob
    assert not os.path.exists(dest + ".incomplete")


def test_resume_from_partial(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest + ".incomplete", "wb") as f:
        f.write(blob[:40_000])
    t = FakeTransport(blob)
    download_file("http://x/f", dest, t, expected_size=len(blob))
    assert open(dest, "rb").read() == blob
    assert t.requests[0].get("Range") == "bytes=40000-"


def test_416_with_complete_partial_finalizes(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest + ".incomplete", "wb") as f:
        f.write(blob)  # already fully downloaded
    download_file("http://x/f", dest, FakeTransport(blob), expected_size=len(blob))
    assert open(dest, "rb").read() == blob


def test_416_with_oversized_partial_restarts(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest + ".incomplete", "wb") as f:
        f.write(blob + b"extra-bytes")
    download_file("http://x/f", dest, FakeTransport(blob), expected_size=len(blob))
    assert open(dest, "rb").read() == blob


def test_server_ignoring_range_restarts_from_zero(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest + ".incomplete", "wb") as f:
        f.write(blob[:10_000])
    download_file("http://x/f", dest, FakeTransport(blob, mode="ignore_range"), expected_size=len(blob))
    assert open(dest, "rb").read() == blob  # no doubled prefix


def test_invalid_content_range_retries_then_fails(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest + ".incomplete", "wb") as f:
        f.write(blob[:10_000])
    t = FakeTransport(blob, mode="lying_range")
    # After dropping the partial the retry has no Range header → clean 200.
    download_file("http://x/f", dest, t, expected_size=len(blob))
    assert open(dest, "rb").read() == blob


def test_existing_complete_file_is_kept(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest, "wb") as f:
        f.write(blob)
    t = FakeTransport(blob)
    download_file("http://x/f", dest, t, expected_size=len(blob))
    assert t.requests == []  # no network traffic


def test_wrong_size_final_file_becomes_partial(tmp_path, blob):
    dest = str(tmp_path / "m.gguf")
    with open(dest, "wb") as f:
        f.write(blob[:30_000])
    t = FakeTransport(blob)
    download_file("http://x/f", dest, t, expected_size=len(blob))
    assert open(dest, "rb").read() == blob
    assert t.requests[0].get("Range") == "bytes=30000-"


def test_download_repo_end_to_end(tmp_path, blob, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
    import hashlib

    sha = hashlib.sha256(blob).hexdigest()
    out = io.StringIO()
    reporter = ProgressReporter(total=1, stream=out)
    result = download_repo(
        "acme/tiny-model",
        "tiny",
        [{"rfilename": "weights.gguf", "size": len(blob), "sha256": sha}],
        "rev123",
        reporter,
        transport=FakeTransport(blob),
    )
    assert result["success"], result

    # cache layout + readiness via both validation paths
    assert cache.is_repo_ready("acme/tiny-model")
    path = cache.find_snapshot_file("acme/tiny-model", "weights.gguf")
    assert path and open(path, "rb").read() == blob
    refs = tmp_path / "models--acme--tiny-model" / "refs" / "main"
    assert refs.read_text() == "rev123"

    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert lines[0]["stage"] == "downloading"
    assert lines[-1]["stage"] == "completed"
    assert lines[-1]["overall_progress"] == 100
    percents = [l["progress"] for l in lines if l["stage"] == "downloading"]
    assert percents[-1] == 100

    # re-running skips (manifest satisfied)
    out2 = io.StringIO()
    r2 = download_repo(
        "acme/tiny-model",
        "tiny",
        [{"rfilename": "weights.gguf", "size": len(blob), "sha256": sha}],
        "rev123",
        ProgressReporter(total=1, stream=out2),
        transport=FakeTransport(b"SHOULD NOT BE FETCHED"),
    )
    assert r2["success"]
    assert json.loads(out2.getvalue().splitlines()[0])["stage"] == "completed"


def test_manifest_rejects_corrupted_file(tmp_path, blob):
    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "w.gguf").write_bytes(blob)
    with pytest.raises(RuntimeError):
        write_completion_manifest(
            str(snap), "acme/x", "rev", [{"rfilename": "w.gguf", "size": len(blob) + 1}]
        )
    import hashlib

    with pytest.raises(RuntimeError):
        write_completion_manifest(
            str(snap),
            "acme/x",
            "rev",
            [{"rfilename": "w.gguf", "size": len(blob), "sha256": "0" * 64}],
        )


def test_download_repo_rejects_traversal_rfilenames(tmp_path, blob, monkeypatch):
    """ADVICE r1: rfilenames must not escape the snapshot dir (mirrors the
    read-side manifest validation)."""
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
    for bad in ("../../evil.bin", "/abs/path.bin", "a/../../b.bin", "a//b.bin"):
        out = io.StringIO()
        result = download_repo(
            "acme/tiny-model",
            "tiny",
            [{"rfilename": bad, "size": len(blob)}],
            "rev123",
            ProgressReporter(total=1, stream=out),
            transport=FakeTransport(blob),
        )
        assert not result["success"], bad
        assert "escaped" not in os.listdir(tmp_path), bad
    # nothing outside the cache root was created
    assert not (tmp_path.parent / "evil.bin").exists()
