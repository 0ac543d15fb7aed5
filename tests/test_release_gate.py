"""Release-gate policy: bad archives must refuse release, stamps must bind.

Mirror of the reference's ``tests/engine_archive_policy.rs:37-107`` (release
builds reject missing/empty engine archives; the binary carries the archive
fingerprint baked at build time) for the TPU build's release pipeline
(``scripts/release_gate.py`` + ``runtime/install.py:baked_fingerprint``).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import release_gate


@pytest.fixture(autouse=True)
def isolated_stamp(tmp_path, monkeypatch):
    """Point the gate's stamp module into tmp so tests never touch the repo."""
    stamp = tmp_path / "_build_stamp.py"
    monkeypatch.setattr(release_gate, "STAMP_MODULE", str(stamp))
    yield stamp


def _make_archive(tmp_path, payload=b"\xfd7zXZ\x00payload-bytes"):
    archive = tmp_path / "engine.tar.xz"
    archive.write_bytes(payload)
    from scripts.package_engine import sha256_file

    (tmp_path / "engine.tar.xz.version").write_text(sha256_file(str(archive)) + "\n")
    return str(archive)


def test_missing_archive_refuses(tmp_path):
    with pytest.raises(SystemExit):
        release_gate.verify_archive(str(tmp_path / "nope.tar.xz"))


def test_empty_archive_refuses(tmp_path):
    archive = tmp_path / "engine.tar.xz"
    archive.write_bytes(b"")
    with pytest.raises(SystemExit):
        release_gate.verify_archive(str(archive))


def test_bad_magic_refuses(tmp_path):
    archive = tmp_path / "engine.tar.xz"
    archive.write_bytes(b"not-an-xz-archive")
    with pytest.raises(SystemExit):
        release_gate.verify_archive(str(archive))


def test_sidecar_mismatch_refuses(tmp_path):
    archive = _make_archive(tmp_path)
    (tmp_path / "engine.tar.xz.version").write_text("0" * 64 + "\n")
    with pytest.raises(SystemExit):
        release_gate.verify_archive(archive)


def test_stamp_roundtrip_and_check(tmp_path):
    archive = _make_archive(tmp_path)
    fingerprint = release_gate.verify_archive(archive)
    release_gate.write_stamp(fingerprint, archive)
    assert release_gate.read_stamp() == fingerprint

    class Args:
        out = archive

    assert release_gate.cmd_check(Args()) == 0


def test_check_without_stamp_refuses(tmp_path):
    archive = _make_archive(tmp_path)

    class Args:
        out = archive

    with pytest.raises(SystemExit):
        release_gate.cmd_check(Args())


def test_stale_stamp_refuses(tmp_path):
    archive = _make_archive(tmp_path)
    release_gate.write_stamp("f" * 64, archive)

    class Args:
        out = archive

    with pytest.raises(SystemExit):
        release_gate.cmd_check(Args())


def test_install_refuses_archive_not_matching_baked_stamp(tmp_path, monkeypatch):
    """A release build's install path must reject archives the build wasn't
    stamped for (build_support.rs:28-50 semantics)."""
    from light_whisper_tpu.runtime import install
    from light_whisper_tpu.utils.errors import AsrError

    archive = tmp_path / "engine.tar.xz"
    archive.write_bytes(b"\xfd7zXZ\x00different-bytes")
    monkeypatch.setattr(install, "baked_fingerprint", lambda: "a" * 64)
    with pytest.raises(AsrError):
        install.expected_fingerprint(str(archive))
