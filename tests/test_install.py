"""Engine installer: fingerprint gate, staged swap, failure isolation.

Mirrors the reference's bundled-engine contract
(``funasr_service.rs:348-663``): extract-once per fingerprint, legacy marker
tolerance, previous install preserved through any failed upgrade, stale
progress suppression after cancellation.
"""

import io
import os
import tarfile

import pytest

from light_whisper_tpu.runtime import install
from light_whisper_tpu.utils.errors import AsrError
from scripts.package_engine import build_archive


@pytest.fixture(autouse=True)
def _dev_build(monkeypatch):
    """Force dev-build semantics regardless of working-tree state.

    ``scripts/release_gate.py build`` writes a baked stamp module
    (``light_whisper_tpu/_build_stamp.py``, gitignored) that makes every
    OTHER archive refuse to install — correct for a release binary, and
    exactly what running the release gate locally leaves behind. These tests
    exercise the dev contract; the release-stamp refusal has its own test.
    """
    monkeypatch.setattr(install, "baked_fingerprint", lambda: None)


def _make_archive(tmp_path, name="engine.tar.xz", files=None):
    """A minimal valid engine archive + .version sidecar."""
    src = tmp_path / "src"
    (src / "light_whisper_tpu").mkdir(parents=True, exist_ok=True)
    (src / "light_whisper_tpu" / "__init__.py").write_text("# engine\n")
    (src / "pyproject.toml").write_text("[project]\nname='x'\n")
    for rel, content in (files or {}).items():
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    out = tmp_path / name
    fingerprint = build_archive(str(out), source_root=str(src))
    return str(out), fingerprint


def test_install_roundtrip_and_reuse(tmp_path):
    archive, fingerprint = _make_archive(tmp_path)
    engine_dir = tmp_path / "install" / "engine"

    first = install.ensure_installed(archive, str(engine_dir))
    assert first.extracted
    assert first.fingerprint == fingerprint
    assert (engine_dir / "light_whisper_tpu" / "__init__.py").is_file()
    assert install.installed_fingerprint(str(engine_dir)) == fingerprint

    again = install.ensure_installed(archive, str(engine_dir))
    assert not again.extracted  # marker match → no re-extract


def test_upgrade_replaces_and_downgrade_detected(tmp_path):
    archive1, fp1 = _make_archive(tmp_path, "v1.tar.xz", {"light_whisper_tpu/a.py": "A=1\n"})
    archive2, fp2 = _make_archive(tmp_path, "v2.tar.xz", {"light_whisper_tpu/a.py": "A=2\n"})
    assert fp1 != fp2
    engine_dir = tmp_path / "engine"

    install.ensure_installed(archive1, str(engine_dir))
    out = install.ensure_installed(archive2, str(engine_dir))
    assert out.extracted
    assert (engine_dir / "light_whisper_tpu" / "a.py").read_text() == "A=2\n"
    # no staging/backup residue
    residue = [p for p in os.listdir(tmp_path) if ".engine." in p]
    assert residue == []


def test_legacy_plus_marker_counts_as_installed(tmp_path):
    archive, fingerprint = _make_archive(tmp_path)
    engine_dir = tmp_path / "engine"
    install.ensure_installed(archive, str(engine_dir))
    # Old builds wrote "<version>+<fingerprint>" — still a match.
    (engine_dir / install.VERSION_MARKER).write_text(f"1.5.5+{fingerprint}\n")
    assert not install.ensure_installed(archive, str(engine_dir)).extracted
    assert install.fingerprint_matches(f"0.9+{fingerprint}", fingerprint)
    assert not install.fingerprint_matches("0.9+deadbeef", fingerprint)


def test_corrupt_archive_preserves_previous_install(tmp_path):
    archive, _ = _make_archive(tmp_path, files={"light_whisper_tpu/a.py": "A=1\n"})
    engine_dir = tmp_path / "engine"
    install.ensure_installed(archive, str(engine_dir))

    bad = tmp_path / "bad.tar.xz"
    bad.write_bytes(b"not an xz archive at all")
    with pytest.raises(Exception):
        install.ensure_installed(str(bad), str(engine_dir))
    # previous install untouched and still valid
    assert (engine_dir / "light_whisper_tpu" / "a.py").read_text() == "A=1\n"
    residue = [p for p in os.listdir(tmp_path) if ".engine." in p]
    assert residue == []


def test_sidecar_mismatch_refuses_install(tmp_path):
    archive, _ = _make_archive(tmp_path)
    with open(archive + install.VERSION_MARKER, "w") as f:
        f.write("0" * 64 + "\n")
    with pytest.raises(AsrError, match="指纹不匹配"):
        install.ensure_installed(archive, str(tmp_path / "engine"))


def test_archive_missing_entry_sentinel_rejected(tmp_path):
    out = tmp_path / "empty.tar.xz"
    with tarfile.open(out, "w:xz") as tar:
        data = b"hello"
        info = tarfile.TarInfo("README.md")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    engine_dir = tmp_path / "engine"
    with pytest.raises(AsrError, match="缺少"):
        install.ensure_installed(str(out), str(engine_dir))
    assert not engine_dir.exists()


def test_traversal_member_rejected(tmp_path):
    out = tmp_path / "evil.tar.xz"
    with tarfile.open(out, "w:xz") as tar:
        data = b"evil"
        info = tarfile.TarInfo("../outside.py")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with pytest.raises(AsrError, match="越界"):
        install.ensure_installed(str(out), str(tmp_path / "engine"))
    assert not (tmp_path / "outside.py").exists()


def test_symlink_member_rejected(tmp_path):
    out = tmp_path / "link.tar.xz"
    with tarfile.open(out, "w:xz") as tar:
        info = tarfile.TarInfo("light_whisper_tpu/__init__.py")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tar.addfile(info)
    with pytest.raises(AsrError, match="链接"):
        install.ensure_installed(str(out), str(tmp_path / "engine"))


def test_cancelled_install_leaves_no_trace_and_suppresses_progress(tmp_path):
    many = {f"light_whisper_tpu/m{i}.py": f"V={i}\n" for i in range(300)}
    archive, _ = _make_archive(tmp_path, files=many)
    engine_dir = tmp_path / "engine"
    events = []
    with pytest.raises(AsrError, match="取消"):
        install.ensure_installed(
            archive,
            str(engine_dir),
            progress=lambda done, final: events.append((done, final)),
            is_current=lambda: False,
        )
    assert events == []  # stale progress suppressed (EngineProgressGate parity)
    assert not engine_dir.exists()
    residue = [p for p in os.listdir(tmp_path) if ".engine." in p]
    assert residue == []


def test_progress_fires_during_real_install(tmp_path):
    many = {f"light_whisper_tpu/m{i}.py": f"V={i}\n" for i in range(450)}
    archive, _ = _make_archive(tmp_path, files=many)
    events = []
    install.ensure_installed(
        archive,
        str(tmp_path / "engine"),
        progress=lambda done, final: events.append((done, final)),
    )
    assert events, "expected periodic progress"
    assert events[-1][1] is True  # final event
    assert [e for e in events if not e[1]], "expected interim events every ~200 entries"


def test_missing_archive_is_typed_error(tmp_path):
    with pytest.raises(AsrError, match="不存在"):
        install.ensure_installed(str(tmp_path / "nope.tar.xz"), str(tmp_path / "e"))


def test_cli_install_roundtrip(tmp_path, capsys):
    import json

    from light_whisper_tpu.runtime.engine_cli import main

    archive, fingerprint = _make_archive(tmp_path)
    dest = tmp_path / "cli-engine"
    main(["install", "--archive", archive, "--dest", str(dest)])
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert lines[-1]["status"] == "installed"
    assert lines[-1]["fingerprint"] == fingerprint
    assert lines[-1]["extracted"] is True
    assert (dest / "light_whisper_tpu" / "__init__.py").is_file()


def test_release_stamp_gates_archives(tmp_path, monkeypatch):
    """Release-build semantics (build.rs:18-51 / build_support.rs:28-50):
    the baked fingerprint is authoritative — the stamped archive installs,
    any other archive is refused before extraction."""
    archive, fingerprint = _make_archive(tmp_path)
    other, _ = _make_archive(tmp_path, name="other.tar.xz", files={"x.py": "A=1\n"})

    monkeypatch.setattr(install, "baked_fingerprint", lambda: fingerprint)
    result = install.ensure_installed(archive, str(tmp_path / "engine"))
    assert result.fingerprint == fingerprint

    with pytest.raises(AsrError):
        install.ensure_installed(other, str(tmp_path / "engine2"))
    assert not (tmp_path / "engine2").exists()
