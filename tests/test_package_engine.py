"""Engine packaging: archive content, fingerprint, staged atomicity.

Mirrors the reference's ``scripts/test_build_engine_atomicity.py`` intent: a
failed build never leaves a partial archive at the destination.
"""

import hashlib
import os
import sys
import tarfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from package_engine import build_archive, sha256_file


@pytest.fixture
def fake_repo(tmp_path):
    pkg = tmp_path / "light_whisper_tpu"
    (pkg / "__pycache__").mkdir(parents=True)
    (pkg / "runtime").mkdir()
    (pkg / "__init__.py").write_text("x = 1\n")
    (pkg / "runtime" / "server.py").write_text("print('hi')\n")
    (pkg / "runtime" / "junk.pyc").write_bytes(b"\x00")
    (pkg / "__pycache__" / "c.pyc").write_bytes(b"\x00")
    (tmp_path / "pyproject.toml").write_text("[project]\nname='x'\n")
    (tmp_path / "tests").mkdir()
    (tmp_path / "tests" / "test_x.py").write_text("assert True\n")
    return tmp_path


def test_archive_content_and_fingerprint(fake_repo, tmp_path):
    out = str(tmp_path / "dist" / "engine.tar.xz")
    fingerprint = build_archive(out, source_root=str(fake_repo))
    assert os.path.isfile(out)
    assert fingerprint == sha256_file(out)
    assert open(out + ".version").read().strip() == fingerprint

    with tarfile.open(out) as tar:
        names = tar.getnames()
    assert "light_whisper_tpu/__init__.py" in names
    assert "light_whisper_tpu/runtime/server.py" in names
    assert "pyproject.toml" in names
    assert not any("pycache" in n or n.endswith(".pyc") for n in names)
    assert not any(n.startswith("tests") for n in names)


def test_failed_build_leaves_no_partial_output(fake_repo, tmp_path, monkeypatch):
    out_dir = tmp_path / "dist"
    out_dir.mkdir()
    out = str(out_dir / "engine.tar.xz")

    import package_engine

    def boom(path):
        raise RuntimeError("disk died mid-hash")

    monkeypatch.setattr(package_engine, "sha256_file", boom)
    with pytest.raises(RuntimeError):
        build_archive(out, source_root=str(fake_repo))
    assert not os.path.exists(out)
    assert [n for n in os.listdir(out_dir) if not n.startswith(".")] == []
    # staging residue cleaned up too
    assert not any(n.startswith(".engine-staging") for n in os.listdir(out_dir))


def test_rebuild_overwrites_atomically(fake_repo, tmp_path):
    out = str(tmp_path / "engine.tar.xz")
    first = build_archive(out, source_root=str(fake_repo))
    (fake_repo / "light_whisper_tpu" / "extra.py").write_text("y = 2\n")
    second = build_archive(out, source_root=str(fake_repo))
    assert first != second
    assert open(out + ".version").read().strip() == second
