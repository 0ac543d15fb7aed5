"""Tones, error taxonomy, and updater version comparison."""

import io
import wave

import numpy as np
import pytest

from light_whisper_tpu.audio.tones import (
    assistant_start_tone,
    generate_tone,
    start_tone,
    stop_tone,
)
from light_whisper_tpu.utils.errors import (
    AppError,
    AsrError,
    DownloadError,
    structured,
)


def _decode(wav_bytes):
    with wave.open(io.BytesIO(wav_bytes), "rb") as r:
        assert r.getframerate() == 22050
        assert r.getnchannels() == 1
        return np.frombuffer(r.readframes(r.getnframes()), dtype="<i2")


def test_start_tone_shape_and_sweep():
    samples = _decode(start_tone())
    assert len(samples) == 2205  # 100 ms at 22.05 kHz
    # half-sine envelope: quiet edges, loud middle
    assert abs(int(samples[0])) < 500
    assert np.abs(samples[900:1300]).max() > 4000
    # ascending sweep: zero-crossing rate grows
    first = np.count_nonzero(np.diff(np.signbit(samples[:735])))
    last = np.count_nonzero(np.diff(np.signbit(samples[-735:])))
    assert last > first


def test_stop_tone_descends():
    samples = _decode(stop_tone())
    first = np.count_nonzero(np.diff(np.signbit(samples[:735])))
    last = np.count_nonzero(np.diff(np.signbit(samples[-735:])))
    assert last < first


def test_double_tone_has_gap():
    samples = _decode(assistant_start_tone())
    tone_n = int(22050 * 0.08)
    gap_n = int(22050 * 0.03)
    assert len(samples) == tone_n * 2 + gap_n
    gap = samples[tone_n : tone_n + gap_n]
    assert np.abs(gap).max() == 0


def test_tone_determinism_and_cache():
    assert start_tone() is start_tone()
    assert generate_tone(880.0, 100, True) == generate_tone(880.0, 100, True)


def test_error_taxonomy():
    err = AsrError("模型未加载")
    assert err.to_dict() == {
        "code": "ASR_ERROR",
        "category": "asr",
        "message": "模型未加载",
        "details": None,
    }
    assert structured(DownloadError("timeout"))["category"] == "network"
    assert structured(OSError("disk"))["code"] == "IO_ERROR"
    assert structured(ValueError("bad json"))["code"] == "SERDE_ERROR"
    assert structured(RuntimeError("x"))["code"] == "OTHER_ERROR"
    d = AppError("m", details={"status": 404}).to_dict()
    assert d["details"] == {"status": 404}


# -- updater -----------------------------------------------------------------


def test_version_comparison():
    from light_whisper_tpu.utils.updater import is_version_newer, parse_version

    assert is_version_newer("v1.5.6", "1.5.5")
    assert is_version_newer("2.0", "1.9.9")
    assert not is_version_newer("1.5.5", "1.5.5")
    assert not is_version_newer("1.5.4", "1.5.5")
    assert is_version_newer("1.5.5.1", "1.5.5")
    # pre-release suffixes compare as the base segment (ADVICE r1): an rc
    # must not outrank its final, nor later patch releases.
    assert parse_version("v1.2.3-rc1") == [1, 2, 3]
    assert not is_version_newer("1.2.3-rc1", "1.2.3")
    assert is_version_newer("1.2.4", "1.2.3-rc9")
    assert parse_version("1.2.beta") == [1, 2, 0]


def test_release_url_allowlist():
    from light_whisper_tpu.utils.errors import AppError
    from light_whisper_tpu.utils.updater import validate_release_url

    validate_release_url("https://github.com/sypsyp97/light-whisper/releases")
    for bad in (
        "http://github.com/x",
        "https://evil.example/releases",
        "https://github.com.evil.example/x",
    ):
        with pytest.raises(AppError):
            validate_release_url(bad)


def test_check_update_with_fake_transport():
    from light_whisper_tpu.utils.updater import check_app_update

    class T:
        def get_json(self, url):
            return {
                "tag_name": "v9.9.9",
                "body": "big release",
                "published_at": "2026-01-01T00:00:00Z",
                "html_url": "https://github.com/x/releases/v9.9.9",
            }

    info = check_app_update(transport=T(), current_version="1.0.0")
    assert info.available and info.latest_version == "9.9.9"
    assert info.notes == "big release"

    class Same(T):
        def get_json(self, url):
            return {"tag_name": "v1.0.0", "body": "notes", "html_url": "u"}

    info2 = check_app_update(transport=Same(), current_version="1.0.0")
    assert not info2.available and info2.notes is None
