"""Error taxonomy: typed engine errors with stable machine-readable codes.

Port of the reference's ``AppError`` (``utils/error.rs``): every error
carries a stable ``code`` (frontends switch on it), a high-level
``category`` (chooses presentation style), and serializes to the structured
shape ``{"code", "category", "message", "details"}`` where ``details`` is
always present (``null`` when empty) so consumers can test
``error.details === null`` rather than key existence.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class AppError(Exception):
    code = "OTHER_ERROR"
    category = "other"

    def __init__(self, message: str, details: Optional[Dict[str, Any]] = None):
        super().__init__(message)
        self.message = message
        self.details = details

    def to_dict(self) -> Dict[str, Any]:
        return {
            "code": self.code,
            "category": self.category,
            "message": self.message,
            "details": self.details,
        }


class AsrError(AppError):
    code = "ASR_ERROR"
    category = "asr"


class AudioError(AppError):
    code = "AUDIO_ERROR"
    category = "audio"


class DownloadError(AppError):
    code = "DOWNLOAD_ERROR"
    category = "network"


class IoError(AppError):
    code = "IO_ERROR"
    category = "system"


class SerdeError(AppError):
    code = "SERDE_ERROR"
    category = "system"


def structured(error: Exception) -> Dict[str, Any]:
    """Serialize any exception to the structured error shape."""
    if isinstance(error, AppError):
        return error.to_dict()
    if isinstance(error, (OSError, IOError)):
        return IoError(str(error)).to_dict()
    if isinstance(error, (ValueError, TypeError)):
        return SerdeError(str(error)).to_dict()
    return AppError(str(error)).to_dict()
