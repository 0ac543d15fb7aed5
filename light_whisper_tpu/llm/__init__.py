from light_whisper_tpu.llm.provider import (
    ApiFormat,
    LlmEndpoint,
    ReasoningMode,
    endpoint_for_config,
)
from light_whisper_tpu.llm.client import LlmRequestOptions, send_llm_request
from light_whisper_tpu.llm.polish import polish_text

__all__ = [
    "ApiFormat",
    "LlmEndpoint",
    "LlmRequestOptions",
    "ReasoningMode",
    "endpoint_for_config",
    "polish_text",
    "send_llm_request",
]
