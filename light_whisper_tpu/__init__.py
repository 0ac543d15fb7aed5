"""light_whisper_tpu — a TPU-native rebuild of the Light-Whisper local ASR engine.

The reference (sypsyp97/light-whisper) runs Qwen3-ASR Q8_0 GGUF models through a
C++ runtime (transcribe.cpp) plus an ONNX FireRedVAD, behind a line-delimited
JSON stdin/stdout server. This package re-implements that engine TPU-first:

- ``formats.gguf``      — GGUF container reader/writer (Q8_0 aware)
- ``audio``             — PCM decode, resampling, kaldi fbank + whisper mel in JAX
- ``models.vad``        — FireRedVAD as a JAX DFSMN classifier
- ``models.qwen3_asr``  — AuT audio encoder + Qwen3 decoder, greedy decode
- ``ops``               — Pallas kernels: int8 dequant matmul, flash attention
- ``runtime``           — the JSON line protocol server (same contract as
  ``/root/reference/src-tauri/resources/server_common.py``)
- ``serving``           — streaming sessions, batching scheduler
- ``parallel``          — device-mesh sharding for multi-chip inference/training
- ``download``          — HF model download with byte-range resume + manifests
- ``text``              — hot-word correction, stable-prefix smoothing
"""

__version__ = "0.1.0"
