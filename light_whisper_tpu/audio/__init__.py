from light_whisper_tpu.audio.pcm import (
    decode_inline_audio,
    read_audio_file_mono_f32,
    resample_linear,
    wav_duration_seconds,
)

__all__ = [
    "decode_inline_audio",
    "read_audio_file_mono_f32",
    "resample_linear",
    "wav_duration_seconds",
]
