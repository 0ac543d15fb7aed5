"""Compat shim: the generator moved into the package (bench + eval use it)."""

from light_whisper_tpu.eval.speechlike import SAMPLE_RATE, speechlike  # noqa: F401
