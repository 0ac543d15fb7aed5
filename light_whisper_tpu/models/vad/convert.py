"""Convert a FireRedVAD ONNX export (+ CMVN json) into this framework's GGUF.

The reference ships ``fireredvad_vad.onnx`` + ``fireredvad_cmvn.json`` and
runs them through onnxruntime (``firered_vad.py:51-85``). The TPU engine
instead stores everything — DFSMN weights, fused memory-block kernels' raw
taps, and CMVN statistics — in one GGUF artifact loaded by
``models.vad.api``.

Usage:
    python -m light_whisper_tpu.models.vad.convert \
        --onnx fireredvad_vad.onnx --cmvn fireredvad_cmvn.json \
        --out fireredvad.gguf
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from light_whisper_tpu.formats import gguf
from light_whisper_tpu.models.vad.onnx_import import (
    NUM_BLOCKS,
    extract_fireredvad_params,
    read_onnx_graph,
)

ARCHITECTURE = "fireredvad-dfsmn"


def convert(onnx_path: str, cmvn_path: str, out_path: str) -> None:
    graph = read_onnx_graph(onnx_path)
    params = extract_fireredvad_params(graph)

    cmvn = json.loads(open(cmvn_path, "r", encoding="utf-8").read())
    mean = np.asarray(cmvn["mean"], dtype=np.float32)
    inv_std = np.asarray(cmvn["inverse_std"], dtype=np.float32)
    if mean.shape != (80,) or inv_std.shape != (80,):
        raise ValueError("CMVN must provide 80-dim mean and inverse_std")

    tensors = {name: arr for name, arr in params.items()}
    tensors["cmvn.mean"] = mean
    tensors["cmvn.inv_std"] = inv_std

    metadata = {
        "general.architecture": ARCHITECTURE,
        "general.name": "FireRedVAD",
        "general.license": "Apache-2.0",
        "general.source": "FireRedTeam/FireRedVAD",
        f"{ARCHITECTURE}.num_blocks": NUM_BLOCKS,
        f"{ARCHITECTURE}.feat_dim": 80,
        f"{ARCHITECTURE}.hidden": 128,
        f"{ARCHITECTURE}.proj": 256,
        f"{ARCHITECTURE}.filter_taps": 20,
        f"{ARCHITECTURE}.sample_rate": 16000,
        f"{ARCHITECTURE}.frame_shift_ms": 10,
        f"{ARCHITECTURE}.frame_length_ms": 25,
    }
    gguf.write_gguf(out_path, metadata, tensors)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--onnx", required=True)
    parser.add_argument("--cmvn", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    convert(args.onnx, args.cmvn, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
