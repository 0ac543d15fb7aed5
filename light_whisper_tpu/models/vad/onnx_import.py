"""ONNX graph reader + FireRedVAD weight extraction.

Parses an ONNX ModelProto with the minimal wire reader (no onnx dependency)
and lifts the FireRedVAD DFSMN graph into a structured parameter dict. The
expected topology (validated here, discovered from the reference's bundled
``fireredvad_vad.onnx``) is:

    feat [1,T,80]
      → fc1: Linear(80→256)+ReLU → fc2: Linear(256→128)+ReLU
      → fsmn1 memory block (depthwise lookback k=20 over t-19..t and
        lookahead k=20 over t+1..t+20, both added to the identity)
      → 7 × { fc1: Linear(128→256)+ReLU; fc2: Linear(256→128, no bias);
              memory block; residual add with previous block output }
      → dnn: Linear(128→256)+ReLU → out: Linear(256→1)+bias → Sigmoid

The extraction is driven by tensor names/shapes, not node order, so benign
exporter reshuffles don't break it; structural mismatches raise.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from light_whisper_tpu.formats.protobuf_wire import WIRE_LEN, iter_fields

# Field numbers from onnx.proto
_MODEL_GRAPH = 7
_GRAPH_NODE = 1
_GRAPH_INITIALIZER = 5
_GRAPH_INPUT = 11
_GRAPH_OUTPUT = 12
_NODE_INPUT = 1
_NODE_OUTPUT = 2
_NODE_OP_TYPE = 4
_NODE_ATTRIBUTE = 5
_ATTR_NAME = 1
_ATTR_I = 3
_ATTR_S = 4
_ATTR_INTS = 8
_TENSOR_DIMS = 1
_TENSOR_DATA_TYPE = 2
_TENSOR_INT64_DATA = 7
_TENSOR_NAME = 8
_TENSOR_RAW_DATA = 9
_TENSOR_FLOAT_DATA = 4

_ONNX_DTYPES = {
    1: np.dtype("<f4"),
    6: np.dtype("<i4"),
    7: np.dtype("<i8"),
    11: np.dtype("<f8"),
}


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, Any]


@dataclasses.dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    input_names: List[str]
    output_names: List[str]


def _parse_tensor(data: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype_id = 1
    name = ""
    raw: Optional[bytes] = None
    i64: List[int] = []
    f32: List[bytes] = []
    for field, wire, value in iter_fields(data):
        if field == _TENSOR_DIMS:
            dims.append(int(value))
        elif field == _TENSOR_DATA_TYPE:
            dtype_id = int(value)
        elif field == _TENSOR_NAME:
            name = value.decode("utf-8")
        elif field == _TENSOR_RAW_DATA:
            raw = value
        elif field == _TENSOR_INT64_DATA:
            i64.append(int(value))
        elif field == _TENSOR_FLOAT_DATA:
            f32.append(value)
    shape = tuple(dims) if dims else (-1,)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=_ONNX_DTYPES[dtype_id]).reshape(shape)
    elif i64:
        arr = np.array(i64, dtype=np.int64).reshape(shape)
    elif f32:
        arr = np.frombuffer(b"".join(f32), dtype="<f4").reshape(shape)
    else:
        arr = np.zeros(shape if dims else (0,), dtype=_ONNX_DTYPES.get(dtype_id, np.float32))
    return name, arr


def _parse_node(data: bytes) -> OnnxNode:
    inputs: List[str] = []
    outputs: List[str] = []
    op_type = ""
    attrs: Dict[str, Any] = {}
    for field, wire, value in iter_fields(data):
        if field == _NODE_INPUT:
            inputs.append(value.decode("utf-8"))
        elif field == _NODE_OUTPUT:
            outputs.append(value.decode("utf-8"))
        elif field == _NODE_OP_TYPE:
            op_type = value.decode("utf-8")
        elif field == _NODE_ATTRIBUTE:
            name = ""
            ints: List[int] = []
            ival = None
            sval = None
            for afield, awire, avalue in iter_fields(value):
                if afield == _ATTR_NAME:
                    name = avalue.decode("utf-8")
                elif afield == _ATTR_INTS:
                    ints.append(int(avalue))
                elif afield == _ATTR_I:
                    ival = int(avalue)
                elif afield == _ATTR_S:
                    sval = avalue
            attrs[name] = ints if ints else (ival if ival is not None else sval)
    return OnnxNode(op_type, inputs, outputs, attrs)


def _value_info_name(data: bytes) -> str:
    for field, wire, value in iter_fields(data):
        if field == 1 and wire == WIRE_LEN:
            return value.decode("utf-8")
    return ""


def read_onnx_graph(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        blob = f.read()
    graph_blob = None
    for field, wire, value in iter_fields(blob):
        if field == _MODEL_GRAPH and wire == WIRE_LEN:
            graph_blob = value
    if graph_blob is None:
        raise ValueError(f"{path}: no graph found (not an ONNX model?)")

    nodes: List[OnnxNode] = []
    initializers: Dict[str, np.ndarray] = {}
    input_names: List[str] = []
    output_names: List[str] = []
    for field, wire, value in iter_fields(graph_blob):
        if field == _GRAPH_NODE:
            nodes.append(_parse_node(value))
        elif field == _GRAPH_INITIALIZER:
            name, arr = _parse_tensor(value)
            initializers[name] = arr
        elif field == _GRAPH_INPUT:
            input_names.append(_value_info_name(value))
        elif field == _GRAPH_OUTPUT:
            output_names.append(_value_info_name(value))
    return OnnxGraph(nodes, initializers, input_names, output_names)


# ---------------------------------------------------------------------------
# FireRedVAD-specific extraction
# ---------------------------------------------------------------------------

NUM_BLOCKS = 7
HIDDEN = 128
PROJ = 256
FILTER_TAPS = 20
FEAT_DIM = 80


def extract_fireredvad_params(graph: OnnxGraph) -> Dict[str, np.ndarray]:
    """Lift DFSMN weights from the parsed graph into a flat dict.

    Linear weights are returned in ``(in, out)`` orientation ready for
    ``x @ w`` (the ONNX export already stores MatMul weights that way);
    memory-block filters as ``(channels, taps)``.
    """
    init = graph.initializers

    def matmul_weight_for(consumer_output_prefix: str, shape: Tuple[int, int]) -> np.ndarray:
        for node in graph.nodes:
            if node.op_type == "MatMul" and node.outputs and node.outputs[0].startswith(
                consumer_output_prefix
            ):
                w = init[node.inputs[1]]
                if w.shape != shape:
                    raise ValueError(
                        f"{consumer_output_prefix}: weight shape {w.shape} != {shape}"
                    )
                return w.astype(np.float32)
        raise ValueError(f"no MatMul feeding {consumer_output_prefix!r}")

    def conv_filter(name: str) -> np.ndarray:
        w = init[name]
        if w.shape != (HIDDEN, 1, FILTER_TAPS):
            raise ValueError(f"{name}: filter shape {w.shape}")
        return w[:, 0, :].astype(np.float32)

    params: Dict[str, np.ndarray] = {
        "fc1.w": matmul_weight_for("/model/dfsmn/fc1/", (FEAT_DIM, PROJ)),
        "fc1.b": init["model.dfsmn.fc1.0.bias"].astype(np.float32),
        "fc2.w": matmul_weight_for("/model/dfsmn/fc2/", (PROJ, HIDDEN)),
        "fc2.b": init["model.dfsmn.fc2.0.bias"].astype(np.float32),
        "fsmn1.back": conv_filter("model.dfsmn.fsmn1.lookback_filter.weight"),
        "fsmn1.ahead": conv_filter("model.dfsmn.fsmn1.lookahead_filter.weight"),
        "dnn.w": matmul_weight_for("/model/dfsmn/dnns/dnns.0/", (HIDDEN, PROJ)),
        "dnn.b": init["model.dfsmn.dnns.0.bias"].astype(np.float32),
        "out.w": matmul_weight_for("/model/out/", (PROJ, 1)),
        "out.b": init["model.out.bias"].astype(np.float32),
    }
    for i in range(NUM_BLOCKS):
        params[f"blocks.{i}.fc1.w"] = matmul_weight_for(
            f"/model/dfsmn/fsmns.{i}/fc1/", (HIDDEN, PROJ)
        )
        params[f"blocks.{i}.fc1.b"] = init[f"model.dfsmn.fsmns.{i}.fc1.0.bias"].astype(np.float32)
        params[f"blocks.{i}.fc2.w"] = matmul_weight_for(
            f"/model/dfsmn/fsmns.{i}/fc2/", (PROJ, HIDDEN)
        )
        params[f"blocks.{i}.back"] = conv_filter(
            f"model.dfsmn.fsmns.{i}.fsmn.lookback_filter.weight"
        )
        params[f"blocks.{i}.ahead"] = conv_filter(
            f"model.dfsmn.fsmns.{i}.fsmn.lookahead_filter.weight"
        )

    # Sanity-check the structural assumptions baked into the JAX forward:
    # conv pads of 19 with slices selecting past/future windows, sigmoid head.
    convs = [n for n in graph.nodes if n.op_type == "Conv"]
    if len(convs) != 2 * (1 + NUM_BLOCKS):
        raise ValueError(f"expected {2 * (1 + NUM_BLOCKS)} convs, got {len(convs)}")
    for conv in convs:
        if conv.attrs.get("group") != [HIDDEN] and conv.attrs.get("group") != HIDDEN:
            raise ValueError(f"conv {conv.inputs[1]} is not depthwise: {conv.attrs}")
        pads = conv.attrs.get("pads")
        if pads != [FILTER_TAPS - 1, FILTER_TAPS - 1]:
            raise ValueError(f"conv {conv.inputs[1]} pads {pads}")
    if not any(n.op_type == "Sigmoid" for n in graph.nodes):
        raise ValueError("no sigmoid output head")
    return params
