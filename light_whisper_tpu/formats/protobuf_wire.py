"""Minimal protobuf wire-format reader.

Used to parse ONNX model files (the reference bundles FireRedVAD as a 2.4 MB
ONNX export, ``firered_vad.py:81-85``) without depending on the ``onnx``
package or generated schemas: the importer knows the handful of field numbers
it needs from the ONNX .proto definitions.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple, Union

Field = Tuple[int, int, Union[int, bytes]]

WIRE_VARINT = 0
WIRE_I64 = 1
WIRE_LEN = 2
WIRE_I32 = 5


def read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = data[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(data: bytes) -> Iterator[Field]:
    """Yield (field_number, wire_type, value) triples from one message."""
    pos = 0
    end = len(data)
    while pos < end:
        key, pos = read_varint(data, pos)
        field, wire = key >> 3, key & 7
        if wire == WIRE_VARINT:
            value, pos = read_varint(data, pos)
        elif wire == WIRE_I64:
            if pos + 8 > end:
                raise ValueError(f"truncated i64 field {field} at offset {pos}")
            value = data[pos : pos + 8]
            pos += 8
        elif wire == WIRE_LEN:
            length, pos = read_varint(data, pos)
            if pos + length > end:
                raise ValueError(f"truncated length-delimited field {field} at offset {pos}")
            value = data[pos : pos + length]
            pos += length
        elif wire == WIRE_I32:
            if pos + 4 > end:
                raise ValueError(f"truncated i32 field {field} at offset {pos}")
            value = data[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} at offset {pos}")
        yield field, wire, value


def fields_by_number(data: bytes) -> Dict[int, List[Union[int, bytes]]]:
    """Group all field occurrences by field number."""
    out: Dict[int, List[Union[int, bytes]]] = {}
    for field, _wire, value in iter_fields(data):
        out.setdefault(field, []).append(value)
    return out
