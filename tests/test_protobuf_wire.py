"""Protobuf wire-format reader: round trips and malformed-input rejection."""

import struct

import pytest

from light_whisper_tpu.formats.protobuf_wire import (
    WIRE_I32,
    WIRE_I64,
    WIRE_LEN,
    WIRE_VARINT,
    fields_by_number,
    iter_fields,
    read_varint,
)


def _varint(value: int) -> bytes:
    out = b""
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out += bytes([byte | 0x80])
        else:
            return out + bytes([byte])


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def test_varint_round_trip():
    for value in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        parsed, pos = read_varint(_varint(value), 0)
        assert parsed == value
        assert pos == len(_varint(value))


def test_iter_fields_all_wire_types():
    msg = (
        _key(1, WIRE_VARINT) + _varint(150)
        + _key(2, WIRE_LEN) + _varint(3) + b"abc"
        + _key(3, WIRE_I32) + struct.pack("<f", 1.5)
        + _key(4, WIRE_I64) + struct.pack("<d", 2.5)
    )
    fields = list(iter_fields(msg))
    assert fields[0] == (1, WIRE_VARINT, 150)
    assert fields[1] == (2, WIRE_LEN, b"abc")
    assert struct.unpack("<f", fields[2][2])[0] == 1.5
    assert struct.unpack("<d", fields[3][2])[0] == 2.5


def test_fields_by_number_groups_repeats():
    msg = (
        _key(7, WIRE_VARINT) + _varint(1)
        + _key(7, WIRE_VARINT) + _varint(2)
        + _key(9, WIRE_LEN) + _varint(2) + b"hi"
    )
    grouped = fields_by_number(msg)
    assert grouped[7] == [1, 2]
    assert grouped[9] == [b"hi"]


@pytest.mark.parametrize(
    "msg",
    [
        _key(1, WIRE_LEN) + _varint(10) + b"short",  # truncated LEN payload
        _key(1, WIRE_I64) + b"\x00" * 4,  # truncated i64
        _key(1, WIRE_I32) + b"\x00",  # truncated i32
        _key(1, 3),  # unsupported group wire type
    ],
)
def test_malformed_messages_raise(msg):
    with pytest.raises(ValueError):
        list(iter_fields(msg))


def test_overlong_varint_raises():
    with pytest.raises(ValueError, match="varint too long"):
        read_varint(b"\xff" * 12, 0)
