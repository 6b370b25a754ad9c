"""Base-40 callsign codec.

Callsign <-> 6-byte big-endian base-40 value, with the first character in the
least-significant digit (the "HDL convention").  Behavior matches the
reference encoder/decoder pair (src/opv-mod.cpp:59-91 encode,
src/opv-demod.cpp:87-103 decode) including its quirks:

* unknown characters encode as digit 0 (which the decoder renders as nothing),
* lowercase letters are accepted on encode,
* decode of the all-zero value returns "(empty)".

This is host-side metadata plumbing (station IDs), so it is plain Python /
integers — no device arrays needed.
"""

from __future__ import annotations

_CHARSET_REV = {}
for _i in range(26):
    _CHARSET_REV[chr(ord("A") + _i)] = _i + 1
    _CHARSET_REV[chr(ord("a") + _i)] = _i + 1
for _i in range(10):
    _CHARSET_REV[chr(ord("0") + _i)] = _i + 27
_CHARSET_REV["-"] = 37
_CHARSET_REV["/"] = 38
_CHARSET_REV["."] = 39


def _char_to_digit(c: str) -> int:
    return _CHARSET_REV.get(c, 0)


def _digit_to_char(d: int) -> str:
    if d == 0:
        return ""
    if d <= 26:
        return chr(ord("A") + d - 1)
    if d <= 36:
        return chr(ord("0") + d - 27)
    return {37: "-", 38: "/", 39: "."}[d]


def base40_encode(callsign: str) -> bytes:
    """Encode a callsign to its 6-byte big-endian base-40 value.

    First character lands in the least-significant base-40 digit, which is
    achieved by accumulating the string in reverse.
    """
    value = 0
    for c in reversed(callsign):
        value = value * 40 + _char_to_digit(c)
    return bytes((value >> (8 * (5 - i))) & 0xFF for i in range(6))


def base40_decode(data: bytes | bytearray | list[int]) -> str:
    """Decode a 6-byte big-endian base-40 station ID back to a callsign."""
    value = 0
    for b in data[:6]:
        value = (value << 8) | int(b)
    if value == 0:
        return "(empty)"
    out = []
    while value > 0:
        out.append(_digit_to_char(value % 40))
        value //= 40
    s = "".join(out)
    return s if s else "(empty)"
