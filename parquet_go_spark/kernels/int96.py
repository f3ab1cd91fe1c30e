"""INT96 legacy timestamp codec — decode-compat shim (SURVEY.md §1.2).

Wire format (``type_int96.go:11-66``): 12 bytes LE per value — uint64
nanoseconds-within-day, then uint32 Julian day number. Conversions mirror
``Int96ToTime``/``TimeToInt96`` (``int96_time.go:17-50``): Julian day
2440588 = 1970-01-01. Our engine stores timestamps as INT64 micros
(delta-BP encoded); this codec exists so INT96 data written by legacy
engines can be decoded and re-encoded.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_plain", "decode_plain", "micros_to_int96", "int96_to_micros"]

_JULIAN_UNIX_EPOCH = 2440588
_NS_PER_DAY = 86400 * 1_000_000_000


def micros_to_int96(micros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 epoch-micros -> (julian_day uint32, nanos_of_day uint64)."""
    micros = micros.astype(np.int64, copy=False)
    days = np.floor_divide(micros, 86400 * 1_000_000)
    rem_us = micros - days * (86400 * 1_000_000)
    return (days + _JULIAN_UNIX_EPOCH).astype(np.uint32), (rem_us * 1000).astype(np.uint64)


def int96_to_micros(julian: np.ndarray, nanos: np.ndarray) -> np.ndarray:
    days = julian.astype(np.int64) - _JULIAN_UNIX_EPOCH
    return days * (86400 * 1_000_000) + (nanos // 1000).astype(np.int64)


def encode_plain(micros: np.ndarray) -> bytes:
    """int64 epoch-micros -> PLAIN INT96 stream (12 bytes LE per value)."""
    n = len(micros)
    julian, nanos = micros_to_int96(micros)
    out = np.empty((n, 12), dtype=np.uint8)
    out[:, :8] = nanos.astype("<u8").view(np.uint8).reshape(n, 8)
    out[:, 8:] = julian.astype("<u4").view(np.uint8).reshape(n, 4)
    return out.tobytes()


def decode_plain(buf, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """PLAIN INT96 stream -> (int64 epoch-micros, new_pos)."""
    raw = np.frombuffer(buf, np.uint8, count * 12, pos).reshape(count, 12)
    nanos = np.ascontiguousarray(raw[:, :8]).view("<u8").reshape(count)
    julian = np.ascontiguousarray(raw[:, 8:]).view("<u4").reshape(count)
    return int96_to_micros(julian, nanos), pos + count * 12


def decode_plain_nanos(buf, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """PLAIN INT96 stream -> (int64 epoch-nanos, new_pos) — full
    nanosecond precision, the unit other engines read INT96 back as."""
    raw = np.frombuffer(buf, np.uint8, count * 12, pos).reshape(count, 12)
    nanos = np.ascontiguousarray(raw[:, :8]).view("<u8").reshape(count)
    julian = np.ascontiguousarray(raw[:, 8:]).view("<u4").reshape(count)
    days = julian.astype(np.int64) - _JULIAN_UNIX_EPOCH
    return days * _NS_PER_DAY + nanos.astype(np.int64), pos + count * 12
