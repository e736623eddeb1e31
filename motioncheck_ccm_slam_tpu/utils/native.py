"""Native runtime bindings.

Builds ``native/wire.cpp`` on demand (g++ -O3 -shared) and exposes it via
ctypes; every entry point has a pure-Python fallback so the framework keeps
working where a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "wire.cpp")
_SO = os.path.join(_ROOT, "native", "libwire.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_SRC):
        _build_failed = True
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.wire_crc32.restype = ctypes.c_uint32
        lib.wire_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.wire_frame.restype = ctypes.c_uint64
        lib.wire_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64
        ]
        lib.wire_parse_header.restype = ctypes.c_int64
        lib.wire_parse_header.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.wire_check.restype = ctypes.c_int32
        lib.wire_check.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


MAGIC = 0x4D435357
HEADER_SIZE = 12


def crc32(payload: bytes) -> int:
    lib = get_lib()
    if lib is not None:
        return lib.wire_crc32(payload, len(payload))
    return zlib.crc32(payload) & 0xFFFFFFFF


def frame(payload: bytes) -> bytes:
    """Length+CRC framed message."""
    lib = get_lib()
    if lib is not None:
        out = ctypes.create_string_buffer(len(payload) + HEADER_SIZE)
        n = lib.wire_frame(out, payload, len(payload))
        return out.raw[:n]
    c = crc32(payload)
    return (MAGIC.to_bytes(4, "little")
            + len(payload).to_bytes(4, "little")
            + c.to_bytes(4, "little") + payload)


def parse_header(buf: bytes):
    """-> (payload_len, crc) or raises ValueError on bad magic."""
    if len(buf) < HEADER_SIZE:
        return None
    lib = get_lib()
    if lib is not None:
        crc = ctypes.c_uint32(0)
        n = lib.wire_parse_header(buf, len(buf), ctypes.byref(crc))
        if n == -1:
            raise ValueError("bad frame magic")
        if n == -2:
            return None
        return int(n), crc.value
    magic = int.from_bytes(buf[0:4], "little")
    if magic != MAGIC:
        raise ValueError("bad frame magic")
    return (int.from_bytes(buf[4:8], "little"),
            int.from_bytes(buf[8:12], "little"))


def check(payload: bytes, crc: int) -> bool:
    lib = get_lib()
    if lib is not None:
        return bool(lib.wire_check(payload, len(payload), crc))
    return crc32(payload) == crc
