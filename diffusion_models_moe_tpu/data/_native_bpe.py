"""ctypes bridge to the native BPE merge core (native/bpe_core.cpp).

Builds on first use with g++ (same pattern as moefication/native.py); callers
must degrade to the pure-Python merge loop when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "bpe_core.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libbpe_core.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC,
                            "-o", _LIB], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_encode_word.restype = ctypes.c_int
        lib.bpe_encode_word.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int32),
                                        ctypes.c_int]
        lib.bpe_destroy.restype = None
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class NativeBPE:
    """Word -> token ids via the native merge core.

    encoder: token string -> id (ids must be dense starting at 0 — true for
    CLIP vocabs; raises ValueError otherwise so callers fall back to Python).
    merges: (left, right) pairs in rank order.
    """

    def __init__(self, encoder: dict[str, int],
                 merges: Sequence[tuple[str, str]]):
        n = max(encoder.values()) + 1 if encoder else 0
        if len(encoder) != n:
            raise ValueError("non-dense vocab ids; native BPE unsupported")
        tokens: list[str] = [""] * n
        for tok, i in encoder.items():
            if "\n" in tok:
                raise ValueError("newline in vocab token")
            tokens[i] = tok
        lib = _load()
        self._lib = lib
        self._h = lib.bpe_create(
            "\n".join(tokens).encode("utf-8"),
            "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8"))
        self._buf = (ctypes.c_int32 * 256)()

    def encode_word(self, word: str) -> list[int]:
        """`word` is the byte-unicode form WITHOUT the </w> suffix."""
        n = self._lib.bpe_encode_word(self._h, word.encode("utf-8"),
                                      self._buf, len(self._buf))
        if n < 0:  # pathological word longer than the buffer
            big = (ctypes.c_int32 * (len(word) * 4 + 8))()
            n = self._lib.bpe_encode_word(self._h, word.encode("utf-8"),
                                          big, len(big))
            return list(big[:max(n, 0)])
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:
            pass
