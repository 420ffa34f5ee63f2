"""ctypes binding for the C++ WordPiece tokenizer (wordpiece.cc).

Auto-builds libwordpiece.so with `make` on first use when g++ is available;
callers (tpu_rag/models/tokenizer.py) fall back to the pure-Python
implementation when the build or load fails.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libwordpiece.so"
_build_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.is_file():
            subprocess.run(["make", "-C", str(_HERE)], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.wp_create.argtypes = [ctypes.c_char_p]
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.wp_tokenize.restype = ctypes.c_int
        _lib = lib
    return _lib


class NativeWordPiece:
    MAX_IDS = 65536

    def __init__(self, vocab_path: str) -> None:
        self._lib = _load_lib()
        self._handle = self._lib.wp_create(vocab_path.encode("utf-8"))
        if not self._handle:
            raise RuntimeError(f"wp_create failed for {vocab_path}")
        self._buf = (ctypes.c_int32 * self.MAX_IDS)()

    def tokenize_ids(self, text: str) -> list[int]:
        n = self._lib.wp_tokenize(self._handle, text.encode("utf-8"),
                                  self._buf, self.MAX_IDS)
        if n < 0:
            raise RuntimeError("wp_tokenize failed")
        return list(self._buf[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass
