"""ctypes binding for the native C++ WordPiece tokenizer
(``native/wordpiece.cpp``), with transparent Python fallback.

The C++ path is byte-exact with the Python tokenizer for ASCII text; strings
containing non-ASCII characters (accents, CJK) are routed to the Python
implementation, so results are always identical to ``BertTokenizer``.

The shared library is built on demand with g++ and cached next to the
source; set ``VISUALBERT_TPU_NO_NATIVE=1`` to disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from visualbert_tpu.data.tokenization import BertTokenizer

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "wordpiece.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libwordpiece.so")


def _build_library() -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return None
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", lib, src],
            check=True, capture_output=True,
        )
        return lib
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_lib_handle = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    if os.environ.get("VISUALBERT_TPU_NO_NATIVE"):
        return None
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = ctypes.c_int64
    lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib_handle = lib
    return lib


class FastBertTokenizer(BertTokenizer):
    """Drop-in BertTokenizer with a native encode path for ASCII text."""

    def __init__(self, vocab: Dict[str, int], do_lower_case: bool = True, **kw):
        super().__init__(vocab, do_lower_case=do_lower_case, **kw)
        self._native = None
        lib = _load() if do_lower_case else None  # C++ path is lowercasing
        if lib is not None:
            ordered = sorted(vocab.items(), key=lambda kv: kv[1])
            # ids must be dense 0..n-1 for the blob layout
            if [i for _, i in ordered] == list(range(len(ordered))):
                blob = ("\n".join(t for t, _ in ordered) + "\n").encode("utf-8")
                handle = lib.wp_create(blob, len(blob))
                self._native = (lib, ctypes.c_void_p(handle))

    def __del__(self):
        native = getattr(self, "_native", None)
        if native is not None:
            lib, handle = native
            try:
                lib.wp_free(handle)
            except Exception:
                pass

    @property
    def native_available(self) -> bool:
        return self._native is not None

    def encode(self, text: str) -> List[int]:
        if self._native is not None and text.isascii():
            lib, handle = self._native
            raw = text.encode("ascii")
            max_out = max(len(raw) * 2, 16)
            out = (ctypes.c_int32 * max_out)()
            n = lib.wp_encode(handle, raw, len(raw), out, max_out)
            return list(out[:n])
        return super().encode(text)

    def tokenize(self, text: str) -> List[str]:
        if self._native is not None and text.isascii():
            return self.convert_ids_to_tokens(self.encode(text))
        return super().tokenize(text)

    def encode_batch(self, texts: List[str], max_len: int) -> np.ndarray:
        """[n, max_len] int32 (0-padded) + lengths, via one native call when
        all inputs are ASCII."""
        if self._native is not None and all(t.isascii() for t in texts):
            lib, handle = self._native
            blob = "".join(texts).encode("ascii")
            offsets = np.zeros(len(texts) + 1, np.int64)
            np.cumsum([len(t) for t in texts], out=offsets[1:])
            out = np.zeros((len(texts), max_len), np.int32)
            lens = np.zeros(len(texts), np.int32)
            lib.wp_encode_batch(
                handle, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(texts),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                max_len,
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return out, lens
        out = np.zeros((len(texts), max_len), np.int32)
        lens = np.zeros(len(texts), np.int32)
        for i, t in enumerate(texts):
            ids = super().encode(t)[:max_len]
            out[i, : len(ids)] = ids
            lens[i] = len(ids)
        return out, lens
