"""ctypes bindings for the native graph parser (native/graph_io.cpp).

Auto-builds ``libcognn_graph.so`` on first use if a toolchain is present;
callers (graph/io.py) fall back to numpy parsing when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libcognn_graph.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_thread_override = 0


def set_threads(n: int) -> None:
    """Cap the native parser's thread pool (the harness's ``-t`` flag;
    reference `graph_io_util.h:118` 8-thread load pool). 0 = auto."""
    global _thread_override
    _thread_override = int(n)
    if _lib is not None and hasattr(_lib, "cognn_set_threads"):
        _lib.cognn_set_threads(_thread_override)


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise OSError("native build previously failed")
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            _build_failed = True
            raise OSError(f"native build failed: {e}") from e
    lib = ctypes.CDLL(str(_SO))
    try:
        lib.cognn_set_threads.restype = None
        lib.cognn_set_threads.argtypes = [ctypes.c_int64]
        if _thread_override:
            lib.cognn_set_threads(_thread_override)
    except AttributeError:  # stale .so predating the -t plumbing
        pass
    lib.cognn_count_rows.restype = ctypes.c_int64
    lib.cognn_count_rows.argtypes = [ctypes.c_char_p]
    lib.cognn_parse_edge_list.restype = ctypes.c_int64
    lib.cognn_parse_edge_list.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double]
    lib.cognn_parse_vertex_file.restype = ctypes.c_int64
    lib.cognn_parse_vertex_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def parse_edge_list(path: str | Path, default_weight: float = 1.0
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    pathb = str(path).encode()
    n = lib.cognn_count_rows(pathb)
    if n < 0:
        raise OSError(f"cannot read {path} (err {-n})")
    src = np.empty(n, np.int64)
    dst = np.empty(n, np.int64)
    w = np.empty(n, np.float64)
    rows = lib.cognn_parse_edge_list(
        pathb, n, _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(w, ctypes.c_double), default_weight)
    if rows < 0:
        raise ValueError(f"malformed edge list {path} (err {-rows})")
    return src[:rows], dst[:rows], w[:rows]


def parse_vertex_file(path: str | Path, input_dim: int
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    pathb = str(path).encode()
    n = lib.cognn_count_rows(pathb)
    if n < 0:
        raise OSError(f"cannot read {path} (err {-n})")
    vid = np.empty(n, np.int64)
    feat = np.empty((n, input_dim), np.float64)
    label = np.empty(n, np.int64)
    rows = lib.cognn_parse_vertex_file(
        pathb, n, input_dim, _ptr(vid, ctypes.c_int64),
        _ptr(feat, ctypes.c_double), _ptr(label, ctypes.c_int64))
    if rows < 0:
        raise ValueError(
            f"malformed vertex file {path} or wrong input_dim={input_dim} "
            f"(err {-rows})")
    return vid[:rows], feat[:rows], label[:rows]
