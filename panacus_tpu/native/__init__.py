"""Native host accelerators (C, via ctypes).

Compiled on demand from gfa_scan.c into a cached shared library; every
entry point has a numpy fallback so the framework works without a C
toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("panacus")

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gfa_scan.c")
_LIB = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "panacus_tpu",
        "native",
    )
    so_path = os.path.join(cache_dir, f"gfa_scan-{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        cc = os.environ.get("CC", "cc")
        cmd = [
            cc,
            "-O3",
            "-shared",
            "-fPIC",
            "-fvisibility=hidden",
            _SRC,
            "-o",
            so_path + ".tmp",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        except Exception as e:
            log.debug("native build failed (%s); using numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        log.debug("native load failed (%s); using numpy fallback", e)
        return None
    i64 = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.pt_parse_path_pm.restype = i64
    lib.pt_parse_path_pm.argtypes = [u8p, i64, i64p, u8p]
    lib.pt_parse_walk_lg.restype = i64
    lib.pt_parse_walk_lg.argtypes = [u8p, i64, i64p, u8p]
    lib.pt_or_row_bplen.restype = ctypes.c_uint64
    lib.pt_or_row_bplen.argtypes = [u32p, ctypes.c_uint32, i64p, i64, u32p, i64]
    lib.pt_parse_int_spans.restype = i64
    lib.pt_parse_int_spans.argtypes = [u8p, i64p, i64p, i64, i64p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("PANACUS_TPU_NO_NATIVE") != "1":
            _LIB = _build_lib()
            if _LIB is not None:
                log.debug("native gfa_scan loaded")
    return _LIB


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def parse_int_spans(buf, starts, ends):
    """C batch parse of integers at [starts[i], ends[i]). Returns int64
    array or None (unavailable / non-integer content)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(starts)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    s = np.ascontiguousarray(starts, dtype=np.int64)
    e = np.ascontiguousarray(ends, dtype=np.int64)
    rc = lib.pt_parse_int_spans(
        _as_u8p(buf),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def parse_path_tokens(
    buf: np.ndarray, start: int, end: int, walk: bool
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Tokenize buf[start:end] as P-line ids ('12+,34-') or W-line walk
    ('>12<34'). Returns (ids int64, orient uint8) or None if the native lib
    is unavailable or the span isn't pure integers (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    n = end - start
    if n <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint8)
    cap = n // 2 + 2
    ids = np.empty(cap, dtype=np.int64)
    orient = np.empty(cap, dtype=np.uint8)
    seg = buf[start:end]
    if not seg.flags["C_CONTIGUOUS"]:
        seg = np.ascontiguousarray(seg)
    fn = lib.pt_parse_walk_lg if walk else lib.pt_parse_path_pm
    cnt = fn(
        _as_u8p(seg),
        ctypes.c_int64(n),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _as_u8p(orient),
    )
    if cnt < 0:
        return None
    return ids[:cnt], orient[:cnt]
