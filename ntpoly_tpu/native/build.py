"""On-demand build of the native host library (g++ -> .so, loaded via ctypes).

The reference ships its runtime as compiled Fortran/C++ built by CMake
(reference CMakeLists.txt); here the native surface is one translation unit,
so a direct g++ invocation cached by source hash keeps the build
dependency-free.  Failure to build is non-fatal: callers fall back to numpy.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRCS = [os.path.join(os.path.dirname(__file__), name)
         for name in ("mmio.cpp", "blockfill.cpp")]


def _cache_path() -> str:
    digest = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            digest.update(f.read())
    cache_dir = os.environ.get(
        "NTPOLY_TPU_CACHE",
        os.path.join(tempfile.gettempdir(), "ntpoly_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir,
                        f"libntxhost_{digest.hexdigest()[:16]}.so")


def build(verbose: bool = False) -> str | None:
    """Compile the native sources if not cached; returns the .so path or
    None."""
    out = _cache_path()
    if os.path.exists(out):
        return out
    tmp = out + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", *_SRCS, "-o", tmp]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if proc.returncode != 0:
        if verbose:
            print(proc.stderr)
        return None
    os.replace(tmp, out)
    return out


def load_library() -> ctypes.CDLL | None:
    if os.environ.get("NTPOLY_TPU_NO_NATIVE"):
        return None
    path = build()
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None
