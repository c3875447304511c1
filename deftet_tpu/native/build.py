"""Compile-and-cache loader for the native components.

Equivalent role to the reference's utils/lib/*/do_all.sh ("g++ -shared
-fPIC") — but invoked lazily with a content-hash cache so rebuilding only
happens when the source changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE: dict = {}


def _cache_dir() -> str:
    root = os.environ.get(
        "DEFTET_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "deftet_tpu_native"),
    )
    os.makedirs(root, exist_ok=True)
    return root


def native_available() -> bool:
    return shutil.which("g++") is not None


def load_library(name: str = "topology") -> Optional[ctypes.CDLL]:
    """Compile (if needed) and dlopen native/<name>.cpp; None if no g++."""
    if name in _CACHE:
        return _CACHE[name]
    if not native_available():
        _CACHE[name] = None
        return None
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"{name}_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    _CACHE[name] = lib
    return lib
