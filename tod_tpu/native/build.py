"""Build the native runtime library (libtodtpu.so) with g++.

The reference leans on native code for its runtime (Rust + C++ FFI: tflite,
libedgetpu, OpenNI2, Vulkan — SURVEY.md §2.2); our native layer covers the
host-side hot paths: the planner Dijkstra and the frame-source ring buffer.
Python falls back to NumPy implementations when the library isn't built.
"""

from __future__ import annotations

import pathlib
import subprocess

_CSRC = pathlib.Path(__file__).parent / "csrc"
_LIB = pathlib.Path(__file__).parent / "libtodtpu.so"

_SOURCES = ["planner.cpp", "framesource.cpp"]


def lib_path() -> pathlib.Path:
    return _LIB


def needs_build() -> bool:
    if not _LIB.exists():
        return True
    lib_mtime = _LIB.stat().st_mtime
    return any((_CSRC / s).stat().st_mtime > lib_mtime for s in _SOURCES)


def build(verbose: bool = False) -> pathlib.Path:
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        *[str(_CSRC / s) for s in _SOURCES],
        "-o",
        str(_LIB),
    ]
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(f"native build failed:\n{result.stderr}")
    if verbose:
        print(f"built {_LIB}")
    return _LIB


def ensure_built() -> pathlib.Path | None:
    """Build if stale; return the library path, or None on failure.

    Failures are LOGGED, not silent: the "auto" planner backend degrades to
    the ~10-50x slower NumPy fallback when this returns None, and a serving
    deployment losing its latency budget must have a diagnostic trail."""
    try:
        if needs_build():
            build()
        return _LIB
    except (RuntimeError, FileNotFoundError) as e:
        import logging

        logging.getLogger(__name__).warning(
            "native library unavailable (planner falls back to NumPy): %s", e
        )
        return None


if __name__ == "__main__":
    build(verbose=True)
