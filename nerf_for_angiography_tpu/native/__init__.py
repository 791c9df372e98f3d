"""Native (C++) runtime components, bound via ctypes.

Currently: the fast per-ray CSV loader (native/csv_loader.cpp) — mmap +
multithreaded std::from_chars parsing, ~10-50x pandas on the L1->L3 data
contract. Auto-builds with g++ on first use; all callers fall back to the
pandas path when the toolchain or the .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "csv_loader.cpp")
_SO = os.path.join(_REPO, "native", "libcsvloader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.rays_csv_count.restype = ctypes.c_int64
        lib.rays_csv_count.argtypes = [ctypes.c_char_p]
        lib.rays_csv_parse.restype = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.rays_csv_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            f32p, f32p, f32p, f32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_rays_csv(path: str) -> dict | None:
    """Parse the per-ray CSV with the native loader.

    Returns dict(origins (N,3) f32, directions (N,3) f32, pixel_values (N,),
    weights (N,), x_positions/y_positions (N,) i32, image_ids (N,) i32,
    num_views int) or None if the native path is unavailable/fails.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = lib.rays_csv_count(path.encode())
    if n <= 0:
        return None
    origins = np.empty((n, 3), np.float32)
    directions = np.empty((n, 3), np.float32)
    pixel_values = np.empty(n, np.float32)
    weights = np.empty(n, np.float32)
    x_positions = np.empty(n, np.int32)
    y_positions = np.empty(n, np.int32)
    image_idx = np.empty(n, np.int32)
    n_views = ctypes.c_int32(0)
    got = lib.rays_csv_parse(
        path.encode(), n, origins, directions, pixel_values, weights,
        x_positions, y_positions, image_idx, ctypes.byref(n_views),
    )
    if got != n:
        return None
    return {
        "origins": origins,
        "directions": directions,
        "pixel_values": pixel_values,
        "weights": weights,
        "x_positions": x_positions,
        "y_positions": y_positions,
        "image_ids": image_idx,
        "num_views": int(n_views.value),
    }


# ---------------------------------------------------------------------------
# fast JSON export (native/json_export.cpp): the 1369-view sweep writes
# ~41M floats of per-angle {pred, org, diff} JSONs at the flagship shape —
# minutes of single-core json.dump, ~1s native. Shortest-round-trip
# formatting (std::to_chars) keeps json.load values bit-identical.
# ---------------------------------------------------------------------------

_SRC_JSON = os.path.join(_REPO, "native", "json_export.cpp")
_SO_JSON = os.path.join(_REPO, "native", "libjsonexport.so")
_json_lib = None
_json_build_failed = False


def get_json_lib():
    """Load (building if needed) the JSON export library; None if unavailable."""
    global _json_lib, _json_build_failed
    with _lock:
        if _json_lib is not None or _json_build_failed:
            return _json_lib
        if not os.path.exists(_SO_JSON) or (
            os.path.exists(_SRC_JSON)
            and os.path.getmtime(_SRC_JSON) > os.path.getmtime(_SO_JSON)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC_JSON, "-o", _SO_JSON],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _json_build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_JSON)
        except OSError:
            _json_build_failed = True
            return None
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.write_angle_json.restype = ctypes.c_int64
        lib.write_angle_json.argtypes = [
            ctypes.c_char_p, f64p, f64p, f64p, ctypes.c_int64,
        ]
        lib.write_heatmap_json.restype = ctypes.c_int64
        lib.write_heatmap_json.argtypes = [
            ctypes.c_char_p, f64p, f64p, f64p, f64p, ctypes.c_int64,
        ]
        _json_lib = lib
        return _json_lib


def _c_f64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float64).reshape(-1))


def write_angle_json(path: str, pred, org, diff) -> bool:
    """Native {pred, org, diff} writer; False -> caller uses json.dump."""
    lib = get_json_lib()
    if lib is None:
        return False
    p, o, d = _c_f64(pred), _c_f64(org), _c_f64(diff)
    if not (p.size == o.size == d.size):
        return False
    return lib.write_angle_json(path.encode(), p, o, d, p.size) == 0


def write_heatmap_json(path: str, rad, theta, angles, vals) -> bool:
    """Native {rad, theta, angles, vals} writer; False -> json.dump."""
    lib = get_json_lib()
    if lib is None:
        return False
    r, t, v = _c_f64(rad), _c_f64(theta), _c_f64(vals)
    a = _c_f64(angles)
    if not (r.size == t.size == v.size and a.size == 2 * r.size):
        return False
    return lib.write_heatmap_json(path.encode(), r, t, a, v, r.size) == 0
