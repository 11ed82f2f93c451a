"""ctypes loader for the native host library (g1.cpp).

Builds `_g1.so` from source on first import (g++ is in the image; the build
is one translation unit and takes ~2 s), caches it next to the source, and
exposes thin ctypes wrappers.  Everything degrades gracefully: if the
compiler or binary is unavailable, `AVAILABLE` is False and callers
(ec/host.py) stay on the pure-Python path, which remains the ground truth.

ABI: 32-byte little-endian standard-form field elements; affine points are
x||y (64 bytes) + infinity flag; Jacobian points x||y||z (96 bytes, z == 0
is the identity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "g1.cpp")
_SO = os.path.join(_DIR, "_g1.so")
_ABI = 1

AVAILABLE = False
_lib = None
_failed = False  # build/load failed once — don't respawn g++ per call
_lock = threading.Lock()


def _build() -> bool:
    # compile to a temp path and os.rename into place: the build is atomic,
    # so a concurrent process can never CDLL a half-written _g1.so
    tmp = f"{_SO}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=300)
        if r.returncode != 0:
            return False
        os.rename(tmp, _SO)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def _load():
    global _lib, AVAILABLE, _failed
    if os.environ.get("HALO2_TPU_NO_NATIVE"):
        # honored per call (tests monkeypatch it after import)
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            if lib.h2n_abi_version() != _ABI:
                _failed = True
                return None
        except Exception:
            _failed = True
            return None
        lib.h2n_g1_add.argtypes = [ctypes.c_char_p] * 2 + [ctypes.c_char_p]
        lib.h2n_g1_dbl.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.h2n_g1_mul.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        lib.h2n_g1_to_affine.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.h2n_g1_to_affine.restype = ctypes.c_int
        lib.h2n_msm_fold.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.h2n_msm_fold.restype = ctypes.c_int
        lib.h2n_g1_sum.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.h2n_g1_msm.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.h2n_g1_msm.restype = ctypes.c_int
        _lib = lib
        AVAILABLE = True
        return lib


def lib():
    """The loaded library or None."""
    return _load()


# ---- int <-> buffer helpers -------------------------------------------------


def _fp(x: int) -> bytes:
    return int(x).to_bytes(32, "little")


def _affine(P) -> tuple[bytes, int]:
    if P is None:
        return b"\x00" * 64, 1
    return _fp(P[0]) + _fp(P[1]), 0


def _jac(xyz) -> bytes:
    return _fp(xyz[0]) + _fp(xyz[1]) + _fp(xyz[2])


def _read_affine(buf: bytes, inf: int):
    if inf:
        return None
    return (
        int.from_bytes(buf[:32], "little"),
        int.from_bytes(buf[32:64], "little"),
    )


def _read_jac(buf: bytes):
    return (
        int.from_bytes(buf[:32], "little"),
        int.from_bytes(buf[32:64], "little"),
        int.from_bytes(buf[64:96], "little"),
    )


# ---- public wrappers (None = identity, matching ec/host.py) -----------------


def g1_mul_jac(P, k: int):
    """affine P (or None) times k -> Jacobian int triple."""
    L = _load()
    buf, inf = _affine(P)
    out = ctypes.create_string_buffer(96)
    L.h2n_g1_mul(buf, inf, _fp(k % (1 << 256)), out)
    return _read_jac(out.raw)


def g1_add_jac(a_xyz, b_xyz):
    L = _load()
    out = ctypes.create_string_buffer(96)
    L.h2n_g1_add(_jac(a_xyz), _jac(b_xyz), out)
    return _read_jac(out.raw)


def jac_to_affine(xyz):
    L = _load()
    out = ctypes.create_string_buffer(64)
    inf = L.h2n_g1_to_affine(_jac(xyz), out)
    return _read_affine(out.raw, inf)


def msm_fold(parts_jac: list, c: int):
    """parts_jac: [(tmax_xyz, sumt_xyz), ...] per window (int triples,
    most significant window LAST — index w weights 2^(c*w)).  Returns a host
    affine point or None."""
    L = _load()
    n_windows = len(parts_jac)
    blob = b"".join(_jac(t) + _jac(s) for (t, s) in parts_jac)
    out = ctypes.create_string_buffer(64)
    inf = L.h2n_msm_fold(blob, n_windows, c, out)
    return _read_affine(out.raw, inf)


def g1_sum(points) -> tuple:
    """Sum a list of affine points/None -> Jacobian int triple."""
    L = _load()
    pts = b"".join(_affine(p)[0] for p in points)
    infs = bytes(1 if p is None else 0 for p in points)
    out = ctypes.create_string_buffer(96)
    L.h2n_g1_sum(pts, infs, len(points), out)
    return _read_jac(out.raw)


def g1_msm(points, scalars):
    """Host Pippenger over affine points/None and int scalars."""
    L = _load()
    pts = b"".join(_affine(p)[0] for p in points)
    infs = bytes(1 if p is None else 0 for p in points)
    sc = b"".join(_fp(s % (1 << 256)) for s in scalars)
    out = ctypes.create_string_buffer(64)
    inf = L.h2n_g1_msm(pts, infs, sc, len(points), out)
    return _read_affine(out.raw, inf)
