"""ctypes bindings for the native audiohost library.

Builds lazily with make/g++ on first use (no prebuilt binaries in-tree);
every entry point has a numpy fallback so the package works without a
toolchain.  ``available()`` reports whether the native path is active."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libaudiohost.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:  # toolchain missing / build failure -> fallback
        log.debug("audiohost build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        log.debug("audiohost load failed: %s", e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ah_hash64.restype = ctypes.c_uint64
    lib.ah_hash64.argtypes = [u8p, ctypes.c_uint64]
    lib.ah_wav_info.restype = ctypes.c_int32
    lib.ah_wav_info.argtypes = [u8p, ctypes.c_uint64,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int64)]
    lib.ah_wav_decode.restype = ctypes.c_int32
    lib.ah_wav_decode.argtypes = [u8p, ctypes.c_uint64, f32p]
    lib.ah_wav_encode_pcm16.restype = ctypes.c_int64
    lib.ah_wav_encode_pcm16.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                        ctypes.c_int32, u8p, ctypes.c_int64]
    lib.ah_resample_len.restype = ctypes.c_int64
    lib.ah_resample_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32]
    lib.ah_resample.restype = ctypes.c_int32
    lib.ah_resample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_int32, f32p]
    lib.ah_levels.restype = None
    lib.ah_levels.argtypes = [f32p, ctypes.c_int64, f32p, f32p]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.ah_world_f0.restype = ctypes.c_int32
    lib.ah_world_f0.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_int32, ctypes.c_double,
                                ctypes.c_double, ctypes.c_int32,
                                ctypes.c_int32, f64p]
    lib.ah_stonemask.restype = ctypes.c_int32
    lib.ah_stonemask.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int32, f64p, ctypes.c_int64, f64p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def hash64(data: bytes) -> int:
    lib = _load()
    if lib is None:
        import hashlib

        return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
    return int(lib.ah_hash64(_u8(data), len(data)))


def wav_decode(data: bytes):
    """WAV bytes -> (samples (channels, n) float32, sr) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    if lib.ah_wav_info(_u8(data), len(data), ctypes.byref(ch), ctypes.byref(sr),
                       ctypes.byref(frames)):
        return None
    out = np.empty(frames.value * ch.value, np.float32)
    if lib.ah_wav_decode(_u8(data), len(data), _f32(out)):
        return None
    return out.reshape(frames.value, ch.value).T.copy(), sr.value


def wav_encode_pcm16(samples: np.ndarray, sr: int) -> bytes | None:
    """(channels, n) float32 -> WAV bytes, or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    s = np.asarray(samples, np.float32)
    if s.ndim == 1:
        s = s[None]
    inter = np.ascontiguousarray(s.T)
    frames, ch = inter.shape
    cap = 44 + frames * ch * 2
    out = np.empty(cap, np.uint8)
    n = lib.ah_wav_encode_pcm16(_f32(inter.reshape(-1)), frames, ch, sr,
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                                cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def resample(x: np.ndarray, up: int, down: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    xin = np.ascontiguousarray(x, np.float32)
    n_out = lib.ah_resample_len(len(xin), up, down)
    out = np.empty(n_out, np.float32)
    if lib.ah_resample(_f32(xin), len(xin), up, down, _f32(out)):
        return None
    return out


def world_f0(x: np.ndarray, sr: int, hop: int, fmin: float = 50.0,
             fmax: float = 1100.0, mode: str = "dio",
             refine: bool = True) -> np.ndarray | None:
    """Native WORLD-style f0 oracle (world_f0.cpp): an independent
    per-frame C++ transcription of DIO/Harvest(+StoneMask) used to gate
    dsp/f0.py (reference: pyworld, pitch_extraction.py:172-191).
    Returns (n//hop + 1,) float64 f0 (0 = unvoiced), or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    xin = np.ascontiguousarray(x, np.float32)
    t_frames = len(xin) // hop + 1
    out = np.empty(t_frames, np.float64)
    rc = lib.ah_world_f0(_f32(xin), len(xin), sr, hop, fmin, fmax,
                         {"dio": 0, "harvest": 1}[mode], int(refine),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out if rc == 0 else None


def world_stonemask(x: np.ndarray, f0: np.ndarray, sr: int,
                    hop: int) -> np.ndarray | None:
    """Native StoneMask refinement of an existing f0 track."""
    lib = _load()
    if lib is None:
        return None
    xin = np.ascontiguousarray(x, np.float32)
    f0in = np.ascontiguousarray(f0, np.float64)
    out = np.empty(len(f0in), np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.ah_stonemask(_f32(xin), len(xin), sr, hop,
                          f0in.ctypes.data_as(dp), len(f0in),
                          out.ctypes.data_as(dp))
    return out if rc == 0 else None


def levels(x: np.ndarray) -> tuple[float, float]:
    lib = _load()
    xin = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return float(np.abs(xin).max(initial=0.0)), float(np.sqrt(np.mean(xin**2)))
    peak = ctypes.c_float()
    rms = ctypes.c_float()
    lib.ah_levels(_f32(xin), len(xin), ctypes.byref(peak), ctypes.byref(rms))
    return float(peak.value), float(rms.value)
