"""ctypes bindings for the native data-plane runtime (``native/cfn_data.cpp``).

Replaces the reference's PIL/accimage per-frame decode workers
(``charades_fine.py:22-84``) with a C++ pthread pool and a packed-video
container.  Falls back gracefully (``available() == False``) when the shared
library hasn't been built (``make -C native``) — the pure-PIL path in
:mod:`.dataset` keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from . import bufpool

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libcfn_data.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:  # build on first use if a toolchain is around
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.cfn_decode_batch.restype = ctypes.c_int
    lib.cfn_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.cfn_decode_batch_rc.restype = ctypes.c_int
    lib.cfn_decode_batch_rc.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.cfn_decode_packed_rc.restype = ctypes.c_int
    lib.cfn_decode_packed_rc.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.cfn_pack_video.restype = ctypes.c_int
    lib.cfn_pack_video.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_char_p,
    ]
    lib.cfn_pack_num_frames.restype = ctypes.c_int
    lib.cfn_pack_num_frames.argtypes = [ctypes.c_char_p]
    lib.cfn_set_fast_decode.restype = ctypes.c_int
    lib.cfn_set_fast_decode.argtypes = [ctypes.c_int]
    lib.cfn_get_fast_decode.restype = ctypes.c_int
    lib.cfn_get_fast_decode.argtypes = []
    lib.cfn_decode_packed.restype = ctypes.c_int
    lib.cfn_decode_packed.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def set_fast_decode(enabled: bool) -> bool:
    """Toggle the DCT-scaled partial-decode fast path (default on; env
    ``CFN_EXACT_DECODE=1`` flips the default).  In fast mode the decoder
    decompresses only the crop region, at the smallest libjpeg m/8 scale that
    still covers the output size — ~3-5× less IDCT/color work at Charades
    shapes, numerics differing from the exact path only by the resample
    chain.  Returns the previous setting."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    return bool(lib.cfn_set_fast_decode(1 if enabled else 0))


def fast_decode() -> bool:
    lib = _load()
    assert lib is not None, "native library unavailable"
    return bool(lib.cfn_get_fast_decode())


def decode_batch(paths: Sequence[str], out_size: int,
                 num_threads: int = 4) -> np.ndarray:
    """Decode + CenterCropScaled a list of JPEGs → ``(N, out, out, 3)`` uint8."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = bufpool.borrow((n, out_size, out_size, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.cfn_decode_batch(
        arr, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads,
    )
    if fails:
        bad = [paths[i] for i in np.nonzero(status)[0][:3]]
        raise IOError(f"{fails} frames failed to decode, e.g. {bad}")
    return out


def decode_batch_random_crop(paths: Sequence[str], out_size: int,
                             scale: float, tl_x: float, tl_y: float,
                             num_threads: int = 4) -> np.ndarray:
    """Train-path decode: per-clip random scale+position crop
    (MultiScaleRandomCropMultigrid semantics, ``spatial_transforms.py:
    480-509``) resized to ``(out, out)`` — one call per clip, crop params
    randomised by the caller so the reference's once-per-clip protocol and
    seeding are preserved."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = bufpool.borrow((n, out_size, out_size, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.cfn_decode_batch_rc(
        arr, n, out_size, scale, tl_x, tl_y,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads,
    )
    if fails:
        bad = [paths[i] for i in np.nonzero(status)[0][:3]]
        raise IOError(f"{fails} frames failed to decode, e.g. {bad}")
    return out


def decode_packed_random_crop(pack_path: str, indices: Sequence[int],
                              out_size: int, scale: float, tl_x: float,
                              tl_y: float, num_threads: int = 4) -> np.ndarray:
    """Packed-container variant of :func:`decode_batch_random_crop`."""
    lib = _load()
    assert lib is not None
    idx = np.asarray(indices, np.int32)
    out = bufpool.borrow((len(idx), out_size, out_size, 3), np.uint8)
    status = np.zeros(len(idx), np.int32)
    rc = lib.cfn_decode_packed_rc(
        pack_path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(idx), out_size,
        scale, tl_x, tl_y,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads,
    )
    if rc != 0:
        raise IOError(f"decode_packed_rc failed rc={rc}")
    return out


def pack_video(paths: Sequence[str], out_path: str) -> None:
    """Concatenate frame JPEGs into one indexed ``.cfnpack`` container."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.cfn_pack_video(arr, len(paths), out_path.encode())
    if rc != 0:
        raise IOError(f"pack_video failed rc={rc}")


def pack_directory(root: str, out_dir: str, vids=None,
                   skip_existing: bool = True) -> int:
    """Pack every ``root/<vid>/<vid>-%06d.jpg`` frame directory into
    ``out_dir/<vid>.cfnpack``.  Returns the number of packs written.

    The pack concatenates the *contiguous* 1-based frame run (stopping at
    the first gap, matching the loaders' stop-at-gap semantics,
    ``charades_fine.py:54-55``), so pack index ``i`` is frame ``i+1``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if vids is None:
        vids = sorted(d for d in os.listdir(root)
                      if os.path.isdir(os.path.join(root, d)))
    written = 0
    for vid in vids:
        out = os.path.join(out_dir, vid + ".cfnpack")
        if skip_existing and os.path.exists(out):
            continue
        paths = []
        i = 1
        while True:
            p = os.path.join(root, vid, f"{vid}-{i:06d}.jpg")
            if not os.path.exists(p):
                break
            paths.append(p)
            i += 1
        if paths:
            pack_video(paths, out)
            written += 1
    return written


def pack_num_frames(pack_path: str) -> int:
    lib = _load()
    assert lib is not None
    n = lib.cfn_pack_num_frames(pack_path.encode())
    if n < 0:
        raise IOError(f"bad pack {pack_path} rc={n}")
    return n


def decode_packed(pack_path: str, indices: Sequence[int], out_size: int,
                  num_threads: int = 4) -> np.ndarray:
    """Decode selected frames from a pack → ``(N, out, out, 3)`` uint8."""
    lib = _load()
    assert lib is not None
    idx = np.asarray(indices, np.int32)
    out = bufpool.borrow((len(idx), out_size, out_size, 3), np.uint8)
    status = np.zeros(len(idx), np.int32)
    rc = lib.cfn_decode_packed(
        pack_path.encode(),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(idx), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads,
    )
    if rc != 0:
        raise IOError(f"decode_packed failed rc={rc}")
    return out
