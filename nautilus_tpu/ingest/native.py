"""ctypes bindings for the native C++ bag reader, with self-building.

Loads nautilus_tpu/native/libntbag.so; if absent, compiles it with g++ on
first use (cached next to the source).  All consumers fall back to the pure
Python parser (ingest/rosbag.py) when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from nautilus_tpu.ingest.rosbag import (BagMessage, CobotOdometryMsg,
                                        HeaderMsg, LaserScanMsg, OdometryMsg)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libntbag.so"
_SRC_PATH = _NATIVE_DIR / "bagreader.cc"
_BZ2_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libbz2.so.1",
    "/usr/lib/libbz2.so.1",
    "/lib/x86_64-linux-gnu/libbz2.so.1",
]
_LZ4_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/liblz4.so.1",
    "/usr/lib/liblz4.so.1",
    "/lib/x86_64-linux-gnu/liblz4.so.1",
]

_lib = None
_build_failed = False


def _build() -> bool:
    bz2 = next((c for c in _BZ2_CANDIDATES if Path(c).exists()), None)
    if bz2 is None:
        return False
    lz4 = next((c for c in _LZ4_CANDIDATES if Path(c).exists()), None)
    extra = [lz4] if lz4 else ["-DNTBAG_NO_LZ4"]
    cmd = (["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            str(_SRC_PATH), bz2] + extra + ["-o", str(_SO_PATH)])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _SO_PATH.exists() or (_SRC_PATH.exists() and
                                 _SRC_PATH.stat().st_mtime
                                 > _SO_PATH.stat().st_mtime):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        _build_failed = True
        return None
    try:
        return _bind(lib)
    except AttributeError:
        # Stale pre-batched-ABI .so the mtime check didn't catch (e.g. a
        # copy that preserved timestamps, or a build without the source
        # present).  Rebuild so FUTURE processes load a current library
        # (re-dlopening the same path here could dedupe to the stale
        # mapping), and honor the documented None -> pure-Python-fallback
        # contract for this one instead of crashing ingest.
        if _SRC_PATH.exists():
            _build()
        _build_failed = True
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare the ABI; raises AttributeError on a stale library."""
    global _lib
    lib.nt_bag_parse.restype = ctypes.c_void_p
    lib.nt_bag_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_char_p]
    lib.nt_bag_error.restype = ctypes.c_char_p
    lib.nt_bag_error.argtypes = [ctypes.c_void_p]
    for name in ("nt_bag_num_scans", "nt_bag_num_odoms", "nt_bag_num_cobots"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_long
        fn.argtypes = [ctypes.c_void_p]
    lib.nt_bag_scan_meta.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_double)]
    lib.nt_bag_scan_ranges.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                       ctypes.POINTER(ctypes.c_float)]
    lib.nt_bag_scan_meta_all.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_double)]
    lib.nt_bag_scan_ranges_all.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_float)]
    lib.nt_bag_odoms.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double)]
    lib.nt_bag_cobots.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double)]
    lib.nt_bag_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def read_bag_native(path, lidar_topic: str,
                    odom_topic: str) -> Optional[List[BagMessage]]:
    """Parse with the native reader; None if unavailable or on parse error.

    Returns messages in TIME order — record (receive) time, ties broken by
    stream position — matching rosbag::View (reference main.cc:65-71) and
    the Python reader, even for bags whose chunks are stored out of time
    order (reindexed/appended bags).
    """
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.nt_bag_parse(str(path).encode(), lidar_topic.encode(),
                              odom_topic.encode())
    try:
        err = lib.nt_bag_error(handle)
        if err:
            raise ValueError(f"native bag parse failed: {err.decode()}")
        entries = []
        n_scans = lib.nt_bag_num_scans(handle)
        if n_scans:
            # Two batched calls instead of 2*n_scans ctypes round-trips;
            # each scan's ranges become a view into one shared buffer.
            meta = np.empty((n_scans, 9), np.float64)
            lib.nt_bag_scan_meta_all(handle, meta.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)))
            counts = meta[:, 6].astype(np.int64)
            flat = np.empty(int(counts.sum()), np.float32)
            if flat.size:
                lib.nt_bag_scan_ranges_all(handle, flat.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)))
            offsets = np.concatenate(([0], np.cumsum(counts)))
            no_intensities = np.zeros(0, np.float32)
            for i in range(n_scans):
                m = meta[i]
                msg = LaserScanMsg(
                    header=HeaderMsg(0, m[0], "laser"),
                    angle_min=m[1], angle_max=m[2], angle_increment=m[3],
                    time_increment=0.0, scan_time=0.0,
                    range_min=m[4], range_max=m[5],
                    ranges=flat[offsets[i]:offsets[i + 1]],
                    intensities=no_intensities)
                entries.append((m[8], int(m[7]),
                                BagMessage(lidar_topic, LaserScanMsg.TYPE,
                                           m[0], msg)))
        n_od = lib.nt_bag_num_odoms(handle)
        if n_od:
            buf = np.empty((n_od, 10), np.float64)
            lib.nt_bag_odoms(handle, buf.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)))
            for row in buf:
                msg = OdometryMsg(
                    header=HeaderMsg(0, row[0], "odom"), child_frame_id="",
                    position=row[1:4].copy(),
                    orientation=row[4:8].copy(),
                    twist_linear=np.zeros(3), twist_angular=np.zeros(3))
                entries.append((row[9], int(row[8]),
                                BagMessage(odom_topic, OdometryMsg.TYPE,
                                           row[0], msg)))
        n_cb = lib.nt_bag_num_cobots(handle)
        if n_cb:
            buf = np.empty((n_cb, 6), np.float64)
            lib.nt_bag_cobots(handle, buf.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)))
            for row in buf:
                msg = CobotOdometryMsg(header=HeaderMsg(0, row[0], "odom"),
                                       dr=row[1], dx=row[2], dy=row[3])
                entries.append((row[5], int(row[4]),
                                BagMessage(odom_topic, CobotOdometryMsg.TYPE,
                                           row[0], msg)))
        entries.sort(key=lambda e: (e[0], e[1]))
        return [m for _, _, m in entries]
    finally:
        lib.nt_bag_free(handle)
