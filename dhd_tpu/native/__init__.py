"""ctypes bindings for the native C++ data-path kernels.

Compiled on first use with g++ (cached next to the source); every binding has
a pure-numpy fallback so the package works without a toolchain.  See
src/dhd_native.cpp for what each kernel replaces in the reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "dhd_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_dhd_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        sys.stderr.write(f"dhd_native build failed, using numpy fallback: "
                         f"{e}\n")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) > os.path.getmtime(_SRC) else _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.dhd_normalize_images.argtypes = [
            u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.dhd_project_cameras.argtypes = [
            f32p, ctypes.c_long, f32p, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p, f32p]
        lib.dhd_min_pool_nonzero.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
        return _lib


def normalize_images(imgs_u8: np.ndarray, mean: np.ndarray,
                     std: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) uint8 RGB -> normalized float32 with the BGR-swap quirk."""
    imgs_u8 = np.ascontiguousarray(imgs_u8, np.uint8)
    n, h, w, _ = imgs_u8.shape
    lib = get_lib()
    out = np.empty((n, h, w, 3), np.float32)
    if lib is not None:
        lib.dhd_normalize_images(
            imgs_u8, out, n, h, w,
            np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32))
        return out
    swapped = imgs_u8[..., ::-1].astype(np.float32)
    return (swapped - mean) / std


def project_cameras(points: np.ndarray, lidar2img: np.ndarray,
                    lidar2ego: np.ndarray, post_rot: np.ndarray,
                    post_tran: np.ndarray, hw: Tuple[int, int],
                    depth_range: Tuple[float, float]
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched lidar->camera depth/height z-buffer projection.

    points: (P, 3); lidar2img: (N, 4, 4); lidar2ego: (4, 4);
    post_rot: (N, 3, 3); post_tran: (N, 3).
    Returns (depth (N, H, W), height (N, H, W)).
    """
    lib = get_lib()
    n = lidar2img.shape[0]
    h, w = hw
    if lib is not None:
        depth = np.zeros((n, h, w), np.float32)
        height = np.zeros((n, h, w), np.float32)
        lib.dhd_project_cameras(
            np.ascontiguousarray(points[:, :3], np.float32),
            points.shape[0],
            np.ascontiguousarray(lidar2img, np.float32),
            np.ascontiguousarray(lidar2ego, np.float32),
            np.ascontiguousarray(post_rot, np.float32),
            np.ascontiguousarray(post_tran, np.float32),
            n, h, w, depth_range[0], depth_range[1], depth, height)
        return depth, height
    # numpy fallback: per-camera z-buffer with the same semantics
    depth = np.zeros((n, h, w), np.float32)
    height = np.zeros((n, h, w), np.float32)
    pts = points[:, :3].astype(np.float32)
    pts_ego_z = pts @ lidar2ego[2, :3] + lidar2ego[2, 3]
    for c in range(n):
        img = pts @ lidar2img[c, :3, :3].T + lidar2img[c, :3, 3]
        uvd = np.concatenate([img[:, :2] / img[:, 2:3], img[:, 2:3]], 1)
        uvd = uvd @ post_rot[c].T + post_tran[c]
        coor = np.round(uvd[:, :2])
        d = uvd[:, 2]
        kept = ((coor[:, 0] >= 0) & (coor[:, 0] < w) & (coor[:, 1] >= 0)
                & (coor[:, 1] < h) & (d >= depth_range[0])
                & (d < depth_range[1]))
        ck, dk, hk = coor[kept].astype(int), d[kept], pts_ego_z[kept]
        order = np.argsort((ck[:, 0] + ck[:, 1] * w) + dk / 100.0,
                           kind="stable")
        ck, dk, hk = ck[order], dk[order], hk[order]
        ranks = ck[:, 0] + ck[:, 1] * w
        keep = np.ones(len(ck), bool)
        keep[1:] = ranks[1:] != ranks[:-1]
        depth[c, ck[keep, 1], ck[keep, 0]] = dk[keep]
        height[c, ck[keep, 1], ck[keep, 0]] = hk[keep]
    return depth, height
