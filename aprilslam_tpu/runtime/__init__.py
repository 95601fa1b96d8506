"""Native runtime bindings (ctypes over libaprilslam_runtime.so).

Builds the C++ library on first use if no prebuilt .so is present (g++ is in
the base image; no network needed). Provides:

* :func:`render_frames_native` — synchronous multithreaded CPU rasterizer
  (same conventions/outputs as sim/rasterizer.py, oracle-tested against it);
* :class:`FramePipeline` — asynchronous double-buffered frame producer with
  C++ worker threads, overlapping host rendering with device compute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libaprilslam_runtime.so")
_SRCS = [os.path.join(_DIR, "rasterizer.cpp"), os.path.join(_DIR, "video_io.cpp")]
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", *_SRCS, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
            os.path.getmtime(s) for s in _SRCS
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.asr_render_frames.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, f32p,
        ]
        lib.asr_render_frames.restype = None
        lib.asr_pipeline_create.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.asr_pipeline_create.restype = ctypes.c_void_p
        lib.asr_pipeline_next.argtypes = [ctypes.c_void_p, f32p]
        lib.asr_pipeline_next.restype = ctypes.c_int
        lib.asr_pipeline_destroy.argtypes = [ctypes.c_void_p]
        lib.asr_pipeline_destroy.restype = None
        lib.asr_version.restype = ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.vio_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.vio_open.restype = ctypes.c_void_p
        lib.vio_next.argtypes = [ctypes.c_void_p, u8p]
        lib.vio_next.restype = ctypes.c_int
        lib.vio_close.argtypes = [ctypes.c_void_p]
        lib.vio_close.restype = None
        _LIB = lib
        return lib


class Y4MReader:
    """Native Y4M (YUV4MPEG2) file reader — luma plane only, prefetched by a
    C++ worker thread (video_io.cpp). The framework's cv2-free replay path.

    Usage::

        with Y4MReader(path) as r:
            frames = r.read_batch(8)   # (n<=8, H, W) uint8, n==0 at EOF
    """

    def __init__(self, path: str):
        self._lib = load_library()
        w = ctypes.c_int()
        h = ctypes.c_int()
        fn = ctypes.c_long()
        fd = ctypes.c_long()
        self._h = self._lib.vio_open(
            os.fsencode(path), ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(fn), ctypes.byref(fd),
        )
        if not self._h:
            raise OSError(f"cannot open Y4M stream: {path}")
        self.width = w.value
        self.height = h.value
        self.fps = fn.value / max(fd.value, 1)

    def read(self) -> np.ndarray | None:
        """Next frame as (H, W) uint8, or None at EOF."""
        out = np.empty((self.height, self.width), np.uint8)
        ok = self._lib.vio_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        return out if ok else None

    def read_batch(self, n: int) -> np.ndarray:
        """Up to n frames stacked (k, H, W) uint8; k < n only at EOF."""
        frames = []
        for _ in range(n):
            f = self.read()
            if f is None:
                break
            frames.append(f)
        if not frames:
            return np.empty((0, self.height, self.width), np.uint8)
        return np.stack(frames)

    def close(self) -> None:
        if self._h:
            self._lib.vio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _scene_arrays(scene, camera):
    tex = np.ascontiguousarray(np.asarray(scene.textures), dtype=np.float32)
    pos = np.ascontiguousarray(np.asarray(scene.tag_pos), dtype=np.float32)
    rot = np.ascontiguousarray(np.asarray(scene.tag_rot), dtype=np.float32)
    return tex, pos, rot


def render_frames_native(
    scene,
    cam_pos: np.ndarray,
    cam_rot: np.ndarray,
    camera,
    height: int,
    width: int,
    supersample: int = 2,
    n_threads: int | None = None,
) -> np.ndarray:
    """CPU rasterizer with the same signature semantics as
    sim.rasterizer.render_frames (scene: SceneTensors, camera: PinholeCamera).
    Returns (B, height, width) float32 in [0, 1]."""
    lib = load_library()
    tex, tpos, trot = _scene_arrays(scene, camera)
    cp = np.ascontiguousarray(cam_pos, dtype=np.float32)
    cr = np.ascontiguousarray(cam_rot, dtype=np.float32)
    B = cp.shape[0]
    out = np.empty((B, height, width), dtype=np.float32)
    nt = n_threads or min(os.cpu_count() or 1, B)
    lib.asr_render_frames(
        _fp(tex), tex.shape[0], tex.shape[1], _fp(tpos), _fp(trot),
        float(scene.outer_half), float(scene.background), float(scene.near_clip),
        float(scene.far_clip), float(camera.fx), float(camera.fy),
        float(camera.cx), float(camera.cy),
        _fp(cp), _fp(cr), B, height, width, int(supersample), int(nt), _fp(out),
    )
    return out


class FramePipeline:
    """Async frame producer: C++ threads render batches ahead of the consumer.

    Usage::

        with FramePipeline(scene, cam, traj.positions, traj.rotations,
                           height=H, width=W, batch=8) as pipe:
            for first_idx, frames in pipe:
                ...  # frames: (batch, H, W) float32
    """

    def __init__(self, scene, camera, positions, rotations, height, width,
                 batch=8, supersample=2, n_slots=3, n_threads=None):
        self._lib = load_library()
        tex, tpos, trot = _scene_arrays(scene, camera)
        pos = np.ascontiguousarray(positions, dtype=np.float32)
        rot = np.ascontiguousarray(rotations, dtype=np.float32)
        self.batch = batch
        self.height = height
        self.width = width
        self.n_frames = (pos.shape[0] // batch) * batch
        nt = n_threads or max(1, (os.cpu_count() or 2) - 1)
        # Keep references so buffers outlive the C++ copies being made.
        self._keep = (tex, tpos, trot, pos, rot)
        self._handle = self._lib.asr_pipeline_create(
            _fp(tex), tex.shape[0], tex.shape[1], _fp(tpos), _fp(trot),
            float(scene.outer_half), float(scene.background), float(scene.near_clip),
            float(scene.far_clip), float(camera.fx), float(camera.fy),
            float(camera.cx), float(camera.cy),
            _fp(pos), _fp(rot), self.n_frames, height, width, batch,
            int(supersample), int(n_slots), int(nt),
        )

    def __iter__(self):
        buf = np.empty((self.batch, self.height, self.width), dtype=np.float32)
        while True:
            first = self._lib.asr_pipeline_next(self._handle, _fp(buf))
            if first < 0:
                return
            yield first, buf.copy()

    def close(self):
        if self._handle:
            self._lib.asr_pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
