"""Python bindings for the native frame store (``native/framestore.cc``).

``FrameStoreWriter`` packs per-trajectory JPEG frames into one mmap-able
shard; ``FrameStore`` opens it through the C++ library (ctypes) and decodes
single frames or whole batches on a native thread pool — the data-plane
replacement for the reference's in-RAM RLDS dict + tf.data C++ runtime
(SURVEY §2 #20/#21). The shared library is built on demand with g++
(``-O2 -ljpeg``) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

from emmax_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

_MAGIC = 0x31534645  # "EFS1"
_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "framestore.cc"
_LIB = _NATIVE_DIR / "libemmax_framestore.so"


def build_native(force: bool = False) -> Path:
    """Compile the shared library if missing/stale."""
    if not force and _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", str(_SRC),
           "-o", str(_LIB), "-ljpeg", "-lpthread"]
    overwatch.info(f"building native frame store: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(build_native()))
    lib.efs_open.restype = ctypes.c_void_p
    lib.efs_open.argtypes = [ctypes.c_char_p]
    lib.efs_close.argtypes = [ctypes.c_void_p]
    lib.efs_num_trajs.restype = ctypes.c_int64
    lib.efs_num_trajs.argtypes = [ctypes.c_void_p]
    lib.efs_lookup.restype = ctypes.c_int64
    lib.efs_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.efs_traj_key.restype = ctypes.c_int32
    lib.efs_traj_key.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                 ctypes.c_char_p, ctypes.c_int32]
    lib.efs_frame_info.restype = ctypes.c_int32
    lib.efs_frame_info.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_uint32),
                                   ctypes.POINTER(ctypes.c_uint32)]
    lib.efs_decode_frame.restype = ctypes.c_int32
    lib.efs_decode_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int32, ctypes.c_char_p]
    lib.efs_decode_batch.restype = ctypes.c_int32
    lib.efs_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_char_p,
        ctypes.c_uint32, ctypes.c_uint32]
    return lib


class FrameStoreWriter:
    """Pack trajectories of JPEG frames into an EFS1 shard."""

    def __init__(self, path) -> None:
        self.path = Path(path)
        self._trajs: List[Tuple[str, List[Tuple[bytes, int, int]]]] = []

    def add_trajectory(self, key: str,
                       jpeg_frames: Sequence[bytes]) -> None:
        frames = []
        for blob in jpeg_frames:
            w, h = _jpeg_dims(blob)
            frames.append((bytes(blob), w, h))
        self._trajs.append((key, frames))

    def add_trajectory_arrays(self, key: str,
                              images: Sequence[np.ndarray],
                              quality: int = 95) -> None:
        import cv2

        blobs = []
        for img in images:
            ok, enc = cv2.imencode(".jpg", np.asarray(img)[..., ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, quality])
            assert ok
            blobs.append(enc.tobytes())
        self.add_trajectory(key, blobs)

    def finalize(self) -> Path:
        header = bytearray()
        header += struct.pack("<IQ", _MAGIC, len(self._trajs))
        # first pass: compute header size
        fixed = len(header)
        for key, frames in self._trajs:
            fixed += 4 + len(key.encode()) + 4 + len(frames) * 24
        offset = fixed
        payload_index = []
        for key, frames in self._trajs:
            kb = key.encode()
            header += struct.pack("<I", len(kb)) + kb
            header += struct.pack("<I", len(frames))
            for blob, w, h in frames:
                header += struct.pack("<QQII", offset, len(blob), w, h)
                payload_index.append(blob)
                offset += len(blob)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "wb") as f:
            f.write(header)
            for blob in payload_index:
                f.write(blob)
        return self.path


def _jpeg_dims(blob: bytes) -> Tuple[int, int]:
    """Parse JPEG SOF for (width, height) without decoding."""
    i = 2
    data = blob
    while i < len(data) - 8:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = (data[i + 5] << 8) | data[i + 6]
            w = (data[i + 7] << 8) | data[i + 8]
            return w, h
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = (data[i + 2] << 8) | data[i + 3]
        i += 2 + seg_len
    raise ValueError("no SOF marker found in JPEG")


class FrameStore:
    """FrameSource-compatible reader over an EFS1 shard (native decode)."""

    def __init__(self, path) -> None:
        self._lib = _load_lib()
        self._handle = self._lib.efs_open(str(path).encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot open frame store {path}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.efs_close(self._handle)
            self._handle = None

    @property
    def num_trajectories(self) -> int:
        return int(self._lib.efs_num_trajs(self._handle))

    def keys(self) -> List[str]:
        buf = ctypes.create_string_buffer(4096)
        out = []
        for t in range(self.num_trajectories):
            n = self._lib.efs_traj_key(self._handle, t, buf, 4096)
            out.append(buf.value.decode() if n >= 0 else "")
        return out

    def _traj(self, key: str) -> int:
        t = self._lib.efs_lookup(self._handle, key.encode())
        if t < 0:
            raise KeyError(key)
        return int(t)

    def traj_info(self, key: str) -> Tuple[int, int, int]:
        """(num_frames, width, height)."""
        w = ctypes.c_uint32()
        h = ctypes.c_uint32()
        n = self._lib.efs_frame_info(self._handle, self._traj(key),
                                     ctypes.byref(w), ctypes.byref(h))
        return int(n), int(w.value), int(h.value)

    def get_frame(self, key: str, index: int) -> np.ndarray:
        n, w, h = self.traj_info(key)
        out = np.empty((h, w, 3), np.uint8)
        rc = self._lib.efs_decode_frame(
            self._handle, self._traj(key), index,
            out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise RuntimeError(f"decode failed for {key}[{index}] rc={rc}")
        return out

    def get_batch(self, keys: Sequence[str], indices: Sequence[int]
                  ) -> np.ndarray:
        """Parallel native decode of a whole batch → [N, H, W, 3]."""
        assert len(keys) == len(indices)
        trajs = np.asarray([self._traj(k) for k in keys], np.int64)
        idxs = np.asarray(indices, np.int32)
        _, w, h = self.traj_info(keys[0])
        out = np.empty((len(keys), h, w, 3), np.uint8)
        rc = self._lib.efs_decode_batch(
            self._handle, trajs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(keys), out.ctypes.data_as(ctypes.c_char_p), w, h)
        if rc != 0:
            raise RuntimeError(f"{rc} frames failed to decode")
        return out


def pack_rlds_to_framestore(data_dir, out_path, splits=("train", "val")
                            ) -> Path:
    """One-time conversion: bridge tfrecords → EFS1 shard (the TPU-VM
    preprocessing step replacing the reference's per-run in-RAM indexing)."""
    from emmax_tpu.data.rlds import load_bridgev2_dataset

    writer = FrameStoreWriter(out_path)
    for split in splits:
        try:
            ds, _ = load_bridgev2_dataset(data_dir, split)
        except FileNotFoundError:
            continue
        for traj in ds.as_numpy_iterator():
            key = (traj["file_path"][0].decode() + "|"
                   + str(int(traj["episode_id"][0])))
            writer.add_trajectory(key, list(traj["observation"]["image_primary"]))
    return writer.finalize()
