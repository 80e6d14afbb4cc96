"""VNR packed-record dataset: Python writer + ctypes binding to the native
C++ batch loader (native/vnr.cpp).

``pack_dataset`` converts a generated dataset directory (videos/ +
encoded_questions/ + labels.json + q_ids.json) into one .vnr file per split;
``VNRBatchLoader`` then assembles training batches through the C++ thread pool
(decompress + 1-of-4 random subsample + pad) with the same epoch API as
data.pipeline.BatchLoader.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import struct
import subprocess
import zlib

import ml_dtypes
import numpy as np

from videonavqa_tpu.data.buckets import resolve_frame_buckets
from videonavqa_tpu.data.pipeline import DataPaths, _decode_video, load_json
from videonavqa_tpu.utils import constants as C

_MAGIC = 0x31524E56
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "vnr.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libvnr.so")


def ensure_built(force=False):
    """Compile native/vnr.cpp -> libvnr.so if missing or stale."""
    if not force and os.path.exists(_LIB) and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
           "-lz", "-lzstd", "-lpthread"]
    subprocess.run(cmd, check=True)
    return _LIB


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.vnr_open.restype = ctypes.c_void_p
        lib.vnr_open.argtypes = [ctypes.c_char_p]
        lib.vnr_num_examples.argtypes = [ctypes.c_void_p]
        lib.vnr_lengths.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vnr_batch.restype = ctypes.c_int
        lib.vnr_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.vnr_frame_info.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vnr_example_full.restype = ctypes.c_int
        lib.vnr_example_full.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int]
        lib.vnr_close.argtypes = [ctypes.c_void_p]
        lib.vnr_zstd_compress.restype = ctypes.c_int64
        lib.vnr_zstd_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int]
        lib.vnr_zstd_bound.restype = ctypes.c_int64
        lib.vnr_zstd_bound.argtypes = [ctypes.c_int64]
        _lib = lib
    return _lib


def _zstd_compress(raw: bytes, level: int = 1) -> bytes:
    lib = _load_lib()
    cap = lib.vnr_zstd_bound(len(raw))
    dst = ctypes.create_string_buffer(cap)
    n = lib.vnr_zstd_compress(raw, len(raw), dst, cap, level)
    if n < 0:
        raise RuntimeError("zstd compression failed")
    return dst.raw[:n]


#: header flag values — frame codec (low byte of the flags field; the high
#: byte carries the payload code, see _PAYLOADS)
_CODEC_FLAGS = {None: 0, "raw": 0, "zlib": 1, "zstd": 2, True: 2, False: 0}

#: payload code -> (numpy dtype, batch key); code 0 = legacy video files
_PAYLOADS = {
    0: (np.dtype(np.uint8), "video"),
    1: (np.dtype(np.uint8), "video"),
    2: (np.dtype(ml_dtypes.bfloat16), "v_features"),
    3: (np.dtype(ml_dtypes.float8_e4m3fn), "v_features"),
}
_PAYLOAD_CODES = {"u8": 1, "bfloat16": 2, "float8_e4m3": 3}


class RecordWriter:
    """Streaming writer for the VNR container.

    A "frame" is an opaque [H, W, C] plane whose scalar type is named by
    ``payload``: 'u8' BGR pixels for video files, or 'bfloat16' /
    'float8_e4m3' frozen-stem feature values (stored as raw bit patterns) for
    feature-cache files written by cli/extract_features.py. Data blobs stream
    to a sidecar file so packing never holds the dataset in memory; the small
    index is buffered and the final file is assembled atomically on close().
    """

    def __init__(self, out_file, frame_shape, *, payload="u8", compress="zstd",
                 fingerprint=b""):
        self.out_file = out_file
        self.frame_shape = tuple(int(s) for s in frame_shape)
        self.payload_code = _PAYLOAD_CODES[payload]
        self.elem_size = _PAYLOADS[self.payload_code][0].itemsize
        self.codec = _CODEC_FLAGS[compress]
        assert len(fingerprint) <= 16, "fingerprint is at most 16 bytes"
        self.fingerprint = bytes(fingerprint).ljust(16, b"\0")
        self._index = []
        self._offset = 0
        self._data_path = out_file + ".data.tmp"
        self._data_f = open(self._data_path, "wb")

    def add(self, frames, tokens, label, q_id=0):
        """frames: [T, H, W, C] ndarray whose dtype itemsize == elem_size."""
        frames = np.ascontiguousarray(frames)
        assert frames.shape[1:] == self.frame_shape, frames.shape
        assert frames.dtype.itemsize == self.elem_size, frames.dtype
        blobs = []
        for frame in frames:
            raw = frame.tobytes()
            if self.codec == 1:
                blobs.append(zlib.compress(raw, 1))
            elif self.codec == 2:
                blobs.append(_zstd_compress(raw))
            else:
                blobs.append(raw)
        tokens = np.asarray(tokens, dtype=np.int64)
        idx = struct.pack("<QI", self._offset, len(blobs))
        idx += struct.pack(f"<{len(blobs)}I", *[len(b) for b in blobs])
        idx += struct.pack("<Iii", len(tokens), int(label), int(q_id))
        idx += tokens.tobytes()
        self._index.append(idx)
        for b in blobs:
            self._data_f.write(b)
            self._offset += len(b)

    def close(self):
        self._data_f.close()
        H, W, Ch = self.frame_shape
        flags = self.codec | (self.payload_code << 8)
        tmp = self.out_file + ".tmp"
        with open(tmp, "wb") as f:
            # header v2 appends a 16-byte provenance fingerprint (zero when
            # the payload has no upstream producer to pin, e.g. raw video)
            f.write(struct.pack("<IIIHHHH", _MAGIC, 2, len(self._index),
                                H, W, Ch, flags))
            f.write(self.fingerprint)
            f.writelines(self._index)
            with open(self._data_path, "rb") as d:
                shutil.copyfileobj(d, f)
        os.remove(self._data_path)
        os.replace(tmp, self.out_file)

    def abort(self):
        """Remove partial outputs (crash/exception cleanup)."""
        try:
            self._data_f.close()
        finally:
            for p in (self._data_path, self.out_file + ".tmp"):
                if os.path.exists(p):
                    os.remove(p)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.close()
        else:
            self.abort()
        return False


def read_fingerprint(path):
    """The 16-byte provenance fingerprint of a .vnr/.fnr file, or None for
    legacy v1 headers (which predate provenance tracking). Reads only the
    header — no native handle needed."""
    with open(path, "rb") as f:
        head = f.read(20)
        if len(head) < 20:
            raise IOError(f"truncated VNR header in {path}")
        magic, version = struct.unpack_from("<II", head)
        if magic != _MAGIC:
            raise IOError(f"{path} is not a VNR file")
        if version < 2:
            return None
        fp = f.read(16)
        if len(fp) < 16:
            raise IOError(f"truncated VNR v2 header in {path}")
        return fp


def pack_dataset(base_dir, out_file, example_ids=None, *, compress="zstd"):
    """Pack (a split of) a dataset directory into a .vnr file.

    ``compress``: 'zstd' (default — 3-6x faster single-core decode than zlib
    at a similar ratio), 'zlib', or None/'raw'. Returns the list of example
    ids in file order (the loader's index space).
    """
    paths = DataPaths(base_dir)
    labels = load_json(paths.labels_file)
    q_ids = load_json(paths.q_ids_file) if os.path.exists(paths.q_ids_file) else {}
    ids = sorted(example_ids if example_ids is not None else labels)

    with RecordWriter(out_file, (C.VID_HEIGHT, C.VID_WIDTH, 3),
                      payload="u8", compress=compress) as w:
        for ex_id in ids:
            video = _decode_video(os.path.join(paths.videos_dir, ex_id))
            assert video.shape[1:] == (C.VID_HEIGHT, C.VID_WIDTH, 3), video.shape
            tokens = np.load(os.path.join(paths.questions_dir, ex_id + ".npy")).astype(np.int64)
            w.add(video, tokens, int(labels[ex_id]), int(q_ids.get(ex_id, 0)))
    return ids


class VNRBatchLoader:
    """Batch iterator over a .vnr file via the native thread pool.

    Same epoch()/len() surface as pipeline.BatchLoader (train/val drop-last,
    test pad-and-slice; optional length-bucketed batches with frame trimming).

    Works over both payloads the container supports: u8 video files (batch
    key "video") and bf16 frozen-stem feature files (batch key "v_features",
    elem_size 2) — the subsample/pad/bucket logic is identical, so a feature
    file built from every raw frame reproduces the exact frame picks of its
    source video file under the same (seed, index, epoch).
    """

    def __init__(self, path, batch_size, *, shuffle=True, mode="train",
                 num_threads=0, seed=0, bucket_by_length=False,
                 frame_buckets=None, deterministic=False, row_slice=None):
        """``row_slice=(start, size)``: multi-host feeding — every host
        computes the identical global batch composition (same seed/order/
        t_cap), but this loader decodes ONLY rows [start, start+size) of each
        batch (parallel/multihost.host_batch_slice). num_valid in yielded
        batches is then host-local."""
        from videonavqa_tpu.data.pipeline import BatchLoader

        self._lib = _load_lib()
        self._handle = self._lib.vnr_open(path.encode())
        if not self._handle:
            raise IOError(f"could not open VNR file {path}")
        self.n = self._lib.vnr_num_examples(self._handle)
        info = np.zeros(4, dtype=np.int32)
        self._lib.vnr_frame_info(self._handle,
                                 info.ctypes.data_as(ctypes.c_void_p))
        self.frame_shape = tuple(int(s) for s in info[:3])
        self.payload_code = int(info[3])
        if self.payload_code not in _PAYLOADS:
            raise ValueError(f"unsupported VNR payload code {self.payload_code}")
        self.frame_dtype, self.payload_key = _PAYLOADS[self.payload_code]
        self.elem_size = self.frame_dtype.itemsize
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.mode = mode
        self.num_threads = num_threads
        self.seed = seed
        self.deterministic = deterministic
        self.row_slice = row_slice
        self.bucket_by_length = bucket_by_length
        self._lengths = np.zeros(self.n, dtype=np.int32)
        self._lib.vnr_lengths(self._handle,
                              self._lengths.ctypes.data_as(ctypes.c_void_p))
        # "auto" resolves over the GLOBAL length table (not the row slice),
        # so multi-host loaders all pick the identical bucket set
        self.frame_buckets = resolve_frame_buckets(
            frame_buckets, lambda: self._lengths,
            BatchLoader.DEFAULT_FRAME_BUCKETS)

    @property
    def lengths(self):
        """Per-example subsampled video lengths [n] (container order) — the
        global table, independent of ``row_slice``."""
        return self._lengths

    def __len__(self):
        if self.mode == "test":
            return (self.n + self.batch_size - 1) // self.batch_size
        return self.n // self.batch_size

    def close(self):
        if self._handle:
            self._lib.vnr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def example_frames(self, idx, max_frames=None):
        """All raw frames of one example, [T, H, W, C] — the feature
        extractor's input view (no subsampling). ``max_frames`` defaults to
        the 140-frame cap the batch subsampler applies (4 * 35,
        eval/utils.py:19-20), so a feature file built from this view covers
        every frame the loader can later pick."""
        cap = (C.DROP_EVERY_N_FRAMES * C.MAX_ALLOWED_NUM_FRAMES_DROPPING
               if max_frames is None else max_frames)
        out = np.empty((cap, *self.frame_shape), dtype=self.frame_dtype)
        n = self._lib.vnr_example_full(
            self._handle, int(idx), out.ctypes.data_as(ctypes.c_void_p), cap)
        if n < 0:
            raise RuntimeError(f"vnr_example_full failed for example {idx}")
        return out[:n]

    def example_meta(self, idx):
        """(tokens, label, q_id) of one example, via a 1-example batch call."""
        q = np.empty((1, C.MAX_Q_LEN), dtype=np.int32)
        q_len = np.empty(1, dtype=np.int32)
        label = np.empty(1, dtype=np.int32)
        q_id = np.empty(1, dtype=np.int32)
        v_len = np.empty(1, dtype=np.int32)
        payload = np.empty((1, 1, *self.frame_shape), dtype=self.frame_dtype)
        idx_arr = np.asarray([idx], dtype=np.int32)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.vnr_batch(
            self._handle, ptr(idx_arr), 1, 1, ctypes.c_uint64(0), 0, 1,
            ptr(payload), ptr(v_len), ptr(q), ptr(q_len), ptr(label), ptr(q_id))
        if rc != 0:
            raise RuntimeError(f"vnr_batch failed with status {rc}")
        return q[0, :q_len[0]].astype(np.int64), int(label[0]), int(q_id[0])

    def _load(self, idxs, t_cap, epoch):
        if self.row_slice is not None:
            # decode only this host's rows; global t_cap/order already fixed
            start, size = self.row_slice
            n_valid_global = len(idxs)
            idxs = idxs[start:start + size]
            B = size
            n_valid = int(np.clip(n_valid_global - start, 0, size))
        else:
            B = self.batch_size
            n_valid = len(idxs)
        idx_arr = np.full(B, 0, dtype=np.int32)
        idx_arr[:len(idxs)] = idxs
        video = np.empty((B, t_cap, *self.frame_shape), dtype=self.frame_dtype)
        v_len = np.empty(B, dtype=np.int32)
        q = np.empty((B, C.MAX_Q_LEN), dtype=np.int32)
        q_len = np.empty(B, dtype=np.int32)
        label = np.empty(B, dtype=np.int32)
        q_id = np.empty(B, dtype=np.int32)
        ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        rc = self._lib.vnr_batch(
            self._handle, ptr(idx_arr), B, t_cap,
            ctypes.c_uint64(self.seed), 0 if self.deterministic else epoch,
            self.num_threads, ptr(video), ptr(v_len), ptr(q), ptr(q_len),
            ptr(label), ptr(q_id))
        if rc != 0:
            raise RuntimeError(f"vnr_batch failed with status {rc}")
        if n_valid < B:  # zero/sentinel padding like the test harness
            video[n_valid:] = 0
            v_len[n_valid:] = 1
            q[n_valid:] = 0
            q_len[n_valid:] = 1
            label[n_valid:] = 0
            q_id[n_valid:] = 35  # eval/q_and_v_test.py:86
        return {self.payload_key: video, "v_len": v_len, "question": q,
                "q_len": q_len, "label": label, "q_id": q_id,
                "num_valid": np.int32(n_valid)}

    def epoch(self, epoch=0):
        order = np.arange(self.n)
        rs = np.random.RandomState((self.seed, epoch).__hash__() & 0x7FFFFFFF)
        if self.shuffle:
            rs.shuffle(order)
        if self.bucket_by_length:
            order = order[np.argsort(-self._lengths[order], kind="stable")]
        starts = list(range(0, self.n, self.batch_size))
        if self.mode != "test":
            starts = [s for s in starts if s + self.batch_size <= self.n]
        if self.bucket_by_length and self.shuffle:
            rs.shuffle(starts)
        for s in starts:
            idxs = order[s: s + self.batch_size]
            t_max = int(self._lengths[idxs].max())
            if self.frame_buckets:
                t_cap = min((t for t in self.frame_buckets if t >= t_max),
                            default=C.MAX_ALLOWED_NUM_FRAMES_DROPPING)
            else:
                t_cap = C.MAX_ALLOWED_NUM_FRAMES_DROPPING
            yield self._load(idxs, t_cap, epoch)
