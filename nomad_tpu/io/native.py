"""ctypes bindings for the native C++ ingest library (native/
nomad_native.cpp) — the GIL-free host-side decode/resample/batch path
standing in for the reference's torchaudio C++ layer.

Auto-builds the .so with the repo Makefile on first use; every entry point
degrades gracefully to the pure-Python implementations in
:mod:`nomad_tpu.io` when the toolchain or library is unavailable, and the
test suite asserts byte-level agreement between the two paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libnomad_native.so"))

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _cpu_signature() -> str:
    """Host CPU feature signature: the library builds -march=native, so a
    .so persisted in the workspace must be rebuilt when a later run lands
    on a host with different features (same SIGILL class as the XLA
    compile-cache machine-feature mismatch the bench once logged)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    return hashlib.sha256(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                        .encode()
                    ).hexdigest()[:16]
    except OSError:
        pass
    return "unknown"


_STAMP_PATH = _LIB_PATH + ".cpu"


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.isfile(_LIB_PATH)
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        with open(_STAMP_PATH, "w") as f:
            f.write(_cpu_signature())
    except Exception:
        return False
    return os.path.isfile(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        stale = False
        if os.path.isfile(_LIB_PATH):
            so_mtime = os.path.getmtime(_LIB_PATH)
            for src in os.listdir(_NATIVE_DIR):
                if src.endswith(".cpp") or src.endswith(".h"):
                    p = os.path.join(_NATIVE_DIR, src)
                    if os.path.getmtime(p) > so_mtime:
                        stale = True
                        break
            if not stale:
                # different host CPU than the one that built the .so:
                # -march=native code could SIGILL — force a rebuild (make
                # won't, the .so is newer than the sources)
                try:
                    with open(_STAMP_PATH) as f:
                        stale = f.read().strip() != _cpu_signature()
                except OSError:
                    stale = True
                if stale:
                    try:
                        os.remove(_LIB_PATH)
                    except OSError:
                        pass
        if (not os.path.isfile(_LIB_PATH) or stale) and not _try_build():
            if not os.path.isfile(_LIB_PATH):
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.nomad_native_abi_version.restype = ctypes.c_int
        if lib.nomad_native_abi_version() != 1:
            return None
        if not hasattr(lib, "nomad_load_batch_q16"):
            return None  # stale .so that a failed rebuild left behind
        lib.nomad_decode_wav.restype = ctypes.c_int
        lib.nomad_decode_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nomad_wav_info.restype = ctypes.c_int
        lib.nomad_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nomad_probe.restype = ctypes.c_int
        lib.nomad_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.nomad_load_batch_i16.restype = ctypes.c_int
        lib.nomad_load_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.nomad_load_batch.restype = ctypes.c_int
        lib.nomad_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.nomad_load_batch_q16.restype = ctypes.c_int
        lib.nomad_load_batch_q16.argtypes = (
            lib.nomad_load_batch.argtypes[:2]
            + [ctypes.POINTER(ctypes.c_int16)]
            + lib.nomad_load_batch.argtypes[3:]
        )
        if hasattr(lib, "nomad_pack_i16"):  # additive API (wire codec)
            lib.nomad_pack_i16.restype = ctypes.c_int64
            lib.nomad_pack_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int,
            ]
        _lib = lib
    return _lib


def native_pack_i16(batch, num_threads: int = 8):
    """C++ wire-codec encoder (see ops/wirecodec.py for the format).
    batch: contiguous [NB*S] or [B, T] int16 with S=1024-divisible sample
    count. Returns (packed u32[total], widths, offsets, firsts) or None."""
    import numpy as np

    lib = get_lib()
    if lib is None or not hasattr(lib, "nomad_pack_i16"):
        return None
    arr = np.ascontiguousarray(batch, dtype=np.int16)
    n = arr.size
    if n % 1024:
        return None
    nb = n // 1024
    cap = nb * (17 * 1024 // 32) + 2
    packed = np.empty(cap, np.uint32)
    widths = np.empty(nb, np.int32)
    offsets = np.empty(nb, np.int32)
    firsts = np.empty(nb, np.int32)
    total = lib.nomad_pack_i16(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        nb,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cap,
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        firsts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(num_threads),
    )
    if total < 0:
        return None
    return packed[:total], widths, offsets, firsts


def available() -> bool:
    return get_lib() is not None


def native_wav_info(path: str):
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    rc = lib.nomad_wav_info(path.encode(), ctypes.byref(sr),
                            ctypes.byref(frames), ctypes.byref(ch))
    if rc != 0:
        return None
    return int(sr.value), int(frames.value), int(ch.value)


def native_decode(path: str, max_samples: int = 1 << 26):
    """Decode one file to mono float32 (no resample). None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    info = native_wav_info(path)
    if info is None:
        return None
    sr, frames, _ch = info
    out = np.empty(min(frames, max_samples), np.float32)
    out_len = ctypes.c_int64()
    got_sr = ctypes.c_int32()
    rc = lib.nomad_decode_wav(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[0],
        ctypes.byref(out_len),
        ctypes.byref(got_sr),
    )
    if rc != 0:
        return None
    return out[: out_len.value], int(got_sr.value)


def native_probe(path: str):
    """Format probe: (sr, frames, channels, bits, is_float, is_flac) or
    None."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    is_float = ctypes.c_int32()
    is_flac = ctypes.c_int32()
    rc = lib.nomad_probe(
        path.encode(), ctypes.byref(sr), ctypes.byref(frames),
        ctypes.byref(ch), ctypes.byref(bits), ctypes.byref(is_float),
        ctypes.byref(is_flac),
    )
    if rc != 0:
        return None
    return (int(sr.value), int(frames.value), int(ch.value), int(bits.value),
            bool(is_float.value), bool(is_flac.value))


def native_load_batch_i16(
    paths: Sequence[str],
    pad_len: int,
    target_sr: int = 16000,
    trim_sec: int = 0,
    num_threads: int = 0,
):
    """Raw-int16 batched loader for mono PCM16 files at target_sr (half the
    transfer bytes of the float path, exact on-device dequantize). Returns
    (int16 batch, lengths, err_flags) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    batch = np.empty((n, pad_len), np.int16)
    lengths = np.empty((n,), np.int64)
    errs = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = min(16, os.cpu_count() or 4)
    lib.nomad_load_batch_i16(
        c_paths, n,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        pad_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        target_sr, trim_sec, num_threads,
    )
    return batch, lengths, errs


def native_load_batch(
    paths: Sequence[str],
    pad_len: int,
    target_sr: int = 16000,
    trim_sec: int = 0,
    expect_sr: int = 0,
    num_threads: int = 0,
    quantize_i16: bool = False,
):
    """Threaded decode+fold+resample+pad of a file list into one
    [n, pad_len] batch. Returns (batch, lengths, err_flags) or None when
    the native library is unavailable. Files at rates other than
    target_sr/expect_sr get err_flags != 0 for Python-side retry.

    quantize_i16=True emits an int16 batch quantized to the PCM16 grid in
    C++ (half the host->device bytes for resampled/converted sources;
    max re-quantization error 1/65536 per sample)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    dtype = np.int16 if quantize_i16 else np.float32
    batch = np.empty((n, pad_len), dtype)
    lengths = np.empty((n,), np.int64)
    errs = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])

    kern_ptr = None
    klen = width = og = ng = 0
    if expect_sr and expect_sr != target_sr:
        from .resample import sinc_resample_kernel

        kernels, width, og, ng = sinc_resample_kernel(expect_sr, target_sr)
        kernels = np.ascontiguousarray(kernels, np.float32)
        klen = kernels.shape[1]
        kern_ptr = kernels.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    if num_threads <= 0:
        num_threads = min(16, os.cpu_count() or 4)
    fn = lib.nomad_load_batch_q16 if quantize_i16 else lib.nomad_load_batch
    ptr_t = ctypes.c_int16 if quantize_i16 else ctypes.c_float
    fn(
        c_paths,
        n,
        batch.ctypes.data_as(ctypes.POINTER(ptr_t)),
        pad_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        target_sr,
        trim_sec,
        kern_ptr,
        klen,
        width,
        og,
        ng,
        expect_sr,
        num_threads,
    )
    return batch, lengths, errs
