"""Lossless int16 wire codec: delta + zigzag + per-block bit packing,
encoded on host (numpy), decoded ON-DEVICE under jit.

Why: the scoring pipeline is wire-bound — at steady state the whole
forward hides under the host->device transfer, so payload bytes ARE the
headline. int16 already halves f32; this squeezes the remaining
redundancy of PCM audio. The relay's own compression does NOT capture it
(measured: bench audio transfers at 1.05x the rate of random bytes, while
a 0.75x-size payload moves 1.29x faster), and zlib-style byte codecs were
already rejected in round 2 (~0.10 ratio gain). Delta+bit-packing is the
classic audio answer (FLAC's fixed-predictor core): typical speech packs
to ~9-12 bits/sample, bench-style noisy tones to ~13.

Scheme (exactly invertible, no entropy coder so the decoder vectorizes):
  * the [B, T] int16 batch is split into S=1024-sample blocks;
  * per block: the first sample is stored raw (int32 side array), the
    first-order deltas are zigzag-mapped to unsigned, and the block's max
    determines its bit width w in [0, 17];
  * the block's values are stored BIT-PLANE-wise per 32-sample group:
    word (g, k) holds bit k of the group's 32 values (bit j = sample j),
    w words per group, 32 groups per block, word-aligned per block
    (offsets side array);
  * device decode (jit): ONE element gather of [NB, 32, MAX_W] plane
    words + 17 shift/mask passes, un-zigzag, cumsum along the block,
    plus the block-first values. The bit-plane layout exists because TPU
    gathers run at ~90-110 M elements/s regardless of addressing
    (measured): the per-sample LSB-packed layout needed two
    [NB, 1024]-element gathers (300 ms/batch — comparable to the model
    forward itself), the plane layout needs one [NB, 32, 17] gather
    (~95 ms) and pure vector ops after.

The packed stream length is data-dependent; it is padded to a quantized
bucket of words so XLA sees a bounded set of decode shapes.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

S = 1024  # samples per block (engine bucket lengths are multiples of 4096)
MAX_W = 17  # zigzag of int16 first-differences needs at most 17 bits
MIN_PACK_WORDS = 1 << 12  # 16 KB floor for the padded packed stream


def _pack_bucket(n: int) -> int:
    """Quantized packed-stream length: 1/16-octave steps above a 16 KB
    floor — bounded decode-shape count, <= 6.25% padding waste (a coarser
    half-octave grid cost 21% on the 96x10s bench batch, wiping out the
    packing gain)."""
    if n <= MIN_PACK_WORDS:
        return MIN_PACK_WORDS
    p = 1 << ((n - 1).bit_length() - 1)
    step = max(MIN_PACK_WORDS, p // 16)
    return ((n + step - 1) // step) * step


def encode(batch: np.ndarray, pool=None, chunks: int = 8):
    """Pack a [B, T] int16 array (T % S == 0).

    Returns dict(packed u32[Wp], widths i32[NB], offsets i32[NB],
    firsts i32[NB], shape (B, T), nbytes int) — or None when the input
    doesn't qualify (wrong dtype/shape).

    With ``pool`` (a ThreadPoolExecutor), rows split across threads and
    the per-chunk streams merge with shifted offsets — numpy releases the
    GIL, so the 31 MB bench batch encodes in ~0.2 s instead of ~0.9 s
    (the encode must stay cheaper than the wire time it saves)."""
    if batch.dtype != np.int16 or batch.ndim != 2 or batch.shape[1] % S:
        return None
    b, t = batch.shape
    try:  # C++ packer: ~60 ms for the 31 MB bench batch vs ~700 ms numpy
        from ..io.native import native_pack_i16

        nat = native_pack_i16(batch)
    except Exception:  # pragma: no cover - import/build failure
        nat = None
    if nat is not None:
        packed, widths, offsets, firsts = nat
        return _finalize(packed, widths, offsets.astype(np.int64),
                         firsts, b, t)
    if pool is not None and b >= 2 * chunks:
        parts = [p for p in pool.map(
            _encode_core, np.array_split(batch, chunks, axis=0)
        )]
        base = 0
        packed_parts, widths_p, offsets_p, firsts_p = [], [], [], []
        for packed_c, widths_c, offsets_c, firsts_c in parts:
            packed_parts.append(packed_c)
            widths_p.append(widths_c)
            offsets_p.append(offsets_c + base)
            firsts_p.append(firsts_c)
            base += len(packed_c)
        return _finalize(
            np.concatenate(packed_parts) if packed_parts else
            np.zeros(0, np.uint32),
            np.concatenate(widths_p), np.concatenate(offsets_p),
            np.concatenate(firsts_p), b, t,
        )
    return _finalize(*_encode_core(batch), b, t)


def _finalize(packed, widths, offsets, firsts, b, t):
    # +1 guard word (the decoder's straddle gather reads wi+1), then pad
    # the stream to its quantized bucket
    wp = _pack_bucket(len(packed) + 1)
    packed = np.pad(packed, (0, wp - len(packed)))
    meta_bytes = widths.nbytes + 4 * len(offsets) + firsts.nbytes
    return {
        "packed": packed,
        "widths": widths,
        "offsets": offsets.astype(np.int32),
        "firsts": firsts,
        "shape": (b, t),
        "nbytes": packed.nbytes + meta_bytes,
    }


def _encode_core(batch: np.ndarray):
    """Pack rows into an exact-length word stream; returns
    (packed u32[total], widths, offsets i64, firsts)."""
    b, t = batch.shape
    nb = t // S
    x = batch.astype(np.int32).reshape(b * nb, S)
    d = np.empty_like(x)
    d[:, 0] = 0
    d[:, 1:] = x[:, 1:] - x[:, :-1]
    z = ((d << 1) ^ (d >> 31)).astype(np.uint32)  # zigzag, < 2^17
    mx = z.max(axis=1)
    # bit width per block: bit_length(mx)
    widths = np.zeros(b * nb, np.int32)
    nz = mx > 0
    widths[nz] = np.floor(np.log2(mx[nz].astype(np.float64))).astype(np.int32) + 1
    nwords = (widths.astype(np.int64) * S + 31) // 32
    offsets = np.zeros(b * nb, np.int64)
    offsets[1:] = np.cumsum(nwords)[:-1]
    total = int(offsets[-1] + nwords[-1]) if b * nb else 0

    packed = np.zeros(total, np.uint32)
    # bit-plane transpose per 32-sample group: word (g, k) = bit k of the
    # group's 32 zigzag values (bit position j = sample j). Grouped by
    # block width so the per-width pass count is exact.
    pos = np.arange(32, dtype=np.uint32)[None, None, :]
    for w in np.unique(widths):
        if w == 0:
            continue
        w = int(w)
        sel = np.flatnonzero(widths == w)
        m = len(sel)
        zz = z[sel].reshape(m, S // 32, 32)
        words = np.empty((m, S // 32, w), np.uint32)
        for k in range(w):
            words[:, :, k] = (((zz >> np.uint32(k)) & np.uint32(1)) << pos
                              ).sum(axis=-1, dtype=np.uint32)
        nw = S // 32 * w  # == nwords for this width
        idx = offsets[sel][:, None] + np.arange(nw)[None, :]
        packed[idx.ravel()] = words.reshape(m, nw).ravel()
    return packed, widths, offsets, x[:, 0].copy()


@functools.partial(jax.jit, static_argnames=("b", "t"))
def _decode_jit(packed, meta, b: int, t: int):
    """packed: uint32, any shape (raveled inside — avoids an eager
    device-side reshape per batch); meta: [3, NB] int32 rows =
    (widths, offsets, firsts)."""
    return _decode_body(packed.reshape(-1), meta, b, t)


def meta_rows(b: int, t: int) -> int:
    """Rows of MIN_PACK_WORDS uint32 words the [3, NB] meta occupies in a
    combined frame (static given the batch shape)."""
    nb_meta = 3 * b * (t // S)
    return -(-nb_meta // MIN_PACK_WORDS)


def combined_rows(enc: dict) -> np.ndarray:
    """One-transfer frame: the bucket-padded packed stream reshaped to
    [Rp, MIN_PACK_WORDS] with the int32 meta (widths/offsets/firsts)
    bit-viewed to uint32 and appended as tail rows. The packed path then
    costs the SAME host->device RPC count as shipping raw — the separate
    meta device_put was a fixed ~1 RTT per batch that dominated on
    high-latency relay sessions. Meta row count is static given (b, t),
    so the decoder slices it back out with static shapes."""
    b, t = enc["shape"]
    rows = enc["packed"].reshape(-1, MIN_PACK_WORDS)
    m = pack_meta(enc).astype(np.int32).view(np.uint32).ravel()
    mr = meta_rows(b, t)
    tail = np.zeros(mr * MIN_PACK_WORDS, np.uint32)
    tail[: len(m)] = m
    return np.concatenate([rows, tail.reshape(mr, MIN_PACK_WORDS)], axis=0)


@functools.partial(jax.jit, static_argnames=("b", "t"))
def _decode_combined_jit(combined, b: int, t: int):
    """Decode a combined frame (see combined_rows): static-slice the meta
    tail rows back out, bitcast to int32, and run the plane decode on the
    packed head."""
    return decode_combined_traced(combined, b, t)


def decode_combined_traced(combined, b: int, t: int):
    """Traceable body of the combined decode — call this INSIDE another
    jitted computation (e.g. a fused decode+forward executable) to avoid
    a separate dispatch; use decode_combined_call for a standalone
    decode."""
    flat = combined.reshape(-1)
    nb_meta = 3 * b * (t // S)
    split = flat.shape[0] - meta_rows(b, t) * MIN_PACK_WORDS
    packed = flat[:split]
    meta = jax.lax.bitcast_convert_type(
        flat[split : split + nb_meta], jnp.int32
    ).reshape(3, b * (t // S))
    return _decode_body(packed, meta, b, t)


def _decode_body(packed, meta, b: int, t: int):
    widths, offsets, firsts = meta[0], meta[1], meta[2]
    nb = t // S
    w = widths.astype(jnp.uint32)[:, None, None]  # [NB, 1, 1]
    g = jnp.arange(S // 32, dtype=jnp.int32)[None, :, None]  # groups
    k = jnp.arange(MAX_W, dtype=jnp.int32)[None, None, :]  # planes
    # plane word (g, k) of block n lives at offsets[n] + g*w + k; indices
    # for k >= w read past the block — clamped by the gather, masked below
    wi = offsets.astype(jnp.int32)[:, None, None] + g * w.astype(jnp.int32) + k
    words = packed[jnp.clip(wi, 0, packed.shape[0] - 1)]  # [NB, G, MAX_W]
    words = jnp.where(k < w.astype(jnp.int32), words, jnp.uint32(0))
    # reassemble sample j of each group from its 17 plane bits
    j = jnp.arange(32, dtype=jnp.uint32)[None, None, :]  # [1, 1, 32]
    v = jnp.zeros((b * nb, S // 32, 32), jnp.uint32)
    for kk in range(MAX_W):
        bit = (words[:, :, kk][:, :, None] >> j) & jnp.uint32(1)
        v = v | (bit << jnp.uint32(kk))
    v = v.reshape(b * nb, S)
    # un-zigzag: d = (v >> 1) ^ -(v & 1)
    d = ((v >> 1).astype(jnp.int32)) ^ (-(v & 1).astype(jnp.int32))
    x = firsts.astype(jnp.int32)[:, None] + jnp.cumsum(d, axis=1)
    return x.reshape(b, t).astype(jnp.int16)


def pack_meta(enc: dict) -> np.ndarray:
    """[3, NB] int32 (widths, offsets, firsts) — ships as ONE device_put
    instead of three."""
    return np.stack([enc["widths"], enc["offsets"], enc["firsts"]])


def decode_on_device(enc: dict, device=None):
    """device_put the packed payload and decode under jit -> [B, T] int16
    device array (bit-exact with the encoder input)."""
    b, t = enc["shape"]
    packed = jax.device_put(enc["packed"], device)
    meta = jax.device_put(pack_meta(enc), device)
    return _decode_jit(packed, meta, b=b, t=t)


# AOT-retained decode executables (same lesson as the engine's model
# shapes: fn.lower().compile() work is unreachable from jit dispatch, so
# keep the Compiled and call it directly). Keyed ("c", rows_shape, b, t)
# for combined frames — the only prewarmed decode format; the split
# packed+meta decode (_decode_jit) remains for decode_on_device and the
# host-side tests.
_decode_aot: dict = {}


def prewarm_decode_combined(rows_shape, b: int, t: int) -> None:
    """AOT-compile the standalone combined-frame decode for this shape
    key (used by the raw-vs-packed race; the steady packed path fuses the
    decode into the model forward instead — see the engine)."""
    key = ("c", tuple(rows_shape), b, t)
    if key in _decode_aot:
        return
    _decode_aot[key] = _decode_combined_jit.lower(
        jax.ShapeDtypeStruct(tuple(rows_shape), jnp.uint32), b=b, t=t
    ).compile()


def decode_combined_call(combined, b: int, t: int):
    key = ("c", tuple(combined.shape), b, t)
    fn = _decode_aot.get(key)
    if fn is not None:
        try:
            return fn(combined)
        except (TypeError, ValueError):  # aval/device mismatch
            _decode_aot.pop(key, None)
    return _decode_combined_jit(combined, b=b, t=t)


# The raw-vs-packed race must not pay a standalone-decode COMPILE inline:
# on a relay session that is a 10-20 s stall inside the race span (measured
# round 4: engine.put.codec_race at 1.6 MB/s while the put probe ran the
# same wire at 47 MB/s — the gap was compiles, not bytes). The engine asks
# decode_combined_ready() first and, when cold, prewarms HERE on a daemon
# thread while it ships the race's packed half as raw instead.
_prewarm_lock = threading.Lock()
_prewarm_inflight: set = set()
_prewarm_threads: list = []  # live prewarm threads, joined at exit


def _join_prewarms(timeout: float = 60.0) -> None:
    """atexit hook: a daemon thread still inside an XLA compile when the
    interpreter exits gets killed mid-RPC and the PJRT C++ layer calls
    terminate() — observed as bench_large exiting SIGABRT (134) AFTER a
    clean run because a cold-race prewarm was still compiling over the
    relay. Joining here (atexit runs before daemon threads are killed)
    lets in-flight compiles finish; the bound keeps a wedged relay from
    hanging process exit forever."""
    import time as _time

    deadline = _time.monotonic() + timeout
    for th in list(_prewarm_threads):
        th.join(max(0.0, deadline - _time.monotonic()))


import atexit as _atexit

_atexit.register(_join_prewarms)


def decode_combined_ready(rows_shape, b: int, t: int) -> bool:
    """True when the standalone combined-frame decode for this shape key is
    already AOT-compiled (a decode_combined_call will dispatch, not
    compile)."""
    return ("c", tuple(rows_shape), b, t) in _decode_aot


def prewarm_decode_combined_async(rows_shape, b: int, t: int):
    """Kick the standalone decode compile for this shape key on a daemon
    thread (idempotent per key; no-op when warm or already in flight).
    Returns the Thread when one was started (tests join it), else None."""
    key = ("c", tuple(rows_shape), b, t)
    with _prewarm_lock:
        if key in _decode_aot or key in _prewarm_inflight:
            return None
        _prewarm_inflight.add(key)

    def run():
        try:
            from ..utils.cache import cached_compile_guard

            with cached_compile_guard():
                prewarm_decode_combined(rows_shape, b, t)
        except Exception:  # pragma: no cover - compile failure falls back
            pass  # next warm check stays False; the race keeps shipping raw
        finally:
            with _prewarm_lock:
                _prewarm_inflight.discard(key)
                _prewarm_threads.remove(th)

    th = threading.Thread(target=run, daemon=True, name="wirecodec-prewarm")
    with _prewarm_lock:
        _prewarm_threads.append(th)
    th.start()
    return th


def decode_numpy(enc: dict) -> np.ndarray:
    """Host-side reference decoder (tests / CPU fallback)."""
    b, t = enc["shape"]
    nb = t // S
    widths = enc["widths"].astype(np.int64)
    offsets = enc["offsets"].astype(np.int64)
    packed = enc["packed"]
    g = np.arange(S // 32, dtype=np.int64)[None, :, None]
    k = np.arange(MAX_W, dtype=np.int64)[None, None, :]
    wi = offsets[:, None, None] + g * widths[:, None, None] + k
    words = packed[np.clip(wi, 0, len(packed) - 1)]
    words = np.where(k < widths[:, None, None], words, np.uint32(0))
    j = np.arange(32, dtype=np.uint32)[None, None, :]
    v = np.zeros((b * nb, S // 32, 32), np.uint32)
    for kk in range(MAX_W):
        bit = (words[:, :, kk][:, :, None] >> j) & np.uint32(1)
        v |= bit << np.uint32(kk)
    v = v.reshape(b * nb, S)
    d = (v >> 1).astype(np.int32) ^ (-(v & 1).astype(np.int32))
    out = enc["firsts"].astype(np.int32)[:, None] + np.cumsum(d, axis=1)
    return out.reshape(b, t).astype(np.int16)
