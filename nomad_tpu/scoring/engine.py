"""Batched, bucketed embedding engine — the TPU replacement for the
reference's per-file batch-1 python hot loop
(`/root/reference/src/nomad_audio/nomad.py:172-183`).

Design (SURVEY §8 stage 4 + hard-part (b)):

  * Files are decoded/resampled on host (thread pool; numpy decode), then
    grouped into geometric length buckets (pad to the next power-of-two
    sample count, >= MIN_BUCKET). A handful of static shapes keeps XLA
    recompiles bounded while wasting < 2x compute on padding.
  * Each bucket runs as fixed [B, T] batches under one jitted function per
    shape; per-item true lengths drive the exact masking in the model, so
    batched padded scores equal the reference's unpadded batch-1 scores to
    float noise (quirk Q6 handled; validated in tests).
  * Optional 1-D 'data' mesh: the batch dim is sharded across chips; XLA
    all-gathers nothing (embeddings come back [B, 256], gathered at the
    host boundary).
  * Short final batches are padded with repeats of the last item and the
    extra rows dropped — shapes stay static, results stay exact.
"""

from __future__ import annotations

import math
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io import load_processing
from ..models.heads import NomadModel
from ..parallel.mesh import batch_sharding, replicated
from ..utils.profiling import timed

MIN_BUCKET = 4096  # samples (~0.26 s); below this, padding waste is noise
# ~96 files x 10 s per batch: measured on v5e (round-2 sweep, NOTES) —
# 1562/1796/2041/2152 wav-s/s at B=16/32/64/96 for 10 s buckets; the
# attention-score cap below keeps long-file buckets inside HBM.
DEFAULT_BATCH_SAMPLE_BUDGET = 96 * 163_840
# XLA materializes two [B, H, T', T'] f32 buffers per block (scores +
# softmax output; layers are sequential so only one block's pair is live).
# 19.8 GB demanded at [12, 12, 4095, 4095] OOMed a 15.75 GB v5e — cap the
# pair at 8 GB, leaving headroom for activations and the remat stack.
ATTN_SCORE_BYTES_BUDGET = 8 << 30
MAX_BATCH = 256
PCM16_SCALE = 32768.0


def _throttle_to(nbytes: int, t0: float) -> None:
    """Synthetic bad-weather wire (bench/test-only): when
    ``NOMAD_WIRE_THROTTLE_MBPS`` is set, block the submit thread until the
    put has 'cost' nbytes/rate seconds of wall, like a slow relay's
    backpressure would. The codec's raw-vs-packed race then sees a slow
    wire (packed ships fewer bytes -> proportionally less sleep, exactly
    a slow physical wire's economics), so one bench session can represent
    BOTH weather regimes and show the codec verdict matching measured
    steady throughput in each (VERDICT r4 item 3). Host-side costs
    (encode) are intentionally NOT throttled."""
    mbps = os.environ.get("NOMAD_WIRE_THROTTLE_MBPS")
    if not mbps:
        return
    wait = nbytes / (float(mbps) * 1e6) - (time.perf_counter() - t0)
    if wait > 0:
        time.sleep(wait)


_wire_warmed = False
_wire_thread = None


def warm_wire_async() -> None:
    """Pay the relay's one-time device->host channel setup on a background
    thread. Round-3 measurement: the FIRST d2h readback of a process costs
    36-430 s through the axon relay (subsequent ones are ~0.06 s), which
    used to land inside whichever timed phase did the first readback
    (bench prewarm, or a CLI user's first score). A 1 KB round trip kicked
    off at engine construction overlaps that fixed cost with param
    transfer and shape compiles. No-op on CPU backends and when already
    warmed."""
    global _wire_warmed, _wire_thread
    if _wire_warmed or jax.default_backend() != "tpu":
        return
    _wire_warmed = True

    def go():  # pragma: no cover - timing side effect only
        try:
            np.asarray(jax.device_put(np.zeros(256, np.float32)))
        except Exception:
            pass

    import threading

    _wire_thread = threading.Thread(
        target=go, daemon=True, name="nomad-wire-warm"
    )
    _wire_thread.start()

    # a daemon thread killed mid-d2h at interpreter exit can make the
    # PJRT C++ layer terminate() (same failure mode as the wirecodec
    # prewarm threads — see wirecodec._join_prewarms); bounded join at
    # exit lets the in-flight round trip finish
    import atexit

    atexit.register(lambda: _wire_thread.join(30.0)
                    if _wire_thread is not None else None)


def warm_wire_ready() -> bool:
    """Non-blocking: has the background d2h channel warm completed?
    Races/probes are gated on this — their synchronous readbacks would
    otherwise ABSORB the one-time channel setup (36-430 s on bad relay
    weather) and bank sub-MB/s garbage into the rate EWMAs: the round-5
    10k re-drive paid 55.4 s of a 185.7 s wall in race 1 this way even
    though the ambient wire probed 43 MB/s."""
    return _wire_thread is None or not _wire_thread.is_alive()


def warm_wire_join(timeout: Optional[float] = None) -> bool:
    """Block until the background wire warm completes (starting it if
    needed). A SERVER calls this from its warmup so readiness means the
    data path is live — otherwise the one-time channel setup (minutes on
    bad relay weather) lands inside the first request's latency instead
    of startup. Returns True when the warm round trip has completed
    (trivially true off-TPU), False on timeout — on a dead relay the
    caller must get a diagnosable answer, not block forever (advisor r3:
    an unbounded join hung server startup for the documented 3+ hour
    outage with no diagnostic)."""
    warm_wire_async()
    if _wire_thread is not None:
        _wire_thread.join(timeout)
        return not _wire_thread.is_alive()
    return True


class EmbeddingLRU:
    """Bounded embedding cache for long-lived servers (dict-protocol subset
    the engine uses). Two leak paths the plain-dict cache had (round-2
    verdict): unbounded growth on a churning file population (~1 KB/file
    forever), and an edited file (new mtime) keying a NEW entry while the
    stale one lingered. This evicts least-recently-used entries beyond
    ``maxsize`` and drops the stale entry for a path the moment its
    replacement key is inserted."""

    def __init__(self, maxsize: int = 65536):
        from collections import OrderedDict

        self.maxsize = int(maxsize)
        self._d: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        # (abspath, trim) -> current full key, for stale-mtime eviction
        self._by_path: dict[tuple, tuple] = {}
        self.evictions = 0
        self.stale_evictions = 0

    @staticmethod
    def _path_id(key: tuple) -> tuple:
        return key[:2]  # (abspath, trim); mtime/size vary per version

    def __contains__(self, key) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def __getitem__(self, key):
        self._d.move_to_end(key)
        return self._d[key]

    def __setitem__(self, key, value) -> None:
        old = self._by_path.get(self._path_id(key))
        if old is not None and old != key and old in self._d:
            del self._d[old]  # same file, new mtime/size: drop stale entry
            self.stale_evictions += 1
        self._by_path[self._path_id(key)] = key
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            victim, _ = self._d.popitem(last=False)
            self._by_path.pop(self._path_id(victim), None)
            self.evictions += 1

    def stats(self) -> dict:
        return {
            "entries": len(self._d),
            "maxsize": self.maxsize,
            "evictions": self.evictions,
            "stale_evictions": self.stale_evictions,
        }


def bucket_length(
    n: int, min_bucket: int = MIN_BUCKET, steps_per_octave: int = 4
) -> int:
    """Quantized pad target: multiples of (nearest lower power of two /
    steps_per_octave). Bounded shape count (steps_per_octave shapes per
    octave) with <= 1/steps_per_octave padding waste — much tighter than
    pure power-of-two for the common ~10 s case."""
    if n <= min_bucket:
        return min_bucket
    p = 1 << ((n - 1).bit_length() - 1)  # largest power of two < n
    step = max(min_bucket, p // steps_per_octave)
    return ((n + step - 1) // step) * step


@dataclass
class EmbeddingEngine:
    model: NomadModel
    params: dict
    mesh: Optional[object] = None  # jax.sharding.Mesh with a 'data' axis
    device: Optional[object] = None  # explicit jax.Device (mesh wins if set)
    batch_sample_budget: int = DEFAULT_BATCH_SAMPLE_BUDGET
    io_threads: int = 16
    parallel_put_min_bytes: int = 4 << 20
    # Quantize resampled/converted file batches to the PCM16 grid in the
    # C++ loader (native path): halves host->device bytes for non-16k
    # sources. Max re-quantization error is 1/65536 per sample on material
    # that was 16-bit PCM to begin with — orders of magnitude inside the
    # score budget. Set False for bit-exact f32 transfer.
    quantize_transfer: bool = True
    # Serve-path compile avoidance: run a never-compiled batch shape
    # through the smallest LARGER already-compiled executable by padding
    # rows, instead of paying a synchronous compile. Through the remote
    # compile service a fresh shape costs 10-300 s while even a fully
    # padded 96-row forward costs <0.5 s, so a warmed server answers any
    # request count at compute cost (SERVE_BENCH r3: a 10-file score
    # request cost 29.5 s because its (2,·)/(8,·) shapes cold-compiled).
    # The padding waste is bounded by one full-batch forward per chunk.
    pad_to_compiled: bool = True
    # Debug/measurement switch: block on each batch's result before the
    # next put, reproducing the reference's load->transfer->compute serial
    # loop (`nomad.py:172-183`). The bench's overlap leg runs the SAME
    # payload serialized and pipelined back-to-back (shared weather) so
    # the put/compute overlap is a measured ratio, not a derived ceiling.
    serialize_pipeline: bool = False
    # Optional file-embedding cache (set to {} to enable; None = off, the
    # reference-faithful default — `nomad.py:102-105` recomputes the NMR
    # pool every predict). Keyed by (abspath, trim, mtime_ns, size) so an
    # edited file re-embeds; entries are ~1 KB (emb_dim floats). A serving
    # process scoring many requests against a fixed NMR pool skips ~all of
    # the pool's decode+embed work after the first request.
    file_cache: Optional[dict] = None
    cache_hits: int = field(default=0, repr=False)
    # Adaptive transfer mode: the relay's concurrency benefit is weather —
    # the round-2 study measured 2-3x from 4-8 parallel streams, but some
    # days single-stream wins outright (r02 bench logged 19 MB/s single vs
    # 12 MB/s parallel), and the weather SWINGS WITHIN one run (the r03
    # cold bench probed single at 1.1 MB/s that measured 24 MB/s twenty
    # seconds later). Both modes are probed on the first large batch (half
    # the rows each, blocking on the raw transfers — see _probe_put), then
    # RE-probed so a stale reading can't pin the slower mode for the
    # engine's lifetime. A probe SERIALIZES the pipeline (its halves block
    # on readbacks, so the overlapped forward stalls) — re-probe intervals
    # therefore back off exponentially from probe_interval while verdicts
    # stay stable (x2 per confirming probe, capped at probe_interval_max)
    # and reset on any flip. Long runs pay ~zero steady probe cost; regime
    # changes are still caught within a few dozen batches.
    probe_interval: int = 8
    probe_interval_max: int = 64
    # Wire codec: lossless delta+bit-packing of int16 batches, decoded
    # on-device (ops/wirecodec.py). The pipeline is wire-bound, so payload
    # bytes are the headline: typical speech packs to ~0.6x, the synthetic
    # bench batch to ~0.84x, and the relay's own compression does NOT
    # capture this redundancy (measured round 3). 'auto' = on for TPU
    # backends; 'on' forces (tests); 'off' disables. Batches whose packed
    # size exceeds wire_codec_max_ratio of raw ship raw (incompressible
    # material loses nothing).
    wire_codec: str = "auto"
    wire_codec_max_ratio: float = 0.95
    _codec_hits: int = field(default=0, repr=False)
    _codec_skips: int = field(default=0, repr=False)
    _codec_probe_ships: int = field(default=0, repr=False)
    _codec_cold_races: int = field(default=0, repr=False)
    _codec_saved_bytes: int = field(default=0, repr=False)
    # 'auto' decides EMPIRICALLY: the relay compresses raw PCM itself by a
    # weather-dependent amount (sometimes more than the codec's byte
    # saving, sometimes far less), so raw and packed halves of one batch
    # are raced in LOGICAL bytes/s and the winner ships; re-raced every
    # probe_interval batches. 'on' forces packed, None = undecided (raw
    # until the first race).
    _codec_probes: dict = field(default_factory=dict, repr=False)
    _use_codec: Optional[bool] = field(default=None, repr=False)
    _codec_wins: int = field(default=0, repr=False)
    _codec_puts_since_probe: int = field(default=0, repr=False)
    _codec_interval: int = field(default=0, repr=False)  # 0 -> probe_interval
    # puts queued since the pipeline was last known drained (a collect
    # readback or a probe/race drain). Races and probes must drain before
    # timing, so they only fire when this is shallow — deep-pipeline
    # re-probes each paid 8-20 s of deferred wire in the r4 10k artifact.
    _backlog: int = field(default=0, repr=False)
    # Cap on each TIMED side of a race/probe. Races and probes serialize
    # the pipeline (drain + synchronous readback), so their worst case on
    # a bad-weather relay episode scales with the timed bytes: the r5 10k
    # re-drive paid 20.8 s for 2 full-batch races (~30 MB/side) caught in
    # a 3 MB/s dip while steady puts sustained 46.4 MB/s. A capped head
    # races first and the remainder ships untimed through the decided
    # mode, bounding the worst case at ~cap/weather per side.
    probe_cap_bytes: int = 6 << 20
    # measured fraction of batches whose assemble-thread encode was done
    # before the submit loop needed them (EWMA across embed calls; None =
    # no observation yet -> the race charges the FULL encode wall). See
    # the encode-overlap note in embed_waves.
    _encode_ready_frac: Optional[float] = field(default=None, repr=False)
    _put_mode: Optional[str] = field(default=None, repr=False)
    _put_probes: dict = field(default_factory=dict, repr=False)
    _probe_count: int = field(default=0, repr=False)
    _puts_since_probe: int = field(default=0, repr=False)
    _put_interval: int = field(default=0, repr=False)  # 0 -> probe_interval
    _last_put: Optional[object] = field(default=None, repr=False)
    _jitted: dict = field(default_factory=dict, repr=False)
    # AOT executables from prewarm: calling these directly (instead of the
    # jit dispatch path) guarantees a prewarmed shape never compiles twice
    # — jit dispatch cannot reuse fn.lower().compile()'s work unless the
    # persistent cache is on AND its AOT/JIT cache keys agree, which is
    # exactly what broke the round-2 driver bench (628 s warmup).
    _aot: dict = field(default_factory=dict, repr=False)
    _compiled_keys: set = field(default_factory=set, repr=False)
    _params_device: Optional[object] = field(default=None, repr=False)
    _put_pool: ThreadPoolExecutor = field(
        default_factory=lambda: ThreadPoolExecutor(max_workers=8), repr=False
    )

    def __post_init__(self):
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()
        warm_wire_async()

    def _get_fn(self, batch: int, length: int, int16: bool = False) -> Callable:
        key = (batch, length, int16)
        fn = self._jitted.get(key)
        if fn is None:

            def apply(p, w, l):
                if int16:
                    # PCM16 fast path: waveforms ship as int16 (half the
                    # host->device bytes over the PCIe/relay bottleneck) and
                    # dequantize on device — bit-exact for 16-bit sources.
                    w = w.astype(jnp.float32) / PCM16_SCALE
                return self.model.apply(p, w, lengths=l)

            if self.mesh is not None:
                in_sh = batch_sharding(self.mesh)
                rep = replicated(self.mesh)
                fn = jax.jit(
                    apply,
                    in_shardings=(rep, in_sh, in_sh),
                    out_shardings=in_sh,
                )
            else:
                fn = jax.jit(apply)
            self._jitted[key] = fn
        return fn

    def _get_fn_packed(self, batch: int, length: int, rows_shape) -> Callable:
        """Fused wire-codec forward: ONE executable decodes the combined
        packed frame (ops/wirecodec.combined_rows) back to the int16
        batch, dequantizes, and runs the model. Together with the
        single-transfer frame this makes the packed path cost exactly the
        raw path's RPC count (1 put + 1 dispatch) — the separate decode
        dispatch and meta put were fixed ~1 RTT each per batch, which
        dominated the codec's byte saving on high-latency relay
        sessions."""
        key = ("pk", batch, length, tuple(rows_shape))
        fn = self._jitted.get(key)
        if fn is None:
            from ..ops import wirecodec

            def apply(p, rows, l):
                w = wirecodec.decode_combined_traced(rows, batch, length)
                w = w.astype(jnp.float32) / PCM16_SCALE
                return self.model.apply(p, w, lengths=l)

            fn = jax.jit(apply)  # codec is single-device-path only
            self._jitted[key] = fn
        return fn

    def _put(self, batch: np.ndarray, lengths: np.ndarray, enc=False):
        """Async host->device placement (sharded when a mesh is set).

        ``enc``: wire-codec disposition — a dict = encoding precomputed in
        the assemble pool; False = decide (and encode) here; None = ship
        raw (caller already found the batch incompressible).

        Returns ``(payload, lengths_dev, pk)``: pk is None when payload is
        the waveform batch, or the combined packed frame's row shape when
        the wire codec shipped it — the caller then dispatches through the
        fused decode+forward executable (_get_fn_packed).

        Single-device path: large batches are split into row chunks pushed
        over parallel streams. The axon relay (and PCIe DMA generally)
        sustains ~2x the single-stream rate with 4-8 concurrent transfers
        (round-2 transfer study); the chunks are stitched back with one
        device-side concatenate that costs an HBM copy, noise next to the
        wire time."""
        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            return jax.device_put(batch, sh), jax.device_put(
                lengths.astype(np.int32), sh
            ), None
        wave_dev, packed = None, None
        codec_candidate = isinstance(enc, dict) or (
            enc is False and self._codec_applicable(batch)
        )
        if codec_candidate:
            # A race first DRAINS the queued pipeline (fair timing needs an
            # idle wire), so its cost is the whole backlog: mid-run races
            # in the round-4 10k artifact each paid 8-20 s of deferred
            # wire/compute (118.8 s total; the r5 speech re-drive still
            # paid 16.3 s of a 34.4 s wall). Gate races on a SHALLOW
            # backlog: at call boundaries and in the first couple of puts
            # the drain is 1-2 batches (~free); deep-pipeline moments skip
            # the re-race and keep the banked verdict. The second
            # bootstrap race (one win pending) also rides the next shallow
            # put, so the two-consecutive-wins gate resolves by put ~1
            # instead of put probe_interval.
            # ... and only once the background d2h channel warm is done:
            # a race readback during setup blocks for the whole setup
            # (36-430 s) and banks garbage rates (see warm_wire_ready)
            shallow = self._backlog <= 2 and warm_wire_ready()
            if self.wire_codec == "on":
                use = True
            elif shallow and (
                self._use_codec is None
                or self._codec_wins == 1
                or self._codec_puts_since_probe
                >= (self._codec_interval or self.probe_interval)
            ):
                cap = self._probe_head_rows(batch)
                if cap < batch.shape[0]:
                    # capped race: time raw-vs-packed on a small head and
                    # ship the tail untimed through the adaptive path
                    # (worst-case race cost is bounded by the cap, not
                    # the batch — see probe_cap_bytes). The steady-path
                    # fused-executable check needs the FULL batch's frame
                    # shape, so resolve it here from the caller's encode.
                    fused = None
                    if isinstance(enc, dict) and "rows" in enc:
                        fused = ("pk", batch.shape[0], batch.shape[1],
                                 tuple(enc["rows"].shape)) in self._aot
                    head = np.ascontiguousarray(batch[:cap])
                    with timed("engine.put.codec_race", nbytes=head.nbytes):
                        head_dev = self._probe_codec(head, None, fused)
                    if head_dev is not None:
                        tail_dev = self._put_array(batch[cap:])
                        wave_dev = jnp.concatenate(
                            [head_dev, tail_dev], axis=0
                        )
                else:
                    with timed("engine.put.codec_race", nbytes=batch.nbytes):
                        wave_dev = self._probe_codec(
                            batch, enc if isinstance(enc, dict) else None
                        )
                use = False  # probe already shipped the batch
            else:
                use = False if self._use_codec is None else self._use_codec
                self._codec_puts_since_probe += 1
            if wave_dev is None and use:
                packed = self._put_packed(
                    batch, enc=enc if isinstance(enc, dict) else None
                )
        with timed("engine.put.len"):
            len_dev = jax.device_put(lengths.astype(np.int32), self.device)
        self._backlog += 1
        if packed is not None:
            return packed[0], len_dev, packed[1]
        if wave_dev is None:
            wave_dev = self._put_array(batch)
        return wave_dev, len_dev, None

    def _probe_head_rows(self, batch: np.ndarray) -> int:
        """Rows of a race/probe head sized so each TIMED side stays under
        probe_cap_bytes (two sides -> 2x per-side rows, min 4, even so the
        head halves cleanly). Returns batch rows when the whole batch fits
        — the race then runs un-capped exactly as before."""
        row_b = max(1, batch.nbytes // batch.shape[0])
        per_side = -(-self.probe_cap_bytes // row_b)  # ceil div
        head = max(4, 2 * per_side)
        head -= head % 2
        return min(batch.shape[0], head)

    def _measure_rtt(self) -> float:
        """One tiny put+readback: the relay's fixed round-trip latency.
        Steady puts are ASYNC and never pay this; a race/probe readback
        does, so charging it to the measured rates compresses the
        raw-vs-packed (and single-vs-parallel) ratio toward 1 — fatally
        for capped (small) timed payloads where latency dominates wire
        time. Rates therefore use max(t - rtt, t/4) as the denominator
        (the t/4 floor bounds the de-bias at 4x when rtt fluctuates)."""
        t0 = time.perf_counter()
        try:
            np.asarray(jax.device_put(
                np.zeros((1, 1), np.int32), self.device
            ))
        except Exception:  # pragma: no cover - dead device
            return 0.0
        return time.perf_counter() - t0

    @staticmethod
    def _debias(t: float, rtt: float) -> float:
        return max(t - rtt, t / 4, 1e-9)

    def _packed_wall(self, t_wire: float, t_encode: float) -> float:
        """The wall a steady packed batch pays: wire + the NON-overlapped
        fraction of the host encode. Observation (_encode_ready_frac)
        over assumption: full charge until embed_waves has banked one."""
        frac = self._encode_ready_frac or 0.0
        return max(t_wire + t_encode * (1.0 - frac), 1e-9)

    def _probe_codec(self, batch: np.ndarray, enc=None, fused=None):
        """Race raw vs packed transport on halves of THIS batch, in
        DELIVERED logical bytes/s: raw-equivalent payload over the wall
        time a steady batch actually pays on that path — wire (readback
        bounded) plus, for packed, the host-side encode. The relay
        compresses raw PCM itself by a varying amount — some sessions it
        beats the codec's byte saving, some it's far behind — so no
        static decision survives; EWMA-merged races pick the day's winner
        (same philosophy as the single/parallel stream probe).

        Charging the encode is what makes the race PREDICT end-to-end
        throughput (VERDICT r4 item 3): round 4's wire-only metric let
        packed "win" races (55.2 vs 47.0 MB/s) while losing measured
        steady throughput (wss 1177 vs 1323) because the ~0.15 s/half
        C++ pack sat outside the timed window. The steady path runs the
        encode on the assemble pool, but the overlap does NOT materialize
        in practice — measured round 5 (scripts/diag_stream.py, phase S):
        pool-encoded packed was SLOWER than inline-encoded (725.5 vs
        798.7 wav-s/s, raw 897.7) because concurrent encodes contend with
        the relay's own host-side work — so the race charges the full
        encode wall as the conservative present-truth.

        ``enc``: the caller's full-batch encoding when available — used
        to check whether the STEADY packed path would run fused (one
        dispatch) or pay the standalone-decode fallback dispatch, whose
        fixed RTT the packed half is then charged for."""
        h = batch.shape[0] // 2
        # NOTE: the assemble-thread encode of the FULL batch (the `enc`
        # the caller may hold) is not reusable here — the race ships the
        # tail HALF, and slicing the bucketed packed stream would need
        # offset rebasing + re-padding. Races back off exponentially, so
        # the ~50-130 ms re-encode per race is accepted (and now charged
        # to the packed half — see above).
        t0 = time.perf_counter()
        enc_b = self._encode_batch(batch[h:]) if h >= 1 else None
        t_encode = time.perf_counter() - t0
        if enc_b is None:
            # incompressible (or a 1-row batch the race can't halve): ship
            # raw. The win streak resets too — otherwise a stale streak of
            # >=2 lets a SINGLE later race win re-enable packed, bypassing
            # the two-consecutive-wins gate.
            self._use_codec = False
            self._codec_wins = 0
            self._codec_puts_since_probe = 0
            return None
        from ..ops import wirecodec

        ewma = 0.5
        # Both halves ride the SAME fixed transport (the decided put mode;
        # 'single' before any decision) with a drain first — routing the
        # raw half through _put_array let a nested _probe_put fire inside
        # the race, inflating the raw half's wall time with probe overhead
        # and biasing the race toward packed.
        mode = self._put_mode or "single"
        if self._last_put is not None:
            try:
                np.asarray(jnp.ravel(self._last_put)[:1])
            except Exception:  # pragma: no cover - already-deleted buffer
                pass
        self._backlog = 0  # the wire is drained as of here
        rtt = self._measure_rtt()  # see _measure_rtt: de-bias both sides
        # raw half
        t0 = time.perf_counter()
        put_a = self._put_large(batch[:h], mode)
        np.asarray(put_a[:1, :1])
        rate_raw = batch[:h].nbytes / self._debias(
            time.perf_counter() - t0, rtt
        )
        # packed half: the combined frame (stream + meta tail) ships as
        # ONE transfer and the steady path fuses the decode into the
        # forward executable, so packed and raw now cost the same RPC
        # count per batch — the byte race is a fair end-to-end comparison
        # again. (Before the combined frame, packed paid two extra relay
        # round trips per batch — meta put + decode dispatch — and a ~1 s
        # RTT session saw packed win the byte race 1.06x while losing
        # end-to-end 2.8x.)
        rows = enc_b["rows"]  # frame already built by _encode_batch
        t0 = time.perf_counter()
        put_p = self._put_large(rows, mode)
        np.asarray(put_p[:1, :1])
        t_packed = self._debias(time.perf_counter() - t0, rtt)
        self._last_put = put_p
        # RPC parity holds only when the steady path's fused executable
        # exists for this batch population's frame shape; otherwise every
        # packed batch pays a standalone-decode dispatch (~1 RTT of fixed
        # latency the wire timing can't see). Estimate that RTT with a
        # tiny put+readback and charge the packed half for it.
        fused_ready = fused if fused is not None else False
        if fused is None and enc is not None and "rows" in enc:
            full_key = ("pk", batch.shape[0], batch.shape[1],
                        tuple(enc["rows"].shape))
            fused_ready = full_key in self._aot
        if not fused_ready:
            t_packed += rtt
        # delivered rate: wire wall + the fraction of the host encode a
        # steady packed batch actually pays. Whether the assemble-pool
        # encode overlaps the pipeline is REGIME-DEPENDENT — measured
        # non-overlappable on a contended host (diag_stream phase S:
        # pool-encode 725.5 < inline 798.7 < raw 897.7 wss) but fully
        # overlapped on a pipelined good-weather run (bench r5: forced-on
        # 1029.7 > forced-off 944.3 while the full-charge race still said
        # raw) — so the engine measures it per call (_encode_ready_frac,
        # banked in embed_waves) instead of assuming either way. No
        # observation yet = conservative full charge.
        rate_packed = batch[h:].nbytes / self._packed_wall(
            t_packed, t_encode
        )
        bh, t = enc_b["shape"]
        # Standalone combined decode (the probe's half-batch rides the
        # NORMAL forward after concatenation with the raw half) — but ONLY
        # when its executable is already warm. A cold decode here compiles
        # INLINE inside the race span (~10-20 s on a relay session; round-4
        # BENCH_LARGE burned 118 s of a 457 s wall in 6 races this way), so
        # when cold the compile moves to a daemon thread and this race's
        # packed half re-ships as raw — half a batch of duplicate bytes,
        # an order of magnitude below the compile stall it replaces. The
        # wire timing above is already banked either way.
        cold = not wirecodec.decode_combined_ready(put_p.shape, bh, t)
        if not cold:
            dec_b = wirecodec.decode_combined_call(put_p, b=bh, t=t)
        else:
            wirecodec.prewarm_decode_combined_async(put_p.shape, bh, t)
            self._codec_cold_races += 1
            try:
                put_p.delete()
            except Exception:  # pragma: no cover - non-deletable array
                pass
            dec_b = self._put_large(batch[h:], mode)
            self._last_put = dec_b
            enc_b = None  # raw shipped twice: nothing was saved
        for mode, rate in (("raw", rate_raw), ("packed", rate_packed)):
            old = self._codec_probes.get(mode)
            self._codec_probes[mode] = rate if old is None else (
                ewma * rate + (1.0 - ewma) * old
            )
        # Small (8%) hysteresis: with the encode charged into the packed
        # rate (above), the race now measures delivered throughput, so
        # the round-3/4 blind 25% safety bar shrinks to cover only what
        # stays unmodeled — the fused decode's on-device occupancy
        # (0.085 s/96-row batch measured round 5, binding only when the
        # pipeline is compute-bound, i.e. rarely) and race noise. Packed
        # also needs TWO consecutive race wins before it ships: the very
        # first race runs on a cold, noisy wire and a one-shot fluke
        # verdict steered an entire bench run packed (round 3, 28 packed
        # ships before the EWMA converged back to raw).
        # A COLD race's wire rates still bank (the timing is valid) but the
        # verdict must not advance: two cold races could otherwise flip
        # _use_codec to packed while no decode executable — standalone or
        # fused — is warm yet, and the first steady packed ship would pay
        # the inline decode compile this dance exists to avoid (advisor r4).
        if cold:
            self._codec_wins = 0
            if self._use_codec is None:
                self._use_codec = False  # conservative: raw until warm
        else:
            self._codec_decide()
        self._codec_puts_since_probe = 0
        # Probe traffic is accounted separately from steady packed ships
        # (advisor r3): a race fires on every payload regardless of the
        # verdict, and on incompressible material the padded combined frame
        # can be LARGER than the raw half — counting it as a codec hit with
        # negative "saved" bytes overstated codec usage in transfer_stats.
        self._codec_probe_ships += 1
        if enc_b is not None and rows.nbytes < batch[h:].nbytes:
            self._codec_saved_bytes += batch[h:].nbytes - rows.nbytes
        return jnp.concatenate([put_a, dec_b], axis=0)

    def _codec_decide(self) -> None:
        """Update the packed-vs-raw verdict from the race EWMAs (see the
        hysteresis note in _probe_codec): packed ships only after TWO
        consecutive race wins at the 1.08x bar (the race rates are
        DELIVERED throughput — wire + encode — so the bar covers only
        unmodeled residue), and a single loss reverts to raw immediately.
        Stable verdicts back the re-race interval off exponentially
        (races serialize the pipeline); a flip resets it."""
        won = self._codec_probes["packed"] > 1.08 * self._codec_probes["raw"]
        self._codec_wins = self._codec_wins + 1 if won else 0
        prev = self._use_codec
        self._use_codec = self._codec_wins >= 2
        self._codec_interval = self._backoff(
            self._codec_interval, stable=self._use_codec == prev
        )

    def _backoff(self, current: int, stable: bool) -> int:
        """Next re-probe interval: double while the verdict is stable
        (capped at probe_interval_max), reset to probe_interval on a flip.
        Probes serialize the pipeline, so steady state must not pay them
        every probe_interval puts forever."""
        if not stable:
            return self.probe_interval
        return min(
            self.probe_interval_max, 2 * (current or self.probe_interval)
        )

    def reset_codec_race(self) -> None:
        """Forget the packed-vs-raw verdict (the race is payload-dependent
        — speech packs ~0.6x, noise ~1.0x — so a caller switching payload
        populations should re-race rather than inherit a stale verdict)."""
        self._use_codec = None
        self._codec_wins = 0
        self._codec_probes = {}
        self._codec_puts_since_probe = 0
        self._codec_interval = 0

    def _put_array(self, batch: np.ndarray):
        """Raw 2-D array placement through the adaptive transfer mode."""
        if batch.nbytes >= self.parallel_put_min_bytes and batch.shape[0] > 1:
            # probes drain the pipeline before timing (see _backlog note):
            # only fire on a shallow queue, where the drain is ~free, and
            # once the d2h channel warm is done (warm_wire_ready — a probe
            # readback during setup absorbs the whole 36-430 s setup). An
            # undecided mode still probes at the first shallow-and-warm
            # large put; until then batches ship 'single' unprobed.
            ok = self._backlog <= 2 and warm_wire_ready()
            if (self._put_mode is None and ok) or (
                ok
                and self._puts_since_probe
                >= (self._put_interval or self.probe_interval)
            ):
                with timed("engine.put.probe", nbytes=batch.nbytes):
                    put = self._probe_put(batch)
            else:
                put = self._put_large(batch, self._put_mode or "single")
                self._puts_since_probe += 1
        else:
            with timed("engine.put.small", nbytes=batch.nbytes):
                put = jax.device_put(batch, self.device)
        self._last_put = put
        return put

    def _codec_applicable(self, batch: np.ndarray) -> bool:
        return (
            self.wire_codec != "off"
            and batch.dtype == np.int16
            and batch.nbytes >= self.parallel_put_min_bytes
            and (self.wire_codec == "on" or jax.default_backend() == "tpu")
        )

    def _encode_batch(self, batch: np.ndarray):
        """Host-side wire-codec encode + combined-frame build + the skip
        decision. Runs inside the assemble thread pool so the ~40-130 ms
        C++ pack AND the frame concatenate (a full-stream memcpy) overlap
        the previous batch's wire time instead of serializing the submit
        loop. The skip decision compares the bytes that actually ship —
        the combined frame including the meta tail's row padding — not
        the pre-frame packed size."""
        from ..ops import wirecodec

        enc = wirecodec.encode(batch)
        if enc is not None:
            enc["rows"] = wirecodec.combined_rows(enc)
        if enc is None or (
            enc["rows"].nbytes > self.wire_codec_max_ratio * batch.nbytes
        ):
            self._codec_skips += 1
            return None
        return enc

    def _put_packed(self, batch: np.ndarray, enc=None):
        """Wire-codec path: adaptive-mode transfer of the ONE combined
        frame (packed stream + meta tail rows); the decode happens inside
        the fused forward executable the caller dispatches. Returns
        (frame_device_array, frame_shape), or None (-> raw path) for
        incompressible batches."""
        from ..ops import wirecodec

        if enc is None:
            enc = self._encode_batch(batch)
        if enc is None:
            return None
        rows = enc["rows"]
        b, t = enc["shape"]
        key = ("pk", b, t, tuple(rows.shape))
        fused = key in self._aot
        if (
            self.wire_codec != "on"
            and not fused
            and not wirecodec.decode_combined_ready(rows.shape, b, t)
        ):
            # NEITHER the fused decode+forward AOT nor the standalone
            # decode is warm for this frame shape: shipping packed now
            # would pay an inline decode compile at ship time (the exact
            # stall the cold-race path avoids — advisor r4). Kick the
            # compile on the daemon thread and ship THIS batch raw.
            # ('on' — the forced test mode — keeps the inline compile:
            # it runs on CPU backends where small-jit compiles are cheap
            # and forcing packed is the point.)
            wirecodec.prewarm_decode_combined_async(rows.shape, b, t)
            return None
        pdev = self._put_array(rows)
        self._codec_hits += 1
        self._codec_saved_bytes += batch.nbytes - rows.nbytes
        if fused:
            # fused decode+forward executable is ready: one dispatch total
            return pdev, rows.shape
        # no AOT fused executable for this (batch, frame) shape: decode
        # standalone (already warm per the check above) and ride the
        # normal forward
        return wirecodec.decode_combined_call(pdev, b=b, t=t), None

    def prewarm_codec(self, waves) -> None:
        """Pre-compile the wire-codec decode executable for the dominant
        planned batch shape by encoding a REAL sample batch (the decode
        shape depends on the packed length, which depends on the data).
        A later batch that lands in a neighboring packed-length bucket
        pays one (persistently cached) compile."""
        if self.wire_codec == "off" or not waves or self.mesh is not None:
            return  # codec is single-device-path only (mesh _put ships raw)
        if self.wire_codec != "on" and jax.default_backend() != "tpu":
            return
        from ..ops import wirecodec

        groups: dict[int, list] = {}
        for w in waves:
            groups.setdefault(bucket_length(len(w)), []).append(w)
        blen, grp = max(groups.items(), key=lambda kv: len(kv[1]))
        bsz = self.batch_size_for(blen)
        batch = np.zeros((bsz, blen), np.int16)
        for row in range(bsz):
            w = np.asarray(grp[row % len(grp)])
            if w.dtype != np.int16:
                w = np.rint(w * PCM16_SCALE).astype(np.int16)
            batch[row, : len(w)] = w
        enc = wirecodec.encode(batch, pool=self._put_pool)
        if enc is not None:
            enc["rows"] = wirecodec.combined_rows(enc)
        if enc is not None and (
            # same gate as _encode_batch: the bytes that actually ship
            enc["rows"].nbytes <= self.wire_codec_max_ratio * batch.nbytes
        ):
            rows_shape = enc["rows"].shape
            key = ("pk", bsz, blen, tuple(rows_shape))

            def warm_fused():
                # steady path: AOT the FUSED decode+forward executable for
                # the dominant combined-frame shape (one dispatch per
                # packed batch)
                if key in self._aot:
                    return
                from ..utils.cache import cached_compile_guard

                fn = self._get_fn_packed(bsz, blen, rows_shape)
                with cached_compile_guard():
                    self._aot[key] = fn.lower(
                        self._params_aval(),
                        jax.ShapeDtypeStruct(rows_shape, jnp.uint32),
                        jax.ShapeDtypeStruct((bsz,), jnp.int32),
                    ).compile()
                self._compiled_keys.add(key)

            def warm_race_half():
                # the raw-vs-packed race decodes the tail HALF of its
                # (capped) head standalone (it recombines with the raw
                # half before the normal forward) — a different shape
                # key; prewarm it too or the first 'auto' race pays a
                # cold decode compile in the timed/serving path it
                # exists to protect
                cap = self._probe_head_rows(batch)
                half = batch[cap // 2 : cap]
                enc_h = wirecodec.encode(half)
                if enc_h is not None:
                    rows_h = wirecodec.combined_rows(enc_h)
                    wirecodec.prewarm_decode_combined(
                        rows_h.shape, b=half.shape[0], t=blen
                    )

            # both compiles ride the remote compile service concurrently
            # (cost ~= the slower one, not the sum)
            with ThreadPoolExecutor(max_workers=2) as ex:
                futs = [ex.submit(warm_fused), ex.submit(warm_race_half)]
                for f in futs:
                    f.result()

    def _probe_put(self, batch: np.ndarray):
        """Unbiased transfer-mode probe (round-2 advisor finding: timing
        the two modes on *consecutive* batches let the second probe's
        readback queue behind the first batch's forward pass, so the
        first-probed mode always won). Both modes run on THIS batch — half
        the rows each — bounded by block_until_ready on the raw device_put
        results (no enqueued slice program to queue behind compute), after
        draining any in-flight previous transfer so neither half absorbs
        queueing time. The half order alternates between probes so
        relay slow-start penalizes each mode equally over time."""
        h = batch.shape[0] // 2
        if h < 2 or batch.nbytes < 2 * self.parallel_put_min_bytes:
            # Too small to time both halves meaningfully: probe with WHOLE
            # consecutive batches instead, alternating modes. A workload
            # made only of such mid-size batches must still converge on a
            # measured mode (advisor r3: this branch used to hardcode
            # 'parallel' forever and re-enter itself on every put). The
            # consecutive-batch probe's queueing bias is drained away by
            # the readback on the previous put below.
            return self._probe_put_whole(batch)
        cap = self._probe_head_rows(batch)
        if cap < batch.shape[0]:
            # capped probe: time single-vs-parallel on a small head, ship
            # the tail untimed through the just-decided mode (worst-case
            # probe cost bounded by the cap — see probe_cap_bytes)
            head_dev = self._probe_put(np.ascontiguousarray(batch[:cap]))
            tail_dev = self._put_large(
                batch[cap:], self._put_mode or "single"
            )
            self._puts_since_probe = 0
            return jnp.concatenate([head_dev, tail_dev], axis=0)
        if self._last_put is not None:
            try:
                # true drain: block_until_ready through the relay returns
                # before the wire finishes (round-2/3 measurements), so a
                # 1-element readback — which depends on the data — is the
                # only trustworthy completion signal
                np.asarray(jnp.ravel(self._last_put)[:1])
            except Exception:  # pragma: no cover - already-deleted buffer
                pass
        self._backlog = 0  # drained as of here
        rtt = self._measure_rtt()  # see _measure_rtt: de-bias both modes
        dev = self.device
        halves = [batch[:h], batch[h:]]
        order = ("single", "parallel") if self._probe_count % 2 == 0 \
            else ("parallel", "single")
        ewma = 0.5  # newest reading carries half the weight
        parts_by_mode = {}
        for mode, half in zip(order, halves):
            if mode == "single":
                t0 = time.perf_counter()
                put = jax.device_put(half, dev)
                np.asarray(put[:1, :1])  # readback bounds the wire
                parts_by_mode[mode] = [put]
            else:
                n = min(8, half.shape[0],
                        max(2, half.nbytes // (1536 * 1024)))
                rows = np.array_split(half, n, axis=0)
                t0 = time.perf_counter()
                parts = list(self._put_pool.map(
                    lambda r: jax.device_put(r, dev), rows
                ))
                # one readback over a concat bounds every part's transfer
                np.asarray(jnp.concatenate(
                    [p[:1, :1] for p in parts], axis=0
                )[:1, :1])
                parts_by_mode[mode] = parts
            rate = half.nbytes / self._debias(
                time.perf_counter() - t0, rtt
            )
            old = self._put_probes.get(mode)
            self._put_probes[mode] = rate if old is None else (
                ewma * rate + (1.0 - ewma) * old
            )
        prev = self._put_mode
        self._put_mode = max(self._put_probes, key=self._put_probes.get)
        self._put_interval = self._backoff(
            self._put_interval, stable=self._put_mode == prev
        )
        self._probe_count += 1
        self._puts_since_probe = 0
        ordered = parts_by_mode[order[0]] + parts_by_mode[order[1]]
        return jnp.concatenate(ordered, axis=0)

    def _probe_put_whole(self, batch: np.ndarray):
        """Whole-batch transfer-mode probe for batches too small to split
        into two timeable halves: time THIS batch in one mode (alternating
        between probes so each mode is sampled over time), EWMA-merge, and
        decide once both modes have a reading. Slightly noisier than the
        half-split probe — queueing bias is removed by draining the
        previous put first — but it converges instead of pinning an
        unmeasured default."""
        mode = ("single", "parallel")[self._probe_count % 2]
        if self._last_put is not None:
            try:
                np.asarray(jnp.ravel(self._last_put)[:1])
            except Exception:  # pragma: no cover - already-deleted buffer
                pass
        self._backlog = 0  # drained as of here
        rtt = self._measure_rtt()  # see _measure_rtt: de-bias the rate
        t0 = time.perf_counter()
        put = self._put_large(batch, mode)
        np.asarray(put[:1, :1])  # readback bounds the wire
        rate = batch.nbytes / self._debias(time.perf_counter() - t0, rtt)
        ewma = 0.5
        old = self._put_probes.get(mode)
        self._put_probes[mode] = rate if old is None else (
            ewma * rate + (1.0 - ewma) * old
        )
        self._probe_count += 1
        if len(self._put_probes) == 2:
            prev = self._put_mode
            self._put_mode = max(self._put_probes, key=self._put_probes.get)
            self._put_interval = self._backoff(
                self._put_interval, stable=self._put_mode == prev
            )
            self._puts_since_probe = 0
        return put

    def transfer_stats(self) -> dict:
        """Chosen host->device mode + measured probe rates (MB/s, EWMA)."""
        return {
            "mode": self._put_mode,
            "probe_count": self._probe_count,
            "probes_MBps": {
                k: round(v / 1e6, 1) for k, v in self._put_probes.items()
            },
            "codec_hits": self._codec_hits,
            "codec_skips": self._codec_skips,
            "codec_probe_ships": self._codec_probe_ships,
            "codec_cold_races": self._codec_cold_races,
            "codec_saved_MB": round(self._codec_saved_bytes / 1e6, 1),
            "codec_in_use": self._use_codec,
            "codec_race_MBps": {
                k: round(v / 1e6, 1) for k, v in self._codec_probes.items()
            },
            "encode_ready_frac": (
                round(self._encode_ready_frac, 3)
                if self._encode_ready_frac is not None else None
            ),
        }

    def _put_large(self, batch: np.ndarray, mode: str):
        with timed(f"engine.put.wire_{mode}", nbytes=batch.nbytes):
            t0 = time.perf_counter()
            if mode == "parallel":
                # ~1.5 MB per stream, up to 8 streams: measured knee of the
                # relay's concurrency benefit (when it has one — see _put_mode)
                n = min(8, batch.shape[0],
                        max(2, batch.nbytes // (1536 * 1024)))
                rows = np.array_split(batch, n, axis=0)
                dev = self.device
                parts = list(self._put_pool.map(
                    lambda r: jax.device_put(r, dev), rows
                ))
                out = jnp.concatenate(parts, axis=0)
            else:
                out = jax.device_put(batch, self.device)
            _throttle_to(batch.nbytes, t0)
            return out

    @staticmethod
    def _wave_i16able(w: np.ndarray) -> bool:
        """True when the waveform can ride the int16 transfer path exactly:
        already int16, or float32 with every sample on the 1/32768 grid."""
        if w.dtype == np.int16:
            return True
        if w.dtype != np.float32 or len(w) == 0:
            return w.dtype == np.float32
        scaled = w * PCM16_SCALE
        rounded = np.rint(scaled)
        return bool(
            np.array_equal(scaled, rounded)
            and rounded.min() >= -32768
            and rounded.max() <= 32767
        )

    @staticmethod
    def _maybe_int16(batch: np.ndarray):
        """Return (array, is_int16): int16 view when every sample sits
        exactly on the 1/32768 grid (i.e. source was 16-bit PCM, the common
        case), else the f32 batch unchanged."""
        scaled = batch * PCM16_SCALE
        rounded = np.rint(scaled)
        if (
            np.array_equal(scaled, rounded)
            and rounded.min() >= -32768
            and rounded.max() <= 32767
        ):
            return rounded.astype(np.int16), True
        return batch, False

    def _device_params(self):
        if self._params_device is None:
            if self.mesh is not None:
                self._params_device = jax.device_put(
                    self.params, replicated(self.mesh)
                )
            else:
                # ~380 MB of BASE params: ship the leaves over parallel
                # streams (the relay/PCIe sustains ~2-3x the single-stream
                # rate), cutting cold-start by tens of seconds. The two
                # 113 MB scan-stacked encoder leaves are chunked so they
                # spread across streams instead of serializing one stream
                # while the rest sit idle. Already-on-device leaves pass
                # through untouched (device_put is a no-op for them).
                leaves, treedef = jax.tree_util.tree_flatten(self.params)
                dev = self.device
                chunk_bytes = 16 << 20
                pieces: list = []  # flat (leaf_idx, array) jobs
                n_parts = []
                for i, x in enumerate(leaves):
                    if isinstance(x, jax.Array) or (
                        np.asarray(x).nbytes <= chunk_bytes
                    ):
                        n_parts.append(1)
                        pieces.append(x)
                    else:
                        arr = np.asarray(x)
                        n = min(8, max(2, arr.nbytes // chunk_bytes))
                        n_parts.append(n)
                        pieces.extend(np.array_split(arr, n, axis=0))
                done = list(self._put_pool.map(
                    lambda x: jax.device_put(x, dev), pieces
                ))
                put, pos = [], 0
                for n in n_parts:
                    if n == 1:
                        put.append(done[pos])
                    else:
                        put.append(jnp.concatenate(done[pos : pos + n], axis=0))
                    pos += n
                self._params_device = jax.tree_util.tree_unflatten(treedef, put)
        return self._params_device

    def _params_aval(self):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            if not hasattr(x, "aval") else jax.ShapeDtypeStruct(x.shape, x.dtype),
            self.params,
        )

    def _prewarm_keys(self, keys) -> None:
        """Compile (batch, length, int16) shapes concurrently and KEEP the
        AOT executables.

        The remote compile service overlaps compiles almost perfectly
        (measured: 3 fresh BASE shapes in 22.6 s vs 44.8 s for 2 run
        sequentially), so warming k shapes costs ~the slowest one.
        Compilation needs only avals, not values — fn.lower(shape_structs)
        .compile() runs while the ~380 MB param transfer streams in
        parallel. The resulting Compiled objects are retained in _aot and
        dispatched directly: jit's own dispatch cache cannot reuse AOT
        work, and routing the reuse through the persistent disk cache
        (round 2) silently double-compiled every shape on the driver when
        the AOT and JIT cache keys disagreed."""
        keys = [
            k for k in keys
            if k not in self._aot and k not in self._compiled_keys
        ]
        if not keys:
            return
        p_aval = self._params_aval()

        def warm(key):
            from ..utils.cache import cached_compile_guard

            bsz, blen, i16 = key
            fn = self._get_fn(bsz, blen, i16)
            w = jax.ShapeDtypeStruct(
                (bsz, blen), jnp.int16 if i16 else jnp.float32
            )
            l = jax.ShapeDtypeStruct((bsz,), jnp.int32)
            # guard: fails loudly if a cpu_compile_bypass is open — the
            # process-global cache flag would silently un-cache this
            # compile (utils/cache.py ordering contract)
            with cached_compile_guard():
                self._aot[key] = fn.lower(p_aval, w, l).compile()
            self._compiled_keys.add(key)

        with ThreadPoolExecutor(max_workers=min(4, len(keys))) as ex:
            list(ex.map(warm, keys))

    def _dispatch(self, key: tuple, params, wave_dev, len_dev):
        """Run one padded batch through the retained AOT executable when
        one exists for this shape, else through jit dispatch (identical
        program; AOT merely skips recompilation)."""
        aot = self._aot.get(key)
        if aot is not None:
            try:
                with timed("engine.dispatch"):
                    return aot(params, wave_dev, len_dev)
            except (TypeError, ValueError):
                # aval/device mismatch (e.g. explicit device override that
                # differs from the default the AOT lowering assumed): fall
                # back to jit for this and future calls of the shape
                self._aot.pop(key, None)
                self._compiled_keys.discard(key)
        if key[0] == "pk":
            # fused executables run ONLY as prewarmed AOTs — jitting the
            # full decode+forward here would block the submit path on a
            # synchronous full-model compile. Decode the frame standalone
            # (small jit) and ride the plain int16 forward instead.
            from ..ops import wirecodec

            _, bsz, blen, _shape = key
            wave_dev = wirecodec.decode_combined_call(wave_dev, b=bsz, t=blen)
            key = (bsz, blen, True)
            aot = self._aot.get(key)
            if aot is not None:
                try:
                    return aot(params, wave_dev, len_dev)
                except (TypeError, ValueError):
                    self._aot.pop(key, None)
        out = self._get_fn(*key)(params, wave_dev, len_dev)
        self._compiled_keys.add(key)
        return out

    def _chunk_batches(self, n_items: int, blen: int) -> list:
        """Padded batch sizes a bucket of n_items files will run as: full
        steady-state batches, then one right-sized tail. Shared by the
        embed paths and prewarm so the prewarmed shape set is exactly the
        executed one (the round-2 bench cold-compiled its 32-row tail
        inside the timed warmup because prewarm missed it)."""
        full = self.batch_size_for(blen)
        sizes = []
        left = n_items
        while left > 0:
            b = min(self.batch_size_for(blen, remaining=left), full)
            sizes.append(b)
            left -= min(b, left)
        return sizes

    def _remap_to_compiled(self, keys: list) -> list:
        """Rewrite planned (bsz, blen, int16) batch keys onto shapes that
        are already compiled (or will compile this call anyway): a chunk
        whose exact shape was never compiled pads up to the smallest
        covering executable instead of triggering a fresh compile. See the
        ``pad_to_compiled`` field note for the cost model. Shapes planned
        in this same call count as available — a tail then rides its
        bucket's steady-state shape and the call compiles ONE shape per
        bucket, not two."""
        avail = set(self._compiled_keys) | set(self._aot) | set(keys)
        out = []
        for bsz, blen, i16 in keys:
            key = (bsz, blen, i16)
            if key not in self._compiled_keys and key not in self._aot:
                covers = [
                    k[0] for k in avail
                    if isinstance(k[0], int)  # skip ("pk", ...) keys
                    and k[1] == blen and k[2] == i16 and k[0] > bsz
                ]
                if covers:
                    bsz = min(covers)
            out.append((bsz, blen, i16))
        return out

    def prewarm(self, durations=(10.0,), counts=None, int16: bool = True,
                single: bool = True, ladder: bool = False) -> None:
        """Pre-compile the bucket shapes for the given file durations:
        the full steady-state batch per bucket, plus (optionally) the
        batch-1 shape single-file requests hit. When ``counts`` gives the
        planned number of files per duration, every batch shape of that
        run — including the tail — is compiled, so the first real pass
        compiles nothing. ``ladder`` additionally compiles small/medium
        tail shapes (8- and 32-row grid sizes) so a warmed SERVER answers
        any request count with minimal padding waste (pad_to_compiled
        rounds uncompiled request shapes up to the nearest rung). All
        compiles run concurrently (see _prewarm_keys), so a ladder costs
        ~the slowest compile, not the sum."""
        keys = []
        for j, sec in enumerate(durations):
            blen = bucket_length(int(sec * 16000))
            n = counts[j] if counts is not None else None
            if n:
                for bsz in dict.fromkeys(self._chunk_batches(n, blen)):
                    keys.append((bsz, blen, int16))
            else:
                keys.append((self.batch_size_for(blen), blen, int16))
            if single:
                keys.append((self.batch_size_for(blen, remaining=1), blen, int16))
            if ladder:
                for r in (8, 32):
                    keys.append(
                        (self.batch_size_for(blen, remaining=r), blen, int16)
                    )
        params_future = self._params_async()  # overlap transfer with compiles
        self._prewarm_keys(dict.fromkeys(keys))
        params_future.result()

    def _attn_batch_cap(self, length: int) -> int:
        """Largest batch whose attention-score buffers fit the HBM budget
        (quadratic in frame count — the binding constraint for long files;
        the linear sample budget binds for short ones)."""
        cfg = getattr(self.model, "config", None)
        if cfg is None:
            return MAX_BATCH
        try:
            from ..models.wav2vec2 import feature_frame_lengths
            from ..ops.attention import AUTO_FLASH_MAX_T, AUTO_FLASH_MIN_T

            frames = int(feature_frame_lengths(np.asarray(length), cfg))
            heads = cfg.num_heads
        except Exception:
            return MAX_BATCH
        impl = getattr(cfg, "attention_impl", "xla")
        # mirrors ops/attention.mha's 'auto' rule: the flash flip (which
        # escapes the quadratic score-buffer cap) happens only for
        # bf16-class score configs inside the window (measured 1.192x
        # there; flash-HIGHEST lost 0.651x and is retired from 'auto')
        flash = impl == "pallas" or (
            impl == "auto"
            and getattr(cfg, "attn_score_prec", None) == "default"
            and AUTO_FLASH_MIN_T <= frames <= AUTO_FLASH_MAX_T
            and jax.default_backend() == "tpu"
        )
        if flash:
            # flash streams K/V: no [B, H, T', T'] buffers, the linear
            # sample budget is the binding constraint again
            return MAX_BATCH
        per_item = 2 * heads * frames * frames * 4
        return max(1, ATTN_SCORE_BYTES_BUDGET // max(per_item, 1))

    def _params_async(self):
        """Future for the device-resident params: starts the transfer on a
        helper thread so planning/compilation overlaps the wire time."""
        from concurrent.futures import Future

        if self._params_device is not None:
            done: Future = Future()
            done.set_result(self._params_device)
            return done
        ex = ThreadPoolExecutor(max_workers=1)
        fut = ex.submit(self._device_params)
        ex.shutdown(wait=False)
        return fut

    def batch_size_for(self, length: int, remaining: Optional[int] = None) -> int:
        b = max(1, self.batch_sample_budget // max(length, 1))
        b = min(b, MAX_BATCH, self._attn_batch_cap(length))
        if self.mesh is not None:
            n = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            b = max(n, (b // n) * n)
            if remaining is not None and remaining < b:
                # right-size the tail batch to the next multiple of the mesh
                b = max(n, ((remaining + n - 1) // n) * n)
        else:
            # snap down to a multiple of 32 (powers of two below that):
            # bounded distinct-shape count, but admits the measured-optimal
            # B=96 steady batch for 10 s buckets that a pure power-of-two
            # floor rejected (64 ran 5% slower; round-2 advisor finding)
            if b >= 32:
                b = (b // 32) * 32
            else:
                b = 1 << int(math.floor(math.log2(b)))
            if remaining is not None and remaining < b:
                # tail batch: smallest grid size covering the remainder
                # (avoids embedding 96 rows to score 2 files)
                if remaining > 32:
                    b = ((remaining + 31) // 32) * 32
                else:
                    b = 1 << max(0, (remaining - 1)).bit_length()
        return b

    def embed_waves(
        self,
        waves: Sequence[np.ndarray],
        progress: bool = False,
    ) -> np.ndarray:
        """Embed a list of 1-D float32 waveforms -> [N, emb_dim] in order."""
        n = len(waves)
        if n == 0:
            return np.zeros((0, self.model.emb_dim), np.float32)
        pending, bar = self._submit_waves(waves, progress)
        out: dict[int, np.ndarray] = {}
        self._collect(pending, out, bar)
        if bar is not None:
            bar.close()
        return np.stack([out[i] for i in range(n)])

    def embed_waves_device(self, waves: Sequence[np.ndarray]):
        """Embed waveforms and leave the result ON DEVICE: a jax array
        [N, emb_dim] in input order. Callers that consume embeddings on
        device (the scoring distance matrix) skip embed_waves' host
        readback AND cdist's h2d re-upload — through the relay each round
        trip costs ~0.1-1 s of latency regardless of payload, which is a
        large share of the drain of a short pipelined pass (the bench
        headline runs 3-8 batches/pass). Mesh mode falls back to the host
        path: per-chunk results are sharded, and the large-scale path
        shards the distance matrix itself instead (scoring/large_scale.py).
        """
        n = len(waves)
        if n == 0 or self.mesh is not None:
            return jnp.asarray(self.embed_waves(waves))
        pending, _ = self._submit_waves(waves, progress=False)
        with timed("engine.collect.drain"):
            self._poll_ready([e for _, e in pending])
        # restore input order: rows of the device concat follow chunk
        # order; invert the permutation with one tiny device gather (the
        # slice/concat/take executables are shape-cached across calls)
        perm = np.concatenate(
            [np.asarray(c, np.int64) for c, _ in pending]
        )
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        parts = [e[: len(c)] for c, e in pending]
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        emb = jnp.take(cat, jnp.asarray(inv), axis=0)
        # the poll above waited out every queued put/compute: drained
        self._backlog = 0
        return emb

    def _submit_waves(
        self,
        waves: Sequence[np.ndarray],
        progress: bool = False,
    ):
        """Shared submit pipeline: plan buckets/batches, assemble padded
        arrays on a thread pool, put + dispatch each batch async. Returns
        ``(pending, bar)`` where pending is a list of
        ``(original_indices, device_embeddings)`` in submit order."""
        n = len(waves)
        order = sorted(range(n), key=lambda i: len(waves[i]))
        # start the (up to ~380 MB) param transfer now; shape compiles
        # below need only avals and run concurrently with it
        params_future = self._params_async()

        # group by bucket
        groups: dict[int, list[int]] = {}
        for i in order:
            groups.setdefault(bucket_length(len(waves[i])), []).append(i)

        iterator = sorted(groups.items())
        if progress:
            try:
                from tqdm import tqdm

                total = sum(len(v) for v in groups.values())
                bar = tqdm(total=total, desc="embedding")
            except Exception:  # pragma: no cover
                bar = None
        else:
            bar = None

        # Plan every batch, assemble the padded arrays in a thread pool
        # (independent, memcpy-bound), then submit in order: JAX async
        # dispatch pipelines the host->device transfer of batch k+1 under
        # the compute of batch k (the reference's python loop serializes
        # load->transfer->compute, `nomad.py:172-183`).
        chunks: list[tuple[list[int], int, int]] = []  # (indices, bsz, blen)
        for blen, idxs in iterator:
            start = 0
            for bsz in self._chunk_batches(len(idxs), blen):
                take = min(bsz, len(idxs) - start)
                chunks.append((idxs[start : start + take], bsz, blen))
                start += take

        # Exact int16-ness per wave (int16 dtype, or f32 on the PCM16
        # grid — one memcpy-speed pass, threaded). Shared by the shape
        # prewarm (predictions match what assemble builds, so no shape
        # compiles twice) and by assemble itself.
        with ThreadPoolExecutor(max_workers=8) as ex:
            i16able = list(ex.map(self._wave_i16able, waves))

        if self.pad_to_compiled:
            remapped = self._remap_to_compiled([
                (bsz, blen, all(i16able[i] for i in chunk))
                for chunk, bsz, blen in chunks
            ])
            chunks = [
                (chunk, k[0], blen)
                for (chunk, _b, blen), k in zip(chunks, remapped)
            ]

        # compile every planned shape concurrently before the sequential
        # submit loop
        self._prewarm_keys(dict.fromkeys(
            (bsz, blen, all(i16able[i] for i in chunk))
            for chunk, bsz, blen in chunks
        ))
        params = params_future.result()

        def assemble(job):
            chunk, bsz, blen = job
            # int16-able waveforms (PCM16 decode output, or f32 still on
            # the PCM16 grid) ship as int16 end-to-end: half the transfer
            # bytes, exact on-device dequantize. Mixed chunks fall back
            # to f32.
            chunk_i16 = all(i16able[i] for i in chunk)
            dtype = np.int16 if chunk_i16 else np.float32
            batch = np.zeros((bsz, blen), dtype)
            lengths = np.empty((bsz,), np.int32)
            for row, i in enumerate(chunk):
                w = waves[i]
                if chunk_i16 and w.dtype != np.int16:
                    w = np.rint(w * PCM16_SCALE).astype(np.int16)
                elif not chunk_i16 and w.dtype == np.int16:
                    w = w.astype(np.float32) / PCM16_SCALE
                batch[row, : len(w)] = w
                lengths[row] = len(w)
            for row in range(len(chunk), bsz):  # pad rows: repeat last
                batch[row] = batch[len(chunk) - 1]
                lengths[row] = lengths[len(chunk) - 1]
            enc = False
            if (
                chunk_i16
                and self._codec_applicable(batch)
                and (self.wire_codec == "on" or self._use_codec is not False)
            ):
                # wire-codec encode here, on the assemble thread: overlaps
                # the previous batch's wire time (on the submit thread it
                # serialized the pipeline and ate the codec's win). Once
                # the raw-vs-packed race settles on raw, stop encoding
                # (unless 'on' forces the packed path).
                enc = self._encode_batch(batch)
            return batch, lengths, chunk_i16, enc

        pending: list[tuple[list[int], object]] = []
        enc_total = enc_ready = 0
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(chunks)))) as ex:
            futures = [ex.submit(assemble, job) for job in chunks]
            for (chunk, bsz, blen), fut in zip(chunks, futures):
                # encode-overlap observation: when the assemble future
                # (pad + memcpy + wire-codec encode) is ALREADY DONE the
                # moment the submit loop asks for it, its encode cost rode
                # entirely under the previous batches' wire/compute time —
                # i.e. packed's host encode was FREE this batch. The banked
                # fraction feeds the raw-vs-packed race, which otherwise
                # charges packed the full encode wall (the conservative
                # assumption measured true on a contended host, but false
                # on a pipelined good-weather run where forced-on beat
                # forced-off 1030 vs 944 wss while the race still said raw).
                done_first = fut.done()
                batch, lengths, is_int16, enc = fut.result()
                if enc is not False:  # assemble attempted the encode
                    enc_total += 1
                    enc_ready += bool(done_first)
                with timed("engine.submit", items=len(chunk), nbytes=batch.nbytes):
                    payload, len_dev, pk = self._put(batch, lengths, enc)
                    key = (
                        ("pk", bsz, blen, tuple(pk)) if pk is not None
                        else (bsz, blen, is_int16)
                    )
                    pending.append(
                        (chunk, self._dispatch(key, params, payload, len_dev))
                    )
                if self.serialize_pipeline:
                    # reference-style serial loop: wait out this batch's
                    # wire + compute before assembling/putting the next
                    jax.block_until_ready(pending[-1][1])
                    self._backlog = 0

        if enc_total > 1 and not self.serialize_pipeline:
            # ignore single-batch calls: the first batch can never be
            # "ready ahead" (nothing pipelines before it), so tiny calls
            # would bank a spurious 0. Serialized (overlap-leg) passes are
            # excluded too: blocking between batches leaves every assemble
            # future done, which would bank a spurious 1.
            frac = enc_ready / enc_total
            old = self._encode_ready_frac
            self._encode_ready_frac = (
                frac if old is None else 0.5 * frac + 0.5 * old
            )
        return pending, bar

    @staticmethod
    def _poll_ready(arrs) -> None:
        """Wait for queued device results by POLLING is_ready: through the
        relay a blocking wait resolves completion lazily (measured 18.3 s
        where a 50 ms poll saw every batch ready at 12.5 s — 626 -> 911
        wss on the same 2k config), and a readback probe would trace
        fresh ops (a cold ravel compile inside the drain)."""
        try:
            waiting = list(arrs)
            while waiting:
                waiting = [
                    e for e in waiting
                    if not (hasattr(e, "is_ready") and e.is_ready())
                ]
                if not waiting:
                    break
                if any(not hasattr(e, "is_ready") for e in waiting):
                    for e in waiting:
                        jax.block_until_ready(e)
                    break
                time.sleep(0.02)
        except Exception:  # pragma: no cover - deleted buffer
            pass

    def _collect(self, pending, out, bar=None, group: int = 0) -> None:
        """Drain (chunk, device-embedding) results in GROUPS: one device
        concatenate + one readback per group instead of one RPC per
        chunk. Through the relay each d2h round trip costs ~0.5-1 s of
        latency regardless of size — the 10k-file large-scale run spent
        ~84 s on 105 sequential per-chunk readbacks before grouping, and
        8 groups of 16 still paid ~8 round trips inside a 23 s collect
        span (r5 BENCH_LARGE). Embeddings are 1 KB/file, so the default
        (group=0) drains EVERYTHING in one concatenate + one readback,
        byte-capped at 256 MB of rows (a cap that binds only past ~250k
        files). A live progress bar keeps groups of 16 so it advances."""
        if group <= 0:
            if bar is not None:
                group = 16
            else:
                row_b = max(
                    1,
                    max(e.shape[1] for _, e in pending) * 4
                    if pending else 1,
                )
                cap_rows = (256 << 20) // row_b
                per = max(1, max(e.shape[0] for _, e in pending)
                          if pending else 1)
                group = max(16, cap_rows // per)
        for g0 in range(0, len(pending), group):
            grp = pending[g0 : g0 + group]
            # split the wait: 'drain' waits for the group's queued compute
            # (is_ready poll — see _poll_ready), so the 'collect' span
            # underneath is pure d2h readback + concat — r5's tone
            # re-drive showed a 77.7 s collect with no way to tell
            # trailing compute from a d2h weather episode.
            with timed("engine.collect.drain"):
                self._poll_ready([e for _, e in grp])
            with timed("engine.collect",
                       items=sum(len(c) for c, _ in grp)):
                if len(grp) == 1:
                    embs = [np.asarray(grp[0][1])]
                else:
                    cat = np.asarray(
                        jnp.concatenate([e for _, e in grp], axis=0)
                    )
                    embs, ofs = [], 0
                    for _, e in grp:
                        embs.append(cat[ofs : ofs + e.shape[0]])
                        ofs += e.shape[0]
            # these readbacks waited on every put/compute submitted before
            # them: the pipeline is drained, re-probes are cheap again
            self._backlog = 0
            for (chunk, _e), emb in zip(grp, embs):
                for row, i in enumerate(chunk):
                    out[i] = emb[row]
                if bar is not None:
                    bar.update(len(chunk))

    def load_waves(self, paths: Sequence[str], trim: bool = False):
        from ..io import load_for_scoring

        def load(p):
            return load_for_scoring(p, trim=trim)

        with ThreadPoolExecutor(max_workers=self.io_threads) as ex:
            return list(ex.map(load, paths))

    def _cache_key(self, path: str, trim: bool):
        try:
            st = os.stat(path)
        except OSError:
            return None  # unstatable: let the embed path report the error
        return (os.path.abspath(path), trim, st.st_mtime_ns, st.st_size)

    def embed_files(
        self, paths: Sequence[str], trim: bool = False, progress: bool = False
    ) -> np.ndarray:
        """File -> embedding pipeline. When the native ingest library is
        available, decode/fold/resample/pad runs entirely in the C++ thread
        pool straight into the padded device batch (GIL-free); falls back to
        the Python decoder otherwise (bit-identical results, tested).

        With ``file_cache`` enabled, unchanged files (same path, mtime,
        size) reuse their previous embedding — embeddings are deterministic
        per (params, file), so results are bit-identical to a full run."""
        if self.file_cache is None or len(paths) == 0:
            return self._embed_files_uncached(paths, trim, progress)
        keys = [self._cache_key(p, trim) for p in paths]
        # Snapshot hit values BEFORE inserting fresh entries: with a
        # bounded LRU the inserts below can evict this request's own hits
        # (a mixed request of >=maxsize new files + cached ones crashed
        # with KeyError on the final gather). Reading through __getitem__
        # here also refreshes the hits' recency.
        hits = {
            i: self.file_cache[k]
            for i, k in enumerate(keys)
            if k is not None and k in self.file_cache
        }
        self.cache_hits += len(hits)
        if len(hits) == len(paths):
            return np.stack([hits[i] for i in range(len(paths))])
        missing = [i for i in range(len(paths)) if i not in hits]
        fresh = self._embed_files_uncached(
            [paths[i] for i in missing], trim, progress
        )
        for row, i in enumerate(missing):
            if keys[i] is not None:
                self.file_cache[keys[i]] = fresh[row]
        fresh_it = iter(range(len(missing)))
        out = np.empty((len(paths), fresh.shape[1]), fresh.dtype)
        for i in range(len(paths)):
            out[i] = hits[i] if i in hits else fresh[next(fresh_it)]
        return out

    def _embed_files_uncached(self, paths, trim, progress) -> np.ndarray:
        native_emb = self._embed_files_native(paths, trim, progress)
        if native_emb is not None:
            return native_emb
        return self.embed_waves(self.load_waves(paths, trim=trim), progress=progress)

    def _embed_files_native(self, paths, trim, progress):
        from ..io import native
        from ..io.resample import sinc_resample_kernel

        if not native.available() or len(paths) == 0:
            return None
        infos = [native.native_probe(p) for p in paths]
        if any(i is None for i in infos):
            return None  # unreadable/unknown format: python path reports it

        import math as _math

        trim_sec = 10 if trim else 0
        # predicted post-pipeline lengths for bucket planning; mono PCM16 at
        # 16 kHz rides the raw-int16 loader (half the transfer bytes)
        plan = []  # (bucket_len, sr, i16able, index)
        for idx, (sr, frames, ch, bits, is_float, is_flac) in enumerate(infos):
            if sr == 16000:
                n = frames
            else:
                _k, _w, og, ng = sinc_resample_kernel(sr, 16000)
                n = int(_math.ceil(ng * frames / og))
            if trim_sec:
                n = min(n, 16000 * trim_sec)
            i16 = (
                sr == 16000 and ch == 1 and bits == 16
                and not is_float and not is_flac
            )
            plan.append((bucket_length(n), sr, i16, idx))

        groups: dict[tuple[int, int, bool], list[int]] = {}
        for blen, sr, i16, idx in plan:
            groups.setdefault((blen, sr, i16), []).append(idx)

        params_future = self._params_async()

        # plan every chunk, then (pad_to_compiled) remap never-compiled
        # batch shapes onto covering compiled executables — the serve-path
        # compile-avoidance documented on the field
        plan_chunks = []  # ((blen, sr, i16), chunk_indices, bsz, pred_i16)
        for (blen, sr, i16), idxs in sorted(groups.items()):
            pred_i16 = i16 or self.quantize_transfer
            start = 0
            for bsz in self._chunk_batches(len(idxs), blen):
                chunk = idxs[start : start + min(bsz, len(idxs) - start)]
                start += len(chunk)
                plan_chunks.append(((blen, sr, i16), chunk, bsz, pred_i16))
        if self.pad_to_compiled:
            remapped = self._remap_to_compiled(
                [(bsz, g[0], p16) for g, _c, bsz, p16 in plan_chunks]
            )
            plan_chunks = [
                (g, c, k[0], p16)
                for (g, c, _b, p16), k in zip(plan_chunks, remapped)
            ]

        # parallel-compile all planned shapes first (predicted transfer
        # dtype: raw-i16 loader, or the quantize-to-PCM16 path); the param
        # transfer streams underneath
        self._prewarm_keys(dict.fromkeys(
            (bsz, g[0], p16) for g, _c, bsz, p16 in plan_chunks
        ))
        params = params_future.result()

        out: dict[int, np.ndarray] = {}
        pending = []
        for (blen, sr, i16), chunk, bsz, _pred_i16 in plan_chunks:
            with timed("engine.native_ingest", items=len(chunk)):
                if i16:
                    res = native.native_load_batch_i16(
                        [paths[i] for i in chunk],
                        pad_len=blen,
                        target_sr=16000,
                        trim_sec=trim_sec,
                        num_threads=self.io_threads,
                    )
                else:
                    res = native.native_load_batch(
                        [paths[i] for i in chunk],
                        pad_len=blen,
                        target_sr=16000,
                        trim_sec=trim_sec,
                        expect_sr=sr if sr != 16000 else 0,
                        num_threads=self.io_threads,
                        quantize_i16=self.quantize_transfer,
                    )
            if res is None:
                return None
            batch_part, lengths_part, errs = res
            if len(chunk) < bsz:
                batch = np.zeros((bsz, blen), batch_part.dtype)
                lengths = np.empty((bsz,), np.int64)
                batch[: len(chunk)] = batch_part
                lengths[: len(chunk)] = lengths_part
                batch[len(chunk) :] = batch_part[-1]
                lengths[len(chunk) :] = lengths_part[-1]
            else:
                batch, lengths = batch_part, lengths_part
            # native failures (exotic formats/races): python fallback
            for row, i in enumerate(chunk):
                if errs[row] != 0:
                    w = load_processing(paths[i], trim=trim)[0][:blen]
                    if batch.dtype == np.int16:
                        w = np.clip(
                            np.round(w * PCM16_SCALE), -32768, 32767
                        ).astype(np.int16)
                    batch[row, : len(w)] = w
                    batch[row, len(w) :] = 0
                    lengths[row] = len(w)
            if batch.dtype == np.int16:
                is_int16 = True
            else:
                batch, is_int16 = self._maybe_int16(batch)
            payload, len_dev, pk = self._put(batch, lengths)
            dkey = (
                ("pk", bsz, blen, tuple(pk)) if pk is not None
                else (bsz, blen, is_int16)
            )
            pending.append(
                (chunk, self._dispatch(dkey, params, payload, len_dev))
            )
        self._collect(pending, out)
        return np.stack([out[i] for i in range(len(paths))])


def list_dir_files(path: str) -> list[str]:
    """Quirk Q3: dir mode follows os.listdir order (`nomad.py:152`)."""
    return [os.path.join(path, x) for x in os.listdir(path)]
