"""Serving mode: JSON-lines protocol over in-memory streams."""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.api import Nomad
from nomad_tpu.io import write_wav
from nomad_tpu.models import NomadModel, Wav2Vec2Config
from nomad_tpu.serve import NomadServer


@pytest.fixture(scope="module")
def server():
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    return NomadServer(nomad=Nomad(config=cfg, emb_dim=16, params=params))


def roundtrip(server, requests):
    infile = io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n")
    out = io.StringIO()
    server.run(infile, out)
    return [json.loads(l) for l in out.getvalue().strip().splitlines()]


def test_ping_and_unknown(server):
    resps = roundtrip(server, [{"op": "ping"}, {"op": "nope"}])
    assert resps[0]["ok"] is True
    assert resps[1]["ok"] is False


def test_embed_and_score(server, tmp_path, rng):
    paths = []
    for i in range(2):
        w = (0.2 * rng.standard_normal(1000)).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        write_wav(p, w[None], 16000, bits=16)
        paths.append(p)
    nmr = tmp_path / "nmr"
    deg = tmp_path / "deg"
    nmr.mkdir()
    deg.mkdir()
    for i in range(2):
        w = (0.2 * rng.standard_normal(1200)).astype(np.float32)
        write_wav(str(nmr / f"n{i}.wav"), w[None], 16000, bits=16)
        write_wav(str(deg / f"d{i}.wav"), w[None], 16000, bits=16)

    out_dir = tmp_path / "res"
    out_dir.mkdir()
    resps = roundtrip(
        server,
        [
            {"op": "embed", "paths": paths},
            {"op": "score", "nmr": str(nmr), "deg": str(deg),
             "results_path": str(out_dir)},
            {"op": "stats"},
        ],
    )
    assert resps[0]["ok"]
    assert np.asarray(resps[0]["embeddings"]).shape == (2, 16)
    assert resps[1]["ok"]
    assert len(resps[1]["avg"]) == 2
    spans = resps[2]["stats"]
    assert resps[2]["ok"]
    assert "engine.submit" in spans or "engine.native_ingest" in spans


def test_embedding_cache_across_requests(server, tmp_path, rng):
    """Second score request against the same files reuses their
    embeddings (bit-identical scores), and stats reports the hits; an
    edited file is re-embedded."""
    nmr = tmp_path / "cnmr"
    deg = tmp_path / "cdeg"
    nmr.mkdir()
    deg.mkdir()
    for i in range(3):
        w = (0.2 * rng.standard_normal(1100)).astype(np.float32)
        write_wav(str(nmr / f"n{i}.wav"), w[None], 16000, bits=16)
    wd = (0.2 * rng.standard_normal(900)).astype(np.float32)
    write_wav(str(deg / "d0.wav"), wd[None], 16000, bits=16)

    req = {"op": "score", "nmr": str(nmr), "deg": str(deg)}
    r1, r2, st = roundtrip(server, [req, req, {"op": "stats"}])
    assert r1["ok"] and r2["ok"]
    assert r1["avg"] == r2["avg"]
    assert r1["pairwise"] == r2["pairwise"]
    assert st["embed_cache"]["enabled"]
    assert st["embed_cache"]["entries"] >= 4
    assert st["embed_cache"]["hits"] >= 4  # all 4 files on request 2

    # mutate the degraded file: its score must change (no stale cache).
    # NB different content, not different gain — the backbone is
    # scale-invariant (GroupNorm after the bias-free conv_0)
    import os
    import time as _t

    wd2 = (0.2 * rng.standard_normal(1400)).astype(np.float32)
    write_wav(str(deg / "d0.wav"), wd2[None], 16000, bits=16)
    os.utime(str(deg / "d0.wav"), ns=(_t.time_ns(), _t.time_ns() + 10**9))
    r3 = roundtrip(server, [req])[0]
    assert r3["ok"]
    assert r3["pairwise"] != r1["pairwise"]


def test_loss_and_shutdown(server, rng):
    est = (0.1 * rng.standard_normal((1, 1600))).astype(np.float32).tolist()
    clean = (0.1 * rng.standard_normal((1, 1600))).astype(np.float32).tolist()
    resps = roundtrip(
        server,
        [{"op": "loss", "estimate": est, "clean": clean},
         {"op": "shutdown"}, {"op": "ping"}],
    )
    assert resps[0]["ok"] and resps[0]["loss"] > 0
    assert resps[1]["op"] == "shutdown"
    assert len(resps) == 2  # nothing after shutdown


def test_errors_do_not_kill_service(server):
    resps = roundtrip(
        server,
        [{"op": "score", "nmr": "/nope", "deg": "/nope"}, {"op": "ping"}],
    )
    assert resps[0]["ok"] is False and "error" in resps[0]
    assert resps[1]["ok"] is True


def test_embedding_lru_bounds_memory_and_evicts_stale(tmp_path):
    """Soak: a churning file population holds the cache flat at maxsize
    (VERDICT r2: the plain-dict cache grew ~1 KB/file forever), and an
    edited file (same path, new mtime) evicts its stale entry immediately
    instead of leaking it."""
    from nomad_tpu.scoring.engine import EmbeddingLRU

    lru = EmbeddingLRU(maxsize=64)
    emb = np.zeros(16, np.float32)
    for i in range(1000):  # churn: 1000 distinct files through a 64-cap
        lru[(f"/f/{i}.wav", False, 1, 100)] = emb
        assert len(lru) <= 64
    assert len(lru) == 64
    assert lru.evictions == 1000 - 64

    # stale-mtime eviction: re-keying the same path replaces, not adds
    before = len(lru)
    lru[("/f/999.wav", False, 2, 100)] = emb  # same path, new mtime
    assert len(lru) == before
    assert lru.stale_evictions == 1
    assert ("/f/999.wav", False, 1, 100) not in lru
    assert ("/f/999.wav", False, 2, 100) in lru

    # LRU order: touching an entry protects it from the next eviction
    hot = ("/f/990.wav", False, 1, 100)
    _ = lru[hot]
    for i in range(2000, 2000 + 63):
        lru[(f"/f/{i}.wav", False, 1, 100)] = emb
    assert hot in lru


def test_server_cache_is_lru_and_stats_report_evictions(tmp_path, rng):
    """End-to-end: a server with a tiny cache cap stays bounded across
    requests and reports eviction counters in the stats op."""
    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    srv = NomadServer(
        nomad=Nomad(config=cfg, emb_dim=16, params=params), cache_size=4
    )
    paths = []
    for i in range(10):
        p = tmp_path / f"s{i}.wav"
        write_wav(
            str(p), (0.05 * rng.standard_normal(1600)).astype(np.float32)[None],
            16000, bits=16,
        )
        paths.append(str(p))
    for i in range(0, 10, 2):
        resp = srv.handle({"op": "embed", "paths": paths[i : i + 2]})
        assert resp["ok"]
    stats = srv.handle({"op": "stats"})["embed_cache"]
    assert stats["enabled"] and stats["entries"] <= 4
    assert stats["maxsize"] == 4
    assert stats["evictions"] == 10 - 4


def test_protocol_stream_carries_only_json(tmp_path):
    """The subprocess entry point must keep stdout JSON-clean: the API keeps
    the reference's stdout banners (api.py:111,234-236 / reference
    nomad.py:49,102-105), so serve.main diverts them to stderr — a client
    must be able to json-parse EVERY stdout line, including during a score
    request (which prints two embedding banners)."""
    import subprocess
    import sys as _sys

    nmr, deg = tmp_path / "nmr", tmp_path / "deg"
    nmr.mkdir(), deg.mkdir()
    r = np.random.default_rng(0)
    for d, n in ((nmr, 2), (deg, 2)):
        for i in range(n):
            write_wav(
                str(d / f"f{i}.wav"),
                (0.05 * r.standard_normal(1600)).astype(np.float32)[None],
                16000, bits=16,
            )
    reqs = [
        {"op": "ping"},
        {"op": "score", "nmr": str(nmr), "deg": str(deg),
         "results_path": None},
        {"op": "shutdown"},
    ]
    # pin CPU via jax.config (the JAX_PLATFORMS env var does not stop the
    # axon relay plugin from dialing out at startup — with the relay
    # down/slow the subprocess would hang on hardware, not on the code
    # under test) while still driving the real serve.main entry point
    proc = subprocess.run(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from nomad_tpu.serve import main; main(['--model', 'tiny'])"],
        input="\n".join(json.dumps(q) for q in reqs) + "\n",
        capture_output=True, text=True, timeout=1200,  # CPU-contended CI
        env=os.environ, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == len(reqs), proc.stdout
    resps = [json.loads(l) for l in lines]  # raises if a banner leaked
    assert all(rsp["ok"] for rsp in resps)
    assert "NOMAD running on" in proc.stderr


def test_mixed_hit_miss_request_survives_lru_eviction(tmp_path, rng):
    """A request mixing cached files with >= maxsize NEW files must not
    crash: the LRU inserts for the fresh embeddings can evict this very
    request's hits, so hit values are snapshotted before inserting
    (regression: KeyError on the final gather)."""
    from nomad_tpu.scoring.engine import EmbeddingLRU

    cfg = Wav2Vec2Config.tiny()
    model = NomadModel(cfg, emb_dim=16)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 800)), method=NomadModel.init_all
    )
    srv = NomadServer(
        nomad=Nomad(config=cfg, emb_dim=16, params=params), cache_size=4
    )
    eng = srv.nomad.engine

    def wav(name, seed):
        p = tmp_path / name
        r = np.random.default_rng(seed)
        write_wav(
            str(p), (0.05 * r.standard_normal(1600)).astype(np.float32)[None],
            16000, bits=16,
        )
        return str(p)

    a = wav("a.wav", 0)
    ref_a = eng.embed_files([a])[0]  # A is now cached
    newfiles = [wav(f"n{i}.wav", 10 + i) for i in range(5)]  # > maxsize
    out = eng.embed_files([a] + newfiles)  # must not raise
    np.testing.assert_array_equal(out[0], ref_a)
    # fresh results are correct too (order preserved)
    solo = eng.embed_files([newfiles[-1]])
    np.testing.assert_array_equal(out[-1], solo[0])
    assert isinstance(eng.file_cache, EmbeddingLRU)
    assert len(eng.file_cache) <= 4
