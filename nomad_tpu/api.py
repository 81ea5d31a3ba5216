"""Public NOMAD API — the TPU-native equivalent of the reference ``Nomad``
class (`/root/reference/src/nomad_audio/nomad.py:35-212`).

Surface preserved:
  * ``Nomad(device=None).predict(mode='dir'|'csv', nmr, deg, results_path)``
    -> (df_avg, df_scores) pandas frames + CSVs in the reference format.
  * ``Nomad.forward(estimate, clean)`` -> differentiable 13-layer perceptual
    loss (use :meth:`loss_fn` for a pure function under jax.grad/jit).
  * ``Nomad.get_embeddings(path)`` / ``get_embeddings_csv`` -> embedding
    DataFrames.

Differences by design (documented):
  * lazy weight resolution, no import-time downloads (quirk Q1: the
    reference downloads ~400 MB into ./pt-models at import). We look for
    the same ``pt-models/{wav2vec_small,nomad_best_model}.pt`` files and
    convert them on first use (cached as npz); in a zero-egress environment
    without checkpoints, a seeded random init is used with a loud warning —
    pipeline numerics stay exact, score *values* then differ from the
    published model.
  * inference is batched + length-bucketed on TPU instead of a batch-1
    python loop; masked pooling keeps scores equal to unpadded batch-1.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .convert import canonicalize, load_torch_checkpoint, merge_into, to_flax_params
from .models import NomadModel, Wav2Vec2Config, nomad_loss
from .ops import cdist
from .scoring.csvio import build_result_frames, write_results
from .scoring.engine import EmbeddingEngine, list_dir_files

W2V_FILENAME = "wav2vec_small.pt"
NOMAD_FILENAME = "nomad_best_model.pt"
CACHE_FILENAME = "nomad_tpu_params.npz"


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


class Nomad:
    def __init__(
        self,
        device: Optional[str] = None,
        weights_dir: str = "pt-models",
        config: Optional[Wav2Vec2Config] = None,
        emb_dim: int = 256,
        params: Optional[dict] = None,
        mesh=None,
        precision: str = "balanced",
    ):
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if config is None:
            # 'balanced' (default since round 4) = composite recipe C1:
            # single-pass bf16 on posconv + attention scores + FFN fc1,
            # 'high' islands elsewhere — measured 1.17x compute at 6.6e-4
            # max pairwise-score delta on the pause-heavy stress set
            # (scripts/precision_composite.py), inside the 1e-3 demo
            # budget. 'exact' = 'high' MXU precision everywhere, ~2e-5
            # from the f32 oracle (the parity-anchor config). 'fast' =
            # the round-2 recipe (bf16 across the whole transformer),
            # ~1.25x but 1.9e-3 on pause-heavy speech — outside the
            # budget, opt-in only.
            if precision == "fast":
                config = Wav2Vec2Config.fast()
            elif precision == "balanced":
                config = Wav2Vec2Config.balanced()
            elif precision == "exact":
                config = Wav2Vec2Config.base()
            else:
                raise ValueError(
                    f"unknown precision {precision!r}: expected "
                    "'balanced', 'fast' or 'exact'"
                )
        self.config = config
        self.emb_dim = emb_dim
        self.weights_dir = weights_dir
        self.mesh = mesh
        # device pick mirrors reference `nomad.py:40-47`: auto-detected
        # accelerator, overridable by the user ('cpu' / 'tpu')
        self._device = None
        if device is not None:
            try:
                self._device = jax.devices(device)[0]
            except RuntimeError as e:
                raise Exception(f"device {device!r} not available: {e}")
        self.DEVICE = device or jax.default_backend()
        print(f"NOMAD running on: {self.DEVICE}")

        self.model = NomadModel(self.config, emb_dim=emb_dim)
        # params/engine resolve lazily: checkpoint load/convert (or the
        # seeded init, itself a jit compile) costs seconds-to-minutes on a
        # remote-compile backend, and argument errors in predict() must
        # surface before any of it runs (round-2 verification: a bad --mode
        # used to take ~100 s to be rejected).
        self._params = params
        self._engine = None
        self._loss_apply = None
        self._params_dev = None

    @property
    def params(self) -> dict:
        if self._params is None:
            self._params = self._resolve_params()
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._engine = None
        self._params_dev = None

    @property
    def engine(self) -> EmbeddingEngine:
        if self._engine is None:
            self._engine = EmbeddingEngine(
                self.model, self.params, mesh=self.mesh, device=self._device
            )
        return self._engine

    # ---------------- weights ----------------

    def _init_params(self):
        import functools

        from .utils.cache import cpu_compile_bypass

        wav = jnp.zeros((1, 4000), jnp.float32)
        if jax.default_backend() != "cpu":
            # seeded random init directly ON the accelerator: zero bytes
            # cross the host->device wire (the host-init + 380 MB transfer
            # cost a CLI cold start 6-9 minutes on a bad relay stretch),
            # the executable lands in the persistent cache, and no
            # CPU-device compile happens at all
            init = jax.jit(
                functools.partial(self.model.init, method=NomadModel.init_all)
            )
            return init(jax.random.key(0), wav)
        # CPU backend: plain host init. cpu_compile_bypass keeps the
        # executable OUT of the persistent cache — through a remote-compile
        # service it would carry the service machine's CPU features, and
        # reloading it on another host risks SIGILL (round-2 driver bench
        # logged the mismatch warning).
        with cpu_compile_bypass(), jax.default_device(jax.devices("cpu")[0]):
            params = self.model.init(
                jax.random.key(0), wav, method=NomadModel.init_all
            )
        return jax.device_get(params)

    def _resolve_params(self) -> dict:
        cache = os.path.join(self.weights_dir, CACHE_FILENAME)
        if os.path.isfile(cache):
            flat = dict(np.load(cache))
            return {"params": _unflatten(flat)}
        params = self._init_params()
        nomad_path = os.path.join(self.weights_dir, NOMAD_FILENAME)
        w2v_path = os.path.join(self.weights_dir, W2V_FILENAME)
        loaded = False
        if os.path.isfile(nomad_path):
            sd = load_torch_checkpoint(nomad_path)
            conv = to_flax_params(canonicalize(sd), self.config.num_layers,
                                  len(self.config.conv_dim))
            params = merge_into(params, conv)
            loaded = True
        elif os.path.isfile(w2v_path):
            sd = load_torch_checkpoint(w2v_path)
            conv = to_flax_params(canonicalize(sd), self.config.num_layers,
                                  len(self.config.conv_dim))
            params = merge_into(params, conv)
            warnings.warn(
                "loaded wav2vec_small.pt but nomad_best_model.pt is missing: "
                "scoring head is randomly initialized"
            )
            loaded = True
        else:
            warnings.warn(
                f"no checkpoints found under {self.weights_dir!r}; using a "
                "seeded random init. Scores will NOT match the published "
                "NOMAD model. Place wav2vec_small.pt + nomad_best_model.pt "
                "there to enable real weights."
            )
        if loaded:
            try:
                os.makedirs(self.weights_dir, exist_ok=True)
                np.savez(cache, **_flatten(params["params"]))
            except OSError:
                pass
        return params

    # ---------------- scoring ----------------

    def predict(self, mode="dir", nmr="data/nmr-data", deg="data/test-data",
                results_path=None):
        if nmr is None:
            raise Exception("missing nmr argument (non-matching reference path)")
        if deg is None:
            raise Exception("missing deg argument (test/degraded path)")
        if mode == "dir":
            if not os.path.isdir(nmr):
                raise Exception(f"nmr directory not found: {nmr}")
            if not os.path.isdir(deg):
                raise Exception(f"deg directory not found: {deg}")
        elif mode == "csv":
            if not os.path.isfile(nmr):
                raise Exception(f"nmr csv not found: {nmr}")
            if not os.path.isfile(deg):
                raise Exception(f"deg csv not found: {deg}")
        else:
            raise Exception(f"unknown mode {mode!r}: expected 'dir' or 'csv'")
        # The reference only creates the TIMESTAMPED default dir and lets a
        # given results_path fail at to_csv time (`nomad.py:122-139`) —
        # i.e. AFTER the full embedding pass. Same contract (we don't
        # create the dir either), but fail BEFORE any model/embedding work.
        if results_path is not None and not os.path.isdir(results_path):
            raise Exception(
                f"results_path directory not found: {results_path}"
            )

        print(f"Compute non-matching reference embeddings from {nmr}")
        nmr_paths = self._resolve_paths(nmr)
        print(f"Compute degraded embeddings from {deg}")
        test_paths = self._resolve_paths(deg)
        # one engine pass over both sets: batches of the two lists pipeline
        # through the device back-to-back (two calls would drain between)
        emb = self.engine.embed_files(nmr_paths + test_paths, progress=True)
        nmr_emb = emb[: len(nmr_paths)]
        test_emb = emb[len(nmr_paths):]

        distance_matrix = np.asarray(cdist(test_emb, nmr_emb))
        df_avg, df_dm = build_result_frames(test_paths, nmr_paths, distance_matrix)
        write_results(df_avg, df_dm, results_path)
        return df_avg, df_dm

    def _resolve_paths(self, path: str) -> list:
        """Quirk Q3: dir mode follows os.listdir order; csv mode follows row
        order of its 'filename' column."""
        if os.path.isdir(path):
            return list_dir_files(path)
        if os.path.isfile(path):
            data = pd.read_csv(path)
            if "filename" not in data.columns:
                raise Exception(
                    f"csv {path} has no 'filename' column (expected one "
                    "absolute wav path per row)"
                )
            return list(data["filename"])
        raise Exception(f"Path {path} does not exist")

    def _paths_and_embeddings(self, path: str):
        paths = self._resolve_paths(path)
        emb = self.engine.embed_files(paths, progress=True)
        return paths, emb

    def get_embeddings(self, path: str) -> pd.DataFrame:
        """Reference `nomad.py:148-164`: DataFrame with 'filename' + one
        column per embedding dim."""
        paths, emb = self._paths_and_embeddings(path)
        df = pd.DataFrame(emb)
        df.insert(0, "filename", paths)
        return df

    def get_embeddings_csv(
        self, file_names: pd.Series | list, root: str | bool = False
    ) -> pd.DataFrame:
        """Reference `nomad.py:166-189` (shared with train_triplet.py:203)."""
        names = list(file_names)
        paths = [os.path.join(root, f) if root else f for f in names]
        emb = self.engine.embed_files(paths, progress=True)
        df_emb = pd.DataFrame(emb)
        col = getattr(file_names, "name", None) or "filename"
        df_emb.insert(0, col, names)
        return df_emb

    # ---------------- differentiable loss ----------------

    def loss_fn_p(self, params, estimate, clean, deterministic: bool = True):
        """Pure differentiable NOMAD perceptual loss with explicit params.

        Use THIS form inside jit/grad-of-jit: passing params as an argument
        keeps them out of the compiled program's constants (closing over
        the 94M-param pytree embeds ~380 MB into the XLA payload).

        estimate/clean: [B, T] or [B, 1, T] waveforms (reference squeezes
        dim 1 at `nomad.py:224,242`). Sum of 13 per-layer L1 distances.
        """
        if estimate.ndim == 3:
            estimate = estimate.squeeze(1)
        if clean.ndim == 3:
            clean = clean.squeeze(1)
        est_layers = self.model.apply(
            params, estimate, deterministic=deterministic,
            method=NomadModel.forward_layers,
        )
        clean_layers = self.model.apply(
            params, clean, deterministic=deterministic,
            method=NomadModel.forward_layers,
        )
        return nomad_loss(clean_layers, est_layers)

    def loss_fn(self, estimate, clean, deterministic: bool = True):
        """Convenience form over the instance's params (differentiable
        w.r.t. estimate/clean; see loss_fn_p for use under jit)."""
        return self.loss_fn_p(self.params, estimate, clean, deterministic)

    def forward(self, estimate, clean):
        """Reference `nomad.py:142-146` (jitted on first call; params flow
        as arguments, not constants)."""
        if self._loss_apply is None:
            self._loss_apply = jax.jit(
                lambda p, e, c: self.loss_fn_p(p, e, c)
            )
            self._params_dev = jax.device_put(self.params)
        return self._loss_apply(
            self._params_dev, jnp.asarray(estimate), jnp.asarray(clean)
        )


_singleton: Optional[Nomad] = None


def get_nomad(**kwargs) -> Nomad:
    global _singleton
    if _singleton is None:
        _singleton = Nomad(**kwargs)
    return _singleton
