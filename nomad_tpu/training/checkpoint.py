"""Checkpoint/resume subsystem.

The reference checkpoints only the best model's state_dict and cannot
resume (SURVEY §5.4: no optimizer/scheduler/epoch state; a crash loses the
run). Here checkpointing is a first-class component with two backends
behind one interface:

  * **orbax** (preferred when importable) — atomic, async-capable,
    multi-host-safe PyTree checkpoints; the production path on TPU pods.
  * **npz** — dependency-free flat-array fallback, also the interchange
    format the converter emits.

Saved payload: params, optimizer state, epoch counter, early-stop state,
LR scales, and the exact config — everything needed to resume bit-for-bit.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in sorted(tree.items()) if isinstance(tree, dict) else []:
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


def have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


class CheckpointManager:
    """step-indexed checkpoint directory:

        <root>/step_<n>/   (orbax tree or arrays.npz) + meta.json
        <root>/LATEST      (step number)
    """

    def __init__(self, root: str, backend: Optional[str] = None, keep: int = 3):
        self.root = os.path.abspath(root)  # orbax requires absolute paths
        self.keep = keep
        if backend is None:
            backend = "orbax" if have_orbax() else "npz"
        if backend == "orbax" and not have_orbax():
            backend = "npz"
        self.backend = backend
        os.makedirs(root, exist_ok=True)

    # ---------------- save ----------------

    def save(self, step: int, state: dict, meta: Optional[dict] = None):
        """state: pytree of arrays (params/opt_state/...); meta: JSON-able."""
        path = os.path.join(self.root, f"step_{step}")
        tmp = path + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        state = jax.device_get(state)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            from ..utils.cache import cpu_compile_bypass

            ckptr = ocp.PyTreeCheckpointer()
            # orbax runs host-side (CPU-device) jit programs internally;
            # keep their executables out of the persistent cache (remote
            # compile service machine features != this host -> SIGILL
            # risk on reload; a cached CPU jit_scan from exactly this
            # path poisoned the round-3 workspace cache)
            with cpu_compile_bypass():
                ckptr.save(os.path.join(tmp, "tree"), state)
        else:
            np.savez(os.path.join(tmp, "arrays.npz"), **_flatten(state))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta or {}, f)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        with open(os.path.join(self.root, "LATEST"), "w") as f:
            f.write(str(step))
        self._gc()

    def _gc(self):
        steps = self.steps()
        for s in steps[: -self.keep] if self.keep else []:
            shutil.rmtree(os.path.join(self.root, f"step_{s}"), ignore_errors=True)

    # ---------------- restore ----------------

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("step_") and not name.endswith(".tmp"):
                try:
                    out.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        latest = os.path.join(self.root, "LATEST")
        if os.path.isfile(latest):
            try:
                step = int(open(latest).read().strip())
                if os.path.isdir(os.path.join(self.root, f"step_{step}")):
                    return step
            except ValueError:
                pass
        steps = self.steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None) -> Optional[tuple[int, dict, dict]]:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        path = os.path.join(self.root, f"step_{step}")
        if self.backend == "orbax" and os.path.isdir(os.path.join(path, "tree")):
            import orbax.checkpoint as ocp

            from ..utils.cache import cpu_compile_bypass

            with cpu_compile_bypass():  # see save(): orbax CPU jits
                state = ocp.PyTreeCheckpointer().restore(
                    os.path.join(path, "tree")
                )
        else:
            npz = os.path.join(path, "arrays.npz")
            if not os.path.isfile(npz):
                return None
            state = _unflatten(dict(np.load(npz)))
        meta_path = os.path.join(path, "meta.json")
        meta = json.load(open(meta_path)) if os.path.isfile(meta_path) else {}
        return step, state, meta
