"""Checkpoint manager: orbax + npz backends, atomicity, GC, resume."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nomad_tpu.training.checkpoint import CheckpointManager, have_orbax


def sample_state(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "params": {"dense": {"kernel": rng.standard_normal((4, 8)).astype("f4"),
                             "bias": np.zeros(8, "f4")}},
        "opt_state": {"mu": {"dense": {"kernel": np.ones((4, 8), "f4")}}},
    }


@pytest.mark.parametrize(
    "backend", ["npz"] + (["orbax"] if have_orbax() else [])
)
def test_save_restore_roundtrip(tmp_path, backend):
    mgr = CheckpointManager(str(tmp_path / "ck"), backend=backend)
    state = sample_state()
    mgr.save(3, state, meta={"best": 0.5, "counter": 1})
    got = mgr.restore()
    assert got is not None
    step, restored, meta = got
    assert step == 3
    assert meta == {"best": 0.5, "counter": 1}
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["dense"]["kernel"]),
        state["params"]["dense"]["kernel"],
    )
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"]["mu"]["dense"]["kernel"]),
        state["opt_state"]["mu"]["dense"]["kernel"],
    )


def test_latest_and_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), backend="npz", keep=2)
    for s in (1, 2, 3, 4):
        mgr.save(s, sample_state(s))
    assert mgr.latest_step() == 4
    assert mgr.steps() == [3, 4]  # GC keeps 2
    step, state, _ = mgr.restore()
    assert step == 4
    np.testing.assert_array_equal(
        np.asarray(state["params"]["dense"]["kernel"]),
        sample_state(4)["params"]["dense"]["kernel"],
    )


def test_restore_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), backend="npz")
    assert mgr.restore() is None
    assert mgr.latest_step() is None


def test_jax_arrays_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), backend="npz")
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    mgr.save(0, state)
    _, restored, _ = mgr.restore()
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
