"""Orbax checkpointing: save/restore roundtrip and versioned layout."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from master_thesis_tpu.train.checkpoint import (
    Checkpointer,
    next_version_dir,
    restore_from_path,
)


def test_versioned_dirs(tmp_path):
    root = str(tmp_path)
    v0 = next_version_dir(root)
    v1 = next_version_dir(root)
    assert v0.endswith("version_0") and v1.endswith("version_1")


def test_save_restore_roundtrip(tmp_path, rng):
    vdir = next_version_dir(str(tmp_path))
    ck = Checkpointer(vdir, keep=2)
    payload = {
        "params": {"layer": {"kernel": rng.randn(4, 3).astype(np.float32)}},
        "step": np.asarray(7),
    }
    ck.save(7, payload)
    assert ck.latest_step == 7

    template = jax.tree.map(np.zeros_like, payload)
    restored = ck.restore(template=template)
    np.testing.assert_array_equal(
        restored["params"]["layer"]["kernel"], payload["params"]["layer"]["kernel"]
    )
    assert int(restored["step"]) == 7

    # Second save; max_to_keep trims later, latest moves forward.
    payload["step"] = np.asarray(9)
    ck.save(9, payload)
    assert ck.latest_step == 9

    # restore_from_path on the checkpoints root picks the latest.
    restored2 = restore_from_path(os.path.join(vdir, "checkpoints"), template=template)
    assert int(restored2["step"]) == 9


def test_train_state_resume(tmp_path, rng):
    """A restored state continues training identically to the original."""
    import optax

    from master_thesis_tpu.config import Config
    from master_thesis_tpu.train import state as state_lib

    cfg = Config(lr=1e-2)
    params = {"w": jnp.asarray(rng.randn(4).astype(np.float32))}
    st = state_lib.create_train_state(None, params, cfg, steps_per_epoch=10)

    def grads_like(v):
        return {"w": jnp.ones(4) * v}

    st = st.apply_gradients(grads_like(0.1))
    vdir = next_version_dir(str(tmp_path))
    ck = Checkpointer(vdir)
    ck.save(int(st.step), {"params": st.params, "opt_state": st.opt_state, "step": np.asarray(int(st.step))})

    st_cont = st.apply_gradients(grads_like(0.2))

    fresh = state_lib.create_train_state(None, params, cfg, steps_per_epoch=10)
    template = {"params": fresh.params, "opt_state": fresh.opt_state, "step": np.asarray(0)}
    restored = ck.restore(template=template)
    st_res = fresh.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=jnp.asarray(int(restored["step"])),
    )
    st_res = st_res.apply_gradients(grads_like(0.2))
    np.testing.assert_allclose(
        np.asarray(st_res.params["w"]), np.asarray(st_cont.params["w"]), atol=1e-7
    )
    assert int(st_res.step) == int(st_cont.step)
