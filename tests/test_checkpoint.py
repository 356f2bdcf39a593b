"""Checkpoint/resume tests: resumed runs reproduce uninterrupted ones."""

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import eight_schools, std_normal


def test_resume_reproduces_uninterrupted_run(tmp_path):
    model = compile_model_def(std_normal(3))
    common = dict(chains=2, draws=120, tune=80, seed=11, progress_bar=False,
                  chunk_size=25)
    full = nutpie_tpu.sample(model, **common)

    ckpt = tmp_path / "state.npz"
    # run the first 100 of 200 total draws (4 chunks of 25), checkpointing
    nutpie_tpu.sample(
        model, chains=2, draws=20, tune=80, seed=11, progress_bar=False,
        chunk_size=25, checkpoint=str(ckpt),
    )
    assert ckpt.exists()
    resumed = nutpie_tpu.sample(
        model, resume_from=str(ckpt), **common
    )
    x_full = np.asarray(full.posterior["x"].values)
    x_res = np.asarray(resumed.posterior["x"].values)
    # resumed trace holds draws 100..200 = the last 100 posterior draws
    np.testing.assert_allclose(x_res, x_full[:, -100:], rtol=1e-10)


def test_resume_shape_mismatch_rejected(tmp_path):
    model = compile_model_def(std_normal(3))
    ckpt = tmp_path / "s.npz"
    nutpie_tpu.sample(
        model, chains=2, draws=10, tune=10, seed=1, progress_bar=False,
        checkpoint=str(ckpt),
    )
    other = compile_model_def(eight_schools())
    with pytest.raises((ValueError, RuntimeError)):
        nutpie_tpu.sample(
            other, chains=2, draws=10, tune=10, seed=1, progress_bar=False,
            resume_from=str(ckpt),
        )


def test_checkpoint_with_flow_state(tmp_path):
    """Flow adaptation state (incl. flow params) round-trips checkpoints."""
    from nutpie_tpu.models import std_normal

    model = compile_model_def(std_normal(3)).with_transform_adapt(
        num_layers=2, hidden=8, train_steps=20, window=64,
    )
    ckpt = tmp_path / "flow.npz"
    common = dict(chains=2, adaptation="flow", progress_bar=False,
                  chunk_size=32, seed=9)
    full = nutpie_tpu.sample(model, draws=96, tune=64, **common)
    nutpie_tpu.sample(model, draws=32, tune=64, checkpoint=str(ckpt), **common)
    resumed = nutpie_tpu.sample(
        model, draws=96, tune=64, resume_from=str(ckpt), **common
    )
    np.testing.assert_allclose(
        np.asarray(resumed.posterior["x"].values),
        np.asarray(full.posterior["x"].values)[:, -64:],
        rtol=1e-10,
    )
