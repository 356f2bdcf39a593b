"""Background sampling control tests (reference tests/test_pymc.py:224-286)."""

import time

import numpy as np
import pytest

import nutpie_tpu
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import std_normal


def _model():
    return compile_model_def(std_normal(2))


def test_nonblocking_wait():
    sampler = nutpie_tpu.sample(
        _model(), chains=2, draws=200, tune=100, seed=1, progress_bar=False,
        blocking=False,
    )
    trace = sampler.wait()
    x = np.asarray(trace.posterior["x"].values)
    assert x.shape == (2, 200, 2)


def test_wait_timeout():
    sampler = nutpie_tpu.sample(
        _model(), chains=2, draws=50_000, tune=1000, seed=1,
        progress_bar=False, blocking=False, chunk_size=16,
    )
    with pytest.raises(TimeoutError):
        sampler.wait(timeout=0.05)
    sampler.cancel()


def test_pause_resume_abort():
    sampler = nutpie_tpu.sample(
        _model(), chains=2, draws=100_000, tune=500, seed=2,
        progress_bar=False, blocking=False, chunk_size=16,
    )
    sampler.pause()
    sampler.resume()
    # wait until at least one chunk of draws exists, then abort
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        with sampler._lock:
            if sampler._chunks:
                break
        time.sleep(0.05)
    trace = sampler.abort()
    assert trace is not None


def test_inspect_partial():
    sampler = nutpie_tpu.sample(
        _model(), chains=2, draws=100_000, tune=100, seed=3,
        progress_bar=False, blocking=False, chunk_size=16,
    )
    deadline = time.monotonic() + 30
    trace = None
    while time.monotonic() < deadline:
        try:
            trace = sampler.inspect()
            if "posterior" in trace.groups and (
                np.asarray(trace.posterior["x"].values).shape[1] > 0
            ):
                break
        except RuntimeError:
            pass
        time.sleep(0.1)
    assert trace is not None
    n1 = np.asarray(trace.posterior["x"].values).shape[1]
    assert n1 > 0
    sampler.cancel()


def test_progress_callback():
    calls = []

    def cb(progress):
        calls.append([
            (p.chain_index, p.finished_draws, p.total_draws, p.tuning)
            for p in progress
        ])

    nutpie_tpu.sample(
        _model(), chains=3, draws=100, tune=100, seed=4, progress_bar=False,
        progress_callback=cb, progress_rate=0, chunk_size=25,
    )
    assert calls
    final = calls[-1]
    assert len(final) == 3
    assert all(fd == 200 for _, fd, _, _ in final)
    assert all(td == 200 for _, _, td, _ in final)


def test_callback_errors_swallowed(capsys):
    def bad_cb(progress):
        raise RuntimeError("boom")

    trace = nutpie_tpu.sample(
        _model(), chains=2, draws=50, tune=50, seed=5, progress_bar=False,
        progress_callback=bad_cb, progress_rate=0,
    )
    assert np.asarray(trace.posterior["x"].values).shape == (2, 50, 2)
