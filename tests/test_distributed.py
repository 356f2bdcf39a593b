"""Multi-process distributed sampling test (SURVEY.md section 5.8).

The reference is single-process by design; the TPU build's multi-host story
is ``jax.distributed`` + chain-axis sharding over the global mesh.  This
test spawns 2 coordinator-connected processes with 4 virtual CPU devices
each -- the same simulation harness the driver uses for multi-chip
validation -- and runs sharded sampling with cross-process pooled
adaptation.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pooled_sampling(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = (
        str(Path(__file__).parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", str(port),
             str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    w0 = np.load(tmp_path / "worker0.npz")
    w1 = np.load(tmp_path / "worker1.npz")
    # chains split across processes
    assert int(w0["n_local_chains"]) == int(w1["n_local_chains"]) == 8
    # pooled adaptation runs a cross-process all-reduce at chunk starts;
    # per-chain welford updates diverge the estimates again within a chunk,
    # so the invariant is statistical: every chain on every process adapted
    # to the shared posterior scale (variance 4), which unpooled 16-chain
    # x 60-tune runs would miss badly on some chains
    im = np.concatenate([w0["inv_mass"], w1["inv_mass"]]).reshape(16, -1)
    assert np.all(np.abs(np.log(im / 4.0)) < 0.7), im
    # both halves of the fleet sample the same posterior
    assert np.abs(w0["mean"] - 1.0).max() < 0.5
    assert np.abs(w1["mean"] - 1.0).max() < 0.5
