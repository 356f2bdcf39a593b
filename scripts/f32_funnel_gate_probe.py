"""TPU-f32 hierarchical-funnel flow gate probe (round-5 hardening item).

Runs the gate config from tests/test_flow.py::test_flow_hierarchical_funnel_gate
on the real chip, but WITHOUT explicit learning_rate/train_steps so the
f32 default recipe (sample.py::_apply_f32_flow_recipe: lr 3e-4, 1600
steps) engages.  Records divergences / per-level ESS / fisher_distance
for comparison against the r4 sweep (results/README.md: explicit x64
recipe on f32 gave div 35 / fd 0.56; lr 3e-4 x 1600 gave div 2 / fd 0.16).

Usage: python scripts/f32_funnel_gate_probe.py [target_accept]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import nutpie_tpu
from nutpie_tpu import diagnostics
from nutpie_tpu.frontends.pyfunc import compile_model_def
from nutpie_tpu.models import hierarchical_funnel


def main():
    ta = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
    import jax

    model = compile_model_def(
        hierarchical_funnel(groups=6, dim=6, scale=1.0)
    ).with_transform_adapt(
        num_layers=10, hidden=64, window=800,
        num_diag_updates=2, extension_share=0.25, tails=True,
    )
    t0 = time.perf_counter()
    trace = nutpie_tpu.sample(
        model, chains=2, draws=1000, tune=1600, seed=4, progress_bar=False,
        adaptation="flow", transform_update_freq=150, target_accept=ta,
    )
    wall = time.perf_counter() - t0
    div = int(np.asarray(trace.sample_stats["diverging"].values).sum())
    tau = np.asarray(trace.posterior["tau"].values)
    v = np.asarray(trace.posterior["v"].values)
    ess_tau = float(diagnostics.ess(tau))
    ess_v = float(min(diagnostics.ess(v[..., g]) for g in range(6)))
    fd = np.asarray(trace.sample_stats["fisher_distance"].values)
    fd_tail = float(np.nanmean(fd[:, -200:]))
    out = {
        "what": "hierarchical-funnel flow gate on TPU f32, default f32 "
                "recipe (lr 3e-4 x 1600 steps via _apply_f32_flow_recipe)",
        "target_accept": ta,
        "divergences": div,
        "ess_tau": round(ess_tau, 1),
        "ess_v_min": round(ess_v, 1),
        "tau_std": round(float(tau.std()), 3),
        "fisher_distance_tail": round(fd_tail, 4),
        "wall_s": round(wall, 1),
        "gate": {"div_max": 10, "ess_min": 1000, "fd_max": 0.1},
        "passes": bool(div <= 10 and ess_tau > 1000 and ess_v > 1000
                       and fd_tail < 0.1),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
