#!/usr/bin/env python
"""Where do the headline bench's 514 compile-seconds go?

Splits trace (.lower()) from XLA compile (.compile()) for the training
epoch_fn at the two scan lengths bench_train_epoch uses, plus a
dynamic-epoch (fori_loop) variant that needs ONE compile for any length.
"""

import os
import subprocess
import sys
import time

if os.environ.get("PROBE_CHILD") != "1" and __name__ == "__main__":
    for attempt in range(3):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, PROBE_CHILD="1"),
                timeout=1500,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"[probe] attempt {attempt} timed out; retrying", flush=True)
            continue
        sys.exit(rc)
    sys.exit(1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gcn_maxcut_tpu.core.graph import pad_graph_batch
from gcn_maxcut_tpu.data.generate import generate_graph
from gcn_maxcut_tpu.data.process import DataConfig, process_graphs
from gcn_maxcut_tpu.train.config import TrainingConfig
from gcn_maxcut_tpu.train.loop import make_epoch_fn, setup_train_state


def main():
    rng = np.random.default_rng(1000)
    specs = []
    while len(specs) < 20:
        deg = int(rng.integers(6, 9))
        if (500 * deg) % 2:
            continue
        specs.append(generate_graph(n=500, d=deg, graph_type="reg", seed=1000 + len(specs)))
    ds = process_graphs(specs, DataConfig(max_nodes=1000))
    batch = pad_graph_batch([ds.graphs[k] for k in sorted(ds.graphs)])

    cfg = TrainingConfig(n_nodes=1000)
    state = setup_train_state(cfg)
    epoch_fn = make_epoch_fn(cfg, state.optimizer)
    params, opt_state = state.params, state.opt_state
    key = jax.random.PRNGKey(0)

    for k in (5, 40):
        t0 = time.perf_counter()
        lowered = epoch_fn.lower(params, opt_state, batch, key, num_epochs=k)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        print(
            f"num_epochs={k:3d}: trace+lower {t1 - t0:6.1f}s  "
            f"xla-compile {t2 - t1:6.1f}s",
            flush=True,
        )
        t0 = time.perf_counter()
        _, _, losses = compiled(params, opt_state, batch, key)
        float(losses[-1])
        print(f"  first run {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
