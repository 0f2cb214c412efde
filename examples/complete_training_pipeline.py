"""The reference's `complete_training_pipeline.ipynb` recipe as a script.

Mirrors the notebook's cells (reference §2.8): generate 20 graphs (n=500,
d∈[6,8], seeds 1000+i) -> process to 1000-wide padding -> train GCNSoftmax
(1000-500-3, lr=1e-3) -> loss curves -> held-out evaluation vs the
randomized baseline -> SUMMARY.md.  Thin wrapper over the CLI pipeline:

    python examples/complete_training_pipeline.py [workdir]

Equivalent CLI:
    python -m gcn_maxcut_tpu pipeline --workdir out --num-graphs 20 \
        --nodes 500 --min-degree 6 --max-degree 8 --pad-to 1000 \
        --epochs 1000 --seed 1000
"""

import sys

from gcn_maxcut_tpu.cli import main

if __name__ == "__main__":
    workdir = sys.argv[1] if len(sys.argv) > 1 else "pipeline_out"
    raise SystemExit(
        main(
            [
                "pipeline",
                "--workdir", workdir,
                "--num-graphs", "20",
                "--nodes", "500",
                "--min-degree", "6",
                "--max-degree", "8",
                "--pad-to", "1000",
                "--epochs", "1000",
                "--seed", "1000",
            ]
        )
    )
