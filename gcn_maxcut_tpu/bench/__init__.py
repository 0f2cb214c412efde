from gcn_maxcut_tpu.bench.roofline import RooflineModel, chip_specs
from gcn_maxcut_tpu.bench.microbench import (
    bench_spmm,
    bench_train_epoch,
    bench_post_processing,
)
from gcn_maxcut_tpu.bench.kway_sweep import kway_sweep

__all__ = [
    "RooflineModel",
    "chip_specs",
    "bench_spmm",
    "bench_train_epoch",
    "bench_post_processing",
    "kway_sweep",
]
