"""Roofline model for SpMM edges/s on TPU chips.

SpMM over a sparse graph is memory-bound: each directed edge reads an
F-float feature row (gather), an index pair, and a weight, and the output
writes n·F floats.  The speed-of-light edges/s for a chip is

    edges/s = HBM_bytes_per_s / bytes_per_edge
    bytes_per_edge ≈ 4·F (gathered row) + 8 (indices) + 4 (weight)
                     + 4·F · (n / E)  (amortized output write)

(reads dominate; a cached row may cost less — this is the pessimistic
no-reuse bound).  The fwd+bwd pair costs ≈ 2× the forward traffic: the
symmetric custom VJP (``ops/segment.py``) makes the backward the SAME
gather over dL/dy with Aᵀ = A structure — one more pass, no scatter, no
extra index re-read beyond the pass itself.  (A transposed-scatter
backward would cost 3×; we don't ship one.)  With a 2× denominator no
measured fraction can exceed 1.0 — round 3's "101% of SoL" reading came
from charging the 3× scatter model against the 2× symmetric kernel.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float           # HBM bandwidth GB/s
    bf16_tflops: float        # dense MXU peak
    vmem_mb: float


_CHIPS = {
    # public figures
    "v5e": ChipSpec("TPU v5e", 819.0, 197.0, 128.0),
    "v5p": ChipSpec("TPU v5p", 2765.0, 459.0, 128.0),
    "v4": ChipSpec("TPU v4", 1228.0, 275.0, 128.0),
    "cpu": ChipSpec("host CPU (approx)", 50.0, 1.0, 0.0),
}


def chip_specs(name: str = "v5e") -> ChipSpec:
    return _CHIPS.get(name, _CHIPS["v5e"])


@dataclasses.dataclass
class RooflineModel:
    chip: ChipSpec
    feature_dim: int
    n_nodes: int
    n_edges: int              # directed

    @property
    def bytes_per_edge_fwd(self) -> float:
        gather = 4.0 * self.feature_dim
        idx = 8.0 + 4.0
        out = 4.0 * self.feature_dim * (self.n_nodes / max(1, self.n_edges))
        return gather + idx + out

    #: fwd+bwd traffic multiple for the shipped symmetric-VJP kernels
    #: (backward = one more forward-shaped gather pass; see module docstring)
    FWD_BWD_FACTOR = 2.0

    def edges_per_s(self, fwd_bwd: bool = True) -> float:
        factor = self.FWD_BWD_FACTOR if fwd_bwd else 1.0
        return self.chip.hbm_gbps * 1e9 / (self.bytes_per_edge_fwd * factor)

    def fraction_of_roofline(self, measured_edges_per_s: float, fwd_bwd: bool = True) -> float:
        return measured_edges_per_s / self.edges_per_s(fwd_bwd)
