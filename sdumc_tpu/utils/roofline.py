"""Roofline accounting: FLOPs/bytes from XLA cost analysis -> % of peak.

The round-1 benchmarks reported clips/s with no utilization story; this
module turns any compiled jit program + a measured wall time into MFU and
HBM-bandwidth utilization against the chip's public peaks, so every number
in bench.py states *how far from speed-of-light* it is.

Peaks default to TPU v5e (the bench chip): 197 TFLOP/s bf16 and 819 GB/s
HBM. XLA's ``cost_analysis`` counts algorithmic flops and bytes actually
touched by the compiled program (post-fusion), which is the right
numerator for a utilization metric: it answers "of the work this program
*must* do, how fast did the chip do it".
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

# public chip specs
PEAKS = {
    "v5e": {"flops_bf16": 197e12, "hbm_gbps": 819.0},
    "v5p": {"flops_bf16": 459e12, "hbm_gbps": 2765.0},
    "v4": {"flops_bf16": 275e12, "hbm_gbps": 1228.0},
}


def detect_peaks() -> Dict[str, float]:
    """Best-effort peak lookup from the local device kind; defaults v5e."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
        for key, spec in PEAKS.items():
            if key in kind.replace(" ", "").replace("tpu", "v").replace("lite", "e"):
                return spec
        if "v5 lite" in kind or "v5e" in kind:
            return PEAKS["v5e"]
    except Exception:
        pass
    return PEAKS["v5e"]


def program_cost(compiled) -> tuple[float, float]:
    """(flops, bytes_accessed) for one compiled XLA program; zeros when the
    backend doesn't expose cost analysis (e.g. some CPU paths)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


@dataclasses.dataclass
class Roofline:
    """Accumulates (program cost x call count) and renders utilization."""

    flops: float = 0.0
    bytes: float = 0.0

    def add(self, compiled, calls: int = 1) -> "Roofline":
        f, b = program_cost(compiled)
        self.flops += f * calls
        self.bytes += b * calls
        return self

    def report(self, seconds: float, peaks: Optional[Dict[str, float]] = None
               ) -> Dict[str, float]:
        """-> {tflops, hbm_gbps, mfu_pct, hbm_util_pct, arithmetic_intensity}
        (empty dict when no cost data was available).

        bytes come from XLA's cost analysis, an UPPER BOUND on actual HBM
        traffic (it books every fusion operand even when the scheduler
        keeps it resident), so hbm_util_pct can read >100% for a program
        at the bandwidth bound — read values near or above 100 as
        "HBM-bound", not as a literal achieved-bandwidth claim."""
        if not (self.flops or self.bytes) or seconds <= 0:
            return {}
        peaks = peaks or detect_peaks()
        out = {
            "tflops": round(self.flops / seconds / 1e12, 2),
            "hbm_gbps": round(self.bytes / seconds / 1e9, 1),
            "mfu_pct": round(100 * self.flops / seconds / peaks["flops_bf16"], 2),
            "hbm_util_pct": round(
                100 * self.bytes / seconds / 1e9 / peaks["hbm_gbps"], 1),
        }
        if self.bytes:
            out["arithmetic_intensity"] = round(self.flops / self.bytes, 2)
        return out
