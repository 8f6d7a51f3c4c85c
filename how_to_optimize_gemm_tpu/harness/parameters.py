"""Sweep configuration — runtime equivalent of the reference's parameters.h.

The reference pins everything at compile time (``aarch64/parameters.h:5-24``:
PFIRST/PLAST/PINC sweep bounds, M/N/K = -1 meaning "track p", NREPEATS).
Pallas block shapes are runtime-selectable, so the TPU framework makes this
a typed runtime config (SURVEY.md §5 "Config / flag system").
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Benchmark sweep bounds and repetition policy.

    M/N/K of -1 track the sweep variable p (the reference's convention,
    aarch64/parameters.h:9-17); a positive value pins that dimension.
    """
    pfirst: int = 512
    plast: int = 4096
    pinc: int = 512
    m: int = -1
    n: int = -1
    k: int = -1
    nrepeats: int = 10
    warmup: int = 2
    seed: int = 0
    ones_fixture: bool = False   # reference's constant-1.0 fill (debug)

    def sizes(self) -> list[tuple[int, int, int]]:
        out = []
        for p in range(self.pfirst, self.plast + 1, self.pinc):
            m = p if self.m == -1 else self.m
            n = p if self.n == -1 else self.n
            k = p if self.k == -1 else self.k
            out.append((m, n, k))
        return out


# The reference's per-backend defaults, for parity runs:
AARCH64_SWEEP = SweepConfig(pfirst=48, plast=960, pinc=48)      # makefile run
CUDA_SWEEP = SweepConfig(pfirst=1024, plast=4096, pinc=128,
                         nrepeats=20)                            # cuda/parameters.h:5-7
QUICK_SWEEP = SweepConfig(pfirst=1024, plast=4096, pinc=1024,
                          nrepeats=5)
