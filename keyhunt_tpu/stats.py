"""Throughput accounting with SI prefixes.

Mirrors the reference's 1-second stats loop (`keyhunt.cpp:2850-2962`) and
its speed-counting rules: compressed-without-endomorphism counts 2 keys per
computed point, endomorphism x6 (x3 for xpoint) (`keyhunt.cpp:2883-2891`,
README:1345-1371).
"""

from __future__ import annotations

import time

_PREFIXES = ["", "k", "M", "G", "T", "P", "E", "Z", "Y"]


def si(value: float, unit: str = "keys/s") -> str:
    v = float(value)
    for pfx in _PREFIXES:
        if v < 1000.0:
            return f"{v:.2f} {pfx}{unit}"
        v /= 1000.0
    return f"{v:.2f} Y{unit}"


class SpeedMeter:
    def __init__(self):
        self.t0 = time.time()
        self.total_keys = 0

    def add(self, keys: int):
        self.total_keys += keys

    @property
    def elapsed(self) -> float:
        return max(time.time() - self.t0, 1e-9)

    @property
    def rate(self) -> float:
        return self.total_keys / self.elapsed

    def line(self) -> str:
        return f"[+] Total {self.total_keys} keys in {self.elapsed:.1f} s: {si(self.rate)}"
