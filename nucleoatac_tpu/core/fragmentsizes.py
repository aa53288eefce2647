"""Fragment-size histogram (reference:pyatac/fragmentsizes.py :: FragmentSizes).

Integer counts over [lower, upper); exactly representable in f64 and f32 up
to 2^24, which is what makes the downstream occupancy math reproducible
(DESIGN.md §2, §4).
"""
from __future__ import annotations

import numpy as np


class FragmentSizes:
    def __init__(self, lower: int = 0, upper: int = 251, vals: np.ndarray | None = None):
        self.lower = int(lower)
        self.upper = int(upper)
        n = self.upper - self.lower
        if vals is None:
            self.vals = np.zeros(n, dtype=np.int64)
        else:
            vals = np.asarray(vals)
            if vals.shape != (n,):
                raise ValueError(f"vals shape {vals.shape} != ({n},)")
            self.vals = vals.astype(np.int64)

    def add_sizes(self, sizes: np.ndarray) -> None:
        """Accumulate a vector of adjusted fragment sizes."""
        sizes = np.asarray(sizes)
        keep = (sizes >= self.lower) & (sizes < self.upper)
        self.vals += np.bincount(
            sizes[keep] - self.lower, minlength=self.upper - self.lower
        ).astype(np.int64)

    def get(self, lower: int | None = None, upper: int | None = None) -> np.ndarray:
        lower = self.lower if lower is None else lower
        upper = self.upper if upper is None else upper
        if lower < self.lower or upper > self.upper:
            raise ValueError("requested range outside histogram support")
        return self.vals[lower - self.lower : upper - self.lower]

    def probs(self) -> np.ndarray:
        tot = self.vals.sum()
        if tot == 0:
            return np.full(self.vals.shape, 1.0 / len(self.vals))
        return self.vals.astype(np.float64) / tot

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(f"#lower={self.lower} upper={self.upper}\n")
            for i, v in enumerate(self.vals):
                fh.write(f"{self.lower + i}\t{int(v)}\n")

    @classmethod
    def open(cls, path: str) -> "FragmentSizes":
        lower = upper = None
        sizes: list[int] = []
        counts: list[int] = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("#"):
                    kv = dict(p.split("=") for p in line[1:].split())
                    lower, upper = int(kv["lower"]), int(kv["upper"])
                    continue
                if not line:
                    continue
                s, c = line.split("\t")
                sizes.append(int(s))
                counts.append(int(c))
        if lower is None:
            lower, upper = sizes[0], sizes[-1] + 1
        vals = np.zeros(upper - lower, dtype=np.int64)
        for s, c in zip(sizes, counts):
            if lower <= s < upper:
                vals[s - lower] = c
        return cls(lower, upper, vals)
