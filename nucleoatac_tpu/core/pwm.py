"""Tn5 insertion-bias PWM (reference:pyatac/bias.py :: PWM, SURVEY.md §3.1).

A PWM is a [4, L] matrix of nucleotide probabilities over offsets
``[-up, ..., +down]`` relative to an insertion center. The per-bp log bias
is ``B[p] = sum_k log(pwm[base(p+k), k] / 0.25)`` (DESIGN.md §5); N/unknown
bases contribute 0.

The reference ships a measured Tn5 PWM as package data; that artifact is
unavailable (empty reference mount), so ``PWM.default()`` is a
deterministic synthetic Tn5-like preference (palindromic, ~19 bp, mild GC
preference at the core) with a provenance note. Users supply ``--pwm`` for
a measured matrix; ``pyatac pwm`` computes one from data.
"""
from __future__ import annotations

import numpy as np

BASES = "ACGT"
BASE_INDEX = np.full(256, -1, dtype=np.int8)
for i, b in enumerate(BASES):
    BASE_INDEX[ord(b)] = i
    BASE_INDEX[ord(b.lower())] = i


class PWM:
    def __init__(self, probs: np.ndarray, up: int):
        probs = np.asarray(probs, dtype=np.float64)
        if probs.shape[0] != 4:
            raise ValueError("PWM must have 4 rows (A,C,G,T)")
        if not np.allclose(probs.sum(axis=0), 1.0, atol=1e-6):
            raise ValueError("PWM columns must sum to 1")
        self.probs = probs
        self.up = int(up)  # offsets run -up .. L-1-up

    @property
    def length(self) -> int:
        return self.probs.shape[1]

    @property
    def down(self) -> int:
        return self.length - 1 - self.up

    def log_ratio(self) -> np.ndarray:
        """log(p / 0.25), the per-offset additive bias contribution."""
        return np.log(np.clip(self.probs, 1e-12, None) / 0.25)

    @classmethod
    def default(cls) -> "PWM":
        """Synthetic Tn5-like palindromic preference, 19 bp, deterministic.

        Mild information content (<0.2 bits/column) centered on the 9-bp
        duplicated target site; stands in for the reference's measured PWM
        package data (unavailable — SURVEY.md §0)."""
        L, up = 19, 9
        k = np.arange(L) - up
        # strength envelope: strongest at |k|<=4 (the 9bp target site)
        env = 0.35 * np.exp(-0.5 * (k / 3.0) ** 2)
        # palindromic GC preference with alternating phase
        gc = env * np.cos(np.pi * k / 4.0)
        at = -gc
        logits = np.vstack([at, gc, gc, at])  # A,C,G,T
        probs = np.exp(logits)
        probs /= probs.sum(axis=0, keepdims=True)
        # enforce exact reverse-complement palindromic symmetry
        rc = probs[::-1, ::-1]
        probs = 0.5 * (probs + rc)
        probs /= probs.sum(axis=0, keepdims=True)
        return cls(probs, up)

    def bias_track(self, seq: bytes | str, start_offset: int = 0) -> np.ndarray:
        """Per-bp log bias over a sequence (DESIGN.md §5).

        Position p (relative to seq start) scores the full PWM context
        ``seq[p-up : p+down+1]``; out-of-sequence or non-ACGT context
        positions contribute 0. Vectorized as a sum of shifted lookups.
        """
        if isinstance(seq, str):
            seq = seq.encode("ascii")
        arr = np.frombuffer(seq, dtype=np.uint8)
        idx = BASE_INDEX[arr]  # -1 for non-ACGT
        n = len(arr)
        out = np.zeros(n, dtype=np.float64)
        lr = self.log_ratio()
        for col in range(self.length):
            k = col - self.up  # genomic offset
            contrib = np.zeros(n, dtype=np.float64)
            src_lo, src_hi = max(0, k), min(n, n + k)
            dst_lo, dst_hi = max(0, -k), min(n, n - k)
            seg = idx[src_lo:src_hi]
            valid = seg >= 0
            vals = np.where(valid, lr[np.clip(seg, 0, 3), col], 0.0)
            contrib[dst_lo:dst_hi] = vals
            out += contrib
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(f"#up={self.up} length={self.length}\n")
            fh.write("#A\tC\tG\tT\n")
            for col in range(self.length):
                fh.write("\t".join(f"{self.probs[b, col]:.10g}" for b in range(4)) + "\n")

    @classmethod
    def open(cls, path: str) -> "PWM":
        up = None
        rows = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("#") and "up=" in line:
                    kv = dict(p.split("=") for p in line[1:].split())
                    up = int(kv["up"])
                    continue
                if line.startswith("#") or not line:
                    continue
                rows.append([float(x) for x in line.split("\t")])
        probs = np.array(rows).T  # rows were per-position
        if up is None:
            up = probs.shape[1] // 2
        return cls(probs, up)
