"""Merging t-digest sketch for distribution drift at corpus scale.

north_star: "distribution-drift checks run KS-statistic and PSI over
TDigest-sketched per-partition histograms merged via treeAggregate". The
portable fixed-bucket histogram path (checks/drift.py::drift_report) stays
the cross-engine-oracled default; this module adds the adaptive-resolution
sketch for long-tailed columns where equi-width buckets waste resolution.

Clean-room implementation of the merging t-digest (Dunning & Ertl's
algorithm shape: buffer → sort → one greedy pass bounded by the k1 scale
function, centroid capacity ∝ q(1-q)/δ). No reference code involved — the
reference repo has no sketches at all.

Spark integration (checks/drift.py::drift_report_tdigest):
- per-partition digests are built inside ``mapInPandas`` (Arrow batches,
  never per-row Python), one serialized digest row per partition;
- the O(partitions) digest rows are merged with RDD ``treeAggregate``
  (hierarchical merge — constant driver memory however many partitions).
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence, Tuple


class TDigest:
    """Mergeable quantile sketch. ``compression`` bounds the centroid count
    (~2x compression centroids); accuracy is best in the tails (centroid
    capacity shrinks like q(1-q))."""

    __slots__ = ("compression", "centroids", "buffer", "count", "min", "max")

    def __init__(self, compression: int = 100):
        self.compression = compression
        self.centroids: List[Tuple[float, float]] = []  # (mean, weight), sorted
        self.buffer: List[Tuple[float, float]] = []
        self.count = 0.0
        self.min = math.inf
        self.max = -math.inf

    # --- building ---------------------------------------------------------

    def add_many(self, values: Iterable[float], weight: float = 1.0) -> None:
        # the compression trigger fires at an EXACT buffer size, checked per
        # value — not once per add_many call. A per-call check would make
        # the compression schedule (and thus the final centroids) depend on
        # how the caller segmented the value stream into batches (Arrow
        # batch size!); per-value the schedule depends only on the value
        # SEQUENCE, which the deterministic sketch path pins by sorting.
        limit = 10 * self.compression
        for v in values:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            v = float(v)
            self.buffer.append((v, weight))
            self.count += weight
            if v < self.min:
                self.min = v
            if v > self.max:
                self.max = v
            if len(self.buffer) >= limit:
                self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        """In-place merge; returns self (treeAggregate combOp shape)."""
        self.buffer.extend(other.centroids)
        self.buffer.extend(other.buffer)
        self.count += other.count
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    def _size_limit(self, q: float) -> float:
        return max(1.0, 4.0 * self.count * q * (1.0 - q) / self.compression)

    def _compress(self) -> None:
        if not self.buffer and len(self.centroids) <= 2 * self.compression:
            return
        pts = sorted(self.centroids + self.buffer)
        self.buffer = []
        if not pts:
            self.centroids = []
            return
        out: List[Tuple[float, float]] = []
        cum = 0.0
        cm, cw = pts[0]
        for m, w in pts[1:]:
            q = (cum + cw + w / 2.0) / self.count
            if cw + w <= self._size_limit(q):
                cm += (m - cm) * w / (cw + w)
                cw += w
            else:
                out.append((cm, cw))
                cum += cw
                cm, cw = m, w
        out.append((cm, cw))
        self.centroids = out

    # --- queries ----------------------------------------------------------

    def cdf(self, x: float) -> float:
        """P(X <= x), piecewise-linear between centroid means."""
        self._compress()
        cs = self.centroids
        if not cs or self.count == 0:
            return float("nan")
        if x < self.min:
            return 0.0
        if x >= self.max:
            return 1.0
        # cumulative weight at each centroid's midpoint
        cum = 0.0
        prev_mean, prev_cum = self.min, 0.0
        for mean, w in cs:
            mid_cum = cum + w / 2.0
            if x < mean:
                if mean == prev_mean:
                    return mid_cum / self.count
                frac = (x - prev_mean) / (mean - prev_mean)
                return (prev_cum + frac * (mid_cum - prev_cum)) / self.count
            cum += w
            prev_mean, prev_cum = mean, mid_cum
        frac = (x - prev_mean) / max(self.max - prev_mean, 1e-300)
        return min(1.0, (prev_cum + frac * (self.count - prev_cum)) / self.count)

    def quantile(self, q: float) -> float:
        self._compress()
        cs = self.centroids
        if not cs or self.count == 0:
            return float("nan")
        if q <= 0:
            return self.min
        if q >= 1:
            return self.max
        target = q * self.count
        cum = 0.0
        prev_mean, prev_cum = self.min, 0.0
        for mean, w in cs:
            mid_cum = cum + w / 2.0
            if target < mid_cum:
                if mid_cum == prev_cum:
                    return mean
                frac = (target - prev_cum) / (mid_cum - prev_cum)
                return prev_mean + frac * (mean - prev_mean)
            cum += w
            prev_mean, prev_cum = mean, mid_cum
        frac = (target - prev_cum) / max(self.count - prev_cum, 1e-300)
        return prev_mean + frac * (self.max - prev_mean)

    # --- serialization (Arrow-row friendly) --------------------------------

    def to_row(self) -> dict:
        self._compress()
        return {
            "means": [m for m, _ in self.centroids],
            "weights": [w for _, w in self.centroids],
            "count": self.count,
            "min": self.min if self.count else None,
            "max": self.max if self.count else None,
        }

    @classmethod
    def from_row(cls, means: Sequence[float], weights: Sequence[float],
                 count: float, vmin: Optional[float], vmax: Optional[float],
                 compression: int = 100) -> "TDigest":
        d = cls(compression)
        d.centroids = list(zip([float(m) for m in means],
                               [float(w) for w in weights]))
        d.count = float(count)
        d.min = float(vmin) if vmin is not None else math.inf
        d.max = float(vmax) if vmax is not None else -math.inf
        return d


def ks_statistic(a: TDigest, b: TDigest) -> float:
    """sup |CDF_a - CDF_b| evaluated at both digests' centroid means and
    extremes (the KS supremum over step-ish CDFs is attained near support
    points)."""
    xs = sorted({m for m, _ in a.centroids} | {m for m, _ in b.centroids}
                | {a.min, a.max, b.min, b.max})
    return max(abs(a.cdf(x) - b.cdf(x)) for x in xs) if xs else float("nan")


def psi(reference: TDigest, current: TDigest, buckets: int = 10,
        eps: float = 1e-6) -> float:
    """Population stability index over equal-mass buckets of the REFERENCE
    digest (the standard scorecard convention)."""
    edges = [reference.quantile(i / buckets) for i in range(buckets + 1)]
    edges[0] = min(edges[0], current.min)
    edges[-1] = max(edges[-1], current.max)
    total = 0.0
    for i in range(buckets):
        lo, hi = edges[i], edges[i + 1]
        if hi <= lo:
            continue
        p = max(reference.cdf(hi) - reference.cdf(lo), eps)
        c = max(current.cdf(hi) - current.cdf(lo), eps)
        total += (p - c) * math.log(p / c)
    return total
