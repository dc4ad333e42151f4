"""Mergeable sketches — the accumulator core of the engine (SURVEY.md §2-E).

All sketches obey the merge laws (associative, commutative, identity) so a
per-block partial + tree-reduce merge computes the same result as a single
pass — the property tests in tests/test_sketches.py verify this under random
splits.  Pure numpy; no scipy / datasketches in the sandbox (SURVEY.md §0).

Reference semantics: rdv NumericStats (min/max/mean/std/pinv/percentiles) and
CategoricStats (frequencies/pinv) [rdv:rdv/stats.py, UNVERIFIED — reference
checkout empty, SURVEY.md §0]; BASELINE.json pins t-digest quantiles and
HyperLogLog distinct counts for the 10^12-doc scale path.
"""

from __future__ import annotations

import base64
import json
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "Moments",
    "TDigest",
    "HyperLogLog",
    "CategoricalFreq",
    "NumericHistogram",
    "hash64",
]


def hash64(values) -> np.ndarray:
    """Stable vectorized 64-bit hash of a 1-D array (ints, floats, strings).

    Uses pandas' cython siphash-based ``hash_array`` — deterministic across
    processes (fixed key), which the merge/parallelism-invariance tests rely on.
    """
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        arr = np.asarray(arr, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


# ---------------------------------------------------------------------------
# Moments: count / sum / sumsq / min / max / null_count
# ---------------------------------------------------------------------------


class Moments:
    """Exact mergeable (count, sum, sum-of-squares, min, max, nulls) triple.

    mean/std finalized Chan-et-al style from the merged sums; matches rdv's
    NumericStats.mean/std/pinv exactly at any split of the data.
    """

    __slots__ = ("count", "total", "sum", "sumsq", "min", "max")

    def __init__(self):
        self.count = 0  # non-null values
        self.total = 0  # all rows (incl. null)
        self.sum = 0.0
        self.sumsq = 0.0
        self.min = math.inf
        self.max = -math.inf

    def add(self, values: np.ndarray, n_total: int | None = None) -> "Moments":
        v = np.asarray(values, dtype=np.float64)
        n_all = len(v) if n_total is None else n_total
        v = v[~np.isnan(v)]
        self.total += n_all
        self.count += len(v)
        if len(v):
            self.sum += float(v.sum())
            self.sumsq += float(np.square(v).sum())
            self.min = min(self.min, float(v.min()))
            self.max = max(self.max, float(v.max()))
        return self

    def merge(self, other: "Moments") -> "Moments":
        self.count += other.count
        self.total += other.total
        self.sum += other.sum
        self.sumsq += other.sumsq
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        return self

    @property
    def null_count(self) -> int:
        return self.total - self.count

    @property
    def null_rate(self) -> float:
        return self.null_count / self.total if self.total else 0.0

    @property
    def mean(self) -> float | None:
        return self.sum / self.count if self.count else None

    @property
    def std(self) -> float | None:
        """Population std (ddof=0), matching numpy's default."""
        if not self.count:
            return None
        var = self.sumsq / self.count - (self.sum / self.count) ** 2
        return math.sqrt(max(var, 0.0))

    def to_dict(self) -> dict:
        return {
            "count": self.count,
            "total": self.total,
            "sum": self.sum,
            "sumsq": self.sumsq,
            "min": None if self.min == math.inf else self.min,
            "max": None if self.max == -math.inf else self.max,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Moments":
        m = cls()
        m.count = d["count"]
        m.total = d["total"]
        m.sum = d["sum"]
        m.sumsq = d["sumsq"]
        m.min = math.inf if d["min"] is None else d["min"]
        m.max = -math.inf if d["max"] is None else d["max"]
        return m


# ---------------------------------------------------------------------------
# t-digest (merging variant, vectorized bucket compression)
# ---------------------------------------------------------------------------


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    """k_1 scale function: delta/(2*pi) * asin(2q-1)."""
    return (delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1.0, 1.0))


class TDigest:
    """Merging t-digest (Dunning & Ertl, 'Computing Extremely Accurate
    Quantiles Using t-Digests', arXiv:1902.04023) with the k_1 scale function.

    Compression is vectorized: sorted centroids are bucketed by
    ``floor(k1(q_mid))`` and merged with ``np.add.reduceat`` — sequential-free,
    keeps ≤ ~2*delta centroids, accuracy ~ O(q(1-q)/delta) in rank.

    rdv's exact percentiles[0..100] are the small-scale oracle; the parity
    tests assert rank error ≤ 1% at delta=300.
    """

    __slots__ = ("delta", "means", "weights", "min", "max", "_buf")
    _BUF_LIMIT = 16384

    def __init__(self, delta: int = 300):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = math.inf
        self.max = -math.inf
        self._buf: list[np.ndarray] = []

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf.append(v)
        if sum(len(b) for b in self._buf) >= self._BUF_LIMIT:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        self._compress()
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(force=True)
        return self

    def _compress(self, force: bool = False):
        if self._buf:
            bv = np.concatenate(self._buf)
            self._buf = []
            self.means = np.concatenate([self.means, bv])
            self.weights = np.concatenate([self.weights, np.ones(len(bv))])
        elif not force:
            return
        n = len(self.means)
        if n == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        total = w.sum()
        # mid-quantile of each centroid
        cw = np.cumsum(w)
        qmid = (cw - w / 2.0) / total
        buckets = np.floor(_k1(qmid, self.delta)).astype(np.int64)
        # merge consecutive centroids sharing a bucket
        starts = np.flatnonzero(np.diff(buckets, prepend=buckets[0] - 1))
        wm = np.add.reduceat(w, starts)
        mm = np.add.reduceat(w * m, starts) / wm
        self.means = mm
        self.weights = wm

    @property
    def total_weight(self) -> float:
        self._compress()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float | None:
        return self.quantiles([q])[0]

    def quantiles(self, qs) -> list[float | None]:
        self._compress()
        n = len(self.means)
        if n == 0:
            return [None for _ in qs]
        w = self.weights
        total = w.sum()
        cw = np.cumsum(w)
        mid = cw - w / 2.0  # cumulative weight at centroid center
        out: list[float | None] = []
        for q in qs:
            q = min(max(float(q), 0.0), 1.0)
            t = q * total
            if t <= mid[0]:
                # interpolate between global min and first centroid
                if w[0] > 1 and mid[0] > 0:
                    frac = t / mid[0]
                    out.append(self.min + frac * (self.means[0] - self.min))
                else:
                    out.append(self.min)
                continue
            if t >= mid[-1]:
                if w[-1] > 1 and (total - mid[-1]) > 0:
                    frac = (t - mid[-1]) / (total - mid[-1])
                    out.append(self.means[-1] + frac * (self.max - self.means[-1]))
                else:
                    out.append(self.max)
                continue
            i = int(np.searchsorted(mid, t, side="right"))
            # t between mid[i-1] and mid[i]
            span = mid[i] - mid[i - 1]
            frac = (t - mid[i - 1]) / span if span > 0 else 0.0
            out.append(float(self.means[i - 1] + frac * (self.means[i] - self.means[i - 1])))
        return out

    def cdf(self, xs) -> np.ndarray:
        """Estimated P(X ≤ x) per x — inverse of quantile(), used by
        contrast() to bin two digests onto common edges."""
        self._compress()
        xs = np.asarray(xs, dtype=np.float64)
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        total = self.weights.sum()
        mid = np.cumsum(self.weights) - self.weights / 2.0
        xp = np.concatenate([[self.min], self.means, [self.max]])
        fp = np.concatenate([[0.0], mid, [total]])
        # collapse duplicate x support (single-point digests)
        keep = np.concatenate([[True], np.diff(xp) > 0])
        return np.interp(xs, xp[keep], fp[keep] / total, left=0.0, right=1.0)

    def to_dict(self) -> dict:
        self._compress()
        return {
            "delta": self.delta,
            "means": [float(x) for x in self.means],
            "weights": [float(x) for x in self.weights],
            "min": None if self.min == math.inf else self.min,
            "max": None if self.max == -math.inf else self.max,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        t = cls(delta=d["delta"])
        t.means = np.asarray(d["means"], dtype=np.float64)
        t.weights = np.asarray(d["weights"], dtype=np.float64)
        t.min = math.inf if d["min"] is None else d["min"]
        t.max = -math.inf if d["max"] is None else d["max"]
        return t


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


class HyperLogLog:
    """HyperLogLog (Flajolet et al. 2007) with linear-counting small-range
    correction.  p=14 → 16384 one-byte registers, ~0.8% standard error.
    Merge = elementwise register max (associative, commutative, idempotent).
    """

    __slots__ = ("p", "m", "regs")

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        if not len(h):
            return self
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        w = (h >> np.uint64(self.p)).astype(np.uint64)
        # rho = (64-p) - bit_length(w) + 1 ; frexp gives exact bit_length
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        if nz.any():
            _, e = np.frexp(w[nz].astype(np.float64))
            bl[nz] = e
        rho = (64 - self.p) - bl + 1
        np.maximum.at(self.regs, idx, rho.astype(np.uint8))
        return self

    def add(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.regs, other.regs, out=self.regs)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.exp2(-self.regs.astype(np.float64))))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.regs == 0))
            if zeros:
                est = m * math.log(m / zeros)
        return est

    def to_dict(self) -> dict:
        return {"p": self.p, "regs": base64.b64encode(self.regs.tobytes()).decode()}

    @classmethod
    def from_dict(cls, d: dict) -> "HyperLogLog":
        h = cls(p=d["p"])
        h.regs = np.frombuffer(base64.b64decode(d["regs"]), dtype=np.uint8).copy()
        return h


# ---------------------------------------------------------------------------
# Bloom filter (broadcastable membership prefilter)
# ---------------------------------------------------------------------------


class BloomFilter:
    """Standard Bloom filter over 64-bit hashes; k index derivations via
    double hashing (Kirsch-Mitzenmacher: h1 + i*h2).  ~1.2 bytes/key at 1%
    false-positive rate — broadcastable where a raw key set is not (D1 at
    10^9+ parent keys).  False positives mean a member-test can wrongly say
    "present"; for anti-join semantics that MISSES orphans, so callers must
    treat bloom mode as an approximate prefilter (documented in
    pipelines.referential_orphans).  Merge = bitwise OR (same params).
    """

    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n_bits = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.n_bits = ((n_bits + 63) // 64) * 64
        self.k = max(1, round(self.n_bits / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h1 = h
        # force h2 odd (Kirsch-Mitzenmacher hardening): an even h2 sharing a
        # factor with n_bits (always a multiple of 64) collapses the k probes
        # onto few distinct bits, inflating fp above the configured rate
        h2 = ((h >> np.uint64(32)) | (h << np.uint64(32))) | np.uint64(1)
        with np.errstate(over="ignore"):
            idx = (h1[:, None] + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None])
        return (idx % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        if not len(h):
            return self
        idx = self._indices(h).ravel()
        np.bitwise_or.at(self.bits, idx >> 6,
                         np.uint64(1) << (idx & 63).astype(np.uint64))
        return self

    def add(self, values) -> "BloomFilter":
        return self.add_hashes(hash64(values))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=bool)
        idx = self._indices(h)
        word = self.bits[idx >> 6]
        bit = (word >> (idx & 63).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=1)

    def contains(self, values) -> np.ndarray:
        return self.contains_hashes(hash64(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


# ---------------------------------------------------------------------------
# Categorical frequency histogram with top-K overflow guard
# ---------------------------------------------------------------------------


class CategoricalFreq:
    """value→count map (rdv CategoricStats.frequencies) with a top-K guard:
    when the map exceeds ``max_keys`` the rarest keys spill into
    ``other_count`` so hot-key explosions (url domains) stay bounded.
    Merge = dict add then re-guard; ``total`` and ``null_count`` exact.
    """

    __slots__ = ("max_keys", "counts", "other_count", "total", "null_count")

    def __init__(self, max_keys: int = 1024):
        self.max_keys = max_keys
        self.counts: dict[str, int] = {}
        self.other_count = 0
        self.total = 0
        self.null_count = 0

    def add_counts(self, values, counts, n_null: int = 0) -> "CategoricalFreq":
        for v, c in zip(values, counts):
            c = int(c)
            self.counts[v] = self.counts.get(v, 0) + c
            self.total += c
        self.null_count += int(n_null)
        self.total += int(n_null)
        self._guard()
        return self

    def add(self, values: np.ndarray) -> "CategoricalFreq":
        import pandas as pd

        s = pd.Series(values)
        n_null = int(s.isna().sum())
        vc = s.dropna().value_counts()
        return self.add_counts([str(k) for k in vc.index], vc.to_numpy(), n_null)

    def merge(self, other: "CategoricalFreq") -> "CategoricalFreq":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.other_count += other.other_count
        self.total += other.total
        self.null_count += other.null_count
        self._guard()
        return self

    def _guard(self):
        if len(self.counts) <= self.max_keys:
            return
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = items[: self.max_keys]
        spill = items[self.max_keys:]
        self.counts = dict(keep)
        self.other_count += sum(c for _, c in spill)

    def domain(self) -> list[str]:
        return sorted(self.counts)

    def to_dict(self) -> dict:
        return {
            "max_keys": self.max_keys,
            "counts": self.counts,
            "other_count": self.other_count,
            "total": self.total,
            "null_count": self.null_count,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "CategoricalFreq":
        f = cls(max_keys=d["max_keys"])
        f.counts = dict(d["counts"])
        f.other_count = d["other_count"]
        f.total = d["total"]
        f.null_count = d["null_count"]
        return f


# ---------------------------------------------------------------------------
# Fixed-edge numeric histogram (drift / contrast input)
# ---------------------------------------------------------------------------


class NumericHistogram:
    """Fixed-bin-edge histogram; counts vector add-merges.  Values outside the
    edges land in under/overflow counters so the merge stays exact regardless
    of which block saw the outliers.  Used by Schema.contrast's JS/chi-square
    (SURVEY.md §2-E E7).
    """

    __slots__ = ("edges", "counts", "underflow", "overflow")

    def __init__(self, edges):
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = np.zeros(len(self.edges) - 1, dtype=np.int64)
        self.underflow = 0
        self.overflow = 0

    def add(self, values: np.ndarray) -> "NumericHistogram":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return self
        self.underflow += int((v < self.edges[0]).sum())
        self.overflow += int((v > self.edges[-1]).sum())
        inside = v[(v >= self.edges[0]) & (v <= self.edges[-1])]
        c, _ = np.histogram(inside, bins=self.edges)
        self.counts += c
        return self

    def merge(self, other: "NumericHistogram") -> "NumericHistogram":
        assert len(self.edges) == len(other.edges)
        self.counts += other.counts
        self.underflow += other.underflow
        self.overflow += other.overflow
        return self

    def probs(self) -> np.ndarray:
        """Normalized distribution incl. under/overflow buckets at the ends."""
        full = np.concatenate([[self.underflow], self.counts, [self.overflow]]).astype(np.float64)
        t = full.sum()
        return full / t if t else full

    def to_dict(self) -> dict:
        return {
            "edges": [float(x) for x in self.edges],
            "counts": [int(x) for x in self.counts],
            "underflow": self.underflow,
            "overflow": self.overflow,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NumericHistogram":
        h = cls(d["edges"])
        h.counts = np.asarray(d["counts"], dtype=np.int64)
        h.underflow = d["underflow"]
        h.overflow = d["overflow"]
        return h


class MisraGries:
    """Mergeable heavy-hitters summary (Misra-Gries; the merge rule —
    pointwise sum, subtract the (k+1)-th largest counter, keep positives —
    is the Agarwal et al. "Mergeable Summaries" construction, public
    literature).  Guarantees after ANY merge tree over a stream of n items:

    - every stored counter UNDERCOUNTS its true frequency by at most
      ``err`` (tracked exactly; err ≤ n/(k+1));
    - every item with true count > err is present (no false negatives
      above the bound);
    - with k ≥ #distinct values no decrement ever fires → counts exact.

    The engine's CategoricalFreq answers "the full frequency map, roughly";
    MisraGries answers "the provably-heavy items, with certified bounds" at
    a fixed k counters per accumulator — the worst-offenders primitive at
    100-TB scale.
    """

    __slots__ = ("k", "counts", "err", "total")

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.err = 0      # max possible undercount of any stored counter
        self.total = 0

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = sorted(self.counts.values(), reverse=True)
        m = vals[self.k]  # (k+1)-th largest
        self.counts = {v: c - m for v, c in self.counts.items() if c > m}
        self.err += m

    def add_counts(self, values, counts) -> "MisraGries":
        """Bulk update from a (values, counts) pair — the per-batch
        combiner output (Arrow value_counts), so dict work is bounded by
        the batch's DISTINCT count, not its rows."""
        for v, c in zip(values, counts):
            c = int(c)
            self.counts[v] = self.counts.get(v, 0) + c
            self.total += c
        self._shrink()
        return self

    def add(self, values: np.ndarray) -> "MisraGries":
        import pandas as pd

        s = pd.Series(values).dropna()
        vc = s.value_counts()
        return self.add_counts(vc.index.tolist(), vc.to_numpy())

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + int(c)
        self.total += other.total
        self.err += other.err
        self._shrink()
        return self

    def heavy_hitters(self, min_count: int = 1) -> list:
        """(value, lower_bound, upper_bound) for stored items whose UPPER
        bound ≥ min_count, heaviest first (lower = counter, upper =
        counter + err)."""
        out = [(v, c, c + self.err) for v, c in self.counts.items()
               if c + self.err >= min_count]
        return sorted(out, key=lambda t: (-t[1], t[0]))

    def to_dict(self) -> dict:
        return {"k": self.k, "counts": dict(self.counts), "err": self.err,
                "total": self.total}

    @classmethod
    def from_dict(cls, d: dict) -> "MisraGries":
        mg = cls(k=d["k"])
        mg.counts = dict(d["counts"])
        mg.err = d["err"]
        mg.total = d["total"]
        return mg


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public): a d×w
    counter matrix; a point query takes the MIN over the d rows, so it
    never underestimates and overestimates by ≤ eps·N with probability
    1−delta (w = ⌈e/eps⌉, d = ⌈ln(1/delta)⌉).  The frequency companion of
    HLL (distinct) / Misra-Gries (top-k): answers "how often did THIS key
    occur" from O(d·w) memory at any stream length.  Merge = elementwise
    add — a mergeable summary (Agarwal et al.), so per-batch partials
    fan in through the same tree as every other sketch here.

    Row hashes derive from one 64-bit value hash by multiply-shift with
    fixed odd constants — deterministic across processes/engines.
    """

    __slots__ = ("w", "d", "table", "n")

    def __init__(self, eps: float = 1e-3, delta: float = 0.01):
        self.w = int(math.ceil(math.e / eps))
        self.d = int(math.ceil(math.log(1.0 / delta)))
        self.table = np.zeros((self.d, self.w), dtype=np.int64)
        self.n = 0

    _MIX = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd

    def _indices(self, h: np.ndarray, row: int) -> np.ndarray:
        with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash
            a = self._MIX * np.uint64(2 * row + 1)
            mixed = (h ^ np.uint64(row)) * a
        return (mixed >> np.uint64(32)).astype(np.int64) % self.w

    def add(self, values, counts: np.ndarray | None = None) \
            -> "CountMinSketch":
        h = hash64(values)
        if not len(h):
            return self
        c = np.ones(len(h), np.int64) if counts is None \
            else np.asarray(counts, np.int64)
        for i in range(self.d):
            np.add.at(self.table[i], self._indices(h, i), c)
        self.n += int(c.sum())
        return self

    def estimate(self, values) -> np.ndarray:
        h = hash64(values)
        est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
        for i in range(self.d):
            np.minimum(est, self.table[i][self._indices(h, i)], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.w, self.d) == (other.w, other.d)
        self.table += other.table
        self.n += other.n
        return self

    def to_dict(self) -> dict:
        return {"w": self.w, "d": self.d, "n": self.n,
                "table": base64.b64encode(self.table.tobytes()).decode()}

    @classmethod
    def from_dict(cls, dd: dict) -> "CountMinSketch":
        s = cls.__new__(cls)
        s.w, s.d, s.n = dd["w"], dd["d"], dd["n"]
        s.table = np.frombuffer(base64.b64decode(dd["table"]),
                                dtype=np.int64).reshape(s.d, s.w).copy()
        return s


def cms_of(ds, col: str, *, eps: float = 1e-3, delta: float = 0.01,
           batch_size: int | None = 65536, fan: int = 64) -> CountMinSketch:
    """Distributed count-min build: one sketch per batch, merged through a
    fan-in tree (the bm25 reduction shape) so the driver only ever decodes
    ≤ ``fan`` sketches — no O(#batches) driver collect at corpus scale.
    Null values are not counted."""
    import math as _m

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).combine_chunks()
        v = v.filter(pc.is_valid(v))
        s = CountMinSketch(eps=eps, delta=delta).add(v)
        return pa.table({"cms": pa.array([json.dumps(s.to_dict())])})

    def merge_rows(t: pa.Table) -> pa.Table:
        out = None
        for blob in t.column("cms").to_pylist():
            s = CountMinSketch.from_dict(json.loads(blob))
            out = s if out is None else out.merge(s)
        return pa.table({"cms": pa.array([json.dumps(out.to_dict())])})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).materialize()
    while parts.num_blocks() > fan:
        parts = (parts.repartition(max(1, _m.ceil(parts.num_blocks()
                                                  / fan)))
                 .map_batches(merge_rows, batch_format="pyarrow",
                              batch_size=None).materialize())
    out = None
    for blob in [r["cms"] for r in parts.take_all()]:
        s = CountMinSketch.from_dict(json.loads(blob))
        out = s if out is None else out.merge(s)
    return out if out is not None else CountMinSketch(eps=eps, delta=delta)
