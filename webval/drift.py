"""Distribution-drift measures for Schema.contrast (SURVEY.md §3.2 P3).

rdv's contrast computes per-component distances between two BUILT schemas
and thresholds them into a drift report [rdv: contrast report jcr,
UNVERIFIED].  BASELINE.json pins Jensen-Shannon divergence and chi-square.
No scipy in the sandbox → the regularized upper incomplete gamma (for the
chi-square p-value) is implemented in-repo (series + continued fraction,
the classical Numerical-Recipes-style formulation of public math).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def js_divergence(p, q, base: float = 2.0) -> float:
    """Jensen-Shannon divergence between two distributions (0 ≤ JS ≤ 1 in
    base 2).  Inputs are counts or probabilities; normalized internally.
    """
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0 if p.sum() == q.sum() else 1.0
    p = p / p.sum()
    q = q / q.sum()
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log(a[mask] / b[mask])))

    js = 0.5 * kl(p, m) + 0.5 * kl(q, m)
    return js / math.log(base)


def _gammq(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) — series for x < a+1,
    continued fraction otherwise (Lentz's method)."""
    if x < 0 or a <= 0:
        raise ValueError("bad args to gammq")
    if x == 0:
        return 1.0
    gln = math.lgamma(a)
    if x < a + 1.0:
        # series for P(a,x); Q = 1 - P
        ap = a
        s = 1.0 / a
        delta = s
        for _ in range(500):
            ap += 1.0
            delta *= x / ap
            s += delta
            if abs(delta) < abs(s) * 1e-15:
                break
        p = s * math.exp(-x + a * math.log(x) - gln)
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q(a,x)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        dl = d * c
        h *= dl
        if abs(dl - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - gln) * h
    return max(0.0, min(1.0, q))


def chi2_test(observed, expected) -> tuple[float, float]:
    """Pearson chi-square of observed counts vs expected distribution
    (counts or probs; expected rescaled to observed total).  Returns
    (statistic, p_value); bins with expected == 0 are pooled out.
    """
    o = np.asarray(observed, dtype=np.float64)
    e = np.asarray(expected, dtype=np.float64)
    if e.sum() == 0 or o.sum() == 0:
        return 0.0, 1.0
    e = e / e.sum() * o.sum()
    mask = e > 0
    # observed mass in zero-expected bins is unexplainable by the baseline:
    # count it fully (classical practice: merge into a pseudo-bin with e→0.5)
    extra = float(o[~mask].sum())
    o, e = o[mask], e[mask]
    stat = float(np.sum((o - e) ** 2 / e))
    if extra > 0:
        stat += (extra - 0.5) ** 2 / 0.5
    dof = max(1, int(mask.sum()) - 1 + (1 if extra > 0 else 0))
    return stat, _gammq(dof / 2.0, stat / 2.0)


def freq_vectors(freq_a: dict[str, int], freq_b: dict[str, int]) -> tuple[np.ndarray, np.ndarray]:
    """Align two categorical frequency maps on the union of keys."""
    keys = sorted(set(freq_a) | set(freq_b))
    a = np.array([freq_a.get(k, 0) for k in keys], dtype=np.float64)
    b = np.array([freq_b.get(k, 0) for k in keys], dtype=np.float64)
    return a, b


def psi(expected, actual, *, min_frac: float = 1e-4) -> float:
    """Population Stability Index between a baseline ("expected") and a
    current ("actual") binned distribution — the standard model-monitoring
    drift score: Σ (a_i - e_i) * ln(a_i / e_i) over bins.

    Inputs are counts or probabilities; normalized internally.  Empty bins
    are floored at ``min_frac`` (the conventional guard — PSI is undefined
    at zero mass) then re-normalized.  Common reading: < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 major shift.
    """
    e = np.asarray(expected, dtype=np.float64)
    a = np.asarray(actual, dtype=np.float64)
    if e.shape != a.shape:
        raise ValueError(f"psi: shape mismatch {e.shape} vs {a.shape}")
    if e.sum() == 0 or a.sum() == 0:
        return 0.0 if e.sum() == a.sum() else float("inf")
    e = np.maximum(e / e.sum(), min_frac)
    a = np.maximum(a / a.sum(), min_frac)
    e = e / e.sum()
    a = a / a.sum()
    return float(np.sum((a - e) * np.log(a / e)))


def ks_statistic(a_counts, b_counts) -> float:
    """Two-sample Kolmogorov-Smirnov statistic over a SHARED binning: the
    max absolute gap between the two empirical CDFs built from binned
    counts (exact KS needs raw sorted samples — at 10¹² rows the binned
    variant over the schema's histogram/t-digest-CDF bins is the scalable
    standard, and it lower-bounds the exact statistic).

    Inputs are counts or probabilities over identical bins; returns a value
    in [0, 1].
    """
    a = np.asarray(a_counts, dtype=np.float64)
    b = np.asarray(b_counts, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"ks_statistic: shape mismatch {a.shape} vs {b.shape}")
    if a.sum() == 0 or b.sum() == 0:
        return 0.0 if a.sum() == b.sum() else 1.0
    ca = np.cumsum(a / a.sum())
    cb = np.cumsum(b / b.sum())
    return float(np.abs(ca - cb).max())


def contingency_stats(counts) -> tuple[float, int, float]:
    """Pearson chi-square statistic, degrees of freedom and Cramér's V of
    an r×c contingency-count matrix — the association strength between two
    categorical columns (V in [0, 1]; 0 = independent).

    All-zero rows/columns are dropped (their expected counts are 0); the
    statistic then sums (o − e)²/e over the FULL remaining grid, including
    cells whose observed count is 0 (e = row_total·col_total/n > 0 there).
    """
    o = np.asarray(counts, dtype=np.float64)
    if o.ndim != 2:
        raise ValueError("contingency_stats expects a 2-D count matrix")
    o = o[o.sum(axis=1) > 0, :]
    o = o[:, o.sum(axis=0) > 0]
    n = o.sum()
    r, c = o.shape
    if n == 0 or r < 2 or c < 2:
        return 0.0, 0, 0.0
    e = o.sum(axis=1, keepdims=True) * o.sum(axis=0, keepdims=True) / n
    stat = float(np.sum((o - e) ** 2 / e))
    dof = (r - 1) * (c - 1)
    v = math.sqrt(stat / (n * min(r - 1, c - 1)))
    return stat, dof, v


def mutual_information(mat) -> tuple[float, int]:
    """Mutual information (nats) of the joint categorical distribution
    given as a contingency-count matrix: MI = Σ (o/n)·ln(o·n / (r·c)) over
    nonzero cells, with r/c the row/column marginals.  The drift family's
    dependence measure alongside chi-square/Cramér's V
    (:func:`contingency_stats`) — 0 iff the columns are independent.
    Returns (mi_nats, n_total)."""
    m = np.asarray(mat, dtype=np.float64)
    n = m.sum()
    if n <= 0:
        return 0.0, 0
    r = m.sum(axis=1, keepdims=True)
    c = m.sum(axis=0, keepdims=True)
    nz = m > 0
    mi = float(np.sum((m[nz] / n) * np.log(m[nz] * n / (r @ c)[nz])))
    return mi, int(n)


def wasserstein_binned(p, q, width: float = 1.0) -> float:
    """1-D earth-mover (Wasserstein-1) distance between two BINNED
    distributions sharing ordered equal-width bins: W1 = width · Σ|F_p −
    F_q| over the bin CDFs.  The drift family's magnitude-aware measure —
    unlike KS (max gap) it grows with HOW FAR mass moved, in value units.
    Inputs are counts; normalized internally; empty sides → 0/1 like
    :func:`js_divergence`."""
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    if p.sum() == 0 or q.sum() == 0:
        return 0.0 if p.sum() == q.sum() else 1.0
    return float(width * np.abs(np.cumsum(p / p.sum())
                                - np.cumsum(q / q.sum())).sum())


def cohens_kappa(mat) -> tuple[float, float, float, int]:
    """Cohen's kappa from a SQUARE agreement matrix whose rows and columns
    index the SAME label set in the same order (mat[i][j] = rows rater A
    labeled i and rater B labeled j): κ = (p_o − p_e) / (1 − p_e) with
    p_o the diagonal mass and p_e the chance agreement Σ row_i·col_i / n².
    The inter-rater reliability measure (Cohen 1960) — the validation
    question "do two labelers / heuristics agree beyond chance?" that raw
    accuracy overstates whenever one label dominates.

    Returns (kappa, p_o, p_e, n).  Perfect chance structure (p_e = 1,
    e.g. both raters constant) returns kappa 0.0 by convention.
    """
    m = np.asarray(mat, dtype=np.float64)
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError("cohens_kappa expects a square label-aligned "
                         f"matrix, got shape {m.shape}")
    n = m.sum()
    if n <= 0:
        return 0.0, 0.0, 0.0, 0
    po = float(np.trace(m) / n)
    pe = float((m.sum(axis=1) * m.sum(axis=0)).sum() / (n * n))
    kappa = 0.0 if pe >= 1.0 else (po - pe) / (1.0 - pe)
    return float(kappa), po, pe, int(n)


def bh_select(p_values, q: float = 0.05):
    """Benjamini-Hochberg step-up FDR selection (Benjamini & Hochberg
    1995): given m p-values, find the largest k with p_(k) ≤ k·q/m and
    reject hypotheses 1..k of the ascending order — the multiple-testing
    control a per-partition drift sweep needs (m partitions × a 5% test
    each ≈ m/20 false alarms uncorrected).

    Input: array-like of p-values (driver-small — one per test/partition,
    bounded by the partition count, never by rows).  Returns
    (selected_mask ndarray aligned with the input, k, threshold) where
    threshold = k·q/m of the last rejected rank (0.0 when k = 0).
    """
    p = np.asarray(p_values, dtype=np.float64)
    m = len(p)
    if m == 0:
        return np.zeros(0, dtype=bool), 0, 0.0
    order = np.argsort(p, kind="stable")
    ranks = np.arange(1, m + 1, dtype=np.float64)
    ok = p[order] <= ranks * q / m
    if not ok.any():
        return np.zeros(m, dtype=bool), 0, 0.0
    k = int(np.flatnonzero(ok)[-1] + 1)
    mask = np.zeros(m, dtype=bool)
    mask[order[:k]] = True
    return mask, k, float(k * q / m)


def rank_correlations(mat) -> tuple[float, float, int]:
    """Spearman ρ and Kendall τ-b from a contingency-count matrix whose
    rows/columns are the SORTED distinct x/y values — the tie-aware rank
    dependence pair (textbook formulas: Spearman = Pearson over average
    ranks; Kendall 1945 τ-b with the tie corrections n₁/n₂).  Exact for
    discrete-domain columns where the contingency table is small; the
    monotone-dependence companion to :func:`mutual_information` /
    :func:`contingency_stats` on the same exchange.  Returns
    (spearman, tau_b, n); either statistic is NaN when its denominator is
    zero (a constant margin), matching SQL corr()/NULLIF semantics."""
    m = np.asarray(mat, dtype=np.float64)
    n = m.sum()
    if n <= 0:
        return float("nan"), float("nan"), 0
    r = m.sum(axis=1)
    c = m.sum(axis=0)
    # average (midrank) per distinct value: ranks before + (count+1)/2
    rx = np.cumsum(r) - r + (r + 1.0) / 2.0
    ry = np.cumsum(c) - c + (c + 1.0) / 2.0
    mx = float((rx * r).sum() / n)
    my = float((ry * c).sum() / n)
    cov = float((((rx - mx)[:, None] * (ry - my)[None, :]) * m).sum())
    vx = float((((rx - mx) ** 2) * r).sum())
    vy = float((((ry - my) ** 2) * c).sum())
    rho = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
    # suffix[i, j] = count of cells strictly below-right of (i, j)
    grid = np.zeros((m.shape[0] + 1, m.shape[1] + 1))
    grid[:-1, :-1] = m
    suf = np.flip(np.cumsum(np.cumsum(np.flip(grid), axis=0), axis=1))
    conc = float((m * suf[1:, 1:]).sum())
    # discordant: cells strictly below-LEFT: suffix over rows, prefix cols
    low_left = np.zeros((m.shape[0] + 1, m.shape[1] + 1))
    low_left[:-1, 1:] = m
    ll = np.flip(np.cumsum(np.flip(low_left, axis=0), axis=0), axis=0)
    ll = np.cumsum(ll, axis=1)
    disc = float((m * ll[1:, :-1]).sum())
    n0 = n * (n - 1.0) / 2.0
    n1 = float((r * (r - 1.0)).sum() / 2.0)
    n2 = float((c * (c - 1.0)).sum() / 2.0)
    den = (n0 - n1) * (n0 - n2)
    tau = (conc - disc) / math.sqrt(den) if den > 0 else float("nan")
    return rho, tau, int(n)


def uncertainty_coefficient(mat) -> tuple[float, float, float, int]:
    """Theil's uncertainty coefficient U(Y|X) from a contingency-count
    matrix (rows = X, cols = Y): U = (H(Y) − H(Y|X)) / H(Y) in nats
    (Theil 1970) — the ASYMMETRIC dependence audit ("how much does knowing
    X reduce uncertainty about Y"), the probabilistic sibling of the
    functional-dependency check: U = 1 iff X determines Y exactly.
    Returns (u, h_y, h_y_given_x, n); u is NaN when H(Y) = 0 (constant
    Y column — nothing to predict)."""
    m = np.asarray(mat, dtype=np.float64)
    n = m.sum()
    if n <= 0:
        return float("nan"), 0.0, 0.0, 0
    c = m.sum(axis=0)
    r = m.sum(axis=1, keepdims=True)
    cz = c[c > 0]
    h_y = float(-np.sum((cz / n) * np.log(cz / n)))
    nz = m > 0
    h_yx = float(-np.sum((m[nz] / n) * np.log(m[nz] / np.broadcast_to(
        r, m.shape)[nz])))
    u = (h_y - h_yx) / h_y if h_y > 0 else float("nan")
    return u, h_y, h_yx, int(n)


def mann_whitney_u(a_counts, b_counts):
    """Tie-corrected Mann-Whitney rank-sum test from per-value counts of
    the two samples, aligned on the same ASCENDING distinct values — the
    nonparametric two-sample drift test that sees median/shape shifts the
    mean-based monitors miss.  Exact on discrete/ordinal columns (status
    codes, token counts, star ratings); bucket continuous columns first
    (quantile_bin / fixed-width) like the binned KS variant.

    The rank sum is computed in INTEGER arithmetic (midrank×2 = 2·cum +
    cnt + 1 is always integral), so U is exact and engine-independent;
    only the final z normalization is floating point.

    Returns (n1, n2, u1, z): U statistic of sample 1 and the
    tie-corrected normal approximation z = (U1 - n1·n2/2) / σ.
    """
    c1 = np.asarray(a_counts, dtype=np.int64)
    c2 = np.asarray(b_counts, dtype=np.int64)
    if c1.shape != c2.shape:
        raise ValueError(
            f"mann_whitney_u: shape mismatch {c1.shape} vs {c2.shape}")
    cnt = c1 + c2
    keep = cnt > 0
    c1, c2, cnt = c1[keep], c2[keep], cnt[keep]
    n1, n2 = int(c1.sum()), int(c2.sum())
    n = n1 + n2
    if n1 == 0 or n2 == 0:
        return n1, n2, 0.0, 0.0
    cum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    r1_x2 = int((c1 * (2 * cum + cnt + 1)).sum())   # 2 × rank-sum of side 1
    u1 = r1_x2 / 2.0 - n1 * (n1 + 1) / 2.0
    tie = int((cnt ** 3 - cnt).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1.0)))
    z = 0.0 if var <= 0 else (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    return n1, n2, u1, z


def anova_f(n, s, ss):
    """One-way ANOVA F from per-group moment triples (count, sum, sum of
    squares) — "does this numeric column differ across partitions/langs/
    sources beyond noise", computed from the same mergeable moments the
    schema profile already collects (no second pass over the data).

    Returns (k, n_total, f, eta_sq): group count, row count, the F
    statistic on (k-1, n-k) dof and the effect size SSB/SST.
    """
    n = np.asarray(n, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    ss = np.asarray(ss, dtype=np.float64)
    keep = n > 0
    n, s, ss = n[keep], s[keep], ss[keep]
    k, nt = len(n), float(n.sum())
    if k < 2 or nt <= k:
        return k, int(nt), float("nan"), float("nan")
    grand = s.sum() / nt
    ssb = float((n * (s / n - grand) ** 2).sum())
    ssw = float((ss - s * s / n).sum())
    f = (ssb / (k - 1)) / (ssw / (nt - k)) if ssw > 0 else float("inf")
    eta = ssb / (ssb + ssw) if ssb + ssw > 0 else float("nan")
    return k, int(nt), f, eta


def welch_t(n, s, ss):
    """Welch's unequal-variance two-sample t from per-side moment
    triples (count, sum, sum of squares) — the parametric mean-shift
    companion of :func:`mann_whitney_u` (rank shift) and
    :func:`anova_f` (k-group pooled variance): unlike ANOVA's pooled
    SSW it does NOT assume the two sides share a variance, which is the
    realistic case when comparing a fresh crawl slice against a
    baseline (Welch 1947, Satterthwaite 1946 dof).

    ``n``/``s``/``ss`` are length-2 arrays (side 0, side 1).  Returns
    (n0, n1, t, dof) with t signed positive when side 1's mean is
    larger; nan when either side has < 2 rows or both variances are 0.
    """
    n = np.asarray(n, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    ss = np.asarray(ss, dtype=np.float64)
    if len(n) != 2:
        raise ValueError(f"welch_t: expected 2 sides, got {len(n)}")
    n0, n1 = n
    if n0 < 2 or n1 < 2:
        return int(n0), int(n1), float("nan"), float("nan")
    m = s / n
    v = (ss - s * s / n) / (n - 1.0)          # sample variance per side
    se0, se1 = v[0] / n0, v[1] / n1
    se2 = se0 + se1
    if se2 <= 0:
        return int(n0), int(n1), float("nan"), float("nan")
    t = float((m[1] - m[0]) / math.sqrt(se2))
    dof = float(se2 * se2 / (se0 * se0 / (n0 - 1.0)
                             + se1 * se1 / (n1 - 1.0)))
    return int(n0), int(n1), t, dof


def benford_audit(ds, col: str, *, num_buckets: int | None = None):
    """Benford's-law first-digit audit of a positive numeric column —
    the classic fabricated-/synthetic-data smell test (Benford 1938;
    Nigrini's forensic-accounting use is the canonical application).
    For every row with ``col`` ≥ 1, the first significant digit is
    extracted INTEGER-exactly (floor → int64 → first decimal character,
    never floor(log10(x)) — libm log10 may differ in the last ulp
    across engines, which would flip boundary values like 999.999…).
    Returns Dataset[{digit, n, share, expected, resid}] with one row per
    observed digit 1-9: ``share`` the observed fraction, ``expected``
    the Benford mass log10(1 + 1/d), ``resid`` the standardized
    binomial residual (n_d − N·e_d) / sqrt(N·e_d·(1−e_d)) — |resid| ≳ 3
    flags a digit.  Values in (0, 1) are excluded by design (their
    first significant digit needs log10); rows ≤ 0 / null are skipped.

    Scale shape: per-batch digit value_counts (≤ 9 partial rows per
    batch) → one 9-key exchange → driver finalize over ≤ 9 rows."""
    import ray.data as rd

    from webval.exchange import grouped_agg, sum_block_scalars

    def partial(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column(col).combine_chunks(), pa.float64())
        c = c.filter(pc.and_(pc.is_valid(c),
                             pc.greater_equal(c, pa.scalar(1.0))))
        ints = pc.cast(pc.floor(c), pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(ints, pa.string()), 0, 1), pa.int64())
        vc = digit.value_counts()
        return pa.table({"digit": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = grouped_agg(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pyarrow"),
        ["digit"], [("n", "sum")], rename={"n_sum": "n"},
        num_buckets=num_buckets).materialize()
    total = sum_block_scalars(counts, ["n"])["n"]
    schema = pa.schema([("digit", pa.int64()), ("n", pa.int64()),
                        ("share", pa.float64()),
                        ("expected", pa.float64()),
                        ("resid", pa.float64())])
    if total == 0:
        return rd.from_arrow(schema.empty_table())

    def finalize(t: pa.Table) -> pa.Table:
        d = t.column("digit").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        e = np.log10(1.0 + 1.0 / d)
        resid = (n - total * e) / np.sqrt(total * e * (1.0 - e))
        return pa.table({"digit": t.column("digit"), "n": t.column("n"),
                         "share": pa.array(n / total),
                         "expected": pa.array(e),
                         "resid": pa.array(resid)})

    return counts.map_batches(finalize, batch_format="pyarrow") \
        .sort("digit")


def rank_biased_overlap(list_a, list_b, *, p: float = 0.9) -> float:
    """Truncated rank-biased overlap RBO@k (Webber et al. 2010):

        RBO = (1 − p) · Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d

    with A_d/B_d the depth-d prefixes and k = max(len(A), len(B)) —
    the top-weighted similarity of two rankings (1 = identical order,
    0 = disjoint), the right "did today's top-100 hosts change" metric
    where Kendall/Spearman need both lists to rank everything.  This is
    the minimal (uninterpolated) form: it is a LOWER bound that two
    finite prefixes can certify, monotonically approaching the full
    RBO as k grows.  Duplicate ids within one list raise.

    Driver-side by design: rankings are top-k lists (the distributed
    part is producing them); k is policy-sized."""
    a = list(list_a)
    b = list(list_b)
    if len(set(a)) != len(a) or len(set(b)) != len(b):
        raise ValueError("rank_biased_overlap: duplicate ids in a list")
    if not 0.0 < p < 1.0:
        raise ValueError(f"rank_biased_overlap: p={p} not in (0, 1)")
    k = max(len(a), len(b))
    if k == 0:
        return 0.0
    pos_a = {x: i + 1 for i, x in enumerate(a)}
    pos_b = {x: i + 1 for i, x in enumerate(b)}
    depth_of = sorted(max(pos_a[x], pos_b[x]) for x in pos_a
                      if x in pos_b)
    total, seen, j = 0.0, 0, 0
    for d in range(1, k + 1):
        while j < len(depth_of) and depth_of[j] <= d:
            seen += 1
            j += 1
        total += p ** (d - 1) * seen / d
    return float((1.0 - p) * total)


def grouped_js_drift(ds, slice_col: str, side_col: str, value_col: str,
                     edges: list, *, num_buckets: int | None = None):
    """Per-slice distribution drift: within every ``slice_col`` group,
    the Jensen-Shannon divergence (base 2) between side 0 and side 1's
    histograms of ``value_col`` over the SHARED ``edges`` binning —
    "which language/source actually drifted" when the global drift
    score only says "something did".  Values outside the edges clamp
    into the end bins; nulls drop; a slice missing a side reports
    js = 1.0 (maximal, by :func:`js_divergence`'s empty-side rule).
    Returns Dataset[{slice, n0, n1, js}].

    Scale shape: ONE (slice, side, bin) count exchange (bins are
    policy-sized); per-slice finalize is a vectorized pass over the
    bin table co-bucketed by slice."""
    from webval.exchange import bucketed_group_apply

    e = np.asarray(list(edges), dtype=np.float64)
    if len(e) < 2 or not (np.diff(e) > 0).all():
        raise ValueError("grouped_js_drift: edges must be increasing, "
                         "length >= 2")
    nb = len(e) - 1

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(slice_col).combine_chunks()
        side = t.column(side_col).combine_chunks()
        v = pc.cast(t.column(value_col).combine_chunks(), pa.float64())
        m = pc.and_(pc.and_(pc.is_valid(s), pc.is_valid(side)),
                    pc.is_valid(v))
        s, side, v = s.filter(m), side.filter(m), v.filter(m)
        vn = v.to_numpy(zero_copy_only=False)
        b = np.clip(np.searchsorted(e, vn, side="right") - 1, 0, nb - 1)
        tab = pa.table({
            slice_col: s,
            "side": pc.cast(side, pa.int64()),
            "bin": pa.array(b.astype(np.int64)),
            "n": pa.nulls(len(b), pa.int64()).fill_null(1)})
        agg = tab.group_by([slice_col, "side", "bin"]).aggregate(
            [("n", "sum")])
        return agg.rename_columns([slice_col, "side", "bin", "n"])

    def finalize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                slice_col: pa.array([], g.schema.field(slice_col).type),
                "n0": pa.array([], pa.int64()),
                "n1": pa.array([], pa.int64()),
                "js": pa.array([], pa.float64())})
        g = g.sort_by([(slice_col, "ascending")])
        sv = g.column(slice_col).combine_chunks()
        rows_out, n0s, n1s, jss = [], [], [], []
        n = g.num_rows
        change = np.ones(n, dtype=bool)
        change[1:] = ~pc.equal(sv.slice(1), sv.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        starts = np.where(change)[0]
        ends = np.append(starts[1:], n)
        sides = g.column("side").to_numpy(zero_copy_only=False)
        bins = g.column("bin").to_numpy(zero_copy_only=False)
        ns = g.column("n").to_numpy(zero_copy_only=False)
        for st, en in zip(starts, ends):
            p = np.zeros(nb)
            q = np.zeros(nb)
            sl = slice(st, en)
            s0 = sides[sl] == 0
            np.add.at(p, bins[sl][s0], ns[sl][s0])
            np.add.at(q, bins[sl][~s0], ns[sl][~s0])
            rows_out.append(sv[int(st)].as_py())
            n0s.append(int(p.sum()))
            n1s.append(int(q.sum()))
            jss.append(js_divergence(p, q))
        return pa.table({
            slice_col: pa.array(rows_out, sv.type),
            "n0": pa.array(n0s, pa.int64()),
            "n1": pa.array(n1s, pa.int64()),
            "js": pa.array(jss, pa.float64())})

    counts = bucketed_group_apply(
        ds.select_columns([slice_col, side_col, value_col]).map_batches(
            partial, batch_format="pyarrow"),
        [slice_col], finalize, num_buckets=num_buckets,
        partial_fn=None)
    return counts
