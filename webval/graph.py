"""Distributed PageRank — the iterative-algorithm shape over the exchange
(SURVEY.md training-data extensions; link-graph quality signals for crawl
curation).

Per iteration (classic power method with dangling-mass redistribution):

    r' = (1-d)/N + d · (Σ_{edges u→v} r(u)/deg(u)  +  dangling_mass/N)

Scale shape: the edge list is projected + materialized ONCE with each
source's out-degree attached; every iteration is then

1. ``equi_join`` edges ⋈ current ranks on src (large×large through the
   exchange — ranks are one row per node, edges many per node),
2. per-edge contribution ``rank/deg`` (vectorized), exchange ``grouped_agg``
   sum by dst,
3. left-join the contribution sums back onto the node table and apply the
   formula.

Ranks are materialized per iteration (one row per node — small next to the
edge list) so the lazy plan stays flat; the only driver scalars are N and
the per-iteration dangling mass (a per-block partial sum).  Nothing
edge-sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _scalar_sum(ds, col: str) -> float:
    """Driver sum of a column via per-block partials (the materialize +
    driver-sum pattern from bench.py's AllToAll finding — no .sum() op)."""
    parts = ds.map_batches(
        lambda t: pa.table({"s": pa.array(
            [pc.sum(t.column(col)).as_py() or 0.0], pa.float64())}),
        batch_format="pyarrow").take_all()
    return float(sum(r["s"] for r in parts))


def pagerank(edges, src_col: str, dst_col: str, *, damping: float = 0.85,
             n_iter: int = 10, num_buckets: int | None = None):
    """Ranks of every node appearing in ``edges`` (as source or target).
    Parallel edges are counted with multiplicity (two u→v edges ship twice
    the contribution — dedupe upstream if simple-graph semantics are
    wanted).  Returns a Dataset of (node, rank); ranks sum to 1.
    """
    from webval.exchange import distinct_rows, grouped_agg, grouped_count
    from webval.joins import equi_join

    node_t = edges.schema().types[list(edges.schema().names).index(src_col)]

    def side(col):
        return edges.map_batches(
            lambda t, c=col: pa.table({"node": t.column(c)}),
            batch_format="pyarrow")

    nodes = distinct_rows(side(src_col).union(side(dst_col)),
                          ["node"], num_buckets=num_buckets).materialize()
    if nodes.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], node_t),
                                       "rank": pa.array([], pa.float64())}))
    outdeg = grouped_count(edges, src_col, out_col="deg",
                           num_buckets=num_buckets).map_batches(
        lambda t: t.rename_columns(["node", "deg"]), batch_format="pyarrow")
    node_deg = equi_join(nodes, outdeg, on="node", how="left",
                         num_buckets=num_buckets).map_batches(
        lambda t: t.set_column(
            t.column_names.index("deg"), "deg",
            pc.fill_null(t.column("deg"), 0)),
        batch_format="pyarrow").materialize()
    n = node_deg.count()

    ed = edges.map_batches(
        lambda t: pa.table({"node": t.column(src_col),
                            "dst": t.column(dst_col)}),
        batch_format="pyarrow").materialize()

    ranks = node_deg.map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n))),
        batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n
    for _ in range(n_iter):
        dangling = _scalar_sum(
            ranks.map_batches(
                lambda t: t.filter(pc.equal(t.column("deg"), 0)),
                batch_format="pyarrow"), "rank")
        per_edge = equi_join(ed, ranks, on="node",
                             num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "node": t.column("dst"),
                "w": pc.divide(t.column("rank"),
                               pc.cast(t.column("deg"), pa.float64()))}),
            batch_format="pyarrow")
        contrib = grouped_agg(per_edge, ["node"], [("w", "sum")],
                              rename={"w_sum": "w"},
                              num_buckets=num_buckets)
        shift = base + damping * dangling / n

        def apply(t: pa.Table, s=shift) -> pa.Table:
            w = pc.fill_null(t.column("w"), 0.0)
            r = pc.add(pc.multiply(w, damping), s)
            return pa.table({"node": t.column("node"),
                             "deg": t.column("deg"), "rank": r})

        ranks = equi_join(node_deg, contrib, on="node", how="left",
                          num_buckets=num_buckets).map_batches(
            apply, batch_format="pyarrow").materialize()

    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")


def pagerank_reference(src: np.ndarray, dst: np.ndarray, *,
                       damping: float = 0.85, n_iter: int = 10):
    """Exact in-memory oracle with identical semantics (tests + the query's
    self-assertion).  Returns (nodes_sorted, ranks)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s_idx, d_idx = inv[:len(src)], inv[len(src):]
    n = len(nodes)
    deg = np.bincount(s_idx, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, d_idx, r[s_idx] / deg[s_idx])
        r = (1.0 - damping) / n + damping * (contrib + 0.0) \
            + damping * dangling / n
    return nodes, r


def connected_components(edges, src_col: str, dst_col: str, *,
                         max_iter: int = 50,
                         num_buckets: int | None = None):
    """Connected components of an undirected edge list: Dataset[{id,
    component}] over every node appearing in an edge, ``component`` = the
    min node id of its component.

    Delegates to the min-label-propagation engine that backs the dedup
    clustering (webval.dedup.connected_components_distributed): per round
    one (node, label) exchange, vectorized searchsorted local joins,
    sum-fixpoint termination — rounds ≈ component diameter, nothing
    graph-sized on the driver.  Node ids must be integers (hash or
    dictionary-encode string ids first)."""
    from webval.dedup import connected_components_distributed

    out = connected_components_distributed(edges, id_a=src_col,
                                           id_b=dst_col,
                                           max_iter=max_iter,
                                           num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.rename_columns(["id", "component"]),
        batch_format="pyarrow")


def link_degrees(links, src_col: str = "src_url", dst_col: str = "dst_url", *,
                 num_buckets: int | None = None):
    """Per-node in/out degree of the link graph — the cheapest graph
    feature a crawl-validation pass wants (dangling-page and hub detection)
    and the warm-up structure for pagerank/connected_components.

    One stateless explode (each edge contributes (src, out=1) and
    (dst, in=1) rows; null endpoints dropped) followed by one exchange sum
    — the per-batch partial is the explode itself, so the shuffle carries
    (url, 0/1, 0/1) rows pre-summed per batch by the exchange combiner.
    Output: (node, out_deg, in_deg), one row per distinct endpoint.
    """
    import pyarrow.compute as pc

    from webval.exchange import grouped_agg

    def explode(t: pa.Table) -> pa.Table:
        src = t.column(src_col).combine_chunks()
        dst = t.column(dst_col).combine_chunks()
        n_s, n_d = len(src), len(dst)
        node = pa.concat_arrays([src, dst])
        out_deg = pa.array(np.r_[np.ones(n_s, np.int64),
                                 np.zeros(n_d, np.int64)])
        in_deg = pa.array(np.r_[np.zeros(n_s, np.int64),
                                np.ones(n_d, np.int64)])
        tt = pa.table({"node": node, "out_deg": out_deg, "in_deg": in_deg})
        return tt.filter(pc.is_valid(tt.column("node")))

    exploded = links.select_columns([src_col, dst_col]) \
        .map_batches(explode, batch_format="pyarrow")
    # pre-sum inside each batch so the shuffle carries one row per distinct
    # node per batch, not one per edge endpoint
    partial = exploded.map_batches(
        lambda t: t.group_by("node").aggregate(
            [("out_deg", "sum"), ("in_deg", "sum")]).rename_columns(
            ["node", "out_deg", "in_deg"]),
        batch_format="pyarrow")
    return grouped_agg(partial, ["node"],
                       [("out_deg", "sum"), ("in_deg", "sum")],
                       num_buckets=num_buckets,
                       rename={"out_deg_sum": "out_deg",
                               "in_deg_sum": "in_deg"})


def reciprocity(edges, src_col: str, dst_col: str, *,
                num_buckets: int | None = None):
    """Directed-graph edge reciprocity: the fraction of distinct edges
    (u→v, u≠v, nulls dropped) whose reverse v→u also exists — the classic
    link-graph health signal (near-0 for crawl/citation graphs, high for
    social graphs; a jump flags link-farm or mirror contamination).

    Scale shape: one dedup-combiner exchange for the distinct edge set,
    then a multi-key SEMI equi-join of the edge set against itself with
    the key order reversed (co-bucketed — a pair's edge and its reverse
    hash to the same bucket by key symmetry of the join spec); counts
    reduce per-block, nothing materializes on the driver.  Returns
    (n_edges, n_reciprocal, reciprocity) as a one-row table.
    """
    import ray

    from webval.exchange import distinct_rows
    from webval.joins import equi_join

    def proj(t: pa.Table) -> pa.Table:
        a = t.column(src_col).combine_chunks()
        b = t.column(dst_col).combine_chunks()
        keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                       pc.invert(pc.equal(a, b)))
        return pa.table({"a": a.filter(keep), "b": b.filter(keep)})

    e = distinct_rows(edges.map_batches(proj, batch_format="pyarrow"),
                      ["a", "b"], num_buckets=num_buckets).materialize()
    recip = equi_join(e, e, on=["a", "b"], right_on=["b", "a"],
                      how="semi", num_buckets=num_buckets)
    n_edges = e.count()
    n_recip = recip.count()
    ratio = n_recip / n_edges if n_edges else float("nan")
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_reciprocal": pa.array([n_recip], pa.int64()),
        "reciprocity": pa.array([ratio], pa.float64())})


def degree_assortativity(edges, src_col: str, dst_col: str, *,
                         num_buckets: int | None = None) -> pa.Table:
    """Out-in degree assortativity of a directed graph: the Pearson
    correlation, over distinct edges u→v (self-loops and nulls dropped),
    between out-degree(u) and in-degree(v) — positive when hubs link to
    hubs (mirror/farm structure), negative for the hub-and-spoke shape
    natural web graphs show (Newman 2002, assortative mixing; public
    formula).  Returns one row: (n_edges, assortativity); null when the
    degree variance on either side is zero (SQL corr() NULL semantics).

    Scale shape: one dedup-combiner exchange builds the distinct edge set;
    per-endpoint degree tables come from count-combiner exchanges over it;
    two co-bucketed equi-joins attach degrees back to the edges; the corr
    reduces via 6-number co-moment partials per block, summed on the
    driver (KB-sized) — nothing edge- or node-sized ever materializes
    driver-side.
    """
    from webval.aggregates import corr_of
    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    def proj(t: pa.Table) -> pa.Table:
        a = t.column(src_col).combine_chunks()
        b = t.column(dst_col).combine_chunks()
        keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                       pc.invert(pc.equal(a, b)))
        return pa.table({"a": a.filter(keep), "b": b.filter(keep)})

    e = distinct_rows(edges.map_batches(proj, batch_format="pyarrow"),
                      ["a", "b"], num_buckets=num_buckets).materialize()
    outd = grouped_agg(e, ["a"], [("b", "count")],
                       rename={"b_count": "out_deg"},
                       num_buckets=num_buckets)
    ind = grouped_agg(e, ["b"], [("a", "count")],
                      rename={"a_count": "in_deg"},
                      num_buckets=num_buckets)
    # every edge endpoint has a degree row by construction → inner joins
    with_out = equi_join(e, outd, on=["a"], how="inner",
                         num_buckets=num_buckets)
    with_both = equi_join(with_out, ind, on=["b"], how="inner",
                          num_buckets=num_buckets)
    n_edges = e.count()
    r = corr_of(with_both, "out_deg", "in_deg")
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "assortativity": pa.array([r], pa.float64())})


def kcore(edges, src_col: str, dst_col: str, *, k: int = 3,
          max_iter: int = 8, num_buckets: int | None = None) -> "object":
    """k-core of the undirected graph: the maximal subgraph in which
    every node keeps ≥ k distinct neighbors after iteratively peeling
    lower-degree nodes (Seidman 1983, network cores) — the link-farm /
    tight-cluster detector degree alone misses (a high-degree node whose
    neighbors are all leaves is NOT in the 2-core).  Edges are
    symmetrized and deduplicated; self-loops and null endpoints drop.

    Runs the peel as a FIXED budget of ``max_iter`` rounds (early-exit
    when a round removes nothing — the remaining rounds are no-ops, so
    the result equals the full unroll and an unrolled-CTE SQL twin) and
    raises a named diagnostic if the peel is still shrinking after the
    budget, so a fixture change can never silently desync a parity twin.
    Returns a Dataset[{node, core_degree}] of surviving nodes.

    Scale shape: per iteration, one count-combiner degree exchange over
    the current edge set plus two co-bucketed semi-joins (edges whose
    src AND dst survive) — the connected-components iteration template;
    no node- or edge-sized driver state (counts only)."""
    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    def sym(t: pa.Table) -> pa.Table:
        a = t.column(src_col).combine_chunks()
        b = t.column(dst_col).combine_chunks()
        keep = pc.and_(pc.and_(pc.is_valid(a), pc.is_valid(b)),
                       pc.invert(pc.equal(a, b)))
        a, b = a.filter(keep), b.filter(keep)
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    e = distinct_rows(edges.map_batches(sym, batch_format="pyarrow"),
                      ["node", "nbr"], num_buckets=num_buckets) \
        .materialize()
    n_edges = e.count()
    for it in range(max_iter):
        if n_edges == 0:
            break
        deg = grouped_agg(e, ["node"], [("nbr", "count")],
                          rename={"nbr_count": "deg"},
                          num_buckets=num_buckets)
        keep = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("deg"), k)),
            batch_format="pyarrow")
        e2 = equi_join(e, keep, on=["node"], how="semi",
                       num_buckets=num_buckets)
        e2 = equi_join(e2, keep.map_batches(
            lambda t: t.rename_columns(["nbr"] + t.column_names[1:]),
            batch_format="pyarrow"), on=["nbr"], how="semi",
            num_buckets=num_buckets).materialize()
        n2 = e2.count()
        e = e2
        if n2 == n_edges:          # fixpoint: remaining rounds are no-ops
            break
        n_edges = n2
    else:
        if n_edges:
            deg = grouped_agg(e, ["node"], [("nbr", "count")],
                              rename={"nbr_count": "deg"},
                              num_buckets=num_buckets)
            under = deg.map_batches(
                lambda t: t.filter(pc.less(t.column("deg"), k)),
                batch_format="pyarrow")
            if under.count():
                raise RuntimeError(
                    f"kcore: peel still shrinking after max_iter="
                    f"{max_iter} rounds (k={k}); raise max_iter (and "
                    "match any unrolled SQL twin) for this graph")
    return grouped_agg(e, ["node"], [("nbr", "count")],
                       rename={"nbr_count": "core_degree"},
                       num_buckets=num_buckets)


def resolve_pointers(mapping, src_col: str, dst_col: str, *,
                     max_rounds: int = 16,
                     num_buckets: int | None = None):
    """Resolve every source of a FUNCTIONAL pointer graph (redirect
    chains, alias tables, symlink maps: each ``src_col`` value points to
    exactly one ``dst_col`` value) to its terminal target by pointer
    doubling — round k extends every unresolved path to 2^k hops, so a
    longest chain of L resolves in ceil(log2 L) co-bucketed self-joins
    instead of L sequential lookups.  A node is terminal when it has no
    outgoing edge or points to itself.  Nodes trapped on a cycle never
    terminate and come back flagged ``resolved=false`` after
    ``max_rounds`` (hops = pointers followed so far) — the redirect-loop
    audit for free.  Duplicate ``src_col`` values make the graph
    non-functional and expand multiplicatively through the join; feed
    deduplicated mappings.  Dataset[{src, terminal, hops, resolved}].

    Scale shape: each round is ONE equi_join of the undone frontier
    against the full resolution table on the key exchange (joins.py
    partitioning assumption applies); the frontier only shrinks, done
    rows are frozen out of the left side, and the driver sees just a
    per-round undone COUNT (scalar) for early exit."""
    import ray.data as rd

    from webval.joins import equi_join

    def init(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks()
        d = t.column(dst_col).combine_chunks()
        m = pc.and_(pc.is_valid(s), pc.is_valid(d))
        s, d = s.filter(m), d.filter(m)
        self_loop = pc.equal(s, d)
        return pa.table({
            "node": s, "nxt": d,
            "hops": pc.if_else(self_loop,
                               pa.scalar(0, pa.int64()),
                               pa.scalar(1, pa.int64())),
            "done": self_loop})

    frontier = mapping.select_columns([src_col, dst_col]) \
        .map_batches(init, batch_format="pyarrow").materialize()
    resolution = frontier          # full table: done + active rows
    done_parts = []

    for _ in range(max_rounds):
        active = frontier.map_batches(
            lambda t: t.filter(pc.invert(
                t.column("done").combine_chunks())),
            batch_format="pyarrow").materialize()
        finished = frontier.map_batches(
            lambda t: t.filter(t.column("done").combine_chunks()),
            batch_format="pyarrow").materialize()
        if finished.count():
            done_parts.append(finished)
        if active.count() == 0:
            frontier = None
            break

        joined = equi_join(
            active, resolution, on=["nxt"], right_on=["node"],
            how="left", right_suffix="_r", num_buckets=num_buckets)

        def advance(t: pa.Table) -> pa.Table:
            hit = pc.is_valid(t.column("nxt_r").combine_chunks())
            new_nxt = pc.if_else(hit, t.column("nxt_r"),
                                 t.column("nxt"))
            new_hops = pc.if_else(
                hit, pc.add(t.column("hops"),
                            pc.fill_null(t.column("hops_r"), 0)),
                t.column("hops"))
            new_done = pc.if_else(
                hit, pc.fill_null(t.column("done_r"), True),
                pa.scalar(True))  # no outgoing edge -> terminal
            return pa.table({"node": t.column("node"),
                             "nxt": new_nxt, "hops": new_hops,
                             "done": new_done})

        frontier = joined.map_batches(
            advance, batch_format="pyarrow").materialize()
        parts = done_parts + [frontier]
        resolution = parts[0] if len(parts) == 1 \
            else parts[0].union(*parts[1:])

    leftovers = [frontier] if frontier is not None else []
    parts = done_parts + leftovers
    if not parts:
        return rd.from_arrow(pa.table({
            "src": pa.array([], pa.int64()),
            "terminal": pa.array([], pa.int64()),
            "hops": pa.array([], pa.int64()),
            "resolved": pa.array([], pa.bool_())}))
    out = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return out.map_batches(
        lambda t: pa.table({"src": t.column("node"),
                            "terminal": t.column("nxt"),
                            "hops": t.column("hops"),
                            "resolved": t.column("done")}),
        batch_format="pyarrow")


def hits(edges, src_col: str, dst_col: str, *, n_iter: int = 4,
         num_buckets: int | None = None):
    """Kleinberg HITS hubs & authorities over a directed edge table —
    the link-farm/spam lens PageRank misses: a page is a good HUB if it
    points at good authorities and a good AUTHORITY if good hubs point
    at it (mutually recursive, so the two scores separate directories
    from content in a way raw degree can't).  L1 normalization each
    half-step (scores sum to 1) so the SQL twin is a plain
    sum-divide; parallel edges count with multiplicity, like
    :func:`pagerank`.

    Scale shape per iteration: two broadcast-free equi-joins of the
    edge table against the node-score table and two (node) sum
    exchanges — identical exchange volume to one pagerank step; the
    normalizer is a per-block scalar rollup.  Returns a Dataset of
    (node, auth, hub)."""
    from webval.exchange import distinct_rows, grouped_agg
    from webval.joins import equi_join

    node_t = edges.schema().types[list(edges.schema().names).index(src_col)]

    def side(col):
        return edges.map_batches(
            lambda t, c=col: pa.table({"node": t.column(c)}),
            batch_format="pyarrow")

    nodes = distinct_rows(side(src_col).union(side(dst_col)),
                          ["node"], num_buckets=num_buckets).materialize()
    if nodes.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], node_t),
                                       "auth": pa.array([], pa.float64()),
                                       "hub": pa.array([], pa.float64())}))
    n = nodes.count()
    ed = edges.map_batches(
        lambda t: pa.table({"src": t.column(src_col),
                            "dst": t.column(dst_col)}),
        batch_format="pyarrow").materialize()

    hub = nodes.map_batches(
        lambda t: t.append_column("hub",
                                  pa.array(np.full(t.num_rows, 1.0 / n))),
        batch_format="pyarrow").materialize()

    def half_step(scores, score_col, join_on, out_name):
        """new[emit] = Σ_{edge} scores[join side], L1-normalized."""
        per_edge = equi_join(
            ed.map_batches(lambda t: t.rename_columns(
                ["node", "other"] if join_on == "src" else ["other", "node"]),
                batch_format="pyarrow"),
            scores, on="node", num_buckets=num_buckets).map_batches(
            lambda t: pa.table({"node": t.column("other"),
                                "w": t.column(score_col)}),
            batch_format="pyarrow")
        contrib = grouped_agg(per_edge, ["node"], [("w", "sum")],
                              rename={"w_sum": "w"},
                              num_buckets=num_buckets)
        joined = equi_join(nodes, contrib, on="node", how="left",
                           num_buckets=num_buckets).map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                out_name: pc.fill_null(t.column("w"), 0.0)}),
            batch_format="pyarrow").materialize()
        tot = _scalar_sum(joined, out_name)
        if tot <= 0:
            return joined
        return joined.map_batches(
            lambda t: t.set_column(
                t.column_names.index(out_name), out_name,
                pc.divide(t.column(out_name), pa.scalar(tot))),
            batch_format="pyarrow").materialize()

    auth = None
    for _ in range(n_iter):
        # authorities gather from hubs along edge direction (src -> dst)
        auth = half_step(hub, "hub", "src", "auth")
        # hubs gather from authorities against edge direction
        hub = half_step(auth, "auth", "dst", "hub")

    return equi_join(auth, hub, on="node", num_buckets=num_buckets)


def hits_reference(src: np.ndarray, dst: np.ndarray, *, n_iter: int = 4):
    """Exact in-memory oracle with identical semantics (tests + the
    query's self-assertion).  Returns (nodes_sorted, auth, hub)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s_idx, d_idx = inv[:len(src)], inv[len(src):]
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        np.add.at(a, d_idx, h[s_idx])
        if a.sum() > 0:
            a = a / a.sum()
        h = np.zeros(n)
        np.add.at(h, s_idx, a[d_idx])
        if h.sum() > 0:
            h = h / h.sum()
    return nodes, a, h


def cocitation_pairs(edges, src_col: str, dst_col: str, *,
                     max_out: int = 64, min_cocite: int = 2,
                     top_k: int = 20, num_buckets: int | None = None):
    """Co-citation similarity (Small 1973): the ``top_k`` target pairs
    most often linked by the SAME source — pages co-cited by many
    sources are topically related even with no direct link between
    them (the link-graph analog of "users who bought both").  Each
    source contributes C(outdeg, 2) pairs, so out-degree is capped
    DETERMINISTICALLY at ``max_out``: only a source's lexicographically
    smallest ``max_out`` distinct targets participate (a mirrorable
    rule, unlike random sampling — hub pages with giant blogrolls are
    exactly the sources whose co-citations are least informative).
    Pairs are ordered d1 < d2; rank is (count desc, d1, d2).  Returns
    Dataset[{d1, d2, n}] with n ≥ ``min_cocite``.

    Scale shape: distinct-edge exchange → per-source top-``max_out``
    selection (batch-combined top-k exchange) → co-bucketed per-source
    pair fan-out (vectorized ragged-range construction, ≤ C(max_out,2)
    pairs per source, counts combined per bucket before they move) →
    ONE (d1, d2) count exchange → pair-table sort + limit."""
    from webval.exchange import bucketed_group_apply, distinct_rows, grouped_agg
    from webval.rank import top_k_per_group

    e = distinct_rows(
        edges.select_columns([src_col, dst_col]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        [src_col, dst_col], num_buckets=num_buckets)
    capped = top_k_per_group(e, src_col, dst_col, max_out,
                             descending=False, num_buckets=num_buckets)

    def gen_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"d1": pa.array([], pa.large_string()),
                          "d2": pa.array([], pa.large_string()),
                          "n": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        g = g.sort_by([(src_col, "ascending"), (dst_col, "ascending")])
        src = g.column(src_col).combine_chunks()
        v = g.column(dst_col).combine_chunks().cast(pa.large_string())
        n = len(src)
        # group starts: positions where src changes
        change = np.ones(n, dtype=bool)
        eq = pc.equal(src.slice(1), src.slice(0, n - 1))
        change[1:] = ~eq.to_numpy(zero_copy_only=False)
        starts = np.where(change)[0]
        start_of = np.repeat(starts, np.diff(np.append(starts, n)))
        counts = np.arange(n, dtype=np.int64) - start_of  # pairs ending at j
        total = int(counts.sum())
        if total == 0:
            return empty
        right = np.repeat(np.arange(n, dtype=np.int64), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        left = (np.arange(total, dtype=np.int64)
                - np.repeat(cum, counts) + np.repeat(start_of, counts))
        tab = pa.table({"d1": v.take(pa.array(left)),
                        "d2": v.take(pa.array(right))})
        agg = tab.group_by(["d1", "d2"]).aggregate([([], "count_all")])
        agg = agg.rename_columns(["d1", "d2", "n"])
        return agg.set_column(2, "n", pc.cast(agg.column(2), pa.int64()))

    pair_counts = grouped_agg(
        bucketed_group_apply(capped, [src_col], gen_pairs,
                             num_buckets=num_buckets),
        ["d1", "d2"], [("n", "sum")], rename={"n_sum": "n"},
        num_buckets=num_buckets)
    if min_cocite > 1:
        pair_counts = pair_counts.filter(expr=f"n >= {int(min_cocite)}")
    return pair_counts.sort(["n", "d1", "d2"],
                            descending=[True, False, False]).limit(top_k)


def personalized_pagerank(edges, src_col: str, dst_col: str,
                          seeds: list, *, damping: float = 0.85,
                          n_iter: int = 10,
                          num_buckets: int | None = None):
    """Personalized PageRank: random walks restart at the ``seeds``
    (uniformly) instead of everywhere, so rank measures proximity TO
    the seed set — the "related pages / similar hosts" primitive
    (Haveliwala 2002 topic-sensitive PR).  Update per iteration:

        r = d · (Aᵀ (r/outdeg) + dangling·v) + (1−d) · v

    with v uniform on seeds, 0 elsewhere; ranks sum to 1.  Initial rank
    IS v (deterministic, mirrors the unrolled SQL twin).  Parallel
    edges count with multiplicity, like :func:`pagerank`.  Seeds absent
    from the graph still receive teleport mass (they are added as
    isolated nodes).  Returns Dataset[{node, rank}].

    Scale shape: identical movement to :func:`pagerank` — per
    iteration one edge⋈rank co-bucketed join, one per-dst sum
    exchange, one per-block dangling partial; the seed set is
    policy-sized and broadcasts in the closure."""
    import ray.data as rd

    from webval.exchange import distinct_rows, grouped_agg, grouped_count
    from webval.joins import equi_join

    if not seeds:
        raise ValueError("personalized_pagerank: empty seed set")
    seed_arr = pa.array(sorted(set(seeds)))
    n_seeds = len(seed_arr)

    def side(col):
        return edges.map_batches(
            lambda t, c=col: pa.table({"node": t.column(c)}),
            batch_format="pyarrow")

    seed_ds = rd.from_arrow(pa.table({"node": seed_arr}))
    nodes = distinct_rows(side(src_col).union(side(dst_col))
                          .union(seed_ds).map_batches(
                              lambda t: t.drop_null(),
                              batch_format="pyarrow"),
                          ["node"], num_buckets=num_buckets).materialize()
    outdeg = grouped_count(edges, src_col, out_col="deg",
                           num_buckets=num_buckets).map_batches(
        lambda t: t.rename_columns(["node", "deg"]),
        batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        t = t.set_column(t.column_names.index("deg"), "deg",
                         pc.fill_null(t.column("deg"), 0))
        is_seed = pc.is_in(t.column("node").combine_chunks()
                           .cast(seed_arr.type), value_set=seed_arr)
        return t.append_column("seed", is_seed)

    node_deg = equi_join(nodes, outdeg, on="node", how="left",
                         num_buckets=num_buckets).map_batches(
        tag, batch_format="pyarrow").materialize()

    v = 1.0 / n_seeds
    ranks = node_deg.map_batches(
        lambda t: t.append_column(
            "rank", pc.if_else(t.column("seed"), pa.scalar(v),
                               pa.scalar(0.0))),
        batch_format="pyarrow").materialize()

    ed = edges.map_batches(
        lambda t: pa.table({"node": t.column(src_col),
                            "dst": t.column(dst_col)}).drop_null(),
        batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        dangling = _scalar_sum(
            ranks.map_batches(
                lambda t: t.filter(pc.equal(t.column("deg"), 0)),
                batch_format="pyarrow"), "rank")
        per_edge = equi_join(ed, ranks, on="node",
                             num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "node": t.column("dst"),
                "w": pc.divide(t.column("rank"),
                               pc.cast(t.column("deg"), pa.float64()))}),
            batch_format="pyarrow")
        contrib = grouped_agg(per_edge, ["node"], [("w", "sum")],
                              rename={"w_sum": "w"},
                              num_buckets=num_buckets)
        seed_mass = ((1.0 - damping) + damping * dangling) / n_seeds

        def apply(t: pa.Table, s=seed_mass) -> pa.Table:
            w = pc.fill_null(t.column("w"), 0.0)
            r = pc.add(pc.multiply(w, damping),
                       pc.if_else(t.column("seed"), pa.scalar(s),
                                  pa.scalar(0.0)))
            return pa.table({"node": t.column("node"),
                             "deg": t.column("deg"),
                             "seed": t.column("seed"), "rank": r})

        ranks = equi_join(node_deg, contrib, on="node", how="left",
                          num_buckets=num_buckets).map_batches(
            apply, batch_format="pyarrow").materialize()

    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")


def negative_edge_samples(edges, src_col: str, dst_col: str, k: int, *,
                          multiplier: int = 2654435761,
                          modulus: int = 2**32,
                          num_buckets: int | None = None):
    """Deterministic negative sampling for link prediction: for every
    distinct source, ``k`` pseudo-random candidate targets drawn by the
    Knuth multiplicative hash over (source-rank · k + i), mapped into
    the lexicographically-ranked target vocabulary, then TRUE edges are
    anti-joined away — reproducible contrastive pairs (same negatives
    every run, every engine — the property that makes a train set
    auditable; cf. the membership-exact samplers).  A source may get
    fewer than k negatives when candidates collide or hit real edges —
    collisions are skipped, not resampled (deterministic-set semantics).
    Returns Dataset[{src, dst, slot}] with slot the candidate index.

    Scale shape: the TARGET vocabulary is ranked driver-side (node
    domains — hosts, items — are policy-bounded; the edge set is not),
    broadcast as one array; candidate generation is a stateless
    vectorized map over the distinct-source exchange; the final
    anti-join is co-bucketed."""
    from webval.exchange import distinct_rows
    from webval.joins import equi_join

    if k < 1:
        raise ValueError(f"negative_edge_samples: k must be >= 1, got {k}")
    e = distinct_rows(
        edges.select_columns([src_col, dst_col]).map_batches(
            lambda t: t.drop_null(), batch_format="pyarrow"),
        [src_col, dst_col], num_buckets=num_buckets).materialize()

    import ray

    # target vocabulary: bounded node domain, sorted for a stable rank
    dst_vals = sorted({v for r in (ray.get(x) for x in distinct_rows(
        e.select_columns([dst_col]), [dst_col],
        num_buckets=num_buckets).materialize().to_arrow_refs())
        if r.num_rows for v in r.column(dst_col).to_pylist()})
    m = len(dst_vals)
    if m == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            src_col: pa.array([], pa.large_string()),
            dst_col: pa.array([], pa.large_string()),
            "slot": pa.array([], pa.int64())}))
    dst_arr = pa.array(dst_vals).cast(pa.large_string())
    srcs = distinct_rows(e.select_columns([src_col]), [src_col],
                         num_buckets=num_buckets)
    src_ranked = sorted({v for r in (ray.get(x) for x in
                         srcs.materialize().to_arrow_refs())
                         if r.num_rows
                         for v in r.column(src_col).to_pylist()})
    rank_of = {s: i for i, s in enumerate(src_ranked)}
    mult, mod = np.uint64(multiplier), np.uint64(modulus)

    def gen(t: pa.Table) -> pa.Table:
        s = t.column(src_col).combine_chunks()
        ranks = np.array([rank_of[v] for v in s.to_pylist()],
                         dtype=np.uint64)
        n = len(ranks)
        slot = np.tile(np.arange(k, dtype=np.uint64), n)
        base = np.repeat(ranks, k) * np.uint64(k) + slot
        with np.errstate(over="ignore"):
            h = (base * mult) % mod
        idx = (h % np.uint64(m)).astype(np.int64)
        return pa.table({
            src_col: s.take(pa.array(np.repeat(np.arange(n), k))),
            dst_col: dst_arr.take(pa.array(idx)),
            "slot": pa.array(slot.astype(np.int64))})

    cands = srcs.map_batches(gen, batch_format="pyarrow")
    cands = distinct_rows(cands, [src_col, dst_col, "slot"],
                          num_buckets=num_buckets)
    return equi_join(cands,
                     e.map_batches(lambda t: t.rename_columns(
                         [src_col, dst_col]), batch_format="pyarrow"),
                     on=[src_col, dst_col], how="anti",
                     num_buckets=num_buckets)
