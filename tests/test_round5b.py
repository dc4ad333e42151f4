"""Round-5 session additions: DSIR importance resampling, SemDeDup
within-cluster pruning, leakage-safe grouped split, content-defined
chunking — brute-force oracles, determinism across parallelism, and the
named-diagnostic edges."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _href(s: str, B: int = 256) -> int:
    return sum((i + 1) * ord(c) for i, c in enumerate(s)) % B


def _ref_features(texts, B=256):
    out = []
    for d, t in enumerate(texts):
        ws = t.split(" ")
        for w in ws:
            out.append((d, _href(w, B)))
        for i in range(len(ws) - 1):
            out.append((d, _href(ws[i] + " " + ws[i + 1], B)))
    return sorted(out)


def test_dsir_features_match_direct_string_hash():
    from webval.textstats import _dsir_doc_features

    texts = ["key agg row scan", "a", "slow fast merge", "x y"]
    for typ in (pa.string(), pa.large_string()):
        feats, docs = _dsir_doc_features(pa.array(texts, typ), 256)
        got = sorted(zip(docs.tolist(), feats.tolist()))
        assert got == _ref_features(texts)


def test_dsir_non_ascii_and_empty_token_raise():
    from webval.textstats import _dsir_doc_features

    with pytest.raises(ValueError, match="non-ASCII"):
        _dsir_doc_features(pa.array(["café token"]), 256)
    with pytest.raises(ValueError, match="empty token"):
        _dsir_doc_features(pa.array(["double  space"]), 256)
    with pytest.raises(ValueError, match="null/empty"):
        _dsir_doc_features(pa.array(["ok", None]), 256)


def test_dsir_importance_matches_brute_force_and_batching():
    import ray.data as rd

    from webval.textstats import dsir_importance

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "web", "val", "ray"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(60)]
    tgt = rng.random(60) < 0.4
    B = 64

    # brute force
    occ = _ref_features(texts, B)
    raw = np.zeros(B)
    t_c = np.zeros(B)
    for d, f in occ:
        raw[f] += 1
        if tgt[d]:
            t_c[f] += 1
    p_r = (raw + 1.0) / (raw.sum() + B)
    p_t = (t_c + 1.0) / (t_c.sum() + B)
    ll = np.log(p_t / p_r)
    want = np.zeros(60)
    cnt = np.zeros(60)
    for d, f in occ:
        want[d] += ll[f]
        cnt[d] += 1
    want = want / cnt

    tab = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "is_tgt": pa.array(tgt.tolist()),
                    "text": pa.array(texts)})

    def mask(b):
        return np.asarray(b.column("is_tgt").combine_chunks()
                          .to_numpy(zero_copy_only=False), bool)

    for nb in (1, 7):
        ds = rd.from_arrow(tab).repartition(nb)
        out = pa.concat_tables(
            dsir_importance(ds, "doc_id", "text", mask, n_buckets=B,
                            batch_size=11)
            .iter_batches(batch_format="pyarrow", batch_size=None))
        out = out.sort_by([("doc_id", "ascending")])
        got = out.column("dsir_w").to_numpy(zero_copy_only=False)
        nf = out.column("n_feats").to_numpy(zero_copy_only=False)
        assert np.allclose(got, want, atol=1e-12)
        assert (nf == cnt.astype(np.int64)).all()


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def _brute_semdedup(ids, mat, cents, eps):
    from webval.clustering import _assign

    a = _assign(mat, cents)
    n = mat / np.linalg.norm(mat, axis=1)[:, None]
    pruned = {}
    for i in range(len(ids)):
        hit = False
        for j in range(len(ids)):
            if a[j] == a[i] and ids[j] < ids[i] \
                    and float(n[i] @ n[j]) >= eps:
                hit = True
        pruned[int(ids[i])] = (int(a[i]), hit)
    return pruned


def test_semdedup_prune_matches_brute_force():
    import ray.data as rd

    from webval.dedup import semdedup_prune

    rng = np.random.default_rng(3)
    cents = np.eye(4, 8) * 2.0
    base = rng.normal(size=(40, 8))
    # plant near-dups: rows 30..39 copy rows 0..9 with tiny noise
    base[30:] = base[:10] + rng.normal(scale=1e-3, size=(10, 8))
    ids = rng.permutation(40) * 7  # non-contiguous, shuffled ids
    tab = pa.table({
        "vid": pa.array(ids, pa.int64()),
        "emb": pa.array([r.astype(np.float32) for r in base],
                        pa.list_(pa.float32()))})
    mat = np.asarray([r.as_py() for r in tab.column("emb")], np.float64)
    want = _brute_semdedup(ids, mat, cents, eps=0.9)

    for nb in (1, 5):
        ds = rd.from_arrow(tab).repartition(nb)
        out = pa.concat_tables(
            semdedup_prune(ds, "vid", "emb", cents, eps=0.9)
            .iter_batches(batch_format="pyarrow", batch_size=None))
        got = {int(v): (int(c), bool(p))
               for v, c, p in zip(out.column("vid").to_pylist(),
                                  out.column("cluster").to_pylist(),
                                  out.column("pruned").to_pylist())}
        assert got == want
        assert sum(p for _, p in got.values()) >= 10  # planted dups prune


def test_semdedup_margin_and_group_cap_diagnostics():
    import ray.data as rd

    from webval.dedup import semdedup_prune

    cents = np.eye(2, 4)
    emb = [[1.0, 0.0, 0.0, 0.0], [1.0, 0.02, 0.0, 0.0]]
    tab = pa.table({"vid": pa.array([1, 2], pa.int64()),
                    "emb": pa.array(emb, pa.list_(pa.float32()))})
    cos = float(np.dot(emb[0], emb[1])
                / (np.linalg.norm(emb[0]) * np.linalg.norm(emb[1])))
    ds = rd.from_arrow(tab)
    with pytest.raises(Exception, match="within .* of eps"):
        pa.concat_tables(
            semdedup_prune(ds, "vid", "emb", cents, eps=cos + 1e-6,
                           margin=1e-4)
            .iter_batches(batch_format="pyarrow", batch_size=None))
    with pytest.raises(Exception, match="max_group_rows"):
        pa.concat_tables(
            semdedup_prune(ds, "vid", "emb", cents, eps=0.9,
                           max_group_rows=1)
            .iter_batches(batch_format="pyarrow", batch_size=None))


def test_semdedup_zero_norm_raises():
    import ray.data as rd

    from webval.dedup import semdedup_prune

    tab = pa.table({"vid": pa.array([1], pa.int64()),
                    "emb": pa.array([[0.0, 0.0]], pa.list_(pa.float32()))})
    with pytest.raises(Exception, match="zero-norm"):
        pa.concat_tables(
            semdedup_prune(rd.from_arrow(tab), "vid", "emb",
                           np.eye(1, 2))
            .iter_batches(batch_format="pyarrow", batch_size=None))


# ---------------------------------------------------------------------------
# leakage-safe grouped split
# ---------------------------------------------------------------------------


def test_assign_split_grouped_never_straddles():
    import ray.data as rd

    from webval.pipelines import assign_split_grouped

    rng = np.random.default_rng(11)
    keys = [f"text-{rng.integers(0, 40)}" for _ in range(300)]
    tab = pa.table({"id": pa.array(range(300), pa.int64()),
                    "k": pa.array(keys)})
    for nb in (1, 6):
        ds = rd.from_arrow(tab).repartition(nb)
        out = pa.concat_tables(
            assign_split_grouped(ds, "id", "k")
            .iter_batches(batch_format="pyarrow", batch_size=None))
        assert out.num_rows == 300
        by_key = {}
        for k, c, s in zip(out.column("k").to_pylist(),
                           out.column("canon_id").to_pylist(),
                           out.column("split").to_pylist()):
            by_key.setdefault(k, set()).add((c, s))
        for k, cs in by_key.items():
            assert len(cs) == 1, f"group {k} straddles: {cs}"
        # canon is the group min id
        mins = {}
        for i, k in enumerate(keys):
            mins[k] = min(mins.get(k, 1 << 60), i)
        for k, cs in by_key.items():
            assert next(iter(cs))[0] == mins[k]


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def _ref_chunks(text: str, w: int = 8, mod: int = 64) -> list:
    codes = [ord(c) for c in text]
    cuts = []
    for i in range(w, len(codes) + 1):
        if sum(codes[i - w:i]) % mod == 0:
            cuts.append(i)
    if not cuts or cuts[-1] != len(codes):
        cuts.append(len(codes))
    out, prev = [], 0
    for c in cuts:
        out.append(text[prev:c])
        prev = c
    return out


def test_cdc_chunks_match_reference_and_cover():
    import ray.data as rd

    from webval.dedup import cdc_chunk_stats

    rng = np.random.default_rng(5)
    alpha = "abcdefgh "
    texts = ["".join(rng.choice(list(alpha), size=rng.integers(3, 200)))
             for _ in range(50)]
    grp = [f"g{i % 3}" for i in range(50)]
    ref_total = {}
    ref_distinct = {}
    for g, t in zip(grp, texts):
        ch = _ref_chunks(t)
        assert "".join(ch) == t  # chunks cover the doc exactly
        ref_total[g] = ref_total.get(g, 0) + len(ch)
        ref_distinct.setdefault(g, set()).update(ch)
    tab = pa.table({"g": pa.array(grp), "text": pa.array(texts)})
    for nb in (1, 4):
        ds = rd.from_arrow(tab).repartition(nb)
        out = cdc_chunk_stats(ds, "g", "text")
        tt = pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                               batch_size=None))
        got_t = dict(zip(tt.column("g").to_pylist(),
                         tt.column("n_chunks").to_pylist()))
        got_d = dict(zip(tt.column("g").to_pylist(),
                         tt.column("n_distinct").to_pylist()))
        assert got_t == ref_total
        assert got_d == {g: len(s) for g, s in ref_distinct.items()}


def test_cdc_insertion_only_rechunks_neighborhood():
    # the content-defined property: prepending text leaves the chunking of
    # the unchanged tail identical once boundaries resync
    base = "the quick brown fox jumps over the lazy dog " * 8
    a = _ref_chunks(base)
    b = _ref_chunks("INSERTED PREFIX " + base)
    # boundaries resync after the edit: every chunk but the first is
    # byte-identical (a fixed-width chunker would shift every one)
    assert a[1:] == b[1:] and a[0] != b[0]


def test_cdc_non_ascii_raises():
    import ray.data as rd

    from webval.dedup import cdc_chunk_stats

    tab = pa.table({"g": pa.array(["a"]), "text": pa.array(["café"])})
    out = cdc_chunk_stats(rd.from_arrow(tab), "g", "text")
    with pytest.raises(Exception, match="non-ASCII"):
        pa.concat_tables(out.iter_batches(batch_format="pyarrow",
                                          batch_size=None))


# ---------------------------------------------------------------------------
# hashed logistic regression
# ---------------------------------------------------------------------------


def test_logreg_fit_matches_brute_force_and_separates():
    import ray.data as rd

    from webval.textstats import logreg_fit_hashed

    rng = np.random.default_rng(13)
    pos_vocab = ["excellent", "clear", "thorough"]
    neg_vocab = ["spam", "click", "winx"]
    texts, labels = [], []
    for _ in range(120):
        y = bool(rng.random() < 0.5)
        vocab = pos_vocab if y else neg_vocab
        texts.append(" ".join(rng.choice(vocab,
                                         size=rng.integers(2, 8))))
        labels.append(y)
    # B=64: the six vocab unigrams land in six DISTINCT buckets (at 32,
    # "thorough" and "winx" collide and the separation claim is false)
    B, lr, it = 64, 0.5, 2

    # brute force (same feature hash as the engine)
    occ = _ref_features(texts, B)
    n = len(texts)
    w = np.zeros(B)
    for _ in range(it):
        s = np.zeros(n)
        for d, f in occ:
            s[d] += w[f]
        p = 1.0 / (1.0 + np.exp(-s))
        g = np.zeros(B)
        for d, f in occ:
            g[f] += (1.0 if labels[d] else 0.0) - p[d]
        w = w + lr * (g / n)

    tab = pa.table({"text": pa.array(texts),
                    "y": pa.array(labels)})

    def mask(b):
        return np.asarray(b.column("y").combine_chunks()
                          .to_numpy(zero_copy_only=False), bool)

    for nb in (1, 5):
        ds = rd.from_arrow(tab).repartition(nb)
        got = logreg_fit_hashed(ds, "text", mask, n_buckets=B,
                                n_iter=it, lr=lr, batch_size=17)
        assert np.allclose(got, w, atol=1e-12)
    # the learned weights actually separate: every pos-vocab unigram
    # bucket outweighs every neg-vocab unigram bucket
    pos_f = {_href(t, B) for t in pos_vocab}
    neg_f = {_href(t, B) for t in neg_vocab}
    assert min(w[list(pos_f)]) > max(w[list(neg_f)])


# ---------------------------------------------------------------------------
# Gumbel-top-k resampling / global top-k
# ---------------------------------------------------------------------------


def test_global_top_k_matches_sort():
    import ray.data as rd

    from webval.rank import global_top_k

    rng = np.random.default_rng(21)
    v = rng.standard_normal(5000)
    tab = pa.table({"id": pa.array(range(5000), pa.int64()),
                    "v": pa.array(v, pa.float64())})
    want = set(np.argsort(v)[-50:].tolist())
    for nb in (1, 8):
        ds = rd.from_arrow(tab).repartition(nb)
        got = global_top_k(ds, "v", 50, batch_size=333)
        assert set(got.column("id").to_pylist()) == want
    with pytest.raises(Exception, match="nulls"):
        global_top_k(rd.from_arrow(pa.table({
            "id": pa.array([1], pa.int64()),
            "v": pa.array([None], pa.float64())})), "v", 5)


def test_gumbel_topk_sample_matches_brute_force():
    import ray.data as rd

    from webval.pipelines import gumbel_topk_sample

    rng = np.random.default_rng(23)
    n = 2000
    logit = rng.standard_normal(n) * 2
    ids = np.arange(n, dtype=np.int64)
    u = (((ids.astype(np.uint64) * np.uint64(2246822519))
          % np.uint64(2**32)).astype(np.float64) + 0.5) / 2**32
    g = logit - np.log(-np.log(u))
    want = set(ids[np.argsort(g)[-64:]].tolist())

    tab = pa.table({"id": pa.array(ids), "lg": pa.array(logit)})
    for nb in (1, 6):
        got = gumbel_topk_sample(
            rd.from_arrow(tab).repartition(nb), "id", "lg", 64,
            min_gap=1e-12)
        assert set(got.column("id").to_pylist()) == want
    # a tie inside min_gap is rejected loudly, not silently broken
    tab2 = pa.table({"id": pa.array([0, 1, 2], pa.int64()),
                     "lg": pa.array([0.0, 0.0, 0.0])})
    # force identical keys: same logit AND same hash-uniform is impossible
    # with distinct ids, so use an absurdly large min_gap instead
    with pytest.raises(Exception, match="k-boundary gap"):
        gumbel_topk_sample(rd.from_arrow(tab2), "id", "lg", 2,
                           min_gap=1e9)


def test_gumbel_sample_is_biased_toward_high_logits():
    import ray.data as rd

    from webval.pipelines import gumbel_topk_sample

    # two populations with logit gap 4: the high-logit half must dominate
    # the sample (deterministic — this pins the SIGN convention of the key)
    n = 1000
    logit = np.where(np.arange(n) < n // 2, 2.0, -2.0)
    tab = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                    "lg": pa.array(logit)})
    got = gumbel_topk_sample(rd.from_arrow(tab), "id", "lg", 100)
    n_high = sum(1 for i in got.column("id").to_pylist() if i < n // 2)
    assert n_high >= 90


# ---------------------------------------------------------------------------
# directional containment
# ---------------------------------------------------------------------------


def test_ngram_containment_direction():
    import ray.data as rd

    from webval.dedup import ngram_all_pairs

    long = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest until the morning light")
    quote = "jumps over the lazy dog and keeps running"
    other = "completely unrelated text about database engines and rays"
    tab = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([long, quote, other])})
    out = pa.concat_tables(
        ngram_all_pairs(rd.from_arrow(tab), "doc_id", "text",
                        threshold=0.5, metric="containment",
                        score_col="overlap")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    rows = {(a, b): (o, ca, cb)
            for a, b, o, ca, cb in zip(out.column("id_a").to_pylist(),
                                       out.column("id_b").to_pylist(),
                                       out.column("overlap").to_pylist(),
                                       out.column("cont_a").to_pylist(),
                                       out.column("cont_b").to_pylist())}
    assert set(rows) == {(1, 2)}
    o, ca, cb = rows[(1, 2)]
    # the quote (doc 2, the B side) is FULLY contained in doc 1; doc 1 is
    # only partially contained in the quote — direction must show
    assert cb == 1.0 and ca < 1.0 and o == 1.0


# ---------------------------------------------------------------------------
# zero-row inputs (empty datasets yield ZERO blocks — r3s4 finding)
# ---------------------------------------------------------------------------


def test_new_operators_on_empty_inputs():
    import ray.data as rd

    from webval.dedup import cdc_chunk_stats, semdedup_prune
    from webval.pipelines import assign_split_grouped, gumbel_topk_sample
    from webval.textstats import dsir_importance, logreg_fit_hashed

    empty_docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string())}))
    empty_vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "emb": pa.array([], pa.list_(pa.float32()))}))

    def mask(t):
        import pyarrow.compute as pc
        return np.asarray(pc.equal(t.column("lang").combine_chunks(),
                                   "en").to_numpy(zero_copy_only=False),
                          bool)

    def rows(ds):
        return sum(b.num_rows for b in
                   ds.iter_batches(batch_format="pyarrow"))

    assert rows(dsir_importance(empty_docs, "doc_id", "text", mask)) == 0
    assert rows(cdc_chunk_stats(empty_docs, "lang", "text")) == 0
    assert rows(semdedup_prune(empty_vecs, "vec_id", "emb",
                               np.eye(2, 4))) == 0
    assert rows(assign_split_grouped(rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "k": pa.array([], pa.string())})), "id", "k")) == 0
    top = gumbel_topk_sample(rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "lg": pa.array([], pa.float64())})), "id", "lg", 5)
    assert top.num_rows == 0 and "id" in top.column_names
    with pytest.raises(ValueError, match="empty dataset"):
        logreg_fit_hashed(empty_docs, "text", mask)
