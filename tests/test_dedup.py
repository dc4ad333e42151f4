"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — planted duplicates with known structure."""

import numpy as np
import pyarrow as pa
import pytest

from webval.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_dedup,
    ngram_jaccard,
    simhash_dup_pairs,
)

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def _doc(i: int, seed: int) -> str:
    rng = np.random.default_rng(seed + i)
    return " ".join(rng.choice(WORDS, size=40))


@pytest.fixture(scope="module")
def docs_table():
    """60 base docs; ids 100..104 are exact dups of 0..4; ids 200..204 are
    near-dups of 0..4 (one word changed); id 300 is a null."""
    ids, texts = [], []
    for i in range(60):
        ids.append(i)
        texts.append(_doc(i, seed=1000))
    for j in range(5):
        ids.append(100 + j)
        texts.append(texts[j])
    for j in range(5):
        ids.append(200 + j)
        words = texts[j].split()
        words[20] = "zulu"
        texts.append(" ".join(words))
    ids.append(300)
    texts.append(None)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.large_string())})


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup(docs_table):
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    kept = exact_dedup(ds, "doc_id").take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    # 71 rows - 5 exact dups = 66 kept (near-dups + null survive exact dedup)
    assert len(kept_ids) == 66
    assert all(100 + j not in kept_ids for j in range(5))
    assert all(j in kept_ids for j in range(5))
    assert 300 in kept_ids

    groups = exact_dup_groups(ds, "doc_id").take_all()
    assert len(groups) == 5
    assert sorted(g["keeper_id"] for g in groups) == [0, 1, 2, 3, 4]
    assert all(g["n_copies"] == 2 for g in groups)


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_finds_near_dups(docs_table):
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    clusters = minhash_dedup(ds, "doc_id", jaccard_threshold=0.6,
                             concurrency=2).take_all()
    by_id = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for j in range(5):
        # exact dup and near dup land in the base doc's cluster
        assert by_id.get(100 + j) == j, (j, by_id)
        assert by_id.get(200 + j) == j, (j, by_id)
    # distinct random docs must not cluster together
    base_ids = [i for i in by_id if i < 60]
    assert all(by_id[i] == i or by_id[i] in (i,) for i in base_ids)


@pytest.mark.usefixtures("ray_session")
def test_minhash_dedup_distributed_components(docs_table):
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    clusters = minhash_dedup(ds, "doc_id", jaccard_threshold=0.6,
                             concurrency=2, components="distributed",
                             ).take_all()
    by_id = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for j in range(5):
        assert by_id.get(100 + j) == j
        assert by_id.get(200 + j) == j
        assert by_id.get(j) == j  # cluster root labels itself


@pytest.mark.usefixtures("ray_session")
def test_minhash_auto_selects_distributed_above_pair_cap(docs_table):
    """components="auto" with a tiny driver_max_pairs must route through the
    distributed path (no driver take_all) and produce the same clusters as
    the driver path."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    want = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
        components="driver").take_all())
    got = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
        components="auto", driver_max_pairs=1).take_all())
    # distributed output includes cluster roots labeling themselves; driver
    # union-find does too (uf.parent includes roots) — sets must be equal
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_distributed_verify_filters_low_jaccard(docs_table):
    """verify_pairs_distributed must REJECT candidates below the threshold:
    at 0.99 only exact dups survive; near-dups (one word changed) are LSH
    candidates but fail exact-Jaccard verification."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    clusters = minhash_dedup(ds, "doc_id", jaccard_threshold=0.99,
                             concurrency=2, components="distributed",
                             ).take_all()
    by_id = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for j in range(5):
        assert by_id.get(100 + j) == j          # exact dup: jaccard 1.0
        assert by_id.get(200 + j, None) != j    # near dup: below 0.99


def test_ngram_jaccard():
    a = _doc(1, 1000)
    words = a.split()
    words[5] = "changed"
    b = " ".join(words)
    assert ngram_jaccard(a, a) == 1.0
    assert 0.6 < ngram_jaccard(a, b) < 1.0
    assert ngram_jaccard(a, _doc(2, 1000)) < 0.2


def test_simhash_batch_matches_reference():
    """_simhash_batch (vectorized reduceat) must equal simhash64 per doc."""
    from webval.dedup import _simhash_batch, simhash64
    from webval.textstats import rolling_hashes

    rng = np.random.default_rng(9)
    sets = [np.unique(rolling_hashes(_doc(i, 77), 8)) for i in range(30)]
    sets.append(np.empty(0, dtype=np.uint64))
    sets.append(np.unique(rolling_hashes("tiny bit of text", 4)))
    # force multi-chunk path
    import webval.dedup as dd
    got = _simhash_batch(sets)
    want = np.array([simhash64(s) for s in sets], dtype=np.uint64)
    assert (got == want).all()
    old = dd._SIMHASH_CHUNK
    try:
        dd._SIMHASH_CHUNK = 64  # several chunks
        got2 = _simhash_batch(sets)
    finally:
        dd._SIMHASH_CHUNK = old
    assert (got2 == want).all()


def test_within_group_pairs_matches_bruteforce():
    from webval.dedup import _within_group_pairs

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(0, 200))
        k1 = rng.integers(0, 5, n)
        k2 = rng.integers(0, 4, n)
        ids = rng.integers(0, 50, n)
        mb = int(rng.integers(2, 8))
        pa_, pb_ = _within_group_pairs((k1, k2), ids, mb)
        got = {(int(k1[a]), int(k2[a]), int(ids[a]), int(ids[b]))
               for a, b in zip(pa_, pb_)}
        # brute force with same truncation semantics (ids sorted, deduped,
        # first max_bucket kept)
        want = set()
        for g1 in np.unique(k1):
            for g2 in np.unique(k2):
                sel = sorted({int(i) for i, a, b in zip(ids, k1, k2)
                              if a == g1 and b == g2})[:mb]
                for x in range(len(sel)):
                    for y in range(x + 1, len(sel)):
                        want.add((int(g1), int(g2), sel[x], sel[y]))
        assert got == want, trial


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs(docs_table):
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    pairs = simhash_dup_pairs(ds, "doc_id", max_hamming=6, concurrency=2).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    for j in range(5):
        assert (j, 100 + j) in got  # exact dups: hamming 0
    # no pairing between two distinct base docs
    assert not any(a < 60 and b < 60 for a, b in got)


@pytest.mark.usefixtures("ray_session")
def test_embedding_dup_pairs():
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 32)).astype(np.float32)
    vecs = np.vstack([base, base[:5] + rng.standard_normal((5, 32)).astype(np.float32) * 0.01])
    t = pa.table({"vec_id": pa.array(range(45), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(3)
    pairs = embedding_dup_pairs(ds, "vec_id", cosine_threshold=0.98,
                                n_planes=6, n_tables=6).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    found = sum((j, 40 + j) in got for j in range(5))
    assert found >= 4, got  # LSH recall: at least 4/5 planted pairs
    assert all(b >= 40 for a, b in got)  # no false positives among base vecs


@pytest.mark.usefixtures("ray_session")
def test_minhash_task_mode_equals_actor_mode(docs_table):
    """concurrency=None (stateless tasks) must produce byte-identical
    clusters to the actor-pool shape — both paths share MinHasher."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    task = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6).take_all())
    pool = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6, concurrency=2).take_all())
    assert task == pool and len(task) > 0


@pytest.mark.usefixtures("ray_session")
def test_minhash_band_chunked_equals_single_pass(docs_table):
    """bands_per_pass chunking (the 100-TB shuffle-volume shape) must emit
    byte-identical clusters: sliced permutation params + global band salt
    make each chunk's band hashes equal the unchunked run's slice, and the
    pair set is a union over bands."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    single = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6).take_all())
    for bpp in (4, 5, 16):  # even split, uneven tail, degenerate = single
        chunked = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
            ds, "doc_id", jaccard_threshold=0.6,
            bands_per_pass=bpp).take_all())
        assert chunked == single and len(single) > 0, bpp
    # distributed-components path with chunking (the rehearsal shape)
    dist = sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
        ds, "doc_id", jaccard_threshold=0.6, bands_per_pass=4,
        components="distributed").take_all())
    assert dist == single


def test_minhasher_band_slice_matches_full():
    """A MinHasher built for bands [off, off+n) of a 16-band space must emit
    the same (id, band_hash) rows as the corresponding slice of the full
    16-band hasher — pure-python check, no Ray."""
    from webval.dedup import MinHasher

    texts = [_doc(i, seed=77) for i in range(8)]
    t = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": pa.array(texts, pa.large_string())})
    full = MinHasher("doc_id", bands=16, rows_per_band=8)(t)
    got_rows = set()
    for off, n in ((0, 4), (4, 4), (8, 4), (12, 4)):
        part = MinHasher("doc_id", bands=n, rows_per_band=8,
                         band_offset=off, total_bands=16)(t)
        got_rows.update(zip(part.column("doc_id").to_pylist(),
                            part.column("band_hash").to_pylist()))
    want_rows = set(zip(full.column("doc_id").to_pylist(),
                        full.column("band_hash").to_pylist()))
    assert got_rows == want_rows and len(want_rows) == 8 * 16


@pytest.mark.usefixtures("ray_session")
def test_ngram_all_pairs_matches_pairwise(docs_table):
    """Inverted-index all-pairs scores must equal direct per-pair
    ngram_jaccard, and the O(n²) guard must fire above max_corpus."""
    import ray.data as rd

    from webval.dedup import ngram_all_pairs

    ds = rd.from_arrow(docs_table).repartition(4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_all_pairs(ds, "doc_id", threshold=0.6).take_all()}
    texts = {i: t for i, t in zip(docs_table.column("doc_id").to_pylist(),
                                  docs_table.column("text").to_pylist())}
    ids = sorted(i for i, t in texts.items() if t is not None and len(t) >= 8)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            j = ngram_jaccard(texts[ids[x]], texts[ids[y]])
            if j >= 0.6:
                want[(ids[x], ids[y])] = j
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12, k
    # exact dups score 1.0; near dups in (0.6, 1.0)
    assert all(got[(j, 100 + j)] == 1.0 for j in range(5))
    with pytest.raises(ValueError, match="max_corpus"):
        ngram_all_pairs(ds, "doc_id", max_corpus=5).take_all()


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_keep_cols_excluding_id(docs_table):
    """Review r3: keep_cols omitting the id column must still dedup (the
    combiner has to carry the id internally for keeper selection)."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    kept = exact_dedup(ds, "doc_id", keep_cols=["text"]).take_all()
    texts = [r["text"] for r in kept]
    assert len(kept) == 66  # 71 - 5 exact dups (null kept)
    non_null = [t for t in texts if t is not None]
    assert len(set(non_null)) == len(non_null)


def test_dup_substring_stats_brute_force(ray_session):
    import ray.data as rd

    from webval.dedup import dup_substring_stats

    W = 8
    shared = "SHARED-BOILERPLATE-FOOTER-TEXT"
    texts = [
        "unique text one with no overlap at all %d" % 1 + shared,
        "a different body entirely %d " % 2 + shared,
        "totally disjoint content here without the footer",
        "short",                      # < window: zero shingles
        None,                         # null text
        "unique text one with no overlap at all 1" + shared,  # exact dup of 0
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = dup_substring_stats(ds, "doc_id", "text", window=W, min_docs=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute-force oracle on distinct char shingles
    sh = [set(t[i:i + W] for i in range(len(t) - W + 1)) if t else set()
          for t in ["" if x is None else x for x in texts]]
    from collections import Counter
    docs_per = Counter(g for s in sh for g in s)
    for i in range(len(texts)):
        want_total = len(sh[i])
        want_dup = sum(1 for g in sh[i] if docs_per[g] >= 2)
        assert got["n_shingles"][i] == want_total, i
        assert got["n_dup_shingles"][i] == want_dup, i
        assert got["has_dup"][i] == (want_dup > 0), i
    # sanity: the shared footer makes docs 0,1,5 dup-flagged; 2,3,4 clean
    assert list(got["has_dup"]) == [True, True, False, False, False, True]


def test_incremental_dedup_across_runs(ray_session, tmp_path):
    import ray.data as rd

    from webval.dedup import build_dedup_index, incremental_dedup

    idx = str(tmp_path / "fpidx")

    def docs(ids, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())}))

    # run 0: index the day-0 corpus
    build_dedup_index(docs([1, 2], ["alpha body", "beta body"]), idx)

    # run 1: one repeat of day-0, one internal dup pair, one null, two new
    run1 = docs([10, 11, 12, 13, 14],
                ["alpha body",          # already indexed -> dropped
                 "gamma body", "gamma body",  # internal dup -> keep id 11
                 None,                  # null text -> dropped
                 "delta body"])         # new
    got1 = incremental_dedup(run1, "doc_id", idx, append=True).to_pandas()
    assert sorted(got1["doc_id"]) == [11, 14]

    # run 2: everything from run 1 again -> all dropped (state persisted);
    # one genuinely new doc survives
    run2 = docs([20, 21, 22], ["gamma body", "delta body", "epsilon body"])
    got2 = incremental_dedup(run2, "doc_id", idx, append=True).to_pandas()
    assert sorted(got2["doc_id"]) == [22]

    # normalization: case/whitespace variants hit the same fingerprint
    run3 = docs([30, 31], ["  ALPHA   body ", "zeta body"])
    got3 = incremental_dedup(run3, "doc_id", idx, append=False).to_pandas()
    assert sorted(got3["doc_id"]) == [31]

    # append=False left no trace: same increment still survives
    got3b = incremental_dedup(run3, "doc_id", idx, append=False).to_pandas()
    assert sorted(got3b["doc_id"]) == [31]


def test_shingle_blobs_batch_matches_per_row_oracle():
    """Vectorized blob builder output is byte-identical to the per-row
    np.unique(rolling_hashes(t, window)).tobytes() oracle, nulls where the
    oracle returns None."""
    import numpy as np
    import pyarrow as pa

    from webval.dedup import shingle_blobs_batch
    from webval.textstats import rolling_hashes

    window = 8
    texts = ["the quick brown fox jumps over the lazy dog",
             None, "", "short", "x" * 7, "x" * 8,
             "héllo wörld çafé and some more multibyte ｔｅｘｔ",
             "repeat repeat repeat repeat"]
    sub = pa.table({"text": pa.array(texts, pa.string())})
    got = shingle_blobs_batch("text", window)(sub)
    assert got.type == pa.large_binary()
    for t, g in zip(texts, got.to_pylist()):
        if t is None or len(t) < window:
            assert g is None, repr(t)
        else:
            want = np.unique(rolling_hashes(t, window)).tobytes()
            assert g == want, repr(t)


def test_unit_vec_blobs_batch_matches_per_row_oracle():
    import numpy as np
    import pyarrow as pa

    from webval.dedup import unit_vec_blobs_batch

    vecs = [[1.0, 2.0, 2.0], None, [0.0, 0.0, 0.0], [3.0, -4.0],
            [0.5] * 16]
    sub = pa.table({"emb": pa.array(vecs, pa.list_(pa.float32()))})
    got = unit_vec_blobs_batch("emb")(sub)
    for v, g in zip(vecs, got.to_pylist()):
        if v is None:
            assert g is None
            continue
        u = np.asarray(v, dtype=np.float32)
        nrm = float(np.linalg.norm(u))
        want = (u / (nrm or 1.0)).astype(np.float32)
        np.testing.assert_allclose(np.frombuffer(g, np.float32), want,
                                   rtol=1e-6, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_ngram_overlap_detects_containment(docs_table):
    """metric="overlap": a short doc embedded verbatim in a longer one
    scores 1.0 even where its Jaccard is diluted far below threshold."""
    import ray.data as rd

    import numpy as np
    from webval.dedup import ngram_all_pairs
    from webval.textstats import rolling_hashes

    short = "the quick brown fox jumps over the lazy dog"
    long = ("PREFIX PADDING " * 20) + short + (" SUFFIX PADDING" * 20)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([short, long])})
    ds = rd.from_arrow(t)
    ov = {(r["id_a"], r["id_b"]): r["overlap"]
          for r in ngram_all_pairs(ds, "doc_id", threshold=0.9,
                                   metric="overlap",
                                   score_col="overlap").take_all()}
    assert ov[(1, 2)] == 1.0
    # the same pair's jaccard is far below 0.9 -> jaccard metric misses it
    jc = ngram_all_pairs(ds, "doc_id", threshold=0.9).take_all()
    assert not jc
    # oracle: overlap == |A∩B| / min sizes computed directly
    sa = np.unique(rolling_hashes(short, 8))
    sb = np.unique(rolling_hashes(long, 8))
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    assert inter / min(len(sa), len(sb)) == 1.0


@pytest.mark.usefixtures("ray_session")
def test_dense_cap_chain_pairs_same_components():
    """r5 scale fix: a dense bucket (many signature-identical docs) must
    emit a LINEAR spanning chain, not C(k,2) pairs, and minhash clusters
    must come out identical to the all-pairs path."""
    import ray.data as rd

    from webval.dedup import _within_group_pairs, minhash_dedup

    # unit: one 40-doc group, dense_cap=16 -> 39 chain pairs, all-pairs -> 780
    keys = (np.zeros(40, np.int64),)
    ids = np.arange(40, dtype=np.int64)
    a, b = _within_group_pairs(keys, ids, 256, dense_cap=16)
    assert len(a) == 39 and (b == a + 1).all()
    a2, b2 = _within_group_pairs(keys, ids, 256, dense_cap=None)
    assert len(a2) == 780

    # end-to-end: 30 identical docs + 2 planted near-dup pairs; chain and
    # all-pairs paths must produce the same cluster assignment
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (101, "alpha beta gamma delta epsilon zeta eta theta iotaX"),
             (200, "one two three four five six seven eight nine ten"),
             (300, "completely unrelated words nothing shared here at all")]
    t = pa.table({"page_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows])})
    ds = rd.from_arrow(t).repartition(4)

    def clusters(dense_cap):
        out = minhash_dedup(ds, "page_id", jaccard_threshold=0.7,
                            components="driver", dense_cap=dense_cap)
        return {(r["page_id"], r["cluster_id"]) for r in out.take_all()}

    got_chain, got_all = clusters(16), clusters(None)
    assert got_chain == got_all
    assert {p for p, _ in got_chain} >= set(range(30))


def test_bottomk_scorer_exact_when_sets_complete():
    """Both sketches below k ⇒ the bottom-k scorer IS exact Jaccard."""
    from webval.dedup import _jaccard_bottomk, _jaccard_of_blobs

    rng = np.random.default_rng(7)
    score = _jaccard_bottomk(4096)
    for _ in range(20):
        sa = np.unique(rng.integers(0, 1 << 62, 300).astype(np.uint64))
        sb = np.unique(np.concatenate(
            [sa[: rng.integers(0, len(sa))],
             rng.integers(0, 1 << 62, 200).astype(np.uint64)]))
        sb.sort()
        assert score(sa.tobytes(), sb.tobytes()) == \
            _jaccard_of_blobs(sa.tobytes(), sb.tobytes())


def test_bottomk_estimator_accuracy_and_exact_dups():
    """Truncated sketches: exact duplicates score exactly 1.0 at any k;
    known-overlap large sets estimate within ~4σ of true Jaccard."""
    from webval.dedup import _jaccard_bottomk

    k = 64
    score = _jaccard_bottomk(k)
    rng = np.random.default_rng(11)
    big = np.unique(rng.integers(0, 1 << 62, 5000).astype(np.uint64))
    assert score(big[:k].tobytes(), big[:k].tobytes()) == 1.0
    # two sets sharing 80% of a 5000-element universe: J = .8/(2-.8)... build
    # explicitly: |A|=|B|=4000, |A∩B|=3000 -> J = 3000/5000 = 0.6
    big = rng.permutation(big)  # shared/only must interleave in hash order
    shared, only = big[:3000], big[3000:5000]
    a = np.sort(np.concatenate([shared, only[:1000]]))
    b = np.sort(np.concatenate([shared, only[1000:2000]]))
    est = score(a[:k].tobytes(), b[:k].tobytes())
    true_j = 3000 / 5000
    sigma = (true_j * (1 - true_j) / k) ** 0.5
    assert abs(est - true_j) <= 4 * sigma, (est, true_j, sigma)


def test_shingle_blobs_bottomk_is_per_row_prefix(docs_table):
    """The k-truncated blob builder must emit exactly the first k hashes of
    each row's full sorted-unique blob (pure slice, nulls preserved)."""
    from webval.dedup import shingle_blobs_batch

    k = 16
    full = shingle_blobs_batch("text", 8)(docs_table)
    trim = shingle_blobs_batch("text", 8, k)(docs_table)
    assert len(full) == len(trim) == docs_table.num_rows
    for fb, tb in zip(full.to_pylist(), trim.to_pylist()):
        if fb is None:
            assert tb is None
            continue
        fa = np.frombuffer(fb, np.uint64)
        assert np.array_equal(np.frombuffer(tb, np.uint64), fa[:k])


@pytest.mark.usefixtures("ray_session")
def test_minhash_verify_k_matches_exact_verify(docs_table):
    """verify_k large enough to hold every doc's shingle set must reproduce
    the exact-verify clusters bit-for-bit on BOTH components paths, and a
    truncated k=64 sketch still recovers every planted exact/near dup on
    this fixture (J >= 0.88 vs threshold 0.6 — 4 sigma of margin)."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)

    def run(**kw):
        return sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
            ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
            **kw).take_all())

    want = run(components="driver")
    assert run(components="driver", verify_k=4096) == want
    assert run(components="distributed", verify_k=4096) == want
    for got in (run(components="driver", verify_k=64),
                run(components="distributed", verify_k=64)):
        by_id = dict(got)
        for j in range(5):
            assert by_id.get(100 + j) == j
            assert by_id.get(200 + j) == j


def test_fold_sig_rows_separates_signatures():
    """Equal signature rows fold to equal fingerprints; differing rows
    (even in one position) fold apart."""
    from webval.dedup import _fold_sig_rows

    rng = np.random.default_rng(5)
    sigs = rng.integers(0, 1 << 62, (50, 128)).astype(np.uint64)
    fp = _fold_sig_rows(sigs)
    assert (_fold_sig_rows(sigs.copy()) == fp).all()
    tweaked = sigs.copy()
    tweaked[:, 77] += np.uint64(1)
    assert (_fold_sig_rows(tweaked) != fp).all()
    assert len(np.unique(fp)) == 50  # no accidental fold collisions here


@pytest.mark.usefixtures("ray_session")
def test_minhash_fp_accept_matches_exact_verify(docs_table):
    """Two-tier verify (fingerprint accept + residual shingle verify) must
    reproduce the single-tier clusters: exact dups accept in tier 1
    (identical signatures), near dups differ in some permutation and take
    the residual shingle path."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)

    def run(**kw):
        return sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
            ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
            components="distributed", **kw).take_all())

    want = run()
    assert run(fp_accept=True) == want
    assert run(fp_accept=True, verify_k=4096) == want
    assert run(fp_accept=True, bands_per_pass=4, verify_k=64) == want


@pytest.mark.usefixtures("ray_session")
def test_minhash_verify_chunks_matches_single_pass(docs_table):
    """Chunked verify (sequential hash-chunk passes over the pair set,
    the r5 inflight-volume bound) must reproduce the one-pass clusters —
    verification is per-pair, so the union of chunk outputs is exactly
    the single-pass verified set.  Covers both the plain-verify path and
    the fp_accept residual leg, with and without sketches."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)

    def run(**kw):
        return sorted((r["doc_id"], r["cluster_id"]) for r in minhash_dedup(
            ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
            components="distributed", **kw).take_all())

    want = run()
    assert run(verify_chunks=3) == want
    assert run(verify_chunks=3, verify_k=64) == run(verify_k=64)
    assert run(fp_accept=True, verify_chunks=3) == want
    assert run(fp_accept=True, bands_per_pass=4, verify_k=64,
               verify_chunks=3) == want


@pytest.mark.usefixtures("ray_session")
def test_minhash_stage_counts(docs_table):
    """stage_counts receives consistent distributed-path evidence:
    accepted + residual = candidates, verified ≤ candidates, and the
    verified count matches the verified pair set the clusters are built
    from."""
    import ray.data as rd

    ds = rd.from_arrow(docs_table).repartition(4)
    counts: dict = {}
    minhash_dedup(ds, "doc_id", jaccard_threshold=0.6, concurrency=2,
                  components="distributed", fp_accept=True,
                  bands_per_pass=4, stage_counts=counts).take_all()
    assert set(counts) >= {"candidate_pairs", "accepted_pairs",
                           "residual_pairs", "verified_pairs"}
    assert (counts["accepted_pairs"] + counts["residual_pairs"]
            == counts["candidate_pairs"])
    assert counts["verified_pairs"] <= counts["candidate_pairs"]
    assert counts["verified_pairs"] >= counts["accepted_pairs"]
