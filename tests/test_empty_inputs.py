"""Zero-row inputs must flow through every exchange-based operator without
schema loss or crashes (Ray Datasets lose schema easily on empty paths)."""

import pyarrow as pa
import pytest


def _empty_docs():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.large_string())}))


@pytest.mark.usefixtures("ray_session")
def test_dedup_ops_on_empty():
    from webval.dedup import (
        exact_dedup,
        exact_dup_groups,
        minhash_dedup,
        ngram_all_pairs,
        simhash_dup_pairs,
    )

    ds = _empty_docs()
    assert exact_dedup(ds, "doc_id").count() == 0
    assert exact_dup_groups(ds, "doc_id").count() == 0
    assert minhash_dedup(ds, "doc_id").count() == 0
    assert simhash_dup_pairs(ds, "doc_id").count() == 0
    assert ngram_all_pairs(ds, "doc_id").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_exchange_and_windows_on_empty():
    import ray.data as rd

    from webval.exchange import distinct_rows, grouped_count
    from webval.windows import sessionize

    ds = _empty_docs()
    assert grouped_count(ds, "text").count() == 0
    assert distinct_rows(ds, ["doc_id"]).count() == 0
    ev = rd.from_arrow(pa.table({"uid": pa.array([], pa.int64()),
                                 "ts": pa.array([], pa.int64())}))
    assert sessionize(ev, ts_col="ts", by="uid", gap_us=10).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_session4_ops_on_empty():
    import numpy as np
    import ray.data as rd

    from webval.clustering import standardize_fit, standardize_transform
    from webval.dedup import dup_substring_stats
    from webval.graph import link_degrees
    from webval.lm import fit_unigram_lm, score_unigram_lm
    from webval.pipelines import iqr_outliers, reconcile_aggregate
    from webval.relational import table_diff
    from webval.search import bm25_search
    from webval.textclean import frequent_ngrams
    from webval.windows import funnel_stages

    docs = _empty_docs()
    lm = fit_unigram_lm(docs, "text")
    assert lm.total_tokens == 0
    assert score_unigram_lm(docs, lm).count() == 0
    assert frequent_ngrams(docs, "text", n=2, min_count=1).count() == 0
    assert dup_substring_stats(docs, "doc_id", "text").count() == 0
    bm = bm25_search(docs, "doc_id", "text", "anything")
    assert bm.count() == 0
    assert set(bm.schema().names) == {"doc_id", "score"}  # OUTPUT schema kept

    ev = rd.from_arrow(pa.table({
        "u": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "typ": pa.array([], pa.string()),
        "v": pa.array([], pa.float64())}))
    assert funnel_stages(ev, "u", "ts", "typ", ["a", "b"]).count() == 0
    assert iqr_outliers(ev, "typ", "v").count() == 0

    model = standardize_fit(ev, ["v"])
    assert model["v"]["mean"] is None
    out = standardize_transform(ev, model)
    assert out.count() == 0

    links = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    assert link_degrees(links, "src", "dst").count() == 0

    kt = pa.table({"k": pa.array([], pa.int64()),
                   "v": pa.array([], pa.string())})
    assert table_diff(rd.from_arrow(kt), rd.from_arrow(kt),
                      "k", ["v"]).count() == 0

    rec = reconcile_aggregate(
        rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                "p": pa.array([], pa.float64())})),
        rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                "c": pa.array([], pa.float64())})),
        "k", "k", "p", "c")
    assert rec.to_pylist() == [{"n_parents": 0, "n_missing_child": 0,
                                "n_mismatched": 0, "n_matched": 0}]


@pytest.mark.usefixtures("ray_session")
def test_session5_ops_on_empty():
    import ray.data as rd

    from webval.aggregates import grouped_mode, pairwise_corr
    from webval.pipelines import assign_split
    from webval.textstats import vocab_overlap
    from webval.windows import (
        ordered_inversions,
        retention_cells,
        rolling_distinct_count,
        session_rollup,
    )

    ev = rd.from_arrow(pa.table({
        "uid": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "o": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64())}))
    assert ordered_inversions(ev, "uid", "o", "v", num_buckets=4).count() == 0
    assert session_rollup(ev, ts_col="ts", by="uid", gap_us=10,
                          num_buckets=4).count() == 0
    assert retention_cells(ev, key="uid", ts_col="ts",
                           num_buckets=4).count() == 0
    assert rolling_distinct_count(ev, key="uid", ts_col="ts",
                                  num_buckets=4).count() == 0
    assert grouped_mode(ev, "uid", "v", num_buckets=4).count() == 0
    corr = pairwise_corr(ev, [("o", "v")])
    assert corr.num_rows == 1 and corr.column("corr")[0].as_py() is None
    assert assign_split(ev, "uid").count() == 0

    docs = _empty_docs()
    assert vocab_overlap(docs, "doc_id", "text") == (0, 0, 0)


@pytest.mark.usefixtures("ray_session")
def test_round4_ops_on_empty():
    import ray.data as rd

    from webval.aggregates import grouped_higher_moments
    from webval.graph import reciprocity
    from webval.pipelines import k_anonymity_audit
    from webval.sketches import cms_of
    from webval.windows import grouped_ewma, interval_coverage

    ev = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "ts": pa.array([], pa.int64()),
                                 "x": pa.array([], pa.float64())}))
    assert grouped_higher_moments(ev, "k", "x").count() == 0
    assert interval_coverage(ev, "k", "ts", "x").count() == 0
    assert grouped_ewma(ev, "k", "ts", "x", alpha=0.3).count() == 0
    assert k_anonymity_audit(ev, ["k"], k=5).count() == 0
    assert k_anonymity_audit(ev, ["k"], k=5, sensitive="x").count() == 0
    rec = reciprocity(ev.map_batches(
        lambda t: t.rename_columns(["a", "b", "x"]),
        batch_format="pyarrow"), "a", "b").to_pydict()
    assert rec["n_edges"][0] == 0
    sk = cms_of(ev, "x")
    assert sk.n == 0


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_on_empty():
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs

    ev = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.string()),
                                 "blk": pa.array([], pa.string())}))
    out = fuzzy_pairs(ev, "id", "s", ["blk"], max_dist=2)
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_round4_session3_ops_on_empty():
    import ray.data as rd

    from webval.clustering import minmax_scale
    from webval.dedup import dup_share_by_group
    from webval.graph import degree_assortativity
    from webval.rank import grouped_trimmed_mean, rank_auc
    from webval.textstats import readability_stats
    from webval.windows import debounce_events, validity_intervals

    ev = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                 "ts": pa.array([], pa.timestamp("us")),
                                 "x": pa.array([], pa.float64()),
                                 "txt": pa.array([], pa.string())}))
    assert validity_intervals(ev, "k", "ts").count() == 0
    assert debounce_events(ev, "k", "ts", min_gap_us=1).count() == 0
    auc = rank_auc(ev, "k", "x", positive="y").to_pydict()
    assert auc["n_pos"][0] == 0 and auc["auc"][0] is None
    assert grouped_trimmed_mean(ev, "k", "x").count() == 0
    assert minmax_scale(ev, "k", "x").count() == 0
    assert readability_stats(ev, "k", "txt").count() == 0
    assert dup_share_by_group(ev, "k", "txt").count() == 0
    a = degree_assortativity(ev.map_batches(
        lambda t: t.rename_columns(["a", "b", "x", "txt"]),
        batch_format="pyarrow"), "a", "b").to_pydict()
    assert a["n_edges"][0] == 0 and a["assortativity"][0] is None


@pytest.mark.usefixtures("ray_session")
def test_round4_session3_wave2_on_empty():
    import ray.data as rd

    from webval.fuzzy import fuzzy_pairs
    from webval.multimodal import detect_media_type
    from webval.pipelines import allocate_budget
    from webval.rank import quantile_bin

    ev = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.string()),
                                 "m": pa.array([], pa.binary()),
                                 "v": pa.array([], pa.float64())}))
    assert detect_media_type(ev, "m").count() == 0
    assert quantile_bin(ev, "v", 4).count() == 0
    assert fuzzy_pairs(ev, "id", "s", ["s"], metric="jaro_winkler",
                       min_sim=0.5).count() == 0
    alloc = allocate_budget(ev, "s", 100)
    assert alloc.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_round4_session4_ops_on_empty():
    import ray.data as rd

    from webval.checks import null_cooccurrence
    from webval.lm import bigram_counts
    from webval.rank import calibration_bins
    from webval.similarity import quantization_error
    from webval.windows import interpolate_gaps, kaplan_meier, path_counts

    ev = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "v": pa.array([], pa.float64()),
        "s": pa.array([], pa.string()),
        "emb": pa.array([], pa.list_(pa.float32()))}))
    assert path_counts(ev, "k", "ts", "s", n=3).count() == 0
    assert interpolate_gaps(ev, "k", "ts", "v").count() == 0
    km = kaplan_meier(ev, "k", "ts", censor_gap_us=1)
    assert km.num_rows == 0
    assert km.column_names == ["t", "n_risk", "n_events", "survival"]
    cb = calibration_bins(ev, "v", "v", bins=10)
    assert cb.num_rows == 0
    nc = null_cooccurrence(ev, ["k", "v"])
    assert nc.num_rows in (0, 1)       # zero blocks bypass the map UDF
    qe = quantization_error(ev, "emb")
    assert qe.num_rows == 0
    assert bigram_counts(ev, "s").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_session6_ops_on_empty():
    import ray.data as rd

    from webval.graph import kcore
    from webval.rank import grouped_weighted_median, pareto_frontier
    from webval.similarity import jl_project
    from webval.textstats import type_token_stats
    from webval.windows import interarrival_stats, sequence_nll

    docs = rd.from_arrow(pa.table({
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.large_string())}))
    assert type_token_stats(docs, "lang", "text").count() == 0

    ev = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "state": pa.array([], pa.string())}))
    assert interarrival_stats(ev, "k", "ts").count() == 0
    trans = pa.table({"prev_state": pa.array([], pa.string()),
                      "state": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    assert sequence_nll(ev, "k", "ts", "state", trans,
                        n_states=0).count() == 0

    nums = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "v": pa.array([], pa.float64()),
        "w": pa.array([], pa.float64())}))
    assert grouped_weighted_median(nums, "g", "v", "w").num_rows == 0
    assert pareto_frontier(nums, "v", "w").num_rows == 0

    edges = rd.from_arrow(pa.table({
        "s": pa.array([], pa.int64()),
        "d": pa.array([], pa.int64())}))
    assert kcore(edges, "s", "d", k=2).count() == 0

    vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert jl_project(vecs, "embedding", dim_out=4).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_term_enrichment_on_empty():
    import ray.data as rd

    from webval.textstats import term_enrichment

    docs = rd.from_arrow(pa.table({
        "lang": pa.array([], pa.string()),
        "text": pa.array([], pa.large_string())}))
    out = term_enrichment(docs, "lang", "text")
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_session7_ops_on_empty():
    import ray.data as rd

    from webval.aggregates import simpson_slopes
    from webval.graph import resolve_pointers
    from webval.rank import grouped_mad
    from webval.textstats import chao1_richness

    nums = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "x": pa.array([], pa.float64()),
        "y": pa.array([], pa.float64())}))
    assert simpson_slopes(nums, "g", "x", "y").num_rows == 0
    assert grouped_mad(nums, "g", "x").count() == 0

    docs = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "text": pa.array([], pa.large_string())}))
    assert chao1_richness(docs, "g", "text").count() == 0

    m = rd.from_arrow(pa.table({
        "s": pa.array([], pa.int64()),
        "d": pa.array([], pa.int64())}))
    assert resolve_pointers(m, "s", "d").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_streak_hindex_on_empty():
    import ray.data as rd

    from webval.rank import grouped_hindex
    from webval.windows import longest_streak

    ev = rd.from_arrow(pa.table({
        "u": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert longest_streak(ev, "u", "ts").count() == 0

    nums = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "v": pa.array([], pa.float64())}))
    assert grouped_hindex(nums, "g", "v").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_concurrency_bigram_on_empty():
    import ray.data as rd

    from webval.textstats import char_bigram_entropy
    from webval.windows import max_concurrency

    iv = rd.from_arrow(pa.table({
        "g": pa.array([], pa.int64()),
        "s": pa.array([], pa.int64()),
        "e": pa.array([], pa.int64())}))
    assert max_concurrency(iv, "g", "s", "e").count() == 0

    docs = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()),
        "text": pa.array([], pa.large_string())}))
    assert char_bigram_entropy(docs, "g", "text").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_period_movers_on_empty():
    import ray.data as rd

    from webval.windows import period_movers

    iv = rd.from_arrow(pa.table({
        "u": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64())}))
    assert period_movers(iv, "u", "ts",
                         pa.scalar(0, pa.int64())).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_hour_entropy_on_empty():
    import ray.data as rd

    from webval.windows import hour_of_day_entropy

    ev = rd.from_arrow(pa.table({
        "u": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert hour_of_day_entropy(ev, "u", "ts").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_snm_pairs_on_empty():
    import ray.data as rd

    from webval.fuzzy import sorted_neighborhood_pairs

    ds = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                 "k": pa.array([], pa.string())}))
    assert sorted_neighborhood_pairs(ds, "id", "k").count() == 0


@pytest.mark.usefixtures("ray_session")
def test_session9_ops_on_empty():
    import numpy as np
    import ray.data as rd

    from webval.dedup import cluster_canonicals, duplication_weights
    from webval.graph import cocitation_pairs
    from webval.pipelines import concat_packing
    from webval.schema import key_candidate_audit
    from webval.search import rrf_fuse
    from webval.textstats import (
        pmi_collocations,
        script_mix_stats,
        vocab_growth,
    )
    from webval.windows import cusum_scores, decayed_counts

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.large_string())}))
    ev = rd.from_arrow(pa.table({
        "k": pa.array([], pa.string()),
        "t": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()),
        "ts": pa.array([], pa.timestamp("us"))}))
    edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))

    assert pmi_collocations(docs, "text").count() == 0
    assert vocab_growth(docs, "doc_id", "text",
                        checkpoints=[10]).count() == 0
    assert script_mix_stats(docs, "doc_id", "text").count() == 0
    assert duplication_weights(docs, "doc_id", "text").count() == 0
    assert cusum_scores(ev, "k", "t", "v").count() == 0
    assert decayed_counts(ev, "k", "ts", half_life_days=1.0,
                          as_of="2024-01-01").count() == 0
    assert cocitation_pairs(edges, "src", "dst", min_cocite=1).count() == 0
    assert concat_packing(docs.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"),
                            "tk": pa.array(np.zeros(t.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow"), "doc_id", "tk", 16).count() == 0
    assert rrf_fuse([rd.from_arrow(pa.table({
        "id": pa.array([], pa.string()),
        "rank": pa.array([], pa.int64())}))], "id").count() == 0
    canon = cluster_canonicals(
        rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                "cluster_id": pa.array([], pa.int64())})),
        rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                "q": pa.array([], pa.float64())})),
        "doc_id", score_col="q")
    assert canon.count() == 0
    audit = key_candidate_audit(docs, ["doc_id", "text"]).to_pandas()
    assert list(audit["n_rows"]) == [0, 0]
    assert list(audit["is_key"]) == [False, False]
