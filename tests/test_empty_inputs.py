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
