"""Round-5 items: the exact-oracle gate (VERDICT r4 wrong-1) — fused
driver-side oracles must be SKIPPED above EXACT_ORACLE_MAX_ROWS, with the
distributed production path alone producing the (identical) output."""

import pyarrow as pa
import pytest

import webval.queries as q

SF = "/root/testdata/sf0.001"


def _rows(t: pa.Table) -> list:
    return sorted(map(tuple, zip(*(t.column(c).to_pylist()
                                   for c in sorted(t.column_names)))))


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_oracle_gated(monkeypatch):
    want = _rows(q.q_grouped_quantiles(SF))
    # gate forced closed: the pandas exact-rank oracle must never read
    monkeypatch.setattr(q, "EXACT_ORACLE_MAX_ROWS", -1)
    import pyarrow.parquet as pq_mod

    def boom(*a, **k):
        raise AssertionError("exact oracle ran despite the gate")

    monkeypatch.setattr(pq_mod, "read_table", boom)
    got = _rows(q.q_grouped_quantiles(SF))
    assert got == want and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_pca_oracle_gated(monkeypatch):
    want = _rows(q.q_pca_embeddings(SF))
    monkeypatch.setattr(q, "EXACT_ORACLE_MAX_ROWS", -1)
    import webval.clustering as cl

    def boom(*a, **k):
        raise AssertionError("pca exact oracle ran despite the gate")

    # the oracle branch (and only it) projects the full table + stacks on
    # the driver; production output is the streaming-fit model covariance
    monkeypatch.setattr(cl, "pca_transform", boom)
    got = _rows(q.q_pca_embeddings(SF))
    assert got == want and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_link_components_oracle_gated(monkeypatch):
    want = _rows(q.q_link_components(SF))
    monkeypatch.setattr(q, "EXACT_ORACLE_MAX_ROWS", -1)
    import ray.data

    def boom(*a, **k):
        raise AssertionError("driver union-find ran despite the gate")

    # the union-find oracle is the only to_pandas in this query; the size
    # distribution itself flows through two count exchanges
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    got = _rows(q.q_link_components(SF))
    assert got == want and len(got) > 0


def test_gate_threshold_semantics():
    assert q.exact_oracle_enabled(q.EXACT_ORACLE_MAX_ROWS)
    assert not q.exact_oracle_enabled(q.EXACT_ORACLE_MAX_ROWS + 1)


@pytest.mark.usefixtures("ray_session")
def test_partition_pruned_read_query():
    """VERDICT r4 next-5: the hive-partitioned read must (a) admit only the
    selected partitions' files, (b) agree with an unpartitioned scan of the
    same fixture on counts, and (c) report file counts matching the
    partition directories' real content (the query self-asserts b/c; this
    exercises them plus the output shape)."""
    import pyarrow.parquet as pq

    t = q.q_partition_pruned_read(SF)
    assert t.column_names == ["lang", "n_docs", "sum_chars", "n_files"]
    assert t.column("lang").to_pylist() == ["de", "fr"]
    pages, _ = q.ensure_synth(SF)
    full = pq.read_table(pages, columns=["lang"])
    import pyarrow.compute as pc
    for i, lang in enumerate(("de", "fr")):
        want = pc.sum(pc.equal(full.column("lang"), lang)).as_py()
        assert t.column("n_docs")[i].as_py() == want
    assert all(v > 0 for v in t.column("n_files").to_pylist())


def test_no_module_level_definition_shadowing():
    """r4s9 / r5s recurrence guard: a same-named def appended to a module
    silently SHADOWS the original (q_fd_violations lost the multi-lang-host
    audit for a round).  Pin: no module in webval/ (nor bench/__ray_entry__)
    defines the same top-level function/class twice, and the query registry
    holds no duplicate keys (a dup key makes the dict literal drop the
    first entry with no diagnostic)."""
    import ast
    import collections
    import glob
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "webval", "*.py")))
    files += [os.path.join(root, "bench.py"),
              os.path.join(root, "__ray_entry__.py")]
    dups = []
    for f in files:
        with open(f) as fh:
            tree = ast.parse(fh.read())
        names = collections.Counter(
            n.name for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef)))
        dups += [f"{os.path.basename(f)}:{n}" for n, c in names.items()
                 if c > 1]
    assert dups == [], f"shadowed top-level definitions: {dups}"

    with open(os.path.join(root, "webval", "queries.py")) as fh:
        src = fh.read()
    keys = re.findall(r'^\s{4}"([a-z0-9_]+)":\s*\(', src, re.M)
    dup_keys = [k for k, c in collections.Counter(keys).items() if c > 1]
    assert dup_keys == [], f"duplicate registry keys: {dup_keys}"


def test_fd_multi_lang_hosts_registered_and_distinct():
    """Both FD surfaces stay live after the rename: the host-level audit
    (n_langs counts) and the row-level repair list (expected_rhs)."""
    reg = q.QUERIES
    assert "fd_multi_lang_hosts" in reg and "fd_violations" in reg
    assert reg["fd_multi_lang_hosts"][0] is not reg["fd_violations"][0]
    assert "n_langs" in reg["fd_multi_lang_hosts"][1]
    assert "expected_rhs" in reg["fd_violations"][1]
