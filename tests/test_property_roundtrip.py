"""Property-based flattening invariants (SURVEY.md §5 'added rigor'):
random nested JSON documents -> flatten -> structural invariants hold and
children rejoin losslessly to their parents on the _link chain.  The
reference's own issue history shows edge cases are where flattening breaks
(docs/changelog.md:318 'Lots of edge cases handled better')."""

from __future__ import annotations

import json

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

# -- document strategy -------------------------------------------------------
# keys from a small alphabet so documents share/collide fields; values cover
# scalars, sub-objects, arrays of scalars and arrays of objects, depth <= 3.

_KEYS = st.sampled_from(["a", "b", "c", "d", "e_f", "g1"])
_SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(alphabet="xyz ,:{}[]\"'", max_size=8),
)


def _obj(depth: int):
    if depth <= 0:
        return st.dictionaries(_KEYS, _SCALARS, min_size=1, max_size=3)
    inner = _obj(depth - 1)
    value = st.one_of(
        _SCALARS,
        inner,
        st.lists(_SCALARS, max_size=3),
        st.lists(inner, max_size=3),
    )
    return st.dictionaries(_KEYS, value, min_size=1, max_size=4)


DOCS = st.lists(_obj(2), min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=DOCS)
def test_flatten_invariants(spark, tmp_path_factory, docs):
    from flatterer_spark.flatten_api import compute_metadata, flatten_dataframes

    d = tmp_path_factory.mktemp("prop")
    p = d / "docs.jsonl"
    with open(p, "w") as f:
        for doc in docs:
            f.write(json.dumps(doc) + "\n")

    res = flatten_dataframes(spark, str(p), ndjson=True)
    tables = {name: df.collect() for name, df in res.tables.items()}

    # 1. main-table cardinality == input cardinality, _link is a dense
    #    0-based ordinal (strict mode)
    main = tables[res.options.main_table_name]
    assert len(main) == len(docs)
    assert sorted(r["_link"] for r in main) == [str(i) for i in range(len(docs))]

    # 2. every child row's FK chain resolves: _link_<t> exists in table t,
    #    and _link extends the nearest ancestor's _link
    links = {
        name: {r["_link"] for r in rows} for name, rows in tables.items()
    }
    for name, df in res.tables.items():
        plan = res.plans[name]
        if not plan.ancestors:
            continue
        nearest = plan.ancestors[-1][0]
        for r in tables[name]:
            for anc_name, _ in plan.ancestors:
                fk = r[f"_link_{anc_name}"]
                assert fk in links[anc_name], (name, anc_name, fk)
            assert r["_link"].startswith(r[f"_link_{nearest}"] + "."), r

    # 3. child multiset reconstructs the parent arrays: per parent row,
    #    the number of child rows == len(array) in the source document
    for name, df in res.tables.items():
        plan = res.plans[name]
        if len(plan.ancestors) != 1 or plan.is_object:
            continue  # top-level arrays only (deeper handled transitively)
        key = plan.path
        from_parent: dict[str, int] = {}
        for i, doc in enumerate(docs):
            v = doc
            for k in key:
                v = v.get(k) if isinstance(v, dict) else None
                if v is None:
                    break
            if isinstance(v, list) and all(isinstance(x, dict) for x in v) and v:
                from_parent[str(i)] = len(v)
        got: dict[str, int] = {}
        for r in tables[name]:
            got[r["_link_main"]] = got.get(r["_link_main"], 0) + 1
        assert got == from_parent, (name, got, from_parent)

    # 4. metadata counts: every fields.csv count <= table row count, and
    #    _link count == row count
    compute_metadata(res)
    nrows = {name: len(rows) for name, rows in tables.items()}
    for f in res.fields:
        assert f["count"] <= nrows[f["table_name"]]
        if f["field_name"] == "_link":
            assert f["count"] == nrows[f["table_name"]]


# -- strict ordinals under adversarial partitioning (VERDICT r3 #7) ----------
# Spark bin-packs file splits by size DESC and may pack several small files
# into one partition; strict _link ordinals must still equal the 0-based
# input position (caller's file order, then line order within a file) for
# ANY split geometry.

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    file_sizes=st.lists(st.integers(min_value=1, max_value=120),
                        min_size=1, max_size=4),
    max_partition_bytes=st.sampled_from([256, 1024, 8192, 128 * 1024 * 1024]),
    pad_mod=st.integers(min_value=1, max_value=40),
)
def test_strict_ordinals_any_partitioning(
    spark, tmp_path_factory, file_sizes, max_partition_bytes, pad_mod
):
    from flatterer_spark.sources.json_input import read_json_source, with_ordinal

    d = tmp_path_factory.mktemp("ords")
    paths, i = [], 0
    for fi, n in enumerate(file_sizes):
        p = d / f"f{fi}.jsonl"
        with open(p, "w") as f:
            for _ in range(n):
                f.write(json.dumps({"id": i, "pad": "x" * (i % pad_mod)}) + "\n")
                i += 1
        paths.append(str(p))

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        df, _ = read_json_source(spark, paths, ndjson=True)
        rows = with_ordinal(df, "strict").select("id", "_ord").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    assert len(rows) == i
    assert all(r["_ord"] == r["id"] for r in rows), sorted(
        (r["id"], r["_ord"]) for r in rows if r["id"] != r["_ord"]
    )[:10]


def test_strict_ordinals_multifile_size_desc_packing(spark, tmp_path):
    """Deterministic regression: file sizes chosen so Spark's size-descending
    packing order differs from input order (small, LARGE, medium) -- the
    exact case that produced wrong _link ordinals before the
    (file rank, split start) offset fix."""
    from flatterer_spark.sources.json_input import read_json_source, with_ordinal

    paths, i = [], 0
    for fi, n in enumerate([5, 300, 40]):
        p = tmp_path / f"f{fi}.jsonl"
        with open(p, "w") as f:
            for _ in range(n):
                f.write(json.dumps({"id": i, "pad": "x" * (i % 23)}) + "\n")
                i += 1
        paths.append(str(p))
    df, _ = read_json_source(spark, paths, ndjson=True)
    rows = with_ordinal(df, "strict").select("id", "_ord").collect()
    assert len(rows) == 345
    assert all(r["_ord"] == r["id"] for r in rows)


# -- optimistic-schema guard byte parity (round 8) ---------------------------
# flatten()'s default NDJSON path parses with a 400-line head-sample schema
# while exact inference runs in the background; on a guard miss it must redo
# on the exact path.  Fuzz: corpora whose TAIL (past the head sample) may
# drift the schema (new keys, widened types, new child arrays) must produce
# byte-identical CSV output either way.

_DRIFT = st.sampled_from(["none", "new_key", "widen", "child", "deep"])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(drift=_DRIFT, extra=_obj(1), seed=st.integers(0, 10**6))
def test_optimistic_guard_byte_parity_fuzz(
    spark, tmp_path_factory, drift, extra, seed
):
    import os

    from flatterer_spark.flatten import flatten

    d = tmp_path_factory.mktemp("guardfuzz")
    p = d / "docs.jsonl"
    n_head, n_tail = 430, 40
    with open(p, "w") as f:
        for i in range(n_head):
            f.write(json.dumps({"id": i, "a": i % 7, "kids": [{"n": i}]}) + "\n")
        for j in range(n_tail):
            doc = {"id": n_head + j, "a": n_head + j, "kids": [{"n": j}]}
            if drift == "new_key":
                doc["late"] = "x"
            elif drift == "widen":
                doc["a"] = j + 0.5
            elif drift == "child":
                doc["more"] = [{"z": j}, {"z": j + 1}]
            elif drift == "deep":
                doc["late"] = extra  # arbitrary nested drift
            f.write(json.dumps(doc, default=str) + "\n")

    out_opt = str(d / f"opt_{seed}")
    out_exact = str(d / f"exact_{seed}")
    flatten(str(p), out_opt, spark=spark, ndjson=True)
    flatten(str(p), out_exact, spark=spark, ndjson=True, _exact_schema=True)
    walked = 0
    for root, _, files in os.walk(out_exact):
        for fn in files:
            ex = os.path.join(root, fn)
            op = os.path.join(out_opt, os.path.relpath(ex, out_exact))
            with open(ex, "rb") as a, open(op, "rb") as b:
                assert a.read() == b.read(), (drift, fn)
            walked += 1
    assert walked >= 4  # main+kids csv, fields, tables, datapackage
