"""Property-based check of the JSONPath->Catalyst predicate translator
(sources/jsonpath_filter.py): hypothesis-generated documents and predicates,
cross-checked against an independent reference evaluator implementing the
semantics the translator promises -- SQL three-valued comparison logic,
eqNullSafe for ``== null`` / ``!= null``, existence = non-null, and rows kept
only when the predicate is definitively true.  The parser is hand-rolled
string processing on the ingest hot path; this is its fuzzing net.
"""

from __future__ import annotations

import json

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from flatterer_spark.sources.jsonpath_filter import jsonpath_predicate

# Fixed-typed document shape: each key always carries one type (or is
# null/missing), so engine-side type coercion never enters the comparison --
# the property under test is predicate semantics, not coercion rules.
#   a: int        b: string      c: bool        d: {x: int}
_INT = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))
_STR = st.one_of(st.none(), st.text(alphabet="pqrs", max_size=3))
_BOOL = st.one_of(st.none(), st.booleans())


@st.composite
def _doc(draw):
    doc = {}
    for key, strat in (("a", _INT), ("b", _STR), ("c", _BOOL)):
        if draw(st.booleans()):
            doc[key] = draw(strat)
    if draw(st.booleans()):
        doc["d"] = {"x": draw(_INT)} if draw(st.booleans()) else None
    return doc


# -- predicate AST ------------------------------------------------------------

_PATHS = ("a", "b", "c", "d.x")
_NUM_OPS = ("==", "!=", "<", "<=", ">", ">=")


@st.composite
def _term(draw):
    kind = draw(st.sampled_from(["exists", "int", "str", "bool", "null"]))
    if kind == "exists":
        return ("exists", draw(st.sampled_from(_PATHS)))
    if kind == "int":
        path = draw(st.sampled_from(("a", "d.x")))
        return ("cmp", path, draw(st.sampled_from(_NUM_OPS)),
                draw(st.integers(min_value=-50, max_value=50)))
    if kind == "str":
        return ("cmp", "b", draw(st.sampled_from(_NUM_OPS)),
                draw(st.text(alphabet="pqrs", max_size=3)))
    if kind == "bool":
        return ("cmp", "c", draw(st.sampled_from(("==", "!="))),
                draw(st.booleans()))
    return ("cmp", draw(st.sampled_from(_PATHS)),
            draw(st.sampled_from(("==", "!="))), None)


def _pred(depth: int):
    if depth <= 0:
        return _term()
    sub = _pred(depth - 1)
    return st.one_of(
        _term(),
        st.tuples(st.sampled_from(["and", "or"]), sub, sub),
    )


def _render(node) -> str:
    if node[0] == "exists":
        return "@." + node[1]
    if node[0] == "cmp":
        _, path, op, lit = node
        if lit is None:
            r = "null"
        elif isinstance(lit, bool):
            r = "true" if lit else "false"
        elif isinstance(lit, str):
            r = f"'{lit}'"
        else:
            r = str(lit)
        return f"@.{path} {op} {r}"
    op = "&&" if node[0] == "and" else "||"
    return f"({_render(node[1])} {op} {_render(node[2])})"


# -- reference evaluator (Kleene 3VL) -----------------------------------------

def _get(doc, path):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _eval(node, doc):
    if node[0] == "exists":
        return _get(doc, node[1]) is not None
    if node[0] == "cmp":
        _, path, op, lit = node
        val = _get(doc, path)
        if lit is None:
            return (val is None) if op == "==" else (val is not None)
        if val is None:
            return None  # unknown
        return {
            "==": val == lit, "!=": val != lit, "<": val < lit,
            "<=": val <= lit, ">": val > lit, ">=": val >= lit,
        }[op]
    lv, rv = _eval(node[1], doc), _eval(node[2], doc)
    if node[0] == "and":
        if lv is False or rv is False:
            return False
        return None if (lv is None or rv is None) else True
    if lv is True or rv is True:
        return True
    return None if (lv is None or rv is None) else False


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=st.lists(_doc(), min_size=1, max_size=12), pred=_pred(2))
def test_predicate_matches_reference_semantics(spark, docs, pred):
    for i, d in enumerate(docs):
        d["_i"] = i
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(d) for d in docs], 1)
    )
    expr = f"$[?({_render(pred)})]"
    col = jsonpath_predicate(expr, df.schema)
    assert col is not None, f"parser rejected supported expr {expr!r}"
    got = sorted(r["_i"] for r in df.where(col).collect())
    want = sorted(i for i, d in enumerate(docs) if _eval(pred, d) is True)
    assert got == want, f"expr={expr!r}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc(), min_size=1, max_size=8),
       path=st.sampled_from(_PATHS))
def test_plain_path_matches_existence(spark, docs, path):
    """$.path keeps exactly the rows where the path is non-null -- the same
    semantics the serialize-and-probe fallback implements."""
    for i, d in enumerate(docs):
        d["_i"] = i
    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(d) for d in docs], 1)
    )
    col = jsonpath_predicate(f"$.{path}", df.schema)
    assert col is not None
    got = sorted(r["_i"] for r in df.where(col).collect())
    want = sorted(i for i, d in enumerate(docs) if _get(d, path) is not None)
    assert got == want
