"""JSONPath row filter -> native Catalyst predicate (S9).

The reference evaluates a JSONPath expression against every input object and
keeps the object iff the result is non-null (`docs/options.md:343-384`,
jsonpath-rust 0.3, `Cargo.lock:2360`).  Supported forms:

 - plain paths: ``$.a.b`` -> ``col("a").getField("b").isNotNull()``
 - filter predicates: ``$[?(@.type == 'game' && @.year > 2000)]`` with
   ``==  !=  <  <=  >  >=``, ``&&``, ``||``, parentheses, string/number/bool/
   null literals, and bare ``@.path`` existence terms.

Translating to a Column keeps the filter inside Catalyst: it is pushed into
the JSON scan (predicate pushdown + nested-schema pruning) instead of the
previous anti-pattern of re-serializing every parsed row with
``to_json(struct(*))`` and running ``get_json_object`` on the string --
double serialization of the full row on the hot path.  Expressions beyond
this subset (wildcards, recursive descent, slices) return ``None`` and the
caller falls back to the serialize-and-probe path, which still covers plain
non-predicate JSONPath.

A path component missing from the inferred schema resolves to ``lit(NULL)``:
comparisons and existence checks on it are never true, matching "no object
has a non-null value there".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import StructType

_CMP_OPS = ("==", "!=", ">=", "<=", ">", "<")


class _Unsupported(Exception):
    pass


class _Parser:
    def __init__(self, s: str, schema: StructType):
        self.s = s
        self.i = 0
        self.schema = schema

    # -- low-level ---------------------------------------------------------
    def _ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _peek(self, tok: str) -> bool:
        self._ws()
        return self.s.startswith(tok, self.i)

    def _eat(self, tok: str) -> bool:
        if self._peek(tok):
            self.i += len(tok)
            return True
        return False

    def _expect(self, tok: str) -> None:
        if not self._eat(tok):
            raise _Unsupported(f"expected {tok!r} at {self.i} in {self.s!r}")

    def _at_end(self) -> bool:
        self._ws()
        return self.i >= len(self.s)

    # -- grammar -----------------------------------------------------------
    def parse(self) -> Column:
        self._expect("$")
        if self._peek("[?("):
            self._expect("[?(")
            pred = self._or()
            self._expect(")]")
            # docs show a stray trailing ']' in one CLI example; tolerate it
            self._eat("]")
            if not self._at_end():
                raise _Unsupported("trailing content after predicate")
            return pred
        path = self._path()
        if not self._at_end():
            raise _Unsupported("trailing content after path")
        if not path:
            raise _Unsupported("bare $ matches everything")
        return self._resolve(path).isNotNull()

    def _path(self) -> list[str]:
        parts: list[str] = []
        while True:
            if self._eat("."):
                if self._peek("."):  # '..' recursive descent
                    raise _Unsupported("recursive descent")
                parts.append(self._name())
            elif self._peek("["):
                save = self.i
                self._expect("[")
                self._ws()
                if self.i < len(self.s) and self.s[self.i] in "'\"":
                    parts.append(self._quoted())
                    self._expect("]")
                else:
                    self.i = save  # numeric index / wildcard / slice
                    raise _Unsupported("non-key bracket selector")
            else:
                return parts

    def _name(self) -> str:
        self._ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_-"):
            j += 1
        if j == self.i:
            raise _Unsupported(f"empty name at {self.i}")
        name, self.i = self.s[self.i:j], j
        if name == "*":
            raise _Unsupported("wildcard")
        return name

    def _quoted(self) -> str:
        self._ws()
        q = self.s[self.i]
        if q not in "'\"":
            raise _Unsupported("expected quote")
        j = self.s.find(q, self.i + 1)
        if j < 0:
            raise _Unsupported("unterminated string")
        val, self.i = self.s[self.i + 1:j], j + 1
        return val

    def _or(self) -> Column:
        left = self._and()
        while self._eat("||"):
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._cmp()
        while self._eat("&&"):
            left = left & self._cmp()
        return left

    def _cmp(self) -> Column:
        if self._eat("("):
            inner = self._or()
            self._expect(")")
            return inner
        lhs, lhs_is_path = self._operand()
        for op in _CMP_OPS:
            if self._eat(op):
                rhs, _ = self._operand()
                return self._compare(lhs, op, rhs)
        if not lhs_is_path:
            raise _Unsupported("literal used as boolean term")
        return lhs.isNotNull()

    def _operand(self) -> tuple[Column, bool]:
        self._ws()
        if self._eat("@"):
            path = self._path()
            if not path:
                raise _Unsupported("bare @")
            return self._resolve(path), True
        ch = self.s[self.i] if self.i < len(self.s) else ""
        if ch in "'\"":
            return F.lit(self._quoted()), False
        if self._eat("true"):
            return F.lit(True), False
        if self._eat("false"):
            return F.lit(False), False
        if self._eat("null"):
            return F.lit(None), False
        j = self.i
        while j < len(self.s) and (self.s[j].isdigit() or self.s[j] in "+-.eE"):
            j += 1
        if j > self.i:
            num = self.s[self.i:j]
            self.i = j
            return F.lit(float(num) if any(c in num for c in ".eE") else int(num)), False
        raise _Unsupported(f"unparsable operand at {self.i} in {self.s!r}")

    @staticmethod
    def _compare(lhs: Column, op: str, rhs: Column) -> Column:
        if op == "==":
            return lhs.eqNullSafe(rhs) if _is_null_lit(rhs) else lhs == rhs
        if op == "!=":
            return ~lhs.eqNullSafe(rhs) if _is_null_lit(rhs) else lhs != rhs
        return {"<": lhs < rhs, "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs}[op]

    def _resolve(self, path: list[str]) -> Column:
        cur = self.schema
        col: Column | None = None
        for k in path:
            if isinstance(cur, StructType) and k in cur.fieldNames():
                col = F.col(f"`{k}`") if col is None else col.getField(k)
                cur = cur[k].dataType
            else:
                return F.lit(None)
        return col


def _is_null_lit(c: Column) -> bool:
    # F.lit(None) prints as NULL; cheap structural check without analysis
    return "NULL" == c._jc.toString()  # noqa: SLF001


def jsonpath_predicate(expr: str, schema: StructType) -> Column | None:
    """Translate a JSONPath filter to a Catalyst predicate Column.

    Returns None when the expression falls outside the supported subset; the
    caller should then use the serialize-and-probe fallback."""
    try:
        return _Parser(expr, schema).parse()
    except _Unsupported:
        return None
