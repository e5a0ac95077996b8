"""QueryCondition: the reference's chainable AND/OR condition tree.

Reference surface:
- tree build + chain API      lib/src/chain/query_condition.dart:116-409
- sugar predicates            lib/src/chain/query_condition.dart:549-678
- leaf evaluation semantics   lib/src/handler/value_matcher.dart:337-613
- multi-op map = OR           lib/src/handler/value_matcher.dart:551-561
- node model                  lib/src/handler/value_matcher.dart:716-758

Two consumers:
- ``compile.condition_to_column`` turns the tree into a Spark ``Column``
  (the distributed path — this is what every query actually runs);
- ``matches(record)`` is a pure-Python evaluator kept semantically identical
  (query_condition.dart:57-62), used for HAVING-style client checks and as
  the property-test oracle for the compiler.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Optional

_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")

VALID_OPS = {
    "=", "!=", "<>", ">", ">=", "<", "<=",
    "IN", "NOT IN", "BETWEEN", "LIKE", "NOT LIKE", "IS", "IS NOT",
}


class ConditionNode:
    """leaf | and | or  (value_matcher.dart:716-758)."""

    __slots__ = ("kind", "field", "op", "value", "children")

    def __init__(self, kind: str, field: str | None = None, op: str | None = None,
                 value: Any = None, children: list["ConditionNode"] | None = None):
        self.kind = kind  # 'leaf' | 'and' | 'or'
        self.field = field
        self.op = op
        self.value = value
        self.children = children if children is not None else []

    def is_empty(self) -> bool:
        if self.kind == "leaf":
            return False
        return all(c.is_empty() for c in self.children)

    def simplify(self) -> "ConditionNode":
        """Flatten nested AND/AND, OR/OR; drop empty nodes
        (query_optimizer.dart:511-550; query_condition.dart:420-441)."""
        if self.kind == "leaf":
            return self
        kids: list[ConditionNode] = []
        for c in self.children:
            c = c.simplify()
            if c.is_empty():
                continue
            if c.kind == self.kind:
                kids.extend(c.children)
            else:
                kids.append(c)
        if len(kids) == 1:
            return kids[0]
        return ConditionNode(self.kind, children=kids)

    def to_map(self) -> Any:
        """Plain-map IR (query_condition.dart:412-521), mostly for debugging
        and cursor query-signature hashing."""
        if self.kind == "leaf":
            return {self.field: {self.op: _jsonable(self.value)}}
        key = "AND" if self.kind == "and" else "OR"
        return {key: [c.to_map() for c in self.children]}


def _jsonable(v: Any) -> Any:
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    return str(v)


def _to_num(v: Any) -> Optional[float]:
    """num.tryParse-style loose numeric view (value_matcher.dart:151-173)."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str) and _NUM_RE.match(v.strip()):
        try:
            return float(v.strip())
        except ValueError:
            return None
    return None


def loose_eq(a: Any, b: Any) -> bool:
    """Type-aware equality with numeric-string coercion: 1 == "1"."""
    if a is None or b is None:
        return a is None and b is None
    if a == b:
        return True
    na, nb = _to_num(a), _to_num(b)
    if na is not None and nb is not None:
        return na == nb
    return False


def _cmp(a: Any, b: Any) -> Optional[int]:
    """Ordered compare; None when incomparable. Null loses every ordered
    compare (value_matcher.dart:576-583: false if value null)."""
    if a is None or b is None:
        return None
    na, nb = _to_num(a), _to_num(b)
    if na is not None and nb is not None:
        return (na > nb) - (na < nb)
    if isinstance(a, bool) and isinstance(b, bool):
        return (a > b) - (a < b)
    sa, sb = str(a), str(b)
    return (sa > sb) - (sa < sb)


def like_to_regex(pattern: str) -> str:
    """SQL LIKE wildcards % _ → anchored regex (value_matcher.dart:318-331)."""
    out = []
    for ch in str(pattern):
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def eval_leaf(record: dict, field: str, op: str, value: Any) -> bool:
    """Evaluate one predicate leaf against a row dict — the reference's
    ``ValueMatcher`` semantics (value_matcher.dart:337-613):
    - missing field counts as null (``IS null`` true when field absent);
    - ordered compares are false when the record value is null;
    - ``NOT IN`` on a null record value → true (two-valued, no SQL 3VL);
    - LIKE stringifies non-string values and anchors the regex.
    """
    rv = record.get(field)
    if op == "=":
        return loose_eq(rv, value)
    if op in ("!=", "<>"):
        return not loose_eq(rv, value)
    if op in (">", ">=", "<", "<="):
        c = _cmp(rv, value)
        if c is None:
            return False
        return {">": c > 0, ">=": c >= 0, "<": c < 0, "<=": c <= 0}[op]
    if op == "IN":
        if rv is None:
            return False
        return any(loose_eq(rv, v) for v in (value or []))
    if op == "NOT IN":
        if rv is None:
            return True  # value_matcher.dart:587-589
        return not any(loose_eq(rv, v) for v in (value or []))
    if op == "BETWEEN":
        lo, hi = value["start"], value["end"]
        c1, c2 = _cmp(rv, lo), _cmp(rv, hi)
        return c1 is not None and c2 is not None and c1 >= 0 and c2 <= 0
    if op == "LIKE":
        if rv is None:
            return False
        return re.match(like_to_regex(value), str(rv)) is not None
    if op == "NOT LIKE":
        if rv is None:
            return False
        return re.match(like_to_regex(value), str(rv)) is None
    if op == "IS":
        if value is None:
            return rv is None
        return loose_eq(rv, value)
    if op == "IS NOT":
        if value is None:
            return rv is not None
        return not loose_eq(rv, value)
    raise ValueError(f"unsupported operator: {op}")


class QueryCondition:
    """Chainable condition tree with the reference's public surface.

    ``where`` chains AND; ``or_where`` adds to an OR branch; ``condition`` /
    ``or_condition`` compose parenthesized sub-trees
    (query_condition.dart:116-409).  A dict value with multiple operators is
    an implicit OR: ``{'>' : 60, '<': 10}`` ⇒ ``>60 OR <10``
    (value_matcher.dart:551-561).
    """

    def __init__(self):
        self._root = ConditionNode("and")
        self._current = self._root

    # -- core chain -----------------------------------------------------
    def or_(self) -> "QueryCondition":
        """Fluent OR switch (query_condition.dart:198): the next where()/
        condition() attaches as an OR branch —
        ``where(a).or_().where(b)`` ≡ ``where(a).or_where(b)``."""
        self._pending_or = True
        return self

    def where(self, field: str, op_or_value: Any = None, value: Any = "__missing__") -> "QueryCondition":
        if getattr(self, "_pending_or", False):
            self._pending_or = False
            return self.or_where(field, op_or_value, value)
        node = self._build_leaf(field, op_or_value, value)
        self._attach_and(node)
        return self

    def or_where(self, field: str, op_or_value: Any = None, value: Any = "__missing__") -> "QueryCondition":
        node = self._build_leaf(field, op_or_value, value)
        self._attach_or(node)
        return self

    def condition(self, sub: "QueryCondition") -> "QueryCondition":
        if getattr(self, "_pending_or", False):
            self._pending_or = False
            return self.or_condition(sub)
        self._attach_and(sub.root())
        return self

    def or_condition(self, sub: "QueryCondition") -> "QueryCondition":
        self._attach_or(sub.root())
        return self

    def _attach_and(self, node: ConditionNode) -> None:
        if self._root.kind == "or":
            # AND binds to the last OR branch
            last = self._root.children[-1]
            if last.kind != "and":
                last = ConditionNode("and", children=[last])
                self._root.children[-1] = last
            last.children.append(node)
        else:
            self._root.children.append(node)

    def _attach_or(self, node: ConditionNode) -> None:
        if self._root.kind != "or":
            left = self._root
            self._root = ConditionNode("or", children=[left] if left.children else [])
            if not self._root.children:
                # or() with empty left side: just start the first branch
                self._root.children.append(node)
                return
        self._root.children.append(node)

    def _build_leaf(self, field: str, op_or_value: Any, value: Any) -> ConditionNode:
        if value == "__missing__":
            v = op_or_value
            if isinstance(v, dict) and v and all(k in VALID_OPS for k in v):
                # implicit multi-op map: single op = AND of one, multi = OR
                leaves = [ConditionNode("leaf", field, k, vv) for k, vv in v.items()]
                if len(leaves) == 1:
                    return leaves[0]
                return ConditionNode("or", children=leaves)
            return ConditionNode("leaf", field, "=", v)
        op = str(op_or_value).upper() if str(op_or_value).upper() in VALID_OPS else str(op_or_value)
        if op not in VALID_OPS:
            raise ValueError(f"unsupported operator: {op_or_value}")
        if op == "BETWEEN" and not (isinstance(value, dict) and "start" in value):
            value = {"start": value[0], "end": value[1]}
        return ConditionNode("leaf", field, op, value)

    # -- sugar (query_condition.dart:549-678) ---------------------------
    def where_equal(self, f, v): return self.where(f, "=", v)
    def where_not_equal(self, f, v): return self.where(f, "!=", v)
    def where_in(self, f, vals: Iterable): return self.where(f, "IN", list(vals))
    def where_not_in(self, f, vals: Iterable): return self.where(f, "NOT IN", list(vals))
    def where_between(self, f, lo, hi): return self.where(f, "BETWEEN", {"start": lo, "end": hi})
    def where_null(self, f): return self.where(f, "IS", None)
    def where_not_null(self, f): return self.where(f, "IS NOT", None)
    def where_like(self, f, p): return self.where(f, "LIKE", p)
    def where_not_like(self, f, p): return self.where(f, "NOT LIKE", p)
    def where_greater_than(self, f, v): return self.where(f, ">", v)
    def where_greater_than_or_equal_to(self, f, v): return self.where(f, ">=", v)
    def where_less_than(self, f, v): return self.where(f, "<", v)
    def where_less_than_or_equal_to(self, f, v): return self.where(f, "<=", v)
    def where_contains(self, f, s): return self.where(f, "LIKE", f"%{s}%")
    def where_not_contains(self, f, s): return self.where(f, "NOT LIKE", f"%{s}%")
    def where_starts_with(self, f, s): return self.where(f, "LIKE", f"{s}%")
    def where_ends_with(self, f, s): return self.where(f, "LIKE", f"%{s}")
    def where_true(self, f): return self.where(f, "=", True)
    def where_false(self, f): return self.where(f, "=", False)
    def where_empty(self, f): return self.where(f, "=", "")
    def where_not_empty(self, f): return self.where(f, "!=", "")

    def where_contains_any(self, f, subs: Iterable[str]) -> "QueryCondition":
        sub = QueryCondition()
        for i, s in enumerate(subs):
            if i == 0:
                sub.where(f, "LIKE", f"%{s}%")
            else:
                sub.or_where(f, "LIKE", f"%{s}%")
        return self.condition(sub)

    # -- consumption ----------------------------------------------------
    def root(self) -> ConditionNode:
        return self._root.simplify()

    def is_empty(self) -> bool:
        return self._root.is_empty()

    def to_map(self) -> Any:
        return self.root().to_map()

    def matches(self, record: dict) -> bool:
        """Client-side evaluation (query_condition.dart:57-62)."""
        return _eval_node(self.root(), record)

    def normalized(self, schema) -> "QueryCondition":
        """Coerce condition values to field schema types
        (query_condition.dart:743-835)."""
        from tostore_spark.schema import TableSchema, coerce_to_type

        def walk(n: ConditionNode) -> ConditionNode:
            if n.kind == "leaf":
                fs = schema.field(n.field) if isinstance(schema, TableSchema) else None
                if fs is None:
                    return n
                v = n.value
                if n.op in ("IN", "NOT IN"):
                    v = [coerce_to_type(x, fs.type) for x in (v or [])]
                elif n.op == "BETWEEN":
                    v = {"start": coerce_to_type(v["start"], fs.type),
                         "end": coerce_to_type(v["end"], fs.type)}
                elif n.op in ("LIKE", "NOT LIKE"):
                    pass
                else:
                    v = coerce_to_type(v, fs.type)
                return ConditionNode("leaf", n.field, n.op, v)
            return ConditionNode(n.kind, children=[walk(c) for c in n.children])

        out = QueryCondition()
        out._root = walk(self.root())
        if out._root.kind == "leaf":
            out._root = ConditionNode("and", children=[out._root])
        return out


def to_condition_node(where: Any) -> Optional[ConditionNode]:
    """Freestanding predicate spec → a (simplified) ``ConditionNode``.

    The shared ``where=`` surface for reads OUTSIDE the store's query
    builder (foreign-table readers like ``read_delta``/``read_iceberg``):

    - ``None`` → ``None`` (no predicate);
    - a ``QueryCondition`` → its root;
    - a ``ConditionNode`` → as-is;
    - a dict → each key ANDs, with the reference's map-form value
      semantics (``{'col': v}`` equality, ``{'col': {'>=': a, '<': b}}``
      op-map — multiple ops in one map = implicit OR, the
      value_matcher.dart:551-561 rule ``where()`` already applies).
    """
    if where is None:
        return None
    if isinstance(where, ConditionNode):
        return where.simplify()
    if isinstance(where, QueryCondition):
        return where.root().simplify()
    if isinstance(where, dict):
        qc = QueryCondition()
        for f, v in where.items():
            qc.where(f, v)
        return qc.root().simplify()
    raise TypeError(
        f"where: expected dict, QueryCondition or ConditionNode, "
        f"got {type(where).__name__}")


def _eval_node(node: ConditionNode, record: dict) -> bool:
    if node.kind == "leaf":
        return eval_leaf(record, node.field, node.op, node.value)
    if node.kind == "and":
        return all(_eval_node(c, record) for c in node.children)
    if node.kind == "or":
        return any(_eval_node(c, record) for c in node.children)
    raise ValueError(node.kind)
