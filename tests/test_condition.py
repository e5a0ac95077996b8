"""Property tests: the Column compiler must agree with the pure-Python
reference evaluator (``QueryCondition.matches``) on every operator.

The Python evaluator mirrors value_matcher.dart:337-613; the compiler mirrors
it as Column expressions — this suite pins them together.
"""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tostore_spark.condition import QueryCondition, eval_leaf, like_to_regex


def test_like_regex():
    import re

    assert re.match(like_to_regex("a%"), "abc")
    assert re.match(like_to_regex("%b%"), "abc")
    assert re.match(like_to_regex("a_c"), "abc")
    assert not re.match(like_to_regex("a_c"), "abbc")
    assert re.match(like_to_regex("100%"), "100 percent")
    assert not re.match(like_to_regex("b%"), "abc")
    # regex metachars in the pattern are literals
    assert re.match(like_to_regex("a.c"), "a.c")
    assert not re.match(like_to_regex("a.c"), "abc")


def test_eval_leaf_null_semantics():
    # != / NOT IN are TRUE on null; ordered compares FALSE; IS null matches
    r = {"v": None}
    assert eval_leaf(r, "v", "!=", "x") is True
    assert eval_leaf(r, "v", "NOT IN", ["x"]) is True
    assert eval_leaf(r, "v", "IN", ["x"]) is False
    assert eval_leaf(r, "v", ">", 1) is False
    assert eval_leaf(r, "v", "IS", None) is True
    assert eval_leaf(r, "v", "LIKE", "%") is False
    # missing field == null
    assert eval_leaf({}, "ghost", "IS", None) is True
    assert eval_leaf({}, "ghost", "!=", 5) is True


def test_eval_leaf_loose_typing():
    assert eval_leaf({"v": 1}, "v", "=", "1") is True
    assert eval_leaf({"v": "1"}, "v", "=", 1) is True
    assert eval_leaf({"v": "1.5"}, "v", ">", 1) is True
    assert eval_leaf({"v": 2}, "v", "IN", ["2", "3"]) is True


def test_condition_tree_shapes():
    c = (QueryCondition().where("a", ">", 1).where("b", "=", 2))
    assert c.matches({"a": 2, "b": 2})
    assert not c.matches({"a": 0, "b": 2})
    c2 = (QueryCondition().where("a", ">", 1).or_where("b", "=", 2))
    assert c2.matches({"a": 0, "b": 2})
    assert c2.matches({"a": 5, "b": 0})
    assert not c2.matches({"a": 0, "b": 0})
    # multi-op map = OR
    c3 = QueryCondition().where("a", {">": 60, "<": 10})
    assert c3.matches({"a": 61}) and c3.matches({"a": 5}) and not c3.matches({"a": 30})
    # nested groups
    g1 = QueryCondition().where("a", "=", 1).where("b", "=", 1)
    g2 = QueryCondition().where("a", "=", 2).where("b", "=", 2)
    c4 = QueryCondition().condition(g1).or_condition(g2)
    assert c4.matches({"a": 1, "b": 1}) and c4.matches({"a": 2, "b": 2})
    assert not c4.matches({"a": 1, "b": 2})


_OPS = st.sampled_from(["=", "!=", ">", ">=", "<", "<=", "IN", "NOT IN",
                        "BETWEEN", "LIKE", "NOT LIKE", "IS", "IS NOT"])
_VALS = st.one_of(st.integers(-5, 5), st.floats(-5, 5, allow_nan=False),
                  st.sampled_from(["a", "b", "ab", "1", "2.5", ""]), st.none())


def _mk_value(op, v):
    if op in ("IN", "NOT IN"):
        return [v, 1, "a"]
    if op == "BETWEEN":
        return {"start": v if v is not None else 0, "end": 3}
    if op in ("LIKE", "NOT LIKE"):
        return "%a%" if not isinstance(v, str) else f"%{v}%"
    return v


@given(op=_OPS, rv=_VALS, cv=_VALS)
@settings(max_examples=300, suppress_health_check=list(HealthCheck))
def test_eval_leaf_total(op, rv, cv):
    """eval_leaf never raises and returns a bool for any op/value combo."""
    out = eval_leaf({"v": rv}, "v", op, _mk_value(op, cv))
    assert isinstance(out, bool)


@pytest.mark.spark
class TestCompilerParity:
    """Spark filter == python matches on a mixed-type frame."""

    ROWS = [
        {"id": i, "num": n, "s": s, "b": b}
        for i, (n, s, b) in enumerate([
            (1, "a", True), (2, "b", False), (None, None, None),
            (-3, "1", True), (0, "2.5", False), (45, "abc", None),
            (100, "", True), (7, "xyz", False),
        ])
    ]

    CASES = [
        ("num", "=", 1), ("num", "=", "1"), ("num", "!=", 2), ("num", ">", 0),
        ("num", "<=", 0), ("num", "IN", [1, 2, "7"]), ("num", "NOT IN", [1]),
        ("num", "BETWEEN", {"start": 0, "end": 10}), ("num", "IS", None),
        ("num", "IS NOT", None),
        ("s", "=", "a"), ("s", "!=", "a"), ("s", "LIKE", "%b%"),
        ("s", "NOT LIKE", "a%"), ("s", "IN", ["a", "b"]),
        ("s", "NOT IN", ["a"]), ("s", "IS", None), ("s", "=", ""),
        ("b", "=", True), ("b", "!=", True), ("b", "IS", None),
        ("ghost", "IS", None), ("ghost", "=", 5), ("ghost", "!=", 5),
        ("ghost", "NOT IN", [1]),
    ]

    def test_parity(self, spark, db):
        import pyspark.sql.types as T

        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("num", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
        ])
        sdf = spark.createDataFrame(
            [tuple(r[k] for k in ("id", "num", "s", "b")) for r in self.ROWS], schema)
        db.register_table("parity_t", df=sdf)
        for field, op, value in self.CASES:
            qc = QueryCondition().where(field, op, value)
            expected = sorted(r["id"] for r in self.ROWS if qc.matches(r))
            got = sorted(r["id"] for r in
                         db.query("parity_t").where(field, op, value).run())
            assert got == expected, f"{field} {op} {value!r}: {got} != {expected}"


def test_fluent_or_switch():
    from tostore_spark.condition import QueryCondition
    a = QueryCondition().where("x", "=", 1).or_().where("x", "=", 2)
    b = QueryCondition().where("x", "=", 1).or_where("x", "=", 2)
    assert a.to_map() == b.to_map()
    rec_hits = [{"x": 1}, {"x": 2}]
    assert all(a.matches(r) for r in rec_hits)
    assert not a.matches({"x": 3})
    # or_() before a subcondition group
    sub = QueryCondition().where("y", ">", 5).where("y", "<", 9)
    c = QueryCondition().where("x", "=", 1).or_().condition(sub)
    assert c.matches({"x": 9, "y": 7}) and c.matches({"x": 1, "y": 0})
    assert not c.matches({"x": 2, "y": 10})
