"""Property tests for the Avro container codec (plans/avro_io):
encode→decode over RANDOM schemas and values must be the identity, for
both codecs — the fuzz complement to test_iceberg's byte-pinned spec
fixtures."""
import math

from hypothesis import given, settings, strategies as st

from tostore_spark.plans.avro_io import read_container, write_container

# ---- strategy: (schema, value-strategy) pairs built together --------

_names = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)


def _primitive():
    return st.sampled_from([
        ("long", st.integers(min_value=-(2 ** 63),
                             max_value=2 ** 63 - 1)),
        ("int", st.integers(min_value=-(2 ** 31),
                            max_value=2 ** 31 - 1)),
        ("string", st.text(max_size=20)),
        ("boolean", st.booleans()),
        ("bytes", st.binary(max_size=20)),
        ("double", st.floats(allow_nan=False, allow_infinity=False,
                             width=64)),
    ])


def _schema_and_value(depth=2):
    prim = _primitive()
    if depth <= 0:
        return prim
    sub = _schema_and_value(depth - 1)

    def as_array(p):
        t, vs = p
        return ({"type": "array", "items": t},
                st.lists(vs, max_size=4))

    def as_map(p):
        t, vs = p
        return ({"type": "map", "values": t},
                st.dictionaries(st.text(max_size=6), vs, max_size=3))

    def as_union(p):
        t, vs = p
        # spec: "Unions may not immediately contain other unions"
        if isinstance(t, list) or t == "null":
            return p
        return (["null", t], st.one_of(st.none(), vs))

    return st.one_of(prim, sub.map(as_array), sub.map(as_map),
                     sub.map(as_union))


@st.composite
def _record_case(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    names = draw(st.lists(_names, min_size=n_fields, max_size=n_fields,
                          unique=True))
    fields, row_strats = [], {}
    for nm in names:
        t, vs = draw(_schema_and_value())
        fields.append({"name": nm, "type": t})
        row_strats[nm] = vs
    schema = {"type": "record", "name": "rec", "fields": fields}
    n_rows = draw(st.integers(min_value=0, max_value=5))
    rows = [draw(st.fixed_dictionaries(row_strats))
            for _ in range(n_rows)]
    codec = draw(st.sampled_from(["null", "deflate"]))
    return schema, rows, codec


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y)
                                        for x, y in zip(a, b))
    return a == b


@settings(max_examples=150, deadline=None)
@given(_record_case())
def test_container_roundtrip_property(case):
    schema, rows, codec = case
    meta, out = read_container(write_container(schema, rows,
                                               codec=codec))
    assert meta["avro.codec"].decode() == codec
    assert _eq(out, rows)
