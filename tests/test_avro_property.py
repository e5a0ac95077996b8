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


class TestSnappyCodec:
    """Pure-Python raw-snappy decode (r15): byte-pinned against
    hand-computed vectors from the published snappy format
    description, plus an end-to-end snappy Avro container."""

    def test_literal_only(self):
        from tostore_spark.plans.avro_io import _snappy_decompress
        # varint len 5; literal tag (5-1)<<2; bytes
        assert _snappy_decompress(b"\x05\x10hello") == b"hello"

    def test_overlapping_copy_1byte_offset(self):
        from tostore_spark.plans.avro_io import _snappy_decompress
        # len 12; literal "ab"; copy-1 len 10 ((6)+4) off 2 streams
        # byte-by-byte -> "ab" * 6
        assert _snappy_decompress(b"\x0c\x04ab\x19\x02") == b"ab" * 6

    def test_copy_2byte_offset(self):
        from tostore_spark.plans.avro_io import _snappy_decompress
        # len 8; literal "abcd"; copy-2 len 4 off 4
        assert _snappy_decompress(
            b"\x08\x0cabcd\x0e\x04\x00") == b"abcdabcd"

    def test_long_literal_spill(self):
        from tostore_spark.plans.avro_io import _snappy_decompress
        # literal length 100 spills into one extra byte (tag 60<<2)
        body = bytes(range(100)) + b"\x00" * 0
        data = b"\x64" + bytes([60 << 2, 99]) + body
        assert _snappy_decompress(data) == body

    def test_malformed_refuses(self):
        import pytest

        from tostore_spark.plans.avro_io import _snappy_decompress
        with pytest.raises(ValueError, match="offset"):
            _snappy_decompress(b"\x04\x19\x09")     # offset > output
        with pytest.raises(ValueError, match="header said"):
            _snappy_decompress(b"\x07\x10hello")    # wrong length
        with pytest.raises(ValueError, match="truncated"):
            _snappy_decompress(b"\x05\x10he")

    def _snappy_container(self, crc_bytes=None):
        import json as _json
        import zlib as _zlib

        from tostore_spark.plans.avro_io import (MAGIC, _enc_bytes,
                                                 _zigzag)
        schema = {"type": "record", "name": "R",
                  "fields": [{"name": "x", "type": "long"}]}
        raw = b"\x02"                     # one record, x = zigzag 1
        comp = b"\x01\x00\x02"            # varint 1 + literal tag + b
        crc = crc_bytes if crc_bytes is not None else \
            (_zlib.crc32(raw) & 0xFFFFFFFF).to_bytes(4, "big")
        payload = comp + crc
        sync = b"\x00" * 16
        out = bytearray(MAGIC)
        entries = {"avro.schema":
                   _json.dumps(schema).encode("utf-8"),
                   "avro.codec": b"snappy"}
        out += _zigzag(len(entries))
        for k, v in entries.items():
            out += _enc_bytes(k.encode("utf-8"))
            out += _enc_bytes(v)
        out += _zigzag(0) + sync
        out += _zigzag(1) + _zigzag(len(payload)) + payload + sync
        return bytes(out)

    def test_container_end_to_end(self):
        meta, recs = read_container(self._snappy_container())
        assert meta["avro.codec"] == b"snappy"
        assert recs == [{"x": 1}]

    def test_container_crc_mismatch_refuses(self):
        import pytest
        bad = self._snappy_container(crc_bytes=b"\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="CRC"):
            read_container(bad)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_snappy_literal_roundtrip_property(payload):
    """Property: a literal-only snappy stream (the trivially correct
    reference encoding any conformant compressor may emit) decodes to
    the original bytes — covers varint lengths, literal-length spill
    tiers, and multi-element streams."""
    from tostore_spark.plans.avro_io import _snappy_decompress

    def enc_varint(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def enc_literal(chunk):
        ln = len(chunk) - 1
        if ln < 60:
            return bytes([ln << 2]) + chunk
        nb = (ln.bit_length() + 7) // 8
        return bytes([(59 + nb) << 2]) \
            + ln.to_bytes(nb, "little") + chunk

    comp = bytearray(enc_varint(len(payload)))
    i = 0
    # vary chunk sizes to cross the 60-byte spill boundary
    for size in (1, 61, 7, 300, 59, 60):
        while i < len(payload):
            chunk = payload[i:i + size]
            if not chunk:
                break
            comp += enc_literal(chunk)
            i += len(chunk)
            break
        if i >= len(payload):
            break
    while i < len(payload):
        chunk = payload[i:i + 100]
        comp += enc_literal(chunk)
        i += len(chunk)
    assert _snappy_decompress(bytes(comp)) == payload


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_snappy_garbage_never_crashes(data):
    """Property: arbitrary bytes either decode or raise ValueError —
    never an unhandled exception (foreign metadata is untrusted)."""
    from tostore_spark.plans.avro_io import _snappy_decompress
    try:
        _snappy_decompress(data)
    except ValueError:
        pass
