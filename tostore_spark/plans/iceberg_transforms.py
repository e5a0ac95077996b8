"""Iceberg partition transforms — the scan-planning half.

A foreign Iceberg table is usually partitioned through a TRANSFORM
(``bucket[N]``, ``truncate[W]``, ``year``/``month``/``day``/``hour``),
not raw column values; each manifest entry records the transformed
value.  To prune such files for a predicate on the SOURCE column, the
reader applies the same transform to the predicate value and compares
against the recorded partition value — everything here derives from
the PUBLIC Iceberg Table Spec ("Partition Transforms" and "Appendix B:
32-bit Hash Requirements", which pins bucketing to Murmur3-x86-32 of
the value's canonical byte form, with published test vectors the test
suite asserts byte-for-byte).

Soundness rules (the only ones used by the pruner):

* equality: for ANY transform t, ``x = v`` ⟹ ``t(x) = t(v)`` — a file
  whose recorded value differs from ``t(v)`` cannot contain a match;
* order: for MONOTONE transforms (truncate, year/month/day/hour —
  NOT bucket), ``x > v`` ⟹ ``t(x) >= t(v)`` — a file recorded below
  ``t(v)`` cannot contain a match (dually for ``<``);
* a NULL recorded value means every source value in the file is null
  (these transforms map null to null and non-null to non-null), so
  any non-null-seeking predicate refutes the file.

Anything not computable returns None and the pruner keeps the file;
the read path re-applies the predicate to rows, so a transform bug
can narrow too little but never change a result silently — and the
spec test vectors pin the bucket hash against exactly that.

Timestamps are treated as UTC instants (naive datetimes = UTC),
matching the engine's pinned ``spark.sql.session.timeZone=UTC``.
"""
from __future__ import annotations

import datetime
import re
import struct

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3-x86-32 (public domain algorithm by Austin Appleby), the
    hash the Iceberg spec mandates for ``bucket[N]``.  Returns the
    SIGNED 32-bit result (Java semantics, what the spec's test
    vectors quote)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")

#: transforms whose output order follows the input order — safe for
#: range refutation (bucket is emphatically NOT one of them)
MONOTONE = {"identity", "truncate", "year", "month", "day", "hour"}


def parse_transform(spec: str):
    """``'bucket[16]'`` → ``('bucket', 16)``; plain names → (name,
    None); unknown/void → None (never prune on what we can't apply)."""
    if not isinstance(spec, str):
        return None
    s = spec.strip().lower()
    m = _BUCKET_RE.match(s)
    if m:
        n = int(m.group(1))
        return ("bucket", n) if n > 0 else None
    m = _TRUNC_RE.match(s)
    if m:
        w = int(m.group(1))
        return ("truncate", w) if w > 0 else None
    if s in ("identity", "year", "month", "day", "hour"):
        return (s, None)
    return None      # void, unknown future transforms: keep the file


def _as_date(v):
    if isinstance(v, datetime.datetime):
        return None          # a datetime is not a date value
    if isinstance(v, datetime.date):
        return v
    if isinstance(v, str):
        try:
            return datetime.date.fromisoformat(v)
        except ValueError:
            return None
    return None


def _as_datetime(v):
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc) \
                .replace(tzinfo=None)
        return v
    if isinstance(v, str):
        try:
            d = datetime.datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            return None
        if d.tzinfo is not None:
            d = d.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return d
    return None


def _epoch_days(v):
    d = _as_date(v)
    return None if d is None else (d - _EPOCH_DATE).days


def _epoch_micros(v):
    d = _as_datetime(v)
    if d is None:
        return None
    delta = d - _EPOCH_DT
    return (delta.days * 86_400_000_000
            + delta.seconds * 1_000_000 + delta.microseconds)


def _bucket_bytes(ice_type: str, v):
    """Appendix B canonical byte form for the bucket hash input; None
    when the (type, value) pair is outside the supported set."""
    if isinstance(v, bool):
        return None                      # booleans don't bucket
    if ice_type in ("int", "long"):
        return struct.pack("<q", v) if isinstance(v, int) else None
    if ice_type == "string":
        return v.encode("utf-8") if isinstance(v, str) else None
    if ice_type == "date":
        days = _epoch_days(v)
        return None if days is None else struct.pack("<q", days)
    if ice_type in ("timestamp", "timestamptz"):
        us = _epoch_micros(v)
        return None if us is None else struct.pack("<q", us)
    return None      # float/double (spec-discouraged), decimal, uuid…


def transform_value(name: str, param, ice_type: str, v):
    """Apply one parsed transform to a PREDICATE value.  Returns the
    partition-value-typed result, or None when not computable (the
    pruner then keeps the file)."""
    if v is None:
        return None
    if name == "identity":
        return v if isinstance(v, (bool, int, float, str)) else None
    if name == "bucket":
        b = _bucket_bytes(ice_type, v)
        if b is None:
            return None
        return (murmur3_32(b) & 0x7FFFFFFF) % int(param)
    if name == "truncate":
        if isinstance(v, bool):
            return None
        if ice_type in ("int", "long") and isinstance(v, int):
            return v - (v % int(param))          # floor semantics
        if ice_type == "string" and isinstance(v, str):
            return v[:int(param)]                # W code points
        return None
    if name in ("year", "month", "day"):
        if ice_type == "date":
            d = _as_date(v)
        elif ice_type in ("timestamp", "timestamptz"):
            dt = _as_datetime(v)
            d = None if dt is None else dt.date()
        else:
            return None
        if d is None:
            return None
        if name == "year":
            return d.year - 1970
        if name == "month":
            return (d.year - 1970) * 12 + (d.month - 1)
        return (d - _EPOCH_DATE).days
    if name == "hour":
        if ice_type not in ("timestamp", "timestamptz"):
            return None
        us = _epoch_micros(v)
        return None if us is None else us // 3_600_000_000
    return None


def _cmp(a, b):
    """Type-aligned ordered compare of two partition-space values
    (ints with ints, strings with strings); None = undecidable."""
    if isinstance(a, bool) or isinstance(b, bool):
        return None
    if isinstance(a, int) and isinstance(b, int):
        return (a > b) - (a < b)
    if isinstance(a, str) and isinstance(b, str):
        return (a > b) - (a < b)
    return None


def leaf_keeps(name: str, param, ice_type: str, recorded,
               op: str, value) -> bool:
    """Could any row whose transformed source value equals ``recorded``
    satisfy ``source <op> value``?  False ONLY on a provable
    refutation; True whenever undecidable."""
    if op == "IS":
        if value is None:
            return True      # null rows: a null partition always may
        op = "="
    if op in ("IS NOT", "!=", "<>", "NOT IN", "NOT LIKE", "LIKE"):
        return True          # negations/patterns: not refutable here
    if recorded is None:
        # every source value in the file is null (these transforms map
        # null→null, non-null→non-null); under engine semantics a null
        # row satisfies only "= None" / "IS None"
        return op == "=" and value is None
    if op == "=":
        if value is None:
            return False     # recorded non-null ⟹ no null source rows
        t = transform_value(name, param, ice_type, value)
        if t is None:
            return True
        c = _cmp(recorded, t)
        eq = (c == 0) if c is not None else \
            (recorded == t or str(recorded) == str(t))
        return eq
    if op == "IN":
        vals = [x for x in (value or []) if x is not None]
        if not vals:
            return False     # IN () / IN (null…) matches nothing
        return any(leaf_keeps(name, param, ice_type, recorded, "=", x)
                   for x in vals)
    if name not in MONOTONE:
        return True
    if op in (">", ">="):
        t = transform_value(name, param, ice_type, value)
        c = _cmp(recorded, t)
        return True if c is None else c >= 0
    if op in ("<", "<="):
        t = transform_value(name, param, ice_type, value)
        c = _cmp(recorded, t)
        return True if c is None else c <= 0
    if op == "BETWEEN" and isinstance(value, dict):
        lo = transform_value(name, param, ice_type, value.get("start"))
        hi = transform_value(name, param, ice_type, value.get("end"))
        cl, ch = _cmp(recorded, lo), _cmp(recorded, hi)
        if cl is not None and cl < 0:
            return False
        if ch is not None and ch > 0:
            return False
        return True
    return True
