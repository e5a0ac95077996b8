"""Keyset (cursor) pagination: opaque resumable tokens + tuple-compare filters.

Reference surface:
- token: base64url JSON {table, mode, pivot, direction, query-signature hash},
  lib/src/query/query_executor.dart:3377-3389, 3685+;
- flow: fetch limit+1 for hasMore, next()/prev() executors, signature
  mismatch rejected — query_executor.dart:289-335, 393-397, 474-506, 657-723.

Spark-first design: a cursor is compiled into a lexicographic tuple-compare
filter ``(k1, k2, ..., pk) > (p1, p2, ..., ppk)`` expanded to OR-of-ANDs so
the leading-key bound pushes down to the Parquet scan.  Deep pagination is
O(page) instead of O(offset) — the property the reference documents as
"constant speed for deep paging" (README.md:957).
"""

from __future__ import annotations

import base64
import hashlib
import json
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


def query_signature(table: str, condition_map: Any, order_by: list[str],
                    space: str = "default") -> str:
    payload = json.dumps({"t": table, "w": condition_map, "o": order_by,
                          "sp": space},
                         sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def encode_cursor(table: str, sort_fields: list[tuple[str, bool]],
                  pivot: dict[str, Any], direction: str, signature: str) -> str:
    tok = {
        "table": table,
        "mode": "sortKey",
        "sort": [[f, d] for f, d in sort_fields],
        "pivot": {k: _jsonable(v) for k, v in pivot.items()},
        "direction": direction,
        "sig": signature,
    }
    raw = json.dumps(tok, sort_keys=True).encode()
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def decode_cursor(token: str) -> dict:
    pad = "=" * (-len(token) % 4)
    return json.loads(base64.urlsafe_b64decode(token + pad))


def _jsonable(v: Any) -> Any:
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    return str(v)


def keyset_filter(sort_fields: list[tuple[str, bool]], pivot: dict[str, Any],
                  resolver, reverse: bool = False) -> Column:
    """Build the strict lexicographic "after pivot" predicate.

    ``sort_fields``: [(field, descending)] including the PK tie-break as the
    last entry.  ``reverse=True`` flips every direction (prev-page).
    The expansion  (a,b) > (pa,pb)  ⇒  a > pa OR (a = pa AND b > pb)
    keeps the leading-key comparison sargable for pushdown.
    """
    clauses: list[Column] = []
    for i, (field, desc) in enumerate(sort_fields):
        effective_desc = (not desc) if reverse else desc
        resolved = resolver(field)
        col = resolved[0] if resolved else F.lit(None)
        pv = pivot.get(field)
        eq_prefix: Optional[Column] = None
        for pf, pdesc in sort_fields[:i]:
            presolved = resolver(pf)
            pcol = presolved[0] if presolved else F.lit(None)
            ppv = pivot.get(pf)
            this_eq = pcol.isNull() if ppv is None else (pcol == F.lit(ppv))
            eq_prefix = this_eq if eq_prefix is None else (eq_prefix & this_eq)
        if pv is None:
            # nulls sort first ASC / last DESC; "after null" ASC = any non-null
            strict = col.isNotNull() if not effective_desc else F.lit(False)
        else:
            strict = (col < F.lit(pv)) if effective_desc else (col > F.lit(pv))
            if effective_desc:
                # moving towards nulls-last region: nulls come after pivot
                strict = strict | col.isNull()
        clauses.append(strict if eq_prefix is None else (eq_prefix & strict))
    out = clauses[0]
    for c in clauses[1:]:
        out = out | c
    return out
