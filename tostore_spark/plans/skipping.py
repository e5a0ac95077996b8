"""Manifest-level data skipping: per-segment column min/max stats,
collected from parquet FOOTERS at flush time (zero extra Spark jobs —
the writer already computed them) and consulted by the query path to
drop whole segment roots whose value range cannot satisfy the WHERE.

At 100 TB an append-maintained table accumulates many delta segments
(store.flush_tables fast path); a time- or key-range query should read
only the segments whose range overlaps.  Parquet row-group skipping
does this INSIDE a file Spark already opened — this layer prunes the
file roots out of the scan before Spark lists them, the same job
Delta's per-file stats / Iceberg manifests do for their readers.

Semantics contract: pruning mirrors the loose-typed predicate model of
``condition.eval_leaf`` (value_matcher.dart:337-613) CONSERVATIVELY —
a segment is dropped only when NO value in [min, max] could satisfy
the compiled predicate.  Comparisons are type-aligned only (numeric
stats vs numeric value, string stats vs string value): a numeric
value against STRING column stats is never numerically coerced,
because parquet orders string stats lexicographically while loose_eq
would order them numerically — coercion there could prune a segment
that contains matching rows (e.g. min='10' < '9' lexicographically).
Callers must pass the NORMALIZED condition node (values coerced to
the field's schema type, query._normalize_node) so value types agree
with the column's physical stats type.  Anything undecidable keeps
the segment.
"""
from __future__ import annotations

import math
from typing import Any, Optional

#: stats are collected for at most this many leading primitive columns —
#: bounds manifest growth on very wide tables; pruning simply treats
#: uncovered columns as unknown
_MAX_STAT_COLS = 32


def _jsonable_scalar(v: Any) -> Any:
    """Footer statistics → JSON-safe python scalar, or None to drop the
    column (undecodable / exotic type)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return float(v)
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v
    return None   # dates/timestamps/decimals: skipped (see module doc)


def _temporal_scalar(v):
    """Footer date/timestamp statistic → a tz-normalized python value
    (naive datetimes = UTC, matching the engine's pinned session TZ),
    or None to drop."""
    import datetime
    if isinstance(v, datetime.datetime):
        try:
            if v.tzinfo is not None:
                v = v.astimezone(datetime.timezone.utc) \
                    .replace(tzinfo=None)
            # pandas.Timestamp (ns-unit stats) → plain datetime
            to_py = getattr(v, "to_pydatetime", None)
            return to_py() if to_py is not None else v
        except Exception:
            return None
    if isinstance(v, datetime.date):
        return v
    return None


def _fold_file(md, temporal: bool = False) -> dict:
    """ONE parquet file's footer → the summary shape
    ``{"rows": n, "cols": {col: {"min", "max", "nulls"}}}``.  A column
    is covered only when EVERY row group carries decodable min/max (or
    is provably all-null — then it contributes null counts only and its
    bounds stay None).  Only bool/int/float/string columns are
    summarized; decimals/nested types are skipped — their footer
    encodings vary and a wrong bound would prune live rows.

    ``temporal=True`` additionally covers date/timestamp columns
    (bounds as python date/datetime, tz-normalized to naive-UTC) — the
    Iceberg exporter's mode, where the bounds feed the spec's exact
    Appendix-D binary forms rather than the store manifest's JSON."""
    _OK_TYPES = ("BOOLEAN", "INT32", "INT64", "FLOAT", "DOUBLE",
                 "BYTE_ARRAY")
    total_rows = int(md.num_rows)
    sch = md.schema
    logical = {}
    temporal_cols: set[str] = set()
    for i in range(md.num_columns):
        c = sch.column(i)
        if "." in c.path:       # nested leaves: skip
            continue
        phys = str(c.physical_type)
        if phys not in _OK_TYPES:
            continue
        # BYTE_ARRAY must be a UTF-8 string, not raw binary
        if phys == "BYTE_ARRAY" and "String" not in str(c.logical_type):
            continue
        # INT32/64 carry dates/timestamps via logical types
        if phys in ("INT32", "INT64") and \
                str(c.logical_type) not in ("None", "NONE") and \
                "Int" not in str(c.logical_type):
            lt = str(c.logical_type)
            if temporal and (lt.startswith("Date")
                             or lt.startswith("Timestamp")):
                temporal_cols.add(c.path)
            else:
                continue
        logical[c.path] = i
    stats: dict[str, dict] = {}
    dropped: set[str] = set()
    for rg in range(md.num_row_groups):
        grp = md.row_group(rg)
        nrows = int(grp.num_rows)
        for name, ci in logical.items():
            if name in dropped:
                continue
            col = grp.column(ci)
            st = col.statistics
            if st is None:
                dropped.add(name)
                continue
            if not st.has_min_max:
                # an ALL-null chunk carries no bounds but is still
                # exactly summarizable: nulls only — min/max aggregates
                # and ordered predicates ignore it (bounds stay None)
                if st.has_null_count and int(st.null_count) == nrows:
                    mn = mx = None
                    nulls: Optional[int] = nrows
                else:
                    dropped.add(name)
                    continue
            else:
                if name in temporal_cols:
                    mn = _temporal_scalar(st.min)
                    mx = _temporal_scalar(st.max)
                else:
                    mn = _jsonable_scalar(st.min)
                    mx = _jsonable_scalar(st.max)
                if mn is None or mx is None:
                    dropped.add(name)
                    continue
                nulls = (int(st.null_count)
                         if st.has_null_count else None)
            ent = stats.get(name)
            if ent is None:
                if len(stats) >= _MAX_STAT_COLS:
                    continue
                stats[name] = {"min": mn, "max": mx, "nulls": nulls,
                               "rows": nrows}
            else:
                if ent["min"] is None:
                    ent["min"], ent["max"] = mn, mx
                elif mn is not None:
                    if _aligned_cmp(mn, ent["min"]) in (-1,):
                        ent["min"] = mn
                    if _aligned_cmp(mx, ent["max"]) in (1,):
                        ent["max"] = mx
                ent["rows"] += nrows
                ent["nulls"] = (None if nulls is None
                                or ent["nulls"] is None
                                else ent["nulls"] + nulls)
    for name in dropped:
        stats.pop(name, None)
    # row-group coverage: a column skipped by the cap in an early group
    # has partial bounds — drop it
    for name in [n for n, e in stats.items()
                 if e.pop("rows", None) != total_rows]:
        stats.pop(name, None)
    return {"rows": total_rows, "cols": stats}


def merge_summaries(summaries: list) -> dict:
    """Fold per-file summaries into one segment summary.  A column is
    covered only when covered in every NON-EMPTY file (an empty file
    contributes no rows and constrains nothing)."""
    total = sum(s["rows"] for s in summaries)
    live = [s for s in summaries if s["rows"] > 0]
    names = (set.intersection(*(set(s["cols"]) for s in live))
             if live else set())
    cols: dict[str, dict] = {}
    for n in names:
        mn = mx = None
        nulls: Optional[int] = 0
        for s in live:
            c = s["cols"][n]
            if c["min"] is not None:
                if mn is None:
                    mn, mx = c["min"], c["max"]
                else:
                    if _aligned_cmp(c["min"], mn) in (-1,):
                        mn = c["min"]
                    if _aligned_cmp(c["max"], mx) in (1,):
                        mx = c["max"]
            nulls = (None if nulls is None or c["nulls"] is None
                     else nulls + c["nulls"])
        cols[n] = {"min": mn, "max": mx, "nulls": nulls}
    return {"rows": total, "cols": cols}


def collect_parquet_stats(root: str, per_file: bool = False):
    """Walk every parquet file under ``root`` (local filesystem only)
    and fold its footer column statistics into one per-segment summary:

        {"rows": n, "cols": {col: {"min": v, "max": v, "nulls": n|None}}}

    ``rows`` is the segment's TOTAL row count (always present — footers
    carry num_rows even when no column has stats), which both the
    null-semantics pruning and the metadata-only aggregate fast paths
    (``engine.stats_count`` / ``stats_min_max``) consume.

    ``per_file=True`` additionally returns the per-FILE summaries as
    ``(segment_summary, {relative_path: file_summary})`` — the payload
    of the ``_filestats.json`` sidecar that file-grain skipping
    (``engine.pruned_df``) prunes with.

    Metadata-only reads — no data pages touched.  Returns ``{}`` (or
    ``({}, {})``) — never raises — when stats cannot be collected: a
    non-local scheme, no files, or a pyarrow hiccup; skipping is an
    optimization, absence is always correct.
    """
    import os
    empty = ({}, {}) if per_file else {}
    if "://" in root and not root.startswith("file:"):
        return empty   # object-store footers: future hook (module doc)
    path = root[len("file:"):] if root.startswith("file:") else root
    try:
        import pyarrow.parquet as pq
    except ImportError:                                # pragma: no cover
        return empty
    files = []
    try:
        for dirpath, dirs, names in os.walk(path):
            # Spark readers ignore _/.-prefixed dirs (e.g. a replace
            # epoch's _deletes key set) — stats must match what the
            # scan sees
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            files.extend(os.path.join(dirpath, n) for n in names
                         if n.endswith(".parquet"))
    except OSError:
        return empty
    if not files:
        return empty
    by_file: dict[str, dict] = {}
    try:
        for fp in files:
            rel = os.path.relpath(fp, path).replace(os.sep, "/")
            by_file[rel] = _fold_file(pq.ParquetFile(fp).metadata)
    except Exception:
        return empty
    summary = merge_summaries(list(by_file.values()))
    return (summary, by_file) if per_file else summary


def _aligned_cmp(a: Any, b: Any) -> Optional[int]:
    """Type-ALIGNED ordered compare (see module doc: no cross-type
    numeric coercion against string stats).  None = undecidable.
    Dates compare with dates and (same-awareness) datetimes with
    datetimes — never across the two kinds (a datetime is a subclass
    of date, but Spark treats the column types as distinct)."""
    if a is None or b is None:
        return None
    if isinstance(a, bool) or isinstance(b, bool):
        if isinstance(a, bool) and isinstance(b, bool):
            return (a > b) - (a < b)
        return None
    import datetime
    dt_a = isinstance(a, datetime.datetime)
    dt_b = isinstance(b, datetime.datetime)
    if dt_a or dt_b:
        if dt_a and dt_b and (a.tzinfo is None) == (b.tzinfo is None):
            return (a > b) - (a < b)
        return None
    d_a = isinstance(a, datetime.date)
    d_b = isinstance(b, datetime.date)
    if d_a or d_b:
        return (a > b) - (a < b) if d_a and d_b else None
    num_a = isinstance(a, (int, float))
    num_b = isinstance(b, (int, float))
    if num_a and num_b:
        return (a > b) - (a < b)
    if isinstance(a, str) and isinstance(b, str):
        return (a > b) - (a < b)
    return None


def bloom_key(value: Any) -> Optional[str]:
    """The canonical hash input for a bloom-skippable value: matches
    the build side's Spark ``CAST(col AS STRING)`` exactly.  Only
    integral and string values participate (floats: cast formatting
    diverges; bools: pointless) — None disables the test."""
    if value is None or isinstance(value, (bool, float)):
        return None
    if isinstance(value, int):
        return str(value)
    if isinstance(value, str):
        return value
    return None


#: bloom hash-format marker: Kirsch-Mitzenmacher double hashing over
#: ONE md5 per value.  Sidecars WITHOUT the marker are legacy
#: crc32-salt bitmaps and keep probing via ``bloom_positions`` (sound:
#: build and probe agree; only the FP rate is the legacy one).
BLOOM_H_MD5KM = "md5km"


def bloom_positions(key: str, m: int, k: int) -> list:
    """LEGACY (pre-r17 sidecars only) — crc32 over ``key#i``.  Kept so
    bitmaps persisted by older flushes still probe soundly.  Do not use
    for new bitmaps: crc32 is GF(2)-LINEAR, so for equal-length salts
    ``crc32(key#i) XOR crc32(key#0)`` is a key-independent constant,
    and the power-of-two ``% m`` keeps only low bits — the k
    "independent" hashes collapse to ~one small fingerprint per key.
    Measured fpp 0.023 at (m=2048, k=14, n=50) and 0.117 at
    (m=65536, k=4, n=2000) vs the 2.9e-8 / 1.7e-4 independent-hash
    theory — ``bloom_positions_md5km`` restores the theoretical rate."""
    import zlib
    return [zlib.crc32(f"{key}#{i}".encode("utf-8")) % m
            for i in range(k)]


def bloom_positions_md5km(key: str, m: int, k: int) -> list:
    """The k bit positions for one value — Kirsch-Mitzenmacher double
    hashing over ONE md5: h1 = first 15 hex chars, h2 = hex chars
    17..31 forced odd (odd ∧ m power-of-two → full period), position_i
    = (h1%m + i·(h2|1)%m) % m.  EXACTLY mirrors the Spark build
    expression (``md5(cast(col as string))`` + ``conv``/``substring``)
    — both sides reduce mod m BEFORE the multiply so 64-bit overflow
    can never fork them."""
    import hashlib
    h = hashlib.md5(key.encode("utf-8")).hexdigest()
    h1 = int(h[0:15], 16) % m
    h2 = (int(h[16:31], 16) | 1) % m
    return [(h1 + i * h2) % m for i in range(k)]


def bloom_position_exprs(col_name: str, m: int, k: int) -> list:
    """The Spark build-side twin of ``bloom_positions_md5km``: k struct
    columns ``(c=col_name, p=position_i)`` over ``md5(cast(col as
    string))``, shared by every bitmap builder (store flush sidecars
    AND the export delete probes) so the driver-side probe matches
    bit-for-bit.  Null values yield null positions (callers filter)."""
    from pyspark.sql import functions as F
    h = F.md5(F.col(col_name).cast("string"))
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(m)
    h2 = (F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
          .bitwiseOR(F.lit(1)) % F.lit(m))
    return [F.struct(F.lit(col_name).alias("c"),
                     ((h1 + F.lit(i) * h2) % F.lit(m)).alias("p"))
            for i in range(k)]


def bloom_may_contain(bloom: dict, col: str, value: Any) -> bool:
    """Segment-level bloom membership: False ONLY when the value is
    provably absent from the segment.  ``bloom`` is the decoded sidecar
    ({"m", "k", "cols": {col: bitmap bytes}, "h": format marker});
    anything undecidable (no bitmap for the column, un-keyable value)
    keeps the segment.  The ``h`` marker picks the position formula —
    missing marker = legacy crc32 bitmaps (old persisted sidecars)."""
    bits = (bloom.get("cols") or {}).get(col)
    if bits is None:
        return True
    key = bloom_key(value)
    if key is None:
        return True
    m, k = int(bloom["m"]), int(bloom["k"])
    pos = (bloom_positions_md5km if bloom.get("h") == BLOOM_H_MD5KM
           else bloom_positions)
    for p in pos(key, m, k):
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def build_bloom_payload(df, cfg: dict, root: str = "") -> dict:
    """The flush-side bloom build: ONE distributed job over the frame
    just written — k md5 double-hash positions per (row, bloom column)
    (``bloom_position_exprs``, the ``bloom_positions_md5km`` twin),
    distinct
    (file, col, pos) triples to the driver (bounded by
    |files|·|cols|·m rows, never by the data), folded into per-column
    bitmaps at BOTH granularities: the segment roll-up and a per-file
    map keyed by the same relative paths as the ``_filestats.json``
    sidecar, so a point lookup can skip files INSIDE a surviving
    segment (the post-OPTIMIZE single-segment case).

    ``cfg`` = {"cols": [...], "m": bits, "k": hashes}; ``root`` = the
    segment dir the relative file keys are computed against.  Returns
    {"m", "k", "h", "cols": {col: b64}, "files": {rel: {col: b64}}} — {}
    when no configured column exists in the frame.  Nulls hash to null
    positions and are filtered (a null never equals anything the bloom
    is consulted for)."""
    from pyspark.sql import functions as F
    import base64
    cols = [c for c in cfg.get("cols", ()) if c in df.columns]
    if not cols:
        return {}
    m, k = int(cfg.get("m", 65536)), int(cfg.get("k", 4))
    entries = []
    for c in cols:
        entries.extend(bloom_position_exprs(c, m, k))
    rows = (df.select(F.input_file_name().alias("f"),
                      F.explode(F.array(*entries)).alias("e"))
              .select("f", "e.c", "e.p").where(F.col("p").isNotNull())
              .distinct().collect())

    def _rel(uri: str) -> str:
        p = uri[len("file:"):] if uri.startswith("file:") else uri
        p = p.lstrip("/")
        r = root[len("file:"):] if root.startswith("file:") else root
        r = r.lstrip("/").rstrip("/")
        return p[len(r) + 1:] if r and p.startswith(r + "/") else p

    seg_maps = {c: bytearray((m + 7) >> 3) for c in cols}
    file_maps: dict = {}
    for r in rows:
        p = int(r["p"])
        seg_maps[r["c"]][p >> 3] |= 1 << (p & 7)
        fm = file_maps.setdefault(_rel(r["f"]), {})
        bm = fm.get(r["c"])
        if bm is None:
            bm = fm[r["c"]] = bytearray((m + 7) >> 3)
        bm[p >> 3] |= 1 << (p & 7)

    def _enc(maps):
        return {c: base64.b64encode(bytes(b)).decode("ascii")
                for c, b in maps.items()}

    return {"m": m, "k": k, "h": BLOOM_H_MD5KM, "cols": _enc(seg_maps),
            "files": {rel: _enc(fm) for rel, fm in file_maps.items()}}


def _leaf_may_match(field: str, op: str, value: Any, summary: dict,
                    table: str) -> bool:
    """Could ANY row of a segment with these column stats satisfy this
    leaf?  True (keep) whenever undecidable."""
    f = field
    if "." in f:
        tbl, bare = f.split(".", 1)
        if tbl != table:
            return True        # joined-table field: not ours to prune
        f = bare
    ent = (summary.get("cols") or {}).get(f)
    if ent is None:
        return True
    mn, mx = ent.get("min"), ent.get("max")
    nulls, rows = ent.get("nulls"), summary.get("rows")
    has_nonnull = not (nulls is not None and rows is not None
                      and nulls >= rows)

    if op == "IS":
        if value is None:
            return nulls is None or nulls > 0
        op = "="              # IS <non-null> behaves as loose equality
    if op == "IS NOT":
        if value is None:
            return has_nonnull
        return True           # != on a range: almost never decidable

    if op == "=" and value is None:
        # loose_eq(rv, None) is true only for null rows
        return nulls is None or nulls > 0
    if op in ("=", ">", ">=", "<", "<=", "BETWEEN", "IN", "LIKE") \
            and not has_nonnull:
        return False          # null rows satisfy none of these
    bloom = summary.get("bloom")
    if op == "=":
        lo, hi = _aligned_cmp(value, mn), _aligned_cmp(value, mx)
        if lo is not None and hi is not None \
                and not (lo >= 0 and hi <= 0):
            return False
        # in-range (or range-undecidable): the bloom bitmap can still
        # prove the exact value absent — the point-lookup case min/max
        # can never decide on a high-cardinality unsorted key
        if bloom is not None and not bloom_may_contain(bloom, f, value):
            return False
        return True
    if op in ("!=", "<>"):
        # only prunable when every row equals value AND none is null
        if value is None:
            return True       # != null is true for every non-null row
        if (nulls == 0 and _aligned_cmp(mn, value) == 0
                and _aligned_cmp(mx, value) == 0):
            return False
        return True
    if op in (">", ">="):
        c = _aligned_cmp(mx, value)
        if c is None:
            return True
        return c > 0 if op == ">" else c >= 0
    if op in ("<", "<="):
        c = _aligned_cmp(mn, value)
        if c is None:
            return True
        return c < 0 if op == "<" else c <= 0
    if op == "BETWEEN":
        lo = _aligned_cmp(mx, value["start"])
        hi = _aligned_cmp(mn, value["end"])
        if lo is None or hi is None:
            return True
        return lo >= 0 and hi <= 0
    if op == "IN":
        vals = value or []
        if not vals:
            return False      # IN () matches nothing (eval_leaf: any([]))
        for v in vals:
            lo, hi = _aligned_cmp(v, mn), _aligned_cmp(v, mx)
            in_range = (True if (lo is None or hi is None)
                        else (lo >= 0 and hi <= 0))
            if in_range and (bloom is None
                             or bloom_may_contain(bloom, f, v)):
                return True
        return False
    if op in ("LIKE",):
        # literal prefix bound: rows matching 'abc%...' sit in
        # ['abc', 'abc￿...']; decidable only for string stats
        if not isinstance(value, str) or not isinstance(mn, str) \
                or not isinstance(mx, str):
            return True
        prefix = ""
        for ch in value:
            if ch in ("%", "_"):
                break
            if ch == "\\":
                return True   # escaped pattern: stay conservative
            prefix += ch
        if not prefix:
            return True
        # Upper bound: the smallest string ABOVE every 'prefix*' match
        # is the prefix with its last code point incremented (carrying
        # left past U+10FFFF).  Appending U+FFFF instead would be WRONG:
        # a match whose suffix starts with an astral code point (e.g.
        # 'abc\U0001F600' for LIKE 'abc%') sorts above prefix+'￿',
        # so that bound can prune a segment that contains matches.
        cps = list(prefix)
        upper = None
        while cps:
            o = ord(cps[-1])
            if o < 0x10FFFF:
                upper = "".join(cps[:-1]) + chr(o + 1)
                break
            cps.pop()
        if mx < prefix:
            return False
        return upper is None or mn < upper
    return True               # NOT LIKE / NOT IN / unknown ops


def node_may_match(node, stats: dict, table: str) -> bool:
    """Conservative three-valued evaluation of a (normalized) condition
    tree against one segment's column stats: False ONLY when no row in
    the segment's value ranges can satisfy the tree."""
    if node is None:
        return True
    if node.kind == "leaf":
        try:
            return _leaf_may_match(node.field, node.op, node.value,
                                   stats, table)
        except Exception:
            return True
    kids = node.children
    if not kids:
        return True
    if node.kind == "and":
        return all(node_may_match(c, stats, table) for c in kids)
    return any(node_may_match(c, stats, table) for c in kids)


def prune_segments(segments: list[str], stats_by_seg: dict,
                   node, table: str,
                   norm=lambda p: p) -> list[str]:
    """Return the segments whose stats admit the condition.  A segment
    with no stats entry always survives."""
    out = []
    for seg in segments:
        st = stats_by_seg.get(norm(seg))
        if st and not node_may_match(node, st, table):
            continue
        out.append(seg)
    return out


def scan_output_rows(df) -> int | None:
    """Sum of ``numOutputRows`` across the executed plan's file-scan
    leaves — the observable for ROW-GROUP-grain pruning, the rung
    BELOW this module's manifest/file grain.

    Spark's vectorized parquet reader already skips row groups (and
    dictionary/stats-filtered pages) whose footer stats refute the
    PUSHED filters — per-row-group min/max live in the same footers
    this module reads, but the reader consults them itself, so no
    sidecar is needed at that grain.  What CAN silently disappear is
    the pushdown: a scan rebuilt from an explicit file list
    (``engine.pruned_df``), a type-changing projection, or a UDF in
    the predicate all break it, and then every row group is read.
    This helper makes the effect measurable: call AFTER an action on
    ``df`` (metrics populate on execution) and compare against the
    table's total rows — ``scan rows << total`` proves row-group
    pruning engaged end-to-end (tests/test_skipping.py pins it for
    the query path; BENCH_DETAIL.skipping records it per round).

    Returns None when no file-scan leaf with the metric is found
    (cached relations, pure-metadata plans)."""
    try:
        plan = df._jdf.queryExecution().executedPlan()
        leaves = plan.collectLeaves()
        total = None
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if "FileSourceScan" not in leaf.getClass().getName():
                continue
            m = leaf.metrics()
            if m.contains("numOutputRows"):
                v = int(m.apply("numOutputRows").value())
                total = v if total is None else total + v
        return total
    except Exception:                              # pragma: no cover
        return None
