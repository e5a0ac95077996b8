"""QueryBuilder: the reference's chainable query surface compiled to a
declarative DataFrame plan.

Reference surface:
- builder chain               lib/src/chain/query_builder.dart:93-543,
                              lib/src/chain/chain_builder.dart:23-289
- join API + semantics        lib/src/model/join_clause.dart:2-11;
                              lib/src/query/query_executor.dart:1403-1731
- output naming (table.field, conflict stripping)
                              query_executor.dart:1550-1578;
                              query_builder.dart:705-823
- groupBy/having              query_builder.dart:111-140, 679-690
- orderBy/limit/offset        chain_builder.dart:42-76;
                              query_executor.dart:339-391, 637-655
- cursor pagination           query_executor.dart:289-335, 3377-3389

Execution is one declarative plan handed to Catalyst: predicate pushdown,
column pruning, join strategy (broadcast for small dims), partial
aggregation, and TakeOrderedAndProject(top-k) all come from the optimizer —
none of the reference's hand-rolled scan/index machinery is replicated
(SURVEY.md §4.2: it is all built into Spark).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tostore_spark import cursor as cursor_mod
from tostore_spark.agg import Agg
from tostore_spark.compile import condition_to_column, order_columns, parse_order_field
from tostore_spark.condition import ConditionNode, QueryCondition
from tostore_spark.schema import coerce_to_type

_ALIAS_RE = re.compile(r"^(.*?)\s+as\s+([a-zA-Z0-9_]+)$", re.IGNORECASE)


class _Frame:
    """A DataFrame plus column provenance: (table, field, current name)."""

    def __init__(self, df: DataFrame, prov: list[tuple[str, str, str]]):
        self.df = df
        self.prov = prov

    def resolver(self):
        """Field reference → (Column, DataType).  Accepts ``t.f``, ``t_f``
        and bare ``f`` (query_builder.dart:705-823); returns None for
        unknown fields (they evaluate as null, value_matcher.dart:517-531).
        """
        by_name = {name: name for _, _, name in self.prov}
        by_qual: dict[str, str] = {}
        by_bare: dict[str, Optional[str]] = {}
        for tbl, fld, name in self.prov:
            if tbl:
                by_qual[f"{tbl}.{fld}"] = name
                by_qual.setdefault(f"{tbl}_{fld}", name)
            if fld in by_bare and by_bare[fld] != name:
                by_bare[fld] = None  # ambiguous
            else:
                by_bare.setdefault(fld, name)
        dtypes = {f.name: f.dataType for f in self.df.schema.fields}

        def resolve(ref: str):
            name = by_name.get(ref) or by_qual.get(ref)
            if name is None:
                name = by_bare.get(ref)
            if name is None:
                return None
            return F.col(name), dtypes[name]

        return resolve


class QueryResult:
    """list-of-dict result + pagination handles (query_result.dart:4-124)."""

    #: True when run() had no explicit limit and default_query_limit capped it
    default_limit_applied = False

    def __init__(self, records: list[dict], has_more: bool = False,
                 has_prev: bool = False, next_token: Optional[str] = None,
                 prev_token: Optional[str] = None, builder: Optional["QueryBuilder"] = None):
        self.records = records
        self.has_more = has_more
        self.has_prev = has_prev
        self.next_token = next_token
        self.prev_token = prev_token
        self._builder = builder

    def __len__(self):
        return len(self.records)

    def __iter__(self):
        return iter(self.records)

    def __getitem__(self, i):
        return self.records[i]

    def next_page(self) -> "QueryResult":
        if not (self.has_more and self.next_token and self._builder):
            return QueryResult([], builder=self._builder)
        return self._builder.clone().cursor(self.next_token).run()

    def prev_page(self) -> "QueryResult":
        if not (self.has_prev and self.prev_token and self._builder):
            return QueryResult([], builder=self._builder)
        return self._builder.clone().cursor(self.prev_token).run()


class QueryBuilder:
    def __init__(self, engine, table: str):
        self._engine = engine
        self._table = table
        self._cond = QueryCondition()
        self._select: Optional[list] = None
        self._aggs: list[Agg] = []
        self._group_by: Optional[list[str]] = None
        self._having: Optional[QueryCondition] = None
        self._order_by: list[str] = []
        self._limit: Optional[int] = None
        self._offset: Optional[int] = None
        self._joins: list[tuple[str, str, str, str, str]] = []  # how, table, lk, op, rk
        self._join_hints: dict[str, str] = {}
        self._distinct: Optional[Union[bool, list[str]]] = None
        self._cursor_token: Optional[str] = None
        self._cache_enabled: Optional[bool] = None  # None = engine default
        self._cache_expiry_s: Optional[float] = None
        self._group_mode: str = "groupby"  # groupby | rollup | cube
        self._sample_filter: Optional[tuple] = None  # (field, permyriad)

    # ---- chain: predicates -------------------------------------------
    def where(self, field, op=None, value="__missing__"):
        self._cond.where(field, op, value)
        return self

    def or_where(self, field, op=None, value="__missing__"):
        self._cond.or_where(field, op, value)
        return self

    def condition(self, sub: QueryCondition):
        self._cond.condition(sub)
        return self

    def or_condition(self, sub: QueryCondition):
        self._cond.or_condition(sub)
        return self

    def __getattr__(self, name):
        # forward where_* sugar to the condition tree, preserving chaining
        if name.startswith("where_") and hasattr(QueryCondition, name):
            def fwd(*a, **kw):
                getattr(self._cond, name)(*a, **kw)
                return self
            return fwd
        raise AttributeError(name)

    # ---- chain: shape -------------------------------------------------
    def select(self, fields: Sequence[Union[str, Agg]]):
        self._select = list(fields)
        for f in fields:
            if isinstance(f, Agg):
                self._aggs.append(f)
        return self

    def select_agg(self, aggs: Sequence[Agg]):
        self._aggs.extend(aggs)
        return self

    def group_by(self, fields: Sequence[str]):
        self._group_by = list(fields)
        return self

    def group_by_rollup(self, fields: Sequence[str]):
        """Hierarchical subtotals (parity-plus: GROUP BY ROLLUP)."""
        self._group_by = list(fields)
        self._group_mode = "rollup"
        return self

    def group_by_cube(self, fields: Sequence[str]):
        """All grouping-set combinations (parity-plus: GROUP BY CUBE)."""
        self._group_by = list(fields)
        self._group_mode = "cube"
        return self

    def having(self, cond: QueryCondition):
        self._having = cond
        return self

    def distinct(self, fields: Optional[Sequence[str]] = None):
        self._distinct = list(fields) if fields else True
        return self

    # ---- set operations (parity-plus: the reference only unions
    # internally for DNF predicate splits, compile.py:150 mirrors that;
    # these expose the full SQL set algebra on compiled queries) --------
    def union(self, other: "QueryBuilder", all: bool = False) -> DataFrame:
        """UNION [ALL] with another compiled query — by column NAME
        (position-independent), so two projections of the same shape
        compose regardless of select order.  Distinct union is one
        hash-aggregate over the combined rows; ALL is a zero-shuffle
        concatenation."""
        out = self.df().unionByName(other.df())
        return out if all else out.distinct()

    def intersect(self, other: "QueryBuilder", all: bool = False) -> DataFrame:
        """INTERSECT [ALL] (SQL bag semantics for ALL; null-safe equality
        — Spark's set ops match nulls, unlike = )."""
        a, b = self.df(), other.df()
        b = b.select(*a.columns)
        return a.intersectAll(b) if all else a.intersect(b)

    def except_(self, other: "QueryBuilder", all: bool = False) -> DataFrame:
        """EXCEPT [ALL] — rows of this query not in ``other``."""
        a, b = self.df(), other.df()
        b = b.select(*a.columns)
        return a.exceptAll(b) if all else a.subtract(b)

    def explain(self, mode: str = "formatted") -> str:
        """The compiled physical plan as a string (the .explain surface
        for chain-built queries — read it, or assert shapes in tests)."""
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.df().explain(mode)
        return buf.getvalue()

    def sample(self, fraction: float, hash_field: Optional[str] = None):
        """Deterministic sample: keep ~``fraction`` of rows by md5 of
        ``hash_field`` (default: the table's primary key).  Unlike
        DataFrame.sample this is a plain FILTER — reproducible across
        runs/resumes, composable with pushdown, and stable under
        repartitioning (llmops.pipeline.hash_fraction is the same
        primitive)."""
        field = hash_field or self._engine.primary_key(self._table)
        if not field:
            raise ValueError("sample() needs hash_field when the table "
                             "has no primary key")
        from tostore_spark.llmops.pipeline import hash_fraction
        self._sample_filter = (field, int(float(fraction) * 10000))
        return self

    def order_by_asc(self, *fields: str):
        self._order_by.extend(fields)
        return self

    def order_by_desc(self, *fields: str):
        self._order_by.extend(f"-{f}" for f in fields)
        return self

    def limit(self, n: int):
        self._limit = n
        return self

    def offset(self, n: int):
        self._offset = n
        return self

    def cursor(self, token: str):
        self._cursor_token = token
        return self

    # ---- per-query cache control (query_builder.dart:258-289) ---------
    def use_query_cache(self, expiry_ms: Optional[int] = None):
        """Opt this query into the result cache, optionally with a
        time-based expiry overriding the global default."""
        self._cache_enabled = True
        self._cache_expiry_s = expiry_ms / 1000.0 if expiry_ms else None
        return self

    def no_query_cache(self):
        """Disable result caching for this query only."""
        self._cache_enabled = False
        return self

    def clear_query_cache(self) -> bool:
        """Drop cached results for this exact query shape."""
        cache = getattr(self._engine, "query_cache", None)
        if cache is None:
            return True
        cache.clear_signature(self._full_signature())
        return True

    # ---- chain: joins (join_clause.dart:2-11; query_builder.dart:151-253)
    def join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        return self._add_join("inner", table, first_key, op, second_key)

    def left_join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        return self._add_join("left", table, first_key, op, second_key)

    def right_join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        return self._add_join("right", table, first_key, op, second_key)

    # parity-plus join types (the reference stops at inner/left/right,
    # join_clause.dart:2-11; these complete the standard set) ----------
    def semi_join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        """EXISTS-style filter: keep main-table rows with at least one
        match; no columns from ``table`` enter the result (so no
        fan-out on multi-match keys — cheaper than join+distinct)."""
        return self._add_join("semi", table, first_key, op, second_key)

    def anti_join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        """NOT EXISTS: keep main-table rows with NO match in ``table`` —
        the set-difference workhorse (decontamination, orphan checks)."""
        return self._add_join("anti", table, first_key, op, second_key)

    def full_join(self, table: str, first_key: str, op: str = "=", second_key: str = None):
        """FULL OUTER: unmatched rows from BOTH sides survive with nulls
        on the other side; columns merge under the same table_field
        naming as left/right joins."""
        return self._add_join("full", table, first_key, op, second_key)

    def join_hint(self, table: str, hint: str = "broadcast"):
        """Explicit join-strategy hint for a joined table: ``broadcast``
        forces a broadcast-hash join of that side, ``shuffle`` forces a
        shuffle (SHUFFLE_HASH) even under the AQE threshold.  Use when
        statistics mislead the planner — e.g. a filtered-small dimension
        AQE only discovers after the first shuffle, or a dimension that
        LOOKS small but explodes downstream."""
        if hint not in ("broadcast", "shuffle"):
            raise ValueError(f"unknown join hint {hint!r}")
        self._join_hints[table] = hint
        return self

    def _add_join(self, how, table, first_key, op, second_key):
        if second_key is None:
            second_key, op = op, "="
        if op not in ("=", "!=", "<>", "<", ">", "<=", ">="):
            raise ValueError(f"unsupported join operator: {op}")
        self._joins.append((how, table, first_key, op, second_key))
        return self

    def join_with_foreign_key(self, table: str, how: str = "inner"):
        """FK auto-join (query_builder.dart:210-253, 851-951): resolve FK
        metadata between main table and `table` into an equi-join; composite
        FKs join on the first pair, the rest become WHERE equalities."""
        fk = self._engine.find_foreign_key(self._table, table)
        if fk is None:
            raise ValueError(f"no foreign key between {self._table} and {table}")
        child, parent, fields, rfields = fk
        if child == self._table:
            lks = [f"{self._table}.{f}" for f in fields]
            rks = [f"{table}.{rf}" for rf in rfields]
        else:
            lks = [f"{self._table}.{rf}" for rf in rfields]
            rks = [f"{table}.{f}" for f in fields]
        self._add_join(how, table, lks[0], "=", rks[0])
        for lk, rk in zip(lks[1:], rks[1:]):
            self._joins.append(("__extra_eq__", table, lk, "=", rk))
        return self

    def join_referenced_table(self, table: str):
        """Child → parent FK auto-join (query_builder.dart:210-253)."""
        return self.join_with_foreign_key(table)

    def join_referencing_table(self, table: str):
        """Parent → child FK auto-join (query_builder.dart:210-253)."""
        return self.join_with_foreign_key(table)

    def clone(self) -> "QueryBuilder":
        import copy

        qb = QueryBuilder(self._engine, self._table)
        qb._cond = copy.deepcopy(self._cond)
        qb._select = list(self._select) if self._select else None
        qb._aggs = list(self._aggs)
        qb._group_by = list(self._group_by) if self._group_by else None
        qb._group_mode = self._group_mode
        qb._having = copy.deepcopy(self._having)
        qb._order_by = list(self._order_by)
        qb._limit, qb._offset = self._limit, self._offset
        qb._joins = list(self._joins)
        qb._join_hints = dict(self._join_hints)
        qb._distinct = self._distinct
        qb._cache_enabled = self._cache_enabled
        qb._cache_expiry_s = self._cache_expiry_s
        qb._sample_filter = self._sample_filter
        return qb

    # ---- plan build ---------------------------------------------------
    def _base_frame(self) -> _Frame:
        df = self._engine.df(self._table)
        frame = _Frame(df, [(self._table, c, c) for c in df.columns])
        if not self._cond.is_empty():
            # manifest-level segment skipping (engine.pruned_df): the
            # NORMALIZED node (values coerced to field types) keeps the
            # stat compares type-aligned; any failure falls back to the
            # full scan — skipping is an optimization, never semantics
            try:
                node = self._normalize_node(
                    self._cond.root().simplify(), frame)
                pruned = self._engine.pruned_df(self._table, node)
            except Exception:
                pruned = None
            if pruned is not None:
                frame = _Frame(pruned, frame.prov)
        return frame

    def _normalize_node(self, node: ConditionNode, frame: _Frame) -> ConditionNode:
        """Coerce leaf values to field schema types
        (query_condition.dart:743-835) so loose typing (1 == "1") resolves
        at compile time and literals stay pushdown-friendly."""
        if node.kind == "leaf":
            fs = self._field_schema(node.field, frame)
            if fs is None:
                return node
            v = node.value
            if node.op in ("IN", "NOT IN"):
                v = [coerce_to_type(x, fs.type) for x in (v or [])]
            elif node.op == "BETWEEN":
                v = {"start": coerce_to_type(v["start"], fs.type),
                     "end": coerce_to_type(v["end"], fs.type)}
            elif node.op in ("LIKE", "NOT LIKE"):
                pass
            else:
                v = coerce_to_type(v, fs.type)
            return ConditionNode("leaf", node.field, node.op, v)
        return ConditionNode(node.kind,
                             children=[self._normalize_node(c, frame) for c in node.children])

    def _field_schema(self, ref: str, frame: _Frame):
        tbl, fld = (ref.split(".", 1) + [None])[:2] if "." in ref else (None, ref)
        if tbl is None:
            tbl, fld = None, ref
        for ptbl, pfld, _name in frame.prov:
            if pfld == fld and (tbl is None or tbl == ptbl):
                sch = self._engine.schema(ptbl) if ptbl else None
                return sch.field(pfld) if sch else None
        return None

    def _apply_joins(self, frame: _Frame) -> _Frame:
        join_seq = 0
        for how, table, lk, op, rk in self._joins:
            if how == "__extra_eq__":
                continue  # handled with its primary clause below
            join_seq += 1
            jdf = self._engine.df(table)
            hint = self._join_hints.get(table)
            if hint == "broadcast":
                jdf = jdf.hint("broadcast")
            elif hint == "shuffle":
                jdf = jdf.hint("shuffle_hash")
            # temp-rename the right side to collision-free names
            tmp_names = {c: f"__j{join_seq}__{c}" for c in jdf.columns}
            for old, new in tmp_names.items():
                jdf = jdf.withColumnRenamed(old, new)
            jprov = [(table, c, tmp_names[c]) for c in self._engine.df(table).columns]

            lresolve = frame.resolver()
            rres = {f: (F.col(n), None) for _, f, n in jprov}
            rres.update({f"{table}.{f}": (F.col(n), None) for _, f, n in jprov})

            def rresolve(ref):
                return rres.get(ref)

            lcol = (lresolve(lk) or (None,))[0]
            rcol = (rresolve(rk) or (None,))[0]
            if lcol is None or rcol is None:
                # allow keys written in either order (query_builder.dart:151-190)
                lcol = (lresolve(rk) or (None,))[0]
                rcol = (rresolve(lk) or (None,))[0]
            if lcol is None or rcol is None:
                raise ValueError(f"cannot resolve join keys {lk}, {rk}")

            lname = self._colname_for(frame, lk) or self._colname_for(frame, rk)
            ltype = dict((f.name, f.dataType) for f in frame.df.schema.fields).get(lname)
            rname = next(n for _, f, n in jprov if rk.endswith(f))
            rtype = dict((f.name, f.dataType) for f in jdf.schema.fields).get(rname)
            lkey, rkey = lcol, rcol
            if ltype is not None and rtype is not None and _kind(ltype) != _kind(rtype):
                # loose join-key matching: canonicalize via string, matching
                # the reference's toString() keys (query_executor.dart:1526-1547)
                lkey, rkey = lcol.cast("string"), rcol.cast("string")

            cond = {"=": lkey == rkey, "!=": lkey != rkey, "<>": lkey != rkey,
                    "<": lkey < rkey, ">": lkey > rkey,
                    "<=": lkey <= rkey, ">=": lkey >= rkey}[op]
            # composite-FK extra equalities ride along as join predicates
            for xhow, xtable, xlk, _xop, xrk in self._joins:
                if xhow == "__extra_eq__" and xtable == table:
                    xl = (lresolve(xlk) or (None,))[0]
                    xr = (rresolve(xrk.split(".")[-1]) or (None,))[0]
                    if xl is not None and xr is not None:
                        cond = cond & (xl == xr)

            spark_how = {"semi": "left_semi", "anti": "left_anti",
                         "full": "full_outer"}.get(how, how)
            joined = frame.df.join(jdf, on=cond, how=spark_how)
            if how in ("semi", "anti"):
                # filter joins contribute no right-side columns
                frame = _Frame(joined, frame.prov)
            else:
                frame = _Frame(joined, frame.prov + jprov)
        return self._finalize_names(frame)

    def _colname_for(self, frame: _Frame, ref: str) -> Optional[str]:
        r = frame.resolver()(ref)
        if r is None:
            return None
        # resolver returns F.col(name); recover name via prov lookup
        tbl, fld = ref.split(".", 1) if "." in ref else (None, ref)
        for ptbl, pfld, name in frame.prov:
            if pfld == fld and (tbl is None or ptbl == tbl):
                return name
        for ptbl, pfld, name in frame.prov:
            if name == ref:
                return name
        return None

    def _finalize_names(self, frame: _Frame) -> _Frame:
        """Output naming parity (query_executor.dart:1550-1578): every joined
        column is conceptually ``table.field``; names that conflict across
        tables keep a ``table_field`` prefix, unconflicted names are bare."""
        if not self._joins:
            return frame
        from collections import Counter

        counts = Counter(f for _, f, _ in frame.prov)
        new_prov, df = [], frame.df
        used: set[str] = set()
        for tbl, fld, name in frame.prov:
            out = fld if counts[fld] == 1 else f"{tbl}_{fld}"
            while out in used:
                out = out + "_"
            used.add(out)
            if out != name:
                df = df.withColumnRenamed(name, out)
            new_prov.append((tbl, fld, out))
        return _Frame(df, new_prov)

    def _apply_condition(self, frame: _Frame) -> _Frame:
        if self._cond.is_empty():
            return frame
        node = self._normalize_node(self._cond.root(), frame)
        col = condition_to_column(node, frame.resolver())
        return _Frame(frame.df.filter(col), frame.prov)

    def _apply_agg(self, frame: _Frame) -> _Frame:
        if not self._aggs:
            return frame
        resolver = frame.resolver()
        agg_cols = [a.to_column(resolver) for a in self._aggs]
        if self._group_by:
            group_names = []
            for g in self._group_by:
                name = self._colname_for(frame, g)
                if name is None:
                    raise ValueError(f"unknown group-by field: {g}")
                group_names.append(name)
            grouper = {"groupby": frame.df.groupBy, "rollup": frame.df.rollup,
                       "cube": frame.df.cube}[self._group_mode]
            out = grouper(*[F.col(n) for n in group_names]).agg(*agg_cols)
            prov = [(None, n, n) for n in group_names]
        else:
            out = frame.df.agg(*agg_cols)
            prov = []
        prov += [(None, a.output_name, a.output_name) for a in self._aggs]
        return _Frame(out, prov)

    def _apply_having(self, frame: _Frame) -> _Frame:
        if self._having is None or self._having.is_empty():
            return frame
        col = condition_to_column(self._having.root(), frame.resolver())
        return _Frame(frame.df.filter(col), frame.prov)

    def _apply_select(self, frame: _Frame) -> _Frame:
        if self._select is None:
            return frame
        cols, prov = [], []
        for item in self._select:
            if isinstance(item, Agg):
                # agg outputs already exist post-aggregation
                cols.append(F.col(item.output_name))
                prov.append((None, item.output_name, item.output_name))
                continue
            m = _ALIAS_RE.match(item.strip())
            ref, alias = (m.group(1).strip(), m.group(2)) if m else (item.strip(), None)
            resolved = frame.resolver()(ref)
            col = resolved[0] if resolved else F.lit(None)
            out = alias or (self._colname_for(frame, ref) or ref.split(".")[-1])
            cols.append(col.alias(out))
            prov.append((None, out, out))
        return _Frame(frame.df.select(*cols), prov)

    def _sort_fields_with_tiebreak(self) -> list[tuple[str, bool]]:
        fields = [parse_order_field(s) for s in self._order_by]
        pk = self._engine.primary_key(self._table)
        if pk and pk not in [f for f, _ in fields]:
            fields.append((pk, False))  # stable PK-asc tie-break
        return fields

    def _pred_read_scope(self):
        """(space, name) key when this query's table read can be
        recorded at PREDICATE granularity for serializable-transaction
        validation (store._check_read_set): single-table, no sample
        filter, a non-empty condition.  The recorded predicate is the
        query's own normalized filter — everything downstream (agg,
        order, limit, keyset cursor) only narrows or transforms the
        filtered rows, so a concurrent change matching NO recorded
        predicate provably leaves the read result unchanged.  Joins
        fall back to whole-table: pre-join, every base row feeds the
        join regardless of the post-join condition."""
        eng = self._engine
        if getattr(eng, "_txn_read_versions", None) is None:
            return None
        if self._joins or self._sample_filter is not None:
            return None
        if self._cond.is_empty():
            return None
        try:
            return eng._resolve(self._table)
        except KeyError:
            return None

    def _base_frame_recorded(self) -> _Frame:
        """``_base_frame`` with serializable-transaction read recording:
        eligible reads (see ``_pred_read_scope``) register their
        normalized filter instead of a whole-table demand.  Every
        terminal that compiles its own plan (``df``, ``count``) must
        fetch the base through this."""
        pred_scope = self._pred_read_scope()
        if pred_scope is not None:
            self._engine._txn_pred_scope = pred_scope
        try:
            frame = self._base_frame()
        finally:
            if pred_scope is not None:
                self._engine._txn_pred_scope = None
        if pred_scope is not None:
            # record the SAME normalized node the plan filters on; the
            # commit-time check recompiles it over the changed-rows diff
            lst = self._engine._txn_read_preds.get(pred_scope)
            if lst is not None:
                lst.append(self._normalize_node(
                    self._cond.root().simplify(), frame))
        return frame

    def df(self) -> DataFrame:
        """Compile the chain to a DataFrame (the declarative plan)."""
        frame = self._base_frame_recorded()
        if self._sample_filter is not None:
            from tostore_spark.llmops.pipeline import hash_fraction
            field, permyriad = self._sample_filter
            frame = _Frame(
                frame.df.filter(hash_fraction(F.col(field)) < permyriad),
                frame.prov)
        frame = self._apply_joins(frame)
        frame = self._apply_condition(frame)

        prev_page = False
        if self._cursor_token:
            tok = cursor_mod.decode_cursor(self._cursor_token)
            sig = cursor_mod.query_signature(self._table, self._cond.to_map(), self._order_by,
                                             space=self._engine.current_space)
            if tok.get("sig") != sig:
                raise ValueError("cursor signature does not match this query")
            sort_fields = [(f, bool(d)) for f, d in tok["sort"]]
            prev_page = tok.get("direction") == "prev"
            frame = _Frame(
                frame.df.filter(cursor_mod.keyset_filter(
                    sort_fields, tok["pivot"], frame.resolver(), reverse=prev_page)),
                frame.prov)

        frame = self._apply_agg(frame)
        frame = self._apply_having(frame)
        frame = self._apply_select(frame)

        if self._distinct is not None:
            if self._distinct is True:
                frame = _Frame(frame.df.distinct(), frame.prov)
            else:
                # distinct([fields]) keeps the FIRST occurrence per key in
                # the query's result order (query_builder.dart:658-676):
                # row_number over the sort order when it is resolvable
                # post-projection, else plain dropDuplicates (arbitrary
                # representative — order was unspecified anyway).
                names = [self._colname_for(frame, f) or f for f in self._distinct]
                specs = list(self._order_by)
                pk = self._engine.primary_key(self._table)
                if pk and pk not in [parse_order_field(s)[0] for s in specs]:
                    specs.append(pk)
                resolver = frame.resolver()
                if specs and all(resolver(parse_order_field(s)[0]) for s in specs):
                    from pyspark.sql import Window
                    w = Window.partitionBy(*[F.col(n) for n in names]) \
                              .orderBy(*order_columns(specs, resolver))
                    frame = _Frame(
                        frame.df.withColumn("__rn", F.row_number().over(w))
                                .filter(F.col("__rn") == 1).drop("__rn"),
                        frame.prov)
                else:
                    frame = _Frame(frame.df.dropDuplicates(names), frame.prov)

        if prev_page and self._order_by:
            # prev-page = the LAST `limit` rows before the pivot: take them
            # under the reversed order, then restore the requested order.
            flipped = [f if d else f"-{f}"
                       for f, d in (parse_order_field(s) for s in self._order_by)]
            df = frame.df.orderBy(*order_columns(flipped, frame.resolver()))
            if self._limit is not None:
                df = df.limit(self._limit)
            return df.orderBy(*order_columns(self._order_by, frame.resolver()))

        if self._order_by:
            frame = _Frame(
                frame.df.orderBy(*order_columns(self._order_by, frame.resolver())),
                frame.prov)

        df = frame.df
        if self._offset:
            df = df.offset(self._offset)
        if self._limit is not None:
            df = df.limit(self._limit)
        return df

    # ---- reactive -----------------------------------------------------
    def watch(self, callback):
        """Subscribe: emit full result now and on every matching table
        change (query_builder.dart:473-543)."""
        return self._engine.watch(self, callback)

    def stream(self):
        """Per-record pull stream (stream_query_builder.dart:26-140)."""
        from tostore_spark.streaming.reactive import StreamQueryBuilder
        return StreamQueryBuilder(self).stream()

    # ---- terminals ----------------------------------------------------
    def _full_signature(self) -> str:
        import json

        payload = {
            "t": self._table, "sp": self._engine.current_space,
            "w": self._cond.to_map(), "o": self._order_by,
            "l": self._limit, "off": self._offset,
            "s": [a.output_name if isinstance(a, Agg) else a
                  for a in (self._select or [])],
            "g": self._group_by, "gm": self._group_mode, "d": self._distinct,
            "a": [a.output_name for a in self._aggs],
            "h": self._having.to_map() if self._having else None,
            "j": list(self._joins),
            "c": self._cursor_token,
        }
        return json.dumps(payload, sort_keys=True, default=str)

    def _cache_key(self):
        if self._cache_enabled is False:
            return None, None
        cache = getattr(self._engine, "query_cache", None)
        if cache is None:
            return None, None
        tables = [self._table] + [j[1] for j in self._joins]
        gens = tuple(sorted({(t, self._engine.generation(t)) for t in tables}))
        return cache, cache.key(self._full_signature(), gens)

    def run(self) -> QueryResult:
        """Collect list-of-dict records + pagination state
        (limit+1 → hasMore, query_executor.dart:657-686).  Results are
        served from the generation-invalidated query cache when unchanged
        (query_executor.dart:813-860)."""
        # pagination safety (query_executor.dart:339-391): deep offsets are
        # rejected (use keyset cursors), and an unlimited run() collects to
        # the driver, so it is capped at default_query_limit — or rejected
        # outright when the cap is disabled.  Aggregations are exempt (they
        # reduce before collect); .df() is exempt (stays distributed).
        max_off = getattr(self._engine, "max_query_offset", 0)
        if (max_off and max_off > 0 and not self._cursor_token
                and (self._offset or 0) > max_off):
            raise ValueError(
                f"query offset ({self._offset}) exceeds max_query_offset "
                f"({max_off}); use keyset (cursor) pagination for deep pages")
        applied_default_limit = False
        if self._limit is None and not self._aggs:
            default_limit = getattr(self._engine, "default_query_limit", 0)
            if default_limit and default_limit > 0:
                tok = self._cursor_token
                self = self.clone()
                self._limit = default_limit
                self._cursor_token = tok
                applied_default_limit = True
            else:
                raise ValueError(
                    "unbounded run() is not allowed: specify .limit() or set "
                    "engine.default_query_limit > 0 (.df() returns the "
                    "unbounded plan without collecting)")
        cache, key = self._cache_key()
        if cache is not None:
            hit = cache.get(key, max_age_s=self._cache_expiry_s)
            if hit is not None:
                if getattr(self._engine, "_txn_read_versions",
                           None) is not None:
                    # a cache hit is still a READ: without this, a
                    # serializable transaction whose only read of a
                    # table was served from the cache would skip the
                    # read-set entirely and ADMIT write-skew (the
                    # compiled path records through _df_at_key, which a
                    # hit never reaches).  Recording compiles only the
                    # base plan — no job runs.
                    self._base_frame_recorded()
                    for j in self._joins:
                        try:
                            self._engine._df_at_key(
                                self._engine._resolve(j[1]))
                        except KeyError:
                            pass
                rows, has_more, has_prev, next_token, prev_token = hit
                return QueryResult([dict(r) for r in rows], has_more, has_prev,
                                   next_token, prev_token, builder=self)
        fetch = self._limit + 1 if self._limit is not None else None
        qb = self
        if fetch is not None:
            qb = self.clone()
            qb._limit = fetch
            qb._cursor_token = self._cursor_token
        rows = [r.asDict(recursive=True) for r in qb.df().collect()]
        is_prev = False
        if self._cursor_token:
            is_prev = cursor_mod.decode_cursor(self._cursor_token).get("direction") == "prev"
        overflow = fetch is not None and len(rows) >= fetch
        if overflow:
            # the +1 probe row is beyond the page: last under next-paging,
            # first (earliest) under prev-paging after the ascending re-sort
            rows = rows[1:] if is_prev else rows[: self._limit]
        has_more = overflow if not is_prev else True
        next_token = prev_token = None
        if rows and self._order_by:
            sort_fields = self._sort_fields_with_tiebreak()
            sig = cursor_mod.query_signature(self._table, self._cond.to_map(), self._order_by,
                                             space=self._engine.current_space)
            usable = [f for f, _ in sort_fields if f in rows[-1]]
            if len(usable) == len(sort_fields):
                next_token = cursor_mod.encode_cursor(
                    self._table, sort_fields,
                    {f: rows[-1][f] for f, _ in sort_fields}, "next", sig)
                prev_token = cursor_mod.encode_cursor(
                    self._table, sort_fields,
                    {f: rows[0][f] for f, _ in sort_fields}, "prev", sig)
        if is_prev:
            has_prev = overflow
        else:
            has_prev = self._cursor_token is not None or bool(self._offset)
        if cache is not None:
            cache.put(key, ([dict(r) for r in rows], has_more, has_prev,
                            next_token, prev_token))
        res = QueryResult(rows, has_more, has_prev, next_token, prev_token, builder=self)
        res.default_limit_applied = applied_default_limit
        return res

    def first(self) -> Optional[dict]:
        """First record under the query's order, or None
        (query_builder.dart:293-298)."""
        qb = self.clone()
        qb._limit = 1
        qb._cursor_token = self._cursor_token
        res = qb.run()
        return res.records[0] if res.records else None

    def count(self) -> int:
        """Metadata-fast count (query_builder.dart:300-317): an
        unfiltered, unjoined count over a clean warehouse table is
        answered from the manifest's per-segment footer row counts
        (engine.stats_count) — zero Spark jobs, zero file listings, the
        Delta/Iceberg numRecords path; anything else runs the scan
        (Parquet row-group stats still make it O(metadata) when Spark
        plans it unfiltered)."""
        qb = self.clone()
        qb._order_by, qb._limit, qb._offset = [], None, None
        if (not qb._joins and qb._cond.is_empty()
                and qb._sample_filter is None):
            try:
                n = self._engine.stats_count(self._table)
            except Exception:
                n = None
            if n is not None:
                # a metadata serve is still a READ: record it in the
                # serializable read-set exactly like the compiled path
                qb._base_frame_recorded()
                return n
        frame = qb._base_frame_recorded()
        frame = qb._apply_joins(frame)
        frame = qb._apply_condition(frame)
        return frame.df.count()

    def exists(self) -> bool:
        # count-limit-1 early exit (query_builder.dart:324-347);
        # the unfiltered form rides the same metadata serve as count()
        if (not self._joins and self._cond.is_empty()
                and self._sample_filter is None):
            try:
                n = self._engine.stats_count(self._table)
            except Exception:
                n = None
            if n is not None:
                self.clone()._base_frame_recorded()   # read-set record
                return n > 0
        qb = self.clone()
        qb._order_by, qb._offset = [], None
        qb._limit = 1
        qb._aggs, qb._select, qb._group_by = [], None, None
        return len(qb.df().take(1)) > 0

    def _scalar_agg(self, kind: str, field: str):
        qb = self.clone()
        qb._order_by, qb._limit, qb._offset = [], None, None
        if (kind in ("min", "max") and not qb._joins
                and qb._cond.is_empty() and qb._sample_filter is None):
            # metadata-only min/max from manifest footer stats
            # (engine.stats_min_max: integral/boolean columns only —
            # exact bounds; strings/floats fall through to the scan)
            try:
                served = self._engine.stats_min_max(
                    self._table, field, kind)
            except Exception:
                served = None
            if served is not None:
                qb._base_frame_recorded()      # read-set recording
                return served[0]
        qb._aggs = [Agg(kind, field, alias="__v")]
        qb._select, qb._group_by, qb._distinct = None, None, None
        row = qb.df().collect()[0]
        return row["__v"]

    def sum(self, field: str):
        return self._scalar_agg("sum", field)

    def avg(self, field: str):
        return self._scalar_agg("avg", field)

    def min(self, field: str):
        return self._scalar_agg("min", field)

    def max(self, field: str):
        return self._scalar_agg("max", field)


def _kind(st) -> str:
    from pyspark.sql import types as T

    if isinstance(st, T.NumericType):
        return "num"
    if isinstance(st, T.BooleanType):
        return "bool"
    if isinstance(st, (T.TimestampType, T.DateType)):
        return "time"
    return "str"
