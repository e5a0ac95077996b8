"""Round-11 advice fixes, each pinned by the failure it prevents:

1. Epoch-fold desync (engine._set_df_at_key): delete deltas keyed on
   DIFFERENT column sets in one unflushed epoch (upsert matched on a
   non-PK unique index, then a PK-keyed delete) must poison the fast
   path — never leave a stale (K, R) pair that a later flush would
   durably commit while the in-memory frame shows both mutations.
2. LIKE prefix pruning (plans/skipping._leaf_may_match): the upper
   bound must be the prefix with its last code point incremented, not
   prefix+U+FFFF — an astral-suffix match ('abc\\U0001F600') sorts
   above the latter, so that bound prunes segments containing matches.
3. seg_stats carry-forward: a fast_replace epoch keeps every base
   segment live, so prior per-segment footer stats must survive it.
4. engine.delete_vectors=False is the documented whole-path kill
   switch: upsert / batch_update / streaming merge_batch replace
   epochs must honor it like DeleteBuilder does.
"""
import os

import pytest

from tostore_spark.engine import ToStoreSpark
from tostore_spark.schema import (DataType, FieldSchema, PrimaryKeyConfig,
                                  TableSchema)


def _mk(spark, wh, rows=8, email_unique=True):
    db = ToStoreSpark(spark, warehouse=wh)
    db.create_table(TableSchema(
        name="users", primary_key=PrimaryKeyConfig(name="id"),
        fields=[FieldSchema(name="email", type=DataType.text,
                            unique=email_unique),
                FieldSchema(name="n", type=DataType.integer)]))
    db.batch_insert("users", [
        {"id": f"u{i:02d}", "email": f"e{i}@x", "n": i}
        for i in range(rows)])
    db.flush()
    return db


class TestEpochFoldDesync:
    def test_mixed_keyset_deltas_poison_not_desync(self, spark, tmp_path):
        """upsert keyed on the unique email index, then a PK-keyed
        delete in the same epoch: the fold must not raise, and BOTH
        mutations must survive flush + cold reopen (pre-fix the union
        of email-keyed and id-keyed delete frames raised AFTER the
        in-memory frame was replaced, leaving a stale delta pair that
        a flush would commit — silently dropping the delete)."""
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        # keyset resolution: rows without the PK but with the unique
        # email field match on [email] — an email-column delete delta
        db.upsert("users", {"email": "e3@x", "n": 333})
        # now a PK-keyed delete in the SAME unflushed epoch
        n = db.delete("users").where("id", "=", "u05").execute()
        assert n == 1
        rows = {r["id"]: r["n"] for r in db.df("users").collect()}
        assert rows["u03"] == 333 and "u05" not in rows
        db.flush()
        db2 = ToStoreSpark(spark, warehouse=wh)
        rows2 = {r["id"]: r["n"] for r in db2.df("users").collect()}
        assert rows2 == rows

    def test_fold_still_fast_for_homogeneous_keysets(self, spark, tmp_path):
        """Same-keyset folding keeps the fast path: two PK deletes in
        one epoch still flush as one deletion-vector epoch."""
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        db.delete("users").where("id", "=", "u01").execute()
        db.delete("users").where("id", "=", "u02").execute()
        db.flush()
        ent = db._tables[("default", "users")]
        assert ent["ops"][-1][0] == "del"
        assert sorted(r["id"] for r in db.df("users").collect()) == \
            [f"u{i:02d}" for i in range(8) if i not in (1, 2)]


class TestLikeAstralPrune:
    def test_astral_suffix_segment_not_pruned(self):
        from tostore_spark.plans.skipping import _leaf_may_match
        # the segment's only string is 'abc😀' — it MATCHES LIKE 'abc%'
        # but sorts above 'abc￿'; the old bound pruned it
        summary = {"rows": 1, "cols": {"s": {
            "min": "abc\U0001F600", "max": "abc\U0001F600", "nulls": 0}}}
        assert _leaf_may_match("s", "LIKE", "abc%", summary, "t") is True

    def test_prefix_prune_still_works(self):
        from tostore_spark.plans.skipping import _leaf_may_match
        below = {"rows": 1, "cols": {"s": {
            "min": "aaa", "max": "abb", "nulls": 0}}}
        above = {"rows": 1, "cols": {"s": {
            "min": "abd", "max": "abz", "nulls": 0}}}
        inside = {"rows": 1, "cols": {"s": {
            "min": "abca", "max": "abcz", "nulls": 0}}}
        assert _leaf_may_match("s", "LIKE", "abc%", below, "t") is False
        assert _leaf_may_match("s", "LIKE", "abc%", above, "t") is False
        assert _leaf_may_match("s", "LIKE", "abc%", inside, "t") is True

    def test_max_codepoint_prefix_never_upper_prunes(self):
        from tostore_spark.plans.skipping import _leaf_may_match
        # a prefix made entirely of U+10FFFF has no upper bound —
        # only the mx < prefix side may prune
        pref = "\U0010FFFF\U0010FFFF"
        seg = {"rows": 1, "cols": {"s": {
            "min": pref + "x", "max": pref + "x", "nulls": 0}}}
        assert _leaf_may_match("s", "LIKE", pref + "%", seg, "t") is True


class TestSegStatsCarryForward:
    def test_fast_replace_keeps_base_segment_stats(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        key = ("default", "users")
        base_stats = dict(db._tables[key].get("segment_stats") or {})
        assert base_stats, "base flush must produce footer stats"
        db.upsert("users", {"id": "u03", "email": "e3@x", "n": 999})
        db.flush()
        ent = db._tables[key]
        assert ent["ops"][-2:] == [["del", ent["path"]],
                                   ["seg", ent["path"]]] or \
            [op[0] for op in ent["ops"][-2:]] == ["del", "seg"]
        stats = ent.get("segment_stats") or {}
        for root in base_stats:
            assert root in stats, \
                "fast_replace must carry base segment stats forward"
        # and a cold reopen still sees them (manifest round-trip)
        db2 = ToStoreSpark(spark, warehouse=wh)
        stats2 = db2._tables[key].get("segment_stats") or {}
        for root in base_stats:
            assert root in stats2


class TestDeleteVectorsKillSwitch:
    def test_upsert_honors_kill_switch(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        db.delete_vectors = False
        db.upsert("users", {"id": "u04", "email": "e4@x", "n": 444})
        db.flush()
        ent = db._tables[("default", "users")]
        assert [op[0] for op in ent["ops"]] == ["seg"], \
            "kill switch must force a full-rewrite epoch"
        assert not os.path.isdir(os.path.join(ent["path"], "_deletes"))
        assert {r["n"] for r in db.df("users")
                .filter("id = 'u04'").collect()} == {444}

    def test_batch_update_honors_kill_switch(self, spark, tmp_path):
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        db.delete_vectors = False
        db.batch_update("users", [{"id": "u02", "n": 222}])
        db.flush()
        ent = db._tables[("default", "users")]
        assert [op[0] for op in ent["ops"]] == ["seg"]
        assert not os.path.isdir(os.path.join(ent["path"], "_deletes"))
        db2 = ToStoreSpark(spark, warehouse=wh)
        assert {r["n"] for r in db2.df("users")
                .filter("id = 'u02'").collect()} == {222}

    def test_streaming_merge_honors_kill_switch(self, spark, tmp_path):
        from tostore_spark.streaming.sink import merge_batch
        wh = str(tmp_path / "wh")
        db = _mk(spark, wh)
        db.delete_vectors = False
        batch = db.spark.createDataFrame(
            [("u01", "e1@x", 111)], db.df("users").schema)
        merge_batch(db, "users", batch, mode="upsert")
        db.flush()
        ent = db._tables[("default", "users")]
        assert [op[0] for op in ent["ops"]] == ["seg"]
        assert not os.path.isdir(os.path.join(ent["path"], "_deletes"))
        assert {r["n"] for r in db.df("users")
                .filter("id = 'u01'").collect()} == {111}
