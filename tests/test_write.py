"""Write path: insert/upsert/update/delete, PK generation, constraints, FK."""

import pytest

from tostore_spark import Expr
from tostore_spark.schema import (DataType, FieldSchema, ForeignKeyAction,
                                  ForeignKeySchema, PrimaryKeyConfig,
                                  PrimaryKeyType, TableSchema)


def fresh(spark):
    from tostore_spark import ToStoreSpark

    return ToStoreSpark(spark)


def users_schema(name="users", pk_type=PrimaryKeyType.none):
    return TableSchema(
        name=name,
        fields=[FieldSchema("name", DataType.text),
                FieldSchema("age", DataType.integer),
                FieldSchema("email", DataType.text, unique=True)],
        primary_key=PrimaryKeyConfig(name="id", type=pk_type))


def test_insert_and_query(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "ann", "age": 30, "email": "a@x"},
        {"id": "u2", "name": "bob", "age": 40, "email": "b@x"},
    ])
    assert db.query("users").count() == 2
    assert db.query("users").where("age", ">", 35).run()[0]["name"] == "bob"


def test_pk_always_string_and_sequential(spark):
    db = fresh(spark)
    db.create_table(users_schema(pk_type=PrimaryKeyType.sequential))
    db.batch_insert("users", [{"name": "a", "age": 1, "email": "1@x"},
                              {"name": "b", "age": 2, "email": "2@x"}])
    got = sorted(r["id"] for r in db.query("users").run())
    assert got == ["1", "2"]  # strings (table_schema.dart:2033-2052)


def test_unique_violation(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.insert("users", {"id": "u1", "name": "a", "age": 1, "email": "dup@x"})
    with pytest.raises(ValueError, match="unique"):
        db.insert("users", {"id": "u2", "name": "b", "age": 2, "email": "dup@x"})
    with pytest.raises(ValueError, match="unique"):
        db.insert("users", {"id": "u1", "name": "c", "age": 3, "email": "c@x"})


def test_nonnull_constraint(spark):
    db = fresh(spark)
    sch = users_schema()
    sch.fields[0].nullable = False
    db.create_table(sch)
    with pytest.raises(ValueError, match="not nullable"):
        db.insert("users", {"id": "u1", "age": 1, "email": "a@x"})


def test_update_with_expr(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [{"id": "u1", "name": "a", "age": 10, "email": "a@x"},
                              {"id": "u2", "name": "b", "age": 20, "email": "b@x"}])
    n = db.update("users").where("id", "=", "u1").increment("age", 5)
    assert n == 1
    ages = {r["id"]: r["age"] for r in db.query("users").run()}
    assert ages == {"u1": 15, "u2": 20}
    db.update("users").allow_update_all().set({"age": Expr.field("age") * 2})
    ages = {r["id"]: r["age"] for r in db.query("users").run()}
    assert ages == {"u1": 30, "u2": 40}
    with pytest.raises(ValueError):
        db.update("users").set({"age": 0})


def test_upsert(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [{"id": "u1", "name": "a", "age": 10, "email": "a@x"}])
    db.batch_upsert("users", [{"id": "u1", "name": "a2", "age": 11, "email": "a@x"},
                              {"id": "u9", "name": "z", "age": 99, "email": "z@x"}])
    got = {r["id"]: (r["name"], r["age"]) for r in db.query("users").run()}
    assert got == {"u1": ("a2", 11), "u9": ("z", 99)}


def test_delete_with_fk_cascade(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    posts = TableSchema(
        name="posts",
        fields=[FieldSchema("user_id", DataType.text), FieldSchema("title")],
        primary_key=PrimaryKeyConfig(name="pid", type=PrimaryKeyType.none),
        foreign_keys=[ForeignKeySchema(fields=["user_id"],
                                       referenced_table="users",
                                       referenced_fields=["id"],
                                       on_delete=ForeignKeyAction.cascade)])
    db.create_table(posts)
    db.batch_insert("users", [{"id": "u1", "name": "a", "age": 1, "email": "a@x"},
                              {"id": "u2", "name": "b", "age": 2, "email": "b@x"}])
    db.batch_insert("posts", [{"pid": "p1", "user_id": "u1", "title": "t1"},
                              {"pid": "p2", "user_id": "u2", "title": "t2"}])
    n = db.delete("users").where("id", "=", "u1").execute()
    assert n == 1
    assert sorted(r["pid"] for r in db.query("posts").run()) == ["p2"]


def test_delete_restrict(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    posts = TableSchema(
        name="posts",
        fields=[FieldSchema("user_id", DataType.text)],
        primary_key=PrimaryKeyConfig(name="pid", type=PrimaryKeyType.none),
        foreign_keys=[ForeignKeySchema(fields=["user_id"],
                                       referenced_table="users",
                                       referenced_fields=["id"],
                                       on_delete=ForeignKeyAction.restrict)])
    db.create_table(posts)
    db.insert("users", {"id": "u1", "name": "a", "age": 1, "email": "a@x"})
    db.insert("posts", {"pid": "p1", "user_id": "u1"})
    with pytest.raises(ValueError, match="restrict"):
        db.delete("users").where("id", "=", "u1").execute()


def test_kv_store(spark):
    db = fresh(spark)
    kv = db.kv
    kv.set_value("k1", {"a": 1})
    kv.set_value("k2", 42)
    assert kv.get_value("k1") == {"a": 1}
    assert kv.get_value("k2") == 42
    assert kv.get_value("nope") is None
    kv.set_value("k2", 43)
    assert kv.get_value("k2") == 43
    assert sorted(kv.get_keys()) == ["k1", "k2"]
    kv.remove_value("k1")
    assert kv.get_value("k1") is None
    # spaces isolate; global visible everywhere
    kv.set_value("g", "G", is_global=True)
    db.switch_space("other")
    assert kv.get_value("k2") is None
    assert kv.get_value("g", is_global=True) == "G"
    db.switch_space("default")
    assert kv.set_increment("ctr", 5) == 5
    assert kv.set_increment("ctr", 2) == 7


def test_spaces_isolation(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.insert("users", {"id": "u1", "name": "a", "age": 1, "email": "a@x"})
    db.switch_space("s2")
    db.create_table(users_schema())
    assert db.query("users").count() == 0
    db.switch_space("default")
    assert db.query("users").count() == 1


def test_batch_update_partial_fields(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 10, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 20, "email": "b@x"},
        {"id": "u3", "name": "c", "age": 30, "email": "c@x"},
    ])
    n = db.batch_update("users", [
        {"id": "u1", "age": 11},            # only age
        {"id": "u2", "name": "b2"},         # only name
        {"id": "u9", "age": 99},            # unknown pk -> ignored
    ])
    assert n == 2
    got = {r["id"]: (r["name"], r["age"]) for r in db.query("users").run()}
    assert got == {"u1": ("a", 11), "u2": ("b2", 20), "u3": ("c", 30)}
    with pytest.raises(ValueError, match="primary key"):
        db.batch_update("users", [{"age": 1}])


def test_upsert_with_branch_exprs(spark):
    """IsUpdate/IfElse upsert branches (expr.dart:121-158): increment on
    update, initialize on insert."""
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [{"id": "u1", "name": "a", "age": 10, "email": "a@x"}])
    db.batch_upsert(
        "users",
        [{"id": "u1", "name": "a", "email": "a@x"},
         {"id": "u2", "name": "n", "email": "n@x"}],
        exprs={"age": Expr.if_else(Expr.is_update(),
                                   Expr.field("age") + 5, Expr.value(100))})
    got = {r["id"]: r["age"] for r in db.query("users").run()}
    assert got == {"u1": 15, "u2": 100}


def test_kv_watch_value(spark):
    db = fresh(spark)
    seen = []
    db.kv.set_value("k", 1)
    db.kv.watch_value("k", seen.append)
    assert seen == [1]
    db.kv.set_value("k", 2)
    assert seen == [1, 2]
    db.kv.set_value("k", 2)   # distinct suppression
    assert seen == [1, 2]
    db.kv.remove_value("k")
    assert seen == [1, 2, None]


def test_expr_when_single_branch(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [{"id": "u1", "name": "a", "age": 10, "email": "a@x"}])
    # upsert branch: on update bump age, otherwise (insert) null -> default
    db.batch_upsert("users", [{"id": "u1"}, {"id": "u2", "name": "b"}],
                    exprs={"age": Expr.when(Expr.is_update(),
                                            Expr.field("age") + 5,
                                            otherwise=1)})
    ages = {r["id"]: r["age"] for r in db.df("users").collect()}
    assert ages == {"u1": 15, "u2": 1}


def test_update_unique_collision_raises(spark):
    """Updating a unique field into a collision fails the whole update
    (data_store_impl.dart:2440-2470) ..."""
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 1, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 2, "email": "b@x"},
        {"id": "u3", "name": "c", "age": 3, "email": "c@x"}])
    # two matched rows -> same constant unique value = collision
    with pytest.raises(ValueError, match="unique"):
        db.update("users").where("age", "<", 3).set({"email": "same@x"})
    # collision with an untouched row's existing value
    with pytest.raises(ValueError, match="unique"):
        db.update("users").where("id", "=", "u1").set({"email": "c@x"})
    # state unchanged after the failed updates
    assert sorted(r["email"] for r in db.query("users").run()) == \
        ["a@x", "b@x", "c@x"]


def test_update_continue_on_partial_errors_skips_colliders(spark):
    """... with continue_on_partial_errors() the colliding records are
    skipped and the rest apply (failedKeys semantics,
    data_store_impl.dart:2750-2800)."""
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 1, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 2, "email": "b@x"},
        {"id": "u3", "name": "c", "age": 3, "email": "c@x"}])
    # both matched rows target the same value: lowest pk wins, other skips
    n = (db.update("users").where("age", "<", 3)
         .continue_on_partial_errors().set({"email": "same@x"}))
    assert n == 1
    emails = {r["id"]: r["email"] for r in db.query("users").run()}
    assert emails == {"u1": "same@x", "u2": "b@x", "u3": "c@x"}
    # target collides with an untouched row: the whole record is skipped
    n2 = (db.update("users").where("id", "=", "u2")
          .continue_on_partial_errors().set({"email": "c@x"}))
    assert n2 == 0
    assert {r["id"]: r["email"] for r in db.query("users").run()} == \
        {"u1": "same@x", "u2": "b@x", "u3": "c@x"}


def test_update_unique_lazy_path_with_counts_off(spark):
    """eager_mutation_counts=False + continue_on_partial_errors: the
    bulk-update loop path — no driver count job runs (returns -1), yet
    collision rows are still skipped lazily and the invariant holds."""
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 1, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 2, "email": "b@x"},
        {"id": "u3", "name": "c", "age": 3, "email": "c@x"}])
    db.eager_mutation_counts = False
    n = (db.update("users").where("age", "<", 3)
         .continue_on_partial_errors().set({"email": "same@x"}))
    assert n == -1                      # no count job ran
    emails = {r["id"]: r["email"] for r in db.query("users").run()}
    assert emails == {"u1": "same@x", "u2": "b@x", "u3": "c@x"}
    # strict mode still enforces (the one job that must run) and returns
    # the real matched count for free
    with pytest.raises(ValueError, match="unique"):
        db.update("users").where("id", "=", "u2").set({"email": "c@x"})
    n2 = db.update("users").where("id", "=", "u2").set({"email": "new@x"})
    assert n2 == 1


def test_update_nonunique_fields_unaffected_by_flag(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 1, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 2, "email": "b@x"}])
    n = db.update("users").allow_update_all().set({"name": "same"})
    assert n == 2
    assert all(r["name"] == "same" for r in db.query("users").run())


def test_update_partial_errors_no_duplicate_via_retained_old_value(spark):
    """A skipped record retains its OLD unique value; no other updated
    record may be granted that value in the same pass (conservative
    reservation — the single-pass hole found in review)."""
    from tostore_spark.expr import Expr
    from tostore_spark.schema import (DataType, FieldSchema,
                                      PrimaryKeyConfig, TableSchema)
    db = fresh(spark)
    db.create_table(TableSchema(
        name="codes", primary_key=PrimaryKeyConfig(name="id"),
        fields=[FieldSchema(name="id", type=DataType.text),
                FieldSchema(name="code", type=DataType.integer, unique=True),
                FieldSchema(name="age", type=DataType.integer)]))
    db.batch_insert("codes", [
        {"id": "u1", "code": 10, "age": 0},    # untouched
        {"id": "u2", "code": 20, "age": 10},   # new code 10 -> hits u1, skip
        {"id": "u3", "code": 30, "age": 20}])  # new code 20 -> u2's OLD value
    (db.update("codes").where("id", "!=", "u1")
       .continue_on_partial_errors()
       .set({"code": Expr.field("age")}))
    codes = sorted(r["code"] for r in db.query("codes").run())
    assert codes == [10, 20, 30], codes        # all unique, nothing applied


def test_update_unique_selfassign_is_not_a_collision(spark):
    db = fresh(spark)
    db.create_table(users_schema())
    db.batch_insert("users", [
        {"id": "u1", "name": "a", "age": 1, "email": "a@x"},
        {"id": "u2", "name": "b", "age": 2, "email": "b@x"}])
    # setting a unique field to its current value alongside another update
    n = (db.update("users").where("id", "=", "u1")
         .set({"email": "a@x", "age": 10}))
    assert n == 1
    got = {r["id"]: (r["email"], r["age"]) for r in db.query("users").run()}
    assert got["u1"] == ("a@x", 10)
