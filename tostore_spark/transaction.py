"""Transactions: atomic multi-write scopes with rollback.

Reference: ``db.transaction(action, {rollbackOnError, isolation})`` with
readCommitted / serializable(SSI) isolation (lib/tostore.dart:860-868;
transaction_manager.dart:17-50).

Spark-first: every table version is an immutable DataFrame (copy-on-write),
so a transaction is a snapshot of the table map — writes inside the scope
build new versions; on success they become current, on error the snapshot is
restored.  This gives atomicity + snapshot isolation for the single-writer
embedded shape the reference serves.  True multi-writer ACID at warehouse
scale is a table-format concern (Delta/Iceberg commit protocols), out of
scope per SURVEY.md §2.12.
"""

from __future__ import annotations

from contextlib import contextmanager


class TransactionResult:
    def __init__(self, success: bool, error: Exception | None = None):
        self.success = success
        self.error = error


@contextmanager
def transaction(engine, rollback_on_error: bool = True):
    """``with transaction(db): ...`` — atomic scope over engine writes."""
    snapshot = {k: dict(v) for k, v in engine._tables.items()}
    kv_snap = engine._kv.snapshot() if hasattr(engine, "_kv") else None
    try:
        yield engine
    except Exception:
        if rollback_on_error:
            engine._tables = snapshot
            if kv_snap is not None:
                engine._kv.restore(kv_snap)
            if hasattr(engine, "_query_cache") and engine._query_cache:
                engine._query_cache.clear()
        raise


def run_transaction(engine, action, rollback_on_error: bool = True) -> TransactionResult:
    """Callback form matching the reference API: returns a result object
    instead of raising (tostore.dart:860-868)."""
    try:
        with transaction(engine, rollback_on_error=rollback_on_error):
            action(engine)
        return TransactionResult(True)
    except Exception as e:  # noqa: BLE001 - result-object API
        return TransactionResult(False, e)
