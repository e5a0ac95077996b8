"""Batch cursor export: resumable cursor-checkpointed batch iteration.

Reference: ``queryEachBatch(table, {batchSize, onBatch, condition, orderBy,
checkpointCursor, cancellationToken})`` — flushes, then iterates data in
cursor-checkpointed batches for resumable ETL
(lib/src/query/query_executor.dart:3393-3492).

Spark-first: each batch is one keyset-cursor page (sargable tuple-compare
filter + limit → the scan prunes to the page), so an interrupted export
resumes from the last checkpoint token in O(page), not O(offset).  For
full-table exhaustive ETL at 100 TB prefer ``df.foreachPartition`` /
``writeStream.foreachBatch``; this operator is for the reference's resumable
consumer-driven shape.
"""

from __future__ import annotations

from typing import Callable, Optional


class CancellationToken:
    def __init__(self):
        self._cancelled = False

    def cancel(self) -> None:
        self._cancelled = True

    @property
    def cancelled(self) -> bool:
        return self._cancelled


def query_each_batch(builder, batch_size: int = 1000,
                     on_batch: Optional[Callable[[list[dict], Optional[str]], object]] = None,
                     checkpoint_cursor: Optional[str] = None,
                     cancellation_token: Optional[CancellationToken] = None,
                     order_by: Optional[list[str]] = None) -> Optional[str]:
    """Iterate the query in cursor-checkpointed batches.

    ``on_batch(records, cursor_token)`` is called per page; returning False
    stops early.  Returns the last checkpoint token (pass back as
    ``checkpoint_cursor`` to resume), or None when exhausted.
    """
    qb = builder.clone()
    if order_by:
        qb._order_by = list(order_by)
    if not qb._order_by:
        # deterministic total order is required for resumability: PK if
        # declared, else every column ascending
        pk = qb._engine.primary_key(qb._table)
        qb._order_by = [pk] if pk else list(qb._engine.df(qb._table).columns)
    qb = qb.limit(batch_size)
    token = checkpoint_cursor
    while True:
        if cancellation_token is not None and cancellation_token.cancelled:
            return token
        page_qb = qb.clone()
        if token:
            page_qb = page_qb.cursor(token)
        result = page_qb.run()
        if not result.records:
            return None
        if on_batch is not None:
            keep_going = on_batch(result.records, result.next_token)
            if keep_going is False:
                return result.next_token
        token = result.next_token
        if not result.has_more or token is None:
            return None
