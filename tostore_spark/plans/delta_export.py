"""Export a warehouse table as a Delta Lake table (interop rung).

The store's homegrown manifest replicates a useful slice of Delta
(append segments, deletion vectors, replace epochs, CDF, snapshot
isolation) but no external engine can read it.  This module writes the
cheapest honest interop artifact: the CURRENT version of a table —
segments unioned, deletion vectors resolved — as a standard Delta
table, so Spark-with-delta, Trino, DuckDB's delta extension, or any
other Delta reader can consume it without porting the writer protocol.

Format notes (Delta transaction protocol, delta-io/delta PROTOCOL.md —
public spec; no Delta library is required to WRITE a v0 commit):

- data: plain parquet files in the destination directory, written by
  Spark (snappy, whatever file count the session parallelism gives or
  ``target_files`` forces);
- log: ``_delta_log/00000000000000000000.json`` with one JSON action
  per line — ``protocol`` (minReader 1 / minWriter 2: no advanced
  features are used, so the floor versions keep every reader
  eligible), ``metaData`` (id, parquet format, Spark ``schemaString``,
  no partition columns), and one ``add`` per data file carrying
  ``size``, ``modificationTime``, ``dataChange`` and the per-file
  ``stats`` JSON (numRecords / minValues / maxValues / nullCount,
  reused from the same parquet-footer reads ``plans.skipping``
  already does — Delta readers use them for file skipping exactly
  like our manifest does).

Read-back paths:

- with delta-spark on the classpath:
  ``spark.read.format("delta").load(dest)``;
- without (this container): a v0 export has every listed file live
  and no removed files, so ``spark.read.parquet(dest)`` reads the
  identical snapshot — the documented fallback the tests pin
  hash-equal to ``engine.df(table)``.  (The equivalence is specific
  to a FRESH export directory; once a real Delta writer commits more
  versions on top, only the log knows which files are live.)

The export is a SNAPSHOT, not a sync: later store epochs do not flow
through.  Re-export to refresh (``mode="overwrite"``).
"""
from __future__ import annotations

import json
import os
import time
import uuid

__all__ = ["export_delta"]


def _delta_stats(file_summary: dict) -> str:
    """plans.skipping per-file summary → Delta add-action stats JSON.

    Only columns with decodable bounds are emitted (same conservatism
    as the manifest: a reader treats missing stats as unknown).  Null
    counts are emitted only when exact."""
    cols = file_summary.get("cols") or {}
    mins, maxs, nulls = {}, {}, {}
    for name, c in cols.items():
        if c.get("min") is not None:
            mins[name] = c["min"]
            maxs[name] = c["max"]
        if c.get("nulls") is not None:
            nulls[name] = int(c["nulls"])
    out = {"numRecords": int(file_summary["rows"])}
    if mins:
        out["minValues"] = mins
        out["maxValues"] = maxs
    if nulls:
        out["nullCount"] = nulls
    return json.dumps(out)


def export_delta(engine, table: str, dest: str,
                 mode: str = "error",
                 target_files: int | None = None,
                 allow_decrypted: bool = False) -> dict:
    """Write ``table``'s current in-engine frame as a Delta table at
    ``dest`` (local path).  Deletion vectors / replace epochs are
    resolved by construction — the exported data is ``engine.df(table)``
    itself, not the recipe.  Returns a small report dict
    ``{"files": n, "rows": n, "path": dest}``.

    ``mode="overwrite"`` replaces an existing export; the default
    errors if ``dest`` exists (mirrors Spark writer semantics).
    ``target_files`` coalesces the export (a 100 TB export keeps the
    session's natural parallelism; small interop exports usually want
    one file)."""
    try:
        enc = engine._enc_cols(engine._resolve(table))
    except Exception:
        enc = []
    if enc and not allow_decrypted:
        # df() decrypts — exporting would silently declassify an
        # at-rest-encrypted table into a world-readable format
        raise ValueError(
            f"table {table} has at-rest-encrypted fields {enc}; "
            "export_delta would write them DECRYPTED — pass "
            "allow_decrypted=True to do that deliberately")
    df = engine.df(table)
    path = dest[len("file:"):] if dest.startswith("file:") else dest
    if os.path.exists(path) and os.listdir(path):
        if mode != "overwrite":
            raise ValueError(
                f"export_delta destination {dest} exists; "
                "pass mode='overwrite' to replace it")
    if target_files:
        df = df.coalesce(int(target_files))
    df.write.mode("overwrite").parquet(dest)
    # per-file footer stats: the same metadata-only reads the manifest
    # skipping layer does at flush time
    from tostore_spark.plans.skipping import collect_parquet_stats
    _seg, by_file = collect_parquet_stats(dest, per_file=True)
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    now_ms = int(time.time() * 1000)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now_ms,
        }},
    ]
    total_rows = 0
    for rel in files:
        fpath = os.path.join(path, rel)
        summ = by_file.get(rel) or {"rows": 0, "cols": {}}
        total_rows += int(summ["rows"])
        actions.append({"add": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(fpath),
            "modificationTime": int(os.path.getmtime(fpath) * 1000),
            "dataChange": True,
            "stats": _delta_stats(summ),
        }})
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, f"{0:020d}.json")
    tmp = log_path + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.replace(tmp, log_path)
    return {"files": len(files), "rows": total_rows, "path": dest}
