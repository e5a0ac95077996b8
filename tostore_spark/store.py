"""Durable table store: versioned parquet directories + an atomic manifest.

The batch analog of the reference's WAL-backed persistence
(lib/src/core/wal_manager.dart, table_data_manager.dart:4378): the
reference makes every mutation durable via WAL + page flushes; here the
durability unit is the *flush* — ``engine.flush()`` writes each dirty
table's current DataFrame to ``<warehouse>/<space>/<table>/v<generation>/``
with the normal distributed parquet writer (no driver bottleneck), then
atomically replaces ``<warehouse>/manifest.json``.  A new engine opened on
the same warehouse resumes from the last flushed state — the WAL recovery
analog without porting the WAL.

Layout:
    <warehouse>/manifest.json            # atomic (tmp + rename)
    <warehouse>/<space>/<table>/v<N>/    # parquet snapshot at generation N

The manifest also carries the KV namespace, known spaces, and per-space
user version numbers, mirroring what the reference persists in its system
tables.  Old versions are retained for time-travel-ish safety until
``vacuum()`` prunes them.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from tostore_spark.backup import _schema_from_dict, _schema_to_dict

MANIFEST = "manifest.json"


class ConcurrentWriteError(RuntimeError):
    """Another engine flushed this warehouse since we loaded it.  The
    single-writer analog of the reference's write-lock: flush is a
    compare-and-swap on the manifest sequence number, so the second writer
    fails loudly instead of silently clobbering the first's tables."""


def manifest_path(warehouse: str) -> str:
    return os.path.join(warehouse, MANIFEST)


def read_manifest(warehouse: str) -> Optional[dict]:
    p = manifest_path(warehouse)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def write_manifest(warehouse: str, manifest: dict) -> None:
    """Crash-safe replace: a torn write can never corrupt the manifest."""
    os.makedirs(warehouse, exist_ok=True)
    tmp = manifest_path(warehouse) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, manifest_path(warehouse))


def table_version_dir(warehouse: str, space: str, table: str,
                      version: int) -> str:
    return os.path.join(warehouse, space, table, f"v{version}")


_LOCK = ".flush.lock"
_LOCK_STALE_S = 600


def _acquire_lock(warehouse: str) -> str:
    """O_EXCL lock file serializing the flush critical section.  A lock
    older than _LOCK_STALE_S (crashed holder) is stolen."""
    os.makedirs(warehouse, exist_ok=True)
    path = os.path.join(warehouse, _LOCK)
    import time
    for _ in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return path
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(path) > _LOCK_STALE_S:
                    os.unlink(path)   # stale holder; retry the O_EXCL
                    continue
            except OSError:
                continue
            raise ConcurrentWriteError(
                f"another flush holds {path}; retry after it completes")
    raise ConcurrentWriteError(f"could not acquire {path}")


def _release_lock(warehouse: str) -> None:
    try:
        os.unlink(os.path.join(warehouse, _LOCK))
    except OSError:
        pass


def flush_tables(engine, flush_storage: bool = True) -> list[str]:
    """Write every dirty table (generation advanced past its last flushed
    generation) to the warehouse and re-register it from the written
    parquet — one pass that both bounds lineage and makes the mutation
    durable.  Without a warehouse (or with flush_storage=False) dirty
    tables are only localCheckpoint-ed (memory barrier, NOT durable).
    Returns the list of flushed table names."""
    flushed: list[str] = []
    wh = engine._warehouse
    if not hasattr(engine, "_flushed_gen"):
        engine._flushed_gen = {}
    durable = bool(flush_storage and wh)
    if durable:
        # the whole check-then-act span (read seq -> table writes ->
        # manifest write) runs under an O_EXCL lock file so two racing
        # flushes cannot both pass the guard; a stale lock (dead process)
        # is stolen after 10 min
        _acquire_lock(wh)
    try:
        if durable:
            cur = read_manifest(wh)
            cur_seq = (cur or {}).get("seq", 0)
            if cur_seq != getattr(engine, "_store_seq", 0):
                raise ConcurrentWriteError(
                    f"warehouse {wh} was flushed by another engine (seq "
                    f"{cur_seq} != loaded {getattr(engine, '_store_seq', 0)}); "
                    "reopen to pick up their state before flushing")
        for key, ent in list(engine._tables.items()):
            gen = engine._generations.get(key, 0)
            # dirty = mutated past the last flush, OR registered from a
            # bare DataFrame with no durable source yet (path None, never
            # flushed) — without the second clause such a table would
            # silently vanish on reopen even though flush() "succeeded"
            sourceless = (durable and ent.get("path") is None
                          and key not in engine._flushed_gen)
            if gen <= engine._flushed_gen.get(key, 0) and not sourceless:
                continue   # never mutated, or unchanged since last flush
            if durable:
                vdir = table_version_dir(wh, key[0], key[1], gen)
                ent["df"].write.mode("overwrite").parquet(vdir)
                ent["df"] = engine._read_parquet(vdir)
                ent["path"] = vdir
                engine._flushed_gen[key] = gen
                flushed.append(key[1])
            elif gen > 0:
                ent["df"] = ent["df"].localCheckpoint(eager=True)
        if durable:
            engine._store_seq = getattr(engine, "_store_seq", 0) + 1
            write_manifest(wh, _build_manifest(engine))
    finally:
        if durable:
            _release_lock(wh)
    return flushed


def _build_manifest(engine) -> dict:
    tables = {}
    wh = os.path.abspath(engine._warehouse)
    for (space, name), ent in engine._tables.items():
        path = ent.get("path")
        if path and os.path.abspath(path).startswith(wh):
            tables[f"{space}/{name}"] = {
                "space": space, "name": name, "path": path,
                "version": engine._generations.get((space, name), 0),
                "global": ent["global"],
                "schema": _schema_to_dict(ent["schema"]),
            }
    manifest = {
        "seq": getattr(engine, "_store_seq", 0),
        "tables": tables,
        "spaces": sorted(engine._known_spaces),
        "versions": getattr(engine, "_versions", {}),
    }
    if hasattr(engine, "_kv"):
        manifest["kv"] = [
            [sp, key, val, exp.isoformat() if exp else None]
            for (sp, key), (val, exp) in engine._kv.snapshot().items()]
    return manifest


def load_warehouse(engine) -> list[str]:
    """Overlay the last flushed state onto the engine's registry (flushed
    tables shadow same-named data_dir sources); restores KV, spaces and
    version numbers.  Returns loaded table names."""
    man = read_manifest(engine._warehouse)
    if not man:
        engine._store_seq = 0
        return []
    engine._store_seq = man.get("seq", 0)
    loaded = []
    for ent in man["tables"].values():
        sch = _schema_from_dict(ent["schema"])
        key = (ent["space"], ent["name"])
        engine._tables[key] = {
            "df": engine._read_parquet(ent["path"]),
            "path": ent["path"], "schema": sch, "global": ent["global"],
        }
        engine._generations[key] = ent.get("version", 0)
        if not hasattr(engine, "_flushed_gen"):
            engine._flushed_gen = {}
        engine._flushed_gen[key] = ent.get("version", 0)
        loaded.append(ent["name"])
    for sp in man.get("spaces", []):
        engine._known_spaces.add(sp)
    if man.get("versions"):
        engine._versions = {sp: int(v) for sp, v in man["versions"].items()}
    if man.get("kv"):
        import datetime
        engine.kv.restore({
            (sp, key): (val,
                        datetime.datetime.fromisoformat(exp) if exp else None)
            for sp, key, val, exp in man["kv"]})
    return loaded


def list_versions(engine, table: str, space: str = "default") -> list[int]:
    """Flushed generations available on disk for a table, ascending."""
    tdir = os.path.join(engine._warehouse, space, table)
    if not os.path.isdir(tdir):
        return []
    return sorted(int(d[1:]) for d in os.listdir(tdir)
                  if d.startswith("v") and d[1:].isdigit())


def read_version(engine, table: str, version: int,
                 space: str = "default"):
    """Time-travel read: the table as of a previous flush (the versioned
    directories double as history until ``vacuum()`` prunes them)."""
    vdir = table_version_dir(engine._warehouse, space, table, version)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"no flushed version v{version} for {space}/{table}; "
            f"available: {list_versions(engine, table, space)}")
    return engine._read_parquet(vdir)


def vacuum(engine, keep: int = 1) -> int:
    """Prune old version directories, keeping the ``keep`` most recent per
    table (the current one always survives).  Returns directories removed."""
    import shutil

    man = read_manifest(engine._warehouse) or {"tables": {}}
    current = {(e["space"], e["name"]): e["path"]
               for e in man["tables"].values()}
    removed = 0
    wh = engine._warehouse
    for (space, name), cur_path in current.items():
        tdir = os.path.join(wh, space, name)
        if not os.path.isdir(tdir):
            continue
        versions = sorted(
            (d for d in os.listdir(tdir)
             if d.startswith("v") and d[1:].isdigit()),
            key=lambda d: int(d[1:]), reverse=True)
        for d in versions[keep:]:
            full = os.path.join(tdir, d)
            if os.path.abspath(full) == os.path.abspath(cur_path):
                continue
            shutil.rmtree(full)
            removed += 1
    return removed
