"""Cross-PROCESS concurrent-writer torture (store.py commit protocol).

The in-process stress tests (test_store.py) share one interpreter; the
per-table CAS + claim files + manifest pointer-swap lock are pure
FILESYSTEM primitives, so their real test is separate OS processes —
no shared GIL, no shared Python objects, each with its own JVM.  These
tests spawn real worker processes (own SparkSession each) against one
shared warehouse and assert the end invariants: every committed row
present exactly once, fsck clean, and a writer killed dead mid-flush
(after data writes, before the manifest swap) leaves the manifest
untouched, its staged work vacuumable, and its stale lock stealable."""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
wh, widx, rounds, report = sys.argv[1], int(sys.argv[2]), \
    int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, {repo!r})
from tostore_spark import ToStoreSpark, get_spark
from tostore_spark import store as S

spark = get_spark(app_name=f"mp-worker-{{widx}}", cpus=2)
db = ToStoreSpark(spark, warehouse=wh)
appended, retries = [], 0
for rnd in range(rounds):
    rid = 1000 + widx * 100 + rnd        # writer-unique id
    db.append_rows("t", spark.createDataFrame(
        [(rid, widx)], "id long, v long"))
    for attempt in range(8):
        try:
            db.flush(only=["t"])
            break
        except S.ConcurrentWriteError:
            retries += 1
            import time as _t
            _t.sleep(0.2 * (widx + 1))
            db.refresh(row_merge=True)
    else:
        raise SystemExit(3)              # starved
    appended.append(rid)
with open(report, "w") as fh:
    json.dump({{"appended": appended, "retries": retries}}, fh)
spark.stop()
"""

_CRASHER = r"""
import os, sys
wh = sys.argv[1]
sys.path.insert(0, {repo!r})
from tostore_spark import ToStoreSpark, get_spark
from tostore_spark import store as S

spark = get_spark(app_name="mp-crasher", cpus=2)
db = ToStoreSpark(spark, warehouse=wh)
db.append_rows("t", spark.createDataFrame(
    [(9999, 9)], "id long, v long"))

# die AFTER phase-2 data writes + lock acquire, BEFORE the pointer
# swap — the worst-case crash point: staged dirs + claims + a held
# lock are all on disk, the manifest is not yet updated
real = S.write_manifest
def _boom(*a, **kw):
    os._exit(17)
S.write_manifest = _boom
db.flush(only=["t"])
"""


def _spawn(script, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-c", script] + [str(a) for a in args],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)


def _seed(spark, wh):
    from tostore_spark import ToStoreSpark
    db = ToStoreSpark(spark, warehouse=wh)
    db.register_table("t", df=spark.createDataFrame(
        [(i, 0) for i in range(10)], "id long, v long"))
    db.flush()
    return db


def test_three_os_processes_race_one_table(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_mp"))
    _seed(spark, wh)
    rounds = 2
    reports = [str(tmp_path_factory.mktemp("rep") / f"r{w}.json")
               for w in range(3)]
    procs = [_spawn(_WORKER.format(repo=REPO), [wh, w, rounds, reports[w]])
             for w in range(3)]
    errs = []
    for pr in procs:
        try:
            _, err = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            raise
        if pr.returncode != 0:
            errs.append((pr.returncode, err.decode()[-2000:]))
    assert not errs, errs

    expected = {i: 0 for i in range(10)}
    total_retries = 0
    for w, rp in enumerate(reports):
        with open(rp) as fh:
            rep = json.load(fh)
        for rid in rep["appended"]:
            expected[rid] = w
        total_retries += rep["retries"]
    assert sum(len(json.load(open(rp))["appended"])
               for rp in reports) == 3 * rounds

    from tostore_spark import ToStoreSpark
    from tostore_spark import store as S
    fresh = ToStoreSpark(spark, warehouse=wh)
    got = {r["id"]: r["v"] for r in fresh.df("t").collect()}
    assert got == expected
    assert fresh.df("t").count() == len(expected)   # exactly-once
    fresh.unpin_versions()
    S.vacuum(fresh, keep=1)
    bad = S.fsck(fresh).filter(
        "kind in ('missing_version','orphan_version','empty_version')")
    assert bad.count() == 0, bad.collect()


def test_crash_mid_flush_leaves_manifest_intact(spark, tmp_path_factory,
                                                monkeypatch):
    wh = str(tmp_path_factory.mktemp("wh_crash"))
    _seed(spark, wh)
    pr = _spawn(_CRASHER.format(repo=REPO), [wh])
    _, err = pr.communicate(timeout=600)
    assert pr.returncode == 17, (pr.returncode, err.decode()[-2000:])

    from tostore_spark import ToStoreSpark
    from tostore_spark import store as S
    # the manifest never advanced: a fresh engine sees the seed state
    fresh = ToStoreSpark(spark, warehouse=wh)
    assert fresh.df("t").count() == 10
    assert {r["id"] for r in fresh.df("t").collect()} == set(range(10))
    # the dead writer's lock is still on disk; with the production
    # 600 s staleness window shrunk, the next flush steals it and
    # commits (the liveness half of the protocol)
    lock_path = os.path.join(wh, S._LOCK)
    assert os.path.exists(lock_path)
    monkeypatch.setattr(S, "_LOCK_STALE_S", 1)
    time.sleep(1.2)
    fresh.append_rows("t", spark.createDataFrame(
        [(50, 5)], "id long, v long"))
    fresh.flush(only=["t"])
    again = ToStoreSpark(spark, warehouse=wh)
    assert again.df("t").count() == 11
    # the crasher's staged-but-uncommitted version dir is exactly what
    # fsck calls an orphan; vacuum reclaims it and the warehouse is
    # clean — crash debris never poisons the store
    again.unpin_versions()
    S.vacuum(again, keep=1)
    bad = S.fsck(again).filter(
        "kind in ('missing_version','empty_version')")
    assert bad.count() == 0, bad.collect()
