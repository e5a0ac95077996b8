"""Per-query profiling for the optimization rounds (guide §1).

For each named query (default: the 12 headline entries): time the
DataFrame BUILD (pure driver/py4j work), capture .explain("formatted")
to plans/<tag>/<name>_<suffix>.txt, then time EXECUTION with the noop
sink (guide §1.4) cold (cache cleared, med-of-3) and warm (immediate
re-run, med-of-3).  Jobs are labelled for the UI (guide §1.5).

Usage: python tools/profile_headline.py [--tag r17] [--suffix before]
                                        [--sf /root/testdata/sf0.1] [q ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q_filter_sort_limit", "q_groupby_having", "q_global_agg",
    "q_join_inner_group", "q_left_join_count", "q_events_window",
    "q_keyset_page", "q_vector_cosine_topk", "q_knn_join",
    "q_dedup_minhash_lsh", "q_text_stats", "q_or_union_dedup",
]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag, suffix, sf_dir = "r17", "before", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)
    names = names or HEADLINE

    import __spark_entry__ as entrymod
    from tostore_spark import get_spark

    spark = get_spark(app_name="tostore-spark-profile")
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    qs = entrymod.queries()
    db = entrymod._db(spark, sf_dir)
    for t in ("region", "lineitem", "orders", "customer", "events",
              "documents", "embeddings"):
        db.df(t).count()

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = qs[name]
        spark.catalog.clearCache()
        # build time = driver-side plan construction (py4j round trips)
        t0 = time.time()
        df = fn(spark, sf_dir)
        build = time.time() - t0
        # capture the formatted plan once
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        colds, warms = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} [cold]")
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            colds.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"{name} [warm]")
            t0 = time.time()
            _noop(fn(spark, sf_dir))
            warms.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "build_sec": round(build, 3),
            "cold_med3": round(sorted(colds)[1], 3),
            "warm_med3": round(sorted(warms)[1], 3),
            "cold_all": [round(x, 3) for x in colds],
        }
        print(f"# {name}: build={build:.3f}s cold={results[name]['cold_med3']}s"
              f" warm={results[name]['warm_med3']}s", file=sys.stderr)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
