"""The physical-plan audit runs with the suite: pushdown, pruning,
broadcast, TakeOrderedAndProject, sargable keyset cursors, IVF partition
pruning must all hold at sf0.001 exactly as designed."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_plan_shapes(spark):
    from explain_audit import audit
    failures = audit(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                                           "/root/testdata/sf0.001"))
    assert not failures, failures
