"""Temporal join operators (operators/temporal.py): as-of semantics,
tie determinism, NULL-when-none, and banded range-join exactness."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.temporal import asof_join, banded_range_join


@pytest.fixture(scope="module")
def frames(spark):
    # left: observations; right: states.  seq (id) is globally unique.
    left = spark.createDataFrame(
        [
            # (key, ts, id, payload)
            ("a", 100, 10, "l1"),
            ("a", 200, 11, "l2"),
            ("a", 50, 12, "l0"),  # before any state -> NULL
            ("b", 100, 13, "l3"),  # key with no states at all -> NULL
            ("a", 150, 30, "l4"),  # ts ties a state (id 31) with HIGHER seq
        ],
        "key string, ts long, id long, payload string",
    )
    right = spark.createDataFrame(
        [
            ("a", 90, 20, "s1"),
            ("a", 150, 21, "s2"),
            ("a", 199, 22, "s3"),
            ("a", 150, 31, "s_tie_after"),  # (150, 31) > (150, 30) -> excluded
        ],
        "key string, ts long, id long, state string",
    )
    return left, right


def test_asof_join_backward_semantics(frames):
    left, right = frames
    out = asof_join(
        left, right, keys=["key"], ts_col="ts", seq_col="id", value_cols=["id", "state"]
    )
    got = {r["id"]: (r["asof_id"], r["asof_state"]) for r in out.collect()}
    assert got[10] == (20, "s1")  # ts 100 -> state at 90
    assert got[11] == (22, "s3")  # ts 200 -> state at 199
    assert got[12] == (None, None)  # nothing precedes ts 50
    assert got[13] == (None, None)  # key b has no states
    # lexicographic (ts, seq): state (150, 21) < (150, 30) counts,
    # state (150, 31) > (150, 30) does not
    assert got[30] == (21, "s2")
    # all left rows survive, exactly once
    assert out.count() == left.count()


def test_asof_join_is_one_shuffle_no_join(frames):
    left, right = frames
    out = asof_join(
        left, right, keys=["key"], ts_col="ts", seq_col="id", value_cols=["state"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window form: no join node at all


def test_banded_range_join_matches_brute_force(spark):
    import itertools
    import random

    rng = random.Random(9)
    lrows = [("k%d" % rng.randrange(3), rng.randrange(0, 1000), i) for i in range(60)]
    rrows = [
        ("k%d" % rng.randrange(3), rng.randrange(0, 1000), 100 + i) for i in range(60)
    ]
    band = 75
    left = spark.createDataFrame(lrows, "key string, ts long, lid long")
    right = spark.createDataFrame(rrows, "key string, rts long, rid long")
    got = {
        (r["lid"], r["rid"], r["delta"])
        for r in banded_range_join(
            left,
            right,
            keys=["key"],
            left_ts="ts",
            right_ts="rts",
            band=band,
            left_cols=["lid"],
            right_cols=["rid"],
        ).collect()
    }
    want = {
        (lk[2], rk[2], rk[1] - lk[1])
        for lk, rk in itertools.product(lrows, rrows)
        if lk[0] == rk[0] and abs(rk[1] - lk[1]) <= band
    }
    assert got == want and len(want) > 0


def test_banded_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame([("a", 10, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame([("a", 12, 2)], "key string, rts long, rid long")
    out = banded_range_join(
        left,
        right,
        keys=["key"],
        left_ts="ts",
        right_ts="rts",
        band=5,
        left_cols=["lid"],
        right_cols=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

def test_asof_join_no_torn_rows_with_null_value_cols(spark):
    """A right row holding NULL in one value column must still win AS A
    WHOLE: per-column carries could mix columns from different right rows
    (ADVICE r3).  The struct carry pins latest-right-row semantics."""
    left = spark.createDataFrame([("a", 100, 1, "l")], "key string, ts long, id long, p string")
    right = spark.createDataFrame(
        [("a", 10, 2, "old_x", "old_y"), ("a", 50, 3, None, "new_y")],
        "key string, ts long, id long, x string, y string",
    )
    (row,) = asof_join(
        left, right, keys=["key"], ts_col="ts", seq_col="id", value_cols=["x", "y"]
    ).collect()
    # latest right row is (50, 3): its NULL x must NOT be backfilled by old_x
    assert (row["asof_x"], row["asof_y"]) == (None, "new_y")


def test_temporal_reserved_name_collisions_fail_loudly(spark):
    left = spark.createDataFrame([("a", 1, 1, "v")], "key string, ts long, id long, _side string")
    right = spark.createDataFrame([("a", 1, 2, "s")], "key string, ts long, id long, state string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, keys=["key"], ts_col="ts", seq_col="id", value_cols=["state"])
    l2 = spark.createDataFrame([("a", 1, 1)], "key string, ts long, _b long")
    with pytest.raises(ValueError, match="collide"):
        banded_range_join(
            l2, right, keys=["key"], left_ts="ts", right_ts="ts",
            band=5, left_cols=["_b"], right_cols=["state"],
        )
