"""As-of join unit semantics (union+window strategy)."""

from datetime import datetime

from harvesttext_spark.operators.asof import as_of_join


def test_asof_basic(spark):
    L = spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 1, 0, 10)),
            (2, 10, datetime(2024, 1, 1, 0, 30)),
            (3, 20, datetime(2024, 1, 1, 0, 5)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    R = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 0, 0), 1.0),
            (10, datetime(2024, 1, 1, 0, 20), 2.0),
            (20, datetime(2024, 1, 1, 0, 6), 9.0),  # AFTER user 20's event
        ],
        "user_id long, ts timestamp, v double",
    )
    out = {r["event_id"]: r["asof_v"] for r in as_of_join(L, R, "user_id", "ts", ["v"]).collect()}
    assert out[1] == 1.0  # before the 0:20 update
    assert out[2] == 2.0  # after it
    assert out[3] is None  # no prior right row


def test_asof_equal_timestamp_inclusive(spark):
    L = spark.createDataFrame(
        [(1, 5, datetime(2024, 1, 1, 0, 10))], "event_id long, user_id long, ts timestamp"
    )
    R = spark.createDataFrame(
        [(5, datetime(2024, 1, 1, 0, 10), 7.0)], "user_id long, ts timestamp, v double"
    )
    out = as_of_join(L, R, "user_id", "ts", ["v"]).first()
    assert out["asof_v"] == 7.0  # ts equality is inclusive (>= semantics)
