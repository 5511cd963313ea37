"""operators/asof.py: backward-inclusive as-of join semantics."""

from __future__ import annotations

from vector_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_latest_at_or_before(spark):
    left = _df(
        spark,
        [("k", 5, "e5"), ("k", 10, "e10"), ("k", 20, "e20")],
        "key string, ts int, ev string",
    )
    right = _df(
        spark,
        [("k", 1, "v1"), ("k", 10, "v10"), ("k", 15, "v15")],
        "key string, ts int, val string",
    )
    out = {
        r.ts: r
        for r in asof_join(left, right, ["key"], "ts", ["val"]).collect()
    }
    assert len(out) == 3  # left join: every left row survives
    assert (out[5].val, out[5].matched_ts) == ("v1", 1)
    # inclusive: right.ts == left.ts matches
    assert (out[10].val, out[10].matched_ts) == ("v10", 10)
    assert (out[20].val, out[20].matched_ts) == ("v15", 15)
    assert out[5].ev == "e5"  # left-only columns preserved


def test_asof_no_preceding_right_is_null(spark):
    left = _df(spark, [("k", 1, "early")], "key string, ts int, ev string")
    right = _df(spark, [("k", 9, "late")], "key string, ts int, val string")
    r = asof_join(left, right, ["key"], "ts", ["val"]).collect()[0]
    assert r.val is None and r.matched_ts is None and r.ev == "early"


def test_asof_keys_are_isolated(spark):
    left = _df(spark, [("a", 5, "x"), ("b", 5, "y")],
               "key string, ts int, ev string")
    right = _df(spark, [("a", 1, "va")], "key string, ts int, val string")
    out = {r.key: r for r in
           asof_join(left, right, ["key"], "ts", ["val"]).collect()}
    assert out["a"].val == "va"
    assert out["b"].val is None  # b never sees a's rows


def test_asof_multiple_value_columns(spark):
    left = _df(spark, [("k", 7)], "key string, ts int")
    right = _df(spark, [("k", 3, "v", 42)],
                "key string, ts int, name string, n int")
    r = asof_join(left, right, ["key"], "ts", ["name", "n"]).collect()[0]
    assert (r.name, r.n, r.matched_ts) == ("v", 42, 3)


def test_asof_join_rejects_output_column_collision(spark):
    import pytest

    from vector_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 1, "x")], "k string, ts int, prompt string"
    )
    right = spark.createDataFrame(
        [("k", 0, "p")], "k string, ts int, prompt string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", ["prompt"])
    left2 = left.withColumnRenamed("prompt", "matched_ts")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, ["k"], "ts", ["prompt"])
