"""Round-3 regression tests for the round-2 ADVICE findings."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sample_counter_null_exclude(spark):
    """sample.rs check_conditions: a NULL exclude result means "not
    excluded" — the row must enter the sampling pool, not vanish from
    both branches."""
    from vector_spark.operators.sample import sample_counter

    df = spark.createDataFrame(
        [(i, None if i % 2 == 0 else i) for i in range(20)],
        "seq int, flag int",
    )
    # exclude evaluates to NULL for even rows (NULL > 100 is NULL)
    out = sample_counter(
        df, rate=1, order_by="seq", exclude=F.col("flag") > 100, partitions=2
    )
    # rate=1 keeps every pooled row; nothing may be lost
    assert sorted(r.seq for r in out.collect()) == list(range(20))


def test_prometheus_decode_label_corruption_flagged(spark):
    """A quoted label value containing `,word=` defeats the key= ->
    "key": rewrite; the row must surface _decode_error=true, not an
    empty label map."""
    from vector_spark.codecs import decode_prometheus

    df = spark.createDataFrame(
        [('a{msg="x,b=1"} 5',), ('ok{env="prod"} 7',)], "line string"
    )
    rows = {r.line: r for r in decode_prometheus(df).collect()}
    assert rows['ok{env="prod"} 7']["_decode_error"] is False
    assert rows['ok{env="prod"} 7']["labels"] == {"env": "prod"}
    assert rows['a{msg="x,b=1"} 5']["_decode_error"] is True


def test_name_groups_escaped_backslash():
    """r'\\\\(' is a literal backslash followed by a REAL capture
    group; the namer must name it (or bail), never desync g<n> names
    from the group count (KeyError at executor runtime)."""
    import re

    from vector_spark.parsers import _name_groups

    pat = r"(\w+)\\((\d+))"
    named = _name_groups(pat)
    if named is not None:
        compiled = re.compile(named)
        # every capture group got a g<n> name
        assert compiled.groups == len(compiled.groupindex)
        m = re.search(named, "abc\\77")
        assert m and m.group("g1") == "abc"
    # escaped paren: NOT a group, must not be renamed
    named2 = _name_groups(r"\((\d+)\)")
    assert named2 == r"\((?P<g1>\d+)\)"
    m2 = re.search(named2, "(42)")
    assert m2 and m2.group("g1") == "42"


def test_reduce_spec_ts_override_no_stray_end(spark):
    """pipeline _t_reduce: a timestamp field given an explicit
    merge_strategies override must not also emit `<field>_end`."""
    from vector_spark.pipeline import PipelineContext, run_pipeline

    df = spark.createDataFrame(
        [("a", 1, "2024-01-01 00:00:00"), ("a", 2, "2024-01-01 00:01:00")],
        "k string, v int, ts_s string",
    ).select("k", "v", F.col("ts_s").cast("timestamp").alias("ts"))
    spec = {
        "sources": {"in": {}},
        "transforms": {
            "r": {
                "type": "reduce",
                "inputs": ["in"],
                "group_by": ["k"],
                "order_by": "v",
                "merge_strategies": {"ts": "max"},
            }
        },
        "sinks": {"out": {"type": "memory", "inputs": ["r"]}},
    }
    out = run_pipeline(PipelineContext(spark), spec, {"in": df})["out"]
    assert "ts_end" not in out.columns
    row = out.collect()[0]
    assert row["ts"].minute == 1  # max strategy applied

    # default (no override): ts -> first + ts_end = last
    spec["transforms"]["r"].pop("merge_strategies")
    out2 = run_pipeline(PipelineContext(spark), spec, {"in": df})["out"]
    assert "ts_end" in out2.columns
    r2 = out2.collect()[0]
    assert r2["ts"].minute == 0 and r2["ts_end"].minute == 1
