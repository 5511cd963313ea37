"""statsd / prometheus / native_json codecs + exec + internal_metrics.

statsd fixtures mirror the reference's parser tests
(src/sources/statsd/parser.rs mod test) and sink encode tests
(src/sinks/statsd.rs); prometheus fixtures mirror
src/sinks/prometheus/collector.rs test expositions.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF

from vector_spark.codecs import (
    decode_native_json,
    decode_prometheus,
    decode_prometheus_types,
    decode_statsd,
    encode_native_json_log,
    encode_native_json_metric,
    encode_prometheus,
    encode_prometheus_histogram,
    encode_statsd,
    prometheus_headers,
)


def _lines(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "line string")


def _decode_one(spark, line):
    return decode_statsd(_lines(spark, [line])).collect()[0]


# -- statsd decode: reference parser.rs test vectors ------------------------

def test_statsd_counter(spark):
    r = _decode_one(spark, "foo:1|c")
    assert (r.name, r.type, r.metric_kind, r.value) == ("foo", "counter", "incremental", 1.0)
    assert not r._decode_error and r.tags == {}


def test_statsd_counter_tags(spark):
    r = _decode_one(spark, "foo:1|c|#tag1,tag2:value")
    # bare tag -> "true" (parser.rs parse_tags, telegraf convention)
    assert r.tags == {"tag1": "true", "tag2": "value"}


def test_statsd_sampled_counter(spark):
    r = _decode_one(spark, "bar:2|c|@0.1")
    assert r.value == pytest.approx(20.0)


def test_statsd_zero_sampled_counter(spark):
    # parser.rs sanitize_sampling: rate 0 -> 1.0
    r = _decode_one(spark, "bar:2|c|@0")
    assert r.value == pytest.approx(2.0)


def test_statsd_sampled_timer(spark):
    # glork:320|ms|@0.1 -> distribution, 0.32s (ms -> base seconds), rate 10
    r = _decode_one(spark, "glork:320|ms|@0.1")
    assert (r.type, r.statistic) == ("distribution", "histogram")
    assert r.value == pytest.approx(0.320)
    assert r.sample_rate == 10


def test_statsd_sampled_histogram_with_tags(spark):
    r = _decode_one(spark, "glork:320|h|@0.1|#region:us-west1,production,e:")
    assert (r.type, r.statistic, r.sample_rate) == ("distribution", "histogram", 10)
    assert r.value == pytest.approx(320.0)
    assert r.tags == {"region": "us-west1", "production": "true", "e": ""}


def test_statsd_sampled_distribution_summary(spark):
    r = _decode_one(spark, "glork:320|d|@0.1|#region:us-west1,production,e:")
    assert (r.type, r.statistic) == ("distribution", "summary")


def test_statsd_gauge(spark):
    r = _decode_one(spark, "gaugor:333|g")
    assert (r.type, r.metric_kind, r.value) == ("gauge", "absolute", 333.0)


def test_statsd_signed_gauges(spark):
    neg = _decode_one(spark, "gaugor:-4|g")
    pos = _decode_one(spark, "gaugor:+10|g")
    assert (neg.metric_kind, neg.value) == ("incremental", -4.0)
    assert (pos.metric_kind, pos.value) == ("incremental", 10.0)


def test_statsd_set(spark):
    r = _decode_one(spark, "uniques:765|s")
    assert (r.type, r.metric_kind, r.member) == ("set", "incremental", "765")


def test_statsd_key_sanitize(spark):
    # parser.rs sanitize_key: '/'->'-' (net), whitespace->_, strip junk
    r = _decode_one(spark, "a/b c$d:1|c")
    assert r.name == "a-b_cd"


def test_statsd_malformed(spark):
    rows = decode_statsd(_lines(spark, ["nocolon", "x:1", "x:abc|c", "x:1|q"])).collect()
    assert all(r._decode_error for r in rows)



def _mapstr(c):
    """MAP columns can't feed exceptAll; compare as sorted-entry JSON."""
    return F.to_json(F.array_sort(F.map_entries(F.col(c))))


# -- statsd encode + roundtrip ----------------------------------------------

def _metric_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "name string, type string, metric_kind string, value double, "
        "member string, statistic string, sample_rate int, "
        "tags map<string,string>",
    )


def test_statsd_encode_forms(spark):
    rows = [
        ("c1", "counter", "incremental", 1.5, None, None, None, {}),
        ("g1", "gauge", "absolute", 333.0, None, None, None, {"env": "prod"}),
        ("g2", "gauge", "incremental", 10.0, None, None, None, {}),
        ("g3", "gauge", "incremental", -4.0, None, None, None, {}),
        ("d1", "distribution", "incremental", 0.32, None, "histogram", 10, {}),
        ("s1", "set", "incremental", None, "765", None, None, {"b": "true", "a": "x"}),
    ]
    got = [r.statsd_line for r in encode_statsd(_metric_df(spark, rows)).collect()]
    assert got == [
        "c1:1.5|c",
        "g1:333|g|#env:prod",
        "g2:+10|g",
        "g3:-4|g",
        "d1:0.32|h|@0.1",
        "s1:765|s|#a:x,b",  # sorted tags, bare 'true'
    ]


def test_statsd_roundtrip(spark):
    from vector_spark.sources import demo_logs_statsd

    lines = demo_logs_statsd(spark, SF)
    decoded = decode_statsd(lines)
    assert decoded.filter("_decode_error").count() == 0
    reencoded = encode_statsd(decoded.drop("line"))
    # re-decode the re-encoded lines: metric fields must be identical
    # (byte equality doesn't hold: tag order and rate formatting are
    # normalized by the encoder, as the reference sink does)
    twice = decode_statsd(
        reencoded.select("event_id", F.col("statsd_line").alias("line"))
    ).select("event_id", "name", "type", "metric_kind", "value", "member",
             "statistic", "sample_rate", _mapstr("tags").alias("tags"))
    once = decoded.select("event_id", "name", "type", "metric_kind", "value",
                          "member", "statistic", "sample_rate",
                          _mapstr("tags").alias("tags"))
    assert once.exceptAll(twice).count() == 0 and twice.exceptAll(once).count() == 0


# -- prometheus --------------------------------------------------------------

def test_prometheus_encode_body(spark):
    rows = [
        ("hits", "counter", "incremental", 10.0, None, None, None, {}),
        ("temperature", "gauge", "absolute", -1.1, None, None, None,
         {"code": 'rust "high"', "zone": "a\\b"}),
    ]
    got = [r.prom_line for r in encode_prometheus(
        _metric_df(spark, rows), namespace="vector").collect()]
    assert got[0] == "vector_hits{} 10" or got[0] == "vector_hits 10"
    # collector.rs format_tag escapes backslash and double-quote
    assert got[1] == 'vector_temperature{code="rust \\"high\\"",zone="a\\\\b"} -1.1'


def test_prometheus_headers(spark):
    rows = [
        ("hits", "counter", "incremental", 10.0, None, None, None, {}),
        ("hits", "counter", "incremental", 3.0, None, None, None, {}),
        ("temp", "gauge", "absolute", 1.0, None, None, None, {}),
    ]
    hdrs = {r.fullname: r.prom_header for r in prometheus_headers(
        _metric_df(spark, rows), namespace="ns").collect()}
    assert len(hdrs) == 2
    assert hdrs["ns_hits"] == "# HELP ns_hits hits\n# TYPE ns_hits counter"


def test_prometheus_histogram_expansion(spark):
    df = spark.createDataFrame(
        [("requests", [(2.5, 5), (5.0, 2)], 31.2, 10, {"env": "prod"})],
        "name string, buckets array<struct<upper:double,count:long>>, "
        "sum double, count long, tags map<string,string>",
    )
    lines = [r.prom_line for r in encode_prometheus_histogram(df).collect()]
    # cumulative buckets then +Inf=count, _sum, _count (collector.rs:60-85)
    assert lines == [
        'requests_bucket{env="prod",le="2.5"} 5',
        'requests_bucket{env="prod",le="5.0"} 7',
        'requests_bucket{env="prod",le="+Inf"} 10',
        'requests_sum{env="prod"} 31.2',
        'requests_count{env="prod"} 10',
    ]


def test_prometheus_decode(spark):
    rows = decode_prometheus(_lines(spark, [
        "# HELP http_requests_total Total.",
        "# TYPE http_requests_total counter",
        'http_requests_total{method="post",code="200"} 1027 1395066363000',
        "metric_without_labels 12.47",
        'escaped{path="C:\\\\DIR",msg="say \\"hi\\""} 1',
        "no_value_line",
    ])).collect()
    assert rows[0]._decode_error and rows[1]._decode_error
    r = rows[2]
    assert (r.name, r.value, r.ts_millis) == ("http_requests_total", 1027.0, 1395066363000)
    assert r.labels == {"method": "post", "code": "200"}
    assert (rows[3].name, rows[3].value, rows[3].ts_millis) == ("metric_without_labels", 12.47, None)
    assert rows[4].labels == {"path": "C:\\DIR", "msg": 'say "hi"'}
    assert rows[5]._decode_error


def test_prometheus_decode_types(spark):
    t = {r.name: r.prom_type for r in decode_prometheus_types(_lines(spark, [
        "# TYPE http_requests_total counter",
        "# TYPE temp gauge",
        "plain_line 1",
    ])).collect()}
    assert t == {"http_requests_total": "counter", "temp": "gauge"}


def test_prometheus_roundtrip(spark):
    from vector_spark.sources import demo_metrics

    m = demo_metrics(spark, SF)
    enc = encode_prometheus(m)
    dec = decode_prometheus(enc.select(F.col("prom_line").alias("line")))
    assert dec.filter("_decode_error").count() == 0
    bad = dec.filter(
        (F.col("name") != F.col("name")) |
        (F.col("value") != F.col("value").cast("double"))
    )
    # names + label maps + values survive the roundtrip
    orig = m.select("name", _mapstr("tags").alias("labels"), "value")
    back = dec.select("name", _mapstr("labels").alias("labels"), "value")
    assert orig.exceptAll(back).count() == 0 and back.exceptAll(orig).count() == 0


# -- native_json --------------------------------------------------------------

def test_native_json_decode(spark):
    rows = decode_native_json(_lines(spark, [
        '{"log": {"message": "hello", "level": "info"}}',
        '{"metric": {"name": "hits", "kind": "incremental", "counter": {"value": 2.5}, "tags": {"env": "prod"}}}',
        '{"trace": {"spans": []}}',
        '{"unknown": 1}',
    ])).collect()
    assert rows[0].event_kind == "log"
    assert '"message":"hello"' in rows[0].log.replace(" ", "")
    m = rows[1]
    assert m.event_kind == "metric"
    assert (m.metric.name, m.metric.kind, m.metric.counter.value) == ("hits", "incremental", 2.5)
    assert m.metric.tags == {"env": "prod"}
    assert rows[2].event_kind == "trace"
    assert rows[3]._decode_error


def test_native_json_roundtrip_log(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    enc = ev.select(
        "event_id",
        encode_native_json_log(ev, ["event_id", "event_type", "value"]).alias("line"),
    )
    dec = decode_native_json(enc)
    assert dec.filter("event_kind != 'log'").count() == 0
    back = dec.select(
        F.get_json_object("log", "$.event_id").cast("long").alias("event_id"),
        F.get_json_object("log", "$.event_type").alias("event_type"),
    )
    orig = ev.select("event_id", "event_type")
    assert orig.exceptAll(back).count() == 0


def test_native_json_roundtrip_metric(spark):
    from vector_spark.sources import demo_metrics

    m = demo_metrics(spark, SF).limit(200)
    enc = m.select(encode_native_json_metric(m).alias("line"))
    dec = decode_native_json(enc)
    got = dec.select(
        F.col("metric.name").alias("name"),
        F.col("metric.kind").alias("metric_kind"),
        F.coalesce(F.col("metric.counter.value"), F.col("metric.gauge.value")).alias("value"),
        F.to_json(F.array_sort(F.map_entries(F.col("metric.tags")))).alias("tags"),
    )
    orig = m.select("name", "metric_kind", "value", _mapstr("tags").alias("tags"))
    assert orig.exceptAll(got).count() == 0


# -- exec + internal_metrics ---------------------------------------------------

def test_exec_source(spark):
    from vector_spark.sources import exec_source

    df = exec_source(spark, ["sh", "-c", "printf 'a\\nb\\n'; echo err >&2"],
                     include_stderr=True)
    rows = df.orderBy("stream", "message").collect()
    assert [(r.message, r.stream) for r in rows] == [
        ("err", "stderr"), ("a", "stdout"), ("b", "stdout")]
    r = rows[0]
    assert r.source_type == "exec" and r.command[0] == "sh" and r.host


def test_internal_metrics(spark):
    from vector_spark.metrics import StageClock, internal_metrics_df, observe_stage

    ev = spark.read.parquet(f"{SF}/events.parquet")
    observed, obs = observe_stage(ev, "parse")
    clock = StageClock()
    clock.start("parse")
    n = observed.count()
    clock.stop(rows=n)
    m = internal_metrics_df(spark, {"parse": obs}, clock)
    rows = {r.name: r for r in m.collect()}
    assert rows["events_rows_total"].value == float(n)
    assert rows["events_rows_total"].tags == {"component_id": "parse"}
    assert "stage_duration_seconds" in rows
    # and it feeds the encoders end-to-end
    from vector_spark.codecs import encode_prometheus
    assert encode_prometheus(m).count() == len(rows)


# -- pipeline integration -------------------------------------------------------

def test_decode_frame_dispatch(spark):
    from vector_spark.sources import decode_frame

    st = decode_frame(_lines(spark, ["foo:1|c"]), "statsd").collect()[0]
    assert st.type == "counter"
    pr = decode_frame(_lines(spark, ["m{a=\"b\"} 2"]), "prometheus").collect()[0]
    assert (pr.name, pr.value) == ("m", 2.0)
    nj = decode_frame(_lines(spark, ['{"log": {"x": 1}}']), "native_json").collect()[0]
    assert nj.event_kind == "log"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_frame(_lines(spark, ["x"]), "nope")


def test_file_sink_metric_codecs(spark, tmp_path):
    """file sink with statsd / prometheus / native_json encoding."""
    from vector_spark.pipeline import PipelineContext, run_pipeline

    df = _metric_df(spark, [
        ("hits", "counter", "incremental", 3.0, None, None, None, {"env": "prod"}),
        ("depth", "gauge", "absolute", 7.5, None, None, None, {}),
    ])
    spec = {
        "sources": {"metrics": {"type": "parquet"}},
        "sinks": {
            "sd": {"type": "file", "inputs": ["metrics"],
                   "path": str(tmp_path / "sd"),
                   "encoding": {"codec": "statsd"}},
            "pm": {"type": "file", "inputs": ["metrics"],
                   "path": str(tmp_path / "pm"),
                   "encoding": {"codec": "prometheus", "namespace": "ns"}},
            "nj": {"type": "file", "inputs": ["metrics"],
                   "path": str(tmp_path / "nj"),
                   "encoding": {"codec": "native_json",
                                "fields": ["name", "value"]}},
        },
    }
    res = run_pipeline(PipelineContext(spark), spec, {"metrics": df})
    assert all(res[k]["rows"] == 2 for k in ("sd", "pm", "nj"))
    sd = {r.value for r in spark.read.text(str(tmp_path / "sd")).collect()}
    assert sd == {"hits:3|c|#env:prod", "depth:7.5|g"}
    pm = {r.value for r in spark.read.text(str(tmp_path / "pm")).collect()}
    assert 'ns_hits{env="prod"} 3' in pm and "ns_depth{} 7.5" in pm or "ns_depth 7.5" in pm
    nj = {r.value for r in spark.read.text(str(tmp_path / "nj")).collect()}
    assert '{"log":{"name":"hits","value":3.0}}' in nj


def test_is_event_kind_conditions(spark):
    """is_log/is_metric conditions (src/conditions/is_log.rs): per-row
    over an event_kind column, constant otherwise."""
    from vector_spark.pipeline import compile_condition

    mixed = decode_native_json(_lines(spark, [
        '{"log": {"m": 1}}', '{"metric": {"name": "x"}}',
    ]))
    logs = mixed.filter(compile_condition({"type": "is_log"}, mixed.schema))
    mets = mixed.filter(compile_condition({"type": "is_metric"}, mixed.schema))
    assert logs.count() == 1 and mets.count() == 1
    plain = _lines(spark, ["a"])
    assert plain.filter(compile_condition({"type": "is_log"}, plain.schema)).count() == 1
    assert plain.filter(compile_condition({"type": "is_metric"}, plain.schema)).count() == 0


def test_statsd_duplicate_tag_last_wins(spark):
    from vector_spark.codecs import decode_statsd

    df = spark.createDataFrame(
        [("req:1|c|#env:a,env:b",)], "line string"
    )
    r = decode_statsd(df).collect()[0]
    # duplicate tags are legal in dogstatsd — last value wins
    # (spark.sql.mapKeyDedupPolicy=LAST_WIN) instead of the default
    # EXCEPTION policy failing the whole job on one frame
    assert r._decode_error is False
    assert dict(r.tags) == {"env": "b"}


def test_prometheus_decode_trailing_label_comma(spark):
    from vector_spark.codecs import decode_prometheus

    df = spark.createDataFrame(
        [('m{a="1",} 5', 'm{a="1"} 5')], "good string, plain string"
    ).selectExpr("stack(2, good, plain) as line")
    rows = decode_prometheus(df).collect()
    for r in rows:
        assert r._decode_error is False
        assert dict(r.labels) == {"a": "1"}
