"""Canned-parser family tests, driven by the reference's own inline
test vectors (lib/vrl/stdlib/src/parse_*.rs examples/tests)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark import parsers as P


def _one(spark, line: str):
    return spark.createDataFrame([(line,)], "line string")


def test_apache_error(spark):
    # vector: parse_apache_log.rs error-format example
    row = P.parse_apache_error(
        _one(
            spark,
            "[Fri Sep 09 10:42:29 2011] [core:error] [pid 35708:tid 4328636416]"
            " [client 72.15.99.187:55723] File does not exist: /favicon.ico",
        )
    ).first()
    assert row["module"] == "core"
    assert row["severity"] == "error"
    assert row["pid"] == 35708
    assert row["thread"] == "4328636416"
    assert row["client"] == "72.15.99.187"
    assert row["port"] == 55723
    assert row["message"] == "File does not exist: /favicon.ico"
    assert str(row["timestamp"]) == "2011-09-09 10:42:29"
    assert not row["_parse_error"]


def test_nginx_combined(spark):
    # vector: parse_nginx_log.rs combined example
    row = P.parse_nginx_log(
        _one(
            spark,
            '172.17.0.1 - alice [01/Apr/2021:12:02:31 +0000]'
            ' "POST /not-found HTTP/1.1" 404 153'
            ' "http://localhost/somewhere"'
            ' "Mozilla/5.0 (Windows NT 10.0)" "2.75"',
        )
    ).first()
    assert row["client"] == "172.17.0.1"
    assert row["user"] == "alice"
    assert row["method"] == "POST"
    assert row["path"] == "/not-found"
    assert row["status"] == 404
    assert row["size"] == 153
    assert row["referer"] == "http://localhost/somewhere"
    assert row["compression"] == "2.75"
    assert not row["_parse_error"]


def test_nginx_error(spark):
    # vector: parse_nginx_log.rs error example
    row = P.parse_nginx_log(
        _one(
            spark,
            '2021/04/01 13:06:48 [error] 31#31: *1 open()'
            ' "/usr/share/nginx/html/not-found" failed'
            ' (2: No such file or directory), client: 172.17.0.1,'
            ' server: localhost, request: "POST /not-found HTTP/1.1",'
            ' host: "localhost:8081"',
        ),
        format="error",
    ).first()
    assert row["severity"] == "error"
    assert row["pid"] == 31
    assert row["tid"] == 31
    assert row["cid"] == 1
    assert row["client"] == "172.17.0.1"
    assert row["server"] == "localhost"
    assert row["request"] == "POST /not-found HTTP/1.1"
    assert row["host"] == "localhost:8081"
    assert not row["_parse_error"]


def test_glog(spark):
    # vector: parse_glog.rs example
    row = P.parse_glog(
        _one(
            spark,
            "I20210131 14:48:54.411655    15"
            " grpc_health_check_service.cc:67] Building"
            " HealthCheckServiceImpl...",
        )
    ).first()
    assert row["level"] == "info"
    assert str(row["timestamp"]) == "2021-01-31 14:48:54.411655"
    assert row["id"] == 15
    assert row["file"] == "grpc_health_check_service.cc"
    assert row["line_no"] == 67
    assert row["message"] == "Building HealthCheckServiceImpl..."


def test_klog(spark):
    # vector: parse_klog.rs example (level W)
    row = P.parse_klog(
        _one(spark, "W0131 14:48:54.411655      15 main.go:67] hello"),
        year=2021,
    ).first()
    assert row["level"] == "warning"
    assert str(row["timestamp"]) == "2021-01-31 14:48:54.411655"
    assert row["id"] == 15
    assert row["file"] == "main.go"
    assert row["line_no"] == 67
    assert row["message"] == "hello"


def test_linux_authorization(spark):
    # vector: parse_linux_authorization.rs example
    row = P.parse_linux_authorization(
        _one(
            spark,
            "Mar 23 01:49:58 localhost sshd[1111]: Accepted publickey"
            " for eng from 10.1.1.1 port 8888 ssh2: RSA SHA256:foobar",
        ),
        year=2022,
    ).first()
    assert row["hostname"] == "localhost"
    assert row["appname"] == "sshd"
    assert row["procid"] == 1111
    assert str(row["timestamp"]) == "2022-03-23 01:49:58"
    assert row["message"].startswith("Accepted publickey for eng")


def test_vpc_flow_default_and_custom(spark):
    # vector: parse_aws_vpc_flow_log.rs examples (NODATA + custom fmt)
    row = P.parse_aws_vpc_flow_log(
        _one(
            spark,
            "2 123456789010 eni-1235b8ca123456789 - - - - - - -"
            " 1431280876 1431280934 - NODATA",
        )
    ).first()
    assert row["version"] == 2
    assert row["account_id"] == 123456789010
    assert row["interface_id"] == "eni-1235b8ca123456789"
    assert row["srcaddr"] is None and row["packets"] is None
    assert row["start"] == 1431280876 and row["end"] == 1431280934
    assert row["log_status"] == "NODATA"
    assert not row["_parse_error"]

    custom = P.parse_aws_vpc_flow_log(
        _one(
            spark,
            "- eni-1235b8ca123456789 10.0.1.5 10.0.0.220 10.0.1.5 203.0.113.5",
        ),
        format="instance_id interface_id srcaddr dstaddr pkt_srcaddr pkt_dstaddr",
    ).first()
    assert custom["instance_id"] is None
    assert custom["srcaddr"] == "10.0.1.5"
    assert custom["pkt_dstaddr"] == "203.0.113.5"


def test_alb(spark):
    # vector: parse_aws_alb_log.rs doc example (abridged ARN)
    line = (
        "http my-loadbalancer 192.168.131.39:2817 10.0.0.1:80 0.000 0.001"
        ' 0.000 200 200 34 366 "GET http://www.example.com:80/ HTTP/1.1"'
        ' "curl/7.46.0" - - arn:aws:elb:us-east-2:123:targetgroup/t/73e2'
        ' "Root=1-58337262-36d228ad5d99923122bbe354" "-" "-" 0'
        ' 2018-07-02T22:22:48.364000Z "forward" "-" "-"'
    )
    row = P.parse_aws_alb_log(_one(spark, line)).first()
    assert row["type"] == "http"
    assert row["elb"] == "my-loadbalancer"
    assert row["client_host"] == "192.168.131.39:2817"
    assert row["received_bytes"] == 34
    assert row["sent_bytes"] == 366
    assert row["request"] == "GET http://www.example.com:80/ HTTP/1.1"
    assert row["user_agent"] == "curl/7.46.0"
    assert row["ssl_cipher"] is None  # '-' -> null
    assert row["trace_id"] == "Root=1-58337262-36d228ad5d99923122bbe354"
    assert row["actions_executed"] == "forward"
    assert not row["_parse_error"]


def test_parse_tokens(spark):
    # vector: parse_tokens.rs example + tokenize.rs unit vectors
    rows = (
        _one(spark, 'A sentence "with \\"a\\" sentence inside" and [some brackets]')
        .select(P.parse_tokens(F.col("line")).alias("t"))
        .first()
    )
    assert rows["t"] == [
        "A", "sentence", 'with \\"a\\" sentence inside', "and", "some brackets",
    ]
    simple = (
        _one(spark, "foo  \t bar - baz")
        .select(P.parse_tokens(F.col("line")).alias("t"))
        .first()
    )
    assert simple["t"] == ["foo", "bar", None, "baz"]


def test_parse_regex_all(spark):
    out = (
        _one(spark, "a1 b22 c333")
        .select(P.parse_regex_all(F.col("line"), r"([a-z])(?:\d+)").alias("m"))
        .first()
    )
    assert out["m"] == ["a", "b", "c"]


def test_user_agent(spark):
    ua = (
        _one(
            spark,
            "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
            " (KHTML, like Gecko) Chrome/89.0.4389.114 Safari/537.36",
        )
        .select(P.parse_user_agent(F.col("line")).alias("ua"))
        .first()["ua"]
    )
    assert ua["browser_family"] == "Chrome"
    assert ua["browser_version"] == "89.0.4389.114"
    assert ua["os_family"] == "Windows"
    assert ua["device_category"] == "pc"


def test_ruby_hash(spark):
    # vector: parse_ruby_hash.rs example shape
    h = (
        _one(spark, '{ "test" => "value", "testNum" => 0.2, "testObj" => nil }')
        .select(
            P.parse_ruby_hash(
                F.col("line"), "test string, testNum double, testObj string"
            ).alias("h")
        )
        .first()["h"]
    )
    assert h["test"] == "value"
    assert h["testNum"] == pytest.approx(0.2)
    assert h["testObj"] is None


def test_xml(spark):
    out = (
        _one(spark, '<log level="info"><msg>ok</msg><msg>two</msg></log>')
        .select(P.parse_xml(F.col("line")).alias("x"))
        .first()["x"]
    )
    assert out == '{"log": {"@level": "info", "msg": ["ok", "two"]}}'
    bad = (
        _one(spark, "<not-xml")
        .select(P.parse_xml(F.col("line")).alias("x"))
        .first()["x"]
    )
    assert bad is None


def test_cloudwatch_subscription(spark):
    line = (
        '{"owner":"111","messageType":"DATA_MESSAGE","logGroup":"g",'
        '"logStream":"s","subscriptionFilters":["f"],'
        '"logEvents":[{"id":"1","timestamp":1600000000000,"message":"m"}]}'
    )
    row = P.parse_aws_cloudwatch_log_subscription_message(
        _one(spark, line)
    ).first()["parsed"]
    assert row["owner"] == "111"
    assert row["logEvents"][0]["timestamp"] == 1600000000000
    assert row["logEvents"][0]["message"] == "m"


def test_parse_failure_flags(spark):
    for fn in (P.parse_apache_error, P.parse_nginx_log, P.parse_glog):
        assert fn(_one(spark, "garbage ###")).first()["_parse_error"]


def test_syslog_3164_space_padded_day(spark):
    from vector_spark.parsers import parse_syslog_3164

    df = spark.createDataFrame(
        [("<34>Dec  5 10:00:00 host01 app[77]: hello",)], "line string"
    )
    r = parse_syslog_3164(df, year=2024).collect()[0]
    assert r._parse_error is False
    assert r.timestamp is not None and r.timestamp.day == 5


def test_unparseable_timestamp_sets_null_not_job_abort(spark):
    # Spark 4 default ANSI mode: to_timestamp would throw
    # CANNOT_PARSE_TIMESTAMP and kill the job; the parse contract is
    # _parse_error / NULL timestamp
    from vector_spark.parsers import parse_syslog_3164

    df = spark.createDataFrame(
        [("<34>Foo 99 99:99:99 host01 app[77]: hi",)], "line string"
    )
    rows = parse_syslog_3164(df, year=2024).collect()
    assert len(rows) == 1  # no exception


def test_apache_error_24_microsecond_timestamp(spark):
    from vector_spark.parsers import parse_apache_error

    df = spark.createDataFrame(
        [("[Fri Sep 09 10:42:29.902022 2011] [core:error] [pid 35708]"
          " [client 72.15.99.187:50000] File does not exist",)],
        "line string",
    )
    r = parse_apache_error(df).collect()[0]
    assert r._parse_error is False
    assert r.timestamp is not None and r.timestamp.microsecond == 902022


def test_ruby_hash_arrow_inside_string_value(spark):
    from pyspark.sql import types as T

    from vector_spark.parsers import parse_ruby_hash

    schema = T.StructType([
        T.StructField("a", T.StringType()),
        T.StructField("n", T.StringType()),
    ])
    df = spark.createDataFrame(
        [('{ "a" => "x => y", "n" => nil }',)], "line string"
    )
    r = df.select(
        parse_ruby_hash(F.col("line"), schema).alias("h")
    ).collect()[0].h
    assert r.a == "x => y"  # value preserved, not rewritten
    assert r.n is None


def test_user_agent_version_keyed_by_family(spark):
    from vector_spark.parsers import parse_user_agent

    uas = [
        ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like"
         " Gecko) Chrome/119.0.0.0 Safari/537.36 Edg/119.0.2151.44",),
        ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML,"
         " like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",),
    ]
    df = spark.createDataFrame(uas, "ua string")
    rows = df.select(parse_user_agent(F.col("ua")).alias("p")).collect()
    assert rows[0].p.browser_family == "Edge"
    assert rows[0].p.browser_version == "119.0.2151.44"
    assert rows[1].p.browser_family == "Opera"
    assert rows[1].p.browser_version == "105.0.0.0"


def test_alb_processing_times_are_floats(spark):
    from vector_spark.parsers import parse_aws_alb_log

    line = (
        'http app/my-lb/50dc 192.168.131.39:2817 10.0.0.1:80 0.001 '
        '0.048 -1 200 200 34 366 "GET http://x:80/ HTTP/1.1" '
        '"curl/7.46.0" - - arn:aws:elb:tg/my/73e '
        '"Root=1-58-23" "-" "-" 0 2018-11-30T22:22:48.364000Z '
        '"forward" "-" "-"'
    )
    df = spark.createDataFrame([(line,)], "line string")
    r = parse_aws_alb_log(df).collect()[0]
    assert r.request_processing_time == 0.001
    assert r.target_processing_time == 0.048
    assert r.response_processing_time == -1.0  # sentinel stays float
