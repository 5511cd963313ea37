"""Config front door (vector_spark/config.py): load reference-style
TOML configs, run them end-to-end, and execute their `[[tests]]`
blocks with the `vector test` pass semantics — including an actual
config file from the reference tree, unmodified.
"""

from __future__ import annotations

import textwrap

from vector_spark.config import (
    load_config,
    normalize_test_inputs,
    run_config,
    run_config_tests,
    spec_from_config,
)

SF = "/root/testdata/sf0.001"

DEMO_TOML = textwrap.dedent("""
    [sources.in]
      type = "demo_logs"
      format = "apache_common"

    [transforms.parsed]
      type = "remap"
      inputs = ["in"]
      source = '''
        . |= parse_common_log!(.line)
        del(.line)
      '''

    [transforms.split]
      type = "route"
      inputs = ["parsed"]
      [transforms.split.route.errors]
        type = "vrl"
        source = ".status >= 500"
      [transforms.split.route.ok]
        type = "vrl"
        source = ".status < 500"

    [sinks.errors_out]
      type = "blackhole"
      inputs = ["split.errors"]

    [sinks.ok_out]
      type = "blackhole"
      inputs = ["split.ok"]

    [[tests]]
      name = "routes server errors"
      no_outputs_from = []
      [[tests.inputs]]
        insert_at = "split"
        [tests.inputs.log_fields]
        status = 503
        method = "GET"
      [[tests.outputs]]
        extract_from = "split.errors"
        [[tests.outputs.conditions]]
          type = "vrl"
          source = ".status == 503"
""")


def test_load_config_toml_and_json():
    cfg = load_config(DEMO_TOML)
    assert set(cfg["sources"]) == {"in"}
    assert cfg["transforms"]["split"]["route"]["errors"]["type"] == "vrl"
    assert load_config('{"sources": {"x": {"type": "file"}}}')["sources"]


def test_spec_from_config_option_mapping():
    spec = spec_from_config(load_config(DEMO_TOML))
    assert spec["transforms"]["split"]["routes"]["ok"]["source"] == ".status < 500"
    assert spec["transforms"]["parsed"]["type"] == "remap"
    assert spec["sinks"]["ok_out"]["inputs"] == ["split.ok"]


def test_run_config_end_to_end(spark):
    out = run_config(spark, DEMO_TOML, sf_dir=SF)
    assert set(out) == {"errors_out", "ok_out"}
    # demo apache_common has both <500 and >=500 statuses; counts
    # must partition the parsed stream
    assert out["errors_out"] > 0 and out["ok_out"] > 0
    total = out["errors_out"] + out["ok_out"]
    from vector_spark.sources import demo_logs_batch

    assert total == demo_logs_batch(spark, SF, "apache_common").count()


def test_run_config_tests_inline(spark):
    results = run_config_tests(spark, DEMO_TOML)
    assert results == {"routes server errors": []}


def test_reference_filter_toml_verbatim(spark):
    """An unmodified config file from the reference repo runs through
    the `vector test` harness and every test passes."""
    results = run_config_tests(
        spark, "/root/reference/tests/behavior/transforms/filter.toml"
    )
    assert len(results) == 7
    failures = {k: v for k, v in results.items() if v}
    assert not failures, failures


def test_normalize_raw_value_inputs():
    cfg = load_config(
        "/root/reference/tests/behavior/transforms/filter.toml"
    )
    ins = normalize_test_inputs(cfg["tests"][0])
    assert ins == [
        {"insert_at": "filter_a", "log_fields": {"message": "test filter 1"}}
    ]


import pytest  # noqa: E402

# verbatim reference behavior configs: (suite file, known-diverging
# test names). dedupe_nested_fields is the documented typed-column
# divergence (per-event heterogeneous shapes); the two remap cases are
# the byte-exact-Rust-error-string and live-DNS cases — same list the
# harvested-fixture suite documents in tests/test_behavior.py.
VERBATIM = [
    ("filter", set()),
    ("route", set()),
    ("reduce", set()),
    ("pipelines_simple", set()),
    ("remap_with_drop", set()),
    ("dedupe", {"dedupe_nested_fields"}),
    ("remap", {"remap_infallible_assignment", "remap_function_reverse_dns"}),
]


@pytest.mark.parametrize(
    "suite,known", VERBATIM, ids=[s for s, _ in VERBATIM]
)
def test_reference_behavior_toml_verbatim(spark, suite, known):
    """Unmodified reference config files run through run_config_tests;
    every test passes except the explicitly documented divergences."""
    saved = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        results = run_config_tests(
            spark,
            f"/root/reference/tests/behavior/transforms/{suite}.toml",
            base_dir="/root/reference",
        )
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", saved)
    failures = {k: v for k, v in results.items() if v and k not in known}
    assert results and not failures, failures


def test_stdin_and_exec_sources(spark):
    """stdin (config-carried lines + decoding codec) and exec
    (scheduled command, reference metadata keys) as config sources."""
    import textwrap

    from vector_spark.config import run_config

    toml = textwrap.dedent("""
        [sources.logs]
          type = "stdin"
          lines = ['{"a": 1}', '{"a": 2}']
        [sources.cmd]
          type = "exec"
          command = ["echo", "hello-from-exec"]
        [sinks.l_out]
          type = "memory"
          inputs = ["logs"]
        [sinks.c_out]
          type = "memory"
          inputs = ["cmd"]
    """)
    out = run_config(spark, toml)
    lines = {r["line"] for r in out["l_out"].collect()}
    assert lines == {'{"a": 1}', '{"a": 2}'}
    cmd_rows = out["c_out"].collect()
    assert len(cmd_rows) == 1
    assert cmd_rows[0]["message"] == "hello-from-exec"
    assert list(cmd_rows[0]["command"]) == ["echo", "hello-from-exec"]


def test_load_config_missing_path_raises(tmp_path):
    import pytest

    from vector_spark.config import load_config

    with pytest.raises(FileNotFoundError, match="cfng.toml"):
        load_config(str(tmp_path / "cfng.toml"))


def test_map_transform_key_field_translation():
    from vector_spark.config import map_transform

    t = map_transform(
        "t", {"type": "throttle", "threshold": 100, "window_secs": 60,
              "key_field": "{{ host }}"},
    )
    assert t["key"] == ["host"] and "key_field" not in t
    s = map_transform(
        "s", {"type": "sample", "rate": 10, "key_field": "message"},
    )
    assert s["key"] == "message"
