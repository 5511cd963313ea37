"""CLI entrypoint (python -m vector_spark): run / test subcommands —
the `vector` binary's surface."""

from __future__ import annotations

import textwrap

from vector_spark.__main__ import main

from tests.conftest import SF


def test_cli_run(spark, tmp_path, capsys):
    cfg = tmp_path / "demo.toml"
    cfg.write_text(textwrap.dedent("""
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
        [transforms.errors]
          type = "filter"
          inputs = ["parsed"]
          [transforms.errors.condition]
            type = "vrl"
            source = ".status >= 500"
        [sinks.out]
          type = "blackhole"
          inputs = ["errors"]
    """))
    rc = main(["run", str(cfg), "--sf-dir", SF, "--master", "local[4]"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["out"] > 0


def test_cli_test_reference_config(spark, capsys):
    rc = main([
        "test", "/root/reference/tests/behavior/transforms/filter.toml",
        "--master", "local[4]",
    ])
    assert rc == 0
    assert "7 passed, 0 failed" in capsys.readouterr().out


def test_cli_test_failure_exit_code(spark, tmp_path, capsys):
    cfg = tmp_path / "bad.toml"
    cfg.write_text(textwrap.dedent("""
        [transforms.t]
          type = "filter"
          inputs = ["ignored"]
          [transforms.t.condition]
            type = "vrl"
            source = ".x == 1"
        [[tests]]
          name = "fails"
          no_outputs_from = []
          [[tests.inputs]]
            insert_at = "t"
            [tests.inputs.log_fields]
            x = 2
          [[tests.outputs]]
            extract_from = "t"
            [[tests.outputs.conditions]]
              type = "vrl"
              source = ".x == 2"
    """))
    rc = main(["test", str(cfg), "--master", "local[4]"])
    assert rc == 1  # the filter drops x=2, so the output is empty
    assert "FAILED" in capsys.readouterr().out
