"""Round-4 regression tests for the round-3 ADVICE findings."""

from __future__ import annotations

import glob
import os
import textwrap


def test_config_enrich_transform_from_config(spark, tmp_path):
    """[enrichment_tables] in a config must feed the spec transform
    types `enrich`/`geoip` (ctx.enrichment_tables), not only the VRL
    get_enrichment_table_record path — and a reference-style relative
    path '../shared/t.csv' must resolve one level UP from the config
    file (normpath, not lstrip('./'))."""
    from vector_spark.config import run_config

    shared = tmp_path / "shared"
    shared.mkdir()
    (shared / "roles.csv").write_text(
        "role,team\nuser,human\nassistant,model\n"
    )
    confd = tmp_path / "conf"
    confd.mkdir()
    cfg_path = confd / "pipe.toml"
    cfg_path.write_text(textwrap.dedent("""
        [enrichment_tables.roles]
          type = "file"
          [enrichment_tables.roles.file]
            path = "../shared/roles.csv"

        [sources.in]
          type = "stdin"
          lines = ["x"]

        [transforms.tag]
          type = "enrich"
          inputs = ["in"]
          table = "roles"

        [sinks.out]
          type = "memory"
          inputs = ["tag"]
    """))
    src = spark.createDataFrame(
        [("user",), ("assistant",), ("ghost",)], "role string"
    )
    res = run_config(spark, str(cfg_path), source_frames={"in": src})
    got = {r["role"]: r["team"] for r in res["out"].collect()}
    assert got == {"user": "human", "assistant": "model", "ghost": None}


def test_run_config_streaming_applies_decoding_codec(spark, tmp_path):
    """The same config must produce the same event schema in stream
    mode as in run mode: decoding.codec applies to the streaming text
    reader too (it's pure Column expressions)."""
    from vector_spark.config import run_config, run_config_streaming

    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "a.jsonl").write_text(
        '{"role": "user", "n": 1}\n{"role": "tool", "n": 2}\n'
    )
    toml = textwrap.dedent(f"""
        [sources.in]
          type = "file"
          include = "{ind}"
          [sources.in.decoding]
            codec = "json"

        [transforms.keep]
          type = "filter"
          inputs = ["in"]
          [transforms.keep.condition]
            type = "vrl"
            source = '.role == "user"'

        [sinks.out]
          type = "memory"
          inputs = ["keep"]
    """)
    streamed = run_config_streaming(
        spark, toml, out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    batch = run_config(spark, toml)
    srows = sorted(r["role"] for r in streamed["out"])
    brows = sorted(r["role"] for r in batch["out"].collect())
    assert srows == brows == ["user"]


def _read_text_lines(path: str) -> list[str]:
    lines: list[str] = []
    files = set(
        glob.glob(os.path.join(path, "**", "*.txt"), recursive=True)
    ) | set(glob.glob(os.path.join(path, "**", "part-*"), recursive=True))
    for f in sorted(files):
        if os.path.isfile(f) and not f.endswith(".crc"):
            with open(f) as fh:
                lines.extend(ln for ln in fh.read().splitlines() if ln)
    return lines


def test_streaming_file_sink_honors_encoding(spark, tmp_path):
    """A streaming `file` sink must write the configured encoding
    codec as newline-framed text (same bytes as the batch file sink),
    not silently emit parquet."""
    from vector_spark.config import run_config, run_config_streaming

    ind = tmp_path / "in"
    ind.mkdir()
    (ind / "a.jsonl").write_text(
        '{"role": "user", "n": 1}\n{"role": "tool", "n": 2}\n'
    )
    toml_t = textwrap.dedent("""
        [sources.in]
          type = "file"
          include = "{ind}"
          [sources.in.decoding]
            codec = "json"

        [sinks.out]
          type = "file"
          path = "{out}"
          inputs = ["in"]
          [sinks.out.encoding]
            codec = "logfmt"
    """)
    s_out = str(tmp_path / "s_out")
    b_out = str(tmp_path / "b_out")
    streamed = run_config_streaming(
        spark, toml_t.format(ind=ind, out=s_out),
        out_dir=str(tmp_path / "o"), checkpoint_dir=str(tmp_path / "ck"),
    )
    assert streamed["out"]["rows"] == 2
    run_config(spark, toml_t.format(ind=ind, out=b_out))
    s_lines = sorted(_read_text_lines(s_out))
    b_lines = sorted(_read_text_lines(b_out))
    assert s_lines == b_lines and len(s_lines) == 2
    assert not glob.glob(os.path.join(s_out, "**", "*.parquet"),
                         recursive=True)
