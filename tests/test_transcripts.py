"""The foundation: the derived transcripts table is deterministic and
bit-identical between the Spark derivation and the DuckDB oracle CTE
— every downstream oracle rests on this.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.conftest import SF
from vector_spark.transcripts import TRANSCRIPTS_DUCKDB_CTE


def test_spark_duckdb_parity(transcripts):
    sdf = transcripts.orderBy("conv_id", "turn_idx").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    ddf = con.sql(TRANSCRIPTS_DUCKDB_CTE + " ORDER BY conv_id, turn_idx").df()
    assert sdf.shape == ddf.shape
    for c in sdf.columns:
        a, b = sdf[c], ddf[c]
        if c == "ts":
            a, b = pd.to_datetime(a), pd.to_datetime(b).astype("datetime64[ns]")
        assert a.fillna("<N>").tolist() == b.fillna("<N>").tolist(), c


def test_schema_and_invariants(transcripts):
    pdf = transcripts.toPandas()
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # turn_idx dense per conv
    g = pdf.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # roles from the fixed set; tools only for assistant/tool
    assert set(pdf.role.unique()) <= {"user", "assistant", "system", "tool"}
    with_tool = pdf[pdf.tool.notna()]
    assert set(with_tool.role.unique()) <= {"assistant", "tool"}
    # ~2% malformed
    malformed = (~pdf.text.str.startswith("[")).mean()
    assert 0.005 < malformed < 0.05


def test_determinism(spark, transcripts):
    from vector_spark.transcripts import load_transcripts

    a = transcripts.orderBy("conv_id", "turn_idx").toPandas()
    b = load_transcripts(spark, SF).orderBy("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)
