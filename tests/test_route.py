"""Route semantics (reference src/transforms/route.rs:35-53):
a row matching k routes appears in exactly k sinks; zero matches ->
exactly one _unmatched row; both physical strategies agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from vector_spark.operators.route import route, route_single_pass, routed_counts
from vector_spark.runner_batch import flagship_routes


def test_multiplicity_invariant(parsed):
    routes = flagship_routes()
    n_input = parsed.count()
    per_row_matches = parsed.select(
        *[
            F.coalesce(cond, F.lit(False)).cast("int").alias(name)
            for name, cond in routes.items()
        ]
    )
    expected_total = (
        per_row_matches.select(
            (
                F.greatest(
                    sum(F.col(c) for c in per_row_matches.columns), F.lit(1)
                )
            ).alias("m")
        )
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    routed = route_single_pass(parsed, flagship_routes())
    assert routed.count() == expected_total
    # every input row appears at least once
    assert routed.select("conv_id", "turn_idx").distinct().count() == n_input


def test_filters_vs_single_pass_agree(parsed):
    routes_a = route(parsed, flagship_routes())
    sp = route_single_pass(parsed, flagship_routes())
    for name, df in routes_a.items():
        a = df.count()
        b = sp.filter(F.col("_route") == name).count()
        assert a == b, name


def test_unmatched_disjoint(parsed):
    routes = route(parsed, flagship_routes())
    un = routes["_unmatched"]
    for name, cond in flagship_routes().items():
        assert un.filter(cond).count() == 0, name


def test_routed_counts(parsed):
    counts = {
        r["_route"]: r["rows"]
        for r in routed_counts(parsed, flagship_routes()).collect()
    }
    assert set(counts) == {"assistant_tool", "errors", "human_long", "_unmatched"}
    assert all(v > 0 for v in counts.values())


def test_reserved_name_rejected(parsed):
    import pytest

    with pytest.raises(ValueError):
        route(parsed, {"_unmatched": F.lit(True)})


def test_text_equality_per_sink(parsed, transcripts):
    """Per-turn text byte-equality under (conv_id, turn_idx) ordering
    in every sink — the BASELINE.json per-row invariant."""
    routed = route_single_pass(parsed, flagship_routes())
    src = {
        (r.conv_id, r.turn_idx): r.text
        for r in transcripts.select("conv_id", "turn_idx", "text").collect()
    }
    for r in routed.select("conv_id", "turn_idx", "text").collect():
        assert src[(r.conv_id, r.turn_idx)] == r.text
