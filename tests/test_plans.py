"""Plan-shape invariants for the scale-critical queries.

Each assertion encodes a 100 TB design decision: a map-only stage
must stay shuffle-free, a small dimension must broadcast (never
sort-merge), a global top-k must be TakeOrderedAndProject (never a
global window sort), and scans must prune columns. A regression in
any of these is a silent perf cliff at scale even when sf0.01
results stay correct — so they fail loudly here instead.

Plans are read AFTER execution so AQE's final strategy (not the
static guess) is what's asserted.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.count()  # force execution so AQE settles (isFinalPlan=true)
    return df._jdf.queryExecution().executedPlan().toString()


def _q(spark, name):
    return entry.queries()[name](spark, SF)


# -- map-only stages must not shuffle ---------------------------------------

@pytest.mark.parametrize("name", [
    "parse", "docs_pii_scrub", "docs_gopher_quality", "docs_text_stats",
    "docs_fingerprint",
])
def test_map_only_no_exchange(spark, name):
    plan = _final_plan(_q(spark, name))
    assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:2000]}"


# -- dimension joins must broadcast ------------------------------------------

@pytest.mark.parametrize("name", [
    "enrich", "geoip_enrich", "enrich_between", "docs_decontam",
])
def test_dim_joins_broadcast(spark, name):
    plan = _final_plan(_q(spark, name))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, \
        f"{name} lost its broadcast join"
    assert "SortMergeJoin" not in plan, \
        f"{name} fell back to sort-merge for a broadcastable dim"


def test_ann_query_side_broadcast(spark):
    # the (small) query side must broadcast; the corpus side must not
    # sort-merge against it
    plan = _final_plan(_q(spark, "ann_topk"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# -- top-k must not globally sort --------------------------------------------

def test_tag_cardinality_take_ordered(spark):
    plan = _final_plan(_q(spark, "tag_cardinality"))
    assert "TakeOrderedAndProject" in plan, \
        "global top-k regressed to a full window sort"


# -- aggregates must combine map-side (partial before the shuffle) -----------

@pytest.mark.parametrize("name", ["aggregate_hourly", "route_counts"])
def test_partial_aggregation(spark, name):
    plan = _final_plan(_q(spark, name))
    assert plan.count("HashAggregate") >= 2, \
        f"{name} lost map-side partial aggregation"


# -- scans must prune columns -------------------------------------------------

def test_docs_scan_prunes_columns(spark):
    plan = _final_plan(_q(spark, "docs_gopher_quality"))
    scan = plan[plan.index("FileScan"):]
    head = scan[:scan.index("\n") if "\n" in scan else len(scan)]
    assert "lang" not in head and "source" not in head, \
        f"documents scan reads unused columns: {head}"


def test_parse_scan_prunes_columns(spark):
    # the parse projection uses a fixed column set; `tool` is unused
    # and must not reach the transcripts scan. Bypass the process-
    # level transcripts cache (an InMemoryRelation hides the file
    # scan and materializes every column by design).
    from vector_spark.functions import parse_transcripts
    from vector_spark.transcripts import load_transcripts

    df = parse_transcripts(
        load_transcripts(spark, SF, cache=False)
    ).select("conv_id", "turn_idx", "level", "latency_ms")
    plan = _final_plan(df)
    scan = plan[plan.index("FileScan"):]
    head = scan[:scan.index("\n") if "\n" in scan else len(scan)]
    assert "ReadSchema" in head
    assert "tool" not in head.split("ReadSchema")[1], \
        f"transcripts scan reads unused columns: {head}"


# -- single-tokenization invariant ------------------------------------------

@pytest.mark.parametrize("name", [
    "docs_gopher_quality", "docs_text_stats",
])
def test_tokenize_once_per_row(spark, name):
    """The token array must be PROJECTED once, not inlined per metric:
    an inlined split() re-evaluates per reference / per lambda element
    (O(len^2) tokenization — the CollapseProject trap that cost 4x on
    decontam). One split per projection chain is the invariant."""
    plan = _final_plan(_q(spark, name))
    # the physical plan prints one split(...) call per evaluation site
    assert plan.count("split(") <= 1, (
        f"{name} re-tokenizes per metric ({plan.count('split(')} split "
        f"sites):\n{plan[:2000]}"
    )
