"""Scripted transform — the `lua` escape hatch, Python-native.

Reference (src/transforms/lua/v2/mod.rs): arbitrary Lua with
init/process/shutdown hooks, 0..N output events per input. The
rebuild keeps Python instead of Lua and runs it over Arrow batches
with mapInPandas — per-partition iterator of pandas DataFrames, so
user code is vectorizable and state can live across a partition's
batches (the init/shutdown hook analogue is the generator's
setup/teardown). This is explicitly the SLOW PATH: anything
expressible as Columns should be a remap assignment instead.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def scripted_transform(
    df: DataFrame,
    process: Callable[[pd.DataFrame], pd.DataFrame],
    schema: Any | None = None,
    init: Callable[[], dict] | None = None,
) -> DataFrame:
    """Run `process(batch_df) -> batch_df` over Arrow batches.

    `init()` runs once per partition and its dict is passed to
    `process(batch, state)` if the callable accepts two args — the
    lua v2 init-hook analogue. Output schema defaults to the input
    schema (pure mutation scripts); pass `schema` when the script
    adds/removes columns.
    """
    out_schema = schema if schema is not None else df.schema
    takes_state = init is not None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = init() if takes_state else None
        for pdf in batches:
            out = process(pdf, state) if takes_state else process(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(run, out_schema)
