"""Token-budget sequence packing for training-data pipelines.

Training consumes fixed-length sequences; a corpus is variable-length
documents.  Packing assigns each document to a ``pack_id`` so that
consecutive documents fill a token budget (e.g. one 8192-token context
per pack) — the batching stage between a curated corpus and a data
loader.  The reference has nothing like it (its surface stops at tuple
transforms); this is north-star surface for the LLM-pipeline family.

Scale shape: ONE exchange (hash partition by the group columns) + an
in-partition sort feeding a running-sum window — no global sort, no
driver loop.  The caller MUST include a bounded sharding column in
``group_cols`` (see ``sampling.shard_col``) so no window partition
holds a whole language/domain at 100 TB; a window partition is one
task's sort buffer, and "partition by lang" alone would put a third of
a web corpus in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_col: str,
    group_cols: list[str],
    out: str = "pack_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Greedy contiguous packing: within each ``group_cols`` partition,
    walk documents in ``order_col`` order and start a new pack each
    time the running token total crosses a multiple of ``budget``.

    Document d joins pack ``floor(pre_cum(d) / budget)`` where
    ``pre_cum`` is the token total of all earlier documents in its
    group — so a pack (except the last per group) never closes below
    budget, a pack minus its final document is always under budget,
    and the assignment is a pure function of (group, order, tokens):
    deterministic under retries and repartitioning, reproducible by
    any engine with a windowed sum.  Oversized single documents get a
    pack of their own (they cross several boundaries at once) rather
    than erroring — the downstream chunker's problem, by design.

    DETERMINISM PRECONDITION: ``order_col`` must be unique within each
    group (the callers use doc_id).  With duplicate order values the
    running sum's intra-tie order would be partition-arbitrary — the
    exact retry nondeterminism this module exists to prevent — so pass
    ``tiebreak_col`` (any unique column) when order_col alone can tie
    (r5 review catch; siblings sessionize/stratified_fixed_k carry
    explicit tiebreaks for the same reason)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty (include a shard column: an "
            "unpartitioned window is a single-task global sort at scale)"
        )
    if out in df.columns:
        # withColumn silently REPLACES a same-named column — out ==
        # token_col would even destroy the very counts being packed
        # (same reserved-scratch contract as salted_agg's _salt/_p_*)
        raise ValueError(
            f"output column {out!r} already exists on the input — "
            "rename it or pass a different `out`"
        )
    # token counts are REFUSED per-row when NULL or negative (loud
    # posture of sampling's _draw_key): a NULL count silently hands its
    # doc a NULL pack_id, and a negative count makes the running sum
    # dip — later documents join EARLIER packs and a "closed" pack can
    # reopen (the decile_table cumulative-dip class)
    tok_t = df.schema[token_col].dataType
    tok = F.when(
        F.col(token_col).isNull() | (F.col(token_col) < 0),
        F.raise_error(
            F.lit(
                f"null or negative {token_col}: packing needs a "
                "non-negative token count per document"
            )
        ).cast(tok_t),
    ).otherwise(F.col(token_col))
    order = [order_col] if tiebreak_col is None else [order_col, tiebreak_col]
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre_cum = F.sum(tok).over(w) - tok
    return df.withColumn(out, F.floor(pre_cum / F.lit(float(budget))).cast("long"))
