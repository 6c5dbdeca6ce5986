"""Conversation-level operators over the transcript table.

The input shape is the BASELINE input_hint: (conv_id, turn_idx, role,
text, tool, ts). Everything here is per-conversation work — the natural
unit of a transcript corpus — expressed so the shuffle story stays
boring at 10^12 turns:

  * `conversation_stats` is one hash aggregation (map-side partials,
    bounded state per key: counters + a ≤|roles| collect_set);
  * `sft_pairs` / `sessionize` need per-conv ordered walks, which is ONE
    hash Exchange on conv_id feeding window functions — conversations
    are bounded (thousands of turns, not billions), so a conv always
    fits a task and skew salting is unnecessary by construction; the
    second window in `sessionize` reuses the first's
    ClusteredDistribution, so the plan carries a single Exchange.

No Python anywhere — all whole-stage-codegen column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _t_sec(ts_col: str) -> Column:
    # unix_seconds truncates; the DuckDB twin is epoch_ms(ts)//1000
    return F.unix_seconds(F.col(ts_col).cast("timestamp"))


def conversation_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation profile: turn counts by role, tool-call count,
    text volume, wall-clock span. One partial-aggregating groupBy — the
    same shape as the reference's aggregator counters
    (plugins/aggregator/baseagg/aggregator_base.go), lifted from
    per-logstore to per-conversation keys."""
    return df.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_calls"),
        F.size(F.collect_set("tool")).alias("n_distinct_tools"),
        F.sum(F.length("text")).alias("total_chars"),
        (F.max(_t_sec(ts_col)) - F.min(_t_sec(ts_col))).alias("duration_s"),
    )


def sft_pairs(
    df: DataFrame,
    context_turns: int = 3,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    target_role: str = "assistant",
    sep: str = "\n",
) -> DataFrame:
    """Context→response training-pair assembly: for every `target_role`
    turn, emit (context = the previous `context_turns` turns rendered as
    "role: text", response = the turn's text). This is the
    transcript-corpus analog of SFT example extraction.

    A bounded ROWS window keeps state O(context_turns) per row — never
    the whole conversation — so the operator is safe on arbitrarily long
    conversations. collect_list over an ORDER BY'd ROWS frame preserves
    frame order, making the concatenation deterministic (the stable
    turn ordering the north star requires).
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(-context_turns, -1)
    )
    rendered = F.concat_ws(": ", F.col("role"), F.col("text"))
    return (
        df.withColumn("context", F.concat_ws(sep, F.collect_list(rendered).over(w)))
        .filter(F.col("role") == target_role)
        .select(
            conv_col,
            order_col,
            "context",
            F.col("text").alias("response"),
        )
    )


def sessionize(
    df: DataFrame,
    gap_s: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    at the first turn and wherever the time since the previous turn
    exceeds `gap_s`. Returns one row per session with turn count and
    span — the batch twin of Structured Streaming's session_window.

    Both windows share partitionBy(conv)/orderBy(turn) so Catalyst
    plans ONE Exchange; the final per-session rollup is a partial
    aggregation on (conv, session_seq).
    """
    wl = Window.partitionBy(conv_col).orderBy(order_col)
    t = _t_sec(ts_col)
    new_sess = F.when(
        F.lag(t).over(wl).isNull() | ((t - F.lag(t).over(wl)) > gap_s), 1
    ).otherwise(0)
    sess = (
        df.withColumn("__new", new_sess)
        .withColumn(
            "session_seq",
            F.sum("__new").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sess.groupBy(conv_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(t).alias("start_s"),
        F.max(t).alias("end_s"),
    )


def response_latency(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    *,
    from_role: str = "user",
    to_role: str = "assistant",
) -> DataFrame:
    """Per-reply latency: for every `to_role` turn, seconds since the
    most recent `from_role` turn in the conversation (NULL when none
    precedes it). The assistant-response-time metric of transcript
    analytics — a conditional last-non-null walk over the SAME ordered
    window the other conversation ops use, so composing them adds no
    new shuffle."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = _t_sec(ts_col)
    last_from = F.last(
        F.when(F.col("role") == from_role, t), ignorenulls=True
    ).over(w)
    return (
        df.withColumn("latency_s", t - last_from)
        .filter(F.col("role") == to_role)
        .filter(F.col("latency_s").isNotNull())
        .select(conv_col, order_col, "latency_s")
    )


def funnel(
    df: DataFrame,
    steps: list[Column],
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    *,
    step_names: list[str] | None = None,
) -> DataFrame:
    """Ordered funnel analysis: per conversation, how deep into the
    `steps` sequence the turns progress IN ORDER (classic product-
    analytics funnel — step k+1 only counts when it happens strictly
    after the turn that satisfied step k). Emits the matched position
    of each step (NULL once the funnel stalls), `funnel_depth`, and
    `converted` (all steps hit).

    Semantics are the earliest-match chain: p1 = first turn matching
    step 1, p2 = first turn AFTER p1 matching step 2, and so on —
    greedy earliest matching is optimal for subsequence containment,
    so `converted` is exact, not a heuristic.

    Shape at 10^12 turns: step predicates evaluate per-row in the scan
    (booleans, not text, reach the shuffle), then ONE conv-keyed
    aggregation collects the bounded per-conv (pos, flags) array and
    the min-position chain runs as array expressions — no joins, no
    iteration, one Exchange. Conversations are bounded, so the
    collected array is too (the sft_pairs argument)."""
    names = step_names or [f"step{i + 1}" for i in range(len(steps))]
    flags = [c.alias(f"__m{i}") for i, c in enumerate(steps)]
    arr = (
        df.select(conv_col, F.col(order_col).alias("__pos"), *flags)
        .groupBy(conv_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("__pos", *[f"__m{i}" for i in range(len(steps))])
                )
            ).alias("__arr")
        )
    )
    out = arr
    prev: Column | None = None
    pos_cols = []
    for i, name in enumerate(names):
        lo = F.lit(-1) if prev is None else prev
        # build the filter against a CAPTURED lower bound column
        def _match(lo_col, idx):
            return lambda x: x[f"__m{idx}"] & (x["__pos"] > lo_col)

        pcol = F.array_min(
            F.transform(
                F.filter(F.col("__arr"), _match(lo, i)),
                lambda x: x["__pos"],
            )
        )
        out = out.withColumn(f"{name}_pos", pcol)
        prev = F.col(f"{name}_pos")
        pos_cols.append(f"{name}_pos")
    depth = F.lit(0)
    for i, name in enumerate(names):
        depth = F.when(F.col(f"{name}_pos").isNotNull(), F.lit(i + 1)).otherwise(
            depth
        )
    # depth counts the LONGEST prefix of non-null positions; once a
    # step's position is NULL every later one is too (lower bound NULL
    # disables the filter match), so the when-chain ordering is safe
    return out.select(
        conv_col,
        *pos_cols,
        depth.alias("funnel_depth"),
        F.col(f"{names[-1]}_pos").isNotNull().alias("converted"),
    )


def latency_percentiles(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    *,
    from_role: str = "user",
    to_role: str = "assistant",
    window_s: int = 3600,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Reply-latency percentiles per tumbling event-time window — the
    p50/p95/p99-per-hour dashboard query of transcript operations.
    Latency is `response_latency`'s conditional last-non-null walk;
    the window bucket is floor(ts / window_s) · window_s.

    Quantiles use `approx_percentile` (Greenwald–Khanna): map-side-
    combinable, O(accuracy · log n) memory per task — the scale-safe
    default tier (the exact `percentile` buffers each window's full
    value vector on one reducer, the hazard `length_quantiles` r6
    documented). With accuracy ≥ the window's reply count the GK
    summary keeps every sample and answers the exact DISCRETE
    quantile, which is what makes the small-scale oracle
    (`quantile_disc`) exact rather than tolerance-based."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = _t_sec(ts_col)
    last_from = F.last(
        F.when(F.col("role") == from_role, t), ignorenulls=True
    ).over(w)
    d = (
        df.select(
            (F.floor(t / window_s).cast("long") * window_s).alias(
                "window_start"
            ),
            F.col("role"),
            (t - last_from).alias("__lat"),
        )
        .filter((F.col("role") == to_role) & F.col("__lat").isNotNull())
    )
    aggs = [
        F.round(
            F.percentile_approx(F.col("__lat"), F.lit(q), F.lit(accuracy))
            .cast("double"),
            6,
        ).alias(f"p{int(q * 100)}")
        for q in qs
    ]
    return d.groupBy("window_start").agg(
        *aggs, F.count(F.lit(1)).alias("n_replies")
    )


def retention(
    df: DataFrame,
    user_col: str = "conv_id",
    ts_col: str = "ts",
    *,
    window_s: int = 3600,
) -> DataFrame:
    """Cohort retention per tumbling event-time window: of the users
    active in window w, how many are also active in w+1 (the
    DAU-retention query, at whatever granularity `window_s` sets).

    Shape at 10^12 turns: raw turns collapse to distinct
    (user, bucket) pairs in a map-side-combinable aggregate FIRST —
    activity, not traffic, reaches the user-keyed window — then one
    lead() per user-ordered bucket list marks retained windows and a
    final bucket-keyed partial agg counts them. User cardinality is
    high, so both shuffles spread; nothing is ever all-users-on-one-
    task shaped."""
    t = _t_sec(ts_col)
    bucket = (F.floor(t / window_s).cast("long") * window_s).alias("bucket")
    act = df.select(F.col(user_col).alias("u"), bucket).distinct()
    w = Window.partitionBy("u").orderBy("bucket")
    per = act.withColumn(
        "retained",
        (F.lead("bucket").over(w) == F.col("bucket") + window_s).cast("int"),
    )
    return per.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.coalesce(F.col("retained"), F.lit(0))).alias("n_retained"),
    )


def tool_stats(
    df: DataFrame,
    tool_col: str = "tool",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-tool usage profile: call volume, conversation coverage,
    error-output rate, mean output size, and mean seconds until the
    next turn (how long the conversation 'waits' after a tool call).
    The wait metric rides the SAME conv-ordered window every other
    conversation op uses; everything else is one map-side-combinable
    aggregate keyed by the (small) tool vocabulary. Sums are exact
    integers; the two means divide once and round to the 4-dec grid, so
    the whole profile is oracle-exact."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    t = _t_sec(ts_col)
    gap = F.lead(t).over(w) - t
    calls = df.withColumn("__gap", gap).filter(F.col(tool_col).isNotNull())
    return calls.groupBy(tool_col).agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.countDistinct(conv_col).alias("n_convs"),
        F.sum(
            F.when(F.col(text_col).contains("ERROR"), 1).otherwise(0)
        ).alias("n_error_outputs"),
        F.round(F.sum(F.length(text_col)) / F.count(F.lit(1)), 4).alias(
            "mean_output_chars"
        ),
        F.round(F.sum("__gap") / F.count("__gap"), 4).alias("mean_wait_s"),
    )


def role_transitions(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Turn-taking transition matrix: corpus-wide counts of consecutive
    (prev_role → role) pairs within conversations — who speaks after
    whom, the structural fingerprint of a transcript corpus (and the
    quickest detector of malformed conversations: user→user runs,
    assistant openings). One lag over the shared conv window + one
    map-side-combinable count keyed by the |roles|² pair space."""
    w = Window.partitionBy(conv_col).orderBy(order_col)
    prev = F.lag(role_col).over(w)
    return (
        df.select(prev.alias("prev_role"), F.col(role_col).alias("role"))
        .filter(F.col("prev_role").isNotNull())
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
