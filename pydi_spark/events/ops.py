"""Behavioral / event-stream analytics over (user, timestamp, type)
logs: sessionization, funnels, retention cohorts, and path n-grams.

Reference scope: PyDI has no event analytics — these are north-star
additions for the product-analytics half of the engine (the streaming
module holds their incremental twins: streaming/dedup.py sessionize).

Determinism contract: every per-user order is the TOTAL order
(ts, order_col) — equal timestamps cannot reorder across partitions;
all gap/duration arithmetic runs on exact micros integers
(``unix_micros``, never float seconds); week math is day-difference
div 7 between Monday truncations (``datediff('week')`` boundary
semantics are not portable across engines — NOTES.md).

Scale: sessionization and path n-grams are ONE exchange by user (all
windows share the (user[, session]) partitioning); funnels are
per-stage min-ts aggregates and narrow user-keyed joins — no window
over the raw stream; retention is two aggregates and a user join.
Skew concentrates in bot-grade hot users — cap upstream with
key_skew_report + a per-user event limit if a corpus needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Input + ``session_id``: per-user 0/1-flag running sum, new
    session when the gap to the previous event exceeds ``gap_minutes``
    (exact micros comparison). First event per user opens session 1."""
    if gap_minutes <= 0:
        raise ValueError(f"gap_minutes must be > 0: {gap_minutes}")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    gap_lim = F.lit(int(gap_minutes) * 60_000_000)
    flagged = df.withColumn(
        "__new_s",
        F.when(gap_us.isNull() | (gap_us > gap_lim), 1).otherwise(0),
    )
    sid = (
        F.sum("__new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
    )
    return flagged.withColumn("session_id", sid).drop("__new_s")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """[user, session_id, n_events, duration_us] per session."""
    sess = assign_sessions(df, user_col, ts_col, order_col, gap_minutes)
    return sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("duration_us"),
    )


def session_entry_exit(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
) -> DataFrame:
    """[user, session_id, n_events, duration_us, entry_type, exit_type,
    is_bounce] — the per-session landing/exit report next to
    session_stats: entry/exit = the event type at the session's first/
    last event under the (ts, order_col) TOTAL order (min_by/max_by on
    the composite struct — deterministic despite their first-found tie
    rule, the tpch_q2 trick), is_bounce = 1 for single-event sessions
    (int, not boolean — hash-safe output convention).

    Scale: one exchange by user (shared with assign_sessions' window),
    then a map-side-combinable aggregate per (user, session)."""
    sess = assign_sessions(df, user_col, ts_col, order_col, gap_minutes)
    key = F.struct(
        F.unix_micros(F.col(ts_col)).alias("t"),
        F.col(order_col).alias("o"),
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
        ).alias("duration_us"),
        F.min_by(type_col, key).alias("entry_type"),
        F.max_by(type_col, key).alias("exit_type"),
        (F.count(F.lit(1)) == 1).cast("int").alias("is_bounce"),
    )


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    within_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[stage, n_users] — how many users' deepest funnel stage is each
    1-based stage index: a user reaches stage i+1 with an event of
    type ``stages[i+1]`` strictly after their stage-i time and within
    ``within_hours`` of it (classic strict-sequence funnel; stage time
    = FIRST qualifying event). Users who never emit ``stages[0]`` are
    outside the funnel."""
    if len(stages) < 2:
        raise ValueError("need at least two funnel stages")
    if within_hours <= 0:
        raise ValueError(f"within_hours must be > 0: {within_hours}")
    base = df.select(user_col, type_col, ts_col)
    # each stage frame feeds TWO consumers (the next stage's time gate
    # and the final left-join chain); materialized so stage i's
    # aggregate — whose lineage contains every earlier stage — runs
    # once, and the event stream is scanned exactly once per stage
    # instead of once per (stage, consumer) pair (r12; the frames are
    # per-user aggregates, the node-frame class the CC/minhash
    # checkpoint discipline already covers)
    prev = (
        base.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
        .localCheckpoint(eager=True)
    )
    frames = [prev]
    for i, st in enumerate(stages[1:], start=1):
        t_prev = f"t_{i - 1}"
        prev = (
            base.where(F.col(type_col) == st)
            .join(frames[-1].select(user_col, t_prev), user_col)
            .where(
                (F.col(ts_col) > F.col(t_prev))
                & (
                    F.col(ts_col)
                    <= F.col(t_prev)
                    + F.expr(f"INTERVAL {int(within_hours)} HOURS")
                )
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        if i < len(stages) - 1:
            # the LAST stage has a single consumer (the join chain)
            prev = prev.localCheckpoint(eager=True)
        frames.append(prev)
    staged = frames[0]
    for i, f in enumerate(frames[1:], start=1):
        staged = staged.join(
            f.select(user_col, f"t_{i}"), user_col, "left"
        )
    stage = F.lit(1)
    expr = None
    for i in range(len(stages) - 1, 0, -1):
        cond = F.col(f"t_{i}").isNotNull()
        expr = (
            F.when(cond, F.lit(i + 1))
            if expr is None
            else expr.when(cond, F.lit(i + 1))
        )
    staged = staged.select(expr.otherwise(stage).alias("stage"))
    return staged.groupBy("stage").agg(F.count("*").alias("n_users"))


def _cohort_frame(
    df: DataFrame,
    signup_type: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    extra_cols: list | None = None,
) -> DataFrame:
    """[user, cw, wk_off, *extra_cols] — the shared cohort derivation
    under the module's week-math contract (Monday truncation,
    day-difference div 7): first ``signup_type`` event fixes each
    user's cohort week; every event at-or-after it gets its whole-week
    offset. retention_cohorts and cohort_value both build on this so
    the contract lives in exactly one place."""
    base = df.select(user_col, type_col, ts_col, *(extra_cols or []))
    su = (
        base.where(F.col(type_col) == signup_type)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cw"))
    )
    return (
        base.join(su, user_col)
        .where(F.col(ts_col) >= F.col("cw"))
        .select(
            user_col,
            "cw",
            F.expr(f"datediff(date_trunc('week', {ts_col}), cw) div 7")
            .cast("int")
            .alias("wk_off"),
            *(extra_cols or []),
        )
    )


def retention_cohorts(
    df: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[cohort_week, wk_off, n_users] — weekly retention: users grouped
    by Monday-truncated week of their first ``signup_type`` event;
    distinct active users per whole-week offset from it."""
    act = _cohort_frame(df, signup_type, user_col, type_col, ts_col).distinct()
    return act.groupBy(
        F.col("cw").cast("date").cast("string").alias("cohort_week"),
        "wk_off",
    ).agg(F.count("*").alias("n_users"))


def cohort_value(
    df: DataFrame,
    signup_type: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[cohort_week, wk_off, n_users, value_micro] — revenue-weighted
    retention: retention_cohorts' user counts PLUS the exact
    micro-integer sum of ``value_col`` each cohort generates per
    whole-week offset (LTV curves read straight off this table;
    NULL values count as 0). Values quantize to micro-units BEFORE
    aggregation (floor(value * 1e6)) so the sum is an exact integer —
    the resample_timeseries convention.

    Scale: the signup aggregate + one user-keyed join, then a
    map-side-combinable (cohort, offset) aggregate — the event stream
    is touched once and never windowed.
    """
    joined = _cohort_frame(
        df, signup_type, user_col, type_col, ts_col, [value_col]
    ).withColumn(
        "__vm",
        F.expr(f"CAST(floor(coalesce({value_col}, 0) * 1000000) AS BIGINT)"),
    )
    return joined.groupBy(
        F.col("cw").cast("date").cast("string").alias("cohort_week"),
        "wk_off",
    ).agg(
        F.countDistinct(user_col).alias("n_users"),
        F.sum("__vm").alias("value_micro"),
    )


def event_path_ngrams(
    df: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    event_col: str = "event_type",
    gap_minutes: int = 30,
    sep: str = ">",
) -> DataFrame:
    """[path, cnt, n_users] — every length-``n`` consecutive event-type
    sequence WITHIN a session (sessions never bridge the gap split),
    with occurrence count and distinct-user reach. The product-analytics
    "common paths" table; output is bounded by |event types|^n, not by
    rows.

    Rows with a NULL ``event_col`` are dropped BEFORE sessionization
    (a typeless event is noise, not a path step — and concat_ws would
    otherwise silently splice its neighbours into a fake path).

    Lead windows share the sessionization's (user) exchange — the path
    pass adds per-partition sorting only."""
    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")
    sess = assign_sessions(
        df.where(F.col(event_col).isNotNull()),
        user_col, ts_col, order_col, gap_minutes,
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(ts_col, order_col)
    steps = [F.col(event_col)] + [
        F.lead(event_col, i).over(w) for i in range(1, n)
    ]
    led = sess.select(
        user_col, *[s.alias(f"__e{i}") for i, s in enumerate(steps)]
    ).where(F.col(f"__e{n - 1}").isNotNull())
    return led.groupBy(
        F.concat_ws(sep, *[f"__e{i}" for i in range(n)]).alias("path")
    ).agg(
        F.count("*").alias("cnt"),
        F.countDistinct(user_col).alias("n_users"),
    )


def resample_timeseries(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = None,
    interval_minutes: int = 60,
    value_col: str | None = None,
    fill: bool = True,
) -> DataFrame:
    """[key?, bucket_start_us, n_events, value_micro?] — fixed-interval
    downsampling with gap filling: events bucket by exact integer
    division of micros, and (with ``fill``) every key emits EVERY
    bucket between its first and last event — empty buckets appear
    with n_events=0 (the row downstream charting/anomaly logic needs
    and a bare groupBy silently omits).

    Determinism: bucket = ``unix_micros div interval_us`` (exact);
    ``value_col`` sums as floor(value*1e6) micro bigints — floor of an
    identical IEEE product is engine-portable where a raw double sum
    is not. Empty buckets carry value_micro 0 (an empty SUM of micros).

    Scale: one groupBy on (key, bucket); the fill explodes
    ``sequence(min_bucket, max_bucket)`` PER KEY — bounded by each
    key's active time range over the interval, never by global span
    times key count. A key idle for years at 1-minute intervals is the
    blow-up case: pick the interval for the retention window you chart.
    """
    if interval_minutes <= 0:
        raise ValueError(f"interval_minutes must be > 0: {interval_minutes}")
    interval_us = int(interval_minutes) * 60_000_000
    keys = [key_col] if key_col else []
    bucket = F.expr(f"unix_micros({ts_col}) div {interval_us}")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        # coalesce at agg time: a non-empty bucket whose values are
        # ALL null must report 0 on the fill and no-fill paths alike
        aggs.append(
            F.coalesce(
                F.sum(
                    F.floor(F.col(value_col).cast("double") * 1_000_000)
                    .cast("long")
                ),
                F.lit(0).cast("long"),
            ).alias("value_micro")
        )
    agg = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*keys, bucket.alias("__b"))
        .agg(*aggs)
    )
    if fill:
        span = agg.groupBy(*keys).agg(
            F.min("__b").alias("__b0"), F.max("__b").alias("__b1")
        )
        grid = span.select(
            *keys,
            F.explode(F.expr("sequence(__b0, __b1)")).alias("__b"),
        )
        # eqNullSafe on the key: groupBy makes NULL a real group, and a
        # plain equi-join would orphan that group's grid rows, silently
        # zero-filling over its actual aggregates (ADVICE r6).
        g, a = grid.alias("__g"), agg.alias("__a")
        cond = F.col("__g.__b") == F.col("__a.__b")
        for k in keys:
            cond = cond & F.col(f"__g.`{k}`").eqNullSafe(F.col(f"__a.`{k}`"))
        agg = g.join(a, cond, "left").select(
            *[F.col(f"__g.`{k}`").alias(k) for k in keys],
            F.col("__g.__b").alias("__b"),
            F.coalesce(F.col("__a.n_events"), F.lit(0)).alias("n_events"),
            *(
                [
                    F.coalesce(
                        F.col("__a.value_micro"), F.lit(0)
                    ).alias("value_micro")
                ]
                if value_col
                else []
            ),
        )
    return agg.select(
        *keys,
        (F.col("__b") * F.lit(interval_us)).alias("bucket_start_us"),
        "n_events",
        *(["value_micro"] if value_col else []),
    )


def attribute_conversions(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    model: str = "linear",
    lookback_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch attribution: [user, touch_id, conversion_id,
    credit_ppm] — each conversion event distributes exactly 1,000,000
    ppm of credit over the user's touch events in the lookback window
    (touch.ts <= conv.ts, touch.ts > conv.ts - lookback).

    Models: ``first`` / ``last`` give full credit to the earliest /
    latest eligible touch; ``linear`` splits evenly in EXACT integer
    arithmetic — every touch gets ``1e6 div n`` and the first
    ``1e6 mod n`` touches (by ``(ts, id)`` total order) get one extra
    ppm, so credit always sums to exactly 1,000,000 per conversion
    (floats would drift and a ppm remainder must land
    deterministically).

    Scale: the touch-conversion pairing is a per-user interval join —
    an equi-join on ``user_col`` with the window predicate as a
    post-filter, so it shuffles once on user and volume is bounded by
    per-user touches x conversions inside the window, never global
    row products. Bot-grade hot users are the skew case (same story
    as sessionize) — cap per-user events upstream if a corpus needs
    it. Conversions with ZERO eligible touches emit one row with NULL
    touch_id and the full 1e6 credit (unattributed bucket), so credit
    conservation holds corpus-wide.

    No reference counterpart (PyDI has no event analytics) —
    north-star addition; the product-analytics twin of funnel_stages.
    """
    if model not in ("first", "last", "linear"):
        raise ValueError(f"model must be first|last|linear: {model}")
    if lookback_hours <= 0:
        raise ValueError(f"lookback_hours must be > 0: {lookback_hours}")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    # NULL-id / NULL-ts rows are dropped up front: a touch without an
    # id cannot receive credit (and would desync __rk/__n from the
    # count of creditable rows, breaking the exact-1e6 conservation);
    # an id-less or time-less conversion cannot be keyed/windowed
    conv = df.where(
        (F.col(type_col) == conversion_type)
        & F.col(id_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("__cts"),
    )
    touch = df.where(
        F.col(type_col).isin(list(touch_types))
        & F.col(id_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__tu"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("__tts"),
    )
    lb = F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    # the window predicate must be part of the JOIN condition: as a
    # post-filter, a conversion whose touches are all out-of-window
    # would lose every row instead of emitting its unattributed row
    cond = (
        (F.col("__u") == F.col("__tu"))
        & (F.col("__tts") <= F.col("__cts"))
        & (F.col("__tts") > F.col("__cts") - lb)
    )
    pairs = conv.join(touch, cond, "left").drop("__tu")
    w = Window.partitionBy("__u", "conversion_id").orderBy(
        F.col("__tts").asc(), F.col("touch_id").asc()
    )
    ranked = pairs.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__n",
        F.count("touch_id").over(
            Window.partitionBy("__u", "conversion_id")
        ),
    )
    if model == "linear":
        credit = F.when(F.col("__n") == 0, F.lit(1_000_000)).otherwise(
            F.expr("1000000 div __n")
            + F.when(
                F.col("__rk") <= F.lit(1_000_000) % F.col("__n"), 1
            ).otherwise(0)
        )
        keep = F.lit(True)
    elif model == "first":
        credit = F.lit(1_000_000)
        keep = (F.col("__rk") == 1) | (F.col("__n") == 0)
    else:  # last
        credit = F.lit(1_000_000)
        keep = (F.col("__rk") == F.col("__n")) | (F.col("__n") == 0)
    # a left join puts exactly one NULL-touch row per unmatched
    # conversion; matched conversions never carry a NULL touch row
    return (
        ranked.where(keep)
        .select(
            F.col("__u").alias(user_col),
            "touch_id",
            "conversion_id",
            credit.cast("long").alias("credit_ppm"),
        )
    )


def active_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """[day, n_active] — EXACT rolling distinct active users: for every
    calendar day in the corpus span, the number of distinct users with
    >= 1 event in the trailing ``window_days`` window (day - w, day].
    window_days=1 is DAU, 7 WAU, 30 MAU. Days with zero active users
    still appear (n_active = 0) so the series is chartable.

    Determinism/portability: days are exact integer epoch-days
    (``unix_micros div 86400e6`` of the UTC timestamp — micros are
    never fractional); no floats anywhere.

    Scale: the classic exact algorithm — dedup to the (user, day)
    grain first (one shuffle, output bounded by users x active days),
    then fan each user-day out to the <= ``window_days`` report days
    it supports and count distinct per day. Cost is
    |user-days| x window_days rows, NOT events x window — and never a
    90-day self-join of the raw stream. For very large windows over
    huge user bases, swap the distinct count for the HLL sketch
    (approx_distinct in sketches.py); this exact form is the oracle-
    checkable baseline. No reference counterpart — north-star
    product-analytics addition.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    user_days = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__d"))
        .distinct()
    )
    span = user_days.agg(
        F.min("__d").alias("__d0"), F.max("__d").alias("__d1")
    )
    # each (user, active day) supports report days d .. d+w-1, clamped
    # to the corpus span (no phantom days past the last event)
    fanned = user_days.crossJoin(F.broadcast(span)).select(
        "__u",
        F.explode(
            F.expr(
                f"sequence(__d, least(__d + {int(window_days)} - 1, __d1))"
            )
        ).alias("day"),
    )
    counts = fanned.groupBy("day").agg(
        F.countDistinct("__u").alias("n_active")
    )
    grid = span.select(
        F.explode(F.expr("sequence(__d0, __d1)")).alias("day")
    )
    return grid.join(counts, "day", "left").select(
        "day", F.coalesce("n_active", F.lit(0)).alias("n_active")
    )


def rfm_segments(
    df: DataFrame,
    as_of=None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[user_id, recency_days, frequency, monetary_micro, r_score,
    f_score, m_score, segment] — classic RFM user segmentation:
    recency (days since last event, vs ``as_of`` or the corpus max
    timestamp), frequency (event count), monetary (exact micro-integer
    value sum, the cohort_value quantization), each scored into
    quartiles 1-4 (4 = best: most recent / most frequent / highest
    value), plus a fixed five-way segment label
    (champion/loyal/recent/at_risk/dormant CASE cascade on the
    scores).

    Determinism contract: quartiles come from the global rank under
    the TOTAL order (metric, user_id) — ``score = ((rn-1)*4) div n +
    1`` — NOT from ntile() (whose tie placement across partition
    boundaries is engine-specific); recency inverts the ascending
    rank (5 - tile) so DESC ordering never enters. Monetary quantizes
    to micros BEFORE summing. Rows with a NULL user id or NULL
    timestamp are excluded up front (NULL rank keys sort NULLS FIRST
    in Spark, NULLS LAST in most SQL engines — they may not enter the
    order).

    Scale: the raw stream collapses to one row per user in a single
    map-side-combinable aggregate; the three quartile ranks run on
    that compact frame via the distributed global rank
    (functions/ranks.py — range-partition + broadcast offsets; a bare
    Window.orderBy would funnel every user through one task). When
    ``as_of`` is None the corpus max arrives as a one-row broadcast.

    No reference counterpart — north-star product-analytics addition.
    """
    from pydi_spark.functions.ranks import global_row_number

    # NULL user ids and NULL timestamps leave before anything: a NULL
    # recency key would sort NULLS FIRST in Spark and NULLS LAST in
    # most SQL engines, shifting EVERY user's quartile rank by one —
    # the cross-engine divergence class the total-order rule exists
    # to prevent
    df = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    per_user = df.groupBy(F.col(user_col).alias("user_id")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(
            F.expr(
                f"CAST(floor(coalesce({value_col}, 0) * 1000000) AS BIGINT)"
            )
        ).alias("monetary_micro"),
    )
    if as_of is None:
        mx = df.agg(F.max(ts_col).alias("__as_of"))
        per_user = per_user.crossJoin(F.broadcast(mx))
    else:
        per_user = per_user.withColumn(
            "__as_of", F.lit(as_of).cast("timestamp")
        )
    per_user = per_user.withColumn(
        "recency_days",
        F.datediff(F.col("__as_of"), F.col("__last")).cast("long"),
    ).drop("__as_of", "__last")

    # r12 materialized per_user here ("the raw-stream aggregate re-runs
    # ~6 times across the rank chain"); r13 REVERTED it on two paired
    # A/Bs (3.19 vs 2.88 s and 3.63 vs 3.07 s, checkpoint vs none, same
    # windows — VERDICT r12 #2 flagged the original win as sub-noise).
    # The re-executions are real but each is a cheap partial-agg scan;
    # the eager checkpoint write of the per-user frame costs more at
    # bench scale. At 100 TB the per-user frame is still node-sized —
    # callers that need it can persist upstream.
    ranked, n = global_row_number(
        per_user, ["recency_days", "user_id"], "__rn_r", return_count=True
    )
    ranked = global_row_number(ranked, ["frequency", "user_id"], "__rn_f")
    ranked = global_row_number(
        ranked, ["monetary_micro", "user_id"], "__rn_m"
    )
    tile = "(({rn} - 1) * 4) div {n} + 1"
    scored = ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_micro",
        F.expr("5 - (" + tile.format(rn="__rn_r", n=n) + ")")
        .cast("long").alias("r_score"),
        F.expr(tile.format(rn="__rn_f", n=n)).cast("long").alias("f_score"),
        F.expr(tile.format(rn="__rn_m", n=n)).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.expr(
            "CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 "
            "THEN 'champion' "
            "WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal' "
            "WHEN r_score >= 3 THEN 'recent' "
            "WHEN f_score >= 3 THEN 'at_risk' "
            "ELSE 'dormant' END"
        ),
    )


def event_cooccurrence(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    min_pairs: int = 1,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """[item1, item2, n_pair, n_i, n_j, support_ppm, lift_micro] —
    market-basket co-occurrence over (basket = the ``group_cols``
    tuple, item = ``item_col``): for every unordered item pair, the
    number of baskets containing BOTH, each item's own basket count,
    exact integer support (``n_pair*1e6 div n_baskets``) and lift
    (``n_pair*n_baskets*1e6 div (n_i*n_j)`` — > 1e6 means the pair
    co-occurs more than independence predicts). The association signal
    behind next-action suggestions and feature co-occurrence audits.

    Determinism/portability: presence is DISTINCT (duplicate events in
    a basket count once); lift is ONE division of non-negative
    decimal(38,0) products (truncation == floor on both engines — the
    changepoint_report rule).

    Scale: baskets self-join on the basket key, so a single hot basket
    with B items emits C(B,2) pairs — ``max_items_per_group`` drops
    baskets above the cap BEFORE the join (the TokenBlocker hot-key
    rule; a basket holding half the catalogue carries no association
    signal). n_baskets arrives as a one-row broadcast; item counts are
    two narrow item-keyed joins onto the pair table.

    No reference counterpart — north-star product-analytics addition.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if min_pairs < 1:
        raise ValueError(f"min_pairs must be >= 1: {min_pairs}")
    baskets = (
        df.where(F.col(item_col).isNotNull())
        .select(*group_cols, F.col(item_col).alias("__item"))
        .distinct()
    )
    if max_items_per_group is not None:
        ok = (
            baskets.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") <= F.lit(int(max_items_per_group)))
            .select(*group_cols)
        )
        baskets = baskets.join(ok, group_cols, "left_semi")
    baskets = baskets.localCheckpoint(eager=True)
    ng = baskets.select(*group_cols).distinct().agg(
        F.count(F.lit(1)).alias("__ng")
    )
    items = baskets.groupBy("__item").agg(
        F.count(F.lit(1)).cast("long").alias("__n_items")
    )
    l = baskets.select(*group_cols, F.col("__item").alias("item1"))
    r = baskets.select(*group_cols, F.col("__item").alias("item2"))
    pairs = (
        l.join(r, group_cols)
        .where(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= F.lit(int(min_pairs)))
    )
    out = (
        pairs.join(
            items.select(F.col("__item").alias("item1"),
                         F.col("__n_items").alias("n_i")), "item1")
        .join(
            items.select(F.col("__item").alias("item2"),
                         F.col("__n_items").alias("n_j")), "item2")
        .crossJoin(F.broadcast(ng))
    )
    return out.select(
        "item1", "item2", "n_pair", "n_i", "n_j",
        F.expr("n_pair * 1000000 div __ng").cast("long")
        .alias("support_ppm"),
        F.expr(
            "CAST(CAST(n_pair AS DECIMAL(38,0)) * __ng * 1000000"
            " div (CAST(n_i AS DECIMAL(38,0)) * n_j) AS BIGINT)"
        ).alias("lift_micro"),
    )


def experiment_report(
    df: DataFrame,
    variant_col: str,
    conversion_type: str,
    control: str = "control",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """[variant, n_users, n_converted, conv_ppm, uplift_ppm,
    n_multi_variant_users] — A/B experiment readout: per variant the
    exact user and converter counts, the conversion rate in integer
    ppm, and the signed uplift vs the ``control`` variant (control row
    reads 0; if the control variant is absent every uplift is NULL —
    totality over significance: the exact counts table IS the
    deliverable, feed it to whatever test the analyst trusts; z/p
    values stay deliberately out, the PSI/chi2 drift rule).

    Assignment hygiene is folded into the metric pass (the bcubed
    lesson): a user seen under MORE THAN ONE variant is excluded from
    every rate and counted once in ``n_multi_variant_users`` (repeated
    on each row — an audit column, not a sentinel row). A user's
    variant is the min over their events (single-variant users are
    unaffected); NULL-variant events are ignored.

    Scale: one map-side-combinable per-user aggregate (the stream is
    touched once), one per-variant aggregate of the compact user
    frame, and two one-row broadcasts (control rate, contamination
    count).

    No reference counterpart — north-star product-analytics addition.
    """
    per_user = (
        df.where(F.col(variant_col).isNotNull())
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.countDistinct(F.col(variant_col)).alias("__nv"),
            F.min(F.col(variant_col)).alias("variant"),
            F.max(
                (F.col(type_col) == F.lit(conversion_type)).cast("int")
            ).alias("__conv"),
        )
    )
    clean = per_user.where(F.col("__nv") == 1)
    contam = per_user.agg(
        F.sum((F.col("__nv") > 1).cast("long")).alias("__n_multi")
    )
    per_variant = clean.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("__conv").cast("long").alias("n_converted"),
    ).withColumn(
        "conv_ppm",
        F.expr("n_converted * 1000000 div n_users").cast("long"),
    )
    ctrl = per_variant.agg(
        F.max(
            F.when(F.col("variant") == F.lit(control), F.col("conv_ppm"))
        ).alias("__ctrl_ppm")
    )
    return (
        per_variant.crossJoin(F.broadcast(ctrl))
        .crossJoin(F.broadcast(contam))
        .select(
            "variant", "n_users", "n_converted", "conv_ppm",
            (F.col("conv_ppm") - F.col("__ctrl_ppm")).cast("long")
            .alias("uplift_ppm"),
            F.coalesce("__n_multi", F.lit(0)).cast("long")
            .alias("n_multi_variant_users"),
        )
    )


def new_users_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """[day, n_new, n_cumulative] — audience growth: per calendar day
    (exact integer epoch-days, the active_users convention) the number
    of users seen for the FIRST time and the running total of distinct
    users ever seen. Days without new users still appear (n_new = 0)
    so the curve is chartable; together with active_users this splits
    traffic into new vs returning exactly.

    Scale: first-seen collapses the stream to one row per user (one
    map-side-combinable aggregate); the day rollup is tiny; the
    cumulative total runs through the distributed running sum
    (functions/ranks.py global_running_sum — never a single-partition
    window over the day grid).
    """
    day = F.expr(f"unix_micros({ts_col}) div 86400000000")
    first = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__d"))
        .groupBy("__u")
        .agg(F.min("__d").alias("__d"))
    )
    daily = first.groupBy("__d").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    span = daily.agg(F.min("__d").alias("__d0"), F.max("__d").alias("__d1"))
    grid = span.select(
        F.explode(F.expr("sequence(__d0, __d1)")).alias("day")
    )
    filled = grid.join(
        daily.withColumnRenamed("__d", "day"), "day", "left"
    ).select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"))
    from pydi_spark.functions.ranks import global_running_sum

    return global_running_sum(filled, ["day"], "n_new", "n_cumulative")


def bot_report(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_events: int = 20,
    max_median_gap_ms: int = 2000,
) -> DataFrame:
    """[user_id, n_events, median_gap_ms, is_bot] — automation /
    scripted-traffic detection per user: the EXACT median inter-event
    gap in milliseconds for every user with >= 2 events, flagged
    ``is_bot = 1`` when the user has at least ``min_events`` events
    AND a median gap at or under ``max_median_gap_ms`` (sub-human
    cadence sustained over a real event volume — one fast burst alone
    does not flag). The training-data hygiene gate before any
    events-derived corpus: bot sessions poison funnels, retention,
    RFM and co-occurrence alike.

    Exact-arithmetic contract: gaps are integer milliseconds
    (unix_millis diffs — non-negative after the per-user time order);
    the median of an even count is floor((lo + hi) / 2) — one
    non-negative integer division, truncate == floor on both engines.
    Which tied row sits at the middle RANK is arbitrary, but the
    VALUES at the middle ranks of the sorted gap multiset are not, so
    the median is tie-order-free. ``is_bot`` is an integer 0/1 (the
    hash-safe flag convention, never boolean).

    Scale shape: one hash exchange by user + two per-user window
    passes (lag for gaps, row_number for the middle ranks) + one
    map-side-combinable aggregate — per-user groups are assumed
    partition-sized (the assign_sessions caveat: pre-split
    pathologically hot users by time range first).
    """
    if min_events < 2:
        raise ValueError(f"min_events must be >= 2: {min_events}")
    if max_median_gap_ms < 0:
        raise ValueError(
            f"max_median_gap_ms must be >= 0: {max_median_gap_ms}"
        )
    base = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    # integer div, not /1000 + cast: a double division then cast
    # truncates on Spark but a double->int CAST rounds in SQL replicas
    # (the gap is non-negative after the time order, so div == floor)
    gaps = base.withColumn(
        "__gap_ms",
        F.expr(
            f"(unix_micros({ts_col}) - unix_micros(lag({ts_col}) OVER "
            f"(PARTITION BY {user_col} ORDER BY {ts_col}, {order_col})))"
            " div 1000"
        ),
    ).select(
        F.col(user_col).alias("user_id"),
        F.col("__gap_ms").cast("long").alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    wg = Window.partitionBy("user_id").orderBy("gap_ms")
    # the rank pass shares the (user) hash partitioning with the count
    # window — one exchange feeds both
    ranked = gaps.withColumn("__rk", F.row_number().over(wg)).withColumn(
        "__m", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    per_user = (
        ranked.groupBy("user_id")
        .agg(
            F.max("__m").alias("__m"),
            # middle values of the sorted gap multiset: ranks
            # (m+1) div 2 and (m+2) div 2 (equal when m is odd)
            F.min(
                F.expr("CASE WHEN __rk = (__m + 1) div 2 "
                       "THEN gap_ms END")
            ).alias("__lo"),
            F.min(
                F.expr("CASE WHEN __rk = (__m + 2) div 2 "
                       "THEN gap_ms END")
            ).alias("__hi"),
        )
    )
    return per_user.select(
        "user_id",
        (F.col("__m") + 1).cast("long").alias("n_events"),
        F.expr("CAST((__lo + __hi) div 2 AS BIGINT)").alias("median_gap_ms"),
        F.expr(
            f"CAST(CASE WHEN __m + 1 >= {int(min_events)} AND "
            f"(__lo + __hi) div 2 <= {int(max_median_gap_ms)} "
            "THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("is_bot"),
    )
