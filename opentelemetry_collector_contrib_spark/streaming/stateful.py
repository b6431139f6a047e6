"""Arbitrary-stateful streaming operators (§2.10): buffer-by-key,
flush-on-timeout — the semantics behind the reference's groupbytrace
(`/root/reference/processor/groupbytraceprocessor/processor.go:78-235`:
hold every span of a trace, release the whole trace `wait_duration`
after it is first seen) and tailsampling's `decision_wait`
(`/root/reference/processor/tailsamplingprocessor/processor.go`).

Spark-first realization: `applyInPandasWithState` with an EVENT-TIME
timeout. The per-trace timer anchors at the FIRST span's event time
plus `wait_duration` and is never extended by later spans — exactly the
reference's behavior ("Once a trace is kept for this duration, it's
then released ... Spans from a trace that has been released will be
kept for the entire duration again": a late span after release starts a
fresh buffered trace).

The Python side never touches typed span data: spans are packed to JSON
strings JVM-side (`to_json(struct(*))`) before the stateful op and
unpacked JVM-side (`from_json`) after it, so every column round-trips
through Spark's own codec and the pandas function only appends strings
to a list. State per trace = (first_ms, array<string> of packed spans).

State sizing at 10^12-row scale: every trace leaves the state store
exactly `wait_duration` after its first span's event time (once the
watermark passes it), so resident state ≈ arrival_rate × wait_duration
per executor partition — the same bound the reference documents for its
in-memory ring buffer, except distributed across the cluster's state
store instead of one collector process's heap. The reference's
`num_traces` hard cap is a single-process OOM guard; the distributed
analog is the watermark bound itself, so it is deliberately absent.

Drain caveat (bounded runs): event-time timers only fire when a later
micro-batch advances the watermark. A bounded `availableNow` run
therefore leaves traces younger than `wait_duration` (relative to the
max event time seen) buffered in state — they release on the next run
over new data, exactly like a restarted collector re-opening its
persistent queue. Tests that need a full drain append one sentinel span
far in the future and filter it from assertions.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_OUT_SCHEMA = "__trace string, __released_ms long, __n_spans int, __span string"
_STATE_SCHEMA = "first_ms long, spans array<string>"


def _make_buffer_fn(wait_ms: int) -> Callable[..., Any]:
    """Build the per-key stateful function. Defined at module level logic
    (closure carries only `wait_ms`) so Spark pickles a tiny payload."""

    def fn(
        key: tuple, pdf_iter: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            first_ms, spans = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "__trace": [key[0]] * len(spans),
                    "__released_ms": [first_ms + wait_ms] * len(spans),
                    "__n_spans": [len(spans)] * len(spans),
                    "__span": list(spans),
                }
            )
            return

        new_spans: list[str] = []
        min_ms: int | None = None
        for pdf in pdf_iter:
            new_spans.extend(pdf["__span"].tolist())
            # NULL event times survive the watermark predicate (NULL <
            # wm is NULL, not true) and reach here as NaT; min() over an
            # all-NaT column yields NaT whose .value is int64-min garbage
            m = pdf["__ts"].dropna().min()
            if pd.isna(m):
                continue
            ms = int(pd.Timestamp(m).value // 1_000_000)
            min_ms = ms if min_ms is None else min(min_ms, ms)
        if state.exists:
            first_ms, spans = state.get
            state.update((first_ms, list(spans) + new_spans))
        else:
            # a first batch whose spans ALL lack event time still buffers
            # (lossless); anchor the wait at the current watermark
            first_ms = (
                min_ms if min_ms is not None else state.getCurrentWatermarkMs()
            )
            state.update((first_ms, new_spans))
        # GroupState clears the timer on every invocation, so re-arm it
        # with the SAME anchor each time: first span + wait, never
        # extended by later spans. Clamped above the current watermark
        # (a span joining after the anchor already passed releases the
        # trace at the next watermark tick).
        state.setTimeoutTimestamp(
            max(first_ms + wait_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "__trace": pd.Series([], dtype=object),
                "__released_ms": pd.Series([], dtype="int64"),
                "__n_spans": pd.Series([], dtype="int32"),
                "__span": pd.Series([], dtype=object),
            }
        )

    return fn


def groupbytrace_stream(
    stream_df: DataFrame,
    trace_col: str = "trace_id",
    ts_col: str = "ts",
    wait_duration: float = 10.0,
    watermark: str = "30 seconds",
    released_col: str = "gbt_released_ms",
    n_spans_col: str = "gbt_n_spans",
) -> DataFrame:
    """Streaming groupbytraceprocessor: buffer every span of a trace,
    release the COMPLETE trace `wait_duration` seconds (event time)
    after its first span. Returns a streaming DataFrame with the
    original span columns plus `released_col` (epoch ms when the trace's
    wait expired) and `n_spans_col` (trace size at release) — every span
    of a trace appears in the same micro-batch output, which is the
    whole point: downstream per-trace decisions (tail sampling, trace
    metrics) see only complete traces."""
    span_schema = stream_df.schema
    cols = stream_df.columns
    packed = stream_df.select(
        F.col(trace_col).cast("string").alias("__trace"),
        F.col(ts_col).cast("timestamp").alias("__ts"),
        F.to_json(F.struct(*cols)).alias("__span"),
    ).withWatermark("__ts", watermark)

    out = packed.groupBy("__trace").applyInPandasWithState(
        _make_buffer_fn(int(wait_duration * 1000)),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        F.from_json("__span", span_schema).alias("__s"),
        F.col("__released_ms").alias(released_col),
        F.col("__n_spans").alias(n_spans_col),
    ).select("__s.*", released_col, n_spans_col)


def tailsampling_stream(
    stream_df: DataFrame,
    policies: list,
    sink_writer: Callable[[DataFrame, int], None],
    checkpoint: str,
    trace_col: str = "trace_id",
    ts_col: str = "ts",
    decision_wait: float = 10.0,
    watermark: str = "30 seconds",
    trigger_once: bool = True,
) -> DataStreamWriter:
    """Streaming tailsamplingprocessor: buffer spans for `decision_wait`
    (the reference's config.go knob), then evaluate the FULL batch policy
    DSL (`operators.processors.tail_sampling_policies` — agg / and /
    drop-veto / probabilistic / rate_limiting / always) over each
    released micro-batch and hand sampled spans to `sink_writer`.

    Operator logic is written once: because `groupbytrace_stream`
    releases only complete traces, the batch policy evaluator is correct
    per micro-batch unchanged (a trace is never split across decision
    batches). rate_limiting budgets apply within each released batch —
    the same horizon the reference's per-second ticker sees."""
    from ..operators.processors import tail_sampling_policies

    released = groupbytrace_stream(
        stream_df,
        trace_col=trace_col,
        ts_col=ts_col,
        wait_duration=decision_wait,
        watermark=watermark,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sampled = tail_sampling_policies(
            batch_df, policies, trace_col=trace_col, ts_col=ts_col
        )
        sink_writer(sampled, batch_id)

    writer = released.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer
