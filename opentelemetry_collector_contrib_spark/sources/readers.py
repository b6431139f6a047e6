"""Sources / receivers (§2.1) as Spark readers.

The filelog receiver's machinery (globbing, fingerprinting, offsets, poll
loop — /root/reference/pkg/stanza/fileconsumer/file.go:44-156, design.md)
exists because the Go collector tails live files; in Spark the equivalent
is the file source itself: batch `spark.read.text(glob)` (globbing, split
lines) or `spark.readStream.format('text')` (offset tracking == streaming
checkpoint). Batch resume == sinks/lineage.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def filelog(
    spark: SparkSession,
    glob: str,
    include_file_path: bool = False,
    streaming: bool = False,
) -> DataFrame:
    """filelog receiver: one row per line, body column; optional file-path
    attribute (receiver/filelogreceiver/filelog.go)."""
    reader = spark.readStream if streaming else spark.read
    df = reader.text(glob)
    out = df.withColumnRenamed("value", "body")
    if include_file_path:
        out = out.withColumn("log_file_path", F.input_file_name())
    return out


def otlpjson_file(spark: SparkSession, glob: str) -> DataFrame:
    """otlpjsonfilereceiver (receiver/otlpjsonfilereceiver/): OTLP/JSON
    lines -> flattened log records via the otlpjson connector."""
    from ..operators.connectors import otlpjson_connector

    raw = spark.read.text(glob).withColumnRenamed("value", "body")
    return otlpjson_connector(raw)


def table(spark: SparkSession, path_or_name: str, fmt: str = "parquet") -> DataFrame:
    """Primary scan: the Iceberg tokenized-sequence table at production
    (`spark.read.format('iceberg').load(name)`), parquet in this sandbox.
    Catalyst pushes filters/column pruning into the scan either way."""
    return spark.read.format(fmt).load(path_or_name)


def kafka_source(spark: SparkSession, bootstrap: str, topic: str, streaming: bool = True) -> DataFrame:
    """kafka receiver (receiver/kafkareceiver): key/value byte columns.
    Gated: no broker in this sandbox."""
    reader = spark.readStream if streaming else spark.read
    return (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )


def stdin_input(spark: SparkSession, stream=None) -> DataFrame:
    """stdin input operator (pkg/stanza/operator/input/stdin/input.go:24-64:
    a bufio.Scanner goroutine emitting one entry per line). The Spark analog
    is host-side plumbing: drain the process's stdin (bounded — batch
    semantics, like the reference's Stop on EOF) and parallelize the lines.
    `stream` overrides the source for tests."""
    import sys

    src = stream if stream is not None else sys.stdin
    lines = [ln.rstrip("\n") for ln in src]
    return spark.createDataFrame([(ln,) for ln in lines], "body string")


def namedpipe_input(spark: SparkSession, path: str, max_lines: int | None = None) -> DataFrame:
    """namedpipe input operator (pkg/stanza/operator/input/namedpipe/
    input.go:30-90: mkfifo + reopen-on-EOF read loop). Batch analog: one
    bounded drain of the FIFO (the reference's persistent tail loop is a
    host concern, same note as journald/windows-event — SURVEY §2.1).
    Reads until EOF or `max_lines`, one row per line."""
    lines: list[str] = []
    with open(path, "r") as fh:
        for ln in fh:
            lines.append(ln.rstrip("\n"))
            if max_lines is not None and len(lines) >= max_lines:
                break
    return spark.createDataFrame([(ln,) for ln in lines], "body string")


def syslog_socket_source(
    spark: SparkSession,
    host: str,
    port: int,
    protocol: str = "rfc5424",
) -> DataFrame:
    """Streaming syslog-over-TCP receiver
    (/root/reference/receiver/syslogreceiver/ tcp mode with
    non-transparent framing): Spark's socket source delivers
    newline-framed lines (RFC6587 §3.4.2); each line parses through the
    shared syslog_parser chain, so severity/facility/structured-data
    semantics are identical to the batch path. Octet-counted streams need
    a byte-level receiver (out of scope: the socket source is
    line-oriented); use parsers.deframe_octet_counting on chunked batch
    input instead."""
    from ..operators.parsers import syslog_parser

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "body")
    )
    return syslog_parser(raw, protocol=protocol)
