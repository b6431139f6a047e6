"""datadogsemanticsprocessor: derive datadog.* span attributes from OTel
span/resource fields (/root/reference/processor/datadogsemanticsprocessor/
processor.go:35-168) over the flat span model — one row per span with
resource_attributes / attributes map columns plus span_name / span_kind /
status_code / status_message scalar columns.

Every derivation is pure column math; `override_incoming_datadog_fields`
mirrors insertAttrIfMissingOrShouldOverride (processor.go:21-33): when
False an incoming datadog.* value wins, when True ours does.

Documented simplifications vs the Go (which calls into datadog-agent's
traceutil): hostname source resolution reduces to the host.name resource
attribute (the agent also consults cloud-provider hints), and the
operation-name/resource/type rules implement the documented V2 table for
the http/db/messaging/rpc families plus the span-kind fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first(m: Column, *keys: str) -> Column:
    """getFirstFromMap (processor.go:223-230): first non-empty value."""
    out = F.lit(None).cast("string")
    for k in reversed(keys):
        v = F.element_at(m, k)
        out = F.when(v.isNotNull() & (v != ""), v).otherwise(out)
    return out


def _kind_name(kind: Column) -> Column:
    return F.lower(F.coalesce(kind, F.lit("unspecified")))


def datadog_semantics(
    df: DataFrame,
    *,
    resource_attrs_col: str = "resource_attributes",
    attrs_col: str = "attributes",
    span_name_col: str = "span_name",
    span_kind_col: str = "span_kind",
    status_code_col: str = "status_code",
    status_message_col: str | None = "status_message",
    override_incoming_datadog_fields: bool = False,
) -> DataFrame:
    """Append the datadog.* columns (flat-model analog of the attribute
    inserts; a formatter folds them back into maps when exporting)."""
    res = F.col(resource_attrs_col)
    att = F.col(attrs_col)
    kind = _kind_name(F.col(span_kind_col))
    name = F.col(span_name_col)

    service = F.coalesce(
        _first(res, "service.name"), F.lit("otlpresourcenoservicename")
    )
    env = F.coalesce(
        _first(res, "deployment.environment.name", "deployment.environment"),
        F.lit("default"),
    )
    version = F.coalesce(_first(res, "service.version"), F.lit(""))
    host = F.coalesce(_first(res, "datadog.host.name", "host.name"), F.lit(""))

    http_method = _first(att, "http.request.method", "http.method")
    http_status = _first(att, "http.response.status_code", "http.status_code")
    db_system = _first(att, "db.system.name", "db.system")
    msg_system = _first(att, "messaging.system")
    msg_op = _first(att, "messaging.operation.type", "messaging.operation")
    rpc_system = _first(att, "rpc.system")

    # GetOTelOperationNameV2 rule table (documented Datadog mapping)
    op_name = (
        F.when(http_method.isNotNull() & (kind == "server"), "http.server.request")
        .when(http_method.isNotNull() & (kind == "client"), "http.client.request")
        .when(db_system.isNotNull() & (kind == "client"), F.concat(db_system, F.lit(".query")))
        .when(
            msg_system.isNotNull() & msg_op.isNotNull(),
            F.concat(msg_system, F.lit("."), msg_op),
        )
        .when(
            rpc_system.isNotNull() & (kind == "client"),
            F.concat(rpc_system, F.lit(".client.request")),
        )
        .when(
            rpc_system.isNotNull() & (kind == "server"),
            F.concat(rpc_system, F.lit(".server.request")),
        )
        # V2 fallback: the lowercased span kind ("internal", "producer", ...)
        .otherwise(kind)
    )

    # GetOTelResourceV2: "METHOD route" for http, query text for db,
    # "operation destination" for messaging, else the span name
    http_route = _first(att, "http.route")
    db_stmt = _first(att, "db.query.text", "db.statement")
    msg_dest = _first(att, "messaging.destination.name", "messaging.destination")
    resource = (
        F.when(
            http_method.isNotNull(),
            F.when(
                http_route.isNotNull(), F.concat(http_method, F.lit(" "), http_route)
            ).otherwise(http_method),
        )
        .when(db_stmt.isNotNull(), db_stmt)
        .when(
            msg_op.isNotNull() & msg_dest.isNotNull(),
            F.concat(msg_op, F.lit(" "), msg_dest),
        )
        .otherwise(name)
    )

    # GetOTelSpanType
    span_type = (
        F.when(kind == "server", "web")
        .when((kind == "client") & db_system.isNotNull(), "db")
        .when(kind == "client", "http")
        .otherwise("custom")
    )

    # status2Error (processor.go:170-208): error flag + message fallbacks
    is_error = F.upper(F.coalesce(F.col(status_code_col), F.lit(""))).isin(
        "ERROR", "STATUS_CODE_ERROR", "2"
    )
    exc_msg = _first(att, "exception.message")
    exc_type = _first(att, "exception.type")
    exc_stack = _first(att, "exception.stacktrace")
    status_msg = (
        F.coalesce(F.col(status_message_col), F.lit(""))
        if status_message_col and status_message_col in df.columns
        else F.lit("")
    )
    err_msg = F.when(
        is_error,
        F.coalesce(
            exc_msg,
            F.when(status_msg != "", status_msg),
            http_status,
        ),
    )

    def keep_incoming(key: str, ours: Column) -> Column:
        """insertAttrIfMissingOrShouldOverride over the span attrs map."""
        if override_incoming_datadog_fields:
            return ours
        incoming = F.element_at(att, key)
        return F.coalesce(incoming, ours)

    def keep_incoming_res(key: str, ours: Column) -> Column:
        if override_incoming_datadog_fields:
            return ours
        return F.coalesce(F.element_at(res, key), ours)

    return (
        df.withColumn("datadog_service", keep_incoming_res("datadog.service", service))
        .withColumn("datadog_env", keep_incoming_res("datadog.env", env))
        .withColumn("datadog_version", keep_incoming_res("datadog.version", version))
        .withColumn("datadog_host_name", keep_incoming_res("datadog.host.name", host))
        .withColumn("datadog_name", keep_incoming("datadog.name", op_name))
        .withColumn("datadog_resource", keep_incoming("datadog.resource", resource))
        .withColumn("datadog_type", keep_incoming("datadog.type", span_type))
        .withColumn("datadog_span_kind", keep_incoming("datadog.span.kind", kind))
        .withColumn(
            "datadog_http_status_code",
            keep_incoming("datadog.http_status_code", http_status),
        )
        .withColumn(
            "datadog_error",
            # try_cast: a non-numeric incoming datadog.error (e.g. "true")
            # becomes NULL->derived instead of an ANSI CAST_INVALID_INPUT
            # job abort
            F.coalesce(
                keep_incoming(
                    "datadog.error",
                    F.when(is_error, F.lit(1)).otherwise(F.lit(0)).cast("string"),
                ).try_cast("int"),
                F.when(is_error, F.lit(1)).otherwise(F.lit(0)),
            ),
        )
        # incoming datadog.error.* values survive on NON-error spans too
        # (keep_incoming first; the derived value only applies when the
        # span is an error) — matching the service/name columns' behavior
        .withColumn(
            "datadog_error_msg",
            keep_incoming("datadog.error.msg", F.when(is_error, err_msg)),
        )
        .withColumn(
            "datadog_error_type",
            keep_incoming("datadog.error.type", F.when(is_error, exc_type)),
        )
        .withColumn(
            "datadog_error_stack",
            keep_incoming("datadog.error.stack", F.when(is_error, exc_stack)),
        )
    )
