"""datadogsemanticsprocessor derivations on hand-built spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.datadog import datadog_semantics


def _spans(spark, rows):
    return spark.createDataFrame(
        rows,
        "resource_attributes map<string,string>, attributes map<string,string>, "
        "span_name string, span_kind string, status_code string, status_message string",
    )


def test_http_server_span(spark):
    df = _spans(spark, [(
        {"service.name": "shop", "service.version": "1.2", "host.name": "h1",
         "deployment.environment": "prod"},
        {"http.request.method": "GET", "http.route": "/api/:id",
         "http.response.status_code": "200"},
        "GET /api/42", "SERVER", "UNSET", "",
    )])
    r = datadog_semantics(df).first()
    assert r["datadog_service"] == "shop" and r["datadog_env"] == "prod"
    assert r["datadog_version"] == "1.2" and r["datadog_host_name"] == "h1"
    assert r["datadog_name"] == "http.server.request"
    assert r["datadog_resource"] == "GET /api/:id"
    assert r["datadog_type"] == "web" and r["datadog_span_kind"] == "server"
    assert r["datadog_http_status_code"] == "200"
    assert r["datadog_error"] == 0 and r["datadog_error_msg"] is None


def test_db_client_error_span(spark):
    df = _spans(spark, [(
        {},  # no service.name -> datadog fallback service
        {"db.system": "postgresql", "db.statement": "SELECT 1",
         "exception.message": "boom", "exception.type": "PgError"},
        "query", "CLIENT", "ERROR", "fallback-msg",
    )])
    r = datadog_semantics(df).first()
    assert r["datadog_service"] == "otlpresourcenoservicename"
    assert r["datadog_env"] == "default"
    assert r["datadog_name"] == "postgresql.query"
    assert r["datadog_resource"] == "SELECT 1"
    assert r["datadog_type"] == "db"
    assert r["datadog_error"] == 1
    assert r["datadog_error_msg"] == "boom"  # exception.message wins
    assert r["datadog_error_type"] == "PgError"


def test_error_msg_fallback_chain_and_internal_kind(spark):
    # no exception.message -> status message; then http status code
    df = _spans(spark, [
        ({}, {}, "op-a", "INTERNAL", "ERROR", "status says no"),
        ({}, {"http.status_code": "503"}, "op-b", "PRODUCER", "ERROR", ""),
        ({}, {"messaging.system": "kafka", "messaging.operation": "publish",
              "messaging.destination.name": "orders"},
         "send", "PRODUCER", "UNSET", ""),
    ])
    rows = datadog_semantics(df).orderBy("span_name").collect()
    a, b, send = rows[0], rows[1], rows[2]
    assert a["datadog_error_msg"] == "status says no"
    assert a["datadog_name"] == "internal"
    assert b["datadog_error_msg"] == "503"
    assert b["datadog_name"] == "producer"
    assert send["datadog_name"] == "kafka.publish"
    assert send["datadog_resource"] == "publish orders"
    assert send["datadog_type"] == "custom"


def test_incoming_datadog_fields_respected_unless_override(spark):
    df = _spans(spark, [(
        {"service.name": "real", "datadog.service": "pinned"},
        {"datadog.name": "custom.op"},
        "n", "SERVER", "UNSET", "",
    )])
    keep = datadog_semantics(df).first()
    assert keep["datadog_service"] == "pinned"
    assert keep["datadog_name"] == "custom.op"
    override = datadog_semantics(df, override_incoming_datadog_fields=True).first()
    assert override["datadog_service"] == "real"
    assert override["datadog_name"] == "server"
