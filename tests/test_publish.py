"""Publish-edge format contracts, mirroring the reference's Kafka test
expectations (``tests/test_main_pls_kafka.py:97-117`` in /root/reference)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from cam_location_addressing_feature_service_etl_spark.plans.publish import (
    artifact_key,
    build_artifact_headers,
    format_kafka_timestamp,
    format_run_timestamp,
    kafka_message_df,
    metadata_df,
)

START = datetime(2026, 4, 23, 2, 0, 0, tzinfo=timezone(timedelta(hours=10)))
END = datetime(2026, 4, 23, 2, 2, 30, tzinfo=timezone(timedelta(hours=10)))
UPLOADED = datetime(2026, 4, 23, 2, 2, 45, tzinfo=timezone(timedelta(hours=10)))


def test_run_timestamp_is_brisbane_offset_compact():
    assert format_run_timestamp(START) == "2026-04-23T02:00:00+1000"


def test_kafka_timestamp_is_utc_isoformat():
    assert format_kafka_timestamp(START) == "2026-04-22T16:00:00+00:00"


def test_artifact_key_format():
    assert artifact_key(END) == "pls-etl/2026-04-23T02:02:30+1000/pls.db"


def test_artifact_headers_match_reference_contract():
    headers = build_artifact_headers(
        etl_started_at=START,
        etl_finished_at=END,
        artifact_uploaded_at=UPLOADED,
        duration_seconds=150.0,
        s3_bucket="pls-feature-service-etl",
        s3_key="pls-etl/2026-04-23T02:02:30+1000/pls.db",
        presigned_url_expiry_seconds=3600,
    )
    assert headers == {
        "etl-name": "pls",
        "etl-started-at": "2026-04-22T16:00:00+00:00",
        "etl-finished-at": "2026-04-22T16:02:30+00:00",
        "artifact-uploaded-at": "2026-04-22T16:02:45+00:00",
        "etl-duration-seconds": "150.000",
        "s3-bucket": "pls-feature-service-etl",
        "s3-key": "pls-etl/2026-04-23T02:02:30+1000/pls.db",
        "presigned-url-expiry-seconds": "3600",
    }


def test_metadata_df_singleton_row(spark):
    row = metadata_df(spark, START, END).collect()[0]
    assert row["id"] == 1
    assert row["start_time"] == "2026-04-23T02:00:00+1000"
    assert row["end_time"] == "2026-04-23T02:02:30+1000"


def test_kafka_message_shape(spark):
    df = kafka_message_df(spark, "https://example.com/presigned", {"etl-name": "pls"})
    row = df.collect()[0]
    assert row["value"] == b"https://example.com/presigned"
    assert row["headers"][0]["key"] == "etl-name"
    assert row["headers"][0]["value"] == b"pls"
    assert df.schema.simpleString() == (
        "struct<value:binary,headers:array<struct<key:string,value:binary>>>"
    )


def test_publish_to_kafka_error_contract_without_connector(spark):
    # no broker or connector jar in this sandbox: the sink must fail
    # with the actionable message, not an opaque classpath error
    import pytest

    from cam_location_addressing_feature_service_etl_spark.plans.publish import (
        publish_to_kafka,
    )

    df = kafka_message_df(spark, "https://example.com/x", {"etl-name": "pls"})
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        publish_to_kafka(df, "localhost:9092", "pls-artifacts")
