"""The complete ETL run — the reference's ``main()`` (SURVEY §3.1) as
one orchestrated DataFrame program:

1. restore latest snapshot (carry forward state + geocodes with the
   site_id/hash reset)                      main_pls.py:101-186
2. incremental-or-full ESRI pulls, merged into carried state via
   upsert (M1/M2/M5)                        geocode.py:469-488
3. relational post-processing: prune → update-join enrich → prune →
   surrogate ids                            pls/tables.py:911-938
4. publish: metadata row, snapshot write, artifact headers, Kafka
   message row                              main_pls.py:188-218

The distributed-lock (S12) and presign (S9) edges stay with the
orchestrator (boto3), outside the engine. All inputs arrive as
DataFrames or injected fetch callables, so the run is testable offline
end-to-end — the reference's own main() test does the same with
monkeypatched I/O (tests/test_main_pls_kafka.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import upsert_by_key
from ..sources.snapshot import (
    carry_forward_geocodes,
    latest_snapshot,
    read_snapshot_table,
    write_snapshot,
)
from .pipeline import run_post_extract_pipeline, upsert_iri_pid_cache
from .publish import (
    artifact_key,
    build_artifact_headers,
    format_run_timestamp,
    kafka_message_df,
    metadata_df,
)


@dataclass
class RunResult:
    tables: dict[str, DataFrame]
    snapshot_path: str
    s3_key: str
    headers: dict[str, str]
    message: DataFrame
    previous_snapshot_ts: str | None


def run_etl(
    spark: SparkSession,
    *,
    snapshot_root: str,
    start_time: datetime,
    end_time: datetime,
    fetched_iri_pid: DataFrame,
    fetched_geocodes: DataFrame,
    lf_address: DataFrame,
    tables_to_remap: dict[str, tuple[DataFrame, str]],
    s3_bucket: str = "pls-feature-service-etl",
    presigned_url: str = "",
    presigned_url_expiry_seconds: int = 3600,
) -> RunResult:
    """One full run. ``fetched_*`` are the (already-normalized) source
    extracts for this increment; ``lf_address`` the SPARQL-derived
    address rows; ``tables_to_remap`` the entity tables needing
    surrogate ids (name → (df, pk_col))."""
    empty_map = spark.createDataFrame([], "iri string, id long")
    empty_pid = spark.createDataFrame([], "address_iri string, address_pid string")

    # 1. restore state from the previous snapshot (if any)
    prev_ts = latest_snapshot(snapshot_root)
    if prev_ts is not None:
        stored_pid = read_snapshot_table(spark, snapshot_root, prev_ts, "address_iri_pid_map")
        prev_geo = read_snapshot_table(
            spark, snapshot_root, prev_ts, "lf_geocode_sp_survey_point"
        )
        carried_geo = carry_forward_geocodes(prev_geo)
        id_maps = {}
        for name in tables_to_remap:
            try:
                id_maps[name] = read_snapshot_table(
                    spark, snapshot_root, prev_ts, f"{name}_id_map"
                )
            except Exception:
                id_maps[name] = empty_map
    else:
        stored_pid, carried_geo = empty_pid, None
        id_maps = {name: empty_map for name in tables_to_remap}

    # 2. merge increments into carried state (M1 cache upsert; M2
    #    geocode upsert resets enrichment on update)
    iri_pid_map = upsert_iri_pid_cache(stored_pid, fetched_iri_pid)
    if carried_geo is not None:
        geocodes = upsert_by_key(carried_geo, fetched_geocodes, key_cols=["geocode_id"])
    else:
        geocodes = fetched_geocodes

    # 3. relational post-processing
    out = run_post_extract_pipeline(
        lf_address=lf_address,
        geocodes=geocodes,
        iri_pid_map=iri_pid_map,
        id_maps=id_maps,
        tables_to_remap=tables_to_remap,
    )
    out["address_iri_pid_map"] = iri_pid_map
    out["metadata"] = metadata_df(spark, start_time, end_time)

    # 4. publish — the tables the NEXT run reads back by key get the
    #    clustered layout (range-disjoint files, tight min/max on the
    #    lookup key), so the restore step's joins/filters prune files:
    #    the iri→pid cache is probed by address_iri, every id map by
    #    iri (sources/snapshot.py write_snapshot sort_specs).
    snap_ts = format_run_timestamp(end_time)
    sort_specs = {"address_iri_pid_map": ["address_iri"]}
    for name in tables_to_remap:
        sort_specs[f"{name}_id_map"] = ["iri"]
    snapshot_path = write_snapshot(out, snapshot_root, snap_ts, sort_specs)
    key = artifact_key(end_time)
    headers = build_artifact_headers(
        etl_started_at=start_time,
        etl_finished_at=end_time,
        artifact_uploaded_at=end_time,
        duration_seconds=(end_time - start_time).total_seconds(),
        s3_bucket=s3_bucket,
        s3_key=key,
        presigned_url_expiry_seconds=presigned_url_expiry_seconds,
    )
    message = kafka_message_df(spark, presigned_url or f"s3://{s3_bucket}/{key}", headers)
    return RunResult(
        tables=out,
        snapshot_path=snapshot_path,
        s3_key=key,
        headers=headers,
        message=message,
        previous_snapshot_ts=prev_ts,
    )
