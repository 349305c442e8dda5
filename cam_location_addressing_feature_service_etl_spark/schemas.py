"""Output-contract schemas and validation predicates.

The reference declares its 9-table output contract twice: SQLite DDL
with CHECK constraints (``address_etl/pls/tables.py:45-334``) and the
CSV export spec ``pls/definitions.json`` (types + max sizes + keys).
Here the contract is a registry of explicit ``StructType``s plus
validation predicates (F12) applied as a data-quality stage — Spark
has no CHECK constraints, so violations are *selected*, not rejected
by the store.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    dtype: str = "string"  # string | long | double
    max_size: int | None = None
    nullable: bool = True
    fixed_len: int | None = None  # e.g. status codes: length(x) = 1


@dataclass(frozen=True)
class TableSpec:
    name: str
    pk: tuple[str, ...]
    columns: tuple[ColumnSpec, ...] = field(default_factory=tuple)

    def struct_type(self) -> StructType:
        type_map = {"string": StringType(), "long": LongType(), "double": DoubleType()}
        return StructType(
            [StructField(c.name, type_map[c.dtype], c.nullable) for c in self.columns]
        )

    def violation_predicates(self) -> dict[str, Column]:
        """Named boolean columns that are true where a row VIOLATES the
        contract (width / fixed-length / pk-not-null checks)."""
        preds: dict[str, Column] = {}
        for c in self.columns:
            col = F.col(c.name)
            if c.max_size is not None:
                preds[f"{c.name}_width"] = F.length(col) > c.max_size
            if c.fixed_len is not None:
                preds[f"{c.name}_fixed_len"] = col.isNotNull() & (
                    F.length(col) != c.fixed_len
                )
            if not c.nullable:
                preds[f"{c.name}_not_null"] = col.isNull()
        return preds

    def violations(self, df: DataFrame) -> DataFrame:
        """One row per (rule, violation count) — the F12 validation stage."""
        aggs = [
            F.count(F.when(pred, 1)).alias(rule)
            for rule, pred in self.violation_predicates().items()
        ]
        wide = df.agg(*aggs)
        stacked = ", ".join(f"'{rule}', {rule}" for rule in self.violation_predicates())
        n = len(self.violation_predicates())
        return wide.selectExpr(f"stack({n}, {stacked}) AS (rule, violations)")


# The 8 entity tables + metadata, per pls/definitions.json and the DDL
# at address_etl/pls/tables.py:45-334 (`hash` columns exist but are
# never populated; kept for contract parity).
S = ColumnSpec
PLS_TABLES: dict[str, TableSpec] = {
    t.name: t
    for t in [
        TableSpec(
            "local_auth",
            pk=("la_code",),
            columns=(S("la_code", "long", nullable=False), S("la_name", max_size=40)),
        ),
        TableSpec(
            "locality",
            pk=("locality_code",),
            columns=(
                S("locality_code", max_size=20, nullable=False),
                S("locality_name", max_size=40),
                S("locality_type", max_size=5),
                S("la_code", "long"),
                S("state"),  # CHECK state = 'QLD'
                S("locality_status_code", fixed_len=1),
                S("hash"),
            ),
        ),
        TableSpec(
            # In the reference this table exists only in the consumer
            # contract (pls/definitions.json table 5, LOCALITY_ALIAS);
            # no populate path exists in address_etl, so runs export it
            # header-only. Declared here so the export contract covers
            # all 9 definitions.json tables.
            "lf_locality_alias",
            pk=("locality_alias_id",),
            columns=(
                S("locality_alias_id", "long", nullable=False),
                S("locality_alias_name", max_size=100),
                S("locality_code", max_size=10),
                S("status", max_size=10),
                S("loc_type", max_size=10),
            ),
        ),
        TableSpec(
            "lf_road",
            pk=("road_id",),
            columns=(
                S("road_id", nullable=False),
                S("road_cat", max_size=20),
                S("road_name", max_size=50),
                S("road_name_suffix", max_size=30),
                S("road_name_type", max_size=20),
                S("locality_code", max_size=20),
                S("road_cat_desc", fixed_len=1),
                S("hash"),
            ),
        ),
        TableSpec(
            "lf_parcel",
            pk=("parcel_id",),
            columns=(
                S("parcel_id", nullable=False),
                S("plan_no", max_size=10),
                S("lot_no", max_size=5),
                S("hash"),
            ),
        ),
        TableSpec(
            "lf_site",
            pk=("site_id",),
            columns=(
                S("site_id", nullable=False),
                S("parent_site_id"),  # self-FK; always NULL in current output
                S("site_type", max_size=50),
                S("parcel_id"),
                S("hash"),
            ),
        ),
        TableSpec(
            "lf_place_name",
            pk=("place_name_id",),
            columns=(
                S("place_name_id", nullable=False),
                S("place_name_status_code", fixed_len=1),
                S("place_name_type", max_size=4),
                S("place_name", max_size=60),
                S("site_id"),
                S("hash"),
            ),
        ),
        TableSpec(
            "lf_geocode_sp_survey_point",
            pk=("geocode_id",),
            columns=(
                S("geocode_id", nullable=False),
                S("geocode_type", max_size=4),
                S("address_pid", nullable=False),
                S("site_id"),  # NULL until the update-join enrichment
                S("centoid_lat", "double"),
                S("centoid_lon", "double"),
                S("hash"),
            ),
        ),
        TableSpec(
            "lf_address",
            pk=("addr_id",),
            columns=(
                S("addr_id", nullable=False),
                S("address_pid", nullable=False),
                S("parcel_id", nullable=False),
                S("addr_status_code", fixed_len=1),
                S("unit_type", max_size=50),
                S("unit_no", max_size=5),
                S("unit_suffix", max_size=1),
                S("level_type", max_size=20),
                S("level_no", max_size=20),
                S("level_suffix", max_size=5),
                S("street_no_first", max_size=10),
                S("street_no_first_suffix", max_size=10),
                S("street_no_last", max_size=10),
                S("street_no_last_suffix", max_size=10),
                S("road_id", nullable=False),
                S("site_id", nullable=False),
                S("location_desc", max_size=50),
                S("address_standard", max_size=10),
            ),
        ),
        TableSpec(
            "metadata",
            pk=("id",),
            columns=(
                S("id", "long", nullable=False),  # CHECK id = 1
                S("start_time"),
                S("end_time"),
            ),
        ),
    ]
}

#: state/cache tables carried across runs (SURVEY §1.3)
STATE_TABLES: dict[str, TableSpec] = {
    t.name: t
    for t in [
        TableSpec(
            "address_iri_pid_map",
            pk=("address_iri",),
            columns=(
                S("address_iri", nullable=False),
                S("address_pid", nullable=False),
            ),
        ),
        TableSpec(
            "geocode_type_code",
            pk=("iri",),
            columns=(S("iri", nullable=False), S("code", max_size=4)),
        ),
        TableSpec(
            "id_map",
            pk=("iri",),
            columns=(S("iri", nullable=False), S("id", "long", nullable=False)),
        ),
    ]
}
