"""SPARQL endpoint as a PySpark 4 Python Data Source — the symmetry
partner of ``sources/esri_datasource.py`` (r10 verdict #7), so the
reference's two-phase VALUES extract becomes one declarative read:

    spark.dataSource.register(SparqlDataSource)
    df = (spark.read.format("sparql")
          .option("endpoint", "https://.../sparql")
          .option("variables", "pid,street,locality")
          .option("query", "SELECT ?pid ?street ?locality WHERE {...}")
          .load())

Two partition-planning modes, both executed by workers against the
endpoint with ``sources/sparql_http.py SparqlClient`` (each task builds
its own client — nothing network-bound is serialized):

- **paged** (default): the planner wraps the query in
  ``SELECT (COUNT(*) AS ?n) {{ ... }}`` for a server-side count and
  emits one partition per ``page_size`` window; each partition appends
  ``ORDER BY ?var LIMIT/OFFSET`` (OFFSET without ORDER BY is not a
  stable order in SPARQL — same discipline as the ESRI source's
  ``orderByFields``).
- **keys**: the reference's keys-then-details shape
  (``address_etl/pls/tables.py:401-472``: an address-keys query, then
  detail queries VALUES-batched ≤10k keys). The planner runs
  ``keys_query``, chunks the distinct keys into ``key_batch``-sized
  partitions, and each partition substitutes its
  ``VALUES ?key {{ <k1> <k2> ... }}`` block for the ``{values}``
  placeholder in the query — the reference's Jinja template loop,
  re-expressed as partition planning so the detail fetch fans out
  across the cluster instead of looping on one driver.

Unbound OPTIONAL variables surface as NULLs (P6), matching
``sources/sparql.py flatten_bindings``.

``mode=fake`` serves a deterministic synthetic endpoint (count, paging,
VALUES batches, an ``_opt``-suffixed sometimes-unbound variable) so the
source is fully testable offline; the live mode uses SparqlClient's
urllib transport with its backoff contract (``crud.py:19-48``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


@dataclass
class PagePartition(InputPartition):
    offset: int
    count: int


@dataclass
class KeyBatchPartition(InputPartition):
    keys: tuple[str, ...]


# ---------------------------------------------------------------------------
# deterministic fake endpoint (offline tests; options-driven so it
# exists identically inside executor workers)
# ---------------------------------------------------------------------------


def _fake_rows(options: dict) -> int:
    return int(options.get("fake_rows", "1000"))


def _fake_binding(variables: Sequence[str], i: int) -> dict:
    """Row i of the synthetic store: the first variable is the key IRI,
    ``*_opt`` variables are unbound every third row (the OPTIONAL-NULL
    path), the rest are derived literals."""
    row: dict[str, dict[str, str]] = {}
    for j, v in enumerate(variables):
        if j == 0:
            row[v] = {"value": f"urn:pid:{i}"}
        elif v.endswith("_opt") and i % 3 == 0:
            continue
        else:
            row[v] = {"value": f"{v}-{i}"}
    return row


def _fake_transport_factory(options: dict):
    """A SPARQL transport serving the synthetic store. Recognizes the
    three query shapes the reader emits: COUNT wrap, VALUES-batched
    detail, and plain SELECT with LIMIT/OFFSET paging."""
    total = _fake_rows(options)
    variables = _variables(options)

    def transport(_url: str, form: dict) -> dict:
        q = form["query"]
        if "(COUNT(*) AS ?n)" in q:
            return {"results": {"bindings": [{"n": {"value": str(total)}}]}}
        values = re.search(r"VALUES\s+\?\w+\s*\{([^}]*)\}", q)
        if values:
            keys = re.findall(r"<([^>]+)>", values.group(1))
            idx = [int(k.rsplit(":", 1)[1]) for k in keys]
            rows = [_fake_binding(variables, i) for i in sorted(idx) if i < total]
        else:
            rows = [_fake_binding(variables, i) for i in range(total)]
        limit = re.search(r"\bLIMIT\s+(\d+)", q)
        offset = re.search(r"\bOFFSET\s+(\d+)", q)
        lo = int(offset.group(1)) if offset else 0
        hi = lo + int(limit.group(1)) if limit else len(rows)
        return {"results": {"bindings": rows[lo:hi]}}

    return transport


def _subselect(query: str) -> str:
    """The user's query wrapped as a SPARQL subselect ``{ <query> }``
    so appended solution modifiers (ORDER BY / LIMIT / OFFSET, or the
    COUNT projection) compose with a query that already carries its
    own modifiers — appending them directly after a query ending in
    ORDER BY/LIMIT would be invalid SPARQL or silently mis-page. The
    newline before ``}`` keeps a trailing ``# comment`` from swallowing
    the closing brace."""
    return f"{{\n{query}\n}}"


def _count_query(query: str) -> str:
    return f"SELECT (COUNT(*) AS ?n) WHERE {_subselect(query)}"


def _page_query(query: str, order_var: str, limit: int, offset: int) -> str:
    return (
        f"SELECT * WHERE {_subselect(query)}"
        f"\nORDER BY ?{order_var}\nLIMIT {limit}\nOFFSET {offset}"
    )


def _variables(options: dict) -> list[str]:
    raw = options.get("variables", "")
    out = [v.strip() for v in raw.split(",") if v.strip()]
    if not out:
        raise ValueError(
            "sparql source requires the 'variables' option "
            "(comma-separated projection variables)"
        )
    return out


def _client(options: dict):
    from .sparql_http import SparqlClient, urllib_sparql_transport

    if options.get("mode") == "fake":
        return SparqlClient("fake://", transport=_fake_transport_factory(options))
    return SparqlClient(  # pragma: no cover - network
        options["endpoint"], transport=urllib_sparql_transport
    )


class SparqlReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema
        self.variables = _variables(options)
        self.page_size = int(options.get("page_size", "10000"))
        self.key_batch = int(options.get("key_batch", "10000"))
        self.query = options["query"]
        self.keys_query = options.get("keys_query")
        self.key_var = options.get("key_var", self.variables[0])
        # OFFSET paging is only a stable order when the query is
        # ordered; default to the first projection variable
        self.order_var = options.get("order_var", self.variables[0])

    # -- planning ----------------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        if self.keys_query is not None:
            keys = [
                r[self.key_var]["value"]
                for r in _client(self.options).query_paged(
                    self.keys_query, page_size=self.page_size
                )
                if self.key_var in r
            ]
            keys = sorted(set(keys))
            return [
                KeyBatchPartition(keys=tuple(keys[o : o + self.key_batch]))
                for o in range(0, max(len(keys), 1), self.key_batch)
            ]
        total = int(
            _client(self.options).query(_count_query(self.query))[0]["n"][
                "value"
            ]
        )
        return [
            PagePartition(offset=o, count=self.page_size)
            for o in range(0, max(total, 1), self.page_size)
        ]

    # -- execution ---------------------------------------------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        client = _client(self.options)
        if isinstance(partition, KeyBatchPartition):
            if not partition.keys:
                # empty key universe: an empty VALUES {} block is
                # invalid SPARQL — the one planned partition is empty
                return
            block = " ".join(f"<{k}>" for k in partition.keys)
            q = self.query.replace(
                "{values}", f"VALUES ?{self.key_var} {{ {block} }}"
            )
            rows = client.query(q)
        else:
            rows = client.query(
                _page_query(
                    self.query,
                    self.order_var,
                    partition.count,
                    partition.offset,
                )
            )
        for r in rows:
            yield tuple(r.get(v, {}).get("value") for v in self.variables)


class SparqlDataSource(DataSource):
    """spark.read.format("sparql") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "sparql"

    def schema(self) -> str:
        return ", ".join(f"{v} string" for v in _variables(dict(self.options)))

    def reader(self, schema: StructType) -> DataSourceReader:
        return SparqlReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> "SparqlStreamReader":
        return SparqlStreamReader(dict(self.options), schema)


class SparqlStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch incremental scan of a SPARQL result set — the
    symmetry twin of ``EsriStreamReader`` (``spark.readStream
    .format("sparql")``): each batch fetches the next ``page_size``
    rows past the committed row-offset watermark with ORDER BY pinned
    (the same stability discipline as the batch reader — OFFSET
    without ORDER BY is not a stable order, so replay could deliver
    different rows than originally committed). The offset is
    ``{"next": <row offset>}``; ``readBetweenOffsets`` replays any
    (start, end] range exactly for a STATIC or APPEND-AT-END result
    set — a store whose earlier bindings mutate between read and
    replay cannot be exactly-once under offset paging (freeze with a
    snapshot graph/named-graph predicate instead, the analogue of the
    ESRI ``where`` snapshot)."""

    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema
        self.variables = _variables(options)
        self.page_size = int(options.get("page_size", "10000"))
        self.query = options["query"]
        self.order_var = options.get("order_var", self.variables[0])

    def _total(self) -> int:
        return int(
            _client(self.options).query(_count_query(self.query))[0]["n"][
                "value"
            ]
        )

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple:
        lo = int(start["next"])
        hi = min(lo + self.page_size, self._total())
        if hi <= lo:
            return iter(()), {"next": lo}
        return iter(self._rows(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["next"]), int(end["next"])))

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        q = _page_query(self.query, self.order_var, hi - lo, lo)
        return [
            tuple(r.get(v, {}).get("value") for v in self.variables)
            for r in _client(self.options).query(q)
        ]
