"""Pre-flight fixture-schema pins (round 13, VERDICT r12 item 7).

TESTDATA regeneration has silently changed parquet physical types
twice (events.ts NANOS->MICROS on 2026-08-13; integer widths between
generations). Date/events/vector ops key on these physical types, so
a regen used to cost a debugging cycle per affected op. This test
pins the exact arrow-level schema of every fixture table at every
scale factor: a future regen that changes anything fails HERE with a
readable diff, before any operator test runs.

If this test fails after a fixture regeneration: re-probe the types
(`pyarrow.parquet.ParquetFile(...).schema_arrow`), re-check the
dtype-conditional readers (tables.py events.ts handling), and only
then update the pins below.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

_SF_DIRS = [
    d
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(f"/root/testdata/{d}")
]

# One canonical column->arrow-type map per table. Probed 2026-08-16:
# identical across sf0.001/sf0.01/sf0.1 in the current generation
# (earlier generations had narrower ints at sf0.001 — the per-sf loop
# below would catch a return to that).
_EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {
        "n_nationkey": "int32",
        "n_name": "string",
        "n_regionkey": "int32",
    },
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",  # NANOS before 2026-08-13 — tables.py
        # reads micros as LTZ via inferTimestampNTZ=false; a change
        # here means re-checking every unix_micros caller.
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


def _arrow_schema(path: str) -> dict[str, str]:
    files = sorted(glob.glob(path)) or sorted(
        glob.glob(path.replace(".parquet", ".parquet/*.parquet"))
    )
    assert files, f"no parquet at {path}"
    sch = pq.ParquetFile(files[0]).schema_arrow
    return {n: str(sch.field(n).type) for n in sch.names}


@pytest.mark.parametrize("sf", _SF_DIRS)
@pytest.mark.parametrize("tbl", sorted(_EXPECTED))
def test_fixture_physical_types_pinned(sf: str, tbl: str):
    actual = _arrow_schema(f"/root/testdata/{sf}/{tbl}.parquet")
    expected = _EXPECTED[tbl]
    # Compare only pinned columns on part/customer/supplier (extra
    # descriptive columns are allowed to come and go); everything
    # else pins the FULL schema including column set.
    if tbl in ("part", "customer", "supplier"):
        diff = {
            c: (expected[c], actual.get(c))
            for c in expected
            if actual.get(c) != expected[c]
        }
    else:
        diff = {
            c: (expected.get(c), actual.get(c))
            for c in set(expected) | set(actual)
            if actual.get(c) != expected.get(c)
        }
    assert not diff, (
        f"{sf}/{tbl} fixture schema drifted (col: expected, actual): "
        f"{diff} — fixture regeneration changed physical types; "
        f"re-check tables.py dtype handling before updating pins"
    )
