#!/usr/bin/env python3
"""Rebuild a testdata dir with events.ts as parquet TIMESTAMP(NANOS).

The driver's testdata has shipped events.ts two ways (nanos-as-long up
to round 8, TIMESTAMP_MICROS/NTZ since round 9). The engine's Td
accessors adapt at plan-build time; this script regenerates the LEGACY
encoding so both paths stay verifiable end-to-end:

    python3 tools/make_nanos_fixture.py /root/testdata/sf0.001 /tmp/sf_nanos
    sbt -batch "runMain graft.Verify /tmp/sf_nanos /tmp/verify_nanos <ts-queries>"
    python3 tools/local_verify.py /tmp/sf_nanos /tmp/verify_nanos <ts-queries>

Spark (with spark.sql.legacy.parquet.nanosAsLong=true, set in every
session builder) reads the ns column as LongType nanos; DuckDB reads it
as a µs timestamp — exactly the round-8 world. Verified green for all
8 event-time queries in round 10.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    ev = pq.read_table(f"{src}/events.parquet")
    i = ev.schema.get_field_index("ts")
    ns = ev.column("ts").cast(pa.timestamp("ns"))
    ev = ev.set_column(i, pa.field("ts", pa.timestamp("ns")), ns)
    # version 2.6 keeps TIMESTAMP(NANOS) instead of coercing to micros
    pq.write_table(ev, f"{dst}/events.parquet", version="2.6",
                   coerce_timestamps=None)
    print(pq.read_schema(f"{dst}/events.parquet").field("ts").type)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
