#!/usr/bin/env python3
"""One-time generator for the events timestamp-flavor fixtures.

The driver's testdata generator has shipped `events.ts` as three different
parquet logical types across regenerations:
  r<=5: TIMESTAMP(NANOS)               -> Spark reads LongType (nanosAsLong)
  r6:   TIMESTAMP(MICROS, utc=false)   -> Spark reads TIMESTAMP_NTZ
  (and plain adjusted MICROS is always possible next)

`Tables.events` must normalize all three to one TimestampType; the r6 drift
silently broke q38 (VERDICT r6 #1). This script snapshots the current
sf0.001 events table once into three variant parquet files checked into
src/test/resources/events_ts/, so EventsTsFixtureSpec can replay every
events-consuming gate query against each flavor forever, independent of
future driver regenerations.

Run manually (pyarrow is available on the driver side only):
  python3 tools/gen_events_ts_fixtures.py
"""
import pyarrow as pa
import pyarrow.parquet as pq
import os

SRC = "/root/testdata/sf0.001/events.parquet"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "events_ts")
os.makedirs(OUT, exist_ok=True)

t = pq.read_table(SRC)
ts = t.column("ts")
idx = t.schema.get_field_index("ts")

# ts arrives as timestamp[us] (NTZ). Build the three flavors.
us_ntz = ts.cast(pa.timestamp("us"))
us_utc = ts.cast(pa.timestamp("us", tz="UTC"))  # isAdjustedToUTC=true
ns_ntz = ts.cast(pa.timestamp("ns"))            # TIMESTAMP(NANOS)

for name, col in [("micros_ntz", us_ntz), ("micros_utc", us_utc),
                  ("nanos", ns_ntz)]:
    out = t.set_column(idx, pa.field("ts", col.type), col)
    pq.write_table(out, os.path.join(OUT, f"events_{name}.parquet"))
    print(name, col.type, pq.read_schema(
        os.path.join(OUT, f"events_{name}.parquet")).field("ts"))
