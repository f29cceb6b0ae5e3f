#!/usr/bin/env python3
"""Alternate-encoding fixtures for documents/embeddings flavor drift.

The driver regenerates testdata between rounds and has already shipped
three different parquet logical types for events.ts (the r6 q38
incident). This tool freezes the OTHER plausible drifts as checked-in
sf0.001 fixtures so TablesFlavorSpec can replay gate queries against
them:

  documents_narrow.parquet   doc_id/n_chars as int32, text written with
                             DELTA_BYTE_ARRAY encoding (dictionary off)
  embeddings_wide.parquet    vec_id as int32, embedding as
                             list<float64> (exact widening), label int64

Values are identical to the source tables by construction — only the
physical/logical types change — so every query must return identical
results through Tables' type pinning.

Usage: python3 tools/gen_tables_flavor_fixtures.py
"""
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
DST = "src/test/resources/tables_flavor"


def main() -> None:
    import os
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    narrow = docs.cast(pa.schema([
        pa.field("doc_id", pa.int32()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("source", pa.string()),
        pa.field("n_chars", pa.int32()),
    ]))
    pq.write_table(
        narrow, f"{DST}/documents_narrow.parquet",
        use_dictionary=False, column_encoding={
            "text": "DELTA_BYTE_ARRAY", "lang": "DELTA_BYTE_ARRAY",
            "source": "DELTA_BYTE_ARRAY"})

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    wide = emb.cast(pa.schema([
        pa.field("vec_id", pa.int32()),
        pa.field("embedding", pa.list_(pa.float64())),
        pa.field("label", pa.int64()),
    ]))
    pq.write_table(wide, f"{DST}/embeddings_wide.parquet")

    for name in ("documents_narrow", "embeddings_wide"):
        print(name, pq.read_schema(f"{DST}/{name}.parquet"))


if __name__ == "__main__":
    main()
