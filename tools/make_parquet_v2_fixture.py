#!/usr/bin/env python3
"""q343_parquet_v2 fixtures, written by the REAL parquet-cpp (pyarrow)
writer so the kernel's DELTA_BINARY_PACKED / DELTA_BYTE_ARRAY /
DELTA_LENGTH_BYTE_ARRAY / BYTE_STREAM_SPLIT readers are cross-checked
against the authoritative implementation:

- v2dp.parquet: data_page_version=2.0 (DataPageHeaderV2), dictionary
  OFF, per-column encodings —
    id    int64  DELTA_BINARY_PACKED  (negative deltas + a 1e6 jump)
    name  str    DELTA_BYTE_ARRAY     (shared prefixes + one NULL slot)
    tag   str    DELTA_LENGTH_BYTE_ARRAY (empty string included)
    score double BYTE_STREAM_SPLIT    (1e10 / -0.0 / subnormal-free)
    f     float  BYTE_STREAM_SPLIT
- v1dp.parquet: the SAME columns/encodings in classic v1 data pages
  (the DuckDB-writer shape: delta encodings inside compressed v1
  pages).

Prints Scala hex literals + the expected decoded values."""
import io

import pyarrow as pa
import pyarrow.parquet as pq

IDS = [100, 99, 97, 1000000, -5, 0, 7]
NAMES = ["alpha", "alphabet", "alps", "beta", None, "betamax", "alpha"]
TAGS = ["x", "", "yy", "zzz", "yy", "x", "qqqq"]
SCORES = [0.5, -1.25, 3.0, 1e10, -0.0, 2.5, 0.125]
FLOATS = [1.5, -2.25, 0.0, 3.5, -0.5, 10.0, 0.25]

ENCODINGS = {
    "id": "DELTA_BINARY_PACKED",
    "name": "DELTA_BYTE_ARRAY",
    "tag": "DELTA_LENGTH_BYTE_ARRAY",
    "score": "BYTE_STREAM_SPLIT",
    "f": "BYTE_STREAM_SPLIT",
}


def build(data_page_version):
    table = pa.table({
        "id": pa.array(IDS, pa.int64()),
        "name": pa.array(NAMES, pa.string()),
        "tag": pa.array(TAGS, pa.string()),
        "score": pa.array(SCORES, pa.float64()),
        "f": pa.array(FLOATS, pa.float32()),
    })
    buf = io.BytesIO()
    pq.write_table(
        table, buf,
        version="2.6",
        data_page_version=data_page_version,
        compression="NONE",
        use_dictionary=False,
        column_encoding=ENCODINGS,
    )
    return buf.getvalue()


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    v2 = build("2.0")
    v1 = build("1.0")
    print("// %d / %d bytes" % (len(v2), len(v1)))
    scala_hex("pqV2dpHex", v2)
    scala_hex("pqV1dpHex", v1)
    # sanity: pyarrow reads back what it wrote
    for blob in (v2, v1):
        t = pq.read_table(io.BytesIO(blob))
        assert t.column("id").to_pylist() == IDS
        assert t.column("name").to_pylist() == NAMES
        assert t.column("tag").to_pylist() == TAGS
        assert t.column("score").to_pylist() == SCORES
        assert t.column("f").to_pylist() == [
            pa.scalar(x, pa.float32()).as_py() for x in FLOATS]
    # page encodings really are the delta/BSS family
    md = pq.ParquetFile(io.BytesIO(v2)).metadata
    for i in range(md.num_columns):
        col = md.row_group(0).column(i)
        print("// %s: %s %s" % (col.path_in_schema, col.encodings,
                                col.compression))
