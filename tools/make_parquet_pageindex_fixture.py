#!/usr/bin/env python3
"""q364_parquet_page_index fixture: a pyarrow file written WITH page
indexes (write_page_index=True), page boundaries forced by
write_batch_size/data_page_size so the per-page census is fixed by
construction: 12 rows, pages of 4 values, an int64 ascending column
and a string column whose middle page is ALL NULL (null_pages hit).
The engine's decode is cross-validated against parquet-mr's OWN
ColumnIndex/OffsetIndex reader in the unit suite. Prints the scala
hex constant.
"""
import io

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    ids = list(range(12))
    strs = ["s%02d" % i for i in range(4)] + [None] * 4 + \
           ["t%02d" % i for i in range(4)]
    table = pa.table({"i": pa.array(ids, pa.int64()),
                      "s": pa.array(strs, pa.string())})
    buf = io.BytesIO()
    pq.write_table(table, buf, write_page_index=True,
                   data_page_size=1, write_batch_size=4,
                   compression="NONE", use_dictionary=False,
                   write_statistics=True)
    data = buf.getvalue()
    print(f"// pqPageIdxHex ({len(data)} bytes): 12 rows, 3 pages per "
          "chunk, string page 1 all-null")
    print(f'"{data.hex()}"')


if __name__ == "__main__":
    main()
