#!/usr/bin/env python3
"""q351_arrow_values fixtures: REAL pyarrow IPC files (the
authoritative Arrow C++ writer) for the record-batch value decoder —
one v5 file with TWO record batches (int64+nulls, uint16, float64,
utf8+nulls, binary, bool), and the same table in the legacy v4
envelope (no continuation prefix).

Prints Scala hex literals + the expected values."""
import io

import pyarrow as pa
import pyarrow.ipc as ipc

I64 = [5, None, -7, 1 << 40, 0, 42]
U16 = [0, 1, 65535, 7, 300, 9]
F64 = [0.5, -1.25, 1e10, -0.0, 2.5, 0.125]
S = ["alpha", None, "", "beta", "café", "zz"]
BIN = [b"\x01\x02", b"", b"\xff", b"abc", b"\x00", b"\x10\x20"]
FLAG = [True, False, True, True, None, False]


def table():
    return pa.table({
        "i64": pa.array(I64, pa.int64()),
        "u16": pa.array(U16, pa.uint16()),
        "f64": pa.array(F64, pa.float64()),
        "s": pa.array(S, pa.string()),
        "bin": pa.array(BIN, pa.binary()),
        "flag": pa.array(FLAG, pa.bool_()),
    })


def build(legacy):
    t = table()
    sink = io.BytesIO()
    opts = ipc.IpcWriteOptions(use_legacy_format=legacy)
    with ipc.new_file(sink, t.schema, options=opts) as w:
        w.write_table(t.slice(0, 4))
        w.write_table(t.slice(4))
    return sink.getvalue()


def scala_hex(name, b):
    h = b.hex().upper()
    lines = [h[i:i + 60] for i in range(0, len(h), 60)]
    body = " +\n    ".join('"%s"' % ln for ln in lines)
    print("  private val %s: String =\n    %s\n" % (name, body))


if __name__ == "__main__":
    v5 = build(False)
    v4 = build(True)
    for blob in (v5, v4):
        r = ipc.open_file(io.BytesIO(blob)).read_all()
        assert r.column("i64").to_pylist() == I64
        assert r.column("s").to_pylist() == S
        assert r.num_rows == 6
    print("// %d / %d bytes, %d batches" %
          (len(v5), len(v4), ipc.open_file(io.BytesIO(v5)).num_record_batches))
    scala_hex("arrowV5Hex", v5)
    scala_hex("arrowV4Hex", v4)
