#!/usr/bin/env python3
"""q341_sqlite_rows fixtures, written by the REAL SQLite library
(python stdlib sqlite3) so the kernel's b-tree walk, overflow-chain
gathering and serial-type decode are cross-checked against the
authoritative writer:

- small.db (page_size 512): a `docs` table exercising every serial
  type — NULL, the 0/1 constants, 1/2/3/4/6/8-byte ints (negative
  included), float64, text, blob — plus a second `langs` table so
  root-page resolution has to pick the right sqlite_master row.
- tree.db (page_size 512): 120 rows with 40-byte texts, forcing an
  interior-node b-tree, plus one 2000-byte text row spilling to an
  OVERFLOW CHAIN.

Prints Scala hex literals and the expected decoded rows."""
import sqlite3
import tempfile
import os


def build_small(path):
    con = sqlite3.connect(path)
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE docs (a INTEGER, b REAL, c TEXT, d BLOB)")
    con.execute("CREATE TABLE langs (code TEXT)")
    rows = [
        (None, 0.25, "hello", b"\x01\x02"),
        (0, None, "", b""),
        (1, -1.5, "café", None),
        (127, 1e10, "x" * 30, b"\xff"),
        (-129, None, None, b"\x00\x10"),
        (32767, 2.0, "t", None),
        (8388607, None, "u", None),
        (2147483647, None, "v", None),
        (140737488355327, None, "w", None),  # 6-byte
        (9223372036854775807, None, "z", None),  # 8-byte
        (-9223372036854775808, None, "neg", None),
    ]
    con.executemany("INSERT INTO docs VALUES (?,?,?,?)", rows)
    con.execute("INSERT INTO langs VALUES ('en')")
    con.commit()
    con.close()


def build_tree(path):
    con = sqlite3.connect(path)
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE t (v TEXT)")
    for i in range(120):
        con.execute("INSERT INTO t VALUES (?)", ("row%03d" % i + "x" * 34,))
    con.execute("INSERT INTO t VALUES (?)", ("Y" * 2000,))  # overflow chain
    con.commit()
    con.close()


def main():
    d = tempfile.mkdtemp()
    small = os.path.join(d, "small.db")
    tree = os.path.join(d, "tree.db")
    build_small(small)
    build_tree(tree)
    sb = open(small, "rb").read()
    tb = open(tree, "rb").read()
    print("// small.db (%d bytes):" % len(sb))
    print('val smallDb = "%s"' % sb.hex())
    print("// tree.db (%d bytes):" % len(tb))
    print('val treeDb = "%s"' % tb.hex())
    con = sqlite3.connect(small)
    for r in con.execute("SELECT rowid, * FROM docs"):
        print("//", r)


if __name__ == "__main__":
    main()
