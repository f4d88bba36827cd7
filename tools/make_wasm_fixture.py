#!/usr/bin/env python3
"""q361_wasm_meta fixture: a minimal-but-real WebAssembly module
assembled from the public core spec — type, import (func + memory +
global), function, export (func + memory... export of an imported
memory), code and a custom section, so every census field is
non-trivial. Prints the scala hex constant.

Layout mirrors what `wat2wasm` emits for:
  (module
    (import "env" "log" (func (param i32)))
    (import "env" "mem" (memory 1 4))
    (import "env" "g" (global i32))
    (func (export "run") (param i32) (result i32) local.get 0)
    (export "memory" (memory 0)))
"""
import struct


def uleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def vec_bytes(items) -> bytes:
    return uleb(len(items)) + b"".join(items)


def name(s: str) -> bytes:
    e = s.encode()
    return uleb(len(e)) + e


def section(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + uleb(len(payload)) + payload


def main():
    # type section: (i32)->() and (i32)->(i32)
    t0 = b"\x60" + vec_bytes([b"\x7f"]) + vec_bytes([])
    t1 = b"\x60" + vec_bytes([b"\x7f"]) + vec_bytes([b"\x7f"])
    types = section(1, vec_bytes([t0, t1]))
    # imports: env.log func(type0), env.mem memory{1,4}, env.g global i32
    imp = vec_bytes([
        name("env") + name("log") + b"\x00" + uleb(0),
        name("env") + name("mem") + b"\x02" + b"\x01" + uleb(1) + uleb(4),
        name("env") + name("g") + b"\x03" + b"\x7f" + b"\x00",
    ])
    imports = section(2, imp)
    # one local function of type 1
    funcs = section(3, vec_bytes([uleb(1)]))
    # exports: run -> func 1 (after the imported func 0), memory -> mem 0
    exports = section(7, vec_bytes([
        name("run") + b"\x00" + uleb(1),
        name("memory") + b"\x02" + uleb(0),
    ]))
    # code: one body — no locals, local.get 0, end
    body = vec_bytes([]) + b"\x20\x00\x0b"
    code = section(10, vec_bytes([uleb(len(body)) + body]))
    custom = section(0, name("producer") + b"graft")
    module = (b"\x00asm" + struct.pack("<I", 1) +
              types + imports + funcs + exports + code + custom)
    print(f"// wasmModHex ({len(module)} bytes): 6 sections, 2 types, "
          "3 imports, 2 exports, 1 function")
    print(f'"{module.hex()}"')


if __name__ == "__main__":
    main()
