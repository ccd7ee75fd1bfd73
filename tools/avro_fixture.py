"""Hand-crafted Avro object-container fixture, written directly from
the public spec (zigzag varints, counted blocks, deflate codec) with no
Avro library — ground truth for AvroReaderSpec.

Usage: python3 tools/avro_fixture.py <out.avro>
"""
import json
import struct
import sys
import zlib


def zigzag(n):
    return (n << 1) ^ (n >> 63)


def varlong(n):
    n = zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = b''
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def astr(s):
    b = s.encode()
    return varlong(len(b)) + b


SCHEMA = {
    "type": "record", "name": "alert", "namespace": "test",
    "fields": [
        {"name": "objectId", "type": "string"},
        {"name": "candid", "type": "long"},
        {"name": "maybe_mag", "type": ["null", "double"]},
        {"name": "candidate", "type": {
            "type": "record", "name": "cand",
            "fields": [
                {"name": "jd", "type": "double"},
                {"name": "fid", "type": "int"},
                {"name": "flags", "type": {"type": "array", "items": "int"}},
            ]}},
        {"name": "props", "type": {"type": "map", "values": "string"}},
        {"name": "grade", "type": {"type": "enum", "name": "g",
                                   "symbols": ["A", "B", "C"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "tag16", "type": {"type": "fixed", "name": "fx", "size": 4}},
        {"name": "ratio", "type": "float"},
        {"name": "history", "type": {"type": "array", "items": "cand"}},
    ]}


def enc_cand(jd, fid, flags):
    out = struct.pack('<d', jd) + varlong(fid)
    if flags:
        out += varlong(len(flags)) + b''.join(varlong(f) for f in flags)
    out += varlong(0)
    return out


def enc_row(objectId, candid, maybe_mag, cand, props, grade, blob, tag, ratio, hist):
    out = astr(objectId) + varlong(candid)
    out += varlong(0) if maybe_mag is None else varlong(1) + struct.pack('<d', maybe_mag)
    out += enc_cand(*cand)
    if props:
        out += varlong(len(props))
        for k, v in props.items():
            out += astr(k) + astr(v)
    out += varlong(0)
    out += varlong(["A", "B", "C"].index(grade))
    out += varlong(len(blob)) + blob
    out += tag
    out += struct.pack('<f', ratio)
    if hist:
        out += varlong(len(hist)) + b''.join(enc_cand(*h) for h in hist)
    out += varlong(0)
    return out


ROWS = [
    ("ZTF1", 101, 19.5, (2460000.5, 1, [1, 2, 3]), {"a": "x"}, "B",
     b'\x01\x02', b'TAG1', 0.25, [(2459999.5, 2, [])]),
    ("ZTF2", 102, None, (2460001.5, 2, []), {}, "A",
     b'', b'TAG2', -1.5, []),
    ("ZTF3", -103, 3.125, (2460002.5, 3, [-7]), {"k1": "v1", "k2": "v2"}, "C",
     b'\xff', b'TAG3', 1e10, [(2459990.0, 1, [9]), (2459991.0, 2, [])]),
]


def main(path):
    payload = b''.join(enc_row(*r) for r in ROWS)
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = comp.compress(payload) + comp.flush()
    sync = bytes(range(16))
    header = b'Obj\x01'
    meta = varlong(2)
    sj = json.dumps(SCHEMA).encode()
    meta += astr('avro.schema') + varlong(len(sj)) + sj
    cj = b'deflate'
    meta += astr('avro.codec') + varlong(len(cj)) + cj
    meta += varlong(0)
    block = varlong(len(ROWS)) + varlong(len(deflated)) + deflated + sync
    with open(path, 'wb') as f:
        f.write(header + meta + sync + block)
    print('wrote', path, len(ROWS), 'rows')


if __name__ == '__main__':
    main(sys.argv[1])
