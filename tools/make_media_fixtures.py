#!/usr/bin/env python3
"""Generate REAL image fixtures for the multimodal decode path.

Writes fixtures/legiscan/media.parquet/part-0.parquet (directory layout,
so both Spark and the oracle's read_parquet glob see it) with columns
(doc_id BIGINT, kind VARCHAR, payload_b64 VARCHAR): deterministic
uncompressed images built byte-by-byte with the stdlib —
  - BMP 24-bit bottom-up            (channels 3)
  - BMP 8-bit palettized            (channels 1)
  - BMP 32-bit top-down (negative height — exercises abs())
  - PPM P6 binary                   (channels 3)
  - PGM P5 binary                   (channels 1)
  - junk rows: random-ish bytes and a truncated BMP header, which must
    decode to the (0,0,0) sentinel, never throw
graft.operators.Multimodal.decodeImage parses these headers from bytes;
the q_media_meta oracle re-derives width/height/channels in DuckDB via
hex()+nibble arithmetic over the same blobs, so the decoder is
hash-verified end to end (the q_audio_energy pattern).
"""
import base64
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "legiscan")


def px(x, y, i):
    return (x * 7 + y * 13 + i * 31) % 256


def bmp24(w, h, i):
    row = (w * 3 + 3) & ~3                       # 4-byte row padding
    data = bytearray()
    for y in range(h):                           # bottom-up storage
        r = bytearray()
        for x in range(w):
            r += bytes((px(x, y, i), px(x, y, i + 1), px(x, y, i + 2)))
        r += b"\x00" * (row - len(r))
        data += r
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + info + bytes(data)


def bmp8(w, h, i):
    row = (w + 3) & ~3
    pal = b"".join(bytes((j, j, j, 0)) for j in range(256))
    data = bytearray()
    for y in range(h):
        r = bytearray(px(x, y, i) for x in range(w))
        r += b"\x00" * (row - len(r))
        data += r
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data),
                       2835, 2835, 256, 0)
    return hdr + info + pal + bytes(data)


def bmp32_topdown(w, h, i):
    data = bytearray()
    for y in range(h):
        for x in range(w):
            data += bytes((px(x, y, i), px(x, y, i + 1),
                           px(x, y, i + 2), 255))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data),
                       2835, 2835, 0, 0)                 # NEGATIVE height
    return hdr + info + bytes(data)


def ppm6(w, h, i):
    body = bytes(px(x, y, i + c) for y in range(h) for x in range(w)
                 for c in range(3))
    return ("P6\n%d %d\n255\n" % (w, h)).encode("ascii") + body


def pgm5(w, h, i):
    body = bytes(px(x, y, i) for y in range(h) for x in range(w))
    return ("P5\n%d %d\n255\n" % (w, h)).encode("ascii") + body


def _png_chunk(tag, payload):
    import zlib
    return (struct.pack(">I", len(payload)) + tag + payload +
            struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png(w, h, i, color_type):
    """A COMPLETE valid PNG (signature, IHDR, zlib IDAT with per-row
    filter bytes, IEND, correct CRCs) — opens in any viewer; the graft
    decoder reads only the fixed-offset IHDR fields."""
    import zlib
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = bytearray()
    for y in range(h):
        raw.append(0)                            # filter type None
        for x in range(w):
            raw += bytes(px(x, y, i + c) % 256 for c in range(nch))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) +
            _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6)) +
            _png_chunk(b"IEND", b""))


def png_rgb(w, h, i):
    return png(w, h, i, 2)


def png_gray(w, h, i):
    return png(w, h, i, 0)


def png_rgba(w, h, i):
    return png(w, h, i, 6)


def junk(i):
    return bytes((j * 89 + i * 17) % 256 for j in range(40 + i * 13))


def main():
    sizes = [(13, 7), (64, 1), (5, 40), (32, 24), (17, 17), (48, 9),
             (1, 1), (63, 2), (9, 31), (24, 16), (55, 3), (2, 50)]
    rows = []
    did = 9000
    for i, (w, h) in enumerate(sizes):
        for kind, f in (("bmp24", bmp24), ("bmp8", bmp8),
                        ("bmp32td", bmp32_topdown), ("ppm", ppm6),
                        ("pgm", pgm5), ("png_rgb", png_rgb),
                        ("png_gray", png_gray), ("png_rgba", png_rgba)):
            rows.append((did, kind, f(w, h, i)))
            did += 1
    for i in range(6):
        rows.append((did, "junk", junk(i)))
        did += 1
    rows.append((did, "junk", b"BM\x01\x02"))  # truncated BMP header
    # a PNG signature with a mangled IHDR tag must sentinel, not parse
    rows.append((did + 1, "junk", b"\x89PNG\r\n\x1a\n" + b"\x00" * 10))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "payload_b64": pa.array(
            [base64.b64encode(r[2]).decode("ascii") for r in rows],
            pa.string()),
    })
    outdir = os.path.join(ROOT, "media.parquet")
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(t, os.path.join(outdir, "part-0.parquet"))
    print(outdir, len(rows), "rows,",
          sum(len(r[2]) for r in rows), "image bytes")


if __name__ == "__main__":
    main()
