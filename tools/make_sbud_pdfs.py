#!/usr/bin/env python3
"""Generate real PDF files for the SBUD budget-summary fixtures.

Reads the committed ground-truth text at fixtures/legiscan/sbud/<year>.txt
and writes standard PDF-1.4 files to fixtures/legiscan/sbud_pdf/<year>.pdf
using only the Python stdlib (zlib): Helvetica/WinAnsi, FlateDecode
content streams, a correct xref table, pages broken every PAGE_LINES
lines.

The generator deliberately varies the text-showing spelling per line so
the Scala extractor (graft.sources.PdfText) is exercised across the
real operator surface, not one happy path:
  - plain `(line) Tj` + `T*` line advance
  - `TJ` arrays with kern numbers between string pieces
  - the `'` (move-next-line-and-show) operator
  - `0 -12 Td` relative moves instead of `T*`
  - hex-string `<...>` segments
All spellings reproduce the source line byte-for-byte on extraction —
PdfTextSpec asserts extract(pdf) == txt for every fixture.
"""
import glob
import os
import zlib

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "legiscan")
PAGE_LINES = 6  # force every fixture to span >= 2 pages


def esc(s: str) -> bytes:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)").encode("latin-1")


def line_ops(i: int, line: str, first_on_page: bool) -> bytes:
    """One line of text, spelling chosen by line index (deterministic)."""
    style = i % 5
    out = b""
    if first_on_page:
        # first line of a page: position set by the enclosing BT block
        return b"(" + esc(line) + b") Tj\n"
    if style == 0:
        out += b"T*\n(" + esc(line) + b") Tj\n"
    elif style == 1:
        # TJ array: split at the first space, keep the space in the piece
        cut = line.find(" ")
        if cut < 0:
            out += b"T*\n[(" + esc(line) + b")] TJ\n"
        else:
            a, b = line[: cut + 1], line[cut + 1:]
            out += b"T*\n[(" + esc(a) + b") -12 (" + esc(b) + b")] TJ\n"
    elif style == 2:
        out += b"(" + esc(line) + b") '\n"
    elif style == 3:
        out += b"0 -12 Td\n(" + esc(line) + b") Tj\n"
    else:
        # hex string for the first 4 chars, literal for the rest
        head, tail = line[:4], line[4:]
        out += (b"T*\n[<" + head.encode("latin-1").hex().encode("ascii")
                + b"> (" + esc(tail) + b")] TJ\n")
    return out


def page_stream(lines, start_idx):
    body = b"BT\n/F1 10 Tf\n12 TL\n72 720 Td\n"
    for j, line in enumerate(lines):
        body += line_ops(start_idx + j, line, first_on_page=(j == 0))
    body += b"ET\n"
    return zlib.compress(body)


def build_pdf(text: str) -> bytes:
    lines = text.split("\n")
    pages = [lines[i:i + PAGE_LINES] for i in range(0, len(lines), PAGE_LINES)]
    # object layout: 1 catalog, 2 pages-root, 3 font, then per page
    # (page obj, content obj)
    objs = {}
    page_ids = []
    next_id = 4
    for pi, pl in enumerate(pages):
        pid, cid = next_id, next_id + 1
        next_id += 2
        page_ids.append(pid)
        stream = page_stream(pl, pi * PAGE_LINES)
        objs[pid] = (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     b"/Resources << /Font << /F1 3 0 R >> >> /Contents "
                     + str(cid).encode() + b" 0 R >>")
        objs[cid] = (b"<< /Length " + str(len(stream)).encode()
                     + b" /Filter /FlateDecode >>\nstream\n" + stream
                     + b"\nendstream")
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids ["
               + b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
               + b"] /Count " + str(len(page_ids)).encode() + b" >>")
    objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
               b"/Encoding /WinAnsiEncoding >>")

    out = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += str(oid).encode() + b" 0 obj\n" + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    n = len(objs) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for oid in sorted(objs):
        out += ("%010d 00000 n \n" % offsets[oid]).encode()
    out += (b"trailer\n<< /Size " + str(n).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return out


def main():
    outdir = os.path.join(ROOT, "sbud_pdf")
    os.makedirs(outdir, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(ROOT, "sbud", "*.txt"))):
        year = os.path.basename(f)[:-4]
        text = open(f, encoding="latin-1").read()
        pdf = build_pdf(text)
        dest = os.path.join(outdir, year + ".pdf")
        with open(dest, "wb") as o:
            o.write(pdf)
        print(dest, len(pdf), "bytes")


if __name__ == "__main__":
    main()
