#!/usr/bin/env python3
"""Generate a CID/Type0 PDF fixture with a /ToUnicode CMap.

Writes fixtures/legiscan/cid_pdf/sample.pdf plus its ground-truth text
sample.txt (UTF-8). The PDF shows text as 2-byte glyph codes through an
Identity-H Type0 font; codes are deliberately NOT the Unicode values, so
extraction is only correct if the extractor resolves the embedded
/ToUnicode CMap (graft.sources.PdfText). The CMap exercises every form
the parser supports:
  - begincodespacerange <0000> <FFFF>  (2-byte codes)
  - beginbfrange offset form:   <0100> <0119> <0061>   (a..z)
  - beginbfrange list form:     <0300> <0302> [<0041> <0042> <0043>]
  - beginbfchar pairs for everything else (space, digits, punctuation,
    and non-ASCII like e-acute to prove real Unicode comes out)
Page 2 uses a plain WinAnsi Type1 font (no CMap) so the same file mixes
mapped and unmapped fonts across Tf switches.
"""
import os
import zlib

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "legiscan")

PAGE1_LINES = [
    "ABC budget summary for fiscal year",
    "appropriations résumé — section § totals",
    "the quick brown fox jumps over the lazy dog",
]
PAGE2_LINES = [
    "plain WinAnsi page: no cmap needed (F2).",
]
TEXT = "\n".join(PAGE1_LINES) + "\n" + "\n".join(PAGE2_LINES)


def build_codes():
    """char -> 2-byte glyph code, matching the CMap layout above."""
    codes = {}
    for i in range(26):                      # a..z via bfrange offset
        codes[chr(0x61 + i)] = 0x0100 + i
    for i, ch in enumerate("ABC"):           # A,B,C via bfrange list
        codes[ch] = 0x0300 + i
    nxt = 0x0200                             # everything else via bfchar
    for line in PAGE1_LINES:
        for ch in line:
            if ch not in codes:
                codes[ch] = nxt
                nxt += 1
    return codes


def cmap_stream(codes):
    bfchar = {c: k for c, k in codes.items() if 0x0200 <= k < 0x0300}
    out = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
        "2 beginbfrange",
        "<0100> <0119> <0061>",
        "<0300> <0302> [<0041> <0042> <0043>]",
        "endbfrange",
        "%d beginbfchar" % len(bfchar),
    ]
    for ch, code in sorted(bfchar.items(), key=lambda kv: kv[1]):
        out.append("<%04X> <%04X>" % (code, ord(ch)))
    out += ["endbfchar", "endcmap",
            "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(out).encode("ascii")


def hexshow(line, codes):
    return "<" + "".join("%04X" % codes[ch] for ch in line) + ">"


def page1_stream(codes):
    body = "BT\n/F1 10 Tf\n12 TL\n72 720 Td\n"
    for j, line in enumerate(PAGE1_LINES):
        if j:
            body += "T*\n"
        body += hexshow(line, codes) + " Tj\n"
    body += "ET\n"
    return zlib.compress(body.encode("ascii"))


def page2_stream():
    body = "BT\n/F2 10 Tf\n12 TL\n72 720 Td\n"
    for j, line in enumerate(PAGE2_LINES):
        if j:
            body += "T*\n"
        body += "(" + line.replace("\\", r"\\").replace("(", r"\(") \
                          .replace(")", r"\)") + ") Tj\n"
    body += "ET\n"
    return zlib.compress(body.encode("latin-1"))


def build_pdf():
    codes = build_codes()
    cmap = cmap_stream(codes)
    s1, s2 = page1_stream(codes), page2_stream()
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [8 0 R 9 0 R] /Count 2 >>",
        3: (b"<< /Type /Font /Subtype /Type0 /BaseFont /FakeCID "
            b"/Encoding /Identity-H /DescendantFonts [4 0 R] "
            b"/ToUnicode 5 0 R >>"),
        4: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FakeCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"),
        5: (b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
            + cmap + b"\nendstream"),
        6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>"),
        7: None,  # placeholder, filled below (content streams 10, 11)
        8: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R /F2 6 0 R >> >> "
            b"/Contents 10 0 R >>"),
        9: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R /F2 6 0 R >> >> "
            b"/Contents 11 0 R >>"),
        10: (b"<< /Length " + str(len(s1)).encode()
             + b" /Filter /FlateDecode >>\nstream\n" + s1 + b"\nendstream"),
        11: (b"<< /Length " + str(len(s2)).encode()
             + b" /Filter /FlateDecode >>\nstream\n" + s2 + b"\nendstream"),
    }
    del objs[7]
    out = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += str(oid).encode() + b" 0 obj\n" + objs[oid] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for oid in range(1, n):
        if oid in offsets:
            out += ("%010d 00000 n \n" % offsets[oid]).encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (b"trailer\n<< /Size " + str(n).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n")
    return out


def main():
    outdir = os.path.join(ROOT, "cid_pdf")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "sample.txt"), "w", encoding="utf-8") as o:
        o.write(TEXT)
    pdf = build_pdf()
    with open(os.path.join(outdir, "sample.pdf"), "wb") as o:
        o.write(pdf)
    print(os.path.join(outdir, "sample.pdf"), len(pdf), "bytes")


if __name__ == "__main__":
    main()
