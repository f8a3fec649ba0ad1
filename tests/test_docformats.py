"""Pytests for the REAL stdlib DOCX/PDF text decoders (round 12 —
the R1/R2 decode-gap closers). Golden-bytes and adversarial-input
checks, independent of both engines."""

import zlib

from vectordb_agentic_rag_spark.operators.docformats import (
    build_docx,
    build_pdf,
    decode_docx_text,
    decode_pdf_text,
)


def test_docx_roundtrip_with_xml_specials():
    paras = ["hello world", "a <b> & 'c' \"d\"", "", "tail"]
    assert decode_docx_text(build_docx(paras)) == "\n".join(paras)


def test_docx_is_a_real_zip_with_ooxml():
    import io
    import zipfile

    payload = build_docx(["one", "two"])
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        names = set(z.namelist())
    assert "word/document.xml" in names
    assert "[Content_Types].xml" in names


def test_pdf_roundtrip_with_escapes():
    lines = ["plain line", "with (parens) and \\backslash\\", "", "end)"]
    assert decode_pdf_text(build_pdf(lines)) == "\n".join(lines)


def test_pdf_stream_ending_in_carriage_return_not_truncated():
    """Regression: a FlateDecode body whose LAST byte is 0x0D must not
    lose it to the \\r?\\n-before-endstream delimiter — the decoder
    reads the dict's /Length instead (hit on 2/500 fixture docs)."""
    found = None
    for salt in range(2000):
        lines = [f"padding words {salt} " + "x" * (salt % 37)]
        pdf = build_pdf(lines)
        i = pdf.find(b"stream\n") + 7
        j = pdf.find(b"\nendstream")
        if pdf[j - 1 : j] == b"\r":
            found = (lines, pdf)
            break
    assert found is not None, "no salt produced a 0x0D-final stream"
    lines, pdf = found
    assert decode_pdf_text(pdf) == "\n".join(lines)


def test_pdf_octal_and_tj_array_forms():
    raw = (
        b"%PDF-1.4\n4 0 obj << >>\nstream\n"
        b"BT (\\110\\151) Tj ET\nendstream\nendobj"
    )
    assert decode_pdf_text(raw) == "Hi"
    raw2 = b"<< >>\nstream\nBT [(ab) -120 (cd)] TJ ET\nendstream"
    assert decode_pdf_text(raw2) == "abcd"


def test_pdf_honors_length_over_delimiter():
    """An uncompressed stream whose DATA contains the bytes
    'endstream' must still decode fully when /Length is direct."""
    data = b"BT (before) Tj ET endstream BT (after) Tj ET"
    raw = (
        b"<< /Length " + str(len(data)).encode() + b" >>\nstream\n"
        + data + b"\nendstream"
    )
    assert decode_pdf_text(raw) == "before\nafter"


def test_pdf_flate_stream_genuinely_compressed():
    """The builder's content stream must be REAL zlib data (inflating
    it yields the Tj program) — guards against the builder silently
    degrading to plaintext."""
    pdf = build_pdf(["abc def"])
    i = pdf.find(b"stream\n") + 7
    j = pdf.find(b"\nendstream", i)
    body = pdf[i:j]
    # exact /Length slice may differ from delimiter slice by the \r
    # regression case; inflate whichever parses
    for cand in (body, body + b"\r", body[:-1]):
        try:
            inflated = zlib.decompress(cand)
            break
        except zlib.error:
            continue
    else:
        raise AssertionError("content stream is not valid zlib data")
    assert b"(abc def) Tj" in inflated


def test_pdf_indirect_length_with_multidigit_objnum_falls_back():
    """Regression (round-12 review): '/Length 40 0 R' must NOT
    backtrack to a bogus direct length of 4 — the parser falls back
    to the delimiter scan and still decodes the text."""
    data = b"BT (indirect) Tj ET"
    raw = (
        b"<< /Length 40 0 R >>\nstream\n" + data + b"\nendstream"
    )
    assert decode_pdf_text(raw) == "indirect"


def test_pdf_backslash_eight_and_nine_pass_through():
    """Regression (round-12 review): per the PDF spec, a backslash
    before a non-special character is dropped and the character kept
    — '\\8' must decode to '8', never raise."""
    raw = b"<< >>\nstream\nBT (a\\8b\\9c) Tj ET\nendstream"
    assert decode_pdf_text(raw) == "a8b9c"


def test_pdf_hex_string_tj_and_mixed_tj_array():
    """Round 13: hex-string show operators joined the supported
    subset — standalone ``<hex> Tj``, odd-digit zero padding, and hex
    elements inside a TJ array between kerning numbers."""
    raw = (
        b"<< >>\nstream\nBT <48656C6C6F> Tj ET\nendstream"
    )
    assert decode_pdf_text(raw) == "Hello"
    # whitespace inside the hex string + odd final digit pads with 0
    raw2 = b"<< >>\nstream\nBT <48 65 6C 6C 7> Tj ET\nendstream"
    assert decode_pdf_text(raw2) == "Hellp"
    raw3 = (
        b"<< >>\nstream\nBT [(ab) -120 <6364> 55 (ef)] TJ ET\n"
        b"endstream"
    )
    assert decode_pdf_text(raw3) == "abcdef"


def test_pdf_builder_rotates_all_three_show_forms():
    """build_pdf emits literal Tj, hex Tj, and a mixed TJ array across
    any >=4-line doc, and the decoder roundtrips all of them."""
    lines = [f"line {i} words here" for i in range(7)]
    pdf = build_pdf(lines)
    content = zlib.decompress(
        pdf[pdf.find(b"stream\n") + 7 : pdf.find(b"\nendstream")]
    )
    assert b"> Tj" in content  # hex Tj present
    assert b"] TJ" in content  # mixed TJ array present
    assert b") Tj" in content  # literal Tj present
    assert decode_pdf_text(pdf) == "\n".join(lines)


def test_pdf_oversized_length_falls_back_to_delimiter_scan():
    """ADVICE r12: a corrupt /Length larger than the remaining payload
    must not yield a silently truncated stream — the decoder falls
    back to the endstream delimiter scan."""
    raw = (
        b"<< /Length 99999 >>\nstream\nBT (ok) Tj ET\nendstream"
    )
    assert decode_pdf_text(raw) == "ok"
