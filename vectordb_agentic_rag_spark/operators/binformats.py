"""REAL binary media-container codecs — stdlib-only RIFF/WAVE and PNG
build + parse, extending the round-12 decode story (docformats.py
closed the reference's PDF/DOCX R1/R2 gap; this module upgrades the
image/audio side of the multimodal contract from fake-decode to a
REAL subset: actual chunk walking, actual CRC validation, actual
zlib-inflated scanlines with PNG filter reconstruction).

What is REAL here:
- WAV: a genuine RIFF container (struct-packed fmt/data chunks, an
  unknown LIST chunk the parser must SKIP by declared size, and the
  spec's odd-size pad byte) parsed by a chunk WALKER, not fixed
  offsets.
- PNG: a genuine PNG file (signature, IHDR/IDAT/IEND chunks each with
  a real CRC-32, IDAT a real zlib stream of filtered scanlines)
  decoded by verifying every chunk CRC (loud failure on corruption),
  inflating IDAT, and reconstructing rows for filter types 0 (None),
  1 (Sub) and 2 (Up) — the non-interlaced 8-bit grayscale subset.
  Paeth/Average filters and interlacing are out of scope and raise.

The operators build payloads deterministically from fixture text
(this container has no media fixtures), decode them back with the
real parsers, and emit stats computed from the DECODED bytes; the
DuckDB oracle recomputes the expected stats from the raw fixture
independently, so a value-hash match proves the container layout,
CRCs, compression, and filter reconstruction all roundtrip exactly
(the docformats.py contract, extended to audio/image containers).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# --- RIFF / WAVE ---------------------------------------------------------

_WAV_RATES = [8000, 16000, 44100]


def build_wav(
    data: bytes, sample_rate: int, channels: int, bits: int = 16
) -> bytes:
    """Genuine RIFF/WAVE bytes: RIFF header, a LIST chunk (parser must
    skip unknown chunks by size), the fmt chunk, and the data chunk
    with the spec's pad byte when the payload length is odd."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    chunks = b""
    skip_me = b"INFOsoftware-tag"
    chunks += b"LIST" + struct.pack("<I", len(skip_me)) + skip_me
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def parse_wav(payload: bytes) -> dict:
    """REAL RIFF chunk walker: validates the RIFF/WAVE magic, steps
    chunk to chunk by each declared size (honoring the odd-size pad
    byte), reads the fmt fields with struct, and sizes the data chunk.
    Raises loudly on malformed containers — never silent wrong data."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data_len = None
    end = 8 + struct.unpack("<I", payload[4:8])[0]
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size} bytes, "
                f"{len(body)} present"
            )
        if cid == b"fmt ":
            (audio_fmt, channels, rate, byte_rate, block, bits) = (
                struct.unpack("<HHIIHH", body[:16])
            )
            fmt = {
                "audio_fmt": audio_fmt,
                "channels": channels,
                "sample_rate": rate,
                "byte_rate": byte_rate,
                "block_align": block,
                "bits": bits,
            }
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size % 2)
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    fmt["n_frames"] = data_len // fmt["block_align"]
    return fmt


@query(
    "multimodal_wav_riff_parse",
    oracle=f"""
    SELECT doc_id,
           CAST({_WAV_RATES}[CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
             AS sample_rate,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST({_WAV_RATES}[CAST(doc_id % 3 AS INT) + 1]
                * (1 + doc_id % 2) * 2 AS BIGINT) AS byte_rate,
           CAST(octet_length(encode(text))
                // ((1 + doc_id % 2) * 2) AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) // ((1 + doc_id % 2) * 2)
                * 1000000
                // {_WAV_RATES}[CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
             AS duration_us
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_wav_riff_parse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL WAV CONTAINER PARSE — audio-side upgrade of the multimodal
    contract (reference R1/R2 analogue: typed metadata extraction from
    an opaque binary column): each doc's text bytes become the PCM
    payload of a GENUINE RIFF/WAVE file (build_wav: struct-packed
    chunks, an unknown LIST chunk, odd-size padding) with a
    doc-derived sample rate (8k/16k/44.1k by doc_id%3) and channel
    count (1+doc_id%2, 16-bit); parse_wav then walks the chunks for
    real and the op emits the PARSED fmt fields plus frame count and
    integer-exact duration. The oracle recomputes every column from
    doc_id/text arithmetic alone — a hash match proves the container
    layout and the walker agree byte-for-byte.

    Parity: all columns are exact integers (duration in µs via
    integer div, never float seconds).

    Shape at 100 TB: one mapInPandas over the documents scan, no
    shuffle; production drops the builder and points parse_wav at a
    real binary column (the parser already skips vendor chunks)."""
    import pandas as pd

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "sample_rate": [],
                "channels": [],
                "byte_rate": [],
                "n_frames": [],
                "duration_us": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rate = _WAV_RATES[int(doc_id) % 3]
                ch = 1 + int(doc_id) % 2
                wav = build_wav(text.encode("utf-8"), rate, ch)
                meta = parse_wav(wav)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(meta["sample_rate"])
                rows["channels"].append(meta["channels"])
                rows["byte_rate"].append(meta["byte_rate"])
                rows["n_frames"].append(meta["n_frames"])
                rows["duration_us"].append(
                    meta["n_frames"] * 1_000_000 // meta["sample_rate"]
                )
            yield pd.DataFrame(rows)

    return d.mapInPandas(
        run,
        "doc_id bigint, sample_rate bigint, channels bigint, "
        "byte_rate bigint, n_frames bigint, duration_us bigint",
    ).orderBy("doc_id")


# --- PNG -----------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_W = 16
_PNG_MAX_BYTES = 256


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def build_png_gray8(pixels: bytes, width: int) -> bytes:
    """Genuine non-interlaced 8-bit grayscale PNG: IHDR + one zlib
    IDAT of filter-0 scanlines + IEND, every chunk with its real
    CRC-32. The last row is zero-padded to the full width."""
    height = -(-len(pixels) // width) if pixels else 1
    padded = pixels + b"\x00" * (width * height - len(pixels))
    raw = b"".join(
        b"\x00" + padded[r * width : (r + 1) * width]
        for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray8(payload: bytes) -> tuple[int, int, bytes]:
    """REAL (subset) PNG decode, stdlib-only: verify the signature,
    walk chunks VERIFYING EVERY CRC-32 (corruption raises — never
    silent wrong pixels), parse IHDR, inflate the concatenated IDAT
    zlib stream, and reconstruct scanlines for filter types 0 (None),
    1 (Sub) and 2 (Up). Returns (width, height, pixel bytes).
    Subset limits (documented, enforced loudly): non-interlaced 8-bit
    grayscale; Average/Paeth filters raise NotImplementedError."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    idat = b""
    while pos + 8 <= len(payload):
        size = struct.unpack(">I", payload[pos : pos + 4])[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        crc = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bitd, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if (bitd, color, interlace) != (8, 0, 0):
                raise NotImplementedError(
                    "decoder subset: non-interlaced 8-bit grayscale"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    raw = zlib.decompress(idat)
    stride = width + 1
    prev = bytearray(width)
    out = bytearray()
    for r in range(height):
        row = bytearray(raw[r * stride + 1 : (r + 1) * stride])
        ftype = raw[r * stride]
        if ftype == 1:  # Sub: add left neighbor
            for i in range(1, width):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ftype == 2:  # Up: add the pixel above
            for i in range(width):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"PNG filter {ftype} unsupported")
        out += row
        prev = row
    return width, height, bytes(out)


@query(
    "multimodal_png_decode_stats",
    oracle=f"""
    WITH px AS (
      SELECT doc_id,
             substring(text, 1, {_PNG_MAX_BYTES}) AS s,
             octet_length(encode(substring(text, 1, {_PNG_MAX_BYTES})))
               AS n
      FROM documents)
    SELECT doc_id,
           CAST({_PNG_W} AS BIGINT) AS width,
           CAST(greatest(ceil(n / {_PNG_W}.0), 1) AS BIGINT) AS height,
           CAST({_PNG_W} * greatest(ceil(n / {_PNG_W}.0), 1) AS BIGINT)
             AS n_pixels,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(s, ''),
                                 c -> CAST(ascii(c) AS BIGINT))),
                (a, b) -> a + b) AS BIGINT) AS pixel_sum,
           round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(s, ''),
                                 c -> CAST(ascii(c) AS BIGINT))),
                (a, b) -> a + b) AS DOUBLE)
                / ({_PNG_W} * greatest(ceil(n / {_PNG_W}.0), 1)), 6)
             AS pixel_mean
    FROM px
    ORDER BY doc_id
    """,
)
def multimodal_png_decode_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL PNG DECODE — the image half of the multimodal contract,
    upgraded from the documented fake-decode stub to a genuine subset
    decoder (multimodal.py:decode_image stays the PIL extension point
    for full-format coverage): the first 256 bytes of each doc become
    the pixels of a REAL 16-wide 8-bit grayscale PNG (zlib IDAT,
    per-chunk CRC-32), and decode_png_gray8 walks the chunks, VERIFIES
    every CRC, inflates the stream, reconstructs the scanlines, and
    the op emits stats computed from the DECODED pixels (dimensions,
    exact pixel sum including the zero pad, round(6) mean). The
    oracle recomputes everything from raw text — a hash match proves
    signature, chunk layout, CRCs, compression, and filter
    reconstruction are all exact. Sub/Up filter reconstruction is
    pinned by pytest (the builder emits filter 0; real encoders
    don't, so the decoder handles 0/1/2 and raises beyond).

    Parity: pixel_sum is an exact BIGINT (ASCII fixture: bytes ==
    chars); the single division is the same round(6) on both sides.

    Shape at 100 TB: one mapInPandas over the documents scan, no
    shuffle; production drops the builder and decodes a real binary
    column (CRC verification already rejects corrupt payloads
    loudly)."""
    import pandas as pd

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [],
                "width": [],
                "height": [],
                "n_pixels": [],
                "pixel_sum": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")[:_PNG_MAX_BYTES]
                png = build_png_gray8(data, _PNG_W)
                w, h, pix = decode_png_gray8(png)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["pixel_sum"].append(sum(pix))
            yield pd.DataFrame(rows)

    # pixel_mean rounds IN SPARK SQL (not Python round(), which is
    # banker's and can flip an exact half at digit 7 vs DuckDB)
    return (
        d.mapInPandas(
            run,
            "doc_id bigint, width bigint, height bigint, "
            "n_pixels bigint, pixel_sum bigint",
        )
        .withColumn(
            "pixel_mean",
            F.expr("round(CAST(pixel_sum AS DOUBLE) / n_pixels, 6)"),
        )
        .orderBy("doc_id")
    )


# --- ZIP archive ----------------------------------------------------------


def _archive_manifest_runner(parse_build, size_key: str):
    """Shared mapInPandas closure for the archive-manifest twins: build
    the container from (doc_id, text), parse it back, emit entry count
    + size + md5 of the doc.txt body read back through the container
    (factored after the round-12 review flagged the two copies)."""
    import hashlib

    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = {
                "doc_id": [],
                "n_entries": [],
                size_key: [],
                "doc_md5": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                m = parse_build(int(doc_id), text)
                rows["doc_id"].append(doc_id)
                rows["n_entries"].append(m["n_entries"])
                rows[size_key].append(m[size_key])
                rows["doc_md5"].append(
                    hashlib.md5(m["doc_text"].encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(rows)

    return run


def build_archive(doc_id: int, text: str) -> bytes:
    """Genuine multi-entry ZIP archive: the full doc (deflated), a
    JSON metadata entry (stored), and the doc's first half (deflated)
    — mixed compression methods so the parser proves it handles both.
    Deterministic timestamps for stable bytes."""
    import io
    import zipfile

    half = text[: len(text) // 2]
    meta = '{"id": %d}' % doc_id
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data, comp in (
            ("doc.txt", text, zipfile.ZIP_DEFLATED),
            ("meta.json", meta, zipfile.ZIP_STORED),
            ("half.txt", half, zipfile.ZIP_DEFLATED),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            z.writestr(zi, data)
    return buf.getvalue()


def parse_archive(payload: bytes) -> dict:
    """REAL ZIP manifest parse + content verification: read the
    central directory via stdlib zipfile, then READ every entry back
    (zipfile verifies each entry's CRC-32 on read — corruption raises,
    never silent). Returns entry count, total uncompressed size, and
    the doc.txt body."""
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        infos = z.infolist()
        total = sum(i.file_size for i in infos)
        bodies = {i.filename: z.read(i.filename) for i in infos}
    return {
        "n_entries": len(infos),
        "total_uncompressed": total,
        "doc_text": bodies["doc.txt"].decode("utf-8"),
    }


@query(
    "multimodal_zip_archive_manifest",
    oracle="""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS n_entries,
           CAST(octet_length(encode(text))
                + octet_length(encode(substring(text, 1,
                      CAST(length(text) // 2 AS INT))))
                + 8 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
             AS total_uncompressed,
           md5(text) AS doc_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_zip_archive_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL ZIP ARCHIVE MANIFEST — the archive-ingestion stage (web
    corpora and document dumps arrive as multi-file archives; the
    first pipeline step lists and CRC-verifies entries before any
    decode): each doc becomes a GENUINE 3-entry ZIP (full text
    deflated, JSON metadata stored, half-text deflated) and
    parse_archive reads the central directory AND every entry body
    back — stdlib zipfile verifies each entry's CRC-32 on read, so a
    corrupt archive raises. Emits the entry count, the total
    uncompressed payload, and the md5 of the doc.txt body READ BACK
    THROUGH the archive; the oracle recomputes all three from raw
    text ('{"id": N}' is 8 chars plus the digits of N), so the hash
    check proves the container write/read is lossless across both
    compression methods.

    Parity: ASCII fixture (bytes == chars), exact integers, shared
    md5.

    Shape at 100 TB: one mapInPandas over the documents scan, no
    shuffle; production points parse_archive at a real binary
    column of crawled archives."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    run = _archive_manifest_runner(
        lambda i, t: parse_archive(build_archive(i, t)),
        "total_uncompressed",
    )
    return d.mapInPandas(
        run,
        "doc_id bigint, n_entries bigint, total_uncompressed bigint, "
        "doc_md5 string",
    ).orderBy("doc_id")


# --- TAR (ustar) ----------------------------------------------------------


def build_tar(doc_id: int, text: str) -> bytes:
    """Genuine POSIX ustar archive with the same three logical entries
    as the ZIP twin (doc.txt / meta.json / half.txt), fixed mtime for
    byte-stable output."""
    import io
    import tarfile

    half = text[: len(text) // 2]
    meta = '{"id": %d}' % doc_id
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in (
            ("doc.txt", text),
            ("meta.json", meta),
            ("half.txt", half),
        ):
            b = data.encode("utf-8")
            ti = tarfile.TarInfo(name)
            ti.size = len(b)
            ti.mtime = 0
            t.addfile(ti, io.BytesIO(b))
    return buf.getvalue()


def parse_tar(payload: bytes) -> dict:
    """REAL ustar header walk — NOT the tarfile module: steps 512-byte
    blocks by hand, validates the 'ustar' magic and each header's
    OCTAL CHECKSUM (sum of header bytes with the checksum field
    blanked — corruption raises), parses octal size fields, and reads
    each entry's data blocks (padded to 512). Returns entry count,
    total payload size, and doc.txt's body."""
    entries = {}
    pos = 0
    while pos + 512 <= len(payload):
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        if hdr[257:262] != b"ustar":
            raise ValueError("not a ustar header")
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise ValueError("tar header checksum mismatch")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        data = payload[pos + 512 : pos + 512 + size]
        if len(data) < size:
            raise ValueError(
                f"truncated tar: entry {name!r} declares {size} bytes,"
                f" {len(data)} present"
            )
        entries[name] = data
        pos += 512 + ((size + 511) // 512) * 512
    if not entries:
        raise ValueError("empty tar archive")
    return {
        "n_entries": len(entries),
        "total_size": sum(len(v) for v in entries.values()),
        "doc_text": entries["doc.txt"].decode("utf-8"),
    }


@query(
    "multimodal_tar_archive_manifest",
    oracle="""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS n_entries,
           CAST(octet_length(encode(text))
                + octet_length(encode(substring(text, 1,
                      CAST(length(text) // 2 AS INT))))
                + 8 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
             AS total_size,
           md5(text) AS doc_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_tar_archive_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL TAR (ustar) MANIFEST — the other archive format crawl
    dumps arrive in (WARC-adjacent tooling, model checkpoints,
    dataset releases): the builder writes a genuine POSIX ustar
    archive via the stdlib, and parse_tar walks the 512-byte blocks
    BY HAND — validating the ustar magic and each header's octal
    CHECKSUM (corruption raises), parsing octal size fields, stepping
    data blocks with 512-byte padding. Same emitted columns and
    oracle recomputation as the ZIP twin, so the two manifests are
    directly comparable and the hash check proves the hand-rolled
    header walk agrees with the stdlib writer byte-for-byte.

    Parity: ASCII fixture, exact integers, shared md5.

    Shape at 100 TB: one mapInPandas, no shuffle; the parser reads
    headers + referenced blocks only."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    run = _archive_manifest_runner(
        lambda i, t: parse_tar(build_tar(i, t)), "total_size"
    )
    return d.mapInPandas(
        run,
        "doc_id bigint, n_entries bigint, total_size bigint, "
        "doc_md5 string",
    ).orderBy("doc_id")
