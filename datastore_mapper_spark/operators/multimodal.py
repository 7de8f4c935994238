"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schema contracts,
batch iteration, partition-preserving transforms.  The codec layer is
split (round-6 VERDICT task 4): UNCOMPRESSED raster formats — 24-bpp
Windows BMP and binary PPM (P6) — decode for REAL in pure
numpy/struct (:func:`decode_bmp24`, :func:`decode_ppm`), pixels and
all; compressed codecs (JPEG/PNG/audio/video) still require libraries
not present in this container, so :func:`decode_image_meta` raises
``NotImplementedError`` for those magics unless ``fake=True``, in
which case a deterministic arithmetic 'decoder' stands in (the
oracle-checkable path used by
``queries/llm_extra.multimodal_meta_extract``; the REAL path's
oracle-checked query is ``multimodal_bmp_decode_stats``).

At 100 TB: binaries stay columnar (parquet BYTE_ARRAY) next to their
metadata; decode/resize/frame-sample run as mapInPandas over
size-bounded batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
tuned so batch_bytes ≈ rows x avg_blob fits executor memory), and
outputs write back partitioned — never collected.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a codec: dimensions derived from the
    byte stream (reproducible in SQL for the oracle)."""
    width = len(blob) % 640
    height = (blob[0] if blob else 0) % 480
    return width, height


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bpp bottom-up
    uncompressed Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER).
    Pure struct/numpy — exists so fixtures, tests and the
    ``multimodal_bmp_decode_stats`` contract query exercise the REAL
    decode path end-to-end without any image library."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row_size * h
    data_offset = 14 + 40
    file_header = struct.pack(
        "<2sIHHI", b"BM", data_offset + img_size, 0, 0, data_offset
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # RGB -> BGR channel order, bottom row stored first
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return file_header + info_header + rows.tobytes()


def decode_bmp24(blob: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a 24-bpp uncompressed BMP ->
    ``(width, height, (h, w, 3) RGB uint8 array)``.

    Handles row padding to 4-byte boundaries, BGR channel order, and
    both bottom-up (positive height) and top-down (negative height)
    pixel layouts.  Compressed or non-24-bpp BMPs raise."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP decodes in-container "
            f"(got bpp={bpp}, compression={compression})"
        )
    h = abs(h_raw)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        blob, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    rgb = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if h_raw > 0:
        rgb = rgb[::-1]  # bottom-up storage -> top-down array
    return w, h, np.ascontiguousarray(rgb)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def decode_ppm(blob: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a binary PPM (P6) ->
    ``(width, height, (h, w, 3) RGB uint8 array)``; handles whitespace
    and ``#`` comment lines in the header per the netpbm spec."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM blob")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 (1 byte/sample) PPM")
    rgb = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, rgb.reshape(h, w, 3)


def _lzw_encode_gif(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW compression of an index stream (variable-width
    codes, LSB-first bit packing, clear/EOI, table reset at 4096, NO
    early width change — the encoder bumps the code width one code
    LATER than the decoder's table does, per the GIF89a appendix)."""
    m = min_code_size
    clear, eoi = 1 << m, (1 << m) + 1

    def fresh():
        return {(i,): i for i in range(1 << m)}, clear + 2, m + 1

    table, nxt, width = fresh()
    acc = bitpos = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, bitpos
        acc |= code << bitpos
        bitpos += w
        while bitpos >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitpos -= 8

    emit(clear, width)
    if indices.size == 0:
        # zero-pixel stream: a legal (if degenerate) LZW body is just
        # clear + end-of-information
        emit(eoi, width)
        if bitpos:
            out.append(acc & 0xFF)
        blocks = bytearray()
        for i in range(0, len(out), 255):
            chunk = out[i : i + 255]
            blocks.append(len(chunk))
            blocks.extend(chunk)
        blocks.append(0)
        return bytes(blocks)
    cur = (int(indices[0]),)
    for px in indices[1:]:
        cand = cur + (int(px),)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table, nxt, width = fresh()
        cur = (int(px),)
    emit(table[cur], width)
    emit(eoi, width)
    if bitpos:
        out.append(acc & 0xFF)
    # split into <=255-byte data sub-blocks, 0x00-terminated
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return bytes(blocks)


def _lzw_decode_gif(data: bytes, min_code_size: int,
                    n_pixels: int) -> np.ndarray:
    """GIF-variant LZW decompression (inverse of :func:`_lzw_encode_gif`,
    including the KwKwK ``code == next`` case and deferred-clear
    behavior when the table is full)."""
    m = min_code_size
    clear, eoi = 1 << m, (1 << m) + 1

    def fresh():
        return {i: (i,) for i in range(1 << m)}, clear + 2, m + 1

    table, nxt, width = fresh()
    out: list[int] = []
    prev: int | None = None
    acc = bits = pos = 0
    while len(out) < n_pixels:
        while bits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table, nxt, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError(f"corrupt LZW code {code} (next={nxt})")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = table[prev] + (entry[0],)
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code
    return np.array(out[:n_pixels], dtype=np.uint8)


def encode_gif87a(index_pixels: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` uint8 palette-index array + ``(p, 3)`` RGB
    palette as a single-image non-interlaced GIF87a — REAL LZW
    entropy coding, the first compressed format on the in-container
    codec path (round-9 VERDICT task 6).  ``p`` must be a power of
    two in [2, 256]."""
    h, w = index_pixels.shape
    p = len(palette)
    n = max(1, (p - 1).bit_length())  # table size = 2^n entries
    if p != (1 << n):
        raise ValueError(f"palette size {p} not a power of two")
    header = b"GIF87a"
    # logical screen descriptor: global color table, n-1 size field
    screen = struct.pack("<HHBBB", w, h, 0x80 | ((n - 1) & 7), 0, 0)
    gct = palette.astype(np.uint8).tobytes()
    image = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    mcs = max(2, n)  # LZW minimum code size is 2 per spec
    body = bytes([mcs]) + _lzw_encode_gif(index_pixels.reshape(-1), mcs)
    return header + screen + gct + image + body + b"\x3B"


def decode_gif87a(blob: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a single-image non-interlaced GIF87a/89a ->
    ``(width, height, (h, w, 3) RGB uint8 array)``: logical screen +
    global color table parse, extension-block skip, image descriptor,
    LZW decompression, palette mapping.  Interlaced images and local
    color tables raise (the encoder above never emits them)."""
    if blob[:4] != b"GIF8" or blob[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF blob")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        p = 2 << (packed & 7)
        palette = np.frombuffer(
            blob, dtype=np.uint8, count=3 * p, offset=pos
        ).reshape(p, 3)
        pos += 3 * p
    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if marker == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image block")
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if ipacked & 0x80:
            raise NotImplementedError("local color table not supported")
        if palette is None:
            raise ValueError("GIF image without a color table")
        mcs = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data.extend(blob[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _lzw_decode_gif(bytes(data), mcs, w * h)
        rgb = palette[idx].reshape(h, w, 3)
        return w, h, np.ascontiguousarray(rgb)
    raise ValueError("truncated GIF")


def encode_gif89a_animated(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int],
) -> bytes:
    """Encode same-sized ``(h, w)`` uint8 index frames + one global
    RGB palette as an ANIMATED GIF89a (round-11 VERDICT task 8): the
    NETSCAPE2.0 looping application extension, then per frame a
    Graphic Control Extension (disposal=none, delay in centiseconds)
    followed by a full-logical-screen image descriptor and REAL LZW
    data — the multi-frame grammar every animated GIF on the web
    uses, emitted by the same LZW core as :func:`encode_gif87a`."""
    if not frames or len(frames) != len(delays_cs):
        raise ValueError("frames and delays_cs must be same-length, >=1")
    h, w = frames[0].shape
    p = len(palette)
    n = max(1, (p - 1).bit_length())
    if p != (1 << n):
        raise ValueError(f"palette size {p} not a power of two")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((n - 1) & 7), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    # NETSCAPE2.0 app extension: loop forever (count 0)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, n)
    for fr, delay in zip(frames, delays_cs):
        if fr.shape != (h, w):
            raise ValueError("all frames must share the logical screen")
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x00,
                           int(delay) & 0xFFFF, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out += bytes([mcs]) + _lzw_encode_gif(fr.reshape(-1), mcs)
    out += b"\x3B"
    return bytes(out)


def decode_gif_frames(
    blob: bytes,
) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """REAL decode of a (possibly animated) GIF87a/89a ->
    ``(width, height, [(delay_cs, (h, w, 3) RGB uint8), ...])``:
    walks the full block grammar — logical screen, global color
    table, application/comment extensions (skipped), each frame's
    Graphic Control Extension (delay captured) + image descriptor +
    LZW data — until the trailer.  Frames using disposal modes other
    than none/keep, interlacing, local color tables, or sub-screen
    placement raise (the encoder above never emits them); a
    single-image GIF returns one frame with delay 0."""
    if blob[:4] != b"GIF8" or blob[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF blob")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        p = 2 << (packed & 7)
        palette = np.frombuffer(
            blob, dtype=np.uint8, count=3 * p, offset=pos
        ).reshape(p, 3)
        pos += 3 * p
    frames: list[tuple[int, np.ndarray]] = []
    delay = 0
    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF contains no image block")
            return sw, sh, frames
        if marker == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = blob[pos]
                if size != 4:
                    raise ValueError("bad GCE block size")
                gpacked, delay, _transp = struct.unpack_from(
                    "<BHB", blob, pos + 1)
                if (gpacked >> 2) & 7 not in (0, 1):
                    raise NotImplementedError(
                        "GIF disposal modes beyond none/keep not "
                        "supported")
                pos += 1 + size
                if blob[pos]:
                    raise ValueError("unterminated GCE")
                pos += 1
            else:  # app/comment/plain-text: skip sub-blocks
                while blob[pos]:
                    pos += 1 + blob[pos]
                pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        if (left, top, w, h) != (0, 0, sw, sh):
            raise NotImplementedError(
                "sub-screen frame placement not supported")
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if ipacked & 0x80:
            raise NotImplementedError("local color table not supported")
        if palette is None:
            raise ValueError("GIF image without a color table")
        mcs = blob[pos]
        pos += 1
        data = bytearray()
        while blob[pos]:
            ln = blob[pos]
            data.extend(blob[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # data terminator
        idx = _lzw_decode_gif(bytes(data), mcs, w * h)
        frames.append(
            (int(delay), np.ascontiguousarray(palette[idx].reshape(h, w, 3))))
        delay = 0  # a GCE applies to exactly one following image
    raise ValueError("truncated GIF")


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png_rgb8(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an 8-bit truecolor
    non-interlaced PNG — REAL DEFLATE entropy coding via the stdlib
    ``zlib`` (no image library), one scanline filter byte per row.
    ``filter_type`` 0 (None) or 2 (Up) — 2 exercises the unfilter path
    with actual reconstruction arithmetic."""
    import struct as _s
    import zlib

    h, w, _ = pixels.shape
    if filter_type == 0:
        raw = b"".join(
            b"\x00" + pixels[y].tobytes() for y in range(h)
        )
    elif filter_type == 2:  # Up: delta vs the row above (row 0 vs zeros)
        prev = np.zeros((w, 3), dtype=np.uint8)
        rows = []
        for y in range(h):
            rows.append(b"\x02" + ((pixels[y] - prev) & 0xFF)
                        .astype(np.uint8).tobytes())
            prev = pixels[y]
        raw = b"".join(rows)
    else:
        raise NotImplementedError(f"filter {filter_type} not emitted")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (_s.pack(">I", len(body)) + tag + body
                + _s.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (_PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def decode_png_rgb8(blob: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of an 8-bit truecolor non-interlaced PNG ->
    ``(width, height, (h, w, 3) RGB uint8)``: chunk walk with CRC
    verification, stdlib-zlib INFLATE of the concatenated IDAT stream,
    and full scanline UNFILTERING — all five PNG filter types (None,
    Sub, Up, Average, Paeth) reconstructed per the spec.  Palette,
    alpha, 16-bit and interlaced variants raise loudly."""
    import struct as _s
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    pos, idat, meta = 8, [], None
    while pos < len(blob):
        (ln,) = _s.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + ln]
        (crc,) = _s.unpack_from(">I", blob, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            meta = _s.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = meta
    if (bit_depth, color_type, interlace) != (8, 2, 0):
        raise NotImplementedError(
            f"only 8-bit truecolor non-interlaced PNG decodes "
            f"in-container (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    out, _end = _png_unfilter(raw, 0, w, h)
    return w, h, out.reshape(h, w, 3)


def _png_unfilter(raw: bytes, offset: int, w: int, h: int
                  ) -> tuple["np.ndarray", int]:
    """Unfilter ``h`` scanlines of ``w`` RGB pixels starting at
    ``offset`` in the inflated stream (all five PNG filter types) ->
    ``((h, w*3) uint8, next_offset)``.  Shared by the sequential
    decode path and the per-pass Adam7 path — per spec a pass's first
    scanline filters against zeros, exactly like row 0 of a
    non-interlaced image, so the same kernel serves both."""
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[offset]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=offset + 1,
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0  # left, same channel
                b = prev[i]
                if ftype == 1:
                    rec = line[i] + a
                elif ftype == 3:
                    rec = line[i] + (a + b) // 2
                else:
                    c = prev[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                    rec = line[i] + pred
                cur[i] = rec & 0xFF
        else:
            raise ValueError(f"PNG filter {ftype} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
        offset += stride + 1
    return out, offset


#: Adam7 pass grid: (x0, y0, dx, dy) per pass, and the block each
#: decoded sample FILLS in the progressive preview (block_w, block_h).
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]
_ADAM7_BLOCK = [(8, 8), (4, 8), (4, 4), (2, 4), (2, 2), (1, 2), (1, 1)]


def encode_png_rgb8_adam7(pixels: np.ndarray,
                          filter_type: int = 0) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as an 8-bit truecolor
    ADAM7-INTERLACED PNG (IHDR interlace=1): the image is serialized
    as SEVEN sub-images on the Adam7 grid, each pass filtered
    independently (``filter_type`` 0=None or 2=Up, where a pass's
    first scanline deltas against zeros per spec), all passes
    concatenated into ONE zlib stream.  Empty passes (a dimension of
    the pass grid exceeding the image) emit nothing, per spec."""
    import struct as _s
    import zlib

    h, w, _ = pixels.shape
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = pixels[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if filter_type == 0:
            parts.extend(b"\x00" + sub[r].tobytes() for r in range(ph))
        elif filter_type == 2:
            prev = np.zeros((pw, 3), dtype=np.uint8)
            for r in range(ph):
                parts.append(b"\x02" + ((sub[r] - prev) & 0xFF)
                             .astype(np.uint8).tobytes())
                prev = sub[r]
        else:
            raise NotImplementedError(f"filter {filter_type} not emitted")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (_s.pack(">I", len(body)) + tag + body
                + _s.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    return (_PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
            + chunk(b"IEND", b""))


def decode_png_adam7_passes(blob: bytes) -> tuple[
        int, int, "np.ndarray", list]:
    """REAL decode of an Adam7-interlaced PNG -> ``(w, h, final
    (h, w, 3) RGB, previews)`` where ``previews[k]`` is the
    progressive DISPLAY state after passes 0..k (each decoded sample
    block-filled over its Adam7 coverage rectangle — what a browser
    paints mid-download).  Chunk walk + CRC + inflate + per-pass
    five-filter unfiltering; the pass geometry, scatter, and preview
    fill are all derived from the spec grid in ``_ADAM7``."""
    import struct as _s
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG blob")
    pos, idat, meta = 8, [], None
    while pos < len(blob):
        (ln,) = _s.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + ln]
        (crc,) = _s.unpack_from(">I", blob, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            meta = _s.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = meta
    if (bit_depth, color_type, interlace) != (8, 2, 1):
        raise NotImplementedError(
            "decode_png_adam7_passes handles 8-bit truecolor "
            f"interlaced PNG only (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})")
    raw = zlib.decompress(b"".join(idat))
    final = np.zeros((h, w, 3), dtype=np.uint8)
    preview = np.zeros((h, w, 3), dtype=np.uint8)
    previews = []
    offset = 0
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            previews.append(preview.copy())
            continue
        lines, offset = _png_unfilter(raw, offset, pw, ph)
        sub = lines.reshape(ph, pw, 3)
        final[y0::dy, x0::dx] = sub
        bw, bh = _ADAM7_BLOCK[p]
        for i in range(ph):
            ys = y0 + i * dy
            for j in range(pw):
                xs = x0 + j * dx
                preview[ys:min(ys + bh, h), xs:min(xs + bw, w)] = sub[i, j]
        previews.append(preview.copy())
    if offset != len(raw):
        raise ValueError("trailing bytes after the last Adam7 pass")
    return w, h, final, previews


def decode_image(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff the magic and REAL-decode a raster blob."""
    if blob[:2] == b"BM":
        return decode_bmp24(blob)
    if blob[:2] == b"P6":
        return decode_ppm(blob)
    if blob[:4] == b"GIF8":
        return decode_gif87a(blob)
    if blob[:8] == _PNG_MAGIC:
        return decode_png_rgb8(blob)
    raise NotImplementedError(
        "only 24-bpp BMP, binary PPM, LZW GIF87a and 8-bit RGB PNG "
        "(DEFLATE via stdlib zlib) decode in this container; JPEG and "
        "video codecs need libraries — pass fake=True for the "
        "deterministic stand-in"
    )


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM WAV (RIFF)."""
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, byte_rate, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav_pcm16(blob: bytes) -> tuple[int, np.ndarray]:
    """REAL decode of a mono 16-bit PCM WAV -> ``(sample_rate,
    int16 samples)``.  Walks the RIFF chunk list (so extra chunks like
    LIST/INFO before ``data`` are handled), validates the fmt chunk,
    and refuses compressed or multi-channel audio."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt, n_ch, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            if fmt != 1 or n_ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"only mono 16-bit PCM WAV decodes in-container "
                    f"(got fmt={fmt}, channels={n_ch}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(blob, dtype="<i2", count=size // 2,
                                    offset=body)
        pos = body + size + (size & 1)  # chunks pad to even offsets
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
    return sample_rate, samples


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 YUV444 array as YUV4MPEG2
    (y4m): one plain-text stream header, then ``FRAME\\n`` + raw
    planar Y/U/V bytes per frame — the uncompressed video container
    mpeg tooling exchanges."""
    n, h, w, _ = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()]
    for f in range(n):
        out.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        out.append(np.ascontiguousarray(frames[f].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(blob: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a YUV4MPEG2 (C444) stream ->
    ``(width, height, (n_frames, h, w, 3) YUV uint8 array)``.

    Parses the parameter-tagged stream header, then walks FRAME
    markers (each may carry its own parameters up to the newline) and
    slices the fixed-size planar payloads.  Subsampled colorspaces
    (C420 etc.) raise — their plane geometry differs."""
    nl = blob.index(b"\n")
    header = blob[:nl].decode("ascii", "strict").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 blob")
    params = {p[0]: p[1:] for p in header[1:] if p}
    w, h = int(params["W"]), int(params["H"])
    cspace = params.get("C", "420")
    if cspace != "444":
        raise NotImplementedError(
            f"only C444 (full-resolution planes) decodes in-container; "
            f"got C{cspace}"
        )
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(blob):
        if blob[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = blob.index(b"\n", pos) + 1  # frame params run to newline
        planar = np.frombuffer(blob, dtype=np.uint8, count=frame_bytes,
                               offset=pos).reshape(3, h, w)
        frames.append(planar.transpose(1, 2, 0))
        pos += frame_bytes
    return w, h, np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)


def decode_image_meta(blob: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode (width, height) from an image blob.

    BMP/PPM blobs decode for REAL (:func:`decode_image`); other
    formats require an image library not present in this container and
    raise unless ``fake=True``.
    """
    if fake:
        return _fake_decode(blob)
    w, h, _ = decode_image(blob)
    return w, h


def as_binary_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as a media table: opaque binary payload + id."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas metadata extraction over the binary column.

    Arrow-batched: each pandas batch holds ``maxRecordsPerBatch`` rows;
    the transform is partition-preserving (no shuffle).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda b: decode_image_meta(b, fake=fake))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media_df.mapInPandas(batches, MEDIA_META_SCHEMA)


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def render_bmp_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL 24-bpp BMP per document, deterministically from
    ``doc_id`` alone: width ``(id % 13) + 2``, height ``(id % 7) + 2``,
    pixel ``(x, y)`` channels ``R = (id % 200) + x``,
    ``G = (id % 200) + y``, ``B = id % 200`` (all < 256 by
    construction).  The closed-form pixel law is what lets a SQL
    oracle predict the decoded channel means exactly — see
    ``multimodal_bmp_decode_stats``.

    ASSUMES doc_id >= 0 (all render_*_media laws do, round-7 ADVICE):
    Python/numpy ``%`` is always nonnegative while DuckDB ``%`` takes
    the dividend's sign, so a negative id would silently diverge from
    the oracle.  The fixture generator only emits nonnegative ids; a
    future fixture with negative ids must shift them or switch both
    sides to pmod semantics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 13) + 2
                h = int(doc_id % 7) + 2
                base = int(doc_id % 200)
                x = np.arange(w, dtype=np.uint8)
                y = np.arange(h, dtype=np.uint8)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = base + x[None, :]
                px[:, :, 1] = base + y[:, None]
                px[:, :, 2] = base
                blobs.append(encode_bmp24(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def render_gif_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL LZW-compressed GIF87a per document,
    deterministically from ``doc_id`` alone: width ``(id % 11) + 2``,
    height ``(id % 5) + 2``, a 4-color global palette with
    ``palette[i] = (base + 17i, base + 5i, base + i)`` for
    ``base = id % 200`` (max channel 200+51 < 256), and pixel index
    ``x % 4`` — columns cycle through the palette, which makes the
    LZW stream non-trivial (runs + repeats) while the decoded channel
    means stay a closed form of ``doc_id`` a SQL oracle states exactly
    (``multimodal_gif_decode_stats``).  ASSUMES doc_id >= 0 like every
    render_*_media law (round-7 ADVICE: Python % vs DuckDB % sign)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 11) + 2
                h = int(doc_id % 5) + 2
                base = int(doc_id % 200)
                pal = np.array(
                    [(base + 17 * i, base + 5 * i, base + i)
                     for i in range(4)],
                    dtype=np.uint8,
                )
                idx = np.tile(
                    (np.arange(w, dtype=np.uint8) % 4), (h, 1)
                )
                blobs.append(encode_gif87a(idx, pal))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def render_gif_anim_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL multi-frame animated GIF89a per document,
    deterministically from ``doc_id`` alone: ``n = (id % 3) + 2``
    frames of width ``(id % 7) + 2`` x height ``(id % 4) + 2``, the
    same 4-color palette law as :func:`render_gif_media`
    (``palette[i] = (base + 17i, base + 5i, base + i)``,
    ``base = id % 200``), frame ``f`` filled with the CONSTANT index
    ``(id + f) % 4`` (so each decoded frame's mean RGB is exactly one
    palette entry), and per-frame delay ``3 + (id + f) % 7``
    centiseconds.  Constant frames keep the closed form trivial while
    the LZW stream still exercises run compression; the multi-frame
    grammar (NETSCAPE loop ext, per-frame GCE + descriptor + data) is
    what this law exists to grade.  ASSUMES doc_id >= 0."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = (i % 7) + 2, (i % 4) + 2
                base = i % 200
                pal = np.array(
                    [(base + 17 * k, base + 5 * k, base + k)
                     for k in range(4)],
                    dtype=np.uint8,
                )
                nf = (i % 3) + 2
                frames = [
                    np.full((h, w), (i + f) % 4, dtype=np.uint8)
                    for f in range(nf)
                ]
                delays = [3 + (i + f) % 7 for f in range(nf)]
                blobs.append(encode_gif89a_animated(frames, pal, delays))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_gif_anim_stats(media_df: DataFrame) -> DataFrame:
    """Decode animated GIFs inside Arrow-batched ``mapInPandas`` and
    emit per-doc (n_frames, width, height, total_delay_cs, mean
    RGB across ALL frames' pixels).  Channel sums accumulate in int64
    with one exact division at the end (§7.3-H2-safe)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "n_frames", "width", "height",
                    "total_delay_cs", "mean_r", "mean_g", "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_gif_frames(bytes(blob))
                sums = np.zeros(3, dtype=np.int64)
                for _delay, rgb in frames:
                    sums += rgb.reshape(-1, 3).sum(
                        axis=0, dtype=np.int64)
                npx = len(frames) * w * h
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(frames))
                out["width"].append(w)
                out["height"].append(h)
                out["total_delay_cs"].append(
                    sum(d for d, _ in frames))
                out["mean_r"].append(sums[0] / npx)
                out["mean_g"].append(sums[1] / npx)
                out["mean_b"].append(sums[2] / npx)
            yield pd.DataFrame(out)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("total_delay_cs", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ])
    return media_df.mapInPandas(batches, schema)


def render_png_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL DEFLATE-compressed PNG per document,
    deterministically from ``doc_id``: width ``(id % 9) + 2``, height
    ``(id % 6) + 2``, base ``id % 150``, channels
    ``R = base + 3x + 5y``, ``G = base + 2x``, ``B = base + y`` (max
    206 < 256, so no wrap — the means stay closed-form rationals).
    Even ids use scanline filter None, odd ids filter Up, so both
    reconstruction paths run in-corpus.  ASSUMES doc_id >= 0 (see
    render_bmp_media — %-sign semantics)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 9) + 2
                h = int(doc_id % 6) + 2
                base = int(doc_id % 150)
                x = np.arange(w, dtype=np.int32)
                y = np.arange(h, dtype=np.int32)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = base + 3 * x[None, :] + 5 * y[:, None]
                px[:, :, 1] = base + 2 * x[None, :]
                px[:, :, 2] = base + y[:, None]
                blobs.append(
                    encode_png_rgb8(px, filter_type=2 if doc_id % 2 else 0)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_image_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary image column: width, height and
    per-channel means via :func:`decode_image` inside Arrow-batched
    ``mapInPandas`` — partition-preserving, no shuffle, blobs never
    leave the executor.  Channel sums accumulate in int64 and divide
    once by the exact pixel count, so the resulting doubles are the
    correctly-rounded true means — bit-reproducible against a SQL
    oracle computing the same rationals."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(blob))
                sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = w * h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(int(sums[0]) / n)
                out["mean_g"].append(int(sums[1]) / n)
                out["mean_b"].append(int(sums[2]) / n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("mean_amp", DoubleType()),
        StructField("peak_amp", IntegerType()),
    ]
)

WAV_SAMPLE_RATE = 16_000


def render_wav_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL mono 16-bit PCM WAV per document, deterministically
    from ``doc_id``: ``n = (id % 50) + 8`` samples of the ramp
    ``sample[i] = base + slope*i`` with ``base = (id % 300) - 150`` and
    ``slope = (id % 9) - 4`` (all well inside int16).  The closed-form
    ramp lets a SQL oracle predict the decoded duration, mean and peak
    amplitudes exactly — see ``multimodal_wav_decode_stats``.
    ASSUMES doc_id >= 0 (see render_bmp_media — %-sign semantics)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                n = int(doc_id % 50) + 8
                base = int(doc_id % 300) - 150
                slope = int(doc_id % 9) - 4
                samples = base + slope * np.arange(n, dtype=np.int64)
                blobs.append(
                    encode_wav_pcm16(samples.astype(np.int16), WAV_SAMPLE_RATE)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_audio_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary audio column: sample count,
    rate, duration and mean/peak amplitude via :func:`decode_wav_pcm16`
    inside Arrow-batched ``mapInPandas``.  Amplitude sums accumulate in
    int64 with one exact division (§7.3-H2-safe, like
    :func:`extract_image_stats`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_samples", "sample_rate",
                                   "duration_s", "mean_amp", "peak_amp")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                sr, samples = decode_wav_pcm16(bytes(blob))
                n = len(samples)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(sr)
                out["duration_s"].append(n / sr)
                out["mean_amp"].append(
                    int(samples.sum(dtype=np.int64)) / max(n, 1)
                )
                out["peak_amp"].append(
                    int(np.abs(samples.astype(np.int64)).max()) if n else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "duration_s": pd.Series(out["duration_s"], dtype="float64"),
                    "mean_amp": pd.Series(out["mean_amp"], dtype="float64"),
                    "peak_amp": pd.Series(out["peak_amp"], dtype="int32"),
                }
            )

    return media_df.mapInPandas(batches, AUDIO_STATS_SCHEMA)


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def render_y4m_media(doc_df: DataFrame, luma: str = "linear") -> DataFrame:
    """Render a REAL y4m clip per document, deterministically from
    ``doc_id``: ``n = (id % 6) + 2`` frames of ``(id % 5) + 2`` x
    ``(id % 4) + 2`` C444 video with constant chroma 128 and constant
    per-frame luma.  ``luma="linear"`` gives frame ``f`` luma
    ``(id % 200) + f`` (SQL-predictable whole-clip stats —
    ``multimodal_y4m_frame_stats``); ``luma="quadratic"`` gives
    ``(id + f*f) % 200``, whose frame-to-frame deltas vary and wrap —
    the scene-cut fixture (``multimodal_temporal_scene_cuts``).
    Closed-form either way.  ASSUMES doc_id >= 0 (see
    render_bmp_media — %-sign semantics)."""
    if luma not in ("linear", "quadratic"):
        raise ValueError(f"render_y4m_media: unknown luma mode {luma!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                n = int(doc_id % 6) + 2
                w = int(doc_id % 5) + 2
                h = int(doc_id % 4) + 2
                base = int(doc_id % 200)
                frames = np.full((n, h, w, 3), 128, dtype=np.uint8)
                for f in range(n):
                    if luma == "linear":
                        frames[f, :, :, 0] = base + f
                    else:
                        frames[f, :, :, 0] = (int(doc_id) + f * f) % 200
                blobs.append(encode_y4m(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_video_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary video column: frame count,
    dimensions and whole-clip mean luma via :func:`decode_y4m` inside
    Arrow-batched ``mapInPandas`` — int64 sums, one exact division."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "n_frames", "width", "height", "mean_luma")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_y4m(bytes(blob))
                n = frames.shape[0]
                luma_sum = int(frames[:, :, :, 0].sum(dtype=np.int64))
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(luma_sum / max(n * h * w, 1))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_luma": pd.Series(out["mean_luma"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, VIDEO_STATS_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def sample_y4m_frames(media_df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode each y4m clip, keep every
    ``every_n``-th frame, emit (doc_id, frame_no, that frame's mean
    luma).  One input row fans out to many frame rows INSIDE the
    pandas batch — no explode shuffle, partition-preserving; the real
    sibling of the fake-codec :func:`sample_frames`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, lumas = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_y4m(bytes(blob))
                for f in range(0, frames.shape[0], every_n):
                    ids.append(doc_id)
                    nos.append(f)
                    lumas.append(
                        int(frames[f, :, :, 0].sum(dtype=np.int64)) / (w * h)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


def resize_image_real(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize: decode (BMP/PPM), nearest-neighbor resample
    in numpy (``src = floor(dst * src_dim / dst_dim)`` — the standard
    index map), re-encode as BMP.  Same mapInPandas shape as the
    stubbed :func:`resize_media`, but every byte is real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(blob))
                xs = (np.arange(width) * w) // width
                ys = (np.arange(height) * h) // height
                blobs.append(encode_bmp24(rgb[np.ix_(ys, xs)]))
                ids.append(doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": blobs,
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                }
            )

    return media_df.mapInPandas(batches, RESIZED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_BYTES = 256  # fake fixed-size frame for the deterministic codec


def resize_media(
    media_df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize step (STUBBED codec): a real implementation decodes,
    resamples, re-encodes inside the same mapInPandas batch loop; the
    deterministic stand-in truncates/cycles the byte stream to
    width*height bytes so tests can assert exact output sizes.  The
    Spark plumbing — Arrow batching, schema contract, no shuffle — is
    the real thing."""
    if not fake:
        raise NotImplementedError("image codec not available; fake=True only")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: bytes((b * (target // max(len(b), 1) + 1))[:target])
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media_df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    media_df: DataFrame, every_n: int = 2, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Frame sampling (flatMap shape): split the payload into fixed
    ``frame_bytes`` frames, keep every ``every_n``-th.  One input row
    fans out to many frame rows INSIDE the pandas batch — no explode
    shuffle, partition-preserving; at 100 TB this is why frame
    sampling runs as mapInPandas, not as array explode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(blob) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(bytes(blob[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return media_df.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(media_df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction (STUBBED model): byte-value histogram,
    L1-normalized, as ``array<float>`` — deterministic, so tests can
    assert values.  A real encoder swaps the histogram for a model
    forward pass; the output column type is exactly the ``embeddings``
    table's, so results feed the ANN/near-dup operators unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(
                lambda b: _byte_histogram(b, dim)
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def _byte_histogram(blob: bytes, dim: int) -> list[float]:
    counts = [0] * dim
    for byte in blob:
        counts[byte % dim] += 1
    total = max(sum(counts), 1)
    return [float(c) / total for c in counts]


def downsample_wav(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio downsampling: decode each WAV blob, keep every
    ``factor``-th sample (decimation), and RE-ENCODE at the reduced
    rate — a genuine decode → transform → encode round trip per
    document, all inside Arrow-batched ``mapInPandas``
    (partition-preserving; blobs never shuffle).  The anti-aliasing
    low-pass a production resampler would add needs no external libs
    to express but has no closed-form oracle, so the contract query
    uses plain decimation; swapping in a numpy FIR here is a local
    change."""
    if factor < 1:
        raise ValueError(f"downsample_wav: factor {factor} must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for blob in pdf["payload"]:
                sr, samples = decode_wav_pcm16(bytes(blob))
                blobs.append(
                    encode_wav_pcm16(samples[::factor], sr // factor)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return media_df.mapInPandas(batches, schema)


# --- Baseline sequential JPEG, grayscale (ITU-T T.81), pure numpy ---
#
# The third REAL compressed codec in-container (after LZW GIF and
# DEFLATE PNG): Annex-K Huffman tables, zigzag, DC prediction,
# run/size AC coding with byte stuffing, and an orthonormal 8x8 DCT
# as two matrix multiplies.  The encoder writes an all-ones
# quantization table, so quantization is the identity on integer
# coefficients and the only loss is DCT rounding: constant 8x8 blocks
# round-trip EXACTLY (DC-only spectra) — which is what lets
# ``multimodal_jpeg_decode_stats`` hash-match a closed-form oracle —
# and arbitrary images round-trip within +-1 (pytest-pinned).  Round
# 11 adds COLOR (JFIF YCbCr + 4:2:0 subsampling, interleaved MCUs) in
# :func:`encode_jpeg_color` / :func:`decode_jpeg_color`; progressive
# scans and other samplings still raise loudly.


# ITU-T T.81 Annex K.3 typical Huffman tables (public spec constants).
_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    C[0] /= np.sqrt(2.0)
    return C

_DCT = _dct_matrix()
# first DCT basis row (all 1/(2*sqrt 2)) — the DC-only IDCT fast path:
# with a single nonzero coefficient both matmuls reduce to the exact
# products (_DCT.T[i,0]*c00)*_DCT[0,j] (adding float zeros is exact),
# so np.outer(_DCT0*c00, _DCT0) is bit-identical to the full IDCT
_DCT0 = _DCT[0].copy()

def _huff_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes

_DC_CODES = _huff_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _huff_codes(_AC_BITS, _AC_VALS)

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0
    def put(self, code, ln):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)

def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()

def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1

def _jpeg_seg(marker, body):
    return marker + struct.pack(">H", len(body) + 2) + body


# constant header segments (everything but the size-bearing SOF),
# hoisted out of the per-image encoders
_JPEG_GRAY_DQT = _jpeg_seg(b"\xFF\xDB", bytes([0]) + bytes([1] * 64))
_JPEG_GRAY_TAIL = (
    _jpeg_seg(b"\xFF\xC4", bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    + _jpeg_seg(b"\xFF\xC4", bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    + _jpeg_seg(b"\xFF\xDA", bytes([1, 1, 0x00, 0, 63, 0]))
)


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(pixels, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _JPEG_GRAY_DQT
    out += _jpeg_seg(b"\xFF\xC0", struct.pack(">BHHB", 8, h, w, 1)
                     + bytes([1, 0x11, 0]))
    out += _JPEG_GRAY_TAIL
    bw_ = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8].astype(np.float64) - 128.0
            coef = _DCT @ blk @ _DCT.T
            q = np.rint(coef).astype(np.int64).reshape(-1)[_ZIGZAG]
            diff = int(q[0]) - prev_dc
            prev_dc = int(q[0])
            s = _category(diff)
            c, ln = _DC_CODES[s]
            bw_.put(c, ln)
            if s:
                bw_.put(_amplitude_bits(diff, s), s)
            run = 0
            nz = np.nonzero(q[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(q[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_CODES[0xF0]
                    bw_.put(c, ln)
                    run -= 16
                s = _category(v)
                c, ln = _AC_CODES[(run << 4) | s]
                bw_.put(c, ln)
                bw_.put(_amplitude_bits(v, s), s)
                run = 0
            if last < 63:
                c, ln = _AC_CODES[0x00]
                bw_.put(c, ln)
    bw_.flush()
    out += bw_.buf
    out += b"\xFF\xD9"
    return bytes(out)

def _huff_tree(bits, vals):
    # map (length, code) -> value
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffLut:
    """16-bit-peek Huffman decode table: ``lens[v16]`` / ``vals[v16]``
    give the code length and symbol for any 16-bit window whose prefix
    is a valid code (lens==0 -> invalid).  Decoding one symbol is one
    array lookup instead of the old bit-by-bit tree walk."""

    __slots__ = ("lens", "vals")

    def __init__(self, bits, vals):
        self.lens = np.zeros(65536, np.uint8)
        self.vals = np.zeros(65536, np.uint8)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln]):
                base = code << (16 - ln)
                span = 1 << (16 - ln)
                self.lens[base:base + span] = ln
                self.vals[base:base + span] = vals[k]
                code += 1
                k += 1
            code <<= 1


# decoders re-parse the same DHT segments for every (KB-scale) blob;
# the parsed LUTs are content-addressed so the parse happens once per
# distinct table per worker, not once per image.  BOUNDED (r16
# ADVICE): each _HuffLut holds 128 KB, so adversarially varied DHT
# segments would otherwise grow worker memory for the executor's
# lifetime — past the cap the cache is cleared (rebuilding a LUT is
# cheap relative to unbounded growth; real corpora reuse a handful).
_HUFF_LUT_CACHE: dict = {}
_HUFF_LUT_CACHE_MAX = 256  # ~32 MB worst case


def _huff_lut(bits, vals) -> _HuffLut:
    key = (bytes(bits), bytes(vals))
    t = _HUFF_LUT_CACHE.get(key)
    if t is None:
        if len(_HUFF_LUT_CACHE) >= _HUFF_LUT_CACHE_MAX:
            _HUFF_LUT_CACHE.clear()
        t = _HUFF_LUT_CACHE[key] = _HuffLut(bits, vals)
    return t

class _BitReader:
    def __init__(self, data):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0
    def _fill(self):
        while self.n <= 24 and self.pos < len(self.d):
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos] if self.pos < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    b = 0  # hit a marker: feed zeros (spec padding)
                    self.pos -= 1
            self.acc = (self.acc << 8) | b
            self.n += 8
    def read(self, ln):
        if ln == 0:
            return 0
        self._fill()
        if self.n < ln:
            self.acc <<= (ln - self.n)
            self.n = ln
        v = (self.acc >> (self.n - ln)) & ((1 << ln) - 1)
        self.n -= ln
        return v
    def huff(self, table):
        # one 16-bit peek + LUT hit; short streams are zero-padded on
        # the right exactly as the bit-by-bit walk this replaces
        # padded its reads
        self._fill()
        if self.n >= 16:
            key = (self.acc >> (self.n - 16)) & 0xFFFF
        else:
            key = (self.acc << (16 - self.n)) & 0xFFFF
        ln = table.lens[key]
        if ln == 0:
            raise ValueError("bad Huffman code")
        self.read(int(ln))  # consume (zero-padded at stream end)
        return int(table.vals[key])

def _extend(v, size):
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

def decode_jpeg_gray(blob):
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt = {}
    dc_tbl = ac_tbl = None
    h = w = None
    while pos < len(blob):
        assert blob[pos] == 0xFF, hex(blob[pos])
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", blob, pos)
        body = blob[pos + 2: pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raise NotImplementedError("16-bit quant table")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                i += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 1:
                raise NotImplementedError("only 8-bit grayscale baseline")
            comp_q = body[8]  # after BHHB(6) + id + sampling
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = [0] + list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                t = _huff_lut(bits, vals)
                if tc == 0:
                    dc_tbl = t
                else:
                    ac_tbl = t
                i += 17 + nv
        elif marker == 0xDA:
            scan = blob[pos + ln:]
            br = _BitReader(scan)
            bh, bw_ = -(-h // 8), -(-w // 8)
            out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
            prev_dc = 0
            for by in range(bh):
                for bx in range(bw_):
                    blk, prev_dc = _dec_block(
                        br, dc_tbl, ac_tbl, prev_dc, qt[comp_q])
                    out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
            px = np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)
            return w, h, px[:h, :w]
        pos += ln
    raise ValueError("JPEG missing scan")


# --- Color JPEG: YCbCr + 4:2:0 chroma subsampling (round 11) --------
#
# Extends the baseline codec to the form virtually every real photo
# uses: JFIF YCbCr color, 2x2-subsampled chroma, interleaved 16x16
# MCUs (4 Y blocks + Cb + Cr), per-component DC prediction, separate
# luma/chroma quantization and Huffman tables (ITU-T T.81 Annex K
# chroma tables below).  Color conversion quantizes with an explicit
# ``floor(x + 0.5)`` — NOT np.rint — so the closed-form oracle can
# state the exact same half-up rounding in SQL (np.rint is
# half-to-even, which DuckDB round() is not).

# ITU-T T.81 Annex K.3.2 typical chroma Huffman tables.
_DC_BITS_C = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DC_CODES_C = _huff_codes(_DC_BITS_C, _DC_VALS_C)
_AC_CODES_C = _huff_codes(_AC_BITS_C, _AC_VALS_C)

_JPEG_COLOR_DQT = (
    _jpeg_seg(b"\xFF\xDB", bytes([0]) + bytes([1] * 64))
    + _jpeg_seg(b"\xFF\xDB", bytes([1]) + bytes([1] * 64))
)
_JPEG_COLOR_TAIL = (
    _jpeg_seg(b"\xFF\xC4", bytes([0x00]) + bytes(_DC_BITS[1:]) + bytes(_DC_VALS))
    + _jpeg_seg(b"\xFF\xC4", bytes([0x10]) + bytes(_AC_BITS[1:]) + bytes(_AC_VALS))
    + _jpeg_seg(b"\xFF\xC4", bytes([0x01]) + bytes(_DC_BITS_C[1:]) + bytes(_DC_VALS_C))
    + _jpeg_seg(b"\xFF\xC4", bytes([0x11]) + bytes(_AC_BITS_C[1:]) + bytes(_AC_VALS_C))
    + _jpeg_seg(b"\xFF\xDA", bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
)


def _half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the SQL-mirrorable rounding used by the color
    transforms (np.rint would be half-to-even)."""
    return np.floor(x + 0.5)


def _rgb_to_ycbcr(rgb: np.ndarray):
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = np.clip(_half_up(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        _half_up(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255)
    cr = np.clip(
        _half_up(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255)
    return y.astype(np.int64), cb.astype(np.int64), cr.astype(np.int64)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    y = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = np.clip(_half_up(y + 1.402 * crf), 0, 255)
    g = np.clip(_half_up(y - 0.344136 * cbf - 0.714136 * crf), 0, 255)
    b = np.clip(_half_up(y + 1.772 * cbf), 0, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _enc_block(bw_, plane, y0, x0, prev_dc, dc_codes, ac_codes) -> int:
    """Forward-DCT + quantize (all-ones table) + entropy-code one 8x8
    block; returns the new DC predictor."""
    blk = plane[y0:y0 + 8, x0:x0 + 8].astype(np.float64) - 128.0
    coef = _DCT @ blk @ _DCT.T
    q = np.rint(coef).astype(np.int64).reshape(-1)[_ZIGZAG]
    diff = int(q[0]) - prev_dc
    new_dc = int(q[0])
    s = _category(diff)
    c, ln = dc_codes[s]
    bw_.put(c, ln)
    if s:
        bw_.put(_amplitude_bits(diff, s), s)
    run = 0
    nz = np.nonzero(q[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw_.put(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        bw_.put(c, ln)
        bw_.put(_amplitude_bits(v, s), s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw_.put(c, ln)
    return new_dc


def encode_jpeg_color(rgb: np.ndarray) -> bytes:
    """Baseline sequential JFIF color JPEG: YCbCr, 4:2:0 subsampling
    (2x2 box average, half-up), interleaved MCUs, Annex-K luma +
    chroma Huffman tables, all-ones quantization (identity on integer
    coefficients, so constant-color images round-trip exactly)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected h x w x 3 RGB array")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    mh, mw = -(-h // 16) * 16, -(-w // 16) * 16
    padded = np.pad(rgb, ((0, mh - h), (0, mw - w), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_ycbcr(padded)
    # 4:2:0: 2x2 box average, half-up rounded back to integers
    def sub(c):
        s = (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
        return _half_up(s / 4.0).astype(np.int64)
    cbs, crs = sub(cb), sub(cr)
    out = bytearray(b"\xFF\xD8")
    out += _JPEG_COLOR_DQT
    out += _jpeg_seg(b"\xFF\xC0", struct.pack(">BHHB", 8, h, w, 3)
                     + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _JPEG_COLOR_TAIL
    bw_ = _BitWriter()
    dc = {"y": 0, "cb": 0, "cr": 0}
    for my in range(mh // 16):
        for mx in range(mw // 16):
            for sy in (0, 1):
                for sx in (0, 1):
                    dc["y"] = _enc_block(
                        bw_, y, my * 16 + sy * 8, mx * 16 + sx * 8,
                        dc["y"], _DC_CODES, _AC_CODES)
            dc["cb"] = _enc_block(bw_, cbs, my * 8, mx * 8, dc["cb"],
                                  _DC_CODES_C, _AC_CODES_C)
            dc["cr"] = _enc_block(bw_, crs, my * 8, mx * 8, dc["cr"],
                                  _DC_CODES_C, _AC_CODES_C)
    bw_.flush()
    out += bw_.buf
    out += b"\xFF\xD9"
    return bytes(out)


def _dec_block(br, dc_tbl, ac_tbl, prev_dc, qtab) -> tuple[np.ndarray, int]:
    """Entropy-decode + dequantize + IDCT one 8x8 block."""
    zz = np.zeros(64, dtype=np.int64)
    s = br.huff(dc_tbl)
    prev_dc += _extend(br.read(s), s)
    zz[0] = prev_dc
    k = 1
    had_ac = False
    while k < 64:
        rs = br.huff(ac_tbl)
        if rs == 0x00:
            break
        if rs == 0xF0:
            k += 16
            continue
        k += rs >> 4
        size = rs & 15
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.read(size), size)
        k += 1
        had_ac = True
    if not had_ac:  # DC-only block: exact closed-form IDCT (see _DCT0)
        return np.outer(_DCT0 * float(prev_dc * qtab[0]), _DCT0), prev_dc
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * qtab
    return _DCT.T @ coef.reshape(8, 8) @ _DCT, prev_dc


def decode_jpeg_color(blob):
    """Decode a baseline 4:2:0 YCbCr JPEG back to (w, h, rgb array).
    Parses the real marker stream (multi-table DQT/DHT, 3-component
    SOF0/SOS); any sampling other than Y=2x2, C=1x1 raises loudly."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tbls: dict[int, dict] = {}
    ac_tbls: dict[int, dict] = {}
    h = w = None
    comp_q = {}
    while pos < len(blob):
        assert blob[pos] == 0xFF, hex(blob[pos])
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", blob, pos)
        body = blob[pos + 2: pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raise NotImplementedError("16-bit quant table")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int64)
                i += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise NotImplementedError("expected 8-bit 3-component SOF0")
            samp = {}
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci: 9 + 3 * ci]
                samp[cid] = sf
                comp_q[cid] = tq
            if samp.get(1) != 0x22 or samp.get(2) != 0x11 or samp.get(3) != 0x11:
                raise NotImplementedError("only 4:2:0 (Y 2x2, C 1x1)")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = [0] + list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                t = _huff_lut(bits, vals)
                (dc_tbls if tc == 0 else ac_tbls)[th] = t
                i += 17 + nv
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise NotImplementedError("expected 3-component scan")
            scan_tbl = {}
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_tbl[cid] = (dc_tbls[tt >> 4], ac_tbls[tt & 15])
            scan = blob[pos + ln:]
            br = _BitReader(scan)
            mh, mw = -(-h // 16), -(-w // 16)
            yp = np.zeros((mh * 16, mw * 16), dtype=np.float64)
            cbp = np.zeros((mh * 8, mw * 8), dtype=np.float64)
            crp = np.zeros((mh * 8, mw * 8), dtype=np.float64)
            dc = {1: 0, 2: 0, 3: 0}
            for my in range(mh):
                for mx in range(mw):
                    for sy in (0, 1):
                        for sx in (0, 1):
                            blk, dc[1] = _dec_block(
                                br, *scan_tbl[1], dc[1], qt[comp_q[1]])
                            yp[my * 16 + sy * 8: my * 16 + sy * 8 + 8,
                               mx * 16 + sx * 8: mx * 16 + sx * 8 + 8] = blk
                    blk, dc[2] = _dec_block(br, *scan_tbl[2], dc[2],
                                            qt[comp_q[2]])
                    cbp[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8] = blk
                    blk, dc[3] = _dec_block(br, *scan_tbl[3], dc[3],
                                            qt[comp_q[3]])
                    crp[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8] = blk
            to_int = lambda p: np.clip(np.rint(p + 128.0), 0, 255).astype(np.int64)
            y_i = to_int(yp)[:h, :w]
            # nearest-neighbor 2x upsample, then crop
            cb_i = np.repeat(np.repeat(to_int(cbp), 2, 0), 2, 1)[:h, :w]
            cr_i = np.repeat(np.repeat(to_int(crp), 2, 0), 2, 1)[:h, :w]
            return w, h, _ycbcr_to_rgb(y_i, cb_i, cr_i)
        pos += ln
    raise ValueError("JPEG missing scan")


JPEG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def render_jpeg_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL baseline JPEG per document, deterministically from
    ``doc_id``: ``(id % 3) + 1`` x ``(id % 2) + 1`` blocks of 8x8,
    block (bx, by) filled with the constant ``base + 7*bx + 13*by``
    (base = id % 180, max 207 < 256).  Constant blocks have DC-only
    spectra, which the all-ones quantization table round-trips
    EXACTLY — the property that lets a SQL oracle predict the decoded
    mean through Huffman + DCT.  ASSUMES doc_id >= 0 (%-sign
    semantics, see render_bmp_media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                nbx = int(doc_id % 3) + 1
                nby = int(doc_id % 2) + 1
                base = int(doc_id % 180)
                bx = np.arange(nbx)
                by = np.arange(nby)
                vals = base + 7 * bx[None, :] + 13 * by[:, None]
                px = np.kron(vals, np.ones((8, 8), dtype=np.int64))
                blobs.append(encode_jpeg_gray(px.astype(np.uint8)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_jpeg_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary grayscale-JPEG column: decoded
    width/height and mean luma via :func:`decode_jpeg_gray` inside
    Arrow-batched ``mapInPandas``; luma sums accumulate in int64 with
    one exact division (§7.3-H2-safe, like the other extract_*)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_luma")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_jpeg_gray(bytes(blob))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(
                    int(px.sum(dtype=np.int64)) / (w * h)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_luma": pd.Series(out["mean_luma"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, JPEG_STATS_SCHEMA)


JPEG_COLOR_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def render_jpeg_color_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL color (YCbCr 4:2:0) baseline JPEG per document:
    a ``(doc_id % 7) + 3`` x ``(doc_id % 5) + 3`` image of the
    constant color ``(id % 200, 7*id % 200, 13*id % 200)``.  Constant
    color makes every Y/Cb/Cr block DC-only after the half-up
    quantized color transform, so the full lossy pipeline —
    subsampling included — is EXACT and a SQL oracle can state the
    decoded means through both color transforms.  Odd sizes exercise
    the 16-pixel MCU padding + crop path.  ASSUMES doc_id >= 0."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 7) + 3
                h = int(doc_id % 5) + 3
                rgb = np.empty((h, w, 3), dtype=np.uint8)
                rgb[..., 0] = int(doc_id % 200)
                rgb[..., 1] = int((doc_id * 7) % 200)
                rgb[..., 2] = int((doc_id * 13) % 200)
                blobs.append(encode_jpeg_color(rgb))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_jpeg_color_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary color-JPEG column: decoded
    width/height and per-channel means via :func:`decode_jpeg_color`
    inside Arrow-batched ``mapInPandas``; channel sums accumulate in
    int64 with one exact division (§7.3-H2-safe)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_jpeg_color(bytes(blob))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                for ch, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[key].append(
                        int(px[..., ch].sum(dtype=np.int64)) / (w * h)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, JPEG_COLOR_STATS_SCHEMA)


# --- IMA-ADPCM compressed audio (round 11) --------------------------
#
# The FOURTH real compressed codec in-container, and the first for
# audio: 4:1 adaptive differential PCM (IMA/DVI spec, WAV format tag
# 0x0011).  Each block stores a 16-bit seed predictor + step index,
# then one 4-bit nibble per sample; both coders walk the same
# 89-entry step table, so the decoder's state provably equals the
# encoder's reconstruction path — the invariant the fuzz test pins
# sample-exactly.  Signals that are CONSTANT WITHIN EACH BLOCK
# round-trip exactly (delta 0 ⇒ nibble 0 ⇒ predictor unchanged),
# which is what lets a closed-form SQL oracle predict decoded stats
# through the compressed container — the same trick as the JPEG
# constant-block law.

_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)

_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)

# Hot-loop twins: the per-sample state machine runs millions of
# iterations per task; plain-list indexing is ~4x faster than numpy
# scalar indexing there (measured on the sf0.1 sweep, 12.4 s -> ~4 s).
_IMA_STEP_LIST = [int(x) for x in _IMA_STEP_TABLE]
_IMA_INDEX_LIST = [int(x) for x in _IMA_INDEX_TABLE]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One decoder step: reconstruct the next sample from a nibble."""
    step = _IMA_STEP_LIST[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_LIST[nibble]))
    return pred, index


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 16_000, block_align: int = 256
) -> bytes:
    """Encode a 1-D int16 array as a mono IMA-ADPCM WAV (format tag
    0x0011).  Block layout per the IMA/DVI spec: 4-byte header (seed
    sample int16, step index uint8, reserved 0) + packed nibbles (low
    nibble first), ``(block_align - 4) * 2 + 1`` samples per block.
    The step index persists across blocks (re-seeded into each block
    header), matching reference encoders."""
    samples = np.asarray(samples, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1
    blocks = bytearray()
    index = 0
    n = len(samples)
    if n == 0:
        raise ValueError("empty signal")
    for start in range(0, n, spb):
        chunk = samples[start:start + spb]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        # inlined _ima_step: this loop runs once per sample over the
        # whole corpus — function-call + tuple overhead measurably
        # dominates at sweep scale
        steps, idxs = _IMA_STEP_LIST, _IMA_INDEX_LIST
        for target in chunk[1:].tolist():
            step = steps[index]
            diff = target - pred
            nibble = 0
            if diff < 0:
                nibble = 8
                diff = -diff
            if diff >= step:
                nibble |= 4
                diff -= step
            if diff >= step >> 1:
                nibble |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nibble |= 1
            d = step >> 3
            if nibble & 1:
                d += step >> 2
            if nibble & 2:
                d += step >> 1
            if nibble & 4:
                d += step
            pred = pred - d if nibble & 8 else pred + d
            if pred < -32768:
                pred = -32768
            elif pred > 32767:
                pred = 32767
            index += idxs[nibble]
            if index < 0:
                index = 0
            elif index > 88:
                index = 88
            nibbles.append(nibble)
        # pad the final block with repeats of the last predictor
        # (delta-0 nibbles keep the decoder state consistent)
        while len(nibbles) < spb - 1:
            pred, index = _ima_step(pred, index, 0)
            nibbles.append(0)
        for i in range(0, len(nibbles), 2):
            blocks.append(nibbles[i] | (nibbles[i + 1] << 4))
    n_blocks = -(-n // spb)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", n)
    return (
        struct.pack("<4sI4s", b"RIFF",
                    4 + 8 + len(fmt) + 8 + 4 + 8 + len(blocks), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", 4) + fact
        + struct.pack("<4sI", b"data", len(blocks)) + bytes(blocks)
    )


def decode_wav_ima_adpcm(blob: bytes) -> tuple[int, np.ndarray]:
    """REAL decode of a mono IMA-ADPCM WAV -> ``(sample_rate, int16
    samples)``: RIFF chunk walk, fmt validation (tag 0x0011, mono,
    4-bit), fact-chunk sample count, per-block seed + nibble replay
    through the shared step table."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, rate, align, spb, total, data = 12, None, None, None, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if cid == b"fmt ":
            tag, n_ch, rate, _, align, bits = struct.unpack_from(
                "<HHIIHH", blob, body)
            if tag != 0x0011 or n_ch != 1 or bits != 4:
                raise NotImplementedError(
                    f"only mono 4-bit IMA-ADPCM (got tag={tag:#x}, "
                    f"channels={n_ch}, bits={bits})")
            if size >= 20:
                (spb,) = struct.unpack_from("<H", blob, body + 18)
        elif cid == b"fact":
            (total,) = struct.unpack_from("<I", blob, body)
        elif cid == b"data":
            data = blob[body: body + size]
        pos = body + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if spb is None:
        spb = (align - 4) * 2 + 1
    out = []
    steps, idxs = _IMA_STEP_LIST, _IMA_INDEX_LIST
    for off in range(0, len(data), align):
        block = data[off: off + align]
        pred, index, _ = struct.unpack_from("<hBB", block, 0)
        out.append(pred)
        # inlined _ima_step (see encoder note): per-nibble hot loop
        for b in block[4:]:
            for nibble in (b & 0xF, b >> 4):
                step = steps[index]
                d = step >> 3
                if nibble & 1:
                    d += step >> 2
                if nibble & 2:
                    d += step >> 1
                if nibble & 4:
                    d += step
                pred = pred - d if nibble & 8 else pred + d
                if pred < -32768:
                    pred = -32768
                elif pred > 32767:
                    pred = 32767
                index += idxs[nibble]
                if index < 0:
                    index = 0
                elif index > 88:
                    index = 88
                out.append(pred)
    samples = np.array(out, dtype=np.int16)
    if total is not None:
        samples = samples[:total]
    return rate, samples


def _wrap_ima_adpcm_riff(
    blocks: bytes, n: int, sample_rate: int, block_align: int, spb: int
) -> bytes:
    """Assemble the RIFF/WAVE container around packed IMA-ADPCM block
    data (shared by the scalar and batch encoders so the two can
    never drift byte-wise)."""
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", n)
    return (
        struct.pack("<4sI4s", b"RIFF",
                    4 + 8 + len(fmt) + 8 + 4 + 8 + len(blocks), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", 4) + fact
        + struct.pack("<4sI", b"data", len(blocks)) + bytes(blocks)
    )


def encode_wav_ima_adpcm_batch(
    signals: list, sample_rates, block_align: int = 256
) -> list:
    """Batch twin of :func:`encode_wav_ima_adpcm`, byte-identical by
    construction (pinned by pytest fuzz): the per-sample ADPCM state
    machine is vectorized ACROSS signals with numpy, so the Python
    interpreter executes ``max_blocks * (spb - 1)`` steps per batch
    instead of ``total_samples`` steps (guide §4.2 — hand whole
    batches to vectorized native code).  Same quantizer walk: within
    a block the predictor chain is inherently sequential, but every
    signal advances in lockstep, one numpy op per state-machine edge.
    Padding (short final chunk) is expressed as forced delta-0
    nibbles, exactly the scalar encoder's ``_ima_step(pred, index,
    0)`` pad loop."""
    from ._alloc import keep_large_allocs_on_heap

    keep_large_allocs_on_heap()
    spb = (block_align - 4) * 2 + 1
    n_sig = len(signals)
    if np.isscalar(sample_rates):
        sample_rates = [int(sample_rates)] * n_sig
    sigs = []
    for s in signals:
        a = np.asarray(s, dtype=np.int64)
        if a.size == 0:
            raise ValueError("empty signal")
        sigs.append(a)
    lens = np.array([a.size for a in sigs], dtype=np.int64)
    nblocks = -(-lens // spb)
    max_nb = int(nblocks.max())
    steps_t, idx_t = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    idx = np.zeros(n_sig, dtype=np.int64)
    # per-signal accumulated block bytes
    parts: list[list[bytes]] = [[] for _ in range(n_sig)]
    order = np.arange(n_sig)
    for b in range(max_nb):
        act = np.flatnonzero(nblocks > b)
        if act.size == 0:
            break
        na = act.size
        # chunk = sig[b*spb : b*spb + spb]; first sample seeds pred
        clen = np.minimum(lens[act] - b * spb, spb)
        tgt = np.zeros((na, spb - 1), dtype=np.int64)
        seed = np.empty(na, dtype=np.int64)
        for j, g in enumerate(act):
            chunk = sigs[g][b * spb: b * spb + spb]
            seed[j] = chunk[0]
            tgt[j, : chunk.size - 1] = chunk[1:]
        pad = np.arange(spb - 1)[None, :] >= (clen - 1)[:, None]
        pred = seed.copy()
        ia = idx[act]
        headers = [
            struct.pack("<hBB", int(seed[j]), int(ia[j]), 0)
            for j in range(na)
        ]
        nibs = np.empty((na, spb - 1), dtype=np.int64)
        for t in range(spb - 1):
            step = steps_t[ia]
            diff = tgt[:, t] - pred
            neg = diff < 0
            adiff = np.where(neg, -diff, diff)
            ge4 = adiff >= step
            adiff = adiff - step * ge4
            half = step >> 1
            ge2 = adiff >= half
            adiff = adiff - half * ge2
            quart = step >> 2
            ge1 = adiff >= quart
            nib = neg * 8 + ge4 * 4 + ge2 * 2 + ge1 * 1
            nib[pad[:, t]] = 0
            d = (step >> 3) + (nib & 1) * quart \
                + ((nib >> 1) & 1) * half + ((nib >> 2) & 1) * step
            pred = pred + d * (1 - ((nib >> 2) & 2))
            np.clip(pred, -32768, 32767, out=pred)
            ia = ia + idx_t[nib]
            np.clip(ia, 0, 88, out=ia)
            nibs[:, t] = nib
        idx[act] = ia
        packed = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
        for j, g in enumerate(act):
            parts[g].append(headers[j] + packed[j].tobytes())
    out = []
    for g in order:
        out.append(_wrap_ima_adpcm_riff(
            b"".join(parts[g]), int(lens[g]), int(sample_rates[g]),
            block_align, spb))
    return out


def decode_wav_ima_adpcm_batch(blobs: list) -> list:
    """Batch twin of :func:`decode_wav_ima_adpcm`, sample-identical by
    construction (pinned by pytest fuzz).  IMA-ADPCM blocks are
    mutually independent in DECODE (each 4-byte header re-seeds both
    the predictor and the step index), so all blocks of all blobs are
    stacked into one nibble matrix and the 2*(align-4)-step state
    machine runs vectorized across blocks (guide §4.2) — the Python
    interpreter executes one loop per nibble POSITION, not per
    nibble.  Blobs with irregular layouts (data not a whole number of
    blocks, out-of-range seed index, mixed alignments are fine) fall
    back to the scalar decoder, preserving its exact error behavior."""
    from ._alloc import keep_large_allocs_on_heap

    keep_large_allocs_on_heap()
    parsed = []  # (rate, align, total, data) or None -> scalar fallback
    for blob in blobs:
        blob = bytes(blob)
        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE blob")
        pos, rate, align, spb, total, data = 12, None, None, None, None, None
        while pos + 8 <= len(blob):
            cid, size = struct.unpack_from("<4sI", blob, pos)
            body = pos + 8
            if cid == b"fmt ":
                tag, n_ch, rate, _, align, bits = struct.unpack_from(
                    "<HHIIHH", blob, body)
                if tag != 0x0011 or n_ch != 1 or bits != 4:
                    raise NotImplementedError(
                        f"only mono 4-bit IMA-ADPCM (got tag={tag:#x}, "
                        f"channels={n_ch}, bits={bits})")
            elif cid == b"fact":
                (total,) = struct.unpack_from("<I", blob, body)
            elif cid == b"data":
                data = blob[body: body + size]
            pos = body + size + (size & 1)
        if rate is None or data is None:
            raise ValueError("missing fmt/data chunk")
        parsed.append((rate, align, total, data))
    # group whole-block blobs by alignment; others decode scalar
    groups: dict[int, list[int]] = {}
    out: list = [None] * len(blobs)
    for i, (rate, align, total, data) in enumerate(parsed):
        if align and len(data) % align == 0 and len(data):
            groups.setdefault(align, []).append(i)
        else:
            out[i] = decode_wav_ima_adpcm(bytes(blobs[i]))
    steps_t, idx_t = _IMA_STEP_TABLE, _IMA_INDEX_TABLE
    for align, members in groups.items():
        raw = np.concatenate([
            np.frombuffer(parsed[i][3], dtype=np.uint8).reshape(-1, align)
            for i in members
        ])
        seed_idx = raw[:, 2].astype(np.int64)
        if (seed_idx > 88).any():
            # scalar decoder raises IndexError on the step table;
            # preserve that behavior exactly
            for i in members:
                out[i] = decode_wav_ima_adpcm(bytes(blobs[i]))
            continue
        pred = raw[:, :2].copy().view("<i2")[:, 0].astype(np.int64)
        body = raw[:, 4:]
        n_nib = 2 * (align - 4)
        nib = np.empty((raw.shape[0], n_nib), dtype=np.int64)
        nib[:, 0::2] = body & 0xF
        nib[:, 1::2] = body >> 4
        samples = np.empty((raw.shape[0], n_nib + 1), dtype=np.int16)
        samples[:, 0] = pred
        ia = seed_idx
        for t in range(n_nib):
            step = steps_t[ia]
            n = nib[:, t]
            d = (step >> 3) + (n & 1) * (step >> 2) \
                + ((n >> 1) & 1) * (step >> 1) + ((n >> 2) & 1) * step
            pred = pred + d * (1 - ((n >> 2) & 2))
            np.clip(pred, -32768, 32767, out=pred)
            ia = ia + idx_t[n]
            np.clip(ia, 0, 88, out=ia)
            samples[:, t + 1] = pred
        row = 0
        for i in members:
            rate, _, total, data = parsed[i]
            nb = len(data) // align
            flat = samples[row: row + nb].reshape(-1)
            row += nb
            if total is not None:
                flat = flat[:total]
            out[i] = (rate, flat)
    return out


ADPCM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("mean_amp", DoubleType()),
    ]
)


def render_adpcm_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL IMA-ADPCM WAV per document: ``(doc_id % 3) + 1``
    blocks (505 samples each at block_align 256), block ``b`` holding
    the constant ``base + 311*b`` with ``base = (doc_id % 100) * 250
    - 12500`` (int16-safe).  Constant-within-block signals round-trip
    the adaptive codec exactly (delta-0 nibbles), so a SQL oracle can
    state the decoded mean through the compressed container.  ASSUMES
    doc_id >= 0."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spb = (256 - 4) * 2 + 1
        for pdf in it:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            nb = ids % 3 + 1
            base = (ids % 100) * 250 - 12500
            sigs = [
                np.repeat(base[i] + 311 * np.arange(nb[i]), spb)
                .astype(np.int16)
                for i in range(len(ids))
            ]
            rates = 8000 + (ids % 3) * 4000
            blobs = encode_wav_ima_adpcm_batch(sigs, rates)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_adpcm_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary IMA-ADPCM column: sample rate,
    sample count and mean amplitude via :func:`decode_wav_ima_adpcm`
    in Arrow-batched ``mapInPandas``; amplitude sums accumulate in
    int64 with one exact division (§7.3-H2-safe)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "sample_rate", "n_samples", "mean_amp")}
            decoded = decode_wav_ima_adpcm_batch(list(pdf["payload"]))
            for doc_id, (rate, samples) in zip(pdf["doc_id"], decoded):
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["mean_amp"].append(
                    int(samples.sum(dtype=np.int64)) / max(len(samples), 1)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "mean_amp": pd.Series(out["mean_amp"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, ADPCM_STATS_SCHEMA)


# --- Progressive JPEG (SOF2), grayscale (round 12) ------------------
#
# The other half of round-11 VERDICT task 8: multi-SCAN decoding.  A
# progressive stream transmits each block's spectrum in pieces —
# here a 4-scan script: DC first pass at successive-approximation
# Al=1 (coarse image), a DC refinement scan supplying the low bit,
# then two spectral-selection AC scans (bands 1..5 and 6..63, Al=0)
# using the EOBn end-of-band RUN codes that only exist in
# progressive mode (one code can skip thousands of finished blocks).
# Coefficients accumulate across scans and a single dequantize+IDCT
# runs at EOI — exactly how browsers paint the blurry-then-sharp
# versions of the same photo.  Same Annex-K tables, BitWriter/Reader,
# zigzag and DCT as the baseline codec; AC successive approximation
# (Ah>0 on AC bands) is out of scope and raises loudly.


# Progressive AC scans need EOBn symbols (0x10..0xE0) that the
# Annex-K BASELINE AC table deliberately omits (baseline has only EOB
# 0x00 + ZRL 0xF0 + (run,size) codes).  Real encoders optimize a
# custom table per image; a FLAT canonical table covering all 256 RS
# values (255 at 9 bits + 1 at 10, Kraft-complete, no all-ones code
# so 1-bit padding can never alias a symbol) is spec-legal and keeps
# the encoder deterministic.
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_PROG_VALS = list(range(256))
_AC_PROG_CODES = _huff_codes(_AC_PROG_BITS, _AC_PROG_VALS)


def encode_jpeg_gray_progressive(pixels: np.ndarray) -> bytes:
    """Encode 8-bit grayscale as a 4-scan progressive JPEG (SOF2):
    DC(Al=1) -> DC refine -> AC[1..5] -> AC[6..63], all-ones quant
    table (DC-only images round-trip exactly, like the baseline
    encoder)."""
    h, w = pixels.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(pixels, ((0, bh * 8 - h), (0, bw * 8 - w)),
                    mode="edge")
    # quantized zigzag spectra of every block, in scan order
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8:(by + 1) * 8,
                         bx * 8:(bx + 1) * 8].astype(np.float64) - 128.0
            coef = _DCT @ blk @ _DCT.T
            blocks.append(np.rint(coef).astype(np.int64).reshape(-1)[_ZIGZAG])

    out = bytearray(b"\xFF\xD8")

    def seg(marker, body):
        return marker + struct.pack(">H", len(body) + 2) + body

    out += seg(b"\xFF\xDB", bytes([0]) + bytes([1] * 64))
    out += seg(b"\xFF\xC2", struct.pack(">BHHB", 8, h, w, 1)
               + bytes([1, 0x11, 0]))
    out += seg(b"\xFF\xC4", bytes([0x00]) + bytes(_DC_BITS[1:])
               + bytes(_DC_VALS))
    out += seg(b"\xFF\xC4", bytes([0x10]) + bytes(_AC_PROG_BITS[1:])
               + bytes(_AC_PROG_VALS))

    def sos(ss, se, ah, al):
        return seg(b"\xFF\xDA", bytes([1, 1, 0x00,
                                       ss, se, (ah << 4) | al]))

    # scan 1: DC first pass, Al=1 — diffs of (dc >> 1), predicted in
    # the shifted domain (T.81 G.1.2.1)
    out += sos(0, 0, 0, 1)
    bw_ = _BitWriter()
    prev = 0
    for zz in blocks:
        v = int(zz[0]) >> 1
        diff = v - prev
        prev = v
        s = _category(diff)
        c, ln = _DC_CODES[s]
        bw_.put(c, ln)
        if s:
            bw_.put(_amplitude_bits(diff, s), s)
    bw_.flush()
    out += bw_.buf

    # scan 2: DC refinement, Ah=1 Al=0 — one raw low bit per block
    out += sos(0, 0, 1, 0)
    bw_ = _BitWriter()
    for zz in blocks:
        bw_.put(int(zz[0]) & 1, 1)
    bw_.flush()
    out += bw_.buf

    # scans 3-4: AC spectral-selection first passes with EOBn runs
    for ss, se in ((1, 5), (6, 63)):
        out += sos(ss, se, 0, 0)
        bw_ = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            c, ln = _AC_PROG_CODES[r << 4]
            bw_.put(c, ln)
            if r:
                bw_.put(eobrun - (1 << r), r)
            eobrun = 0

        for zz in blocks:
            band = zz[ss:se + 1]
            nz = np.nonzero(band)[0]
            if len(nz) == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last = nz[-1]
            for i in range(last + 1):
                v = int(band[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_PROG_CODES[0xF0]
                    bw_.put(c, ln)
                    run -= 16
                s = _category(v)
                c, ln = _AC_PROG_CODES[(run << 4) | s]
                bw_.put(c, ln)
                bw_.put(_amplitude_bits(v, s), s)
                run = 0
            if last < se - ss:
                eobrun += 1  # this block ends early: opens an EOB run
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        bw_.flush()
        out += bw_.buf

    out += b"\xFF\xD9"
    return bytes(out)


def _scan_end(blob: bytes, pos: int) -> int:
    """First byte AFTER a scan's entropy data: the next 0xFF that is
    not a 0x00 stuffing byte (restart markers are never emitted by
    the encoders here)."""
    i = pos
    while i < len(blob) - 1:
        if blob[i] == 0xFF and blob[i + 1] != 0x00:
            return i
        i += 1
    return len(blob)


def decode_jpeg_gray_progressive(blob):
    """REAL multi-scan progressive decode (SOF2 grayscale): parses
    every SOS (spectral selection Ss..Se, successive approximation
    Ah/Al), accumulates coefficients — DC first pass shifted << Al,
    DC refinement OR-ing the low bit, AC first passes with EOBn
    end-of-band run codes — and runs ONE dequantize+IDCT at EOI.
    AC refinement scans (Ah>0 on an AC band) raise loudly."""
    if blob[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt = {}
    dc_tbl = ac_tbl = None
    h = w = None
    comp_q = 0
    coeffs = None
    pred = 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", blob, pos)
        body = blob[pos + 2: pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raise NotImplementedError("16-bit quant table")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1
                                       ).astype(np.int64)
                i += 65
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 1:
                raise NotImplementedError(
                    "only 8-bit grayscale progressive")
            comp_q = body[8]
            nb = (-(-h // 8)) * (-(-w // 8))
            coeffs = np.zeros((nb, 64), dtype=np.int64)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB):
            raise NotImplementedError(
                "decode_jpeg_gray_progressive handles SOF2 only")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = [0] + list(body[i + 1: i + 17])
                nv = sum(bits)
                vals = list(body[i + 17: i + 17 + nv])
                t = _huff_lut(bits, vals)
                if tc == 0:
                    dc_tbl = t
                else:
                    ac_tbl = t
                i += 17 + nv
        elif marker == 0xDA:
            ss, se = body[3], body[4]
            ah, al = body[5] >> 4, body[5] & 15
            data_start = pos + ln
            data_end = _scan_end(blob, data_start)
            br = _BitReader(blob[data_start:data_end])
            if coeffs is None:
                raise ValueError("scan before SOF2")
            if ss == 0 and se == 0:
                if ah == 0:  # DC first pass (shifted domain)
                    pred = 0
                    for b in range(len(coeffs)):
                        s = br.huff(dc_tbl)
                        pred += _extend(br.read(s), s)
                        coeffs[b, 0] = pred << al
                else:  # DC refinement: one raw bit at position Al
                    for b in range(len(coeffs)):
                        if br.read(1):
                            coeffs[b, 0] |= 1 << al
            else:
                if ah != 0:
                    raise NotImplementedError(
                        "AC successive-approximation refinement "
                        "scans not supported")
                eobrun = 0
                for b in range(len(coeffs)):
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = br.huff(ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r < 15:  # EOBn: run of 2^r + bits
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("AC band overflow")
                        coeffs[b, k] = _extend(br.read(s), s) << al
                        k += 1
            pos = data_end - 2  # step over scan; +ln below re-adds
            ln = 2
        pos += ln
    if coeffs is None or h is None:
        raise ValueError("JPEG missing SOF2/scan")
    bh, bw_ = -(-h // 8), -(-w // 8)
    out = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
    q = qt[comp_q]
    for b in range(len(coeffs)):
        by, bx = divmod(b, bw_)
        if not coeffs[b, 1:].any():  # DC-only: exact closed-form IDCT
            blk = np.outer(_DCT0 * float(coeffs[b, 0] * q[0]), _DCT0)
        else:
            coef = np.zeros(64, dtype=np.float64)
            coef[_ZIGZAG] = coeffs[b] * q
            blk = _DCT.T @ coef.reshape(8, 8) @ _DCT
        out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
    px = np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)
    return w, h, px[:h, :w]


def render_jpeg_progressive_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL PROGRESSIVE (SOF2) grayscale JPEG per document,
    deterministically from ``doc_id``: ``(id % 4) + 1`` x
    ``(id % 3) + 1`` blocks of 8x8, block (bx, by) constant at
    ``base + 5*bx + 11*by`` (base = id % 170, max 206 < 256) — block-
    constant spectra are DC-only, so the 4-scan progressive pipeline
    (coarse DC, DC refinement bit, two EOB-run AC bands) reproduces
    them EXACTLY and the SQL oracle states the decoded mean in closed
    form.  ASSUMES doc_id >= 0 (%-sign semantics)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                nbx = int(doc_id % 4) + 1
                nby = int(doc_id % 3) + 1
                base = int(doc_id % 170)
                bx = np.arange(nbx)
                by = np.arange(nby)
                vals = base + 5 * bx[None, :] + 11 * by[:, None]
                px = np.kron(vals, np.ones((8, 8), dtype=np.int64))
                blobs.append(
                    encode_jpeg_gray_progressive(px.astype(np.uint8)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_jpeg_progressive_stats(media_df: DataFrame) -> DataFrame:
    """Multi-scan progressive decode stats (same output contract as
    :func:`extract_jpeg_stats`, but through
    :func:`decode_jpeg_gray_progressive`'s scan accumulator)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_luma")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_jpeg_gray_progressive(bytes(blob))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(
                    int(px.sum(dtype=np.int64)) / (w * h)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_luma": pd.Series(out["mean_luma"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, JPEG_STATS_SCHEMA)


# --- G.711 mu-law (round 13) ----------------------------------------
#
# The telephony companding codec (ITU-T G.711): 16-bit PCM mapped to
# 8 bits through a piecewise-linear approximation of a logarithm —
# sign bit, 3-bit segment (exponent), 4-bit mantissa, all bits
# complemented on the wire.  Lossy but IDEMPOTENT on its own
# codebook: decode(encode(v)) lands on a 256-value lattice and
# encode(decode(c)) == c, which is what lets the render law put
# lattice values in the signal so a SQL oracle can state the decoded
# means exactly through the compressed container.

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a mono G.711 mu-law WAV (format
    tag 0x0007, 8 bits per sample).  Vectorized numpy companding:
    bias + clip, segment = position of the top set bit of the biased
    magnitude (7..14), mantissa = the next 4 bits, all complemented."""
    v = np.asarray(samples, dtype=np.int64)
    if v.size == 0:
        raise ValueError("empty signal")
    sign = np.where(v < 0, 0x80, 0)
    mag = np.minimum(np.abs(v) + _MULAW_BIAS, _MULAW_CLIP + _MULAW_BIAS)
    # segment: floor(log2(mag)) for mag in [2^7, 2^15) -> 0..7
    seg = np.clip(np.floor(np.log2(mag)).astype(np.int64) - 7, 0, 7)
    mant = (mag >> (seg + 3)) & 0x0F
    code = (~(sign | (seg << 4) | mant)) & 0xFF
    data = code.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 0x0007, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", v.size)
    return (
        struct.pack("<4sI4s", b"RIFF",
                    4 + 8 + len(fmt) + 8 + 4 + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", 4) + fact
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav_mulaw(blob: bytes) -> tuple[int, np.ndarray]:
    """REAL decode of a mono G.711 mu-law WAV -> ``(sample_rate,
    int16 samples)``: RIFF chunk walk, fmt validation (tag 0x0007,
    mono, 8-bit), then the standard expansion
    ``((mant << 3) + bias) << seg  -  bias`` with the sign bit."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = data = None
    n_fact = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (n_fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks pad one byte
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 0x0007:
        raise ValueError(f"not mu-law (format tag 0x{tag:04x})")
    if channels != 1 or bits != 8:
        raise NotImplementedError("only mono 8-bit mu-law is supported")
    code = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if n_fact is not None:
        code = code[:n_fact]
    c = (~code) & 0xFF
    seg = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << seg) - _MULAW_BIAS
    out = np.where(c & 0x80, -mag, mag)
    return rate, out.astype(np.int16)


MULAW_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, mean_amp double"
)


def render_mulaw_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL G.711 mu-law WAV per document, deterministically
    from ``doc_id``: ``800 + (id % 3) * 400`` samples of the CONSTANT
    lattice value ``s * ((((id % 16) * 8 + 132) << (id % 8)) - 132)``
    with sign ``s = +1`` for even ids, ``-1`` for odd — a mu-law
    codebook point, so the lossy companding round-trips it EXACTLY
    and the SQL oracle can state the decoded mean in closed form.
    Sample rate ``8000 * ((id % 2) + 1)``.  ASSUMES doc_id >= 0
    (render-law contract, round-7 ADVICE)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                mag = (((i % 16) * 8 + 132) << (i % 8)) - 132
                val = mag if i % 2 == 0 else -mag
                n = 800 + (i % 3) * 400
                rate = 8000 * ((i % 2) + 1)
                sig = np.full(n, val, dtype=np.int16)
                blobs.append(encode_wav_mulaw(sig, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_mulaw_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary mu-law column: sample rate,
    sample count, mean amplitude via :func:`decode_wav_mulaw` in
    Arrow-batched ``mapInPandas``; int64-exact sums, one division."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "sample_rate", "n_samples", "mean_amp")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_wav_mulaw(bytes(blob))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["mean_amp"].append(
                    int(samples.sum(dtype=np.int64)) / max(len(samples), 1)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "mean_amp": pd.Series(out["mean_amp"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, MULAW_STATS_SCHEMA)


# --- TGA (Truevision TARGA) with RLE (round 13) ----------------------
#
# The classic 18-byte-header image container; type 10 = run-length
# encoded true color.  RLE packets: control byte c -> (c & 0x7F) + 1
# pixels, repeated from ONE following pixel when c & 0x80 (run
# packet) or read verbatim when not (raw packet); packets never cross
# scanlines in conforming writers.  Pixels are BGR order; default
# origin is BOTTOM-LEFT (descriptor bit 5 clear), same vertical flip
# discipline as BMP.


def encode_tga_rle(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a type-10 (RLE
    true-color) bottom-up TGA.  Maximal run packets for repeats >= 2,
    raw packets otherwise, 128-pixel packet cap, packets never cross
    scanlines."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB")
    header = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 10, 0, 0, 0, 0, 0, w, h, 24, 0)
    out = bytearray(header)
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = px[y]
        x = 0
        while x < w:
            # measure the run at x
            run = 1
            while (x + run < w and run < 128
                   and (row[x + run] == row[x]).all()):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += bytes((int(row[x][2]), int(row[x][1]),
                              int(row[x][0])))  # BGR
                x += run
            else:
                # raw packet: scan forward until a >=2 run starts
                start = x
                x += 1
                while x < w and x - start < 128:
                    if (x + 1 < w and (row[x + 1] == row[x]).all()):
                        break
                    x += 1
                n = x - start
                out.append(n - 1)
                for xx in range(start, x):
                    out += bytes((int(row[xx][2]), int(row[xx][1]),
                                  int(row[xx][0])))
    return bytes(out)


def decode_tga_rle(blob: bytes) -> np.ndarray:
    """REAL decode of a type-10 24-bpp TGA -> (h, w, 3) uint8 RGB:
    header walk (id field skip, color-map rejection), RLE packet
    replay, BGR swap, bottom-up flip per descriptor bit 5."""
    if len(blob) < 18:
        raise ValueError("truncated TGA header")
    (idlen, cmap_type, img_type, _cm_first, _cm_len, _cm_bits,
     _x0, _y0, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", blob[:18])
    if img_type != 10:
        raise NotImplementedError(f"TGA image type {img_type} (only RLE "
                                  "true-color, type 10, is supported)")
    if cmap_type != 0:
        raise NotImplementedError("color-mapped TGA is not supported")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bpp TGA (only 24)")
    pos = 18 + idlen
    flat = np.empty((h * w, 3), dtype=np.uint8)
    filled = 0
    total = h * w
    while filled < total:
        if pos >= len(blob):
            raise ValueError("truncated TGA pixel data")
        ctrl = blob[pos]
        pos += 1
        n = (ctrl & 0x7F) + 1
        if ctrl & 0x80:  # run packet: one BGR pixel, repeated
            b, g, r = blob[pos], blob[pos + 1], blob[pos + 2]
            pos += 3
            flat[filled:filled + n] = (r, g, b)
        else:  # raw packet: n literal BGR pixels
            raw = np.frombuffer(
                blob[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
            flat[filled:filled + n] = raw[:, ::-1]  # BGR -> RGB
        filled += n
    px = flat.reshape(h, w, 3)
    if not (desc & 0x20):  # bottom-left origin: flip to top-down
        px = px[::-1]
    return px


TGA_STATS_SCHEMA = (
    "doc_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def render_tga_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL RLE-compressed TGA per document, deterministically
    from ``doc_id``: width ``(id % 13) + 2``, height ``(id % 7) + 2``,
    pixel law ``R = base + (x // 4) * 4``, ``G = base + y``,
    ``B = base`` for ``base = id % 200`` — horizontal 4-pixel bands
    give the encoder genuine run packets while the remainder columns
    exercise raw packets, and the channel means stay in closed form
    for the SQL oracle.  ASSUMES doc_id >= 0 (render-law contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w = i % 13 + 2
                h = i % 7 + 2
                base = i % 200
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (base + (x // 4) * 4)[None, :]
                px[:, :, 1] = (base + y)[:, None]
                px[:, :, 2] = base
                blobs.append(encode_tga_rle(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_tga_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary TGA column: dimensions + exact
    per-channel means via :func:`decode_tga_rle` in Arrow-batched
    ``mapInPandas``; channel sums in int64, one exact division."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "mean_r", "mean_g",
                    "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_tga_rle(bytes(blob))
                h, w, _ = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = h * w
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(sums[0] / n)
                out["mean_g"].append(sums[1] / n)
                out["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, TGA_STATS_SCHEMA)


# --- QOI ("Quite OK Image") lossless codec (round 13) -----------------
#
# The 2021 single-page lossless format (qoiformat.org): a 14-byte
# header ("qoif", BE width/height, channels, colorspace), then a
# byte-aligned op stream over a running previous-pixel + 64-slot
# hash-indexed color array, closed by seven 0x00 and one 0x01:
#
#   0xFE r g b        QOI_OP_RGB    explicit color (alpha carried)
#   0xFF r g b a      QOI_OP_RGBA   explicit color+alpha
#   0b00iiiiii        QOI_OP_INDEX  replay array[i], i = hash(px)
#   0b01drdgdb        QOI_OP_DIFF   2-bit channel deltas, bias 2
#   0b10dg...  drdg|dbdg  QOI_OP_LUMA  6-bit dg bias 32; 4-bit dr-dg /
#                                      db-dg bias 8 (second byte)
#   0b11rrrrrr        QOI_OP_RUN    repeat prev 1..62 (bias -1; 63/64
#                                   are the RGB/RGBA tags)
#
# hash(px) = (3r + 5g + 7b + 11a) % 64.  All deltas wrap mod 256.


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a REAL QOI file
    (channels=3, alpha fixed 255): maximal RUN chunks, INDEX on hash
    hits, DIFF / LUMA for small wrapped deltas, explicit RGB
    otherwise — the reference-encoder op priority, so output is
    byte-identical to qoi.c on the same input."""
    h, w, c = px.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB")
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", w, h, 3, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = px.reshape(-1, 3)
    for i in range(flat.shape[0]):
        r, g, b = int(flat[i, 0]), int(flat[i, 1]), int(flat[i, 2])
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hi = _qoi_hash(r, g, b, 255)
        if index[hi] == (r, g, b, 255):
            out.append(hi)
        else:
            index[hi] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(blob: bytes) -> np.ndarray:
    """REAL decode of a QOI file -> (h, w, 3) uint8 RGB: header walk,
    op dispatch over the running pixel + 64-slot index (stored after
    every non-run chunk, the qoi.c discipline), wrapped-delta replay,
    end-marker check.  4-channel files decode with alpha dropped."""
    if len(blob) < 22 or blob[:4] != b"qoif":
        raise ValueError("not a QOI file")
    w, h, channels, _cs = struct.unpack(">IIBB", blob[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels {channels}")
    if blob[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    total = w * h
    flat = np.empty((total, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, filled = 14, 0
    end = len(blob) - 8
    while filled < total:
        if pos >= end:
            raise ValueError("truncated QOI op stream")
        op = blob[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = blob[pos], blob[pos + 1], blob[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = blob[pos], blob[pos + 1], blob[pos + 2], \
                blob[pos + 3]
            pos += 4
        elif op >> 6 == 0b00:  # INDEX
            r, g, b, a = index[op & 0x3F]
        elif op >> 6 == 0b01:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 0b10:  # LUMA
            dg = (op & 0x3F) - 32
            second = blob[pos]
            pos += 1
            r = (r + dg + ((second >> 4) & 0x0F) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (second & 0x0F) - 8) % 256
        else:  # RUN
            n = (op & 0x3F) + 1
            if filled + n > total:
                raise ValueError("QOI run overflows image")
            flat[filled:filled + n] = (r, g, b)
            filled += n
            continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        flat[filled] = (r, g, b)
        filled += 1
    return flat.reshape(h, w, 3)


QOI_STATS_SCHEMA = (
    "doc_id long, width int, height int, compressed_ok boolean, "
    "mean_r double, mean_g double, mean_b double"
)


def render_qoi_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL QOI image per document, deterministically from
    ``doc_id``: width ``(id % 11) + 3``, height ``(id % 5) + 2``,
    pixel law ``R = base + 2*(x // 3)``, ``G = base + 2*(y // 2)``,
    ``B = base`` for ``base = id % 193``.  The law routes every op
    kind through the encoder — 3-pixel R bands produce RUN chunks,
    band steps (+2,0,0) produce DIFF, row wraps produce LUMA/RGB, and
    paired rows (same G) revisit row-0 colors so their first pixel
    replays from the hash INDEX — while channel means stay in closed
    form for the SQL oracle.  ASSUMES doc_id >= 0."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w = i % 11 + 3
                h = i % 5 + 2
                base = i % 193
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = (base + 2 * (x // 3))[None, :]
                px[:, :, 1] = (base + 2 * (y // 2))[:, None]
                px[:, :, 2] = base
                blobs.append(encode_qoi(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_qoi_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary QOI column: dimensions, a
    compression receipt (op count strictly below the pixel count —
    provable because every >=3-wide band emits a RUN and paired rows
    replay via INDEX+RUN, so the law guarantees it for ALL doc_ids)
    and exact per-channel means via :func:`decode_qoi` in
    Arrow-batched ``mapInPandas``; sums in int64, ONE division."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "compressed_ok",
                    "mean_r", "mean_g", "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(blob)
                px = decode_qoi(raw)
                h, w, _ = px.shape
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = h * w
                # count ops by a header-less re-walk: cheap (byte scan)
                n_ops = 0
                pos, end = 14, len(raw) - 8
                while pos < end:
                    op = raw[pos]
                    n_ops += 1
                    pos += (4 if op == 0xFE else 5 if op == 0xFF
                            else 2 if op >> 6 == 0b10 else 1)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["compressed_ok"].append(bool(n_ops < n))
                out["mean_r"].append(sums[0] / n)
                out["mean_g"].append(sums[1] / n)
                out["mean_b"].append(sums[2] / n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "compressed_ok": pd.Series(
                        out["compressed_ok"], dtype="bool"),
                    "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                }
            )

    return media_df.mapInPandas(batches, QOI_STATS_SCHEMA)


# --- FLAC (fixed-predictor subset) lossless audio (round 13) ----------
#
# Real FLAC per the public format spec (xiph.org/flac/format.html):
# "fLaC" marker + STREAMINFO metadata block (with the true MD5 of the
# unencoded samples), then frames of: 14-bit sync header + CRC-8,
# one mono subframe (CONSTANT / VERBATIM / FIXED order 0-4 — the
# polynomial predictors whose residual is the order-th difference),
# Rice-coded residual partitions, CRC-16 frame footer.  This is the
# PREDICTIVE + PARAMETRIC-ENTROPY class of codec (linear prediction,
# Golomb-Rice), distinct from the suite's dictionary (LZW), DEFLATE,
# transform (JPEG DCT) and companding (mu-law/ADPCM) codecs.
# Subset bounds: mono, 16-bit, one block per frame.


class _FlacBitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.nbits += bits
            while self.nbits >= 8:
                self.nbits -= 8
                self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def write_bit_array(self, bits: "np.ndarray") -> None:
        """Append a 0/1 ``uint8`` bit array in one shot (MSB-first,
        exactly the stream :meth:`write` would produce bit-by-bit) —
        the vectorized Rice-residual writer's exit into the stream.
        Any pending sub-byte bits are prefixed so ``np.packbits`` sees
        the true byte phase; the sub-byte tail goes back to ``acc``."""
        if self.nbits:
            pre = np.empty(self.nbits, np.uint8)
            for j in range(self.nbits):
                pre[j] = (self.acc >> (self.nbits - 1 - j)) & 1
            bits = np.concatenate([pre, bits])
        total = len(bits)
        head = total - (total % 8)
        if head:
            self.buf += np.packbits(bits[:head]).tobytes()
        acc = 0
        for j in range(head, total):
            acc = (acc << 1) | int(bits[j])
        self.acc = acc
        self.nbits = total - head

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _FlacBitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q


def _rice_scan(allbits: "np.ndarray", base: int, cnt: int, k: int):
    """Vectorized Rice-partition decode: find the ``cnt`` code
    terminators (the 1-bit ending each unary run) in ``allbits`` from
    bit ``base`` on, skipping the ``k`` remainder bits that follow
    each terminator (they may contain 1s that are NOT terminators).

    Returns ``(zigzag_values int64[cnt], end_bit_pos)``.  The scan is
    chunked so a truncated/corrupt stream raises ``ValueError``
    instead of walking the whole buffer; the terminator-selection
    loop runs over 1-bit *positions* only (a handful per code), not
    over every bit the old ``read_unary``/``read`` pair visited."""
    n_bits = len(allbits)
    terms = np.empty(cnt, np.int64)
    found = 0
    last = -(k + 1)  # so a terminator at relative position 0 qualifies
    lo = 0
    win = max(4096, cnt * (k + 8))
    while found < cnt:
        hi = min(lo + win, n_bits - base)
        if hi <= lo:
            raise ValueError("Rice residual stream truncated")
        for p in np.flatnonzero(allbits[base + lo:base + hi]).tolist():
            p += lo
            if p - last > k:
                terms[found] = p
                last = p
                found += 1
                if found == cnt:
                    break
        lo = hi
        win *= 2
    starts = np.empty(cnt, np.int64)
    starts[0] = 0
    if cnt > 1:
        starts[1:] = terms[:-1] + k + 1
    q = terms - starts
    if k:
        if base + terms[-1] + k >= n_bits:
            raise ValueError("Rice residual stream truncated")
        idx = base + terms[:, None] + 1 + np.arange(k, dtype=np.int64)
        r = allbits[idx].astype(np.int64) @ \
            (np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64))
        u = (q << k) | r
    else:
        u = q
    return (u >> 1) ^ -(u & 1), base + int(terms[-1]) + 1 + k


def _crc_tables():
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        t16.append(c)
    return t8, t16


# byte-at-a-time tables (8x fewer Python ops than the bit loops they
# replace; identical polynomials 0x07 / 0x8005, init 0, non-reflected)
_CRC8_TABLE, _CRC16_TABLE = _crc_tables()


def _crc8(data: bytes) -> int:
    crc = 0
    tab = _CRC8_TABLE
    for b in data:
        crc = tab[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    tab = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ tab[(crc >> 8) ^ b]
    return crc


_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                 4: [4, -6, 4, -1]}


def _fixed_residual(sig, order: int):
    out = sig.astype(np.int64)
    for _ in range(order):
        out = np.diff(out)
    return out


def encode_flac(sig: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono int16 PCM as a REAL subset-FLAC stream: STREAMINFO
    with the true audio MD5, one frame per 4096-sample block, the
    best FIXED predictor (order 0-4 by absolute-residual mass), and a
    single-partition Rice residual with the cost-minimizing 4-bit
    parameter.  Output parses in any conforming FLAC decoder."""
    import hashlib

    sig = sig.astype(np.int16)
    n = len(sig)
    md5 = hashlib.md5(sig.astype("<i2").tobytes()).digest()
    blocks = [sig[i:i + 4096] for i in range(0, n, 4096)] or \
        [sig[0:0]]
    if n == 0:
        blocks = []
    max_bs = max((len(b) for b in blocks), default=0)
    min_bs = min((len(b) for b in blocks), default=0)
    head = _FlacBitWriter()
    head.write(0x664C6143, 32)        # "fLaC"
    head.write(1, 1)                  # last metadata block
    head.write(0, 7)                  # STREAMINFO
    head.write(34, 24)
    head.write(max(min_bs, 16), 16)   # min block size (spec floor 16)
    head.write(max(max_bs, 16), 16)
    head.write(0, 24)                 # min frame size unknown
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(0, 3)                  # channels - 1 (mono)
    head.write(15, 5)                 # bits per sample - 1
    head.write(n, 36)
    for byte in md5:
        head.write(byte, 8)
    out = bytearray(head.bytes())
    for fno, block in enumerate(blocks):
        bs = len(block)
        fw = _FlacBitWriter()
        fw.write(0b11111111111110, 14)
        fw.write(0, 1)                # reserved
        fw.write(0, 1)                # fixed blocksize stream
        fw.write(0b0111, 4)           # blocksize-1 in 16 bits follows
        fw.write(0b0000, 4)           # sample rate from STREAMINFO
        fw.write(0b0000, 4)           # mono
        fw.write(0b100, 3)            # 16 bits per sample
        fw.write(0, 1)                # reserved
        # UTF-8 coded frame number (subset: < 2^31)
        if fno < 0x80:
            fw.write(fno, 8)
        elif fno < 0x800:
            fw.write(0xC0 | (fno >> 6), 8)
            fw.write(0x80 | (fno & 0x3F), 8)
        else:
            fw.write(0xE0 | (fno >> 12), 8)
            fw.write(0x80 | ((fno >> 6) & 0x3F), 8)
            fw.write(0x80 | (fno & 0x3F), 8)
        fw.write(bs - 1, 16)
        hdr = fw.bytes()
        fw = _FlacBitWriter()
        for byte in hdr:
            fw.write(byte, 8)
        fw.write(_crc8(hdr), 8)
        # --- subframe: best fixed order ---
        kmax = min(4, bs - 1) if bs else 0
        order = 0
        best = None
        for o in range(0, kmax + 1):
            mass = int(np.abs(_fixed_residual(block, o)).sum()) \
                if bs else 0
            if best is None or mass < best:
                best, order = mass, o
        fw.write(0, 1)                # zero padding
        fw.write(0b001000 | order, 6)  # FIXED, order
        fw.write(0, 1)                # no wasted bits
        for s in block[:order]:
            fw.write(int(s) & 0xFFFF, 16)
        res = _fixed_residual(block, order)
        fw.write(0b00, 2)             # 4-bit rice parameters
        fw.write(0, 4)                # partition order 0
        zig = np.where(res < 0, -2 * res - 1, 2 * res).astype(np.int64)
        best_k, best_cost = 0, None
        for k in range(15):
            cost = int((zig >> k).sum()) + len(zig) * (k + 1)
            if best_cost is None or cost < best_cost:
                best_cost, best_k = cost, k
        fw.write(best_k, 4)
        # vectorized Rice coder: each code is q zeros, a 1, then the
        # k low bits of the zigzag value MSB-first — build the whole
        # residual section as one 0/1 array and append it in one
        # packbits pass (bit-identical to the per-sample
        # write_unary/write loop this replaces; pinned by the
        # encode-fingerprint pytest)
        if len(zig):
            q = zig >> best_k
            ends = np.cumsum(q + 1 + best_k)
            sec = np.zeros(int(ends[-1]), np.uint8)
            sec[ends - best_k - 1] = 1
            for j in range(best_k):
                sec[ends - best_k + j] = \
                    ((zig >> (best_k - 1 - j)) & 1).astype(np.uint8)
            fw.write_bit_array(sec)
        fw.align()
        body = fw.bytes()
        out += body
        out += _crc16(body).to_bytes(2, "big")
    return bytes(out)


def decode_flac(blob: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a subset-FLAC stream -> (int16 samples, rate):
    STREAMINFO walk, per-frame sync + CRC-8 check, fixed-predictor
    reconstruction from Rice residuals, CRC-16 footer check, final
    MD5 check against STREAMINFO — every integrity layer the format
    defines is verified, a bit slip anywhere raises."""
    import hashlib

    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = n_total = None
    md5_expect = b""
    while True:
        last = blob[pos] >> 7
        btype = blob[pos] & 0x7F
        blen = int.from_bytes(blob[pos + 1:pos + 4], "big")
        body = blob[pos + 4:pos + 4 + blen]
        if btype == 0:
            br = _FlacBitReader(body)
            br.read(16); br.read(16); br.read(24); br.read(24)
            sr = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            n_total = br.read(36)
            md5_expect = body[18:34]
            if ch != 1 or bps != 16:
                raise NotImplementedError("subset decoder: mono/16-bit")
        pos += 4 + blen
        if last:
            break
    out = np.empty(n_total, dtype=np.int16)
    filled = 0
    # one unpack of the whole (KB-scale) stream feeds every frame's
    # vectorized Rice scan; header fields still go through the bit
    # reader (a few dozen bits per frame)
    allbits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    while filled < n_total:
        frame_start = pos
        br = _FlacBitReader(blob, pos * 8)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1); br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        if br.read(4) != 0:
            raise NotImplementedError("subset decoder: mono")
        if br.read(3) != 0b100:
            raise NotImplementedError("subset decoder: 16-bit")
        br.read(1)
        lead = br.read(8)  # UTF-8 frame number (value unused)
        for _ in range(7, 0, -1):
            if lead < 0x80:
                break
            if lead >> (8 - 2) == 0b110 or lead >> (8 - 3) == 0b1110 \
                    or lead >= 0xC0:
                pass
        # consume UTF-8 continuation bytes
        n_cont = 0
        if lead >= 0xF0:
            n_cont = 3
        elif lead >= 0xE0:
            n_cont = 2
        elif lead >= 0xC0:
            n_cont = 1
        for _ in range(n_cont):
            br.read(8)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if sr_code not in (0b0000,):
            raise NotImplementedError("subset decoder: rate from "
                                      "STREAMINFO")
        hdr_len = (br.pos // 8) - frame_start
        crc8 = br.read(8)
        if _crc8(blob[frame_start:frame_start + hdr_len]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        # subframe
        if br.read(1) != 0:
            raise ValueError("subframe padding bit set")
        stype = br.read(6)
        if br.read(1) != 0:
            raise NotImplementedError("wasted bits")
        if not (0b001000 <= stype <= 0b001100):
            raise NotImplementedError(f"subframe type {stype:06b} "
                                      "(subset decoder: FIXED)")
        order = stype & 0x07
        warm = [br.read(16) for _ in range(order)]
        warm = [w - 0x10000 if w >= 0x8000 else w for w in warm]
        method = br.read(2)
        if method not in (0, 1):
            raise ValueError("reserved residual method")
        pbits = 4 if method == 0 else 5
        po = br.read(4)
        nres = bs - order
        res_parts = []
        for p in range(1 << po):
            k = br.read(pbits)
            cnt = (bs >> po) - (order if p == 0 else 0)
            if k == (1 << pbits) - 1:
                raw = br.read(5)
                if cnt == 0:
                    continue
                if raw:
                    if br.pos + cnt * raw > len(allbits):
                        raise ValueError("escape residual truncated")
                    idx = br.pos + np.arange(cnt, dtype=np.int64)[:, None] \
                        * raw + np.arange(raw, dtype=np.int64)
                    v = allbits[idx].astype(np.int64) @ \
                        (np.int64(1) << np.arange(raw - 1, -1, -1,
                                                  dtype=np.int64))
                    v[v >= (1 << (raw - 1))] -= 1 << raw
                    br.pos += cnt * raw
                else:
                    v = np.zeros(cnt, np.int64)
                res_parts.append(v)
                continue
            if cnt == 0:
                continue
            vals, end = _rice_scan(allbits, br.pos, cnt, k)
            res_parts.append(vals)
            br.pos = end
        res = np.concatenate(res_parts) if res_parts \
            else np.zeros(0, np.int64)
        if len(res) != nres:
            raise ValueError("residual count mismatch")
        # FIXED order-o prediction is exactly the o-th difference
        # operator, so reconstruction is an o-fold cumulative sum
        # seeded by the warm-up ladder (np.diff of the warm samples)
        # — integer-exact, replacing the per-sample coefficient loop
        if order:
            warm_arr = np.asarray(warm, np.int64)
            y = res
            for j in range(order - 1, -1, -1):
                seed = np.diff(warm_arr, j)[0] if j else warm_arr[0]
                y = np.cumsum(np.concatenate([[seed], y]))
            samples = y
        else:
            samples = res
        # align + CRC-16 over the whole frame
        if br.pos % 8:
            br.read(8 - br.pos % 8)
        fend = br.pos // 8
        crc16 = int.from_bytes(blob[fend:fend + 2], "big")
        if _crc16(blob[frame_start:fend]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = fend + 2
        out[filled:filled + bs] = np.asarray(samples, dtype=np.int64) \
            .astype(np.int16)
        filled += bs
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("decoded-audio MD5 mismatch")
    return out, sr


FLAC_STATS_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, "
    "compressed_ok boolean, mean_amp double"
)


def render_flac_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL subset-FLAC per document, deterministically from
    ``doc_id``: ``n = 200 + (id % 4) * 100`` samples (always ≡ 0 mod
    5) of the ramp-plus-wobble law ``x_t = a + s·t + ((t·7919) % 5)
    − 2`` with ``a = (id % 50) * 20``, slope ``s = id % 3``, rate
    ``8000 · ((id % 2) + 1)``.  The ramp makes FIXED order 1-2 the
    winning predictor, the period-5 integer wobble keeps the Rice
    stream non-degenerate, and the wobble's mean is EXACTLY 2 over
    any multiple-of-5 length — so the signal mean stays in closed
    form for the SQL oracle.  ASSUMES doc_id >= 0."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 200 + (i % 4) * 100
                a = (i % 50) * 20
                s = i % 3
                t = np.arange(n, dtype=np.int64)
                sig = (a + s * t + (t * 7919) % 5 - 2).astype(np.int16)
                blobs.append(encode_flac(sig, 8000 * ((i % 2) + 1)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


def extract_flac_stats(media_df: DataFrame) -> DataFrame:
    """REAL-decode stats over a binary FLAC column — every decode
    verifies the format's THREE integrity layers (header CRC-8,
    frame CRC-16, stream MD5) before any stat is emitted; sums in
    int64, ONE division; ``compressed_ok`` receipts that prediction +
    Rice actually shrank the block (blob < half the raw PCM bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "n_samples", "sample_rate",
                                   "compressed_ok", "mean_amp")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(blob)
                sig, rate = decode_flac(raw)
                n = len(sig)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["compressed_ok"].append(bool(len(raw) < n))
                out["mean_amp"].append(
                    int(sig.astype(np.int64).sum()) / n if n else 0.0)
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="int32"),
                "sample_rate": pd.Series(out["sample_rate"],
                                         dtype="int32"),
                "compressed_ok": pd.Series(out["compressed_ok"],
                                           dtype="bool"),
                "mean_amp": pd.Series(out["mean_amp"], dtype="float64"),
            })

    return media_df.mapInPandas(batches, FLAC_STATS_SCHEMA)


def render_png_adam7_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL Adam7-INTERLACED PNG per document with the SAME
    deterministic pixel law as :func:`render_png_media` (so the same
    closed-form oracle predicts the decoded means); even ids filter
    None, odd ids filter Up within each pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 9) + 2
                h = int(doc_id % 6) + 2
                base = int(doc_id % 150)
                x = np.arange(w, dtype=np.int32)
                y = np.arange(h, dtype=np.int32)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = base + 3 * x[None, :] + 5 * y[:, None]
                px[:, :, 1] = base + 2 * x[None, :]
                px[:, :, 2] = base + y[:, None]
                blobs.append(encode_png_rgb8_adam7(
                    px, filter_type=2 if doc_id % 2 else 0))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


INTERLACED_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("interlaced_ok", BooleanType()),
    StructField("progressive_ok", BooleanType()),
])


def extract_png_interlaced_stats(media_df: DataFrame) -> DataFrame:
    """Adam7 decode stats + per-doc interlace invariants inside
    Arrow-batched ``mapInPandas``: exact channel means of the FINAL
    reconstruction (int64 sums / exact pixel count — oracle-able),
    ``interlaced_ok`` (IHDR says interlace=1 AND the seven pass grids
    tile the image exactly once — a scatter-count array reads 1
    everywhere), ``progressive_ok`` (the block-filled preview's L1
    error vs the final is ZERO after pass 7 and non-increasing across
    the 1 -> 4 -> 7 milestones — the property that makes interlacing
    worth its filter overhead on a slow link)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "mean_r", "mean_g",
                "mean_b", "interlaced_ok", "progressive_ok")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                w, h, final, previews = decode_png_adam7_passes(blob)
                sums = final.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = w * h
                cover = np.zeros((h, w), dtype=np.int32)
                for x0, y0, dx, dy in _ADAM7:
                    cover[y0::dy, x0::dx] += 1
                # IHDR interlace byte = last byte of the 13-byte IHDR
                # body that starts at offset 16
                inter_ok = (blob[16 + 12] == 1
                            and bool((cover == 1).all()))
                f64 = final.astype(np.int64)
                errs = [np.abs(p.astype(np.int64) - f64).mean()
                        for p in previews]
                prog_ok = (errs[6] == 0.0
                           and errs[0] >= errs[3] >= errs[6])
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(int(sums[0]) / n)
                out["mean_g"].append(int(sums[1]) / n)
                out["mean_b"].append(int(sums[2]) / n)
                out["interlaced_ok"].append(bool(inter_ok))
                out["progressive_ok"].append(bool(prog_ok))
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                "interlaced_ok": pd.Series(
                    out["interlaced_ok"], dtype="bool"),
                "progressive_ok": pd.Series(
                    out["progressive_ok"], dtype="bool"),
            })

    return media_df.mapInPandas(batches, INTERLACED_STATS_SCHEMA)


# --- TIFF baseline + PackBits (round 14): the tag-directory container


def _packbits_encode(data: bytes) -> bytes:
    """PackBits (Apple/TIFF RLE): greedy runs of >= 3 become
    (257-n, byte) pairs; everything else rides literal packets of up
    to 128 bytes.  Deterministic, so tests can pin byte output."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end):
        s = lit_start
        while s < end:
            chunk = data[s:min(s + 128, end)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            s += len(chunk)

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits inverse; raises on truncation or length mismatch."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:          # literal of c+1 bytes
            if i + c + 1 > n:
                raise ValueError("PackBits literal truncated")
            out.extend(data[i : i + c + 1])
            i += c + 1
        elif c > 128:        # run of 257-c copies
            if i >= n:
                raise ValueError("PackBits run truncated")
            out.extend(bytes([data[i]]) * (257 - c))
            i += 1
        # c == 128: no-op, per spec
    if len(out) != expect:
        raise ValueError(
            f"PackBits strip decoded {len(out)} bytes, expected {expect}")
    return bytes(out)


_TIFF_ROWS_PER_STRIP = 2


def encode_tiff_packbits(px: np.ndarray) -> bytes:
    """Encode ``(h, w, 3)`` uint8 RGB as a little-endian baseline TIFF
    with PACKBITS-compressed strips (RowsPerStrip=2, so any h > 2
    exercises multi-strip reassembly): 8-byte header, strip data,
    then the IFD with the nine baseline tags — dimension pair,
    BitsPerSample [8,8,8] (> 4 bytes, so it rides the value-offset
    mechanism like the strip arrays), Compression 32773,
    Photometric RGB, SamplesPerPixel 3, and the StripOffsets /
    StripByteCounts arrays.  The IFD-at-end layout is the common
    writer shape (offsets are explicit, nothing requires IFD-first)."""
    import struct as _s

    h, w, _ = px.shape
    rps = _TIFF_ROWS_PER_STRIP
    strips = []
    for y0 in range(0, h, rps):
        strips.append(_packbits_encode(px[y0:y0 + rps].tobytes()))
    n_strips = len(strips)
    # layout: header(8) | strip data | IFD | out-of-line values
    strip_offsets, pos = [], 8
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    entries = []  # (tag, type, count, packed-value-or-None, extra)

    def short(v):
        return _s.pack("<HH", v, 0)

    def long_(v):
        return _s.pack("<I", v)

    n_entries = 9
    extra_off = ifd_off + 2 + 12 * n_entries + 4
    extra = bytearray()

    def out_of_line(payload: bytes) -> bytes:
        nonlocal extra
        off = extra_off + len(extra)
        extra.extend(payload)
        return long_(off)

    bits = _s.pack("<HHH", 8, 8, 8)
    so_payload = b"".join(long_(o) for o in strip_offsets)
    sc_payload = b"".join(long_(len(s)) for s in strips)
    entries.append((256, 3, 1, short(w)))
    entries.append((257, 3, 1, short(h)))
    entries.append((258, 3, 3, out_of_line(bits)))
    entries.append((259, 3, 1, short(32773)))        # PackBits
    entries.append((262, 3, 1, short(2)))            # RGB
    entries.append((273, 4, n_strips,
                    long_(strip_offsets[0]) if n_strips == 1
                    else out_of_line(so_payload)))
    entries.append((277, 3, 1, short(3)))
    entries.append((278, 3, 1, short(rps)))
    entries.append((279, 4, n_strips,
                    long_(len(strips[0])) if n_strips == 1
                    else out_of_line(sc_payload)))
    ifd = _s.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        ifd += _s.pack("<HHI", tag, typ, cnt) + val
    ifd += long_(0)  # no next IFD
    return (_s.pack("<2sHI", b"II", 42, ifd_off)
            + b"".join(strips) + ifd + bytes(extra))


def decode_tiff_packbits(blob: bytes) -> tuple[int, int, np.ndarray, dict]:
    """REAL decode of a little-endian baseline PackBits TIFF ->
    ``(w, h, (h, w, 3) RGB uint8, info)``: header + IFD walk with
    inline-vs-offset value resolution, tag validation (RGB, 3x8
    bits, PackBits), per-strip RLE decode with exact length
    accounting, multi-strip reassembly.  ``info`` carries
    ``n_strips`` and ``compressed_bytes`` so callers can grade strip
    accounting and compression effectiveness.  Big-endian ('MM'),
    tiled, and non-PackBits variants raise loudly."""
    import struct as _s

    if blob[:2] == b"MM":
        raise NotImplementedError("big-endian TIFF not decoded here")
    if blob[:2] != b"II" or _s.unpack_from("<H", blob, 2)[0] != 42:
        raise ValueError("not a TIFF blob")
    tags: dict[int, list[int]] = {}
    try:
        (ifd_off,) = _s.unpack_from("<I", blob, 4)
        (n_entries,) = _s.unpack_from("<H", blob, ifd_off)
        type_size = {1: 1, 3: 2, 4: 4}
        for i in range(n_entries):
            tag, typ, cnt = _s.unpack_from(
                "<HHI", blob, ifd_off + 2 + 12 * i)
            voff = ifd_off + 2 + 12 * i + 8
            sz = type_size.get(typ)
            if sz is None:
                continue  # unknown type: skip, per reader convention
            if sz * cnt > 4:
                (voff,) = _s.unpack_from("<I", blob, voff)
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            tags[tag] = list(_s.unpack_from(f"<{cnt}{fmt}", blob, voff))
    except _s.error as exc:
        raise ValueError("truncated TIFF") from exc
    try:
        w, h = tags[256][0], tags[257][0]
        comp = tags[259][0]
        photo = tags[262][0]
        spp = tags[277][0]
        bits = tags[258]
        rps = tags[278][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing baseline tag {exc}") from exc
    if comp != 32773:
        raise NotImplementedError(f"TIFF compression {comp} not decoded")
    if (photo, spp, bits) != (2, 3, [8, 8, 8]):
        raise NotImplementedError(
            f"only 8-bit RGB decodes (photo={photo}, spp={spp}, "
            f"bits={bits})")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    rows = []
    remaining = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rps, remaining)
        raw = _packbits_decode(blob[off:off + cnt], strip_rows * w * 3)
        rows.append(np.frombuffer(raw, dtype=np.uint8)
                    .reshape(strip_rows, w, 3))
        remaining -= strip_rows
    if remaining != 0:
        raise ValueError("TIFF strips do not cover the image height")
    info = {"n_strips": len(offsets),
            "compressed_bytes": int(sum(counts))}
    return w, h, np.concatenate(rows, axis=0), info


def render_tiff_media(doc_df: DataFrame) -> DataFrame:
    """Render a REAL PackBits TIFF per document with a RUN-FRIENDLY
    pixel law: width ``(id % 10) + 3``, height ``(id % 6) + 2``, base
    ``id % 180``; EVEN rows are the constant gray ``base + 2y`` in
    all three channels (byte-level runs -> run packets), ODD rows are
    the gradient ``R = base + 3x, G = base + 2x, B = base + y``
    (literal packets) — so every strip exercises both packet kinds
    and the corpus-wide compressed size provably beats raw.  Max
    sample 212 < 256: no wrap, closed-form means."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for doc_id in pdf["doc_id"]:
                w = int(doc_id % 10) + 3
                h = int(doc_id % 6) + 2
                base = int(doc_id % 180)
                x = np.arange(w, dtype=np.int32)
                y = np.arange(h, dtype=np.int32)
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = base + 3 * x[None, :]
                px[:, :, 1] = base + 2 * x[None, :]
                px[:, :, 2] = base + y[:, None]
                even = (y % 2 == 0)
                gray = (base + 2 * y[even, None]).astype(np.uint8)
                for c in range(3):
                    px[even, :, c] = gray
                blobs.append(encode_tiff_packbits(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": blobs})

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return doc_df.select("doc_id").mapInPandas(batches, schema)


TIFF_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("container_ok", BooleanType()),
    StructField("rle_effective_ok", BooleanType()),
])


def extract_tiff_stats(media_df: DataFrame) -> DataFrame:
    """TIFF decode stats + container invariants in Arrow-batched
    ``mapInPandas``: exact channel means (int64 sums / exact pixel
    count), ``container_ok`` (strip count equals ceil(h /
    RowsPerStrip) — the IFD's strip arrays accounted for every row
    exactly once), ``rle_effective_ok`` (PackBits strip bytes total
    strictly under the raw 3wh — the run-friendly law must actually
    compress)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "mean_r", "mean_g",
                "mean_b", "container_ok", "rle_effective_ok")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb, info = decode_tiff_packbits(bytes(blob))
                sums = rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = w * h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(int(sums[0]) / n)
                out["mean_g"].append(int(sums[1]) / n)
                out["mean_b"].append(int(sums[2]) / n)
                out["container_ok"].append(
                    info["n_strips"]
                    == (h + _TIFF_ROWS_PER_STRIP - 1)
                    // _TIFF_ROWS_PER_STRIP)
                out["rle_effective_ok"].append(
                    info["compressed_bytes"] < 3 * w * h)
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "width": pd.Series(out["width"], dtype="int32"),
                "height": pd.Series(out["height"], dtype="int32"),
                "mean_r": pd.Series(out["mean_r"], dtype="float64"),
                "mean_g": pd.Series(out["mean_g"], dtype="float64"),
                "mean_b": pd.Series(out["mean_b"], dtype="float64"),
                "container_ok": pd.Series(
                    out["container_ok"], dtype="bool"),
                "rle_effective_ok": pd.Series(
                    out["rle_effective_ok"], dtype="bool"),
            })

    return media_df.mapInPandas(batches, TIFF_STATS_SCHEMA)
