"""GIF (87a/89a) codec in pure Python/numpy — no external libraries.

Single-frame GIF with LZW compression: the encoder palettizes an RGB
image (<=256 unique colors, else :class:`UnsupportedCodec`), packs
variable-width LZW codes LSB-first into 255-byte sub-blocks; the
decoder walks the block structure (extensions skipped, local color
tables and Adam-style 4-pass interlacing supported) and inflates the
code stream back to palette indices. Palette mapping and (de)interlace
row shuffles are numpy; the LZW string table is inherently sequential
so that loop stays scalar — GIF rows ride the same mapInPandas decode
boundary as every other codec (sparkfp/multimodal.py), so at cluster
scale the per-clip loop is still batch-parallel across rows.

Error contract (what sparkfp.multimodal depends on): malformed bytes
raise ValueError, features this codec does not implement raise
UnsupportedCodec — never struct.error/IndexError.

Reference parity anchor: media bytes are an opaque decode boundary in
the reference (src/flink_job/serialization.py:14-20); GIF widens the
real-decode surface of that boundary.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import UnsupportedCodec

# interlace passes: (row offset, row step) in pass order
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row indices in the order an interlaced stream stores them."""
    return np.concatenate(
        [np.arange(off, h, step) for off, step in _INTERLACE]
    ).astype(np.int64)


# --------------------------------------------------------------- encode


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects HxWx3 uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"gif dimensions out of range: {h}x{w}")
    palette, indices = np.unique(
        img.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(palette) > 256:
        raise UnsupportedCodec(f"gif needs <=256 colors, got {len(palette)}")
    # global color table size is a power of two, minimum 2 entries
    gct_bits = 0
    while (1 << (gct_bits + 1)) < len(palette):
        gct_bits += 1
    gct_n = 1 << (gct_bits + 1)
    table = np.zeros((gct_n, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    idx = indices.reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | gct_bits, 0, 0)
    out += table.tobytes()
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    mcs = max(2, gct_bits + 1)  # LZW minimum code size
    out.append(mcs)
    out += _lzw_compress(idx.reshape(-1).astype(np.int32), mcs)
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _lzw_compress(pixels: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW: emitted codes grow 1 bit when the next table
    entry would not fit, table resets via CLEAR at 4096. Codes are
    packed LSB-first and wrapped into <=255-byte sub-blocks."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bits = bytearray()  # bit accumulator via (acc, nbits)
    acc = nbits = 0
    packed = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    prefix = b""
    for p in pixels.tolist():
        cur = prefix + bytes([p])
        if cur in table:
            prefix = cur
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = end + 1
            width = mcs + 1
        prefix = bytes([p])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        packed.append(acc & 0xFF)
    for i in range(0, len(packed), 255):
        chunk = packed[i: i + 255]
        bits.append(len(chunk))
        bits += chunk
    return bytes(bits)


# --------------------------------------------------------------- decode


def decode_gif(raw: bytes) -> np.ndarray:
    """First image of a GIF -> HxWx3 uint8 RGB."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF87a/GIF89a stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 3 * (1 << ((flags & 7) + 1))
        gct = raw[pos: pos + n]
        if len(gct) < n:
            raise ValueError("truncated GIF global color table")
        pos += n
    while pos < len(raw):
        block = raw[pos]
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            pos = _skip_subblocks(raw, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 10 > len(raw):
            raise ValueError("truncated GIF image descriptor")
        _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
        pos += 10
        if w == 0 or h == 0:
            raise ValueError("empty GIF image")
        ct = gct
        if iflags & 0x80:  # local color table wins
            n = 3 * (1 << ((iflags & 7) + 1))
            ct = raw[pos: pos + n]
            if len(ct) < n:
                raise ValueError("truncated GIF local color table")
            pos += n
        if ct is None:
            raise UnsupportedCodec("gif image without color table")
        if pos >= len(raw):
            raise ValueError("truncated GIF before LZW data")
        mcs = raw[pos]
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        pos += 1
        data, pos = _read_subblocks(raw, pos)
        indices = _lzw_decompress(data, mcs, w * h)
        palette = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
        if int(indices.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        img = palette[indices].reshape(h, w, 3)
        if iflags & 0x40:
            deinter = np.empty_like(img)
            deinter[_interlace_order(h)] = img
            img = deinter
        return img
    raise ValueError("truncated GIF: no image block found")


def _skip_subblocks(raw: bytes, pos: int) -> int:
    while True:
        if pos >= len(raw):
            raise ValueError("truncated GIF sub-blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _read_subblocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(raw):
            raise ValueError("truncated GIF sub-blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunk = raw[pos: pos + n]
        if len(chunk) < n:
            raise ValueError("truncated GIF sub-block body")
        chunks.append(chunk)
        pos += n


def _lzw_decompress(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW with a materialized bytearray string table
    (the oracle's second implementation stores (prefix, byte) pairs
    and walks chains instead — different layout on purpose)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)]
    table += [b""] * 2  # clear / end placeholders
    width = mcs + 1
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([k]) for k in range(1 << mcs)]
                table += [b""] * 2
                width = mcs + 1
                prev = None
                continue
            if code == end:
                if len(out) < n_pixels:
                    raise ValueError("GIF LZW stream ended early")
                return np.frombuffer(
                    bytes(out[:n_pixels]), dtype=np.uint8
                ).astype(np.int64)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first GIF LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                # some writers omit END; stop once the raster is full
                return np.frombuffer(
                    bytes(out[:n_pixels]), dtype=np.uint8
                ).astype(np.int64)
    raise ValueError("GIF LZW stream ended without END code")
