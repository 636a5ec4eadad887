"""Visualization: ST frames / raster tiles → PNG or JPG images.

Reference: `spatial/SpatialRDDFunctions.scala:68-93` + `java/dbis/
stark/visualization/Visualization.java:32-585` — per-partition images
rendered on executors, merged into one, optional background overlay,
PNG/JPG output; points (fillRect pointSize), polygons (outline or
fill), raster tiles via a color map; linear or mercator projection
(:260-296).

Same distributed split here, zero dependencies:

* point density (`render_points`) rides the raster subsystem's
  `rasterize` — distributed pixel counts, driver sees non-empty tiles;
* geometry rendering (`render_geoms`) maps each partition's geometries
  to LIT PIXEL ids (numpy kernels inside mapInPandas), dedups them
  with one small-int shuffle, and the driver composes only lit pixels
  (≤ width×height ints — the reference ships whole ARGB images per
  partition, :86-110; lit-pixel sets are strictly smaller);
* codecs are stdlib: minimal PNG encoder/decoder (gray/RGB/RGBA) and
  a baseline JPEG encoder (no PIL/matplotlib in this container).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# PNG codec (stdlib only)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body +
            struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _png_encode(img: np.ndarray) -> bytes:
    """8-bit PNG: HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, h, w = 0, *img.shape
        rows = img[:, :, None]
    else:
        h, w, ch = img.shape
        ctype = {1: 0, 3: 2, 4: 6}[ch]
        rows = img
    raw = b"".join(b"\x00" + rows[j].tobytes() for j in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) +
            _png_chunk(b"IDAT", zlib.compress(raw, 6)) +
            _png_chunk(b"IEND", b""))


def _png_bytes(gray: np.ndarray) -> bytes:
    """Back-compat alias: 8-bit grayscale PNG."""
    return _png_encode(gray)


def _png_decode(data: bytes) -> np.ndarray:
    """Minimal PNG reader (8-bit, non-interlaced, color types 0/2/6 —
    enough for background overlays produced by this module)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    off, w = 8, None
    idat = b""
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        body = data[off + 8:off + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or interlace != 0 or ctype not in (0, 2, 6):
                raise ValueError("unsupported PNG flavor")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + ln
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for j in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:          # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:          # Up
            line = (line.astype(np.int32) + prev) .astype(np.uint8)
        elif f == 3:          # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:          # Paeth
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"PNG filter {f}")
        out[j] = line
        prev = line
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# ---------------------------------------------------------------------------
# baseline JPEG encoder (stdlib only — ImageIO "jpg" parity,
# Visualization.java:210-220 saveImageAsLocalFile outputType)
# ---------------------------------------------------------------------------

_JPG_QL = np.array([  # Annex K luminance quant table
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# Annex K Huffman specs: (bits-per-length, values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_table(bits, values):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)   # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)   # pad with 1s


_DCT_M = np.array([[np.cos((2 * x + 1) * u * np.pi / 16) *
                    (np.sqrt(0.125) if u == 0 else 0.5)
                    for x in range(8)] for u in range(8)])


def _jpeg_encode_gray(gray: np.ndarray) -> bytes:
    """Baseline JFIF, single (luminance) component, 8×8 blocks."""
    h, w = gray.shape
    ph, pw = -h % 8, -w % 8
    img = np.pad(gray.astype(np.float64) - 128.0,
                 ((0, ph), (0, pw)), mode="edge")
    dc_t = _huff_table(*_DC_L)
    ac_t = _huff_table(*_AC_L)
    bw = _BitWriter()
    prev_dc = 0

    def cat(v):
        return 0 if v == 0 else int(v).bit_length() if v > 0 \
            else int(-v).bit_length()

    def put(v, ln):
        if ln:
            bw.write(v if v >= 0 else v + (1 << ln) - 1, ln)

    for by in range(0, img.shape[0], 8):
        for bx in range(0, img.shape[1], 8):
            block = img[by:by + 8, bx:bx + 8]
            coef = _DCT_M @ block @ _DCT_M.T
            q = np.round(coef / _JPG_QL).astype(np.int32).ravel()[_ZIGZAG]
            d = int(q[0]) - prev_dc
            prev_dc = int(q[0])
            ln = cat(d)
            bw.write(*dc_t[ln])
            put(d, ln)
            run = 0
            last_nz = np.nonzero(q[1:])[0]
            end = (last_nz[-1] + 2) if len(last_nz) else 1
            for i in range(1, end):
                v = int(q[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_t[0xF0])
                    run -= 16
                ln = cat(v)
                bw.write(*ac_t[(run << 4) | ln])
                put(v, ln)
                run = 0
            if end < 64:
                bw.write(*ac_t[0x00])      # EOB
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt = bytes([0]) + bytes(int(v) for v in _JPG_QL.ravel()[_ZIGZAG])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    dht = (bytes([0x00]) + bytes(_DC_L[0]) + bytes(_DC_L[1]) +
           bytes([0x10]) + bytes(_AC_L[0]) + bytes(_AC_L[1]))
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xFF\xD8" +
            seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00") +
            seg(0xDB, qt) + seg(0xC0, sof) + seg(0xC4, dht) +
            seg(0xDA, sos) + bytes(bw.buf) + b"\xFF\xD9")


def _jpeg_encode(img: np.ndarray) -> bytes:
    """JPG output (reference saveImageAsLocalFile outputType='jpg').
    Color images are encoded from their luminance (single-component
    baseline JPEG — compact, universally decodable)."""
    img = np.asarray(img)
    if img.ndim == 3:
        rgb = img[:, :, :3].astype(np.float64)
        img = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] +
               0.114 * rgb[:, :, 2])
    return _jpeg_encode_gray(img.astype(np.float64))


# ---------------------------------------------------------------------------
# baseline JPEG decoder (stdlib/numpy only) — the read side of the
# encoder above, and the real-decode path for multimodal JPEG columns
# in containers without PIL. Supports baseline DCT (SOF0), 8-bit
# quant tables, gray or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
# and restart markers.
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-coded-segment reader: de-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise EOFError("jpeg: truncated scan")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
            if nxt == 0x00:
                self.pos += 2          # stuffed FF
            else:
                raise EOFError("jpeg: marker in scan")   # caller handles
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Drop partial byte; skip an RSTn marker if present."""
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and \
                0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return


def _huff_decode_table(bits, values):
    """Canonical Huffman → {(length, code): symbol}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_read(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: bad Huffman code")


def _recv_extend(br: _BitReader, ln: int) -> int:
    if ln == 0:
        return 0
    v = br.bits(ln)
    return v if v >= (1 << (ln - 1)) else v - (1 << ln) + 1


def _jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 ndarray: (h, w) for grayscale, (h, w, 3)
    RGB for YCbCr. Raises ValueError on non-baseline streams."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None          # [(cid, hs, vs, tq)]
    w = h = 0
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:          # fill byte: next byte may be the marker
            pos -= 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq:
                    tbl = np.frombuffer(body, dtype=">u2", count=64,
                                        offset=off).astype(np.int32)
                    off += 128
                else:
                    tbl = np.frombuffer(body, dtype=np.uint8, count=64,
                                        offset=off).astype(np.int32)
                    off += 64
                z = np.zeros(64, dtype=np.int32)
                z[_ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC4:                     # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                values = list(body[off + 17:off + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, values)
                off += 17 + n
        elif marker == 0xC0:                     # SOF0 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline SOF")
        elif marker == 0xDD:                     # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                     # SOS
            ns = body[0]
            scan = {}                            # cid -> (dc_t, ac_t)
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0x0F)
            return _jpeg_decode_scan(
                data, pos + seglen, w, h, comps, qt, huff, scan, restart)
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _jpeg_decode_scan(data, pos, w, h, comps, qt, huff, scan, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    idct = _DCT_M.T          # orthonormal: B = M^T C M
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                br.align_to_marker()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_t = huff[(0, scan[cid][0])]
                ac_t = huff[(1, scan[cid][1])]
                for by in range(vs):
                    for bx in range(hs):
                        q = np.zeros(64, dtype=np.int32)
                        ln = _huff_read(br, dc_t)
                        pred[ci] += _recv_extend(br, ln)
                        q[0] = pred[ci]
                        i = 1
                        while i < 64:
                            rs = _huff_read(br, ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    i += 16
                                    continue
                                break            # EOB
                            i += r
                            if i > 63:
                                raise ValueError("jpeg: AC overflow")
                            q[_ZIGZAG[i]] = _recv_extend(br, s)
                            i += 1
                        block = q.reshape(8, 8) * qt[tq]
                        px = idct @ block @ idct.T
                        planes[ci][(my * vs + by) * 8:(my * vs + by) * 8 + 8,
                                   (mx * hs + bx) * 8:(mx * hs + bx) * 8 + 8] \
                            = px
    out = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        # upsample to full MCU grid resolution, then crop to (h, w)
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# projections (Visualization.java:260-296)
# ---------------------------------------------------------------------------

def _project(xs, ys, bounds, width, height, flip, projection):
    """World → integer pixel coords; NaN for outside-envelope points
    (linear) like the reference's `envelope.contains` guard."""
    x0, y0, x1, y1 = bounds
    if projection == "mercator":
        lat_bottom, lng_right, lng_left = -82.05, 180.0, -180.85
        d = lng_right - lng_left
        wm = ((width / d) * 360.0) / (2 * np.pi)
        off = wm / 2 * np.log((1 + np.sin(np.radians(lat_bottom))) /
                              (1 - np.sin(np.radians(lat_bottom))))
        px = (xs - lng_left) * (width / d)
        lat = np.radians(ys)
        py = height - (wm / 2 * np.log((1 + np.sin(lat)) /
                                       (1 - np.sin(lat))) - off)
        return np.floor(px).astype(np.int64), np.floor(py).astype(np.int64)
    sx = width / (x1 - x0)
    sy = height / (y1 - y0)
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    yy = ((y0 + y1) - ys) if flip else ys
    px = np.floor((xs - x0) * sx).astype(np.int64)
    py = np.floor((yy - y0) * sy).astype(np.int64)
    px = np.where(inside, px, -1)
    py = np.where(inside, py, -1)
    return px, py


def _clip_pix(pi, pj, width, height):
    ok = (pi >= 0) & (pi < width) & (pj >= 0) & (pj < height)
    return pi[ok], pj[ok]


# ---------------------------------------------------------------------------
# geometry → lit pixels (numpy kernels, run inside mapInPandas)
# ---------------------------------------------------------------------------

def _geom_pixels(g, bounds, width, height, point_size, fill,
                 flip, projection) -> np.ndarray:
    """Lit pixel ids (j*width + i) for one geometry."""
    out = []
    for part in g.parts():
        if part.kind == "POINT":
            px, py = _project(np.array([part.coords[0]]),
                              np.array([part.coords[1]]),
                              bounds, width, height, flip, projection)
            if px[0] < 0:
                continue
            # fillRect(p, pointSize) — Visualization.java:256-258
            di, dj = np.meshgrid(np.arange(point_size),
                                 np.arange(point_size))
            pi = (px[0] + di.ravel())
            pj = (py[0] + dj.ravel())
            pi, pj = _clip_pix(pi, pj, width, height)
            out.append(pj * width + pi)
        elif part.kind == "LINESTRING":
            out.append(_path_pixels(part.coords, bounds, width, height,
                                    flip, projection, close=False))
        else:   # POLYGON
            if fill:
                out.append(_fill_pixels(part, bounds, width, height,
                                        flip, projection))
            else:
                for ring in part.coords:
                    out.append(_path_pixels(ring, bounds, width, height,
                                            flip, projection, close=True))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def _path_pixels(coords, bounds, width, height, flip, projection,
                 close) -> np.ndarray:
    """Rasterize a vertex path: per edge, sample max(|di|,|dj|)+1
    evenly-spaced points and round — a vectorized Bresenham stand-in
    with identical connectivity."""
    px, py = _project(coords[:, 0], coords[:, 1], bounds, width, height,
                      flip, projection)
    # reference skips outside-envelope vertices entirely
    # (getImageCoordinates → null → not added to the awt Polygon)
    keep = ~((px == -1) & (py == -1))
    px, py = px[keep], py[keep]
    segs = []
    n = len(px)
    for k in range(n - 1):
        a, b = k, k + 1
        steps = int(max(abs(px[b] - px[a]), abs(py[b] - py[a]))) + 1
        ts = np.linspace(0.0, 1.0, steps)
        pi = np.round(px[a] + (px[b] - px[a]) * ts).astype(np.int64)
        pj = np.round(py[a] + (py[b] - py[a]) * ts).astype(np.int64)
        pi, pj = _clip_pix(pi, pj, width, height)
        segs.append(pj * width + pi)
    if not segs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(segs)


def _fill_pixels(poly, bounds, width, height, flip,
                 projection) -> np.ndarray:
    """Filled polygon: PIP test on the pixel centers of the polygon's
    bbox window (fillPolygon parity, holes honored by the even-odd
    kernel)."""
    from stark_spark.core import geometry as G

    if projection == "mercator":
        # awt fillPolygon parity (Visualization.java:260-296): project
        # each vertex first, then fill the straight-edge polygon in
        # PIXEL space — mercator is applied per-vertex, not per-pixel.
        from stark_spark.core.geometry import _on_ring, _ring_pip
        rings = []
        for ring in poly.coords:
            px, py = _project(ring[:, 0], ring[:, 1], bounds, width,
                              height, flip, projection)
            rings.append(np.column_stack([px, py]).astype(np.float64))
        shell = rings[0]
        i0 = max(0, int(shell[:, 0].min()))
        i1 = min(width - 1, int(shell[:, 0].max()))
        j0 = max(0, int(shell[:, 1].min()))
        j1 = min(height - 1, int(shell[:, 1].max()))
        if i1 < i0 or j1 < j0:
            return np.empty(0, dtype=np.int64)
        ii, jj = np.meshgrid(np.arange(i0, i1 + 1),
                             np.arange(j0, j1 + 1))
        ii, jj = ii.ravel(), jj.ravel()
        cx, cy = ii + 0.5, jj + 0.5   # pixel centers vs int-coord rings
        ok = _ring_pip(cx, cy, shell) | _on_ring(cx, cy, shell)
        for hole in rings[1:]:
            ok &= ~(_ring_pip(cx, cy, hole) & ~_on_ring(cx, cy, hole))
        return (jj[ok] * width + ii[ok]).astype(np.int64)
    x0, y0, x1, y1 = bounds
    sx = width / (x1 - x0)
    sy = height / (y1 - y0)
    bx0, by0, bx1, by1 = poly.bbox
    i0 = max(0, int(np.floor((bx0 - x0) * sx)))
    i1 = min(width - 1, int(np.floor((bx1 - x0) * sx)))
    # y extent in pixel space depends on flip; compute both corners
    ys = [by0, by1]
    if flip:
        ys = [(y0 + y1) - v for v in ys]
    j0 = max(0, int(np.floor((min(ys) - y0) * sy)))
    j1 = min(height - 1, int(np.floor((max(ys) - y0) * sy)))
    if i1 < i0 or j1 < j0:
        return np.empty(0, dtype=np.int64)
    ii, jj = np.meshgrid(np.arange(i0, i1 + 1), np.arange(j0, j1 + 1))
    ii, jj = ii.ravel(), jj.ravel()
    # pixel centers back to world coords
    wx = x0 + (ii + 0.5) / sx
    wy = y0 + (jj + 0.5) / sy
    if flip:
        wy = (y0 + y1) - wy
    ok = G.points_in_polygon(wx, wy, poly, boundary=True)
    return (jj[ok] * width + ii[ok]).astype(np.int64)


def lit_pixels(df: DataFrame, width: int, height: int, *,
               geom_col: str = "geom",
               bounds: tuple[float, float, float, float],
               point_size: int = 1, fill: bool = False,
               flip: bool = True, projection: str = "linear") -> DataFrame:
    """Distributed render stage: geometries → DISTINCT lit pixel ids.

    One narrow mapInPandas pass (numpy kernels per partition) then a
    small-int distinct — the composition shuffle carries at most
    width×height ids no matter how many geometries were drawn (the
    reference merges full per-partition ARGB images instead,
    Visualization.java:104-110)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from stark_spark.core import geometry as G

    schema = StructType([StructField("pix", LongType())])

    def run(batches):
        for pdf in batches:
            acc = []
            for b in pdf[geom_col]:
                if b is None:
                    continue
                g = G.from_wkb(bytes(b))
                acc.append(_geom_pixels(g, bounds, width, height,
                                        point_size, fill, flip, projection))
            pix = (np.unique(np.concatenate(acc))
                   if acc else np.empty(0, dtype=np.int64))
            yield pd.DataFrame({"pix": pix})

    return df.select(geom_col).mapInPandas(run, schema).distinct()


def render_geoms(df: DataFrame, width: int, height: int, *,
                 geom_col: str = "geom",
                 bounds: tuple[float, float, float, float],
                 color: tuple[int, int, int] = (255, 0, 0),
                 point_size: int = 1, fill: bool = False,
                 background: bytes | str | None = None,
                 flip: bool = True, projection: str = "linear",
                 fmt: str = "png", path: str | None = None) -> bytes:
    """Full-parity renderer (Visualization.java draw(), :86-127):
    points / linestrings / polygons (outline or fill) in an RGB(A)
    color, optional background image underlay, PNG or JPG output."""
    pix = np.array([r.pix for r in
                    lit_pixels(df, width, height, geom_col=geom_col,
                               bounds=bounds, point_size=point_size,
                               fill=fill, flip=flip,
                               projection=projection).collect()],
                   dtype=np.int64)

    if background is not None:
        if isinstance(background, str):
            with open(background, "rb") as f:
                background = f.read()
        bg = _png_decode(background)
        if bg.ndim == 2:
            bg = np.stack([bg] * 3, axis=-1)
        bg = bg[:, :, :3]
        if bg.shape[:2] != (height, width):
            raise ValueError(
                f"background {bg.shape[:2]} != image {(height, width)}")
        img = bg.copy()
    else:
        img = np.zeros((height, width, 3), dtype=np.uint8)

    if len(pix):
        jj, ii = np.divmod(pix, width)
        img[jj, ii] = np.array(color, dtype=np.uint8)

    data = _jpeg_encode(img) if fmt in ("jpg", "jpeg") else _png_encode(img)
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


# ---------------------------------------------------------------------------
# raster tile rendering (Visualization.java:129-208 + colorMap :328-585)
# ---------------------------------------------------------------------------

def default_colormap() -> np.ndarray:
    """256×3 light-blue→red ramp in the spirit of the reference's
    colorMap (Visualization.java:328-585)."""
    t = np.linspace(0.0, 1.0, 256)
    r = np.clip(3.0 * (t - 0.4) * 255, 0, 255)
    g = np.clip((1.0 - np.abs(t - 0.45) * 2.2) * 255, 0, 255)
    b = np.clip((1.0 - t * 1.4) * 255, 40, 255)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def render_tiles(tiles: DataFrame, width: int, height: int, *,
                 bounds: tuple[float, float, float, float],
                 lo: float = 0.0, hi: float | None = None,
                 colormap: np.ndarray | None = None,
                 nodata: float | None = None,
                 fmt: str = "png", path: str | None = None) -> bytes:
    """Raster tiles → colormapped image (reference drawRaster /
    visualize(Tile RDD), :58-84,129-208: value → colorMap index, black
    for nodata). Tiles are collected (only non-empty tiles exist) and
    composed on the driver; values scale linearly [lo, hi] → [0, 255].
    """
    cmap = colormap if colormap is not None else default_colormap()
    x0, y0, x1, y1 = bounds
    rows = tiles.select("ulx", "uly", "width", "height", "pixel_width",
                        "data").collect()
    if hi is None:
        hi = max((max(r.data) for r in rows if len(r.data)), default=1.0)
        hi = float(hi) or 1.0
    img = np.zeros((height, width, 3), dtype=np.uint8)
    sx = width / (x1 - x0)
    sy = height / (y1 - y0)
    for t in rows:
        arr = np.asarray(t.data, dtype=np.float64).reshape(t.height, t.width)
        pw = t.pixel_width
        for jj in range(t.height):
            wy = t.uly - (jj + 0.5) * pw
            pj = int(np.floor((y1 - wy) * sy))
            if pj < 0 or pj >= height:
                continue
            for ii in range(t.width):
                wx = t.ulx + (ii + 0.5) * pw
                pi = int(np.floor((wx - x0) * sx))
                if pi < 0 or pi >= width:
                    continue
                v = arr[jj, ii]
                if nodata is not None and v == nodata:
                    img[pj, pi] = 0
                    continue
                idx = int(np.clip((v - lo) * 255.0 / (hi - lo), 0, 255))
                img[pj, pi] = cmap[idx]
    data = _jpeg_encode(img) if fmt in ("jpg", "jpeg") else _png_encode(img)
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


# ---------------------------------------------------------------------------
# point density (round-1 renderer, kept: distributed rasterize path)
# ---------------------------------------------------------------------------

def render_points(df: DataFrame, width: int, height: int, *,
                  x: str = "x", y: str = "y",
                  bounds: tuple[float, float, float, float] | None = None,
                  path: str | None = None) -> bytes:
    """Render point density to a PNG (white = dense). ``bounds`` =
    (xmin, ymin, xmax, ymax) world window; default = data bounds.
    Returns the PNG bytes; also writes ``path`` when given."""
    from pyspark.sql import functions as F

    from stark_spark.raster import rasterize

    if bounds is None:
        r = df.agg(F.min(x), F.min(y), F.max(x), F.max(y)).first()
        bounds = (float(r[0]), float(r[1]), float(r[2]) + 1e-9, float(r[3]) + 1e-9)
    x0, y0, x1, y1 = bounds
    pw = max((x1 - x0) / width, (y1 - y0) / height)
    # one tile per row of TILE_PX² pixels; driver only sees non-empty tiles
    tiles = rasterize(df.where((F.col(x) >= x0) & (F.col(x) < x1) &
                               (F.col(y) >= y0) & (F.col(y) < y1)),
                      tile_px=64, pixel_width=pw, x=x, y=y,
                      origin=(x0, y0)).collect()

    img = np.zeros((height, width), dtype=np.int64)
    for t in tiles:
        arr = np.asarray(t.data, dtype=np.int64).reshape(t.height, t.width)
        # tile ul in pixel space (y down)
        pi = int(round((t.ulx - x0) / pw))
        pj = int(round((y1 - t.uly) / pw))
        j0, i0 = max(0, pj), max(0, pi)
        j1 = min(height, pj + t.height)
        i1 = min(width, pi + t.width)
        if j1 <= j0 or i1 <= i0:
            continue
        img[j0:j1, i0:i1] += arr[j0 - pj:j1 - pj, i0 - pi:i1 - pi]

    mx = img.max()
    gray = (img * (255.0 / mx)).astype(np.uint8) if mx > 0 else \
        img.astype(np.uint8)
    png = _png_bytes(gray)
    if path:
        with open(path, "wb") as f:
            f.write(png)
    return png
