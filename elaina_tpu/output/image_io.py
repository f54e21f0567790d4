"""Image IO: minimal OpenEXR writer/reader + PFM + PNG via Pillow.

Replaces the stb/tinyexr wrapper (util/image.{h,cpp}, SURVEY.md §2.0
"Image IO").  The EXR writer emits uncompressed float32 scanlines; the
reader additionally handles half-float channels and ZIP/ZIPS-compressed
scanline blocks (the formats tinyexr::load_exr accepts,
util/image.cpp:105-260), and ``read_pfm`` covers the reference's
pfm::ReadImagePFM (util/image.cpp:293-435).
"""

from __future__ import annotations

import struct

import numpy as np

_EXR_MAGIC = 0x01312F76
_PIXELTYPE_UINT = 0
_PIXELTYPE_HALF = 1
_PIXELTYPE_FLOAT = 2
_COMPRESSION_NONE = 0
_COMPRESSION_ZIPS = 2   # zlib, 1 scanline per block
_COMPRESSION_ZIP = 3    # zlib, 16 scanlines per block


def _attr(name: str, type_: str, payload: bytes) -> bytes:
    return name.encode() + b"\x00" + type_.encode() + b"\x00" + struct.pack(
        "<i", len(payload)) + payload


def write_exr(path: str, image: np.ndarray) -> None:
    """Write (H, W, C) float32 (C in {1, 3, 4}) as uncompressed EXR."""
    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    h, w, c = image.shape
    if c == 1:
        names = ["Y"]
    elif c == 3:
        names = ["R", "G", "B"]
    else:
        names = ["R", "G", "B", "A"]

    # channel list: alphabetical order required
    order = sorted(range(c), key=lambda i: names[i])
    chan_payload = b""
    for i in order:
        chan_payload += names[i].encode() + b"\x00" + struct.pack(
            "<iiii", _PIXELTYPE_FLOAT, 0, 1, 1)
    chan_payload += b"\x00"

    header = b""
    header += _attr("channels", "chlist", chan_payload)
    header += _attr("compression", "compression", b"\x00")  # none
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")      # increasing y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    scan_bytes = w * c * 4
    table_start = 8 + len(header)
    data_start = table_start + 8 * h
    offsets = [data_start + y * (8 + scan_bytes) for y in range(h)]

    with open(path, "wb") as f:
        f.write(struct.pack("<II", _EXR_MAGIC, 2))
        f.write(header)
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<ii", y, scan_bytes))
            # channel-planar within the scanline, alphabetical order
            row = image[y]
            f.write(np.ascontiguousarray(row[:, order].T).tobytes())


def _exr_unzip(block: bytes) -> bytes:
    """Undo the EXR zip transform: zlib + delta predictor + two-half byte
    interleave (OpenEXR ImfZip::uncompress order)."""
    import zlib

    raw = bytearray(zlib.decompress(block))
    for i in range(1, len(raw)):
        raw[i] = (raw[i] + raw[i - 1] - 128) & 0xFF
    out = np.empty(len(raw), np.uint8)
    half = (len(raw) + 1) // 2
    a = np.frombuffer(bytes(raw[:half]), np.uint8)
    b = np.frombuffer(bytes(raw[half:]), np.uint8)
    out[0::2] = a
    out[1::2] = b
    return out.tobytes()


def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR: float32/half channels, compression in
    {none, ZIPS, ZIP} (what the reference's tinyexr path handles for the
    files this framework and its tools exchange)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, _version = struct.unpack_from("<II", buf, 0)
    if magic != _EXR_MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    pos = 8
    channels: list[str] = []
    chan_types: list[int] = []
    data_window = None
    compression = 0
    while True:
        if buf[pos] == 0:
            pos += 1
            break
        name_end = buf.index(b"\x00", pos)
        name = buf[pos:name_end].decode()
        pos = name_end + 1
        type_end = buf.index(b"\x00", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos:pos + size]
        pos += size
        if name == "channels":
            p = 0
            while payload[p] != 0:
                ce = payload.index(b"\x00", p)
                channels.append(payload[p:ce].decode())
                chan_types.append(struct.unpack_from("<i", payload, ce + 1)[0])
                p = ce + 1 + 16
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)
        elif name == "compression":
            compression = payload[0]
    if compression not in (_COMPRESSION_NONE, _COMPRESSION_ZIPS,
                           _COMPRESSION_ZIP):
        raise NotImplementedError(
            f"unsupported EXR compression {compression} (none/ZIP/ZIPS only)")
    if any(t == _PIXELTYPE_UINT for t in chan_types):
        raise NotImplementedError("uint EXR channels not supported")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)
    lines_per_block = {_COMPRESSION_NONE: 1, _COMPRESSION_ZIPS: 1,
                       _COMPRESSION_ZIP: 16}[compression]
    n_blocks = -(-h // lines_per_block)
    pos += 8 * n_blocks  # offset table
    bpp = [2 if t == _PIXELTYPE_HALF else 4 for t in chan_types]
    line_bytes = w * sum(bpp)
    out = np.empty((h, w, c), np.float32)
    for blk in range(n_blocks):
        y_c, nbytes = struct.unpack_from("<ii", buf, pos)
        pos += 8
        data = buf[pos:pos + nbytes]
        pos += nbytes
        n_lines = min(lines_per_block, h - (y_c - y0))
        if compression != _COMPRESSION_NONE:
            if nbytes < n_lines * line_bytes:
                data = _exr_unzip(data)
        for li in range(n_lines):
            y = y_c - y0 + li
            o = li * line_bytes
            for ci in range(c):  # channel-planar, file (alphabetical) order
                if chan_types[ci] == _PIXELTYPE_HALF:
                    row = np.frombuffer(data, np.float16, w, o)
                    o += 2 * w
                else:
                    row = np.frombuffer(data, np.float32, w, o)
                    o += 4 * w
                out[y, :, ci] = row.astype(np.float32)
    # reorder alphabetical -> RGB[A] / Y
    want = ["R", "G", "B", "A"][:c] if c > 1 else channels
    idx = [channels.index(n) for n in want if n in channels]
    return out[..., idx] if len(idx) == c else out


def write_pfm(path: str, image: np.ndarray) -> None:
    """Write (H, W, 1|3) float32 as PFM (little-endian, bottom-up rows)."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ValueError("PFM supports 1 or 3 channels")
    with open(path, "wb") as f:
        f.write(b"PF\n" if c == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.000000\n")  # negative scale = little-endian
        f.write(np.ascontiguousarray(img[::-1]).tobytes())


def read_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> (H, W, C) float32, top-down rows
    (pfm::ReadImagePFM, util/image.cpp:344-433)."""
    with open(path, "rb") as f:
        buf = f.read()

    def token(p):
        while p < len(buf) and buf[p:p + 1].isspace():
            p += 1
        q = p
        while q < len(buf) and not buf[q:q + 1].isspace():
            q += 1
        return buf[p:q], q

    kind, p = token(0)
    if kind not in (b"PF", b"Pf"):
        raise ValueError(f"not a PFM file: {path}")
    c = 3 if kind == b"PF" else 1
    wtok, p = token(p)
    htok, p = token(p)
    stok, p = token(p)
    w, h, scale = int(wtok), int(htok), float(stok)
    p += 1  # single whitespace byte after the scale line
    dt = "<f4" if scale < 0 else ">f4"
    img = np.frombuffer(buf, dt, w * h * c, p).reshape(h, w, c)
    img = img.astype(np.float32) * (abs(scale) if abs(scale) not in
                                    (0.0, 1.0) else 1.0)
    return img[::-1].copy()  # PFM stores rows bottom-to-top


def write_hdr(path: str, image: np.ndarray) -> None:
    """Write (H, W, 3) float32 as Radiance RGBE (.hdr) with adaptive
    new-style RLE scanlines (the stbi__hdr format the reference loads,
    util/image.cpp:105-143)."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    h, w, _ = img.shape
    maxc = img.max(-1)
    mant, exp = np.frexp(maxc)                     # maxc = mant * 2^exp
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(maxc > 1e-32, mant * 256.0 / maxc, 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None] + 0.5, 0,
                            255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)

    def rle(comp: np.ndarray) -> bytes:            # one scanline component
        out = bytearray()
        i, n = 0, len(comp)
        while i < n:
            run = 1
            while i + run < n and run < 127 and comp[i + run] == comp[i]:
                run += 1
            if run >= 3:
                out += bytes((128 + run, comp[i]))
                i += run
            else:
                j = i
                while (j < n and j - i < 128
                       and not (j + 2 < n and comp[j] == comp[j + 1]
                                == comp[j + 2])):
                    j += 1
                out += bytes((j - i,)) + comp[i:j].tobytes()
                i = j
        return bytes(out)

    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        if 8 <= w < 32768:
            for y in range(h):
                f.write(bytes((2, 2, w >> 8, w & 0xFF)))
                for ci in range(4):
                    f.write(rle(rgbe[y, :, ci]))
        else:
            f.write(rgbe.tobytes())


def read_hdr(path: str) -> np.ndarray:
    """Read a Radiance RGBE (.hdr) file -> (H, W, 3) float32 (flat or
    new-style RLE scanlines)."""
    with open(path, "rb") as f:
        buf = f.read()
    if not buf.startswith(b"#?"):
        raise ValueError(f"not a Radiance HDR file: {path}")
    p = 0
    while True:                                    # header ends at blank line
        q = buf.index(b"\n", p)
        if q == p:
            break
        p = q + 1
    q = buf.index(b"\n", p + 1)
    dims = buf[p + 1:q].split()
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"unsupported HDR orientation: {dims}")
    h, w = int(dims[1]), int(dims[3])
    p = q + 1
    rgbe = np.zeros((h, w, 4), np.uint8)
    if 8 <= w < 32768 and buf[p:p + 2] == b"\x02\x02" \
            and (buf[p + 2] << 8 | buf[p + 3]) == w:
        for y in range(h):
            p += 4                                 # 2, 2, hi, lo marker
            for ci in range(4):
                x = 0
                while x < w:
                    cnt = buf[p]
                    p += 1
                    if cnt > 128:                  # run
                        rgbe[y, x:x + cnt - 128, ci] = buf[p]
                        x += cnt - 128
                        p += 1
                    else:                          # literal
                        rgbe[y, x:x + cnt, ci] = np.frombuffer(
                            buf, np.uint8, cnt, p)
                        x += cnt
                        p += cnt
    else:
        rgbe = np.frombuffer(buf, np.uint8, h * w * 4, p).reshape(h, w, 4)
    e = rgbe[..., 3].astype(np.int32)
    f32 = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0).astype(np.float32)
    return rgbe[..., :3].astype(np.float32) * f32[..., None]


def _linear_to_srgb(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def write_png(path: str, image: np.ndarray, srgb: bool = True) -> None:
    """Write (H, W, 3|4) float image as 8-bit PNG (float->sRGB like
    util/image.cpp's save path)."""
    from PIL import Image

    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    rgb = img[..., :3]
    rgb = _linear_to_srgb(rgb) if srgb else np.clip(rgb, 0, 1)
    out = (rgb * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(out).save(path)
