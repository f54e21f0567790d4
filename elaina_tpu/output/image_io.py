"""Image IO: minimal OpenEXR writer/reader + PNG via Pillow.

Replaces the stb/tinyexr wrapper (util/image.{h,cpp}, SURVEY.md §2.0
"Image IO").  The EXR path implements the uncompressed scanline format
directly (float32, RGB[A]) — enough for solution/energy dumps and for
reading our own files back in tests and RMSE tooling.
"""

from __future__ import annotations

import struct

import numpy as np

_EXR_MAGIC = 0x01312F76
_PIXELTYPE_FLOAT = 2


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


def read_exr(path: str) -> np.ndarray:
    """Read an EXR written by write_exr (uncompressed float scanlines)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, _version = struct.unpack_from("<II", buf, 0)
    if magic != _EXR_MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    pos = 8
    channels: list[str] = []
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
                p = ce + 1 + 16
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)
        elif name == "compression":
            compression = payload[0]
    if compression != 0:
        raise NotImplementedError("only uncompressed EXR supported")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    c = len(channels)
    pos += 8 * h  # offset table
    out = np.empty((h, w, c), np.float32)
    for y in range(h):
        _yc, nbytes = struct.unpack_from("<ii", buf, pos)
        pos += 8
        row = np.frombuffer(buf, np.float32, w * c, pos).reshape(c, w)
        out[y] = row.T
        pos += nbytes
    # reorder alphabetical -> RGB[A] / Y
    want = ["R", "G", "B", "A"][:c] if c > 1 else channels
    idx = [channels.index(n) for n in want if n in channels]
    return out[..., idx] if len(idx) == c else out


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
