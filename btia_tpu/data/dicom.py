"""Minimal DICOM reader/writer — covers the ingest path [B:5, B:11].

pydicom is not available in this environment [SURVEY §7.1], so this module
implements the slice of DICOM the medical-VQA ingest actually needs:

  * Part-10 files (128-byte preamble + 'DICM') and raw datasets;
  * explicit- and implicit-VR little endian transfer syntaxes;
  * uncompressed PixelData, 8/16-bit, signed/unsigned, MONOCHROME1/2 + RGB;
  * rescale slope/intercept and window center/width → display uint8.

Compressed transfer syntaxes (JPEG family) raise a clear error — out of
scope for round 1; the JPEG path goes through data/image.py instead.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

# Tags we care about: (group, element)
TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)
TAG_PHOTOMETRIC = (0x0028, 0x0004)
TAG_SAMPLES_PER_PIXEL = (0x0028, 0x0002)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_WINDOW_CENTER = (0x0028, 0x1050)
TAG_WINDOW_WIDTH = (0x0028, 0x1051)
TAG_RESCALE_INTERCEPT = (0x0028, 0x1052)
TAG_RESCALE_SLOPE = (0x0028, 0x1053)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)

EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"

# VRs with a 4-byte length field (and 2 reserved bytes) in explicit VR.
_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN", b"UC", b"UR"}


@dataclasses.dataclass
class DicomImage:
    pixels: np.ndarray  # (H, W) or (H, W, 3), raw stored values
    photometric: str = "MONOCHROME2"
    rescale_slope: float = 1.0
    rescale_intercept: float = 0.0
    window_center: Optional[float] = None
    window_width: Optional[float] = None

    def to_uint8(self) -> np.ndarray:
        """Apply rescale + window (or min/max) → display uint8 (H, W[, 3])."""
        px = self.pixels.astype(np.float32)
        if self.photometric.startswith("MONOCHROME"):
            px = px * self.rescale_slope + self.rescale_intercept
            if self.window_center is not None and self.window_width:
                lo = self.window_center - self.window_width / 2.0
                hi = self.window_center + self.window_width / 2.0
            else:
                lo, hi = float(px.min()), float(px.max())
            if hi <= lo:
                hi = lo + 1.0
            px = np.clip((px - lo) / (hi - lo), 0.0, 1.0)
            if self.photometric == "MONOCHROME1":  # inverted scale
                px = 1.0 - px
            return (px * 255.0 + 0.5).astype(np.uint8)
        return np.clip(px, 0, 255).astype(np.uint8)

    def to_rgb_uint8(self) -> np.ndarray:
        u8 = self.to_uint8()
        if u8.ndim == 2:
            u8 = np.repeat(u8[:, :, None], 3, axis=2)
        return u8


def _parse_elements(
    buf: bytes, offset: int, explicit: bool, stop_at_pixels: bool = False
) -> Dict[Tuple[int, int], bytes]:
    """Parse data elements from offset to EOF. Returns tag → raw value."""
    out: Dict[Tuple[int, int], bytes] = {}
    n = len(buf)
    pos = offset
    while pos + 8 <= n:
        group, elem = struct.unpack_from("<HH", buf, pos)
        pos += 4
        # File-meta group (0002) is always explicit VR.
        is_explicit = explicit or group == 0x0002
        if is_explicit:
            vr = buf[pos : pos + 2]
            if vr in _LONG_VRS:
                length = struct.unpack_from("<I", buf, pos + 4)[0]
                pos += 8
            else:
                length = struct.unpack_from("<H", buf, pos + 2)[0]
                pos += 4
        else:
            length = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError(
                "undefined-length (encapsulated/compressed) DICOM element "
                f"at tag ({group:04x},{elem:04x}) — compressed transfer "
                "syntaxes are not supported; decode JPEG via data/image.py"
            )
        out[(group, elem)] = buf[pos : pos + length]
        pos += length
        if stop_at_pixels and (group, elem) == TAG_PIXEL_DATA:
            break
    return out


def _ascii(v: bytes) -> str:
    return v.decode("ascii", errors="ignore").strip("\x00 ").strip()


def _first_float(v: bytes) -> Optional[float]:
    s = _ascii(v).split("\\")[0].strip()
    try:
        return float(s)
    except ValueError:
        return None


def _u16(v: bytes) -> int:
    return struct.unpack("<H", v[:2])[0]


def read_dicom(data: Union[bytes, str, Path]) -> DicomImage:
    if not isinstance(data, bytes):
        data = Path(data).read_bytes()
    if len(data) > 132 and data[128:132] == b"DICM":
        meta_start = 132
    elif data[:4] == b"DICM":
        meta_start = 4
    else:
        meta_start = 0  # raw dataset, assume implicit VR LE

    # Probe: file-meta present → read transfer syntax; else sniff explicit VR.
    if meta_start:
        elements = _parse_elements(data, meta_start, explicit=True, stop_at_pixels=True)
        ts = _ascii(elements.get(TAG_TRANSFER_SYNTAX, EXPLICIT_VR_LE.encode()))
        if ts == IMPLICIT_VR_LE:
            # Re-parse body as implicit (file meta stays explicit — handled
            # by the group-0002 carve-out in _parse_elements).
            elements = _parse_elements(
                data, meta_start, explicit=False, stop_at_pixels=True
            )
        elif ts != EXPLICIT_VR_LE:
            raise ValueError(
                f"unsupported DICOM transfer syntax {ts!r} (compressed?)"
            )
    else:
        # Sniff: explicit files start elements with a printable VR.
        vr_probe = data[4:6]
        explicit = vr_probe.isalpha() and vr_probe.isupper()
        elements = _parse_elements(data, 0, explicit, stop_at_pixels=True)

    rows = _u16(elements[TAG_ROWS])
    cols = _u16(elements[TAG_COLS])
    bits = _u16(elements.get(TAG_BITS_ALLOCATED, b"\x08\x00"))
    signed = _u16(elements.get(TAG_PIXEL_REPRESENTATION, b"\x00\x00")) == 1
    samples = _u16(elements.get(TAG_SAMPLES_PER_PIXEL, b"\x01\x00"))
    photometric = _ascii(
        elements.get(TAG_PHOTOMETRIC, b"MONOCHROME2")
    ) or "MONOCHROME2"

    raw = elements[TAG_PIXEL_DATA]
    dtype = {
        (8, False): np.uint8,
        (8, True): np.int8,
        (16, False): np.uint16,
        (16, True): np.int16,
    }[(bits, signed)]
    count = rows * cols * samples
    px = np.frombuffer(raw, dtype=dtype, count=count)
    px = px.reshape((rows, cols) if samples == 1 else (rows, cols, samples))

    return DicomImage(
        pixels=px,
        photometric=photometric,
        rescale_slope=_first_float(elements.get(TAG_RESCALE_SLOPE, b"1")) or 1.0,
        rescale_intercept=_first_float(elements.get(TAG_RESCALE_INTERCEPT, b"0"))
        or 0.0,
        window_center=_first_float(elements.get(TAG_WINDOW_CENTER, b"")),
        window_width=_first_float(elements.get(TAG_WINDOW_WIDTH, b"")),
    )


# ---------------------------------------------------------------------------
# Writer (tests/fixtures + synthetic streaming sources)
# ---------------------------------------------------------------------------


def _element(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem)
    if vr in _LONG_VRS:
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def write_dicom(
    path: Union[str, Path, None],
    pixels: np.ndarray,
    photometric: Optional[str] = None,
    window: Optional[Tuple[float, float]] = None,
    rescale: Tuple[float, float] = (1.0, 0.0),
) -> bytes:
    """Serialize an array as a minimal explicit-VR-LE Part-10 DICOM file."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 3:
        samples, photometric = pixels.shape[2], photometric or "RGB"
    else:
        samples, photometric = 1, photometric or "MONOCHROME2"
    bits = pixels.dtype.itemsize * 8
    signed = np.issubdtype(pixels.dtype, np.signedinteger)

    meta = _element(
        0x0002, 0x0010, b"UI", EXPLICIT_VR_LE.encode()
    )
    body = b""
    body += _element(0x0028, 0x0002, b"US", struct.pack("<H", samples))
    body += _element(0x0028, 0x0004, b"CS", photometric.encode())
    body += _element(0x0028, 0x0010, b"US", struct.pack("<H", pixels.shape[0]))
    body += _element(0x0028, 0x0011, b"US", struct.pack("<H", pixels.shape[1]))
    body += _element(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += _element(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))
    if window is not None:
        body += _element(0x0028, 0x1050, b"DS", str(window[0]).encode())
        body += _element(0x0028, 0x1051, b"DS", str(window[1]).encode())
    body += _element(0x0028, 0x1052, b"DS", str(rescale[1]).encode())
    body += _element(0x0028, 0x1053, b"DS", str(rescale[0]).encode())
    vr = b"OB" if bits == 8 else b"OW"
    body += _element(0x7FE0, 0x0010, vr, pixels.tobytes())

    blob = b"\x00" * 128 + b"DICM" + meta + body
    if path is not None:
        Path(path).write_bytes(blob)
    return blob
