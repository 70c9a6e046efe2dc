"""Native C++ ingest library vs the Python reference implementation
[SURVEY §2.4 — the build's native component]."""

import numpy as np
import pytest

from btia_tpu.data import native
from btia_tpu.data.dicom import write_dicom, read_dicom
from btia_tpu.data.image import load_ingest_image, resize_uint8

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable (no g++?)"
)


class TestNativeDicom:
    def _roundtrip(self, px, rng, **kw):
        blob = write_dicom(None, px, **kw)
        ref = read_dicom(blob).to_rgb_uint8()
        h, w = ref.shape[:2]
        out = native.dicom_decode_resize(blob, h, w)
        assert out is not None
        # identity-resize: native bilinear == exact passthrough
        np.testing.assert_allclose(
            out.astype(int), ref.astype(int), atol=1
        )

    def test_uint16_windowed(self, rng):
        self._roundtrip(
            (rng.rand(40, 32) * 4000).astype(np.uint16),
            rng,
            window=(2000.0, 4000.0),
        )

    def test_int16_rescale(self, rng):
        self._roundtrip(
            (rng.rand(24, 24) * 2000 - 1000).astype(np.int16),
            rng,
            rescale=(1.0, -1024.0),
        )

    def test_uint8_minmax(self, rng):
        self._roundtrip((rng.rand(16, 20) * 255).astype(np.uint8), rng)

    def test_monochrome1(self, rng):
        px = np.array([[0, 200], [100, 50]], dtype=np.uint8)
        blob = write_dicom(None, px, photometric="MONOCHROME1")
        ref = read_dicom(blob).to_rgb_uint8()
        out = native.dicom_decode_resize(blob, 2, 2)
        np.testing.assert_allclose(out.astype(int), ref.astype(int), atol=1)

    def test_resized_output(self, rng):
        px = (rng.rand(64, 64) * 4000).astype(np.uint16)
        blob = write_dicom(None, px, window=(2000.0, 4000.0))
        out = native.dicom_decode_resize(blob, 32, 32)
        assert out is not None and out.shape == (32, 32, 3)

    def test_compressed_rejected(self):
        assert native.dicom_decode_resize(b"\x00" * 200, 8, 8) is None

    def _patch_us(self, blob: bytes, group: int, elem: int, value: int) -> bytes:
        import struct

        marker = struct.pack("<HH", group, elem) + b"US" + struct.pack("<H", 2)
        i = blob.index(marker)
        j = i + len(marker)
        return blob[:j] + struct.pack("<H", value) + blob[j + 2 :]

    def test_truncated_pixeldata_rejected(self, rng):
        """Header lies about Rows → PixelData too short → must error, not
        read out of bounds (ADVICE high: native/btia_ingest.cc)."""
        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        blob = write_dicom(None, px)
        lying = self._patch_us(blob, 0x0028, 0x0010, 4096)
        assert native.dicom_decode_resize(lying, 8, 8) is None
        # Python path must also refuse (np.frombuffer count check).
        with pytest.raises(ValueError):
            read_dicom(lying)

    def test_unsupported_bits_rejected(self, rng):
        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        blob = self._patch_us(write_dicom(None, px), 0x0028, 0x0100, 32)
        assert native.dicom_decode_resize(blob, 8, 8) is None

    def test_short_us_element_no_oob(self, rng):
        """A US element claiming length 0 must not be read (OOB guard)."""
        import struct

        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        blob = write_dicom(None, px)
        marker = struct.pack("<HH", 0x0028, 0x0103) + b"US" + struct.pack("<H", 2)
        i = blob.index(marker)
        # Rewrite PixelRepresentation as zero-length: drop its 2 value bytes.
        zl = struct.pack("<HH", 0x0028, 0x0103) + b"US" + struct.pack("<H", 0)
        blob2 = blob[:i] + zl + blob[i + len(marker) + 2 :]
        out = native.dicom_decode_resize(blob2, 8, 8)
        assert out is not None  # defaults to unsigned, decodes fine


class TestNativeResize:
    def test_matches_matrix_resize(self, rng):
        from btia_tpu.ops.ingest import _resize_matrix

        img = (rng.rand(31, 45, 3) * 255).astype(np.uint8)
        out = native.resize_u8(img, 24, 24)
        assert out is not None
        mh, mw = _resize_matrix(31, 24), _resize_matrix(45, 24)
        ref = np.einsum("hH,HWc->hWc", mh, img.astype(np.float32))
        ref = np.einsum("wW,hWc->hwc", mw, ref)
        np.testing.assert_allclose(
            out.astype(float), np.clip(ref + 0.5, 0, 255).astype(int), atol=1
        )

    def test_identity(self, rng):
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        out = native.resize_u8(img, 16, 16)
        np.testing.assert_array_equal(out, img)


class TestIntegration:
    def test_load_ingest_image_uses_native_dicom(self, tmp_path, rng):
        px = (rng.rand(48, 48) * 3000).astype(np.uint16)
        path = tmp_path / "n.dcm"
        write_dicom(path, px, window=(1500.0, 3000.0))
        out = load_ingest_image(path, 32)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8
