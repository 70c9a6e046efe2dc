"""Data layer: vocabs, tokenizers, DICOM, loaders, pipeline [SURVEY §4.2]."""

import json
from pathlib import Path

import numpy as np
import pytest

from btia_tpu.configs.config import Config, DataConfig
from btia_tpu.data.datasets import (
    load_pathvqa,
    load_slake,
    load_vqa_med,
    load_vqa_rad,
)
from btia_tpu.data.dicom import DicomImage, read_dicom, write_dicom
from btia_tpu.data.image import decode_image
from btia_tpu.data.pipeline import ImageCache, make_iterator
from btia_tpu.data.synthetic import generate_synthetic_dataset
from btia_tpu.data.vocab import AnswerVocab, WordVocab, normalize_answer
from btia_tpu.data.wordpiece import WordPieceTokenizer


class TestVocab:
    def test_word_vocab_deterministic(self):
        texts = ["is the lung normal", "what organ is shown", "is it normal"]
        v1, v2 = WordVocab.build(texts), WordVocab.build(texts)
        assert v1.itos == v2.itos

    def test_encode_pad_unk(self):
        v = WordVocab.build(["what organ"])
        ids = v.encode("what unknown organ", 6)
        assert len(ids) == 6
        assert ids[1] == 1  # UNK
        assert ids[-1] == 0  # PAD

    def test_answer_normalize(self):
        assert normalize_answer("The Lung.") == "lung"
        assert normalize_answer(" YES ") == "yes"

    def test_answer_topk_and_unk(self):
        v = AnswerVocab.build(["yes", "yes", "no", "maybe"], top_k=3)
        assert len(v) == 3
        assert v.encode("never-seen") == 0

    def test_save_load_roundtrip(self, tmp_path):
        v = AnswerVocab.build(["yes", "no"])
        v.save(tmp_path / "a.json")
        v2 = AnswerVocab.load(tmp_path / "a.json")
        assert v2.itos == v.itos


class TestWordPiece:
    def test_toy_vocab_roundtrip(self):
        tok = WordPieceTokenizer.toy_vocab(["is the lung normal today"])
        ids = tok.encode("is the lung normal", 12)
        assert len(ids) == 12
        assert ids[0] == tok.cls_id
        assert tok.sep_id in ids

    def test_subword_fallback(self):
        tok = WordPieceTokenizer.toy_vocab(["abc def"])
        ids = tok.encode("abcdef", 8)  # unseen word → char pieces
        assert all(i != tok.unk_id for i in ids if i != tok.pad_id)

    def test_vocab_file_roundtrip(self, tmp_path):
        tok = WordPieceTokenizer.toy_vocab(["what organ"])
        tok.save(tmp_path / "v.txt")
        tok2 = WordPieceTokenizer.from_vocab_file(tmp_path / "v.txt")
        assert tok2.encode("what organ", 8) == tok.encode("what organ", 8)


class TestDicom:
    def test_uint16_roundtrip(self, tmp_path, rng):
        px = (rng.rand(32, 40) * 4000).astype(np.uint16)
        path = tmp_path / "t.dcm"
        write_dicom(path, px, window=(2000.0, 4000.0))
        img = read_dicom(path)
        np.testing.assert_array_equal(img.pixels, px)
        u8 = img.to_rgb_uint8()
        assert u8.shape == (32, 40, 3) and u8.dtype == np.uint8

    def test_int16_rescale(self, tmp_path, rng):
        px = (rng.rand(16, 16) * 2000 - 1000).astype(np.int16)
        blob = write_dicom(None, px, rescale=(1.0, -1024.0))
        img = read_dicom(blob)
        assert img.rescale_intercept == -1024.0
        assert img.to_uint8().shape == (16, 16)

    def test_monochrome1_inverts(self):
        px = np.array([[0, 255]], dtype=np.uint8)
        img = DicomImage(pixels=px, photometric="MONOCHROME1")
        u8 = img.to_uint8()
        assert u8[0, 0] > u8[0, 1]

    def test_decode_image_dispatches_dicom(self, tmp_path, rng):
        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        path = tmp_path / "x.dcm"
        write_dicom(path, px)
        out = decode_image(path)
        assert out.shape == (8, 8, 3)


class TestCompressedDicom:
    """Encapsulated transfer syntaxes + multi-frame [VERDICT r1 item 4]."""

    def test_jpeg_baseline(self, rng):
        from btia_tpu.data.dicom import JPEG_BASELINE

        px = (rng.rand(32, 32) * 255).astype(np.uint8)
        blob = write_dicom(None, px, transfer_syntax=JPEG_BASELINE)
        img = read_dicom(blob)
        assert img.pixels.shape == (32, 32)
        # lossy at q95: close but not exact
        assert np.mean(np.abs(img.pixels.astype(int) - px.astype(int))) < 6

    def test_jpeg_baseline_rgb(self, rng):
        from btia_tpu.data.dicom import JPEG_BASELINE

        px = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        blob = write_dicom(None, px, transfer_syntax=JPEG_BASELINE)
        img = read_dicom(blob)
        assert img.pixels.shape == (16, 16, 3)
        assert img.to_rgb_uint8().shape == (16, 16, 3)

    def test_jpeg2000_lossless_uint16(self, rng):
        from btia_tpu.data.dicom import JPEG2000_LOSSLESS

        px = (rng.rand(24, 24) * 4000).astype(np.uint16)
        blob = write_dicom(
            None, px, transfer_syntax=JPEG2000_LOSSLESS, window=(2000.0, 4000.0)
        )
        img = read_dicom(blob)
        np.testing.assert_array_equal(img.pixels, px)
        assert img.window_center == 2000.0

    def test_rle_uint16(self, rng):
        from btia_tpu.data.dicom import RLE_LOSSLESS

        px = (rng.rand(20, 28) * 4000).astype(np.uint16)
        px[:5] = 1234  # exercise replicate runs
        blob = write_dicom(None, px, transfer_syntax=RLE_LOSSLESS)
        img = read_dicom(blob)
        np.testing.assert_array_equal(img.pixels, px)

    def test_preambleless_dcm_via_ingest(self, rng, tmp_path):
        """A raw-dataset DICOM (no 128-byte preamble / DICM magic) saved
        as .dcm must load through load_ingest_image via the suffix hint —
        it used to fall through to PIL and raise UnidentifiedImageError
        while read_dicom itself supported the format."""
        from btia_tpu.data.image import load_ingest_image

        px = (rng.rand(40, 40) * 3000).astype(np.uint16)
        blob = write_dicom(None, px)
        raw = blob[132:]  # strip preamble + magic → raw dataset
        assert read_dicom(raw).pixels.shape == (40, 40)  # reader supports it
        p = tmp_path / "raw.dcm"
        p.write_bytes(raw)
        out = load_ingest_image(p, 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    def test_misnamed_dcm_falls_back_to_pil(self, rng, tmp_path):
        """A PNG/JPEG misnamed *.dcm (suffix hint but no DICM magic and not
        parseable as a raw dataset) must fall back to the PIL path rather
        than raise DicomError (ADVICE r2) — for both decode_image and
        load_ingest_image."""
        from PIL import Image

        from btia_tpu.data.image import load_ingest_image

        arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        p = tmp_path / "actually_a_png.dcm"
        Image.fromarray(arr).save(p, format="PNG")
        out = decode_image(p)
        assert out.shape == (32, 32, 3)
        out = load_ingest_image(p, 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    def test_rle_signed_int16(self, rng):
        """PixelRepresentation=1 with RLE: stored bits are two's-complement
        (CT air = -1000 HU); a plain uint16 view would wrap it to 64536 and
        silently corrupt window/rescale (review finding, round 2)."""
        from btia_tpu.data.dicom import RLE_LOSSLESS

        px = np.tile(np.array([[-1000, -1], [0, 3000]], np.int16), (8, 8))
        blob = write_dicom(None, px, transfer_syntax=RLE_LOSSLESS)
        img = read_dicom(blob)
        assert img.pixels.dtype == np.int16
        np.testing.assert_array_equal(img.pixels, px)

    def test_rle_rgb(self, rng):
        from btia_tpu.data.dicom import RLE_LOSSLESS

        px = (rng.rand(12, 12, 3) * 255).astype(np.uint8)
        blob = write_dicom(None, px, transfer_syntax=RLE_LOSSLESS)
        img = read_dicom(blob)
        np.testing.assert_array_equal(img.pixels, px)

    def test_deflated(self, rng):
        from btia_tpu.data.dicom import DEFLATED_EXPLICIT_VR_LE

        px = (rng.rand(16, 16) * 4000).astype(np.uint16)
        blob = write_dicom(None, px, transfer_syntax=DEFLATED_EXPLICIT_VR_LE)
        img = read_dicom(blob)
        np.testing.assert_array_equal(img.pixels, px)

    def test_multiframe_uncompressed(self, rng):
        frames = (rng.rand(3, 10, 12) * 4000).astype(np.uint16)
        blob = write_dicom(None, frames, multiframe=True)
        for f in range(3):
            img = read_dicom(blob, frame=f)
            assert img.num_frames == 3
            np.testing.assert_array_equal(img.pixels, frames[f])
        with pytest.raises(ValueError):
            read_dicom(blob, frame=3)

    def test_multiframe_rle(self, rng):
        from btia_tpu.data.dicom import RLE_LOSSLESS

        frames = (rng.rand(2, 8, 8) * 255).astype(np.uint8)
        blob = write_dicom(
            None, frames, multiframe=True, transfer_syntax=RLE_LOSSLESS
        )
        for f in range(2):
            np.testing.assert_array_equal(
                read_dicom(blob, frame=f).pixels, frames[f]
            )

    def test_unsupported_syntax_clear_error(self, rng):
        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        blob = write_dicom(None, px)
        # Patch the transfer syntax UID to JPEG-LS (unsupported).
        blob = blob.replace(b"1.2.840.10008.1.2.1\x00", b"1.2.840.10008.1.2.4.80")
        with pytest.raises(ValueError, match="transfer syntax"):
            read_dicom(blob)

    def test_fuzz_truncation_raises_cleanly(self, rng):
        """Every truncation of a valid file must raise ValueError, never
        crash with struct.error/IndexError (decode-thread safety)."""
        from btia_tpu.data.dicom import RLE_LOSSLESS

        for ts in (None, RLE_LOSSLESS):
            px = (rng.rand(8, 8) * 4000).astype(np.uint16)
            kw = {"transfer_syntax": ts} if ts else {}
            blob = write_dicom(None, px, **kw)
            for cut in range(133, len(blob) - 1, 7):
                try:
                    read_dicom(blob[:cut])
                except ValueError:
                    pass  # the only acceptable failure mode

    def test_fuzz_random_corruption_raises_cleanly(self, rng):
        from btia_tpu.data.dicom import RLE_LOSSLESS

        px = (rng.rand(8, 8) * 255).astype(np.uint8)
        blob = bytearray(write_dicom(None, px, transfer_syntax=RLE_LOSSLESS))
        for trial in range(200):
            b = bytearray(blob)
            for _ in range(3):
                pos = int(rng.randint(132, len(b)))
                b[pos] = int(rng.randint(0, 256))
            try:
                read_dicom(bytes(b))
            except ValueError:
                pass


class TestLoaders:
    def test_synthetic_vqa_rad(self, synth_root):
        splits = generate_synthetic_dataset(synth_root / "rad")
        assert len(splits["train"]) > 0 and len(splits["test"]) > 0
        s = splits["train"][0]
        assert Path(s.image_path).exists()
        assert s.answer_type in ("OPEN", "CLOSED")

    def test_slake_format(self, tmp_path):
        items = [
            {"img_name": "x.jpg", "question": "q1", "answer": "a1",
             "q_lang": "en", "answer_type": "OPEN", "content_type": "organ"},
            {"img_name": "y.jpg", "question": "q2", "answer": "a2",
             "q_lang": "zh", "answer_type": "OPEN"},
        ]
        (tmp_path / "train.json").write_text(json.dumps(items))
        out = load_slake(tmp_path, "train", language="en")
        assert len(out) == 1 and out[0].category == "organ"

    def test_pathvqa_format(self, tmp_path):
        items = [{"image": "img1", "question": "what is this", "answer": "tumor"}]
        (tmp_path / "train.json").write_text(json.dumps(items))
        out = load_pathvqa(tmp_path, "train")
        assert out[0].image_path.endswith("img1.jpg")
        assert out[0].answer_type == "OPEN"

    def test_vqa_med_category_files(self, tmp_path):
        d = tmp_path / "Train" / "QAPairsByCategory"
        d.mkdir(parents=True)
        (d / "C1_Modality_train.txt").write_text(
            "synpic1|what modality is used|ct\nsynpic2|was ct used|yes\n"
        )
        (d / "C3_Organ_train.txt").write_text("synpic1|what organ is this|lung\n")
        out = load_vqa_med(tmp_path, "train")
        assert len(out) == 3
        cats = {s.category for s in out}
        assert cats == {"modality", "organ"}


class TestPipeline:
    def test_batching_and_final_padding(self, synth_root):
        splits = generate_synthetic_dataset(synth_root / "pipe")
        samples = splits["train"][:5]
        vocab = WordVocab.build([s.question for s in samples])
        avocab = AnswerVocab.build([s.answer for s in samples])
        cache = ImageCache(64)
        batches = list(
            make_iterator(
                samples, vocab, avocab, cache, batch_size=2, max_len=8,
                prefetch=0,
            )
        )
        assert len(batches) == 3
        last = batches[-1]
        assert last.images.shape == (2, 64, 64, 3)
        assert bool(last.valid[0]) and not bool(last.valid[1])

    def test_shuffle_determinism(self, synth_root):
        splits = generate_synthetic_dataset(synth_root / "pipe2")
        samples = splits["train"]
        vocab = WordVocab.build([s.question for s in samples])
        avocab = AnswerVocab.build([s.answer for s in samples])
        cache = ImageCache(32)
        mk = lambda: [
            b.answer_ids.tolist()
            for b in make_iterator(
                samples, vocab, avocab, cache, 2, 8, shuffle=True, seed=7,
                prefetch=0,
            )
        ]
        assert mk() == mk()

    def test_prefetch_propagates_worker_errors(self, synth_root):
        """A mid-epoch failure must raise in the consumer, not silently
        truncate the epoch (ADVICE low: data/pipeline.py)."""
        import dataclasses as dc

        splits = generate_synthetic_dataset(synth_root / "pipeerr")
        samples = splits["train"][:4]
        vocab = WordVocab.build([s.question for s in samples])
        avocab = AnswerVocab.build([s.answer for s in samples])
        cache = ImageCache(32)
        # Batch 2 references a missing image → decode raises in the worker.
        samples = samples[:2] + [
            dc.replace(samples[2], image_path="/nonexistent/x.jpg"),
            samples[3],
        ]
        it = make_iterator(samples, vocab, avocab, cache, 2, 8, prefetch=2)
        next(it)  # first batch is fine
        with pytest.raises(Exception):
            list(it)

    def test_prefetch_thread_matches_sync(self, synth_root):
        splits = generate_synthetic_dataset(synth_root / "pipe3")
        samples = splits["train"][:4]
        vocab = WordVocab.build([s.question for s in samples])
        avocab = AnswerVocab.build([s.answer for s in samples])
        cache = ImageCache(32)
        sync = [
            b.answer_ids.tolist()
            for b in make_iterator(samples, vocab, avocab, cache, 2, 8, prefetch=0)
        ]
        threaded = [
            b.answer_ids.tolist()
            for b in make_iterator(samples, vocab, avocab, cache, 2, 8, prefetch=2)
        ]
        assert sync == threaded


class TestBuilder:
    def test_build_data_synthetic(self, synth_root):
        from btia_tpu.configs import get_config
        from btia_tpu.data.builder import build_data

        root = synth_root / "builder"
        generate_synthetic_dataset(root)
        cfg = get_config("tiny_test").override(**{"data.data_dir": str(root)})
        cfg = Config(
            name=cfg.name,
            model=cfg.model,
            data=DataConfig(dataset="vqa_rad", data_dir=str(root)),
            train=cfg.train,
            mesh=cfg.mesh,
        )
        dm = build_data(cfg)
        assert len(dm.train) > 0
        batch = next(iter(dm.iterator("train")))
        assert batch.images.dtype == np.uint8
