"""Synthetic VQA fixtures in the real datasets' on-disk formats
[SURVEY §4.2 "tiny synthetic VQA-RAD/SLAKE-format fixtures"].

Generates deterministic JPEG + DICOM images and QA annotations so loaders,
vocab builders, training, and the DICOM path are all exercised without any
real (and license-encumbered) medical data on the machine.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from btia_tpu.data.datasets import VQASample
from btia_tpu.data.dicom import write_dicom

_ORGANS = ["lung", "heart", "liver", "kidney", "brain"]
_MODALITIES = ["xray", "ct", "mri"]
_PLANES = ["axial", "coronal", "sagittal"]


def _make_image(rng: np.random.RandomState, size: int = 128) -> np.ndarray:
    """Gradient + blobs; grayscale-ish like radiology."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = 60 + 80 * x + 40 * y
    for _ in range(rng.randint(2, 5)):
        cx, cy = rng.rand(2) * size
        r = 8 + rng.rand() * 24
        d2 = (np.mgrid[0:size, 0:size][1] - cx) ** 2 + (
            np.mgrid[0:size, 0:size][0] - cy
        ) ** 2
        img += 70 * np.exp(-d2 / (2 * r * r))
    g = np.clip(img, 0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def generate_synthetic_dataset(
    root: Optional[Path] = None,
    num_images: int = 6,
    qa_per_image: int = 4,
    seed: int = 0,
) -> Dict[str, List[VQASample]]:
    """Write a VQA-RAD-format corpus (JPEGs + 1 DICOM + JSON) and load it."""
    if root is None:
        root = Path(tempfile.gettempdir()) / f"btia_synth_{seed}_{num_images}"
    root = Path(root)
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)

    items = []
    for i in range(num_images):
        arr = _make_image(rng)
        if i == 0:
            # One DICOM image exercises the DICOM ingest path [B:11].
            name = f"synpic{i}.dcm"
            px = (arr[:, :, 0].astype(np.uint16) * 16)
            write_dicom(img_dir / name, px, window=(2048.0, 4096.0))
        else:
            name = f"synpic{i}.jpg"
            Image.fromarray(arr).save(img_dir / name, quality=92)

        organ = _ORGANS[i % len(_ORGANS)]
        modality = _MODALITIES[i % len(_MODALITIES)]
        plane = _PLANES[i % len(_PLANES)]
        qa = [
            (f"is the {organ} normal", "yes" if i % 2 == 0 else "no", "CLOSED"),
            (f"what organ is shown in this image", organ, "OPEN"),
            (f"what imaging modality was used", modality, "OPEN"),
            (f"is this an {plane} view", "yes" if i % 3 == 0 else "no", "CLOSED"),
        ][:qa_per_image]
        for j, (q, a, at) in enumerate(qa):
            # ~1/3 of items become the test split, marked VQA-RAD-style.
            is_test = (i * qa_per_image + j) % 3 == 2
            items.append(
                {
                    "qid": i * qa_per_image + j,
                    "image_name": name,
                    "question": q,
                    "answer": a,
                    "answer_type": at,
                    "phrase_type": "test_freeform" if is_test else "freeform",
                }
            )

    (root / "vqa_rad.json").write_text(json.dumps(items, indent=1))

    from btia_tpu.data.datasets import load_vqa_rad

    return {
        "train": load_vqa_rad(root, "train"),
        "val": load_vqa_rad(root, "test"),
        "test": load_vqa_rad(root, "test"),
    }


def _qa_for(i: int):
    organ = _ORGANS[i % len(_ORGANS)]
    modality = _MODALITIES[i % len(_MODALITIES)]
    return organ, modality


def generate_synthetic_slake(root: Path, num_images: int = 4, seed: int = 1):
    """SLAKE on-disk format [B:8]: train/validate/test.json + imgs/."""
    root = Path(root)
    img_dir = root / "imgs"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    for i in range(num_images):
        name = f"xmlab{i}.jpg"
        Image.fromarray(_make_image(rng)).save(img_dir / name, quality=90)
        names.append(name)

    def items(split_seed):
        out = []
        for i, name in enumerate(names):
            organ, modality = _qa_for(i + split_seed)
            out += [
                {"img_name": name, "question": f"what organ is this",
                 "answer": organ, "q_lang": "en", "answer_type": "OPEN",
                 "content_type": "organ", "qid": i * 10 + split_seed},
                {"img_name": name, "question": "这是什么器官",
                 "answer": organ, "q_lang": "zh", "answer_type": "OPEN",
                 "content_type": "organ", "qid": i * 10 + split_seed + 1},
                {"img_name": name, "question": "is this an mri scan",
                 "answer": "yes" if modality == "mri" else "no",
                 "q_lang": "en", "answer_type": "CLOSED",
                 "content_type": "modality", "qid": i * 10 + split_seed + 2},
            ]
        return out

    (root / "train.json").write_text(json.dumps(items(0)))
    (root / "validate.json").write_text(json.dumps(items(3)))
    (root / "test.json").write_text(json.dumps(items(6)))
    return root


def generate_synthetic_pathvqa(root: Path, num_images: int = 4, seed: int = 2):
    """PathVQA format [B:9]: {split}.json + images/."""
    root = Path(root)
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for split in ("train", "val", "test"):
        items = []
        for i in range(num_images):
            name = f"path_{split}_{i}"
            Image.fromarray(_make_image(rng)).save(
                img_dir / f"{name}.jpg", quality=90
            )
            organ, _ = _qa_for(i)
            items += [
                {"image": name, "question": "what tissue is shown",
                 "answer": f"{organ} tissue"},
                {"image": name, "question": "is there a tumor present",
                 "answer": "yes" if i % 2 else "no"},
            ]
        (root / f"{split}.json").write_text(json.dumps(items))
    return root


def generate_synthetic_vqa_med(root: Path, num_images: int = 4, seed: int = 3):
    """VQA-Med / ImageCLEF-2019 format [B:10]: QAPairsByCategory txts."""
    root = Path(root)
    # Static per-split offsets: str hash() is randomized per process
    # (PYTHONHASHSEED), which silently broke the "deterministic fixtures"
    # contract across processes.
    split_offsets = {"Train": 0, "Val": 1, "Test": 2}
    for split in ("Train", "Val", "Test"):
        split_dir = root / split
        img_dir = split_dir / "images"
        cat_dir = split_dir / "QAPairsByCategory"
        img_dir.mkdir(parents=True, exist_ok=True)
        cat_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(seed + split_offsets[split])
        c1, c3 = [], []
        for i in range(num_images):
            name = f"synpic{split.lower()}{i}"
            Image.fromarray(_make_image(rng)).save(
                img_dir / f"{name}.jpg", quality=90
            )
            organ, modality = _qa_for(i)
            c1.append(f"{name}|what modality was used|{modality}")
            c3.append(f"{name}|what organ is captured|{organ}")
        (cat_dir / "C1_Modality.txt").write_text("\n".join(c1))
        (cat_dir / "C3_Organ.txt").write_text("\n".join(c3))
    return root
