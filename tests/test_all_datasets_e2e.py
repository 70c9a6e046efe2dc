"""End-to-end per-dataset coverage [B:7–B:10]: every dataset family's
on-disk format → build_data → one real train step + eval step."""

import dataclasses

import jax
import numpy as np
import pytest

from btia_tpu.configs import get_config
from btia_tpu.configs.config import Config, DataConfig
from btia_tpu.data.builder import build_data
from btia_tpu.data.synthetic import (
    generate_synthetic_pathvqa,
    generate_synthetic_slake,
    generate_synthetic_vqa_med,
)
from btia_tpu.models.model import build_model
from btia_tpu.parallel.mesh import MeshConfig, make_mesh
from btia_tpu.train.steps import create_state, make_eval_step, make_train_step
from btia_tpu.train.trainer import batch_to_device


def _run_one_step(cfg):
    dm = build_data(cfg)
    assert len(dm.train) > 0 and len(dm.test) > 0
    model = build_model(cfg.model)
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    state = create_state(model, cfg, mesh, steps_per_epoch=2)
    train_step = make_train_step(model, cfg, mesh)
    eval_step = make_eval_step(model, cfg, mesh, len(dm.answer_vocab))
    batch = next(iter(dm.iterator("train", batch_size=8, drop_last=False)))
    db = batch_to_device(batch, mesh)
    state, m = train_step(state, db)
    loss = float(jax.device_get(m["loss"]))
    out = jax.device_get(eval_step(state, db))
    assert np.isfinite(loss)
    assert out["preds"].shape == (8,)
    return dm


@pytest.fixture(scope="module")
def base_cfg():
    return get_config("tiny_test")


class TestDatasetFamilies:
    def test_slake_english_filter_e2e(self, tmp_path_factory, base_cfg):
        root = generate_synthetic_slake(tmp_path_factory.mktemp("slake"))
        cfg = dataclasses.replace(
            base_cfg,
            data=DataConfig(dataset="slake", data_dir=str(root), language="en"),
        )
        dm = _run_one_step(cfg)
        # the zh items must have been filtered out [B:8]
        assert all("器官" not in s.question for s in dm.train)

    def test_pathvqa_open_ended_e2e(self, tmp_path_factory, base_cfg):
        root = generate_synthetic_pathvqa(tmp_path_factory.mktemp("path"))
        cfg = dataclasses.replace(
            base_cfg, data=DataConfig(dataset="pathvqa", data_dir=str(root))
        )
        dm = _run_one_step(cfg)
        types = {s.answer_type for s in dm.train}
        assert "OPEN" in types and "CLOSED" in types  # yes/no auto-flag

    def test_vqa_med_categories_e2e(self, tmp_path_factory, base_cfg):
        root = generate_synthetic_vqa_med(tmp_path_factory.mktemp("med"))
        cfg = dataclasses.replace(
            base_cfg, data=DataConfig(dataset="vqa_med", data_dir=str(root))
        )
        dm = _run_one_step(cfg)
        cats = {s.category for s in dm.train}
        assert cats == {"modality", "organ"}  # per-category eval keys [B:10]
