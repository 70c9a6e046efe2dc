"""Unit tests for utils (logging, profiling) and config plumbing."""

import json

import numpy as np
import pytest

from btia_tpu.configs import get_config, list_configs
from btia_tpu.configs.config import Config
from btia_tpu.parallel.mesh import MeshConfig, best_mesh_config
from btia_tpu.utils.logging import MetricLogger
from btia_tpu.utils.profiling import Timer, fetch, memory_stats


class TestConfigs:
    def test_all_five_reference_configs_registered(self):
        """One registered config per BASELINE.json entry [B:6–11]."""
        names = set(list_configs())
        assert {
            "vqa_rad_lstm",
            "slake_bert",
            "pathvqa_vit",
            "vqa_med_full",
            "streaming_vitl",
        } <= names

    def test_json_roundtrip(self):
        cfg = get_config("vqa_rad_lstm")
        cfg2 = Config.from_json(cfg.to_json())
        assert cfg2 == cfg

    def test_override_nested_and_type_coercion(self):
        cfg = get_config("tiny_test", **{"train.lr": "0.01", "model.head": "ad"})
        assert cfg.train.lr == 0.01
        assert cfg.model.head == "ad"

    def test_override_unknown_key_raises(self):
        with pytest.raises(KeyError):
            get_config("tiny_test", **{"model.nonexistent": 1})

    def test_flagship_is_enhanced(self):
        cfg = get_config("vqa_med_full")
        assert cfg.model.head == "ad"  # attention-driven decoding [B:10]
        assert cfg.model.question_encoder == "bert"

    def test_streaming_is_tp_sharded(self):
        cfg = get_config("streaming_vitl")
        assert cfg.mesh.model > 1  # TP for ViT-L [B:11]
        assert cfg.model.image_encoder == "vit_l336"


class TestMesh:
    def test_best_mesh_config(self):
        assert best_mesh_config(8, max_model=2) == MeshConfig(data=4, model=2)
        assert best_mesh_config(8, max_model=1) == MeshConfig(data=8, model=1)
        assert best_mesh_config(6, max_model=4) == MeshConfig(data=3, model=2)


class TestLogging:
    def test_jsonl_rows(self, tmp_path):
        path = tmp_path / "m.jsonl"
        logger = MetricLogger(path, echo=False)
        logger.log(step=1, loss=0.5)
        logger.log(step=2, loss=0.25, split="train")
        logger.close()
        rows = [json.loads(ln) for ln in path.read_text().splitlines()]
        assert rows[0]["loss"] == 0.5 and rows[1]["split"] == "train"
        assert all("ts" in r for r in rows)


class TestProfiling:
    def test_timer_span(self):
        import jax.numpy as jnp

        t = Timer()
        x = jnp.ones((8, 8))
        with t.span(result=x * 2):
            y = x * 2
        assert t.count == 1 and t.total > 0

    def test_fetch_and_memory_stats(self):
        import jax.numpy as jnp

        fetch({"a": jnp.ones(3), "b": [jnp.zeros(2)]})
        stats = memory_stats()
        assert isinstance(stats, dict)
