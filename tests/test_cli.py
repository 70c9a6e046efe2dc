"""CLI smoke tests [SURVEY §2.3]: train → eval → predict → convert via the
same entry points a user drives."""

import json

import numpy as np
import pytest

from btia_tpu.cli import _parse_overrides, main
from btia_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("clidata")
    generate_synthetic_dataset(root)
    workdir = tmp_path_factory.mktemp("clirun")
    return root, workdir


class TestOverrides:
    def test_parse_types(self):
        out = _parse_overrides(["train.lr=0.01", "model.head=ad", "train.epochs=3"])
        assert out["train.lr"] == 0.01
        assert out["model.head"] == "ad"
        assert out["train.epochs"] == 3

    def test_bad_pair_raises(self):
        with pytest.raises(SystemExit):
            _parse_overrides(["nonsense"])

    def test_bool_override_text_forms(self):
        """bool('False') is True — `--set model.remat=False` used to
        silently ENABLE the flag (review finding, round 2)."""
        from btia_tpu.configs import get_config

        assert get_config("tiny_test", **{"model.remat": "False"}).model.remat is False
        assert get_config("tiny_test", **{"model.remat": "no"}).model.remat is False
        assert get_config("tiny_test", **{"model.remat": "True"}).model.remat is True
        with pytest.raises(ValueError):
            get_config("tiny_test", **{"model.remat": "maybe"})


class TestEndToEnd:
    def test_train_eval_predict(self, cli_env, capsys):
        root, workdir = cli_env
        main(
            [
                "train",
                "--config",
                "tiny_test",
                "--workdir",
                str(workdir),
                "--set",
                "data.dataset=vqa_rad",
                "--set",
                f"data.data_dir={root}",
                "--set",
                "train.epochs=1",
            ]
        )
        out = capsys.readouterr().out
        assert "val_accuracy" in out

        main(["eval", "--workdir", str(workdir), "--split", "test"])
        metrics = json.loads(capsys.readouterr().out)
        assert 0.0 <= metrics["accuracy"] <= 1.0

        img = str(next((root / "images").glob("*.jpg")))
        main(
            [
                "predict",
                "--workdir",
                str(workdir),
                "--image",
                img,
                "--question",
                "is the lung normal",
            ]
        )
        pred = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert pred["question"] == "is the lung normal"
        assert len(pred["top"]) == 3

    def test_serve_directory(self, cli_env, capsys):
        """`serve` streams a directory with top-k fetch + question dedup."""
        root, workdir = cli_env
        if not (workdir / "checkpoints").exists():  # standalone run
            main(
                ["train", "--config", "tiny_test", "--workdir", str(workdir),
                 "--set", "data.dataset=vqa_rad", "--set", f"data.data_dir={root}",
                 "--set", "train.epochs=1"]
            )
            capsys.readouterr()
        main(
            [
                "serve",
                "--workdir", str(workdir),
                "--image-dir", str(root / "images"),
                "--question", "is the lung normal",
                "--question", "what organ is shown",
                "--batch", "2",
                "--topk", "2",
                "--dedup",
            ]
        )
        out = capsys.readouterr().out.strip().splitlines()
        rows = [json.loads(ln) for ln in out]
        n_images = len(list((root / "images").iterdir()))
        assert len(rows) == n_images
        for r in rows:
            assert len(r["answers"]) == 2
            assert all(isinstance(a, str) and a != "<unk>" for a in r["answers"])

    def test_convert_roundtrip(self, cli_env, tmp_path, capsys):
        """torch checkpoint of the re-statement → orbax workdir → predict."""
        torch = pytest.importorskip("torch")
        from btia_tpu.configs import get_config
        from btia_tpu.convert.torch_ref import build_torch_model

        root, _ = cli_env
        tm = build_torch_model(get_config("tiny_test").model, seed=1)
        ckpt_path = tmp_path / "ref.pt"
        torch.save(tm.state_dict(), ckpt_path)
        workdir = tmp_path / "converted"
        main(
            [
                "convert",
                "--config",
                "tiny_test",
                "--torch-ckpt",
                str(ckpt_path),
                "--workdir",
                str(workdir),
            ]
        )
        out = capsys.readouterr().out
        assert "converted" in out
        assert (workdir / "checkpoints" / "config.json").exists()
