"""Checked-in golden logits [SURVEY §4.2]: deterministic pattern-filled
weights → fixed probes → logits must match the stored golden across
machines/versions, on BOTH frameworks (flax and the torch re-statement)."""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "goldens" / "golden_tiny.npz"


@pytest.fixture(scope="module")
def golden_setup():
    import sys

    sys.path.insert(0, str(Path(__file__).parent / "goldens"))
    from make_goldens import build

    return build()


class TestGoldens:
    def test_flax_matches_checked_in_golden(self, golden_setup):
        assert GOLDEN.exists(), "run tests/goldens/make_goldens.py"
        cfg, variables, images, qids, logits = golden_setup
        stored = np.load(GOLDEN)
        np.testing.assert_array_equal(stored["images"], images)
        np.testing.assert_array_equal(stored["qids"], qids)
        np.testing.assert_allclose(stored["logits"], logits, atol=1e-4)

    def test_torch_restatement_matches_golden(self, golden_setup):
        """The PyTorch parity oracle reproduces the same golden logits from
        the same deterministic weights — cross-framework golden gate."""
        torch = pytest.importorskip("torch")
        import jax

        from btia_tpu.convert.torch_ref import TorchBTIAADNet

        cfg, variables, images, qids, logits = golden_setup
        tm = TorchBTIAADNet(cfg)

        # Load the same pattern weights through the converter's name map,
        # inverted: walk flax tree → assign into torch params.
        from btia_tpu.convert.convert import _torch_key

        flat = {}

        def walk(tree, prefix=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    walk(v, prefix + (k,))
                else:
                    flat[prefix + (k,)] = v

        walk(variables["params"])
        walk(variables["batch_stats"])
        sd = tm.state_dict()
        new_sd = {}
        for path, v in flat.items():
            key, kind = _torch_key(path)
            t = np.asarray(v)
            if kind == "kernel":
                if t.ndim == 2:
                    t = t.T
                elif t.ndim == 4:
                    t = t.transpose(3, 2, 0, 1)
            new_sd[key] = torch.from_numpy(np.ascontiguousarray(t))
        for k in sd:
            if k not in new_sd:  # num_batches_tracked etc.
                new_sd[k] = sd[k]
        tm.load_state_dict(new_sd)
        t_logits = tm(
            torch.from_numpy(images), torch.from_numpy(qids.astype(np.int64))
        ).numpy()
        np.testing.assert_allclose(np.load(GOLDEN)["logits"], t_logits, atol=1e-3)
