"""Inference API tests: predict contract [B:5], fan-out bucketing,
streaming server [B:11]."""

import jax.numpy as jnp
import numpy as np
import pytest

from btia_tpu.infer.predict import Predictor, _bucket
from btia_tpu.infer.streaming import StreamingServer


@pytest.fixture(scope="module")
def predictor(tmp_path_factory):
    """Train one epoch on synthetic data, load the checkpoint back."""
    from btia_tpu.configs import get_config
    from btia_tpu.configs.config import Config, DataConfig
    from btia_tpu.data.synthetic import generate_synthetic_dataset
    from btia_tpu.train.trainer import Trainer

    root = tmp_path_factory.mktemp("inferdata")
    generate_synthetic_dataset(root)
    base = get_config("tiny_test")
    cfg = Config(
        name=base.name,
        model=base.model,
        data=DataConfig(dataset="vqa_rad", data_dir=str(root)),
        train=base.train,
        mesh=base.mesh,
    )
    workdir = tmp_path_factory.mktemp("inferrun")
    trainer = Trainer(cfg, workdir)
    trainer.fit(epochs=1)
    return Predictor.from_checkpoint(workdir), trainer.data


class TestBucketing:
    def test_buckets(self):
        assert _bucket(1) == 1
        assert _bucket(3) == 4
        assert _bucket(64) == 64
        assert _bucket(65) == 128


class TestAnswerRule:
    """ops/answers.py — the single source of the real-answer rule."""

    def test_argmax_real_skips_unk_and_padding(self):
        from btia_tpu.ops.answers import argmax_real, real_limit

        logits = np.array([9.0, 1.0, 5.0, 2.0, 8.0, 7.0])  # <unk> is max
        limit = real_limit(4, 6)  # vocab built 4 of head 6 → pad 4,5 out
        assert int(argmax_real(logits, limit)) == 2
        batch = np.stack([logits, logits[::-1].copy()])
        np.testing.assert_array_equal(argmax_real(batch, limit), [2, 1])

    def test_topk_real_clamps_k(self):
        from btia_tpu.ops.answers import topk_real

        logits = jnp.asarray(np.arange(8.0, dtype=np.float32))
        # limit=4 → real answers are ids 1..3; k=100 must clamp, not
        # crash lax.top_k or return masked '<unk>'/padding slots.
        vals, ids = topk_real(logits, 100, 4)
        assert ids.shape == (3,)
        np.testing.assert_array_equal(np.asarray(ids), [3, 2, 1])

    def test_topk_real_matches_numpy(self):
        from btia_tpu.ops.answers import topk_real, topn_real_np

        rng_ = np.random.RandomState(3)
        logits = rng_.randn(5, 16).astype(np.float32)
        vals, ids = topk_real(jnp.asarray(logits), 3, 12)
        np.testing.assert_array_equal(
            np.asarray(ids), topn_real_np(logits, 3, 12)
        )
        assert (np.asarray(ids) != 0).all() and (np.asarray(ids) < 12).all()


class TestPredict:
    def test_predict_shape(self, predictor):
        p, dm = predictor
        img = dm.train[0].image_path
        logits = p.predict(img, "is the lung normal")
        assert logits.shape == (p.cfg.model.answer_vocab_size,)
        assert np.isfinite(logits).all()

    def test_predict_batch_matches_single(self, predictor):
        p, dm = predictor
        img = dm.train[0].image_path
        qs = ["is the lung normal", "what organ is shown"]
        batch_logits = p.predict_batch(img, qs)
        single0 = p.predict(img, qs[0])
        # same compiled path → identical; cross-bucket → close
        np.testing.assert_allclose(batch_logits[0], single0, atol=1e-4)

    def test_predict_answer_is_string(self, predictor):
        p, dm = predictor
        ans = p.predict_answer(dm.train[0].image_path, "is the lung normal")
        assert isinstance(ans, str) and ans

    def test_predict_answers_batch_strings(self, predictor):
        p, dm = predictor
        img = dm.train[0].image_path
        qs = ["is the lung normal", "what organ is shown"]
        answers = p.predict_answers(img, qs)
        assert len(answers) == 2
        assert all(isinstance(a, str) and a != "<unk>" for a in answers)
        assert answers[0] == p.predict_answer(img, qs[0])

    def test_predict_accepts_ndarray(self, predictor, rng):
        p, _ = predictor
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        logits = p.predict(img, "is this normal")
        assert np.isfinite(logits).all()

    def test_predict_accepts_dicom(self, predictor, tmp_path, rng):
        from btia_tpu.data.dicom import write_dicom

        p, _ = predictor
        path = tmp_path / "q.dcm"
        write_dicom(path, (rng.rand(32, 32) * 3000).astype(np.uint16))
        logits = p.predict(str(path), "what modality was used")
        assert np.isfinite(logits).all()


class TestStreaming:
    def test_empty_stream(self, predictor):
        p, _ = predictor
        server = StreamingServer(p, image_batch=2, questions_per_image=2)
        assert list(server.serve(iter([]))) == []
        assert server.pairs_processed == 0

    def test_excess_questions_truncated(self, predictor, rng):
        p, dm = predictor
        server = StreamingServer(p, image_batch=2, questions_per_image=2)
        reqs = [(dm.train[0].image_path, ["a", "b", "c", "d"])]
        [(_i, logits, n)] = list(server.serve(iter(reqs)))
        assert n == 2  # capped at questions_per_image
        assert logits.shape[0] == 2

    def test_abandoned_generator_keeps_sane_stats(self, predictor):
        p, dm = predictor
        server = StreamingServer(p, image_batch=1, questions_per_image=1)
        reqs = [(s.image_path, ["q"]) for s in dm.train[:3]]
        gen = server.serve(iter(reqs))
        next(gen)  # consume one, abandon the rest
        gen.close()
        assert 0 < server.pairs_per_second < 1e6

    def test_bad_request_skipped_not_deadlocked(self, predictor):
        """A malformed image must not kill the decode thread without its
        sentinel (which would deadlock serve) — it is skipped and recorded
        (ADVICE medium: infer/streaming.py)."""
        p, dm = predictor
        server = StreamingServer(p, image_batch=2, questions_per_image=2)
        good = dm.train[0].image_path
        reqs = [
            (good, ["q one"]),
            ("/nonexistent/broken.dcm", ["q two"]),
            (good, ["q three"]),
        ]
        results = list(server.serve(iter(reqs)))
        assert len(results) == 2  # bad request skipped
        # Indices attribute results to the RIGHT requests even though the
        # bad one was dropped (a positional zip would shift row 2).
        assert sorted(i for i, _, _ in results) == [0, 2]
        [(bad_idx, exc)] = server.errors
        assert bad_idx == 1 and isinstance(exc, Exception)
        assert server.pairs_processed == 2

    def test_corrupt_dicom_survived(self, predictor, tmp_path, rng):
        """A truncated DICOM raises in the decode thread; the server skips
        it and keeps serving [VERDICT r1 item 4]."""
        from btia_tpu.data.dicom import write_dicom

        p, dm = predictor
        px = (rng.rand(32, 32) * 4000).astype(np.uint16)
        blob = write_dicom(None, px)
        corrupt = tmp_path / "corrupt.dcm"
        corrupt.write_bytes(blob[: len(blob) // 2])
        server = StreamingServer(p, image_batch=2, questions_per_image=2)
        good = dm.train[0].image_path
        results = list(
            server.serve(iter([(good, ["q"]), (str(corrupt), ["q"]), (good, ["q"])]))
        )
        assert len(results) == 2
        assert len(server.errors) == 1

    def test_errors_reset_between_serve_calls(self, predictor):
        """Stale errors from a previous stream must not be re-reported (and
        mis-attributed by index) on the next serve() call."""
        p, dm = predictor
        server = StreamingServer(p, image_batch=1, questions_per_image=1)
        good = dm.train[0].image_path
        list(server.serve(iter([("/nonexistent/x.dcm", ["q"])])))
        assert len(server.errors) == 1
        results = list(server.serve(iter([(good, ["q"])])))
        assert len(results) == 1
        assert server.errors == []

    def test_errors_reset_eagerly_at_serve_call(self, predictor):
        """serve() resets errors BEFORE iteration starts (ADVICE r2): a
        caller that creates the generator and checks errors first must not
        see the previous call's stale pairs."""
        p, dm = predictor
        server = StreamingServer(p, image_batch=1, questions_per_image=1)
        list(server.serve(iter([("/nonexistent/x.dcm", ["q"])])))
        assert len(server.errors) == 1
        gen = server.serve(iter([(dm.train[0].image_path, ["q"])]))
        assert server.errors == []  # cleared at call time, not first next()
        assert len(list(gen)) == 1

    def test_max_wait_bounds_sparse_stream_latency(self, predictor):
        """A trickle of requests must not wait unboundedly for a full
        batch (VERDICT r2 item 4): with max_wait_ms set, a partial batch
        is padded and shipped once the oldest request has waited that
        long, and per-request latency is tracked."""
        import time as _t

        p, dm = predictor
        good = dm.train[0].image_path
        server = StreamingServer(
            p, image_batch=4, questions_per_image=2, max_wait_ms=150
        )
        # Warm the (4, 2) program: jit compile happens at first dispatch
        # and would otherwise dominate the timed window on CPU.
        list(server.serve(iter([(good, ["w"])] * 4)))

        def slow_source():
            yield (good, ["q one"])  # then the source stalls for seconds
            _t.sleep(3.0)
            yield (good, ["q two"])

        t0 = _t.perf_counter()
        first_at = None
        results = []
        for idx, res, n in server.serve(slow_source()):
            if first_at is None:
                first_at = _t.perf_counter() - t0
            results.append((idx, n))
        # Without max_wait the first result waits ≥3 s for a second image;
        # with it, the padded partial batch ships after ~150 ms (+compute).
        assert first_at is not None and first_at < 2.0, first_at
        assert sorted(i for i, _ in results) == [0, 1]
        summary = server.latency_summary()
        assert summary["n"] == 2
        assert summary["p50_ms"] > 0 and summary["p99_ms"] >= summary["p50_ms"]

    def test_max_wait_results_match_plain(self, predictor):
        """Partial max-wait batches are padded, not reshaped — logits must
        equal the full-batch path's."""
        p, dm = predictor
        good = dm.train[0].image_path
        qs = ["is the lung normal", "what organ is shown in this image"]
        plain = StreamingServer(p, image_batch=2, questions_per_image=2)
        [(_, want, _)] = list(plain.serve(iter([(good, qs)])))
        bounded = StreamingServer(
            p, image_batch=2, questions_per_image=2, max_wait_ms=50
        )
        [(_, got, _)] = list(bounded.serve(iter([(good, qs)])))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_topk_mode_matches_full_logits(self, predictor):
        """topk serving must yield the same ranked REAL answers as the
        full-logit path (index 0 <unk> and head padding excluded, matching
        predict_answer), at ~1/400th the device→host transfer."""
        p, dm = predictor
        reqs = lambda: iter([(dm.train[0].image_path, ["is it normal", "b"])])
        full = StreamingServer(p, image_batch=1, questions_per_image=2)
        [(_i, logits, n_full)] = list(full.serve(reqs()))
        k = 3
        topk = StreamingServer(p, image_batch=1, questions_per_image=2, topk=k)
        [(_i, (vals, ids), n)] = list(topk.serve(reqs()))
        assert n == n_full == 2
        assert vals.shape == ids.shape == (2, k)
        limit = min(len(p.answer_vocab), p.cfg.model.answer_vocab_size)
        masked = logits.copy()
        masked[:, 0] = -np.inf
        masked[:, limit:] = -np.inf
        ref_ids = np.argsort(-masked, axis=-1)[:, :k]
        assert (ids != 0).all() and (ids < limit).all()
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_allclose(
            vals, np.take_along_axis(logits, ref_ids, -1), atol=1e-5
        )

    def test_dedup_questions_matches_plain(self, predictor):
        """Unique-question dedup (encode U rows, gather per pair) must give
        the same logits as the plain fan-out — the question tower is
        row-independent, so dedup is exact, not approximate."""
        p, dm = predictor
        imgs = [s.image_path for s in dm.train[:3]]
        # Heavy duplication across images, like template-driven serving.
        reqs = lambda: iter(
            [(im, ["is it normal", "what organ is shown"]) for im in imgs]
        )
        plain = StreamingServer(p, image_batch=2, questions_per_image=2)
        ref = list(plain.serve(reqs()))
        dd = StreamingServer(
            p, image_batch=2, questions_per_image=2, dedup_questions=True
        )
        got = list(dd.serve(reqs()))
        assert len(ref) == len(got) == 3
        # Completion order differs between servers (threaded decode);
        # the request index is the alignment key.
        ref.sort(key=lambda r: r[0])
        got.sort(key=lambda r: r[0])
        for (ia, la, na), (ib, lb, nb) in zip(ref, got):
            assert na == nb and ia == ib
            np.testing.assert_allclose(la, lb, atol=2e-5, rtol=1e-5)

    def test_adaptive_q_matches_fixed_large_bucket(self, predictor):
        """Adaptive launch shape (VERDICT r2 #5): a batch whose largest
        request exceeds the base Q bucket runs the next power-of-two-of-Q
        program and must match a server built with that Q fixed."""
        p, dm = predictor
        imgs = [s.image_path for s in dm.train[:2]]
        qs = ["q one", "q two", "q three", "q four"]
        reqs = lambda: iter([(im, qs) for im in imgs])
        fixed = StreamingServer(p, image_batch=2, questions_per_image=4)
        ref = sorted(fixed.serve(reqs()), key=lambda r: r[0])
        ada = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=2,
            adaptive_q=True,
            q_max=4,
        )
        assert ada.q_buckets == [2, 4]
        got = sorted(ada.serve(reqs()), key=lambda r: r[0])
        assert 4 in ada._fwd_cache  # the big bucket actually ran
        for (ia, la, na), (ib, lb, nb) in zip(ref, got):
            assert ia == ib and na == nb == 4
            np.testing.assert_allclose(
                la[:na], lb[:nb], atol=2e-5, rtol=1e-5
            )

    def test_adaptive_q_small_requests_stay_on_base_program(self, predictor):
        """No-regression guarantee: a workload that never exceeds the base
        bucket must use exactly the base program (identical to
        adaptive_q=False) and compile nothing else."""
        p, dm = predictor
        server = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=2,
            adaptive_q=True,
            q_max=8,
        )
        reqs = [(s.image_path, ["a", "b"]) for s in dm.train[:2]]
        out = list(server.serve(iter(reqs)))
        assert len(out) == 2
        assert list(server._fwd_cache) == [2]

    def test_adaptive_q_dedup_matches_plain(self, predictor):
        """Adaptive bucket selection composes with question dedup: the
        (U, Qb) program must equal the plain fan-out at the grown shape."""
        p, dm = predictor
        imgs = [s.image_path for s in dm.train[:2]]
        qs = ["is it normal", "what organ is shown", "is it normal again"]
        reqs = lambda: iter([(im, qs) for im in imgs])
        plain = StreamingServer(p, image_batch=2, questions_per_image=4)
        ref = sorted(plain.serve(reqs()), key=lambda r: r[0])
        ada = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=2,
            adaptive_q=True,
            q_max=4,
            dedup_questions=True,
        )
        got = sorted(ada.serve(reqs()), key=lambda r: r[0])
        for (ia, la, na), (ib, lb, nb) in zip(ref, got):
            assert ia == ib and na == nb == 3
            np.testing.assert_allclose(
                la[:na], lb[:nb], atol=2e-5, rtol=1e-5
            )

    def test_pack_pairs_uneven_counts_match_plain(self, predictor):
        """Pair packing (the uneven-question batching scheduler) must give
        the same logits as the padded fan-out, yielding exactly n rows."""
        p, dm = predictor
        imgs = [s.image_path for s in dm.train[:3]]
        reqs = lambda: iter(
            [
                (imgs[0], ["is it normal"]),
                (imgs[1], ["is it normal", "what organ is shown", "q3"]),
                (imgs[2], ["what organ is shown"]),
            ]
        )
        plain = StreamingServer(
            p, image_batch=2, questions_per_image=4, decode_threads=1
        )
        ref = list(plain.serve(reqs()))
        packed = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=4,
            pack_pairs=True,
            decode_threads=1,
        )
        got = list(packed.serve(reqs()))
        assert [n for _, _, n in got] == [n for _, _, n in ref] == [1, 3, 1]
        assert [i for i, _, _ in got] == [i for i, _, _ in ref] == [0, 1, 2]
        assert packed.pairs_processed == 5
        for (_, la, na), (_, lb, nb) in zip(ref, got):
            assert lb.shape[0] == nb  # exactly n rows, no padding
            np.testing.assert_allclose(la[:na], lb, atol=2e-5, rtol=1e-5)

    def test_pair_budget_early_close_matches_plain(self, predictor):
        """A fixed pair budget closes batches early (underfilled image
        slots) but must not change any answer."""
        p, dm = predictor
        imgs = [s.image_path for s in dm.train[:4]]
        qsets = [["a"], ["a", "b", "c"], ["b", "c"], ["a", "c"]]
        reqs = lambda: iter(list(zip(imgs, qsets)))
        plain = StreamingServer(
            p, image_batch=2, questions_per_image=4, decode_threads=1
        )
        ref = list(plain.serve(reqs()))
        budget = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=4,
            pack_pairs=True,
            pair_budget=4,  # forces early closes on the 3+2 sequence
            decode_threads=1,
        )
        got = list(budget.serve(reqs()))
        assert [n for _, _, n in got] == [n for _, _, n in ref] == [1, 3, 2, 2]
        assert [i for i, _, _ in got] == [0, 1, 2, 3]
        for (_, la, na), (_, lb, nb) in zip(ref, got):
            np.testing.assert_allclose(la[:na], lb, atol=2e-5, rtol=1e-5)

    def test_pack_pairs_randomized_accounting(self, predictor):
        """Property test over the scheduler's bookkeeping: random uneven
        question counts (including zero), a corrupt request, threaded
        decode, early closes — every good request must be answered exactly
        once with exactly its own n rows, and pairs_processed must equal
        the true pair count."""
        import numpy as np_

        p, dm = predictor
        rnd = np_.random.RandomState(7)
        good = [s.image_path for s in dm.train[:4]]
        reqs, expected = [], {}
        for i in range(17):
            if i == 5:
                reqs.append(("/nonexistent/broken.dcm", ["q"]))
                continue
            n = int(rnd.randint(0, 5))  # 0..4 questions, cap Q=3 below
            qs = [f"question number {rnd.randint(0, 6)}" for _ in range(n)]
            reqs.append((good[i % 4], qs))
            expected[i] = min(n, 3)
        server = StreamingServer(
            p,
            image_batch=2,
            questions_per_image=3,
            pack_pairs=True,
            pair_budget=4,
            decode_threads=2,
        )
        got = {}
        for idx, out, n in server.serve(iter(reqs)):
            assert idx not in got, "request answered twice"
            got[idx] = (out, n)
        assert set(got) == set(expected)
        for idx, (out, n) in got.items():
            assert n == expected[idx]
            rows = out.shape[0]
            assert rows == n  # packed mode: exactly n rows
        assert server.pairs_processed == sum(expected.values())
        [(bad_idx, _)] = server.errors
        assert bad_idx == 5

    def test_serve_order_and_shapes(self, predictor, rng):
        p, dm = predictor
        server = StreamingServer(
            p, image_batch=2, questions_per_image=4, decode_threads=2
        )
        paths = [s.image_path for s in dm.train[:5]]
        reqs = [(path, ["q one", "q two", "q three"]) for path in paths]
        results = list(server.serve(iter(reqs)))
        assert len(results) == 5
        assert sorted(i for i, _, _ in results) == [0, 1, 2, 3, 4]
        for _, logits, n in results:
            assert n == 3
            assert logits.shape == (4, p.cfg.model.answer_vocab_size)
        assert server.pairs_processed == 15
        assert server.pairs_per_second > 0
