"""Streaming many-questions-per-image inference [B:11, SURVEY §3.5].

Host threads decode DICOM/JPEG bytes into a bounded queue; the device loop
consumes fixed-shape (B images × Q questions) batches through ONE jit'd
program: on-device resize/normalize → image encoder (TP-shardable) → BTIA →
AD head. JAX's async dispatch overlaps the host decode of batch N+1 with
device compute of batch N; the throughput target is ≥5k image–question
pairs/sec/chip [B:5].
"""

from __future__ import annotations

import queue
import threading
import time
from collections import OrderedDict
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from btia_tpu.data.image import load_ingest_image
from btia_tpu.infer.predict import ImageLike, Predictor


class _DecodeError:
    """Queue envelope for a per-request decode/tokenize failure."""

    def __init__(self, idx: int, exc: Exception):
        self.idx = idx
        self.exc = exc


class StreamingServer:
    def __init__(
        self,
        predictor: Predictor,
        image_batch: int = 8,
        questions_per_image: int = 8,
        decode_threads: int = 2,
        queue_depth: int = 4,
        topk: Optional[int] = None,
        dedup_questions: bool = False,
        pack_pairs: bool = False,
        pair_budget: Optional[int] = None,
        max_in_flight: int = 2,
        max_wait_ms: Optional[float] = None,
        adaptive_q: bool = False,
        q_max: Optional[int] = None,
    ):
        """`topk`: fetch only the top-k (value, answer-id) pairs per question
        instead of the full answer-vocab logits. Serving callers only need
        the ranked answers; at vocab 2048 this shrinks the device→host
        transfer ~400x, which matters when the host link is the bottleneck
        (it is on the benchmark tunnel). serve() then yields
        ((values (Q,k), ids (Q,k)), n) per image instead of (logits, n).

        `dedup_questions`: encode only the unique question rows of each
        device batch and gather per pair (exact — see
        BTIAADNet.answer_questions_indexed). Serving question streams are
        template-heavy, and the question tower is ~37% of the device step
        at B=16, Q=128, so this is the main fan-out throughput lever. One
        program compiles per power-of-two unique-count bucket.

        `pack_pairs`: the batching scheduler for UNEVEN question counts.
        Instead of padding every image to Q question slots, the B images'
        real questions pack densely into a (P,) pair list (P = sum(n_i),
        bucketed) driving BTIAADNet.answer_pairs — no fan-out compute is
        spent on padding slots. Implies question dedup. serve() then
        yields exactly n rows per image: (logits (n, vocab), n), or
        ((values (n, k), ids (n, k)), n) with topk. `questions_per_image`
        remains the per-image cap.

        `pair_budget` (packed mode): dispatch with a FIXED pair capacity,
        closing a batch early (fewer than B images) when the next request
        would overflow it. Without it, P buckets to the batch's real pair
        count — but multi-threaded decode makes batch composition
        nondeterministic, so bucket sizes thrash and each first-seen
        (U, P) shape pays a program load (measured: the uneven e2e bench
        never reached steady state). A fixed budget means ONE compiled
        program; size it to the workload's B·mean(n) (e.g. B*Q//2).

        `adaptive_q`: select the fan-out launch shape from the WORKLOAD.
        `questions_per_image` stays the base bucket; requests may carry up
        to `q_max` (default 2x) questions, and each batch runs the
        smallest compiled power-of-two-of-Q bucket that fits its largest
        request. Measured motivation (BENCH_NOTES launch-shape sweep):
        Q=256 amortizes the image tower to 6,985 pairs/s (+12% over
        Q=128), but a fixed Q=256 pads sparse requests; adaptive buckets
        give dense workloads the big program without regressing the
        Q<=base path (same program as adaptive_q=False). Also removes the
        silent truncation of requests with more than Q questions, up to
        q_max. At most len(q_buckets) programs compile per mode.

        `max_wait_ms`: bound per-request latency on sparse streams. The
        batcher normally waits for B decoded images before dispatching; a
        trickle of requests would wait unboundedly. With a max wait, a
        partial batch is padded and shipped once the OLDEST pending
        request has waited this long. Throughput-optimal workloads leave
        it None (the default); latency-sensitive serving sets it to the
        SLO budget minus one device step. Per-request enqueue→yield
        latency is tracked either way: see `latency_summary()`."""
        self.p = predictor
        self.B = image_batch
        self.Q = questions_per_image
        self.decode_threads = decode_threads
        self.queue_depth = queue_depth
        # topk=0 means "no top-k", same as None — callers pass user input
        # (e.g. cli --topk) straight through, and a k=0 lax.top_k would
        # yield empty tuples the full-logit consumers then crash on.
        self.topk = topk or None
        self.pairs_processed = 0
        self.wall_seconds = 0.0
        # Per-request decode/tokenize failures as (request_index, exc) —
        # the request is skipped, the server keeps running; inspect after
        # serve() completes.
        self.errors: List[Tuple[int, Exception]] = []
        # Questions repeat heavily across images in VQA serving (template
        # questions); memoize host-side tokenization — WordPiece encode is
        # pure Python and the host has one core. Bounded: a long-running
        # server over an open-ended stream must not grow without limit.
        self._tok_memo: "OrderedDict" = OrderedDict()
        self._tok_memo_cap = 65536
        # Decode workers share the memo; CPython's GIL makes each dict op
        # atomic today, but get/set/evict is a compound sequence — guard it
        # so free-threaded builds can't over-evict or lose entries. The
        # lock cost is negligible next to a WordPiece encode.
        self._tok_memo_lock = threading.Lock()
        self.dedup_questions = dedup_questions
        self.pack_pairs = pack_pairs
        # A budget below Q couldn't fit one full request.
        self.pair_budget = (
            max(pair_budget, questions_per_image) if pair_budget else None
        )
        self.max_in_flight = max(1, max_in_flight)
        self.max_wait = max_wait_ms / 1000.0 if max_wait_ms else None
        # Per-request enqueue→yield latency (seconds), bounded window so a
        # long-running server doesn't grow without limit; reset per serve().
        from collections import deque

        self.latencies: "deque[float]" = deque(maxlen=65536)
        # Launch-shape buckets: fixed [Q], or Q·2^i capped at q_max when
        # adaptive. The BASE bucket program is identical to the
        # non-adaptive one, so enabling adaptive_q cannot regress a
        # workload that never exceeds Q questions per image.
        if adaptive_q:
            cap = max(q_max or 2 * self.Q, self.Q)
            self.q_buckets = [self.Q]
            while self.q_buckets[-1] < cap:
                self.q_buckets.append(min(self.q_buckets[-1] * 2, cap))
        else:
            self.q_buckets = [self.Q]
        self.q_cap = self.q_buckets[-1]
        self._ifwd_cache: dict = {}
        self._fwd_cache: dict = {}
        if not pack_pairs:
            self._plain_fwd(self.Q)  # base program, compiled eagerly

    def _q_bucket(self, n: int) -> int:
        """Smallest launch bucket holding n questions (n is pre-capped at
        q_cap by the decode workers)."""
        for b in self.q_buckets:
            if n <= b:
                return b
        return self.q_buckets[-1]

    def _plain_fwd(self, Qb: int):
        """Compiled fan-out for a Qb-question launch bucket."""
        if Qb not in self._fwd_cache:
            base = self.p._fanout_forward(self.B, Qb)
            if self.topk is None:
                self._fwd_cache[Qb] = base
            else:
                self._fwd_cache[Qb] = jax.jit(self._topk_wrap(base))
        return self._fwd_cache[Qb]

    def _topk_wrap(self, base):
        """Append top-k selection over REAL answers (ops/answers.py rule:
        no <unk>, no static-head padding — same as eval/predict_answer)."""
        from btia_tpu.ops.answers import real_limit, topk_real

        k = self.topk
        limit = real_limit(
            len(self.p.answer_vocab), self.p.cfg.model.answer_vocab_size
        )

        def fwd(v, *data):
            return topk_real(base(v, *data), k, limit)

        return fwd

    def _indexed_fwd(self, U: int, Qb: int):
        """Compiled dedup fan-out for a (U unique rows, Qb launch) bucket."""
        key = ("idx", U, Qb)
        if key not in self._ifwd_cache:
            base = self.p._fanout_forward_indexed(self.B, Qb, U)
            if self.topk is None:
                self._ifwd_cache[key] = base
            else:
                self._ifwd_cache[key] = jax.jit(self._topk_wrap(base))
        return self._ifwd_cache[key]

    def _pairs_fwd(self, U: int, P: int):
        """Compiled packed fan-out for a (U, P) bucket."""
        key = (U, P)
        if key not in self._ifwd_cache:
            base = self.p._pairs_forward(self.B, U, P)
            if self.topk is None:
                self._ifwd_cache[key] = base
            else:
                self._ifwd_cache[key] = jax.jit(self._topk_wrap(base))
        return self._ifwd_cache[key]

    @staticmethod
    def _bucket_pow2(n: int, lo: int, hi: int) -> int:
        b = lo
        while b < n:
            b *= 2
        return min(b, hi)

    def _decode_worker(
        self,
        src: Iterator[Tuple[ImageLike, Sequence[str]]],
        out_q: "queue.Queue",
        lock: threading.Lock,
    ) -> None:
        # The None sentinel MUST go out even if decode raises — otherwise a
        # single malformed image kills the thread silently and serve() blocks
        # forever on q.get(). Exceptions travel through the queue so the
        # serving loop can surface them (skip the request, keep serving).
        try:
            while True:
                with lock:
                    try:
                        idx, item = next(src)
                    except StopIteration:
                        break
                # Latency clock starts when the request leaves the source
                # iterator — it covers decode, batching wait, device queue,
                # compute, and the result fetch.
                t_enq = time.perf_counter()
                image, questions = item
                try:
                    img = self.p._prep_image(image)
                    qids = np.zeros(
                        (self.q_cap, self.p.cfg.model.max_question_len),
                        np.int32,
                    )
                    n = min(len(questions), self.q_cap)
                    for j, qtext in enumerate(list(questions)[:n]):
                        with self._tok_memo_lock:
                            ids = self._tok_memo.get(qtext)
                        if ids is None:
                            ids = self.p._tokenize([qtext])[0]
                            with self._tok_memo_lock:
                                self._tok_memo[qtext] = ids
                                if len(self._tok_memo) > self._tok_memo_cap:
                                    self._tok_memo.popitem(last=False)  # LRU
                        qids[j] = ids
                except Exception as e:  # bad request: report, keep serving
                    out_q.put(_DecodeError(idx, e))
                    continue
                out_q.put((idx, img, qids, n, t_enq))
        finally:
            out_q.put(None)

    def warmup(self) -> float:
        """Pre-compile the serving program by pushing one synthetic batch
        end-to-end, so the first real request sees ~step-time latency
        instead of the full jit compile (measured 118.8 s first-run on the
        flagship config — an operator staring at a silent 2-minute hang).
        Counters/latencies are restored; returns the warmup wall seconds.
        Dedup/packed modes compile their first bucket here; other buckets
        still compile lazily on first use."""
        t0 = time.perf_counter()
        pp, ws = self.pairs_processed, self.wall_seconds
        img = np.zeros((self.p.ingest_size, self.p.ingest_size, 3), np.uint8)
        reqs = [(img, ["warmup question"])] * self.B
        for _ in self.serve(iter(reqs)):
            pass
        self.pairs_processed, self.wall_seconds = pp, ws
        self.latencies.clear()
        return time.perf_counter() - t0

    def serve(
        self,
        requests: Iterable[Tuple[ImageLike, Sequence[str]]],
    ) -> Iterator[Tuple[int, object, int]]:
        """Yields (request_index, result, n_valid_questions) per image, in
        order of COMPLETION — multi-threaded decode reorders requests, so
        the index is the only safe way to attribute answers (a zip against
        the request list would mis-assign them, and skipped bad requests
        would shift every later row). result is logits (Q, vocab) — or
        (n, vocab) with pack_pairs, or (values, ids) with topk. Failed
        requests appear in `self.errors` as (index, exception) and yield
        nothing. Pads the tail to keep the compiled shape static."""
        # Throughput stats accumulate across serve() calls, but errors are
        # per-call. Reset them HERE, in the non-generator wrapper, so a
        # caller that creates the generator and inspects server.errors
        # before the first next() already sees a clean list (a lazy reset
        # inside the generator body left the previous call's stale pairs
        # visible until iteration started).
        self.errors = []
        return self._serve_iter(requests)

    def _serve_iter(
        self,
        requests: Iterable[Tuple[ImageLike, Sequence[str]]],
    ) -> Iterator[Tuple[int, object, int]]:
        src = enumerate(iter(requests))
        self.latencies.clear()
        q: "queue.Queue" = queue.Queue(maxsize=self.queue_depth * self.B)
        lock = threading.Lock()
        workers = [
            threading.Thread(
                target=self._decode_worker, args=(src, q, lock), daemon=True
            )
            for _ in range(self.decode_threads)
        ]
        for w in workers:
            w.start()

        done_workers = 0
        pending: List[Tuple[np.ndarray, np.ndarray, int]] = []
        in_flight: List[Tuple[jax.Array, List[int]]] = []
        t0 = time.perf_counter()
        wall_base = self.wall_seconds

        BQ = self.B * self.q_cap

        def dispatch(items):
            # items: (request_idx, image, qids (q_cap, L), n, t_enq) — idx
            # -1 marks a tail/partial-batch padding slot.
            imgs = np.stack([it[1] for it in items])
            qids = np.stack([it[2] for it in items])
            # Workload-adaptive launch shape: the smallest compiled Q
            # bucket that fits this batch's largest request (q_buckets ==
            # [Q] unless adaptive_q).
            Qb = self._q_bucket(max(max(it[3], 1) for it in items))
            if self.pack_pairs:
                # Dense pair packing: only the real (image, question) pairs
                # occupy fan-out slots; unique questions encoded once.
                rows = [it[2][: it[3]] for it in items if it[3] > 0]
                flat = (
                    np.concatenate(rows)
                    if rows
                    else np.zeros((0, qids.shape[-1]), qids.dtype)
                )
                uniq, inv = np.unique(flat, axis=0, return_inverse=True)
                U = self._bucket_pow2(max(len(uniq), 1), 32, BQ)
                upad = np.zeros((U - len(uniq), qids.shape[-1]), qids.dtype)
                uniq = np.concatenate([uniq, upad]) if len(upad) else uniq
                p_img = np.concatenate(
                    [
                        np.full(it[3], i, np.int32)
                        for i, it in enumerate(items)
                        if it[3] > 0
                    ]
                    or [np.zeros(0, np.int32)]
                )
                if self.pair_budget:
                    P = self.pair_budget  # fixed: one compiled program
                else:
                    # Coarse buckets (quarters of BQ) — fine-grained
                    # power-of-two buckets thrash under multi-threaded
                    # decode's nondeterministic batch composition.
                    P = self._bucket_pow2(
                        max(len(p_img), 1), max(BQ // 4, 1), BQ
                    )
                pair_img = np.zeros(P, np.int32)
                pair_q = np.zeros(P, np.int32)
                pair_img[: len(p_img)] = p_img
                pair_q[: len(p_img)] = inv.astype(np.int32)
                meta, off = [], 0
                for it in items:
                    meta.append((it[0], it[3], off, it[4]))
                    off += max(it[3], 0)
                out = self._pairs_fwd(U, P)(
                    self.p.variables, imgs, uniq, pair_img, pair_q
                )
            elif self.dedup_questions:
                flat = qids[:, :Qb].reshape(self.B * Qb, -1)
                uniq, inv = np.unique(flat, axis=0, return_inverse=True)
                U = self._bucket_pow2(len(uniq), 32, self.B * Qb)
                pad = np.zeros((U - len(uniq), flat.shape[1]), flat.dtype)
                uniq = np.concatenate([uniq, pad]) if len(pad) else uniq
                qmap = inv.reshape(self.B, Qb).astype(np.int32)
                out = self._indexed_fwd(U, Qb)(
                    self.p.variables, imgs, uniq, qmap
                )
                meta = [(it[0], it[3], 0, it[4]) for it in items]
            else:
                out = self._plain_fwd(Qb)(
                    self.p.variables, imgs, qids[:, :Qb]
                )
                meta = [(it[0], it[3], 0, it[4]) for it in items]
            in_flight.append((out, meta))

        def drain(block_all: bool = False):
            # Keep ≤max_in_flight device batches queued (double buffering
            # by default; deeper pipelines smooth host scheduling jitter
            # at the cost of latency and result-buffer memory).
            while in_flight and (
                block_all or len(in_flight) >= self.max_in_flight
            ):
                out, meta = in_flight.pop(0)
                if self.topk is None:
                    host = np.asarray(jax.device_get(out))
                    if self.pack_pairs:
                        row = lambda i, n, off: host[off : off + n]
                    else:
                        row = lambda i, n, off: host[i]
                else:
                    vals, idxs = map(np.asarray, jax.device_get(out))
                    if self.pack_pairs:
                        row = lambda i, n, off: (
                            vals[off : off + n],
                            idxs[off : off + n],
                        )
                    else:
                        row = lambda i, n, off: (vals[i], idxs[i])
                for i, (idx, n, off, t_enq) in enumerate(meta):
                    if n < 0:  # tail-padding row, not a real request
                        continue
                    self.pairs_processed += n
                    # Updated per yield: callers may abandon the generator
                    # early (stop iterating) before the epilogue runs.
                    now = time.perf_counter()
                    self.wall_seconds = wall_base + now - t0
                    self.latencies.append(now - t_enq)
                    yield idx, row(i, n, off), n

        def close_partial():
            # Ship a padded partial batch (max-wait expiry or stream tail).
            pad = pending[-1]
            while len(pending) < self.B:
                pending.append((-1, pad[1], pad[2], -1, 0.0))
            dispatch(pending)

        while done_workers < self.decode_threads:
            if self.max_wait is not None and pending:
                # Bounded-latency batching: wait at most until the OLDEST
                # pending request has been waiting max_wait, then dispatch
                # the partial batch padded to B (same compiled shape) and
                # FORCE-drain it — pipelining depth only helps throughput,
                # and a sparse stream has nothing behind this batch.
                deadline = pending[0][4] + self.max_wait
                try:
                    item = q.get(
                        timeout=max(0.0, deadline - time.perf_counter())
                    )
                except queue.Empty:
                    close_partial()
                    pending = []
                    yield from drain(block_all=True)
                    continue
            elif self.max_wait is not None and in_flight:
                # Nothing pending but results in flight: if the stream
                # stalls, flush them rather than sitting on finished work
                # (a full batch followed by silence must not wait for the
                # next batch to push it out).
                try:
                    item = q.get(timeout=self.max_wait)
                except queue.Empty:
                    yield from drain(block_all=True)
                    continue
            else:
                item = q.get()
            if item is None:
                done_workers += 1
                continue
            if isinstance(item, _DecodeError):
                self.errors.append((item.idx, item.exc))
                continue
            if (
                self.pack_pairs
                and self.pair_budget
                and pending
                and sum(max(it[3], 0) for it in pending) + item[3]
                > self.pair_budget
            ):
                # Close early: the next request would overflow the fixed
                # pair capacity. Pad the image slots and ship.
                close_partial()
                pending = []
                yield from drain()
            pending.append(item)
            if len(pending) == self.B:
                dispatch(pending)
                pending = []
                yield from drain()
        if pending:
            close_partial()
        yield from drain(block_all=True)
        self.wall_seconds = wall_base + time.perf_counter() - t0

    @property
    def pairs_per_second(self) -> float:
        return self.pairs_processed / max(self.wall_seconds, 1e-9)

    def latency_summary(self) -> dict:
        """Per-request enqueue→yield latency percentiles (ms) for the last
        serve() stream (window-bounded at 65536 requests). Serving is
        judged on BOTH axes: pairs/s/chip (throughput) and p50/p99 request
        latency — a full-batch batcher can starve a sparse stream without
        `max_wait_ms` and only these numbers would show it."""
        if not self.latencies:
            return {"n": 0}
        lat = np.sort(np.asarray(self.latencies, np.float64)) * 1e3
        pick = lambda p: float(lat[min(len(lat) - 1, int(p * len(lat)))])
        return {
            "n": len(lat),
            "p50_ms": pick(0.50),
            "p90_ms": pick(0.90),
            "p99_ms": pick(0.99),
            "mean_ms": float(lat.mean()),
            "max_ms": float(lat[-1]),
        }
