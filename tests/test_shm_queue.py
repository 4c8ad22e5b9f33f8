"""Native shared-memory queue: correctness + cross-process transport
(the analog of reference tests/test_precheck.py, which verifies shared-memory
IPC actually works on the platform before the suite runs)."""

import multiprocessing as mp
import time

import pytest

from sample_factory_tpu.native.shm_queue import QueueEmpty, QueueFull, ShmQueue

pytestmark = pytest.mark.skipif(not ShmQueue.available(), reason="native toolchain unavailable")


def test_put_get_roundtrip():
    q = ShmQueue(capacity_bytes=1 << 16)
    try:
        q.put({"hello": [1, 2, 3]})
        q.put(("tuple", 42))
        msgs = q.get_many()
        assert msgs == [{"hello": [1, 2, 3]}, ("tuple", 42)]
    finally:
        q.close()


def test_get_empty_times_out():
    q = ShmQueue(capacity_bytes=1 << 12)
    try:
        t0 = time.time()
        with pytest.raises(QueueEmpty):
            q.get(timeout=0.2)
        assert 0.1 < time.time() - t0 < 2.0
    finally:
        q.close()


def test_put_full_times_out():
    q = ShmQueue(capacity_bytes=1 << 10)
    try:
        with pytest.raises(QueueFull):
            for _ in range(10000):
                q.put(b"x" * 128, timeout=0.05)
    finally:
        q.close()


def test_batched_put_many_get_many():
    q = ShmQueue(capacity_bytes=1 << 20)
    try:
        msgs = [{"i": i, "payload": "x" * i} for i in range(200)]
        q.put_many(msgs)
        assert q.qsize() == 200
        out = q.get_many(max_messages=1000)
        assert out == msgs
        assert q.qsize() == 0
    finally:
        q.close()


def _producer(queue_name, n):
    q = ShmQueue(name=queue_name, create=False)
    for i in range(n):
        q.put(("msg", i))


def test_cross_process():
    ctx = mp.get_context("spawn")
    q = ShmQueue(capacity_bytes=1 << 20)
    try:
        procs = [ctx.Process(target=_producer, args=(q.name, 50)) for _ in range(3)]
        for p in procs:
            p.start()
        received = []
        # generous deadline + drain-after-join: on a loaded CI box, spawning
        # three interpreters can take longer than the whole transfer, and the
        # receive loop must not stop counting before the producers started
        deadline = time.time() + 120
        while len(received) < 150 and time.time() < deadline:
            try:
                received.extend(q.get_many(timeout=1.0))
            except QueueEmpty:
                pass
        for p in procs:
            p.join(timeout=30)
        try:
            received.extend(q.get_many(timeout=1.0))
        except QueueEmpty:
            pass
        assert len(received) == 150
        # each producer's messages arrive in order
        by_val = [i for (_, i) in received]
        assert sorted(by_val) == sorted(list(range(50)) * 3)
    finally:
        q.close()
