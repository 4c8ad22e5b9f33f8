"""Import-only stub for signal_slot.queue_utils.get_queue."""

import queue


class _FakeQueue(queue.Queue):
    def get_many(self, *args, **kwargs):
        raise RuntimeError("signal_slot stub queue: not functional")

    def put_many(self, *args, **kwargs):
        raise RuntimeError("signal_slot stub queue: not functional")


def get_queue(serial=False, buffer_size_bytes=1_000_000):
    return _FakeQueue()
