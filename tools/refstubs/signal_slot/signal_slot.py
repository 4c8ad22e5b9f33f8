"""Import-only stubs for signal_slot.signal_slot symbols used by the reference."""

from typing import Any, Callable

StatusCode = int


def configure_logger(_log) -> None:
    pass


def process_name(_obj) -> str:
    return "probe"


def signal(func: Callable) -> Callable:
    """The reference uses @signal as a decorator producing emittable attributes.

    For import-only purposes a passthrough property-ish object suffices.
    """

    class _Signal:
        def __init__(self, f):
            self._f = f

        def __get__(self, obj, objtype=None):
            return self

        def emit(self, *args, **kwargs):
            raise RuntimeError("signal_slot stub: signals are not functional in probe mode")

        def connect(self, *args, **kwargs):
            pass

        def broadcast_on(self, *args, **kwargs):
            pass

        def disconnect(self, *args, **kwargs):
            pass

    return _Signal(func)


class EventLoopStatus:
    NORMAL_TERMINATION = 0
    INTERRUPTED = 1


class BoundMethod:
    def __init__(self, obj: Any, method_name: str):
        self.obj = obj
        self.method_name = method_name


class EventLoopObject:
    def __init__(self, event_loop=None, object_id=None):
        self.event_loop = event_loop
        self.object_id = object_id

    def emit(self, *args, **kwargs):
        raise RuntimeError("signal_slot stub: not functional")

    def connect(self, *args, **kwargs):
        pass

    def disconnect(self, *args, **kwargs):
        pass

    def subscribe(self, *args, **kwargs):
        pass


class Timer(EventLoopObject):
    def __init__(self, event_loop=None, interval_sec=1.0, single_shot=False, *args, **kwargs):
        super().__init__(event_loop)
        self.interval_sec = interval_sec

    def start(self):
        pass

    def stop(self):
        pass


class TightLoop(Timer):
    pass


class EventLoop(EventLoopObject):
    def __init__(self, unique_loop_name=None, serial_mode=False):
        super().__init__(None, unique_loop_name)
        self.owner = None

    def exec(self):
        raise RuntimeError("signal_slot stub: event loop is not functional")

    def stop(self):
        pass

    def terminate(self):
        pass


class EventLoopProcess:
    def __init__(self, unique_process_name=None, multiprocessing_context=None, init_func=None, args=None, daemon=False):
        self.event_loop = EventLoop(unique_process_name)

    def start(self):
        raise RuntimeError("signal_slot stub: processes are not functional")

    def join(self, *a, **k):
        pass
