"""Per-instance bounded memoization for methods that build jitted closures.

functools.lru_cache on a bound method keys a CLASS-level cache by ``self``:
every discarded instance (and the device params / compiled programs its
closures capture — chip HBM) stays strongly reachable for the process
lifetime.  ``instance_cache`` stores the memo on the instance instead, so
dropping the object frees its programs, and bounds the memo size so a
caller cycling through distinct argument tuples (e.g. a server accepting
custom sampling parameters) cannot grow compiled-program count without
limit.

Keys are the *normalized* call signature (defaults applied), so
``f(16, 1.0, 0.5)`` and ``f(16, 1.0, 0.5, None)`` share one entry — a raw
args-tuple key would silently compile the same program twice.
"""

from __future__ import annotations

import functools
import inspect
import threading
from collections import OrderedDict


def instance_cache(fn=None, *, maxsize: int = 32):
    """Decorator: memoize on ``self._memo_<name>`` (bounded LRU).

    Thread-safe: concurrent HTTP handler threads (the streaming endpoint)
    and the batch dispatcher share these builders.  The build itself runs
    under the lock — two first-callers with the same shapes must NOT both
    compile the same multi-minute TPU program, and an unlocked LRU eviction
    racing a hit would KeyError."""

    def deco(f):
        sig = inspect.signature(f)
        attr = f"_memo_{f.__name__}"
        lock_attr = attr + "_lock"

        @functools.wraps(f)
        def wrapper(self, *args, **kwargs):
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            key = (tuple(bound.arguments.items())[1:],)  # drop self
            # setdefault on the instance dict is atomic under the GIL
            lock = self.__dict__.setdefault(lock_attr, threading.Lock())
            with lock:
                memo = self.__dict__.setdefault(attr, OrderedDict())
                if key in memo:
                    memo.move_to_end(key)
                    return memo[key]
                value = f(self, *args, **kwargs)
                memo[key] = value
                if len(memo) > maxsize:
                    memo.popitem(last=False)
                return value

        wrapper._memo_attr = attr
        return wrapper

    if fn is not None:
        return deco(fn)
    return deco
