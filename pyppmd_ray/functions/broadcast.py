"""Shared lazy-ObjectRef broadcast discipline for map_batches callables.

A stage instance holds ONLY the ObjectRef; the state is fetched once per
worker process on first use. ``__getstate__`` drops any resolved state,
so pickling the instance (task mode) ships the tiny ref and the broadcast
genuinely goes through the object store — never the serialized UDF.
"""

from __future__ import annotations

import ray


class LazyBroadcast:
    """Base: hold an ObjectRef (or a plain value for tests); resolve once
    per worker process on first use."""

    def __init__(self, ref):
        self._ref = ref
        self._state = None

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_state"] = None
        return d

    @property
    def state(self):
        if self._state is None:
            r = self._ref
            self._state = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        return self._state
