"""Global config: a tiny donfig-compatible implementation.

The reference uses donfig with YAML defaults autocompute=True, mapnumpy=True
(graphblas/graphblas.yaml, __init__.py:22-37).  donfig is not a dependency we
take; this provides the same surface used by the reference and its tests:
``gb.config.get/set``, ``gb.config["key"]``, and ``with gb.config.set(...):``.
"""

import contextlib
import threading

__all__ = ["Config", "config"]


class _ConfigSet(contextlib.AbstractContextManager):
    def __init__(self, config, updates):
        self._config = config
        self._old = {k: config._values.get(k, _MISSING) for k in updates}
        config._values.update(updates)

    def __exit__(self, *exc):
        for k, v in self._old.items():
            if v is _MISSING:
                self._config._values.pop(k, None)
            else:
                self._config._values[k] = v
        return False


class _Missing:
    def __repr__(self):
        return "<missing>"


_MISSING = _Missing()


def _normalize(key):
    return key.replace("-", "_")


class Config:
    def __init__(self, defaults=None):
        self._values = dict(defaults or {})
        self._lock = threading.Lock()

    def get(self, key, default=_MISSING):
        key = _normalize(key)
        if key in self._values:
            return self._values[key]
        if default is not _MISSING:
            return default
        raise KeyError(key)

    def set(self, arg=None, **kwargs):
        updates = {}
        if arg:
            updates.update({_normalize(k): v for k, v in arg.items()})
        updates.update({_normalize(k): v for k, v in kwargs.items()})
        return _ConfigSet(self, updates)

    def __getitem__(self, key):
        return self.get(key)

    def __setitem__(self, key, value):
        self._values[_normalize(key)] = value

    def __contains__(self, key):
        return _normalize(key) in self._values

    def __repr__(self):
        return f"Config({self._values!r})"


config = Config({
    "autocompute": True,
    "mapnumpy": True,
    # storage-format policy (TPU-native sparse engine, core/engine/sparse.py):
    # matrices with nrows*ncols above auto_sparse_limit are backed by the
    # padded-CSR store; densifying above dense_limit raises instead of
    # allocating an O(nrows*ncols) bitmap on device.
    "auto_sparse_limit": 1 << 22,
    "dense_limit": 1 << 26,
})
