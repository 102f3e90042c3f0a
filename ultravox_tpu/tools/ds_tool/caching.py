"""Disk cache for expensive task calls (reference: ds_tool/caching.py:15-40):
sha256 of the request payload keys a JSON/bytes file on disk, so re-runs of a
dataset-factory job skip completed API calls."""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Optional


class DiskCache:
    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, payload: Any, suffix: str = ".json") -> str:
        digest = hashlib.sha256(
            json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()
        return os.path.join(self.cache_dir, digest + suffix)

    def get_or_compute(self, payload: Any, fn: Callable[[], Any]) -> Any:
        path = self._path(payload)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        result = fn()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.replace(tmp, path)
        return result

    def get_or_compute_bytes(self, payload: Any, fn: Callable[[], bytes]) -> bytes:
        path = self._path(payload, suffix=".bin")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return f.read()
        result = fn()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(result)
        os.replace(tmp, path)
        return result


class CachingChatWrapper:
    """Wraps an OpenAI-compatible client with the disk cache (reference:
    ds_tool/caching.py CachingChatWrapper)."""

    def __init__(self, client: Any, cache_dir: str = ".cache/ds_tool/chat"):
        self._client = client
        self._cache = DiskCache(cache_dir)

    def chat_completion(self, **kwargs) -> str:
        def compute():
            response = self._client.chat.completions.create(**kwargs)
            return response.choices[0].message.content

        return self._cache.get_or_compute({"chat": kwargs}, compute)
