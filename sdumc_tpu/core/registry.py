"""Generic name->factory registries.

The reference hardcodes three dispatch dicts (``toolkit/models/__init__.py:36-66``,
``toolkit/data/__init__.py:10-41``, ``toolkit/dataloader/__init__.py:18-36``)
whose imports reference files stripped from the public snapshot and would
raise ``ImportError``. Here registration is decentralized: modules register
themselves on import, unknown names fail with a helpful message, and missing
model families are a clean extension point rather than dead imports.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Registry:
    def __init__(self, kind: str):
        self._kind = kind
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str, factory: Callable[..., Any] | None = None):
        """Register a factory; usable as a decorator or a direct call."""
        if factory is not None:
            self._entries[name] = factory
            return factory

        def deco(fn):
            self._entries[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries)) or "<none>"
            raise KeyError(
                f"Unknown {self._kind} {name!r}. Registered: {known}. "
                f"Register new entries via sdumc_tpu.core.registry."
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self) -> Iterable[str]:
        return sorted(self._entries)


MODELS = Registry("model")
DATASETS = Registry("dataset")
DATALOADERS = Registry("dataloader")
EXTRACTORS = Registry("extractor")
