"""A-22: ParseResult — confidence-precedence field merge.

Mirrors the reference's ``ParseResult`` semantics (SURVEY.md §1.1 [R]):
an extractor may only overwrite a field with a **strictly higher**
confidence; the fixed chain order therefore breaks ties (first writer
wins at equal confidence). The final value of each output column is
``argmax over extractors of confidence``.
"""

from __future__ import annotations

from typing import Any


class ParseResult:
    __slots__ = ("_values", "_confidences")

    def __init__(self) -> None:
        self._values: dict[str, Any] = {}
        self._confidences: dict[str, float] = {}

    def set(self, name: str, value: Any, confidence: float) -> bool:
        """Set field iff strictly higher confidence; returns True if set."""
        if value is None:
            return False
        if isinstance(value, (list, str)) and len(value) == 0:
            return False
        current = self._confidences.get(name, 0.0)
        if confidence > current:
            self._values[name] = value
            self._confidences[name] = confidence
            return True
        return False

    def get(self, name: str, default: Any = None) -> Any:
        return self._values.get(name, default)

    def confidence(self, name: str) -> float:
        return self._confidences.get(name, 0.0)

    @property
    def confidences(self) -> dict[str, float]:
        return dict(self._confidences)
