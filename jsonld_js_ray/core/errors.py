"""JSON-LD error model.

Mirrors the error surface of the reference processor (error ``code``
strings from the JSON-LD 1.1 API spec; cf. /root/reference/lib/JsonLdError.js)
without copying its implementation: a single exception type carrying the
spec-defined error code so tests can compare codes exactly the way the
reference test suite does (/root/reference/tests/test.js:1209-1227).
"""

from __future__ import annotations


class JsonLdError(Exception):
    def __init__(self, message: str, code: str = "invalid JSON-LD syntax",
                 details: dict | None = None):
        super().__init__(f"{code}: {message}")
        self.message = message
        self.code = code
        self.details = details or {}
