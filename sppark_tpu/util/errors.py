"""Error vocabulary.

Mirrors util/exception.hpp:13-47 (sppark_error with code + message) and
util/rusterror.h:18-36 (POD error returned by value across FFI).  The C ABI
shim in ffi/ converts SpparkError to the same {code, message} POD contract.
"""

from __future__ import annotations


class SpparkError(RuntimeError):
    """Error with a numeric code, matching the reference's RustError shape."""

    def __init__(self, code: int, message: str = ""):
        super().__init__(message or f"sppark-tpu error {code}")
        self.code = int(code)
        self.message = message

    def __repr__(self) -> str:  # pragma: no cover
        return f"SpparkError(code={self.code}, message={self.message!r})"


def sppark_ok(cond: bool, code: int, message: str) -> None:
    """CUDA_OK-style throw-on-error helper (util/exception.cuh:12-21)."""
    if not cond:
        raise SpparkError(code, message)
