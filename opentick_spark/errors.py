"""Engine errors with reference-compatible messages.

The reference asserts exact error strings in its tests (query_test.go:42-97,
schema_test.go:113-155); we reproduce the messages so a dialect-level user
sees identical failures.
"""

from __future__ import annotations


class OpentickError(Exception):
    """Any dialect/validation/execution error raised by the engine."""
