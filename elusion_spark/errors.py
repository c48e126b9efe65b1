"""Typed error taxonomy with actionable suggestions.

Parity target: the reference's ``ElusionError`` enum with emoji-prefixed
suggestion strings (/root/reference/src/custom_error/cust_error.rs:16-116).
We keep the observable shape (message + "💡 Suggestion:" hint) but raise
normal Python exceptions so they compose with PySpark's own errors.
"""

from __future__ import annotations


class ElusionError(Exception):
    """Base error. ``suggestion`` mirrors cust_error.rs's hint strings."""

    def __init__(self, message: str, suggestion: str | None = None):
        self.message = message
        self.suggestion = suggestion
        full = message if not suggestion else f"{message}\n💡 Suggestion: {suggestion}"
        super().__init__(full)


class InvalidOperation(ElusionError):
    """Bad builder usage (unknown join type, bad sort direction, ...)."""


class GroupByAllError(ElusionError):
    """group_by_all() validation failure (elusion.rs:999-1046, 3951-4480)."""


class SchemaMismatchError(ElusionError):
    """Set-operation / folder-load schema incompatibility (elusion.rs:6765-7267)."""


class LoaderError(ElusionError):
    """File/source loading failure (elusion.rs:6716-6760 dispatcher)."""


class WriterError(ElusionError):
    """Sink failure (elusion.rs:5182-5374 and friends)."""


class FeatureNotAvailable(ElusionError):
    """Optional dependency (delta, excel, ...) not installed in this env."""


# -- full variant-name parity with cust_error.rs:16-116 (each maps onto
# the closest base above; kept as distinct classes so callers can catch
# the same taxonomy the reference exposes) --

class MissingColumn(InvalidOperation):
    """cust_error.rs:23 (+ :16 MissingColumnWithContext via `suggestion`)."""


class InvalidDataType(InvalidOperation):
    """cust_error.rs:27."""


class DuplicateColumn(InvalidOperation):
    """cust_error.rs:32."""


class SchemaError(SchemaMismatchError):
    """cust_error.rs:41."""


class JoinError(InvalidOperation):
    """cust_error.rs:46."""


class GroupByError(InvalidOperation):
    """cust_error.rs:52."""


class WriteError(WriterError):
    """cust_error.rs:58."""


class PartitionError(WriterError):
    """cust_error.rs:64."""


class AggregationError(InvalidOperation):
    """cust_error.rs:69."""


class OrderByError(InvalidOperation):
    """cust_error.rs:75."""


class WindowFunctionError(InvalidOperation):
    """cust_error.rs:80."""


class LimitError(InvalidOperation):
    """cust_error.rs:86."""


class SetOperationError(InvalidOperation):
    """cust_error.rs:91."""
