"""Typed exception hierarchy — engine twin of the reference's
``stacbuilder/exceptions.py:8-41`` so callers can distinguish engine
failures from foreign ones and handle each class accordingly.

All inherit from ``EngineException`` except ``DataValidationError``, which
(exactly like the reference's ``DataValidationError(Exception)``) sits
outside the hierarchy: a data-quality failure is not an engine failure.
Each class also subclasses the stdlib type the engine raised in rounds 1-2
(``ValueError`` / ``RuntimeError``) so pre-existing ``except ValueError``
call sites keep working.
"""

from __future__ import annotations


class EngineException(Exception):
    """Root of the engine's exception hierarchy
    (exceptions.py:8 ``STACBuilderException``)."""


class SettingsInvalid(EngineException, ValueError):
    """Incorrect or disallowed settings values (exceptions.py:14)."""


class InvalidOperation(EngineException, RuntimeError):
    """State/settings not set for the requested operation
    (exceptions.py:20)."""


class InvalidConfiguration(EngineException, ValueError):
    """Configuration that parses but doesn't make sense together
    (exceptions.py:26) — e.g. alternate S3 hrefs without a bucket."""


class DataValidationError(Exception):
    """A validation on the data processing itself failed
    (exceptions.py:40) — deliberately NOT under EngineException."""
