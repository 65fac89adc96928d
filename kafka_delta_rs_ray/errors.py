"""Structured error taxonomy.

Mirrors the reference's ``AppError`` hierarchy (``src/handlers/mod.rs:7-100``:
ConfigError / KafkaError / PipelineError / ParseError / DeltaError /
MonitoringError) re-expressed for a table-maintenance engine.
"""


class EngineError(Exception):
    """Base for all engine errors (reference: AppError)."""


class ConfigError(EngineError):
    """Invalid or missing configuration (reference: ConfigError)."""


class SourceError(EngineError):
    """Failure reading an input source (reference: KafkaError)."""


class ValidationError(EngineError):
    """Row/batch failed schema or content validation (reference: ParseError)."""


class FormatError(EngineError):
    """Corrupt or unknown image codec payload (reference: ParseError::TypeMismatch)."""


class CommitConflict(EngineError):
    """Manifest CAS lost a race; caller may re-validate and retry
    (reference: offset-commit retry loop, src/kafka/mod.rs:192-228)."""


class StateError(EngineError):
    """Table/ledger state invariant violated (reference: PipelineError/DeltaError)."""
