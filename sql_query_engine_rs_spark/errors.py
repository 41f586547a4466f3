"""Engine error types, mirroring the reference's error enums.

Reference: ``DatabaseError`` (src/db.rs), ``BindError``
(src/binder/mod.rs:34-42), ``StorageError`` (src/storage/mod.rs). In Spark,
parse/bind errors surface as ``AnalysisException``; we wrap the engine-shell
failures (catalog misuse, meta-command syntax) in these types.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for engine-shell errors."""


class CatalogError(EngineError):
    """Table not found / duplicate table (reference: src/catalog/mod.rs:22-27)."""


class MetaCommandError(EngineError):
    """Bad ``\\load`` / ``\\dt`` usage (reference: src/cli.rs:111-129)."""
