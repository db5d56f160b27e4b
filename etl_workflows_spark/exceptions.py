"""Engine exception taxonomy.

Replicates the reference's HTTP-exception taxonomy and its
``(description, code)`` protocol — the workflow DAG branches on these
descriptions (reference workflows/etl_cars.yaml:38,51-54), so the strings
are part of the public contract.

Reference: functions/load_csv/exceptions.py:4-26 and
functions/load_query/exceptions.py:4-16.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class; carries an HTTP-ish status code and a stable description."""

    code: int = 500
    description: str = "Unknown error"

    def __init__(self, description: str | None = None):
        if description is not None:
            self.description = description
        super().__init__(self.description)


class CsvNotFound(EngineError):
    code = 404
    description = "CSV file not found"


class CsvInvalid(EngineError):
    code = 400
    description = "CSV file invalid"


class SchemaNotFound(EngineError):
    code = 404
    description = "Schema file not found"


class SchemaInvalid(EngineError):
    code = 400
    description = "Schema file invalid"


class QueryNotFound(EngineError):
    code = 404
    description = "Query file not found"


class QueryInvalid(EngineError):
    code = 400
    description = "Query file invalid"


class LoadJobError(EngineError):
    code = 500
    description = "Error during load job"


class CreationFailed(EngineError):
    code = 500
    description = "Error during table creation"
