"""Request-shaped API layer — the reference's HTTP trigger protocol, O9.

``handle_request`` is the pure core of the reference's ``http_trigger``
functions (load_csv/main.py:193-212, load_query/main.py:68-85): camelCase
JSON body in, ``({"description": ...}, status_code)`` out, with the
exception taxonomy mapped to codes (404 not-found, 400 invalid, 500
load/creation/unknown). Any HTTP framework (or the workflow orchestrator,
or the CLI) can wrap this without re-implementing the contract.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import SparkSession

from etl_workflows_spark.exceptions import EngineError
from etl_workflows_spark.plans.load_csv import (
    execute_job_from_config as _load_csv_from_config,
)
from etl_workflows_spark.plans.load_query import (
    execute_job_from_config as _load_query_from_config,
)

logger = logging.getLogger(__name__)

_HANDLERS = {
    "load_csv": _load_csv_from_config,
    "load_query": _load_query_from_config,
}


def handle_request(
    spark: SparkSession, function: str, body: dict[str, Any] | None
) -> tuple[dict[str, str], int]:
    """Dispatch a function invocation; never raises — errors map to the
    reference's (description, code) protocol."""
    if function not in _HANDLERS:
        return {"description": f"Unknown function {function}"}, 404
    try:
        _HANDLERS[function](spark, body or {})
    except EngineError as e:
        return {"description": e.description}, e.code
    except Exception:
        logger.exception("unhandled error in %s", function)
        return {"description": "Unknown error"}, 500
    return {"description": "Success"}, 200
