"""CLI entry points — the reference's manual invocation surface (O10).

Mirrors the reference's ``__main__`` blocks exactly: ``load_csv`` takes the
4 positional args (bucket prefix schema destination — load_csv/main.py:
215-217), ``load_query`` takes 2 (query destination — load_query/main.py:
88-90); the boolean flags are unreachable from the CLI, same as the
reference.

    python -m etl_workflows_spark load_csv  <bucket_dir> <prefix> <schema_path> <dest_table>
    python -m etl_workflows_spark load_query <query_path> <dest_table>
"""

from __future__ import annotations

import json
import sys

from etl_workflows_spark.api import handle_request
from etl_workflows_spark.session import get_spark


def main(argv: list[str]) -> int:
    if len(argv) >= 1 and argv[0] == "load_csv" and len(argv) == 5:
        body = {
            "bucket": argv[1],
            "prefix": argv[2],
            "schema": argv[3],
            "destinationTable": argv[4],
        }
    elif len(argv) >= 1 and argv[0] == "load_query" and len(argv) == 3:
        body = {"query": argv[1], "destinationTable": argv[2]}
    else:
        print(__doc__, file=sys.stderr)
        return 2
    spark = get_spark()
    result, code = handle_request(spark, argv[0], body)
    print(json.dumps(result))
    return 0 if code == 200 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
