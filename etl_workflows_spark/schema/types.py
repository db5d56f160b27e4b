"""Recursive DataType predicates shared by operators that order or hash
arbitrary user tables.

Spark rejects MapType under ``ORDER BY`` / sort-merge keys AND under
``xxhash64`` — and the rejection applies at ANY nesting depth: an
``array<map<string,int>>`` or a struct with a map field is just as
unorderable as a top-level map. Call sites that only checked
``dtype.startswith("map<")`` missed the nested cases (ADVICE r5).
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def contains_map_type(dt: DataType) -> bool:
    """True if a MapType occurs anywhere in ``dt`` (any nesting depth)."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return contains_map_type(dt.elementType)
    if isinstance(dt, StructType):
        return any(contains_map_type(f.dataType) for f in dt.fields)
    return False


def is_orderable(dt: DataType) -> bool:
    """True if Spark accepts a column of this type in ORDER BY / window
    orderBy. Maps are the only unorderable atom; arrays/structs inherit
    orderability from their element/field types."""
    return not contains_map_type(dt)


def is_hashable(dt: DataType) -> bool:
    """True if Spark accepts a column of this type under ``xxhash64`` /
    ``hash``. Same map-free rule as orderability."""
    return not contains_map_type(dt)
