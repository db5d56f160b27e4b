"""In-process interpreter for the workflow-DSL subset the reference uses.

The reference orchestrates its two functions with a Cloud Workflows DAG
(reference workflows/etl_cars.yaml) scheduled by cron (workflows/
schedule.sh). This module interprets the same YAML dialect — exactly the
constructs the reference exercises (SURVEY.md §2.5 O1-O7):

  O1 sequential steps            main: steps: [...]
  O2 assign + ${} expressions    - init: assign: [{var: value}]
  O3 switch / condition / next   switch: [{condition: ..., next: end}]
  O4 subworkflow call w/ params  call: name, args: {body: ...}, result: var
  O5 try/except + error discrim  try: ..., except: {as: e, steps: [...]}
  O6 function invocation         call: http.post → in-process engine call
  O7 return value plumbing       return: ${expr}

Design: the DAG runs on the *driver* — steps produce/consume DataFrame
results via the engine API; Spark never sees the DSL. The reference's HTTP
hop (O6) becomes an in-process call through a function registry, keeping
the reference's ``{"description": ...}``/status-code error protocol since
the DAG branches on those strings (etl_cars.yaml:38,51-54).

Expression language: ``${...}`` supports variable refs, constants,
arithmetic/string concat, comparisons, boolean ops, subscripts, and
attribute access (``e.body.description``) — evaluated by a small
AST-whitelist interpreter over the workflow scope. Nothing outside that
whitelist can execute: no calls, no comprehensions, no dunder attribute
access — so even a hostile workflow document cannot escape into arbitrary
Python (a blanked-``__builtins__`` eval can, via
``().__class__.__mro__...`` attribute chains).
"""

from __future__ import annotations

import ast
import logging
import re
from types import SimpleNamespace
from typing import Any, Callable

import yaml

from etl_workflows_spark.exceptions import EngineError

logger = logging.getLogger(__name__)

_EXPR_RE = re.compile(r"^\$\{(.*)\}$", re.DOTALL)

# -- ${} expression interpreter (AST whitelist, no eval) ---------------------

# ``**`` is deliberately absent (a hostile doc's 9**9**9 would wedge the
# interpreter); sequence repetition is size-capped for the same reason.
_MAX_REPEAT_LEN = 1_000_000
_MAX_EXPR_LEN = 4_096


def _safe_mult(a, b):
    for seq, n in ((a, b), (b, a)):
        if isinstance(seq, (str, bytes, list, tuple)) and isinstance(n, int):
            if len(seq) * max(n, 0) > _MAX_REPEAT_LEN:
                raise ExpressionError(
                    f"sequence repetition exceeds {_MAX_REPEAT_LEN} elements"
                )
    return a * b


_BIN_OPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: _safe_mult,
    ast.Div: lambda a, b: a / b,
    ast.FloorDiv: lambda a, b: a // b,
    ast.Mod: lambda a, b: a % b,
}
_CMP_OPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.In: lambda a, b: a in b,
    ast.NotIn: lambda a, b: a not in b,
}


def _eval_expression(text: str, scope: dict[str, Any]) -> Any:
    """Evaluate a ``${}`` expression with a whitelist AST walker.

    Supports exactly what the DSL subset needs (SURVEY.md §2.5 O2/O3/O5):
    names, constants, ``+``/arithmetic, comparisons, and/or/not,
    subscripts, and non-dunder attribute access. Calls, comprehensions,
    lambdas, starred/dunder anything are structurally rejected — untrusted
    workflow documents cannot reach arbitrary Python.
    """
    if len(text) > _MAX_EXPR_LEN:
        raise ExpressionError(
            f"expression exceeds {_MAX_EXPR_LEN} characters"
        )
    try:
        tree = ast.parse(text.strip(), mode="eval")
    except (SyntaxError, ValueError, RecursionError, MemoryError) as exc:
        raise ExpressionError(f"invalid expression: {text!r}") from exc
    try:
        return _eval_node(tree.body, scope)
    except RecursionError as exc:
        raise ExpressionError("expression nesting too deep") from exc


def _eval_node(node: ast.AST, scope: dict[str, Any]) -> Any:
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id in scope:
            return scope[node.id]
        if node.id in ("true", "false", "null"):  # DSL literals
            return {"true": True, "false": False, "null": None}[node.id]
        raise ExpressionError(f"undefined variable: {node.id}")
    if isinstance(node, ast.Attribute):
        if node.attr.startswith("_"):
            raise ExpressionError(f"attribute access not allowed: {node.attr}")
        return getattr(_eval_node(node.value, scope), node.attr)
    if isinstance(node, ast.Subscript):
        return _eval_node(node.value, scope)[_eval_node(node.slice, scope)]
    if isinstance(node, ast.BinOp) and type(node.op) in _BIN_OPS:
        return _BIN_OPS[type(node.op)](
            _eval_node(node.left, scope), _eval_node(node.right, scope)
        )
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return not _eval_node(node.operand, scope)
        if isinstance(node.op, ast.USub):
            return -_eval_node(node.operand, scope)
    if isinstance(node, ast.Compare):
        left = _eval_node(node.left, scope)
        for op, comparator in zip(node.ops, node.comparators):
            if type(op) not in _CMP_OPS:
                raise ExpressionError(f"unsupported comparison: {type(op).__name__}")
            right = _eval_node(comparator, scope)
            if not _CMP_OPS[type(op)](left, right):
                return False
            left = right
        return True
    if isinstance(node, ast.BoolOp):
        if isinstance(node.op, ast.And):
            result = True
            for v in node.values:
                result = _eval_node(v, scope)
                if not result:
                    return result
            return result
        result = False
        for v in node.values:
            result = _eval_node(v, scope)
            if result:
                return result
        return result
    if isinstance(node, ast.List):
        return [_eval_node(v, scope) for v in node.elts]
    if isinstance(node, ast.Tuple):
        return tuple(_eval_node(v, scope) for v in node.elts)
    if isinstance(node, ast.Dict):
        return {
            _eval_node(k, scope): _eval_node(v, scope)
            for k, v in zip(node.keys, node.values)
        }
    raise ExpressionError(f"unsupported expression construct: {type(node).__name__}")


class WorkflowError(Exception):
    """Raised when a workflow raises or an unhandled call error escapes."""

    def __init__(self, value: Any):
        self.value = value
        super().__init__(str(value))


class ExpressionError(Exception):
    """A ${} expression is malformed or references an undefined name.

    Deliberately NOT a WorkflowError: a broken expression is a bug in the
    workflow document, not a runtime call failure — it must propagate out
    of try/except steps loudly instead of being routed into except
    handlers as if it were a data error (the handlers' own expressions
    would then mis-evaluate against a string-shaped scope value)."""


class _End(Exception):
    """Internal: `next: end` unwind."""

    def __init__(self, value: Any = None):
        self.value = value


class _Return(Exception):
    """Internal: `return:` unwind."""

    def __init__(self, value: Any):
        self.value = value


class _CallFailure(Exception):
    """Internal: a registry call failed; carries the protocol-shaped error
    object (``.body.description`` / ``.code``) the DSL discriminates on."""

    def __init__(self, err_obj: SimpleNamespace):
        self.err = err_obj


class WorkflowRunner:
    """Interprets a workflow document against a function registry.

    ``registry`` maps callable names (e.g. ``"load_csv"``) to Python
    functions taking the call body (dict) and returning a description
    string. ``http.post`` calls resolve their target function from the
    last path segment of ``url`` — the in-process stand-in for the
    reference's HTTP hop.
    """

    def __init__(self, doc: str | dict, registry: dict[str, Callable[[dict], str]]):
        self.doc = yaml.safe_load(doc) if isinstance(doc, str) else doc
        self.registry = registry

    # -- expressions --------------------------------------------------------

    def _eval(self, value: Any, scope: dict[str, Any]) -> Any:
        if isinstance(value, str):
            m = _EXPR_RE.match(value.strip())
            if m:
                return _eval_expression(m.group(1), scope)
            return value
        if isinstance(value, dict):
            return {k: self._eval(v, scope) for k, v in value.items()}
        if isinstance(value, list):
            return [self._eval(v, scope) for v in value]
        return value

    # -- execution ----------------------------------------------------------

    def run(self, entrypoint: str = "main", params: dict[str, Any] | None = None) -> Any:
        wf = self.doc[entrypoint]
        scope: dict[str, Any] = dict(params or {})
        declared = wf.get("params", [])
        for p in declared:
            scope.setdefault(p, None)
        try:
            self._run_steps(wf["steps"], scope)
        except (_Return, _End) as r:
            return r.value
        except _CallFailure as f:  # unhandled call error escapes as WorkflowError
            raise WorkflowError(f.err) from None
        return None

    def _run_steps(self, steps: list[dict], scope: dict[str, Any]) -> None:
        names = [next(iter(s)) for s in steps]
        i = 0
        while i < len(steps):
            body = steps[i][names[i]]
            jump = self._run_step(body, scope)
            if jump is None:
                i += 1
            elif jump == "end":
                raise _End()
            else:
                i = names.index(jump)

    def _run_step(self, body: dict, scope: dict[str, Any]) -> str | None:
        """Execute one step; returns a jump target name, 'end', or None."""
        if "try" in body:
            return self._run_try(body, scope)
        if "assign" in body:
            for assignment in body["assign"]:
                for var, value in assignment.items():
                    scope[var] = self._eval(value, scope)
        if "call" in body:
            self._run_call(body, scope)
        if "switch" in body:
            for branch in body["switch"]:
                if self._eval(branch["condition"], scope):
                    if "return" in branch:
                        raise _Return(self._eval(branch["return"], scope))
                    return branch.get("next")
        if "raise" in body:
            # (scope never holds a _CallFailure — _run_try unwraps to
            # .err before binding — so no special case is needed here)
            raise WorkflowError(self._eval(body["raise"], scope))
        if "return" in body:
            raise _Return(self._eval(body["return"], scope))
        if "steps" in body:
            self._run_steps(body["steps"], scope)
        return body.get("next")

    def _run_try(self, body: dict, scope: dict[str, Any]) -> str | None:
        try:
            jump = self._run_step(body["try"], scope)
        except (_Return, _End):
            raise
        except (_CallFailure, WorkflowError) as exc:
            handler = body["except"]
            err = exc.err if isinstance(exc, _CallFailure) else exc.value
            if not hasattr(err, "body"):
                # a raised plain value (or a document bug like an unknown
                # call target) still binds in the PROTOCOL shape, so the
                # handler's ${e.body.description} / ${e.code} expressions
                # work instead of dying on a bare AttributeError
                err = SimpleNamespace(
                    body=SimpleNamespace(description=str(err)), code=500
                )
            scope[handler.get("as", "e")] = err
            self._run_steps(handler["steps"], scope)
            return None
        return jump

    def _run_call(self, body: dict, scope: dict[str, Any]) -> None:
        target = body["call"]
        args = self._eval(body.get("args", {}), scope)
        if target in self.doc:  # subworkflow
            sub = WorkflowRunner(self.doc, self.registry)
            result = sub.run(entrypoint=target, params=args)
        elif target == "http.post":
            result = self._http_post(args)
        elif target in self.registry:
            result = self._invoke(target, args.get("body", args))
        else:
            raise WorkflowError(f"unknown call target: {target}")
        if "result" in body:
            scope[body["result"]] = result

    def _http_post(self, args: dict) -> SimpleNamespace:
        """In-process stand-in for the reference's HTTP+OIDC function call:
        resolve the function from the URL's last path segment, return a
        response-shaped object (``.body.description``)."""
        fn_name = str(args.get("url", "")).rstrip("/").rsplit("/", 1)[-1]
        if fn_name not in self.registry:
            raise WorkflowError(f"no registered function for url {args.get('url')}")
        return self._invoke(fn_name, args.get("body", {}))

    def _invoke(self, fn_name: str, call_body: dict) -> SimpleNamespace:
        """Call a registry function with the reference's error protocol:
        success → {\"description\": \"Success\"}/200; EngineError → its
        description/code (reference load_csv/main.py:204-212)."""
        try:
            description = self.registry[fn_name](call_body) or "Success"
        except EngineError as e:
            raise _CallFailure(
                SimpleNamespace(
                    body=SimpleNamespace(description=e.description), code=e.code
                )
            )
        except Exception as e:  # unknown error → 500 (main.py:208-210)
            logger.exception("unhandled error in workflow call %s", fn_name)
            raise _CallFailure(
                SimpleNamespace(
                    body=SimpleNamespace(description="Unknown error"), code=500
                )
            ) from e
        return SimpleNamespace(
            body=SimpleNamespace(description=description), code=200
        )


def build_engine_registry(
    spark,
    assets_dir: str,
    schema_dir: str | None = None,
    query_dir: str | None = None,
) -> dict[str, Callable[[dict], str]]:
    """Registry wiring the DSL's two call targets to the engine pipelines,
    with the reference's camelCase body keys (SURVEY.md §2.5 gotcha)."""
    import os

    from etl_workflows_spark.plans.load_csv import load_csv
    from etl_workflows_spark.plans.load_query import load_query

    schema_dir = schema_dir or assets_dir
    query_dir = query_dir or assets_dir

    def _load_csv(body: dict) -> str:
        load_csv(
            spark,
            bucket=body["bucket"],
            prefix=body["prefix"],
            schema=os.path.join(schema_dir, body["schema"]),
            destination_table=body["destinationTable"],
            archive_files_after=body.get("archiveFiles", True),
            skip_headers=body.get("skipHeaders", True),
        )
        return "Success"

    def _load_query(body: dict) -> str:
        load_query(
            spark,
            query=os.path.join(query_dir, body["query"]),
            destination_table=body["destinationTable"],
            use_legacy_sql=body.get("useLegacySql", False),
            append=body.get("append", False),
        )
        return "Success"

    return {"load_csv": _load_csv, "load_query": _load_query}
