"""Declarative CHECK constraints — the lakehouse write-time contract
(Delta CHECK constraints / Iceberg validation): a table declares row
predicates once; every write path (append, merge upserts) enforces
them and routes violating rows to the quarantine dead-letter table
with a per-constraint error string, extending the reference's
parse-error dead-letter contract (src/kafka/mod.rs:288-300) from
"bytes don't decode" to "values break the table's invariants".

Semantics follow SQL CHECK: a NULL comparison result PASSES (only
``not_null`` rejects nulls), violations never poison the commit, and
enforcement is fully vectorized (one pyarrow.compute kernel per
constraint per batch — no per-row Python).

Constraint shape (validated early, C1 posture):
``{"name": str, "col": str, "op": one of > >= < <= == != in not_null,
   "value": scalar | list (op-dependent)}``
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..errors import ConfigError

_COMPARE_OPS = {">", ">=", "<", "<=", "==", "!="}
_OPS = _COMPARE_OPS | {"in", "not_null"}


def _check_value_type(name: str, col: str, values: list, schema) -> None:
    """Declaration-time value/column type compatibility: a constraint
    like ``{"op": ">", "value": "abc"}`` on an int64 column would
    otherwise be accepted here and then blow up as ArrowInvalid inside
    EVERY write task, poisoning the commit the 'violations never
    poison the commit' contract promises to protect. When the schema
    is in hand, reject at declaration like the other C1 checks."""
    if schema is None or col not in schema.names:
        return
    typ = schema.field(col).type
    for v in values:
        try:
            pa.scalar(v, type=typ)
        except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError,
                TypeError, OverflowError) as e:
            raise ConfigError(
                f"constraint {name!r}: value {v!r} is not compatible "
                f"with column {col!r} of type {typ} ({e})") from None


def normalize_constraints(constraints, schema=None) -> list[dict]:
    """Validate-early (reference config posture, src/config/mod.rs:
    96-177): reject malformed constraints at declaration time with a
    specific message, not at first write. When ``schema`` is given
    (create/add_constraint have it in hand), a constraint naming a
    column absent from the table schema is rejected too — a typo'd
    CHECK must fail at declaration, not silently never fire."""
    if not constraints:
        return []
    known = set(schema.names) if schema is not None else None
    out = []
    seen = set()
    for c in constraints:
        if not isinstance(c, dict):
            raise ConfigError(f"constraint must be a dict, got {type(c)}")
        name = c.get("name")
        col = c.get("col")
        op = c.get("op")
        if not name or not isinstance(name, str):
            raise ConfigError(f"constraint needs a string name: {c}")
        if name in seen:
            raise ConfigError(f"duplicate constraint name {name!r}")
        seen.add(name)
        if not col or not isinstance(col, str):
            raise ConfigError(f"constraint {name!r} needs a column name")
        if known is not None and col not in known:
            raise ConfigError(
                f"constraint {name!r}: column {col!r} is not in the "
                f"table schema ({sorted(known)})")
        if op not in _OPS:
            raise ConfigError(
                f"constraint {name!r}: unknown op {op!r} "
                f"(one of {sorted(_OPS)})")
        if op == "not_null":
            if "value" in c and c["value"] is not None:
                raise ConfigError(
                    f"constraint {name!r}: not_null takes no value")
        elif op == "in":
            v = c.get("value")
            if not isinstance(v, (list, tuple)) or not v:
                raise ConfigError(
                    f"constraint {name!r}: 'in' needs a non-empty list")
            _check_value_type(name, col, list(v), schema)
        elif c.get("value") is None:
            raise ConfigError(f"constraint {name!r}: op {op!r} needs a value")
        else:
            _check_value_type(name, col, [c["value"]], schema)
        out.append({"name": name, "col": col, "op": op,
                    "value": c.get("value")})
    return out


def constraint_violations(batch: pa.Table, constraints: list[dict]):
    """Vectorized evaluation: returns ``(bad_mask, errors)`` where
    ``bad_mask`` is a bool ndarray of rows violating ANY constraint
    and ``errors[i]`` is the first violated constraint's message.
    A constraint whose column is absent from the batch is skipped
    (schema evolution: old changesets predate the column)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    bad = np.zeros(n, dtype=bool)
    errors: list = [None] * n
    for c in constraints:
        if c["col"] not in batch.column_names:
            continue
        col = batch[c["col"]]
        op, val = c["op"], c["value"]
        if op == "not_null":
            viol = pc.is_null(col)
        else:
            if op == ">":
                ok = pc.greater(col, val)
            elif op == ">=":
                ok = pc.greater_equal(col, val)
            elif op == "<":
                ok = pc.less(col, val)
            elif op == "<=":
                ok = pc.less_equal(col, val)
            elif op == "==":
                ok = pc.equal(col, val)
            elif op == "!=":
                ok = pc.not_equal(col, val)
            else:  # "in"
                ok = pc.is_in(col, value_set=pa.array(val))
            # SQL CHECK: NULL comparison result passes
            viol = pc.and_kleene(pc.is_valid(col), pc.invert(ok))
        vm = np.asarray(viol.combine_chunks().to_numpy(
            zero_copy_only=False), dtype=bool)
        fresh = vm & ~bad
        if fresh.any():
            msg = (f"constraint {c['name']}: {c['col']} {op}"
                   + ("" if op == "not_null" else f" {val!r}"))
            for i in np.flatnonzero(fresh):
                errors[i] = msg
            bad |= vm
    return bad, errors


class ConstraintFilter:
    """map_batches stage: quarantine rows violating the table's CHECK
    constraints, pass the rest through. Light-state (constraint list
    pickles into the closure); quarantine writes are batched per input
    batch with the shared dead-letter retry policy."""

    def __init__(self, table_root: str, constraints: list[dict],
                 run_id: str = "adhoc"):
        self.root = table_root
        self.constraints = normalize_constraints(constraints)
        self.run_id = run_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.constraints or batch.num_rows == 0:
            return batch
        bad, errors = constraint_violations(batch, self.constraints)
        if not bad.any():
            return batch
        from .validate import write_quarantine_table

        rows = batch.filter(pa.array(bad)).append_column(
            "error", pa.array([e for e, m in zip(errors, bad) if m],
                              pa.string()))
        write_quarantine_table(self.root, self.run_id, rows)
        return batch.filter(pa.array(~bad))
