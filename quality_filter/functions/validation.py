"""Row-level validation expressions — the pydantic-validator analog.

The reference validates request records with closed enums and
non-empty-list validators (/root/reference/app/pydantic_models.py:11-46,
64-70) and maps violations to 400s.  Relationally: CHECK-style column
expressions; hard mode raises (raise_error), soft mode routes rows to
quarantine — per-partition failures must not abort a 10^12-doc job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enum_check(col: Column, allowed: tuple[str, ...], soft: bool = True) -> Column:
    """soft: boolean validity column.  hard: passes the value through but
    raises at execution when a row violates the enum (job-abort semantics,
    only for pipelines where bad input is a deploy bug, not data)."""
    ok = col.isin(*allowed) | col.isNull()
    if soft:
        return ok
    return F.when(ok, col).otherwise(
        F.raise_error(F.concat(F.lit("enum violation: "), col.cast("string")))
    )


def non_empty_check(col: Column) -> Column:
    """Non-empty text/array validator (pydantic_models.py:64-70 analog)."""
    return F.when(col.isNull(), F.lit(False)).otherwise(F.length(col.cast("string")) > 0)


def base64_decode(col: Column) -> Column:
    """Base64 payload source (file_service.py:77-96 analog): native
    unbase64; invalid input yields NULL → quarantine, never an exception."""
    return F.try_to_binary(col, F.lit("base64"))


def check_conservation(
    inputs: DataFrame, outputs: list[DataFrame], key: str = "url"
) -> dict:
    """Row-conservation invariant: input keys == union of output keys
    (in = kept + dropped + quarantined).  Uses exceptAll both directions
    so duplicates are caught too.  Returns counts; empty diffs = pass."""
    in_keys = inputs.select(key)
    out_keys = None
    for df in outputs:
        part = df.select(key)
        out_keys = part if out_keys is None else out_keys.unionAll(part)
    missing = in_keys.exceptAll(out_keys).count()
    extra = out_keys.exceptAll(in_keys).count()
    return {"missing": missing, "extra": extra, "ok": missing == 0 and extra == 0}
