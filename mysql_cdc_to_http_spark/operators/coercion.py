"""Type-coercion column library — the engine's analog of the reference's
``rowToMap`` matrix (``/root/reference/main.go:125-209``), re-expressed as
Catalyst column expressions (JVM-side, codegen'd; no per-row Python).

Reference semantics reproduced (with compat notes):

- text: try base64-decode, fall back to raw string (``main.go:136-144``).
  The reference decodes *any* valid-base64 string (lossy heuristic — a
  plain word like ``cafe`` silently turns into bytes). Correct mode
  additionally requires the decoded bytes to be valid UTF-8; compat mode
  reproduces the raw heuristic.
- DATE → RFC 3339 string, parse-failure → passthrough (``main.go:147-154``).
- tinyint(1): 1/"true" → true, everything else → false (``main.go:157-164``).
- BIT: first byte non-zero → true (``main.go:165-182``).
- FLOAT/DECIMAL → float64 — DECIMAL loses exactness (``main.go:183-188``);
  correct mode keeps DecimalType instead.
- NUMBER/MEDIUM_INT → int64 (``main.go:189-194``).
- NULL preserved; unknown types pass through (``main.go:129-131, 195-197``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Strict base64 validity (Go std encoding: padded, length % 4 == 0).
_B64_RE = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{4}|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)$"

_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"

RFC3339 = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def decode_base64_text(col: Column, compat: bool = False) -> Column:
    """Base64-decode with raw-string fallback (R7a, main.go:136-144).

    correct mode: only replace the value when the decoded bytes are valid
    UTF-8 (no U+FFFD introduced); compat mode mimics Go and substitutes
    the decoded bytes whenever the input merely *looks* like base64.
    """
    # try_to_binary (not unbase64): unbase64 THROWS on non-canonical
    # padding bits, and codegen's common-subexpression elimination can
    # evaluate it even under a when() guard. try_to_binary yields null.
    # Likewise decode(bin,'UTF-8') throws on malformed bytes, so the
    # bytes→string step is a lenient cast; UTF-8 validity is detected by
    # re-encoding and comparing bytes (replacement chars break equality).
    valid_shape = col.rlike(_B64_RE)
    # try_to_binary is itself guarded by the shape regex: its internal
    # failure handling (JVM exception per bad row) is ~10µs/row, so rows
    # that fail the cheap regex must never reach it.
    raw = F.when(valid_shape, F.try_to_binary(col, F.lit("base64")))
    decoded = raw.cast("string")
    if compat:
        return F.when(decoded.isNotNull(), decoded).otherwise(col)
    utf8_ok = F.encode(decoded, "UTF-8").eqNullSafe(raw) & decoded.isNotNull()
    return F.when(utf8_ok, decoded).otherwise(col)


def date_to_rfc3339(col: Column) -> Column:
    """``2006-01-02`` → RFC 3339 (R7b, main.go:147-154); bad input passes
    through unchanged (the reference keeps the raw string on parse error)."""
    # try_to_date: fail-soft even if the session runs ANSI mode
    parsed = F.try_to_date(col, "yyyy-MM-dd")
    valid = col.rlike(_DATE_RE) & parsed.isNotNull()
    return F.when(valid, F.date_format(parsed, RFC3339)).otherwise(col)


def tinyint_bool(col: Column) -> Column:
    """tinyint(1): 1/"true" → true, anything else (incl. 2) → false
    (R7c, main.go:157-164)."""
    return col.cast("string").isin("1", "true")


def bit_bool(col: Column, binary: bool = False) -> Column:
    """BIT: non-zero → true (R7c, main.go:165-182). Integer inputs compare
    directly; binary inputs (``binary=True``) are true iff the first byte
    is non-zero (the reference checks ``b[0] != 0`` on the raw bit bytes)."""
    if binary:
        return F.coalesce(col.substr(1, 1) != F.lit(b"\x00"), F.lit(False))
    return F.coalesce(col.cast("long") != 0, F.lit(False))


def narrow_int(col: Column) -> Column:
    """json.Number → int64 (R7d, main.go:189-194)."""
    return col.cast("long")


def narrow_float(col: Column) -> Column:
    """json.Number → float64 (R7d, main.go:183-188)."""
    return col.cast("double")


def decimal_value(col: Column, precision: int = 18, scale: int = 4,
                  compat: bool = False) -> Column:
    """DECIMAL handling: correct mode keeps exact DecimalType; compat mode
    reproduces the reference's lossy DECIMAL→float64 (main.go:183-188)."""
    if compat:
        return col.cast("double")
    return col.cast(f"decimal({precision},{scale})")


#: Kind → coercion fn for ``coerce`` (the engine-level R7 transform).
KINDS = {
    "text": decode_base64_text,
    "date": date_to_rfc3339,
    "datetime": lambda c: c,  # pass through (main.go:155-156)
    "tinyint_bool": tinyint_bool,
    "bit": bit_bool,
    "int": narrow_int,
    "float": narrow_float,
    "decimal": decimal_value,
}


def coerce(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Apply the coercion matrix to named columns; unknown columns pass
    through untouched (main.go:195-197). ``spec`` maps column → kind."""
    cols = []
    for name in df.columns:
        kind = spec.get(name)
        if kind is None:
            cols.append(F.col(name))
        else:
            cols.append(KINDS[kind](F.col(name)).alias(name))
    return df.select(*cols)
