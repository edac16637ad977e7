"""Cross-engine (Spark ↔ DuckDB) deterministic primitives.

Every hash / tokenize / round formula exists twice — as a Spark Column
builder and as a DuckDB SQL snippet — and the two are verified equal by
``tests/test_entry_oracle.py`` (the local mirror of the driver's
CORRECTNESS gate). Design rules that keep the pair bit-identical:

* **Hashing**: md5 hex (identical across engines) → first 15 hex chars →
  60-bit non-negative BIGINT. Spark: ``conv(substring(md5(x),1,15),16,10)``;
  DuckDB: ``CAST('0x' || substr(md5(x),1,15) AS UBIGINT)::BIGINT``.
* **Tokenize**: ``lower`` → split on ``[^a-z0-9]+`` → drop empties. Same
  regex class in Java regex and RE2.
* **Float output**: never emit a raw double that crossed different
  summation orders. Sequential folds only (Spark ``aggregate`` ==
  foldLeft, DuckDB ``list_reduce``), and round via the shared
  ``floor(x * 10^d + 0.5)`` integer trick so both engines emit identical
  BIGINT scaled values (avoids HALF_UP vs banker's discrepancies).
* **Arrays**: 1-based ``element_at`` on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# --- 60-bit md5 hash ---------------------------------------------------------


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (fits signed int64)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    return f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) AS BIGINT)"


# --- tokenizer ---------------------------------------------------------------


def tokens(col: Column) -> Column:
    """lower → split on non-alnum → drop empty strings."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def sql_tokens(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


# --- shingles (word n-grams over the token array) ----------------------------


def shingles(tok: Column, n: int = 3) -> Column:
    """Word ``n``-gram strings; empty array when fewer than ``n`` tokens.

    1-based ``element_at`` so the formula mirrors DuckDB list indexing.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - (n - 1), F.lit(0)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + j) for j in range(n)]
    )
    return F.when(F.size(tok) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def sql_shingles(tok_col: str, n: int = 3) -> str:
    """``tok_col`` must be a column name bound in the enclosing CTE."""
    parts = " || ' ' || ".join(f"{tok_col}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({tok_col}) >= {n} THEN "
        f"list_transform(range(1, len({tok_col}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


# --- fixed-point rounding (identical integer output on both engines) ---------


def fxp(col: Column, digits: int = 4) -> Column:
    """``floor(x*10^d + 0.5)`` as BIGINT — engine-neutral rounding."""
    return F.floor(col * F.lit(10**digits) + F.lit(0.5)).cast("long")


def sql_fxp(expr: str, digits: int = 4) -> str:
    return f"CAST(floor(({expr}) * {10 ** digits} + 0.5) AS BIGINT)"
