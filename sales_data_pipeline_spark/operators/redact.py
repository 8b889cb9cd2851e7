"""PII detection and redaction for corpus preprocessing.

Every serious pretraining pipeline strips personally identifiable
information before training (emails, phone numbers, IPs, national-ID
patterns). The reference has no counterpart (its data is retail CSV);
this is part of the LLM-data-pipeline extension surface, same family as
operators/quality.py.

Design constraints:

- **Codegen only.** Detection is ``regexp_count`` and redaction is
  chained ``regexp_replace`` — JVM regex inside whole-stage codegen, a
  pure map stage that rides the parquet scan. No Python in the path, no
  shuffle at any scale.
- **Engine-portable patterns.** The patterns below restrict themselves
  to the syntax subset where Java's regex and RE2 (DuckDB's engine)
  agree: character classes, ``\\d``, ``\\b``, bounded/greedy
  quantifiers. No lookaround, no backreferences (RE2 has neither).
- **Disjoint by construction.** No two patterns can match overlapping
  spans (a 3-3-4 phone never contains a 3-2-4 SSN, an IPv4 quad is not
  an email, ...), so per-type counts computed independently on the
  ORIGINAL text sum to the total redaction count regardless of the
  order the replacements are applied in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: email first (may contain digits/dots that other patterns
# would otherwise see), then dotted quads, then dashed number shapes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(text_col: str | Column) -> dict[str, Column]:
    """Per-type non-overlapping match counts on the original text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {
        t: F.regexp_count(c, F.lit(pat)).cast("bigint") for t, pat in PII_PATTERNS.items()
    }


def redacted_text(text_col: str | Column) -> Column:
    """Text with every PII match replaced by its ``<TYPE>`` placeholder,
    applied in PII_PATTERNS order (order is irrelevant to the result
    because the patterns are span-disjoint, but keeping it fixed makes
    the plan stable)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for t, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{t.upper()}>")
    return c


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_email, n_ip, n_phone, n_ssn, n_pii, clean_text) per row.

    Map-only: counts and the redacted text are all expressions over one
    scan of ``text_col``; Catalyst prunes every other column. At 100 TB
    this is bounded by scan bandwidth — there is nothing to tune."""
    counts = pii_counts(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return df.select(
        id_col,
        *[c.alias(f"n_{t}") for t, c in counts.items()],
        total.alias("n_pii"),
        redacted_text(text_col).alias("clean_text"),
    )


def mask_columns(df: DataFrame, policy: dict) -> DataFrame:
    """Policy-driven column-level masking for governed exports — the
    STRUCTURAL complement to content-level redaction (redact_pii scans
    free text for PII patterns; this enforces a per-column disclosure
    policy on typed columns). Verbs:

    - ``"keep"``            column passes through unchanged
    - ``"drop"``            column absent from the export
    - ``"null"``            column present, every value NULL (schema-
                            stable exports where consumers need the slot)
    - ``"hash"``            md5 of the string form — a stable
                            pseudonymous join key (same value ⇒ same
                            token across exports; engine-portable md5,
                            the q44/q55 determinism contract)
    - ``("bucket", w)``     numeric generalization: floor(value / w) —
                            the k-anonymity coarsening move (q110's
                            audit consumes exactly such quasi-identifiers)
    - ``("last", n)``       keep only the trailing n characters
                            (card/phone-style partial disclosure)

    Every column of ``df`` must appear in the policy — an unlisted
    column is a disclosure decision nobody made, so it raises rather
    than defaulting either way. Map-only (no shuffle); all verbs are
    codegen expressions, so the masked export costs exactly the scan."""
    unknown = set(policy) - set(df.columns)
    if unknown:
        raise ValueError(f"policy names absent columns: {sorted(unknown)}")
    missing = set(df.columns) - set(policy)
    if missing:
        raise ValueError(
            f"no policy for columns {sorted(missing)}: every column needs "
            "an explicit disclosure decision"
        )
    # verb shapes validate EAGERLY — the whole point is raising at
    # policy time, not as a DIVIDE_BY_ZERO/IndexError mid-export
    for name, verb in policy.items():
        if verb in ("keep", "drop", "null", "hash"):
            continue
        if (
            isinstance(verb, tuple)
            and len(verb) == 2
            and verb[0] in ("bucket", "last")
            and isinstance(verb[1], int)
            and verb[1] > 0
        ):
            continue
        raise ValueError(f"unknown masking verb {verb!r} for {name!r}")
    cols = []
    for name in df.columns:
        verb = policy[name]
        c = F.col(name)
        if verb == "drop":
            continue
        if verb == "keep":
            cols.append(c)
        elif verb == "null":
            cols.append(F.lit(None).cast(df.schema[name].dataType).alias(name))
        elif verb == "hash":
            cols.append(F.md5(c.cast("string")).alias(name))
        elif isinstance(verb, tuple) and verb[0] == "bucket":
            cols.append(
                F.floor(c / F.lit(verb[1])).cast("bigint").alias(name)
            )
        elif isinstance(verb, tuple) and verb[0] == "last":
            cols.append(
                F.substring(c.cast("string"), -int(verb[1]), int(verb[1])).alias(name)
            )
        else:  # pragma: no cover — eager validation above rejects these
            raise AssertionError(f"unvalidated verb {verb!r}")
    return df.select(*cols)
