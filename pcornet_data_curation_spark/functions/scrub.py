"""Ordered regex PII / toxicity scrubbing.

Reference analog: the code-normalization + per-record heuristic regex
checks of potential_code_errors.sas:310-344, recast as text scrubbing.

Byte-identity contract (BASELINE.json input_hint): the Spark path uses
JVM-side ``regexp_replace`` (whole-stage codegen, no Python), the
pandas oracle uses Python ``re`` with the *same pattern strings*. To
make the two engines agree byte-for-byte the patterns are restricted to
the dialect-identical subset:

* explicit ASCII character classes only — never \\w/\\d/\\s/\\b whose
  unicode semantics differ between java.util.regex and Python `re`;
* fixed-width lookarounds (supported identically by both);
* literal replacement strings (no $1 / \\1 group references, whose
  syntax differs);
* no anchors, no DOTALL-sensitive dots.

Application order is fixed by ``order`` (deterministic output).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class ScrubPattern:
    rule_id: str
    pattern: str  # dialect-identical regex (see module docstring)
    replacement: str  # literal
    order: int


# Ordered scrub registry ("rules as data", like the reference's
# valuesets: dc_reference.cpt, data_curation_base.sas:3093-3105).
SCRUB_PATTERNS: tuple[ScrubPattern, ...] = (
    ScrubPattern(
        "pii_email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
        10,
    ),
    ScrubPattern(
        "pii_ssn",
        r"(?<![0-9])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9])",
        "<SSN>",
        20,
    ),
    ScrubPattern(
        "pii_phone",
        r"(?<![0-9])(\+1[ .-])?(\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}(?![0-9])",
        "<PHONE>",
        30,
    ),
    ScrubPattern(
        "pii_ipv4",
        r"(?<![0-9.])[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}(?![0-9])(?!\.[0-9])",
        "<IP>",
        40,
    ),
    ScrubPattern(
        "pii_credit_card",
        r"(?<![0-9])[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}(?![0-9])",
        "<CARD>",
        50,
    ),
    # Toxicity lexicon (synthetic placeholder list) — whole-word with
    # fixed-width lookarounds instead of \b. Case-insensitivity is
    # spelled out as explicit [Xx] classes: Java folds ASCII-only under
    # (?i) while Python folds unicode (ſ→s, K→K U+212A), so inline (?i)
    # would let the two engines scrub different bytes.
    ScrubPattern(
        "tox_lexicon",
        r"(?<![A-Za-z])("
        r"[Ff][Rr][Aa][Kk]|[Gg][Oo][Rr][Rr][Aa][Mm]|"
        r"[Ss][Mm][Ee][Gg]|[Bb][Ee][Ll][Gg][Ii][Uu][Mm]"
        r")(?![A-Za-z])",
        "<TOX>",
        60,
    ),
)


# Lookaround-FREE twin of the chain (the Java ∩ RE2 ∩ Python dialect):
# same rule families, same order, same replacements, but without the
# boundary lookarounds RE2 cannot express. This sub-chain is what the
# DuckDB value-hash oracle replays (scrub_chain_core registry entry);
# the production chain above keeps its lookarounds (scrub quality) and
# its byte-identity gate against the Python `re` oracle in pytest.
CORE_SCRUB_PATTERNS: tuple[ScrubPattern, ...] = (
    ScrubPattern(
        "core_email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
        10,
    ),
    ScrubPattern("core_ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>", 20),
    ScrubPattern(
        "core_phone",
        r"\([0-9]{3}\)[ .-]?[0-9]{3}[ .-][0-9]{4}|[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}",
        "<PHONE>",
        30,
    ),
    ScrubPattern(
        "core_ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>", 40
    ),
    ScrubPattern(
        "core_card", r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}", "<CARD>", 50
    ),
    ScrubPattern(
        "core_tox",
        r"[Ff][Rr][Aa][Kk]|[Gg][Oo][Rr][Rr][Aa][Mm]|"
        r"[Ss][Mm][Ee][Gg]|[Bb][Ee][Ll][Gg][Ii][Uu][Mm]",
        "<TOX>",
        60,
    ),
)


def ordered_patterns(patterns: tuple[ScrubPattern, ...] = SCRUB_PATTERNS) -> list[ScrubPattern]:
    return sorted(patterns, key=lambda p: p.order)


def scrub_column(col, patterns: tuple[ScrubPattern, ...] = SCRUB_PATTERNS):
    """Spark Column: apply the ordered scrub chain via JVM
    regexp_replace (stays inside whole-stage codegen)."""
    from pyspark.sql import functions as F

    out = col
    for p in ordered_patterns(patterns):
        out = F.regexp_replace(out, p.pattern, p.replacement)
    return out


def scrub_hit_count_cols(col, patterns: tuple[ScrubPattern, ...] = SCRUB_PATTERNS):
    """Ordered (rule_id, hits Column) pairs — how many matches each
    scrub rule makes, counted CHAIN-AWARE: rule i counts against the
    text as rules 1..i-1 have already transformed it (exactly the
    matches scrub_column replaces — an email scrubbed to <EMAIL> can
    no longer feed a phone/IP count). JVM regexp_count, codegen. The
    default is SCRUB_PATTERNS — the SAME chain scrub_column applies by
    default, so audit counts describe the scrubs that actually
    happened (Java regex runs the lookaround guards fine; they are
    only excluded from the DuckDB-oracle path). Pass
    CORE_SCRUB_PATTERNS for the lookaround-free twin an oracle can
    replay (len(regexp_extract_all))."""
    from pyspark.sql import functions as F

    out = []
    cur = col
    for p in ordered_patterns(patterns):
        out.append((p.rule_id, F.regexp_count(cur, F.lit(p.pattern))))
        cur = F.regexp_replace(cur, p.pattern, p.replacement)
    return out


def scrub_hit_count_core_sqls(col_sql: str) -> list[tuple[str, str]]:
    """DuckDB twin of scrub_hit_count_cols(col): ordered (rule_id,
    hits-expression) pairs generated from the same CORE_SCRUB_PATTERNS
    constants, counting each rule against the chain-transformed text."""
    out = []
    cur = col_sql
    for p in ordered_patterns(CORE_SCRUB_PATTERNS):
        # escape for the single-quoted SQL literal: the current
        # CORE_SCRUB_PATTERNS carry no quotes, but a future pattern
        # containing one would silently emit broken oracle SQL
        pat = p.pattern.replace("'", "''")
        rep = p.replacement.replace("'", "''")
        out.append((p.rule_id, f"len(regexp_extract_all({cur}, '{pat}'))"))
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    return out


def scrub_core_sql(col_sql: str) -> str:
    """ANSI/DuckDB twin of scrub_column(col, CORE_SCRUB_PATTERNS):
    the same nested ordered regexp_replace chain with the 'g' flag
    (DuckDB replaces only the first match by default; Spark replaces
    all). Patterns are lookaround-free so RE2 runs them, and both
    engines use leftmost-first alternation."""
    out = col_sql
    for p in ordered_patterns(CORE_SCRUB_PATTERNS):
        out = f"regexp_replace({out}, '{p.pattern}', '{p.replacement}', 'g')"
    return out


_COMPILED = [(p, re.compile(p.pattern)) for p in ordered_patterns()]


def scrub_text_py(text: str | None) -> str | None:
    """Python applier (pandas oracle) — same patterns, same order.

    Replacement strings are literal (no backslashes/group refs), so
    re.sub's replacement escaping cannot diverge from Java's.
    """
    if text is None:
        return None
    for p, rx in _COMPILED:
        text = rx.sub(p.replacement, text)
    return text


def scrub_series_py(texts):
    """Vectorized pandas applier used by the oracle."""
    out = texts.copy()
    mask = out.notna()
    s = out[mask].astype(str)
    for p, rx in _COMPILED:
        s = s.str.replace(rx, p.replacement, regex=True)
    out[mask] = s
    return out
