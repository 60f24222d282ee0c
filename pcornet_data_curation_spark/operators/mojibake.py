"""Mojibake repair — fix the classic UTF-8-bytes-read-as-cp1252
double-encoding artifacts ("CafÃ©", "â€œquotedâ€", "donâ€™t")
that survive real web crawls, reduced to the deterministic fixed-table
core of ftfy's sloppy-cp1252 pass (ftfy is the public reference tool;
this is NOT a port — just the same byte arithmetic).

For each repaired character c, the broken form is EXACTLY
``c.encode('utf-8').decode(sloppy_cp1252)`` where sloppy-cp1252
decodes the five cp1252-undefined bytes (81 8D 8F 90 9D) as their
Latin-1 control characters — the browser behavior that produces
mojibake in the first place (WHATWG encoding spec; ftfy's
"sloppy-windows-1252" codec). The table is COMPUTED from that
transform at import, never hand-transcribed, and the DuckDB oracle
generator reuses the same tuple, so the two engines cannot drift.

A fixed table repairs only one round of cp1252 mojibake for the
characters listed — the dominant real-world case (Western-language
punctuation + accented Latin). It deliberately does not attempt
ftfy's full heuristic search; unknown sequences pass through
untouched. One inherent ambiguity (property-test-discovered,
tests/test_properties.py): a clean string that LITERALLY contains a
broken form — e.g. the two characters 'Ã–' — is byte-identical to
mojibake of 'Ö' and is repaired; no table-driven fixer can
distinguish the two, and real corpora overwhelmingly contain such
sequences as damage, not content (ftfy makes the same default
choice).

Scale shape: a chain of LITERAL string replaces (StringReplace,
whole-stage codegen, no regex engine) — per-row JVM work, zero
exchanges, streaming-safe; pipelines into the scan at 10^12 docs.

Reference analog: the code/text normalization derivations feeding the
rule engine (potential_code_errors.sas:310-344) — deterministic
per-record cleanup ahead of every downstream signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sloppy_cp1252(bs: bytes) -> str:
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))  # 81 8D 8F 90 9D: latin-1 controls
    return "".join(out)


# characters whose one-round cp1252 mojibake this operator repairs:
# curly quotes/dashes/ellipsis/bullet, the currency+trademark signs,
# nbsp, and the common Western accented letters
REPAIRED_CHARS: str = (
    "‘’“”–—…•™€ "
    "áàâäãåçéèêëíìîïñóòôöõúùûüýÿ"
    "ÁÀÂÄÃÅÇÉÈÊËÍÌÎÏÑÓÒÔÖÕÚÙÛÜÝ"
)

# (broken, fixed) pairs, longest broken form first so 3-byte
# sequences (â€™) never get half-eaten by a 2-byte rule (Ã©)
MOJIBAKE_STEPS: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((_sloppy_cp1252(c.encode("utf-8")), c) for c in REPAIRED_CHARS),
        key=lambda p: (-len(p[0]), p[0]),
    )
)


# every broken form is the sloppy-cp1252 view of a UTF-8 encoding, so
# its FIRST character is the cp1252 image of a UTF-8 lead byte: 0xC2
# 'Â', 0xC3 'Ã' (2-byte sequences) or 0xE2 'â' (3-byte) for the table
# above. Asserted mechanically so a future table edit cannot silently
# break the fast-path guard below.
_LEAD_CHARS = ("Â", "Ã", "â")
assert all(bad[0] in _LEAD_CHARS for bad, _ in MOJIBAKE_STEPS)


def mojibake_fix_col(col: Column) -> Column:
    """Apply the repair table to one string column (NULL in, NULL
    out). Literal replaces only — no regex. The 64-step replace chain
    (64 full string copies per row in the worst case) runs only for
    rows containing a possible mojibake LEAD character (Â/Ã/â —
    guaranteed first char of every broken form, asserted above): clean
    rows take three contains() scans and pass through untouched —
    byte-identical output, since no replace can match without a lead
    char (measured ~3× on the mojibake_fix entry and -1.5 s on the
    full-stack curation pass at 100k docs, mojibake being rare)."""
    suspicious = (
        col.contains(_LEAD_CHARS[0])
        | col.contains(_LEAD_CHARS[1])
        | col.contains(_LEAD_CHARS[2])
    )
    out = col
    for bad, good in MOJIBAKE_STEPS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return F.when(suspicious, out).otherwise(col)


def mojibake_fix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text_fixed, changed): repaired text plus a did-anything
    flag (NULL text folds to '' — the repo's missing-text convention).
    """
    src = F.coalesce(F.col(text_col), F.lit(""))
    fixed = mojibake_fix_col(src)
    return df.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        (fixed != src).alias("changed"),
    )
