"""Declarative quality-rule registry + evaluation.

Reference analog: the per-record validity-rule blocks of
potential_code_errors.sas:320-344 (and the valuesets reference data,
data_curation_base.sas:3093-3105) — each rule derives a boolean
violation flag from per-record features; a record is "bad" iff any
flag is 1 (`if max(flags)=1 then output`, potential_code_errors.sas:343).

Here the features are the per-document stats from
functions.textcore.doc_stats_frame and the rules are Gopher/C4-style
quality heuristics + langid/perplexity thresholds. Rules are DATA
(thresholds in a registry, engine is one function), so a config can
override thresholds without code changes.

Both evaluation paths consume the same registry:
  * violation_col(rule)  -> pyspark Column (pure Column algebra, no UDF)
  * violation_mask(rule, pdf) -> pandas boolean Series (oracle)
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import pandas as pd

SEV_DROP = "drop"
SEV_REPORT = "report_only"


@dataclass(frozen=True)
class Rule:
    rule_id: str
    family: str  # heuristic | langid | perplexity | content
    stat: str  # stat column the rule reads
    op: str  # violation comparator: lt|le|gt|ge|eq|ne|ne_str
    threshold: float | str
    severity: str = SEV_DROP
    order: int = 100


DEFAULT_RULES: tuple[Rule, ...] = (
    # --- Gopher heuristics ---
    Rule("min_doc_tokens", "heuristic", "n_tokens", "lt", 40, SEV_DROP, 10),
    Rule("max_doc_tokens", "heuristic", "n_tokens", "gt", 100000, SEV_DROP, 11),
    Rule("mean_word_len_lo", "heuristic", "mean_word_len", "lt", 3.0, SEV_DROP, 20),
    Rule("mean_word_len_hi", "heuristic", "mean_word_len", "gt", 10.0, SEV_DROP, 21),
    Rule("symbol_word_ratio", "heuristic", "symbol_word_ratio", "gt", 0.1, SEV_DROP, 30),
    Rule("bullet_line_frac", "heuristic", "bullet_line_frac", "gt", 0.9, SEV_DROP, 31),
    Rule("ellipsis_line_frac", "heuristic", "ellipsis_line_frac", "gt", 0.3, SEV_DROP, 32),
    Rule("alpha_word_frac", "heuristic", "alpha_word_frac", "lt", 0.8, SEV_DROP, 33),
    Rule("stopword_count", "heuristic", "stopword_count", "lt", 2, SEV_DROP, 34),
    # --- repetition / dedup signals ---
    Rule("dup_line_frac", "heuristic", "dup_line_frac", "gt", 0.30, SEV_DROP, 40),
    Rule("dup_5gram_char_frac", "heuristic", "dup_5gram_char_frac", "gt", 0.30, SEV_DROP, 41),
    Rule("top_2gram_char_frac", "heuristic", "top_2gram_char_frac", "gt", 0.20, SEV_DROP, 42),
    # --- C4 content rules ---
    Rule("bad_phrase", "content", "has_bad_phrase", "eq", 1, SEV_DROP, 50),
    Rule("curly_brace", "content", "has_curly_brace", "eq", 1, SEV_DROP, 51),
    Rule("min_sentences", "content", "n_sentences", "lt", 3, SEV_DROP, 52),
    # --- model-style scores ---
    Rule("lang_not_en", "langid", "lang_pred", "ne_str", "en", SEV_DROP, 60),
    Rule("langid_conf", "langid", "lang_conf", "lt", 0.20, SEV_DROP, 61),
    Rule("ppl_max", "perplexity", "ppl", "gt", 17.5, SEV_DROP, 62),
    # --- report-only conformance signals (never drop) ---
    Rule("declared_lang_mismatch", "langid", "lang", "ne_col:lang_pred", "", SEV_REPORT, 70),
)


def active_rules(overrides: dict | None = None) -> list[Rule]:
    """Registry + per-rule override dicts ({rule_id: {field: value}});
    an override of {'enabled': False} removes the rule."""
    out: list[Rule] = []
    for r in sorted(DEFAULT_RULES, key=lambda x: x.order):
        ov = (overrides or {}).get(r.rule_id)
        if ov is None:
            out.append(r)
            continue
        if ov.get("enabled", True) is False:
            continue
        out.append(replace(r, **{k: v for k, v in ov.items() if k != "enabled"}))
    return out


def drop_rules(overrides: dict | None = None) -> list[Rule]:
    return [r for r in active_rules(overrides) if r.severity == SEV_DROP]


def flag_name(rule: Rule) -> str:
    return f"flag_{rule.rule_id}"


# --- Spark path: pure Column expressions (no UDF) -------------------------


def violation_col(rule: Rule):
    from pyspark.sql import functions as F

    c = F.col(rule.stat)
    if rule.op == "lt":
        return c < F.lit(rule.threshold)
    if rule.op == "le":
        return c <= F.lit(rule.threshold)
    if rule.op == "gt":
        return c > F.lit(rule.threshold)
    if rule.op == "ge":
        return c >= F.lit(rule.threshold)
    if rule.op == "eq":
        return c == F.lit(rule.threshold)
    if rule.op == "ne":
        return c != F.lit(rule.threshold)
    if rule.op == "ne_str":
        return ~c.eqNullSafe(F.lit(str(rule.threshold)))
    if rule.op.startswith("ne_col:"):
        other = rule.op.split(":", 1)[1]
        return ~c.eqNullSafe(F.col(other))
    raise ValueError(f"unknown op {rule.op}")


def with_flags(df, overrides: dict | None = None):
    """Append one boolean flag column per active rule (single select —
    stays in one whole-stage-codegen project)."""
    from pyspark.sql import functions as F

    exprs = [violation_col(r).alias(flag_name(r)) for r in active_rules(overrides)]
    return df.select("*", *exprs) if exprs else df.select("*", F.lit(True))


# --- pandas path (oracle) ---------------------------------------------------


def violation_mask(rule: Rule, pdf: pd.DataFrame) -> pd.Series:
    c = pdf[rule.stat]
    if rule.op == "lt":
        return c < rule.threshold
    if rule.op == "le":
        return c <= rule.threshold
    if rule.op == "gt":
        return c > rule.threshold
    if rule.op == "ge":
        return c >= rule.threshold
    if rule.op == "eq":
        return c == rule.threshold
    if rule.op == "ne":
        return c != rule.threshold
    if rule.op == "ne_str":
        # null-safe inequality vs a string literal (matches eqNullSafe)
        return ~(c.fillna("\x00<null>") == str(rule.threshold))
    if rule.op.startswith("ne_col:"):
        other = rule.op.split(":", 1)[1]
        a = c.fillna("\x00<null>")
        b = pdf[other].fillna("\x00<null>")
        return ~(a == b)
    raise ValueError(f"unknown op {rule.op}")
