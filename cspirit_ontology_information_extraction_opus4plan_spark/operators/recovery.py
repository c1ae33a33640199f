"""Error-recovery strategy taxonomy — the reference's severity
classification and SKIP/DEFAULT/RETRY/REPLACE/ABORT/CONTINUE lanes
re-expressed as a COLUMNAR rule table.

Reference semantics: `_classify_error_severity`
(parsers/__init__.py:1059) buckets an (error_type, message) pair into
WARNING/RECOVERABLE/FATAL via closed keyword tables;
`_select_recovery_strategy` (:1135) picks the strategy from (type,
severity) with a deterministic first-attempt progression;
`_recover_default` (:1259) substitutes context defaults keyed on the
error location (term / relationship / namespace); `_recover_replace`
(:1333) substitutes corrected data. The reference applies these
imperatively per parse call; at 100 TB the same decisions are a
per-row expression over the failure table — every rule below is a
`F.when` chain (pure JVM codegen, no Python), and the DuckDB oracle
re-states the identical CASE logic.

The REPLACE lane's "corrected data" form is implemented against the
real parser: `reparse_with_corrections` patches the two mechanical
defect classes the corpus plants (undefined prefix, missing statement
terminator) and re-runs parse_turtle_full — rows whose corrected
payload parses land back in the triple stream; rows that still fail
fall through the progression to their terminal action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# closed keyword tables — _classify_error_severity
# (parsers/__init__.py:1075-1106), verbatim
FATAL_TYPES = ("SystemError", "MemoryError", "KeyboardInterrupt")
RECOVERABLE_TYPES = ("SyntaxError", "ValueError", "KeyError",
                     "AttributeError")
WARNING_TYPES = ("UserWarning", "DeprecationWarning")
FATAL_INDICATORS = ("outofmemoryerror", "stackoverflow", "system",
                    "critical", "fatal", "corrupted", "cannot allocate")
RECOVERABLE_INDICATORS = ("parsing", "format", "syntax", "invalid",
                          "malformed", "missing", "namespace",
                          "encoding", "timeout")
WARNING_INDICATORS = ("deprecated", "recommendation", "optional",
                      "preference", "whitespace", "formatting")

# context defaults — _recover_default (parsers/__init__.py:1280-1293)
DEFAULT_TERM = ("unknown", "Unknown Term", "Definition not available")
DEFAULT_RELATIONSHIP = ("unknown", "related_to", "unknown")
DEFAULT_NAMESPACE = ("http://example.org/default#", "default")


def _contains_any(col: F.Column, words: tuple) -> F.Column:
    out = F.lit(False)
    for w in words:
        out = out | col.contains(w)
    return out


def classify_severity(error_type: F.Column,
                      message: F.Column) -> F.Column:
    """(error_type, message) -> 'fatal' | 'recoverable' | 'warning' —
    the exact rule ORDER of _classify_error_severity: type tables
    first, then fatal -> recoverable -> warning message indicators,
    default recoverable."""
    msg = F.lower(message)
    return (F.when(error_type.isin(*FATAL_TYPES), "fatal")
            .when(error_type.isin(*RECOVERABLE_TYPES), "recoverable")
            .when(error_type.isin(*WARNING_TYPES), "warning")
            .when(_contains_any(msg, FATAL_INDICATORS), "fatal")
            .when(_contains_any(msg, RECOVERABLE_INDICATORS),
                  "recoverable")
            .when(_contains_any(msg, WARNING_INDICATORS), "warning")
            .otherwise("recoverable"))


def select_strategy(error_type: F.Column,
                    severity: F.Column) -> F.Column:
    """First-attempt strategy — _select_recovery_strategy's
    progression heads: fatal -> abort, warning -> continue,
    SyntaxError/ValueError -> skip, KeyError/AttributeError -> default,
    TimeoutError/ConnectionError -> retry, else skip."""
    return (F.when(severity == "fatal", "abort")
            .when(severity == "warning", "continue")
            .when(error_type.isin("SyntaxError", "ValueError"), "skip")
            .when(error_type.isin("KeyError", "AttributeError"),
                  "default")
            .when(error_type.isin("TimeoutError", "ConnectionError"),
                  "retry")
            .otherwise("skip"))


def recover(failures: DataFrame) -> DataFrame:
    """failures(src_id, location, error_type, error_message) ->
    one row per failure with (severity, strategy) plus the strategy's
    OUTPUT: the DEFAULT lane substitutes the reference's context
    defaults keyed on the location (term/relationship/namespace,
    _recover_default); skip/abort/continue/retry emit their marker
    with NULL substitutes. One map-only projection — the rule table
    compiles into codegen'd CASE expressions; no shuffle, no
    Python."""
    severity = classify_severity(F.col("error_type"),
                                 F.col("error_message"))
    strategy = select_strategy(F.col("error_type"), severity)
    loc = F.lower(F.col("location"))
    is_default = strategy == "default"
    d_id = (F.when(is_default & loc.contains("namespace"),
                   DEFAULT_NAMESPACE[0])
            .when(is_default & loc.contains("term"), DEFAULT_TERM[0])
            .when(is_default & loc.contains("relationship"),
                  DEFAULT_RELATIONSHIP[0]))
    d_name = (F.when(is_default & loc.contains("namespace"),
                     DEFAULT_NAMESPACE[1])
              .when(is_default & loc.contains("term"), DEFAULT_TERM[1])
              .when(is_default & loc.contains("relationship"),
                    DEFAULT_RELATIONSHIP[1]))
    d_extra = (F.when(is_default & loc.contains("term"),
                      DEFAULT_TERM[2])
               .when(is_default & loc.contains("relationship"),
                     DEFAULT_RELATIONSHIP[2]))
    return failures.select(
        "src_id", "location", "error_type",
        severity.alias("severity"), strategy.alias("strategy"),
        d_id.alias("default_id"), d_name.alias("default_name"),
        d_extra.alias("default_extra"))


# --------------------------------------------------------------------------
# REPLACE lane against the real parser: corrected-payload reparse
# --------------------------------------------------------------------------

# mechanical corrections for the two defect classes the corpus plants;
# a production rule table grows per incident, exactly like this
_PREFIX_PREAMBLE = ("@prefix ont: <urn:graft#> .\n"
                    "@prefix obo: <urn:obo#> .\n")


def correct_payload(payload: F.Column) -> F.Column:
    """Patch mechanically-correctable Turtle defects: prepend the
    default prefix block (cures 'undefined prefix') and terminate an
    unterminated final statement (cures 'expected .')."""
    terminated = F.when(
        F.regexp_count(F.rtrim(payload), F.lit(r"\.$")) > 0, payload
    ).otherwise(F.concat(F.rtrim(payload), F.lit(" .")))
    return F.concat(F.lit(_PREFIX_PREAMBLE), terminated)


# --------------------------------------------------------------------------
# demo corpora (deterministic plants from the terms dimension)
# --------------------------------------------------------------------------

# (location, error_type, error_message) per planted class — one row per
# failure family the reference's taxonomy distinguishes
FAILURE_CLASSES = (
    ("term extraction", "KeyError", "'label' key missing in term node"),
    ("relationship parsing", "AttributeError",
     "'NoneType' object has no attribute 'object'"),
    ("namespace resolution", "KeyError", "namespace prefix not bound"),
    ("turtle parsing", "ValueError", "syntax error at line 3"),
    ("url fetch", "TimeoutError", "timeout after 30s"),
    ("document load", "MemoryError", "cannot allocate 2GB buffer"),
    ("formatting check", "UserWarning",
     "deprecated whitespace formatting"),
)


def planted_failures(terms: DataFrame) -> DataFrame:
    """One failure row per term, class = numeric id % 7 — every lane of
    the taxonomy (default x3 contexts, skip, retry, abort, continue)
    fires on every corpus slice. Pure projection over the dimension."""
    idx = (F.regexp_extract("id", r"(\d+)$", 1).cast("int")
           % len(FAILURE_CLASSES)) + 1
    locs = F.array(*[F.lit(c[0]) for c in FAILURE_CLASSES])
    types = F.array(*[F.lit(c[1]) for c in FAILURE_CLASSES])
    msgs = F.array(*[F.lit(c[2]) for c in FAILURE_CLASSES])
    return terms.select(
        F.col("id").alias("src_id"),
        F.element_at(locs, idx).alias("location"),
        F.element_at(types, idx).alias("error_type"),
        F.element_at(msgs, idx).alias("error_message"))


def recovery_demo_docs(terms: DataFrame) -> DataFrame:
    """One tiny Turtle doc per term with a planted defect by numeric
    id % 4: 0 = prefixes never declared (undefined prefix — curable),
    1 = unterminated final statement (curable), 2 = clean,
    3 = lexically corrupt ('%%%' object — incurable; falls through the
    progression). Input synthesis for the REPLACE-lane query."""
    cls = F.regexp_extract("id", r"(\d+)$", 1).cast("int") % 4
    frag = F.regexp_replace("id", ":", "_")
    stmt = F.concat(F.lit("ont:"), frag, F.lit(' obo:src "'),
                    F.col("name"), F.lit('" .'))
    bad = F.concat(F.lit("ont:"), frag, F.lit(" obo:src %%% ."))
    payload = (F.when(cls == 0, stmt)
               .when(cls == 1, F.concat(
                   F.lit(_PREFIX_PREAMBLE),
                   F.regexp_replace(stmt, r" \.$", "")))
               .when(cls == 2, F.concat(F.lit(_PREFIX_PREAMBLE), stmt))
               .otherwise(F.concat(F.lit(_PREFIX_PREAMBLE), bad)))
    return terms.select(F.col("id").alias("src_id"),
                        payload.alias("payload"))


def reparse_with_corrections(docs: DataFrame,
                             parsed: DataFrame) -> DataFrame:
    """REPLACE lane over the real parse: join the quarantined src_ids
    back to their payloads, apply the correction rules, and re-run
    parse_turtle_full once. Returns the second-pass output (recovered
    triples, or a second quarantine row for payloads the corrections
    cannot cure — those fall through the progression to skip/abort).
    The reparse touches only failed payloads; the failed-id semi-join
    is left to AQE rather than force-broadcast — quarantine volume is
    normally dimension-sized, but a poisoned corpus (every document
    failing) must degrade to a shuffle join, not OOM the driver."""
    from .rdf_full import parse_turtle_full
    failed = (parsed.filter(F.col("predicate") == "parse_error")
              .select("src_id").distinct())
    to_fix = (docs.join(failed, "src_id", "left_semi")
              .select("src_id", correct_payload(F.col("payload"))
                      .alias("payload")))
    return parse_turtle_full(to_fix)
