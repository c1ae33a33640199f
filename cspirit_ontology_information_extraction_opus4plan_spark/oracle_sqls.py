"""DuckDB oracle SQL builders.

Every queries() entry in __spark_entry__.py pairs with an ANSI-SQL string
produced here. The SQL reconstructs the same deterministic inputs (spans
corpus via corpus.corpus_ctes(); gazetteer/terms/relationships as VALUES
CTEs from ontology_data) and re-derives the operator's semantics
independently of the Spark implementation.
"""

from __future__ import annotations

from . import ontology_data as OD
from .corpus import corpus_ctes
from .operators.ner import ner_pattern


def _q(s) -> str:
    if s is None:
        return "NULL"
    return "'" + str(s).replace("'", "''") + "'"


def _values(rows, alias, cols) -> str:
    body = ",".join("(" + ",".join(vals) + ")" for vals in rows)
    return f"{alias}({','.join(cols)}) AS (SELECT * FROM (VALUES {body}))"


def gaz_cte() -> str:
    rows = [
        (_q(g["surface"]), _q(g["term_id"]), _q(g["match_kind"]),
         _q(g["namespace"]), _q(g["ontology_id"]),
         str(OD.MATCH_KIND_RANK[g["match_kind"]]))
        for g in OD.gazetteer()
    ]
    return _values(rows, "gaz",
                   ["surface", "term_id", "match_kind", "namespace",
                    "ontology_id", "rank"])


def terms_cte() -> str:
    rows = [
        (_q(t["id"]), _q(t["name"]), _q(t["namespace"]),
         "TRUE" if t["is_obsolete"] else "FALSE", _q(t["replaced_by"]),
         _q(t["parents"][0]) if t["parents"] else "NULL",
         _q(t["ontology_id"]))
        for t in OD.terms()
    ]
    return _values(rows, "terms_d",
                   ["id", "name", "namespace", "is_obsolete", "replaced_by",
                    "parent", "ontology_id"])


def rels_cte() -> str:
    rows = [
        (_q(r["id"]), _q(r["subject"]), _q(r["predicate"]), _q(r["object"]),
         f"CAST({r['confidence']} AS DOUBLE)", _q(r["ontology_id"]))
        for r in OD.relationships()
    ]
    return _values(rows, "rels_d",
                   ["id", "subject", "predicate", "object", "confidence",
                    "ontology_id"])


def terms_full_cte() -> str:
    """terms_f with synonyms/xrefs as ';'-joined strings — the reference's
    own CSV-export encoding (ontology_manager.py:1213-1233) — so the SQL
    side re-derives exploded keys independently via string_split."""
    rows = [
        (_q(t["id"]), _q(t["name"]), _q(";".join(t["synonyms"])),
         _q(";".join(t["xrefs"])), "TRUE" if t["is_obsolete"] else "FALSE",
         _q(t["replaced_by"]))
        for t in OD.terms()
    ]
    return _values(rows, "terms_f",
                   ["id", "name", "synonyms", "xrefs", "is_obsolete",
                    "replaced_by"])


def cc_ctes() -> str:
    """Equivalence edges + connected components (recursive reachability,
    min-id label). Requires terms_f; the statement must open with
    WITH RECURSIVE. Independent re-derivation of operators/canonicalize.py:
    same edge semantics, different algorithm (transitive closure vs
    iterative label propagation)."""
    return """
surf_k AS (
  SELECT lower(trim(name)) AS k, id FROM terms_f WHERE NOT is_obsolete
  UNION ALL
  SELECT lower(trim(u.x)) AS k, id
  FROM terms_f, unnest(string_split(synonyms, ';')) AS u(x)
  WHERE NOT is_obsolete AND synonyms <> ''
),
xr_k AS (
  SELECT u.x AS k, id FROM terms_f, unnest(string_split(xrefs, ';')) AS u(x)
  WHERE xrefs <> ''
),
eq_edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT least(a.id, b.id) AS src, greatest(a.id, b.id) AS dst
    FROM surf_k a JOIN surf_k b ON a.k = b.k AND a.id < b.id
    UNION
    SELECT least(a.id, b.id), greatest(a.id, b.id)
    FROM xr_k a JOIN xr_k b ON a.k = b.k AND a.id < b.id
    UNION
    SELECT least(id, replaced_by), greatest(id, replaced_by)
    FROM terms_f WHERE is_obsolete AND replaced_by IS NOT NULL
  ) e
),
eq_sym AS (
  SELECT src AS a, dst AS b FROM eq_edges
  UNION SELECT dst, src FROM eq_edges
),
reach(a, b) AS (
  SELECT id, id FROM terms_f
  UNION
  SELECT r.a, s.b FROM reach r JOIN eq_sym s ON s.a = r.b
),
canon AS (
  SELECT a AS id, min(b) AS canonical_id FROM reach GROUP BY a
)""".strip()


def link_cte() -> str:
    """Per-surface winning candidate: argmax(rank), tie -> min term_id —
    the disambiguation rule shared with operators/linking.py."""
    return """
link AS (
  SELECT surface, term_id, match_kind FROM (
    SELECT g.*, row_number() OVER (
      PARTITION BY surface ORDER BY rank DESC, term_id ASC) AS rn
    FROM gaz g) t
  WHERE rn = 1
)""".strip()


def phrase_pred_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {_q(ph)} THEN {_q(pred)}" for ph, pred in OD.PREDICATE_PHRASES)
    return f"CASE {col} {whens} END"


def triples_cte() -> str:
    """Triples re-derived from the generative closed form (aug2): the
    injected sentence is '<subj> <phrase> <obj>.', captions contain no
    phrase, the base corpus contains no surfaces or phrases — so
    extraction == closed form (asserted by the pytest P/R harness)."""
    return f"""
triples AS (
  SELECT a.doc AS doc_id, 1 AS pos,
         s.term_id AS subject,
         {phrase_pred_case('a.phrase')} AS predicate,
         o.term_id AS object,
         'uri' AS subject_type, 'uri' AS object_type,
         CAST(NULL AS VARCHAR) AS object_datatype,
         CAST(NULL AS VARCHAR) AS object_language,
         CASE WHEN s.match_kind = 'name' AND o.match_kind = 'name'
              THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.9 AS DOUBLE)
         END AS confidence,
         a.sentence AS evidence
  FROM aug2 a
  JOIN link s ON s.surface = a.subj
  JOIN link o ON o.surface = a.obj
  WHERE s.term_id <> o.term_id
)""".strip()


def corpus_prefix(*extra: str) -> str:
    parts = [corpus_ctes()] + [e for e in extra if e]
    return "WITH " + ",\n".join(parts)


def recursive_prefix(*parts: str) -> str:
    """WITH RECURSIVE prefix for statements using cc_ctes (no corpus)."""
    return "WITH RECURSIVE " + ",\n".join(p for p in parts if p)


def corpus_prefix_recursive(*extra: str) -> str:
    parts = [corpus_ctes()] + [e for e in extra if e]
    return "WITH RECURSIVE " + ",\n".join(parts)


# ---------------------------------------------------------------------------
# full oracle statements, keyed like queries()
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    pat = ner_pattern()
    sqls: dict[str, str] = {}

    sqls["interleaved_documents"] = (
        corpus_prefix()
        + '\nSELECT doc_id, pos, kind, text, media_ref, "offset" FROM spans')

    sqls["span_integrity"] = corpus_prefix() + """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN kind='text' THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
       CAST(sum(CASE WHEN kind IN ('figure','table') THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
       CAST(max("offset") AS INT) AS max_offset,
       CAST(min("offset") AS INT) AS min_offset
FROM spans GROUP BY doc_id"""

    sqls["ner_mentions"] = corpus_prefix() + f"""
SELECT DISTINCT doc_id, kind, surface FROM (
  SELECT doc_id, kind,
         unnest(regexp_extract_all(lower(text), {_q(pat)}, 1)) AS surface
  FROM spans WHERE kind IN ('text','figure','table')) t"""

    sqls["entity_linking"] = corpus_prefix(gaz_cte(), link_cte()) + f"""
SELECT DISTINCT m.doc_id, m.surface, l.term_id, l.match_kind
FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), {_q(pat)}, 1)) AS surface
  FROM spans WHERE kind IN ('text','figure','table')) m
JOIN link l ON l.surface = m.surface"""

    sqls["triples"] = corpus_prefix(gaz_cte(), link_cte(), triples_cte()) + """
SELECT doc_id, subject, predicate, object, subject_type, object_type,
       confidence, evidence,
       'TRP:' || md5(doc_id || '|' || CAST(pos AS VARCHAR) || '|' || subject
                     || '|' || predicate || '|' || object) AS triple_id
FROM triples"""

    sqls["triples_dedup"] = corpus_prefix(gaz_cte(), link_cte(), triples_cte()) + """
SELECT subject, predicate, object, subject_type, object_type,
       object_datatype, object_language,
       max(confidence) AS confidence,
       CAST(count(*) AS BIGINT) AS support
FROM triples
GROUP BY 1,2,3,4,5,6,7"""

    sqls["predicate_counts"] = corpus_prefix(gaz_cte(), link_cte(), triples_cte()) + """
SELECT predicate, CAST(count(*) AS BIGINT) AS n
FROM triples GROUP BY predicate"""

    sqls["entity_equivalence_edges"] = recursive_prefix(
        terms_full_cte(), cc_ctes()) + """
SELECT src, dst FROM eq_edges"""

    sqls["canonical_entities"] = recursive_prefix(
        terms_full_cte(), cc_ctes()) + """
SELECT id, canonical_id FROM canon"""

    sqls["canonical_triples"] = corpus_prefix_recursive(
        gaz_cte(), link_cte(), triples_cte(), terms_full_cte(), cc_ctes()) + """
SELECT subject, predicate, object, subject_type, object_type,
       object_datatype, object_language,
       max(confidence) AS confidence,
       CAST(sum(support) AS BIGINT) AS support
FROM (
  SELECT coalesce(cs.canonical_id, d.subject) AS subject,
         d.predicate,
         coalesce(co.canonical_id, d.object) AS object,
         d.subject_type, d.object_type, d.object_datatype,
         d.object_language, d.confidence, d.support
  FROM (
    SELECT subject, predicate, object, subject_type, object_type,
           object_datatype, object_language,
           max(confidence) AS confidence, count(*) AS support
    FROM triples GROUP BY 1,2,3,4,5,6,7
  ) d
  LEFT JOIN canon cs ON cs.id = d.subject
  LEFT JOIN canon co ON co.id = d.object
) r
WHERE subject <> object
GROUP BY 1,2,3,4,5,6,7"""

    return sqls
