"""PySpark-native knowledge-graph construction engine.

A from-scratch, idiomatic-Spark reimplementation of the capabilities of
mberjans/cspirit_ontology_information_extraction_Opus4plan (reference
studied read-only at /root/reference; see SURVEY.md for the file:line
parity map). The reference is a single-process Python object model; this
engine re-expresses every operator as DataFrame/SQL plans optimized by
Catalyst, with exactly three sanctioned vectorized Arrow (pandas-UDF)
stages on the hot path:

  1. NER mention detection (broadcast gazetteer automaton, mapInPandas)
  2. relation/triple pattern extraction (also expressible pure-JVM)
  3. entity-linking similarity scoring

Input contract (BASELINE.json input_hint): an Iceberg-style table
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
In this sandbox the interleaved table is synthesized deterministically from
the driver-provided parquet corpus (see ``corpus.py``).
"""

__version__ = "0.1.0"
