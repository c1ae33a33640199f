#!/usr/bin/env python
"""spark-submit entrypoint: end-to-end KG construction with resumable
per-partition checkpointing.

Cluster launch (north_rule launch mode):

    cd /root/repo && zip -qr /tmp/engine.zip \
        cspirit_ontology_information_extraction_opus4plan_spark
    spark-submit --py-files /tmp/engine.zip \
        jobs/kg_construct_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/kg_out --parts 16

Local smoke (no cluster here): same command; spark-submit defaults to
local[*]. Prints one JSON summary line on stdout.

Rerunning the identical command resumes: completed partitions are
skipped via their checkpoint markers.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--canonicalize", action="store_true",
                    help="rewrite triples through connected-components "
                         "canonical ids before materializing")
    args = ap.parse_args()

    # spark-submit provides the session config (master, executors, py-files)
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("kg_construct")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from cspirit_ontology_information_extraction_opus4plan_spark import api
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.canonicalize import (  # noqa: E501
        canonical_mapping,
        canonical_triples,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.gazetteer import (  # noqa: E501
        terms_df,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.operators.relations import (  # noqa: E501
        dedup_triples,
    )
    from cspirit_ontology_information_extraction_opus4plan_spark.plans.checkpointing import (  # noqa: E501
        materialize_triples,
    )

    triples = api.triples_df(spark, args.sf_dir)
    if args.canonicalize:
        # canonical rewrite loses doc_id; keep the per-doc table for
        # partitioned materialization and write canonical separately
        canon = canonical_triples(dedup_triples(triples),
                                  canonical_mapping(terms_df(spark)))
        canon.write.mode("overwrite").parquet(args.out + "_canonical")

    summary = materialize_triples(
        spark, triples, args.out, sf_dir=args.sf_dir, n_parts=args.parts)
    print(json.dumps({"job": "kg_construct", **summary}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
