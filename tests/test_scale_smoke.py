"""sf0.1 smoke for the queries with DRIVER-SIDE data-dependent math.

The oracle gate proves correctness at sf0.001/sf0.01, but a
data-dependent driver computation can still blow up only at larger
scale — round 3's er_em_weights aborted ONLY at sf0.1, when EM drove a
u probability below the 6-dp grid and log2(m/0) threw. Every query
whose driver-side collect feeds scalar math gets a bench-scale .count()
here so that failure class lands in pytest, not in the bench run.
"""

from __future__ import annotations

import os

import pytest

from cspirit_ontology_information_extraction_opus4plan_spark import api

SF01 = "/root/testdata/sf0.1"

# queries whose collected dimension feeds driver-side arithmetic
DRIVER_MATH = [
    "er_em_weights",     # EM recurrence + log-odds on pattern counts
    "tfidf_linking",     # idf = log(n/df) over the collected vocab
    "ann_ivf_topk",      # centroid collect + probed-list assignment
    "bt_ratings",        # Hunter MM on collected match counts
    "event_bandit",      # log over totals
]


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 absent")
@pytest.mark.parametrize("name", DRIVER_MATH)
def test_driver_math_queries_survive_sf01(spark, name):
    df = api.queries()[name](spark, SF01)
    assert df.count() > 0
