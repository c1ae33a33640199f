"""Probabilistic record linkage (Fellegi-Sunter) and blocking-scheme
quality audit over the customer relation — the principled,
weight-based stage of entity resolution that complements the
similarity-first linkers (fuzzy.py trigram, tfidf) the KG pipeline
already has. Reference analog: the reference resolves duplicate terms
by exact/alt-id/fuzzy cascades (aim2_project ontology merge paths);
Fellegi-Sunter is the published generalization (Fellegi & Sunter 1969,
JASA) every production ER system (Splink, dedupe, JedAI) implements.

The record universe is DERIVED deterministically from the customer
table: side A is the table as-is, side B is a hash-perturbed copy
(name corrupted for custkey%5==0, balance rounded for %2==0, segment
blanked for %7==0, nation shifted for %11==0) — the classic
"dirty copy" ER benchmark construction, ground truth = same custkey.

Scale notes:
  * candidate generation is a BLOCKING equi-join (nationkey), never a
    cross join — candidate count is sum over blocks of |A_b|*|B_b|;
    at 100 TB a hot block is handled like any skewed join key (salt or
    add a secondary blocking attribute), and the audit operator below
    measures exactly that trade-off before you pay for it.
  * blocking_quality counts candidates WITHOUT materializing pairs:
    per-block counts for each side, one bounded join on the block key,
    sum of products. Pairs completeness needs only the truth pairs
    (identity — a per-row predicate), so the whole audit is two scans
    and a dimension-sized join regardless of corpus size.
  * field agreement weights are fixed published-style m/u constants
    (log2 odds), embedded as 6-dp literals shared with the DuckDB
    oracle; the score is a 3-term sum of those literals per row -> no
    accumulation, bit-identical across engines. Balance math runs in
    DECIMAL(18,2) so rounding ties are exact, not double-noise.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAL = "decimal(18,2)"

# (m, u) per comparison field: m = P(agree | match), u = P(agree | non-
# match). Fixed constants (not EM-estimated) so both engines score
# identically; production swaps in Splink-style EM estimates through
# the same expressions.
FS_MU = {
    "name": (0.9, 0.001),
    "bal": (0.95, 0.005),
    "seg": (0.85, 0.2),
}
# log2 agreement / disagreement weights, rounded to 6 dp so the SQL
# oracle can embed the identical literals
FS_W = {
    f: (round(math.log2(m / u), 6), round(math.log2((1 - m) / (1 - u)), 6))
    for f, (m, u) in FS_MU.items()
}
FS_MATCH_T = 12.0     # score >= -> 'match'
FS_POSSIBLE_T = 0.0   # score >= -> 'possible'; below -> dropped
N_NATIONS = 25


def dirty_pair_sides(customer: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Side A (as-is) and side B (deterministically corrupted copy) of
    the ER benchmark universe."""
    k = F.col("c_custkey")
    a = customer.select(
        k.alias("key_a"), F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_acctbal").cast(BAL).alias("bal_a"),
        F.col("c_mktsegment").alias("seg_a"))
    b = customer.select(
        k.alias("key_b"),
        F.when(k % 5 == 0, F.concat(F.col("c_name"), F.lit("~")))
        .otherwise(F.col("c_name")).alias("name_b"),
        F.when(k % 11 == 0, (F.col("c_nationkey") + 1) % N_NATIONS)
        .otherwise(F.col("c_nationkey")).alias("nat_b"),
        F.when(k % 2 == 0, F.round(F.col("c_acctbal").cast(BAL), 0))
        .otherwise(F.col("c_acctbal").cast(BAL)).alias("bal_b"),
        F.when(k % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment")).alias("seg_b"))
    return a, b


def fs_score_pairs(customer: DataFrame) -> DataFrame:
    """Fellegi-Sunter scored candidate pairs: block on nation, compare
    (name exact, balance within 0.5, segment exact), sum fixed log2
    m/u weights, keep score >= FS_POSSIBLE_T with a match / possible
    decision. is_true marks ground-truth pairs for error analysis."""
    a, b = dirty_pair_sides(customer)
    pairs = a.join(b, F.col("nat_a") == F.col("nat_b"))
    ag_name = F.col("name_a") == F.col("name_b")
    ag_bal = F.abs(F.col("bal_a") - F.col("bal_b")) < F.lit("0.5").cast(BAL)
    ag_seg = F.col("seg_a") == F.col("seg_b")
    score = sum(
        F.when(ag, F.lit(wa)).otherwise(F.lit(wd))
        for ag, (wa, wd) in zip((ag_name, ag_bal, ag_seg),
                                (FS_W["name"], FS_W["bal"], FS_W["seg"])))
    return (pairs
            .select("key_a", "key_b",
                    ag_name.alias("agree_name"), ag_bal.alias("agree_bal"),
                    ag_seg.alias("agree_seg"),
                    F.round(score, 6).alias("score"),
                    (F.col("key_a") == F.col("key_b")).alias("is_true"))
            .filter(F.col("score") >= FS_POSSIBLE_T)
            .withColumn("decision",
                        F.when(F.col("score") >= FS_MATCH_T, "match")
                        .otherwise("possible")))


def blocking_quality(customer: DataFrame) -> DataFrame:
    """Reduction ratio + pairs completeness for two blocking schemes
    (nation; nation+segment) over the same A/B universe — the audit
    that decides a blocking key BEFORE paying for candidate pairs.
    Candidate counts come from per-block count products, truth
    coverage from a per-row block-key equality predicate."""
    a, b = dirty_pair_sides(customer)
    total = a.count() * b.count()
    out = None
    schemes = {
        "nation": [("nat_a", "nat_b")],
        "nation_segment": [("nat_a", "nat_b"), ("seg_a", "seg_b")],
    }
    for scheme, keys in schemes.items():
        ka = [p[0] for p in keys]
        kb = [p[1] for p in keys]
        ca = (a.groupBy(*ka).agg(F.count("*").alias("na"))
              .select(F.struct(*ka).alias("blk"), "na"))
        cb = (b.groupBy(*kb).agg(F.count("*").alias("nb"))
              .select(F.struct(*kb).alias("blk"), "nb"))
        n_cand = ca.join(cb, ca["blk"] == cb["blk"]).agg(
            F.sum(F.col("na") * F.col("nb")).cast("bigint")).collect()[0][0]
        # truth pair (k,k) survives iff its A and B block keys agree —
        # a per-row predicate on the corrupted copy
        ab = a.join(b, F.col("key_a") == F.col("key_b"))
        pred = F.lit(True)
        for pa, pb in keys:
            pred = pred & (F.col(pa) == F.col(pb))
        found = ab.filter(pred).count()
        n_truth = customer.count()
        # ratios via Spark round (HALF_UP, matching the SQL oracle) —
        # Python's round is half-even and could diverge on exact ties
        row = (customer.sparkSession.createDataFrame(
            [(scheme, int(n_cand or 0), int(n_truth), int(found))],
            "scheme string, n_candidates bigint, n_truth bigint, "
            "truth_found bigint")
            .select("*",
                    F.round(F.col("truth_found").cast("double")
                            / F.col("n_truth"), 6)
                    .alias("pairs_completeness"),
                    F.round(F.lit(1.0) - F.col("n_candidates")
                            .cast("double") / F.lit(float(total)), 6)
                    .alias("reduction_ratio")))
        out = row if out is None else out.unionByName(row)
    return out


FS_EM_ITER = 3
FS_EM_INIT = (0.9, 0.1, 0.01)   # m0, u0, lambda0 (Splink defaults)
FS_EM_EPS = 1e-6                # probability clamp before log-odds


def fs_em_weights(customer: DataFrame,
                  n_iter: int = FS_EM_ITER) -> DataFrame:
    """Unsupervised EM estimation of the Fellegi-Sunter m/u
    probabilities (Splink's `estimate_parameters_using_em`): the
    training that replaces FS_MU's fixed constants with data-derived
    ones, no labels needed.

    The E/M steps run on COMPARISON-PATTERN COUNTS, not pairs — the
    published Splink optimization: blocked pairs aggregate once to
    2^k pattern rows (k = 3 fields -> 8 rows), and every EM iteration
    is arithmetic over that bounded table. The only Spark shuffle is
    the pattern groupBy (map-side combinable over the blocked join);
    the collect is 2^k rows, dimension-sized by construction like the
    TF-IDF vocab, NEVER corpus-sized. Parameters round to 12 dp each
    iteration so the DuckDB oracle (same recurrence unrolled in SQL)
    tracks bit-identically; outputs round to 6 dp.

    Emits one row per field: (field, m, u, w_agree, w_disagree,
    lam, n_pairs) — w = log2 odds from the FINAL 6-dp m/u, the
    drop-in replacement for FS_W."""
    a, b = dirty_pair_sides(customer)
    pairs = a.join(b, F.col("nat_a") == F.col("nat_b"))
    ag = {
        "name": F.col("name_a") == F.col("name_b"),
        "bal": F.abs(F.col("bal_a") - F.col("bal_b"))
        < F.lit("0.5").cast(BAL),
        "seg": F.col("seg_a") == F.col("seg_b"),
    }
    fields = list(ag)
    pat = (pairs
           .groupBy(*[ag[f].alias(f"g_{f}") for f in fields])
           .agg(F.count("*").alias("n")))
    rows = sorted(
        ((tuple(bool(r[f"g_{f}"]) for f in fields), int(r["n"]))
         for r in pat.collect()))
    m0, u0, lam0 = FS_EM_INIT
    m = {f: m0 for f in fields}
    u = {f: u0 for f in fields}
    lam = lam0
    for _ in range(n_iter):
        num_lam = den_lam = 0.0
        num_m = {f: 0.0 for f in fields}
        num_u = {f: 0.0 for f in fields}
        den_m = den_u = 0.0
        for gamma, n in rows:
            pm = lam
            pu = 1.0 - lam
            for f, gf in zip(fields, gamma):
                pm *= m[f] if gf else 1.0 - m[f]
                pu *= u[f] if gf else 1.0 - u[f]
            r = pm / (pm + pu)
            num_lam += n * r
            den_lam += n
            den_m += n * r
            den_u += n * (1.0 - r)
            for f, gf in zip(fields, gamma):
                if gf:
                    num_m[f] += n * r
                    num_u[f] += n * (1.0 - r)
        lam = round(num_lam / den_lam, 12)
        m = {f: round(num_m[f] / den_m, 12) for f in fields}
        u = {f: round(num_u[f] / den_u, 12) for f in fields}
    n_pairs = sum(n for _, n in rows)
    out = []
    for f in fields:
        m6, u6 = round(m[f], 6), round(u[f], 6)
        # Splink-style probability clamp before the log-odds: on a
        # large corpus EM legitimately drives u below the 6-dp grid
        # (name agreement among non-matches ~ 1/#names), and log2(x/0)
        # must not abort the job — clamp into [eps, 1-eps] exactly as
        # the oracle SQL does (greatest/least on the rounded value)
        mc = min(max(m6, FS_EM_EPS), 1.0 - FS_EM_EPS)
        uc = min(max(u6, FS_EM_EPS), 1.0 - FS_EM_EPS)
        out.append((f, m6, u6,
                    round(math.log2(mc / uc), 6),
                    round(math.log2((1.0 - mc) / (1.0 - uc)), 6),
                    round(lam, 6), n_pairs))
    return customer.sparkSession.createDataFrame(
        out, "field string, m double, u double, w_agree double, "
             "w_disagree double, lam double, n_pairs bigint")


# --- edit-distance typo blocking over term names ---------------------------

TYPO_MAX_DIST = 2
TYPO_PREFIX = 2


def typo_candidate_pairs(names: DataFrame,
                         max_dist: int = TYPO_MAX_DIST) -> DataFrame:
    """(id, name) -> near-identical name pairs (id_a, id_b, name_a,
    name_b, dist): candidates blocked on the 2-character lowercase
    prefix plus a |len| gap <= max_dist filter, then verified with
    exact Levenshtein in 1..max_dist. The typo-merge stage of the
    gazetteer/ontology dedup cascade — the reference merges duplicate
    terms only on exact name/alt-id keys (ontology merge paths); edit
    distance catches single-keystroke variants those keys miss.

    Scale shape: the prefix block is an equi-join — candidate count is
    sum_b |block_b|^2, never N^2; a 2-char prefix over lowercase text
    yields ~26^2 blocks and AQE's skew-join splits hot prefixes (the
    'co'/'pro' pile-ups of real vocabularies). The length-gap filter
    prunes before levenshtein runs (codegen, JVM-side). Pairs are
    emitted once (name_a < name_b); identical names are the EXACT
    dedup path's job (dist >= 1 here)."""
    n = names.select("id", F.lower(F.trim("name")).alias("name"))
    a = (n.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"))
         .withColumn("blk", F.substring("name_a", 1, TYPO_PREFIX)))
    b = (n.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"))
         .withColumn("blk", F.substring("name_b", 1, TYPO_PREFIX)))
    return (a.join(b, "blk")
            .filter((F.col("name_a") < F.col("name_b"))
                    & (F.abs(F.length("name_a") - F.length("name_b"))
                       <= max_dist))
            .withColumn("dist", F.levenshtein("name_a", "name_b"))
            .filter((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
            .select("id_a", "id_b", "name_a", "name_b",
                    F.col("dist").cast("int").alias("dist")))
