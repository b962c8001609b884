"""Round-11 operators: relational graph ranking + exact tree training.

- q26: weighted PageRank over the nation trade graph (customer-nation →
  supplier-nation per lineitem) — iterative relational model training in
  the v13/t31 discipline: per round ONE distributed aggregation over the
  edge frame with ranks re-entering as literals, model-sized driver
  state, and EVERY arithmetic step in fixed-point integers so the
  DuckDB oracle (unrolled rounds, HUGEINT) is bit-identical.
- t33: CART decision-stump training (the tree-model root split) with an
  EXACT integer Gini argmax — no floating point anywhere in the split
  search, so the full threshold scan hash-matches the oracle.

Reference parity note: the reference (696 LoC chunk store,
/root/reference/src/lib.rs) has no query surface; these extend the
SURVEY §2 LLM-pipeline family (model training over relational frames).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# q26: weighted PageRank on the nation trade graph
# ---------------------------------------------------------------------------

Q26_ITERS = 5
#: fixed-point scale for ranks. 10^9 keeps every per-edge product
#: rank * w below 2^63 for edge weights up to ~9.2e9 lineitems per
#: nation pair (a 100 TB corpus is ~1.6e9 per pair); beyond that the
#: contribution column widens to DECIMAL(38,0) with the same div.
Q26_ONE = 10**9
#: damping 0.85 as the exact rational 85/100 — never a double.
Q26_D_NUM, Q26_D_DEN = 85, 100


def _q26_iter_ctes(i: int) -> str:
    """One unrolled PageRank round: per-edge integer contribution
    (r_src * w) // wsum_src, dangling mass split evenly, then
    r' = base + (85 * (contrib + dang_each)) // 100 — all HUGEINT."""
    return f""",
    c{i} AS (
        SELECT e.dst AS n, SUM((r.r * e.w) // o.wsum) AS contrib
        FROM edges e
        JOIN r{i} r ON r.n = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst
    ),
    d{i} AS (
        SELECT COALESCE(SUM(r.r), 0) // (SELECT n_nodes FROM nn) AS de
        FROM r{i} r LEFT JOIN outw o ON o.src = r.n
        WHERE o.src IS NULL
    ),
    r{i + 1} AS MATERIALIZED (
        SELECT nodes.n,
               (SELECT (CAST({Q26_D_DEN - Q26_D_NUM} AS HUGEINT)
                        * {Q26_ONE})
                       // ({Q26_D_DEN} * n_nodes) FROM nn)
               + ({Q26_D_NUM} * (COALESCE(c.contrib, 0)
                                 + (SELECT de FROM d{i})))
                 // {Q26_D_DEN} AS r
        FROM nodes LEFT JOIN c{i} c ON c.n = nodes.n
    )"""


def _q26_oracle_sql(iters: int = Q26_ITERS) -> str:
    head = """
    WITH edges AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS HUGEINT) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY src, dst
    ),
    nodes AS MATERIALIZED (
        SELECT DISTINCT n FROM (
            SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_nodes FROM nodes),
    outw AS MATERIALIZED (
        SELECT src, CAST(SUM(w) AS HUGEINT) AS wsum FROM edges GROUP BY src
    ),
    r0 AS MATERIALIZED (
        SELECT n, (SELECT CAST({one} AS HUGEINT) // n_nodes FROM nn) AS r
        FROM nodes
    )""".format(one=Q26_ONE)
    body = "".join(_q26_iter_ctes(i) for i in range(iters))
    tail = f"""
    SELECT CAST(n AS BIGINT) AS nationkey,
           CAST(r AS BIGINT) AS rank_fp,
           CAST(r AS BIGINT) / {float(Q26_ONE)} AS pagerank
    FROM r{iters}"""
    return head + body + tail


@register(
    "q26_nation_pagerank",
    _q26_oracle_sql(),
    category="relational",
    doc=(
        "weighted PageRank over the nation trade graph (edge src = "
        "ordering customer's nation, dst = supplying nation, weight = "
        "lineitem count) — iterative relational training in the "
        f"v13/t31 discipline: {Q26_ITERS} rounds, each ONE distributed "
        "aggregation over the edge frame with the rank vector "
        "re-entering as literals (model-as-literal), N-row driver "
        "state. EVERY step is fixed-point integer arithmetic "
        "(rank*weight // out-weight per edge, damping as the exact "
        "85/100 rational, dangling mass split by integer division), "
        "so the unrolled HUGEINT oracle is bit-identical — no "
        "double-rounding site exists. 100 TB: the edge build is one "
        "corpus-scale groupBy (partial-agg combinable); per round one "
        "edge-frame scan + one node-sized exchange; driver state is "
        "O(nodes). Cited shape: the classic power-iteration PageRank "
        "(Page et al. 1999) with per-node out-weight normalization."
    ),
)
def q26_nation_pagerank(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    # the iterated frame: (src, dst, w, wsum) — graph-sized, persisted
    # once, scanned once per round (recomputable DISK_ONLY, r9 class)
    ew = edges.join(outw, "src").persist(StorageLevel.DISK_ONLY)
    # derive nodes and out-weights FROM the persisted frame: collecting
    # them from `edges`/`outw` re-ran the corpus-scale 4-way join once
    # per collect (3 full passes per call, profiled r13); ew is an inner
    # join of edges with its own src aggregate, so node set and (src,
    # wsum) pairs are identical by construction — one corpus pass total
    # ONE collect for node set + out-weights (r14; was two driver
    # round-trips over the cached frame): the distinct (src, dst, wsum)
    # triples are edge-count-bounded and carry both derivations —
    # nodes = src ∪ dst, out-weight pairs = distinct (src, wsum).
    ew_rows = ew.select("src", "dst", "wsum").distinct().collect()
    nodes = sorted({r.src for r in ew_rows} | {r.dst for r in ew_rows})
    n_nodes = len(nodes)
    if n_nodes == 0:
        # empty input slice: no edges → no nodes; return the empty
        # frame with the declared schema instead of dividing by zero
        # (ADVICE r11)
        ew.unpersist(blocking=False)
        return spark.createDataFrame(
            [], "nationkey long, rank_fp long, pagerank double"
        )
    outw_rows = sorted({(r.src, int(r.wsum)) for r in ew_rows})
    src_set = {s for s, _ in outw_rows}
    # per-edge product rank * w runs in LONG: rank <= Q26_ONE, so the
    # product stays below 2^63 iff every edge weight < 2^63 / Q26_ONE
    # (~9.2e9 lineitems per nation pair). Beyond that the contribution
    # column must widen to DECIMAL(38,0) — fail loudly instead of
    # wrapping silently (ADVICE r11; non-ANSI mode wraps).
    max_w = max((w for _, w in outw_rows), default=0)
    # explicit raise, not assert: asserts are stripped under python -O,
    # which would silently re-enable the wraparound (ADVICE r12)
    if max_w >= (2**63) // Q26_ONE:
        raise ValueError(
            f"q26: max out-weight {max_w} would overflow rank*w in LONG; "
            "widen the contribution arithmetic to DECIMAL(38,0)"
        )
    base = ((Q26_D_DEN - Q26_D_NUM) * Q26_ONE) // (Q26_D_DEN * n_nodes)
    ranks = {n: Q26_ONE // n_nodes for n in nodes}

    def rank_case_sql() -> str:
        whens = " ".join(
            f"WHEN src = {int(n)} THEN CAST({int(r)} AS BIGINT)"
            for n, r in ranks.items()
        )
        return f"(CASE {whens} END)"

    for _ in range(Q26_ITERS):
        contrib_rows = (
            ew.selectExpr(
                "dst", f"(({rank_case_sql()}) * w) div wsum AS c"
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
            .collect()
        )
        contrib = {r.dst: int(r.contrib) for r in contrib_rows}
        dang = sum(r for n, r in ranks.items() if n not in src_set)
        dang_each = dang // n_nodes
        ranks = {
            n: base
            + (Q26_D_NUM * (contrib.get(n, 0) + dang_each)) // Q26_D_DEN
            for n in nodes
        }
    out = ew.select(F.col("src").alias("n")).unionByName(
        ew.select(F.col("dst").alias("n"))
    ).distinct()
    expr = None
    for n in nodes:
        w = F.when(F.col("n") == int(n), F.lit(int(ranks[n])))
        expr = w if expr is None else expr.when(
            F.col("n") == int(n), F.lit(int(ranks[n]))
        )
    # janitor lifetime for ew (the d18/q25 r11 measurement): in-op
    # eager release forfeits identical-plan cache reuse across
    # invocations; the session janitor reclaims the blocks.
    return out.select(
        F.col("n").cast("long").alias("nationkey"),
        expr.cast("long").alias("rank_fp"),
        (expr.cast("long") / F.lit(float(Q26_ONE))).alias("pagerank"),
    )


def pagerank_broadcast(spark, edges, iters: int = Q26_ITERS):
    """q26's web-scale rank path (VERDICT r11 item 5): ranks live in a
    node-sized DataFrame that JOINS onto the edge frame each round —
    never a literal CASE over nodes, so the node set can be millions.

    Bit-equal to the q26 literal path by construction: the same
    fixed-point arithmetic ((r*w) div wsum per edge, dangling mass via
    anti-join, damping as the exact 85/100 rational), just with the
    rank vector as a broadcast-joined frame instead of driver state.
    Each round: ONE edge-frame scan (rank join + contribution agg), one
    node-sized anti-join for dangling mass, one node-sized rebuild; the
    new rank frame is localCheckpoint'ed (node-sized) so lineage stays
    flat across rounds. At true web scale drop the F.broadcast hint and
    let AQE pick the shuffle join; everything else is unchanged.

    ``edges``: (src, dst, w) frame. Returns (nationkey, rank_fp,
    pagerank) — q26's exact output schema.
    """
    outw = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    ew = edges.join(outw, "src").persist(StorageLevel.DISK_ONLY)
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
        .persist(StorageLevel.DISK_ONLY)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        ew.unpersist(blocking=False)
        nodes.unpersist(blocking=False)
        return spark.createDataFrame(
            [], "nationkey long, rank_fp long, pagerank double"
        )
    # the per-edge product r * w runs in LONG exactly like the literal
    # path; on the large graphs this path targets, non-ANSI mode wraps
    # silently — same loud bound check as q26 (ADVICE r12), one scalar
    # aggregate of metadata scale
    max_w = int(ew.agg(F.max("wsum")).first()[0] or 0)
    if max_w >= (2**63) // Q26_ONE:
        raise ValueError(
            f"pagerank_broadcast: max out-weight {max_w} would overflow "
            "rank*w in LONG; widen the contribution arithmetic to "
            "DECIMAL(38,0)"
        )
    base = ((Q26_D_DEN - Q26_D_NUM) * Q26_ONE) // (Q26_D_DEN * n_nodes)
    ranks = nodes.select(
        "n", F.lit(Q26_ONE // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            ew.join(F.broadcast(ranks), ew["src"] == ranks["n"])
            .selectExpr("dst", "(r * w) div wsum AS c")
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dang = (
            ranks.join(outw, ranks["n"] == outw["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("ds"))
            .selectExpr(f"ds div {n_nodes} AS de")
        )
        ranks = (
            nodes.join(contrib, nodes["n"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "n",
                (
                    F.lit(base)
                    + F.expr(
                        f"({Q26_D_NUM} * (coalesce(contrib, CAST(0 AS BIGINT))"
                        f" + de)) div {Q26_D_DEN}"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    out = ranks.select(
        F.col("n").cast("long").alias("nationkey"),
        F.col("r").alias("rank_fp"),
        (F.col("r") / F.lit(float(Q26_ONE))).alias("pagerank"),
    )
    ew.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return out


# ---------------------------------------------------------------------------
# t33: CART decision stump with exact integer Gini argmax
# ---------------------------------------------------------------------------

#: score scale: score_fp = (SCALE * cross-multiplied Gini numerator)
#: // (n_L * n_R). Truncating division is identical in Spark (`div`)
#: and DuckDB (`//`) for the non-negative operands here.
T33_SCALE = 10**12


def t33_score_fp_sql() -> str:
    """The exact integer Gini score as ONE SQL expression over the
    cumulative columns (nl, c1l, n, c1t).

    Every operand is cast to DECIMAL(38,0) BEFORE any product is formed
    (ADVICE r11): the numerator is ~n^3/4, which silently wraps LONG
    (non-ANSI) once a feature exceeds ~2e6 rows, while the DuckDB
    oracle computes the same product in HUGEINT. Decimal-first
    arithmetic mirrors HUGEINT exactly up to 38 digits (n ≲ 2e12 rows
    per feature); `div` on decimals truncates like DuckDB `//` and
    returns BIGINT, matching the oracle's final CAST."""
    d = "CAST({} AS DECIMAL(38,0))"
    nl, c1l, n, c1t = (d.format(c) for c in ("nl", "c1l", "n", "c1t"))
    return (
        f"(CAST({T33_SCALE} AS DECIMAL(38,0))"
        f" * (({n} - {nl}) * (({nl} - {c1l}) * ({nl} - {c1l})"
        f"                    + {c1l} * {c1l})"
        f"    + {nl} * ((({n} - {nl}) - ({c1t} - {c1l}))"
        f"              * (({n} - {nl}) - ({c1t} - {c1l}))"
        f"              + ({c1t} - {c1l}) * ({c1t} - {c1l}))))"
        f" div ({nl} * ({n} - {nl})) AS score_fp"
    )


#: The feat -> long_f -> per_val -> cum CTE chain, shared VERBATIM by
#: t33's oracle and t34's (wave13) so the two split searches can never
#: silently desynchronize on the feature definitions (ADVICE r12).
T33_CUM_CTES = """feat AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS y,
               n_chars,
               len(list_filter(regexp_split_to_array(lower(text),
                   '[^a-z]+'), x -> x <> '')) AS n_tok,
               length(text) - length(regexp_replace(text, '[.,!?;:]',
                   '', 'g')) AS n_punct
        FROM documents
    ),
    long_f AS (
        SELECT doc_id, y, 'n_chars' AS feature, n_chars AS x FROM feat
        UNION ALL
        SELECT doc_id, y, 'n_tok', n_tok FROM feat
        UNION ALL
        SELECT doc_id, y, 'n_punct', n_punct FROM feat
    ),
    per_val AS (
        SELECT feature, x, CAST(COUNT(*) AS HUGEINT) AS cnt,
               CAST(SUM(y) AS HUGEINT) AS c1
        FROM long_f GROUP BY feature, x
    ),
    cum AS (
        SELECT feature, x,
               SUM(cnt) OVER (PARTITION BY feature ORDER BY x) AS nl,
               SUM(c1) OVER (PARTITION BY feature ORDER BY x) AS c1l,
               SUM(cnt) OVER (PARTITION BY feature) AS n,
               SUM(c1) OVER (PARTITION BY feature) AS c1t
        FROM per_val
    )"""

_T33_ORACLE = f"""
    WITH {T33_CUM_CTES},
    scored AS (
        SELECT feature, x AS threshold,
               ({T33_SCALE} * ((n - nl) * ((nl - c1l) * (nl - c1l)
                                           + c1l * c1l)
                 + nl * (((n - nl) - (c1t - c1l)) * ((n - nl) - (c1t - c1l))
                         + (c1t - c1l) * (c1t - c1l))))
               // (nl * (n - nl)) AS score_fp,
               nl, c1l, n, c1t
        FROM cum WHERE nl > 0 AND nl < n
    ),
    best AS (
        SELECT * FROM scored
        ORDER BY score_fp DESC, feature ASC, threshold ASC LIMIT 1
    )
    SELECT f.doc_id,
           b.feature,
           CAST(b.threshold AS BIGINT) AS threshold,
           CAST(b.score_fp AS BIGINT) AS score_fp,
           CAST(CASE WHEN (CASE b.feature
                           WHEN 'n_chars' THEN f.n_chars
                           WHEN 'n_tok' THEN f.n_tok
                           ELSE f.n_punct END) <= b.threshold
                THEN CASE WHEN 2 * b.c1l > b.nl THEN 1 ELSE 0 END
                ELSE CASE WHEN 2 * (b.c1t - b.c1l) > (b.n - b.nl)
                          THEN 1 ELSE 0 END
                END AS BIGINT) AS predicted,
           CAST(f.y AS BIGINT) AS label
    FROM feat f, best b
"""


def _t33_features(df):
    """Per-doc integer features + the content label (text mentions
    'spark') — all BIGINT, so the split search needs no rounding."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != F.lit("")
    )
    return df.select(
        "doc_id",
        F.when(F.col("text").contains("spark"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tok"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[.,!?;:]", ""))
        )
        .cast("long")
        .alias("n_punct"),
    )


@register(
    "t33_decision_stump",
    _T33_ORACLE,
    category="text",
    doc=(
        "CART decision-stump training (Breiman et al.'s tree root "
        "split) over integer document features with an EXACT integer "
        "Gini argmax: for every (feature, threshold) the weighted "
        "Gini comparison is cross-multiplied to the common denominator "
        "n_L*n_R and scaled by 10^12 under truncating division — no "
        "float enters the split search, so the FULL threshold scan "
        "hash-matches the DuckDB oracle. The scan itself is one "
        "per-(feature, value) count + a cumulative window (the "
        "histogram-based split search every distributed GBDT uses — "
        "XGBoost/LightGBM's approx mode); the chosen stump returns as "
        "ONE row and predictions are a narrow literal map. 100 TB: "
        "per-value histograms are partial-agg combinable; the window "
        "runs over distinct values per feature (bounded), never rows; "
        "prediction is shuffle-free."
    ),
)
def t33_decision_stump(spark, sf_dir):
    feat = _t33_features(
        load_table(spark, sf_dir, "documents")
    ).persist(StorageLevel.DISK_ONLY)
    long_f = None
    for fname in ("n_chars", "n_tok", "n_punct"):
        part = feat.select(
            "doc_id", "y", F.lit(fname).alias("feature"),
            F.col(fname).alias("x"),
        )
        long_f = part if long_f is None else long_f.unionByName(part)
    per_val = long_f.groupBy("feature", "x").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("c1")
    )
    from pyspark.sql import Window as W

    wcum = W.partitionBy("feature").orderBy("x")
    wall = W.partitionBy("feature")
    cum = per_val.select(
        "feature",
        "x",
        F.sum("cnt").over(wcum).alias("nl"),
        F.sum("c1").over(wcum).alias("c1l"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum("c1").over(wall).alias("c1t"),
    )
    scored = cum.filter(
        (F.col("nl") > 0) & (F.col("nl") < F.col("n"))
    ).selectExpr(
        "feature",
        "x AS threshold",
        t33_score_fp_sql(),
        "nl",
        "c1l",
        "n",
        "c1t",
    )
    best = (
        scored.orderBy(
            F.col("score_fp").desc(),
            F.col("feature").asc(),
            F.col("threshold").asc(),
        )
        .limit(1)
        .collect()[0]
    )
    left_label = 1 if 2 * int(best.c1l) > int(best.nl) else 0
    right_label = (
        1
        if 2 * (int(best.c1t) - int(best.c1l)) > (int(best.n) - int(best.nl))
        else 0
    )
    fx = F.col(best.feature)
    # janitor lifetime for feat (see q26 note)
    return feat.select(
        "doc_id",
        F.lit(best.feature).alias("feature"),
        F.lit(int(best.threshold)).cast("long").alias("threshold"),
        F.lit(int(best.score_fp)).cast("long").alias("score_fp"),
        F.when(fx <= int(best.threshold), F.lit(left_label))
        .otherwise(F.lit(right_label))
        .cast("long")
        .alias("predicted"),
        F.col("y").alias("label"),
    )


# ---------------------------------------------------------------------------
# d19: edit-distance similarity self-join via deletion neighborhoods
# ---------------------------------------------------------------------------

_D19_ORACLE = """
    WITH names AS (SELECT DISTINCT c_name AS w FROM customer),
    dels AS (
        SELECT w, w AS var FROM names
        UNION ALL
        SELECT w, substr(w, 1, CAST(i AS INTEGER) - 1)
                  || substr(w, CAST(i AS INTEGER) + 1) AS var
        FROM names, UNNEST(range(1, length(w) + 1)) AS u(i)
    ),
    cand AS (
        SELECT DISTINCT a.w AS w1, b.w AS w2
        FROM dels a JOIN dels b ON a.var = b.var AND a.w < b.w
    ),
    pairs AS (SELECT w1, w2 FROM cand WHERE levenshtein(w1, w2) <= 1),
    sym AS (
        SELECT w1 AS w, w2 AS nbr FROM pairs
        UNION ALL SELECT w2, w1 FROM pairs
    ),
    agg AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               MIN(nbr) AS nearest
        FROM sym GROUP BY w
    )
    SELECT n.w AS name, COALESCE(a.n_neighbors, 0) AS n_neighbors,
           a.nearest
    FROM names n LEFT JOIN agg a USING (w)
"""


@register(
    "d19_symspell_typo_pairs",
    _D19_ORACLE,
    category="llm-dedup",
    doc=(
        "edit-distance-1 similarity SELF-JOIN via deletion-neighborhood "
        "blocking (FastSS, Bocek et al. 2007 / SymSpell): every name "
        "expands to itself plus its |w| one-character deletions, "
        "candidates are the names sharing any variant (ONE equi-join — "
        "never the O(n^2) pair scan), and the exact levenshtein(<=1) "
        "verify prunes the ed-2 false positives the blocking admits "
        "(e.g. 'ab'/'ba' share variants but ed=2). Deletion blocking "
        "is COMPLETE for ed<=1: any insert/delete/substitute pair "
        "shares a deletion variant. Output: per-name neighbor count + "
        "lexicographic-min neighbor (bounded by distinct names at any "
        "scale; zeros kept). 100 TB shape: the variant explode is "
        "|w|x linear, the equi-join shuffles on variant strings whose "
        "groups are near-name-sized by construction, verification is "
        "a per-pair scalar — the standard fuzzy entity-matching plan. "
        "Spark levenshtein == DuckDB levenshtein (unit-cost ints), so "
        "the oracle is exact."
    ),
)
def d19_symspell_typo_pairs(spark, sf_dir):
    names = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("w"))
        .distinct()
    )
    dels = names.select(
        "w",
        F.explode(
            F.concat(
                F.array(F.col("w")),
                F.expr(
                    "transform(sequence(1, length(w)), i -> "
                    "concat(substring(w, 1, i - 1), "
                    "substring(w, i + 1, length(w))))"
                ),
            )
        ).alias("var"),
    )
    cand = (
        dels.alias("a")
        .join(
            dels.alias("b"),
            (F.col("a.var") == F.col("b.var"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .distinct()
    )
    pairs = cand.filter(F.levenshtein("w1", "w2") <= 1)
    sym = pairs.select(
        F.col("w1").alias("w"), F.col("w2").alias("nbr")
    ).unionByName(
        pairs.select(F.col("w2").alias("w"), F.col("w1").alias("nbr"))
    )
    agg = sym.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_neighbors"), F.min("nbr").alias("nearest")
    )
    return names.join(agg, "w", "left").select(
        F.col("w").alias("name"),
        F.coalesce("n_neighbors", F.lit(0)).cast("long").alias("n_neighbors"),
        "nearest",
    )
