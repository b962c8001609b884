"""Distributed connected components over duplicate-candidate pairs —
the clustering step that turns pairwise near-dup evidence (MinHash / LSH
/ exact-Jaccard pairs) into keep-one-representative decisions, as every
web-scale dedup pipeline must before dropping documents.

Algorithm: alternating neighbor-min label propagation + pointer jumping
(label <- label(label)), the DataFrame rendering of the classic
MapReduce connected-components constructions (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Neighbor-min
alone needs O(diameter) rounds; the pointer-jump step halves the
remaining label-chain depth each round, giving O(log d) rounds overall.
Every per-round step is a keyed equi-join or a two-phase MIN aggregate —
no collect of node/edge data; the only driver-side values are the
per-round changed-label counts (scalar aggregates, metadata-scale
control flow exactly like AQE's own runtime statistics).

Scale shape (100 TB corpus, billions of edges):
- each round shuffles keyed on node/label ids (uniform by construction);
  the MIN aggregate is two-phase, so a giant component's label never
  funnels through one task at the aggregate,
- the pointer-jump join is probe-side row skew (many nodes sharing one
  hot label) — AQE skew-join splitting territory, not a key-explosion,
- ``localCheckpoint`` truncates lineage each round so plan size stays
  O(1) in rounds (on a cluster: ``checkpoint`` to durable storage, same
  call shape),
- dedup-candidate graphs are unions of near-cliques (LSH buckets), so
  observed round counts are 1-3; the O(log d) bound covers adversarial
  chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """Return (node, component) where ``component`` is the minimum node
    id reachable from ``node`` over the undirected edge set.

    Converges to the exact fixpoint (checked per round; raises if
    ``max_rounds`` is hit first — 25 pointer-jumping rounds covers any
    graph up to diameter ~2^25)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize in ONE pass over the candidate-pair subtree (r14, guide
    # §2.4): the union form referenced ``e`` twice, so the (expensive)
    # pair generator upstream ran twice before the checkpoint could
    # materialize — profiled as two full 2.8 MB candidate-join jobs per
    # d23 call. Exploding both directions from each row is the same
    # multiset, and the same distinct, with the generator run once.
    sym = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
    )
    # lazy truncation (the bpe_train discipline): the checkpoint
    # materializes inside the first round's convergence count instead of
    # paying a separate eager job — halves the per-round job count
    # (profiled ~1 s/round of pure scheduling overhead at test scale)
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    for _ in range(max_rounds):
        # 1. neighbor-min MERGED with the self-label (r14, guide §2.4):
        # augmenting the edge set with one flagged self-edge per node
        # makes min(label over neighbors ∪ self) the stepped label
        # directly — ONE keyed join + one two-phase MIN per round where
        # the previous shape needed a neighbor-min join/agg AND a
        # node-keyed left join to fold the old label back in. The self
        # row also carries the pre-round label out of the aggregation
        # ("_old", exactly one self row per node), so the convergence
        # check still needs no extra join.
        aug = sym.withColumn("_s", F.lit(1)).union(
            labels.select(
                F.col("node").alias("a"),
                F.col("node").alias("b"),
                F.lit(0).alias("_s"),
            )
        )
        stepped = (
            aug.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("_bl")),
                "b",
            )
            .groupBy("a")
            .agg(
                F.min("_bl").alias("label"),
                F.max(F.when(F.col("_s") == 0, F.col("_bl"))).alias("_old"),
            )
            .select(F.col("a").alias("node"), "label", "_old")
        )
        # 2. pointer jump: label <- label(label), halving chain depth
        jumped = (
            stepped.join(
                stepped.select(F.col("node").alias("_ln"), F.col("label").alias("_ll")),
                stepped["label"] == F.col("_ln"),
                "left",
            )
            .select("node", "_old", F.coalesce("_ll", "label").alias("label"))
            .localCheckpoint(eager=False)
        )
        # the count materializes the lazy checkpoint (one job per round,
        # not two); next round's joins read the truncated RDD
        changed = jumped.filter(F.col("_old") != F.col("label")).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")


def duplicate_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every document to a duplicate cluster: paired docs get the
    min doc id of their connected component, unpaired docs are their own
    singleton. Returns (id, component_id, n_members, keep) — ``keep``
    marks the one representative (min id) per cluster, i.e. the rows a
    dedup pass retains."""
    # NOTE (ADVICE r13): connected_components' per-round lazy
    # localCheckpoint is materialized BY its own convergence count —
    # consumers must not insert an action on the returned frame's
    # lineage between rounds, or the untruncated plan is recomputed.
    comp = connected_components(pairs, "id_a", "id_b")
    assigned = docs.select(F.col(id_col)).join(
        comp.select(F.col("node").alias(id_col), "component"), id_col, "left"
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("component_id"),
    )
    sizes = assigned.groupBy("component_id").agg(
        F.count("*").alias("n_members")
    )
    return assigned.join(sizes, "component_id").select(
        id_col,
        "component_id",
        "n_members",
        (F.col(id_col) == F.col("component_id")).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# declared queries
# ---------------------------------------------------------------------------

# The oracle computes the same fixpoint by recursive reachability: walk
# enumerates every label reachable from each node (UNION-distinct bounds
# it at component_size^2 rows — fine at oracle scale), min over the
# reachable set is the component id.
_D10_ORACLE = """
WITH RECURSIVE t AS (
    SELECT doc_id, lang, n_chars,
           list_distinct([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS grams
    FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents)
    WHERE len(w) >= 2
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM t a JOIN t b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND b.n_chars BETWEEN a.n_chars - 2 AND a.n_chars + 2
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.2
),
edges AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
    SELECT DISTINCT a, a FROM edges
    UNION
    SELECT e.a, w.label FROM edges e JOIN walk w ON e.b = w.node
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
assigned AS (
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, component_id,
       CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS n_members,
       CAST(doc_id = component_id AS INT) AS keep
FROM assigned
"""


@register(
    "d10_duplicate_clusters",
    _D10_ORACLE,
    category="llm-dedup",
    doc=(
        "connected-components duplicate clustering: exact bigram-Jaccard "
        "pairs (d03's blocked generator, threshold 0.2) collapsed into "
        "clusters by min-label propagation with pointer jumping; every "
        "document gets (component_id, n_members, keep) where keep marks "
        "the min-id representative a dedup pass would retain. Iterative "
        "joins + two-phase MIN per round, lineage truncated per round; "
        "oracle is the recursive-CTE reachability fixpoint."
    ),
)
def d10_duplicate_clusters(spark, sf_dir):
    from .dedup import d03_ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = d03_ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return duplicate_clusters(d, pairs, "doc_id")
