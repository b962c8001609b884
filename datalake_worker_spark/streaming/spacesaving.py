"""st20: streaming SpaceSaving heavy hitters — bounded-state top-k
over an unbounded token stream (VERDICT r8 item 7: the streaming
counterpart that pairs st16's windowed trending rank with a16's batch
CMS audit).

SpaceSaving (Metwally, Agrawal & El Abbadi, ICDT'05) keeps m counters;
every estimate OVERcounts (est >= true) and any item with true count
above the sketch's floor is guaranteed tracked. This implementation
uses the MERGEABLE formulation (Agarwal et al., "Mergeable Summaries",
PODS'12): a summary is (top-m exact-or-estimated counts, floor), where
``floor`` bounds the count of every UNtracked item. Merging summary S1
and S2:

    est(k) = est_1(k) + est_2(k)        (absent side contributes its
                                         floor — the overestimate rule)
    keep the top m by (est desc, token asc); the new floor is
    max(largest dropped est, floor_1 + floor_2).

Invariants (maintained inductively, asserted by the APPROX check):
  I1  est(k) >= true(k) for every tracked k;
  I2  est(k) -  true(k) <= floor;
  I3  true(k) <= floor for every untracked k   (so any token with
      true > floor is guaranteed reported — the heavy-hitter contract).

Spark shape: real Structured Streaming (file source, one micro-batch
per landing file, foreachBatch). Per batch the DISTRIBUTED work is one
token-count groupBy + a bounded top-m sort-limit; the per-batch summary
(m rows + a floor — model state, ~KBs) merges driver-side with the
previous epoch's summary and lands as an epoch-keyed JSON written via
os.replace, so at-least-once replays are idempotent (last write per
epoch wins) and a resumed stream reads the newest epoch STRICTLY below
the current one (the st13 replay lesson). State is O(m) forever —
per-batch cost never grows with history, the SpaceSaving point.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens
from ..registry import register
from ..scratch import scratch_dir
from ..sources import load_table
from .incdedup import stage_batches

#: number of counters — the sketch's entire state, regardless of volume
DEFAULT_M = 256


def _batch_summary(df: DataFrame, text_col: str, m: int) -> tuple[dict, int]:
    """(top-m exact token counts, floor) for ONE micro-batch.

    The groupBy is exact and distributed; only m rows come back. Tokens
    outside the top m have true batch count <= the m-th count, which
    becomes the batch summary's floor (0 when the batch vocabulary fits
    entirely in m — then the summary is exact).
    """
    counts = (
        df.select(F.explode(whitespace_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    # m+1 rows: the (m+1)-th largest count (if any) is the tail bound
    rows = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(
        m + 1
    ).collect()
    top = {r.tok: int(r.c) for r in rows[:m]}
    floor = int(rows[m].c) if len(rows) > m else 0
    return top, floor


def merge_summaries(
    s1: tuple[dict, int], s2: tuple[dict, int], m: int
) -> tuple[dict, int]:
    """The PODS'12 mergeable-summaries SpaceSaving merge (pure, tested
    directly): absent side contributes its floor, keep top m, dropped
    mass and the floor sum both lower-bound the new floor."""
    t1, f1 = s1
    t2, f2 = s2
    est = {
        k: t1.get(k, f1) + t2.get(k, f2) for k in set(t1) | set(t2)
    }
    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(ranked[:m])
    dropped_max = ranked[m][1] if len(ranked) > m else 0
    return kept, max(dropped_max, f1 + f2)


def _state_path(root: str, epoch: int) -> str:
    return os.path.join(root, f"state_{epoch:06d}.json")


def _read_latest_state(root: str, before_epoch: int) -> tuple[dict, int]:
    """Newest committed summary with epoch STRICTLY below the current
    batch — an at-least-once replay of epoch e must not fold e's own
    (overwritten) state into itself (the st13 self-match lesson)."""
    best = None
    for f in os.listdir(root):
        if f.startswith("state_") and f.endswith(".json"):
            e = int(f[len("state_"):-len(".json")])
            if e < before_epoch and (best is None or e > best):
                best = e
    if best is None:
        return {}, 0
    with open(_state_path(root, best)) as fh:
        rec = json.load(fh)
    return rec["top"], int(rec["floor"])


def run_spacesaving_topk(
    spark: SparkSession,
    batches: list[DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DEFAULT_M,
    root: str | None = None,
) -> tuple[dict, int, str]:
    """Stream ``batches`` (one micro-batch each) through the sketch;
    returns (final top map, final floor, state root)."""
    root = root or scratch_dir(prefix="dlw_spacesaving_")
    landing = stage_batches(
        root,
        batches,
        [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")],
    )

    def fold_batch(df: DataFrame, epoch_id: int) -> None:
        import time as _time

        t0 = _time.perf_counter()
        e = int(epoch_id)
        batch = _batch_summary(df, "text", m)
        state = _read_latest_state(root, e)
        top, floor = merge_summaries(state, batch, m)
        tmp = _state_path(root, e) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"epoch": e, "top": top, "floor": floor}, fh)
        os.replace(tmp, _state_path(root, e))
        # prune: epoch e's summary folds everything before it, so only
        # e and e-1 (replay safety: a re-run of epoch e must still find
        # a strictly-earlier committed state) need to exist — without
        # this the directory and the listdir scan above grow with
        # stream history, contradicting the O(m)-state contract
        # (ADVICE r9).
        for f in os.listdir(root):
            if f.startswith("state_") and f.endswith(".json"):
                old = int(f[len("state_"):-len(".json")])
                if old < e - 1:
                    os.remove(os.path.join(root, f))
        # per-batch latency trace (same contract as incdedup/vecindex:
        # the scale probe asserts per-batch cost stays flat as state
        # accumulates — here state is O(m) by construction). Appends
        # are NOT idempotent under at-least-once replay; every reader
        # must keep the LAST line per epoch (tools_scale_probe.py's
        # per_batch does — ADVICE r9).
        with open(os.path.join(root, "_batch_seconds.jsonl"), "a") as fh:
            fh.write(
                json.dumps(
                    {"epoch": e,
                     "seconds": round(_time.perf_counter() - t0, 3)}
                )
                + "\n"
            )

    schema = spark.read.parquet(landing).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
        .writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    top, floor = _read_latest_state(root, 10**9)
    return top, floor, root


@register(
    "st20_spacesaving_topk",
    None,  # sketch-family policy: estimates are summary-dependent; the
    # APPROX check pins overestimation + the floor error bound + the
    # guaranteed-coverage contract vs exact corpus counts
    category="streaming",
    doc=(
        "streaming SpaceSaving heavy hitters (Metwally et al. ICDT'05, "
        "merged per Agarwal et al. PODS'12): the documents table "
        "replays as four micro-batches through foreachBatch; state is "
        "m=256 counters + a floor FOREVER (vs st16, whose state is the "
        "maintained windowed aggregate, and a16, whose CMS answers "
        "point queries but cannot enumerate the heavy set). Per batch: "
        "one exact distributed token groupBy + a bounded top-(m+1) "
        "sort-limit; the m-row summary merges driver-side (model-state "
        "scale) and commits as an epoch-keyed JSON via os.replace — "
        "at-least-once replays idempotent, resumed streams read "
        "strictly-earlier epochs. Output: final top-20 by estimate "
        "with the floor (= max error, I2) attached. Guarantees pinned "
        "by APPROX check: est >= true (I1), est - true <= floor (I2), "
        "every token with true > floor reported (I3)."
    ),
)
def st20_spacesaving_topk(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batches = [d.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    top, floor, _ = run_spacesaving_topk(spark, batches)
    ranked = sorted(top.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return spark.createDataFrame(
        [
            (i + 1, tok, int(est), int(floor))
            for i, (tok, est) in enumerate(ranked)
        ],
        "rn long, tok string, est long, floor long",
    )
