#!/usr/bin/env python
"""Machine-checked secondary signals for the rows-only (no-oracle)
registry queries — VERDICT r6 item 5.

Each declared-approximate operator gets a numeric differential signal
computed against an EXACT brute-force re-derivation (pandas/numpy over
sf0.001, where all-pairs is affordable) or an exact Spark/DuckDB
counterpart, recorded per round in APPROX_CHECKS_r{N}.json so the
correctness story for these ops is a repo artifact, not only pytest.

    python tools_approx_checks.py [round_number]

Signals (op -> what is checked):
  a08  approx distinct/percentiles vs exact DuckDB, rel-error bound
  a11  HLL per-lang + ALL vs exact count_distinct, same tokenizer
  d04  LSH pair recall/precision vs exact all-pairs word-3-gram Jaccard
  d05  identical texts -> identical SimHash; mean random-pair separation
  d08  banded-pair recall vs exact all-pairs Hamming<=8 over d05 output
  d11  every dropped doc has cosine>=0.97 to a kept same-cluster doc
  d13  kept-pair violations vs exact Jaccard (LSH misses), dropped-doc support
  d14  zero Bloom false negatives vs exact gram containment; FP doc rate
  m06  per-distance pair counts EQUAL exact brute force (7-band guarantee)
  t05  fingerprint determinism across two runs; distinct-text collisions
  v02/v04/v09  recall@5 vs v01 exact top-k
  v08  per-subspace RMSE beats the 1-centroid (mean) baseline
  st13 admission precision / rejection recall vs exact Jaccard to history
  st14 probe recall@5 vs exact brute-force cosine over the full corpus
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("APPROX_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------- helpers
def _shingles(text: str, n: int = 3) -> set[str]:
    """Python mirror of dedup.shingles_from_words: split on single
    space, word n-grams joined by space, whole text if < n words."""
    w = text.split(" ")
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def _popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    v = x.copy().view(np.uint64)
    out = np.zeros(v.shape, dtype=np.int64)
    for _ in range(64):
        out += (v & 1).astype(np.int64)
        v >>= np.uint64(1)
    return out


def _docs(spark):
    from datalake_worker_spark.sources import load_table

    rows = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    return {int(r.doc_id): r.text for r in rows}


def _embeddings(spark):
    from datalake_worker_spark.functions.similarity import to_double_array
    from datalake_worker_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", to_double_array(F.col("embedding")).alias("v"))
        .collect()
    )
    ids = np.array([int(r.vec_id) for r in rows])
    mat = np.array([list(map(float, r.v)) for r in rows])
    return ids, mat


def _run(spark, name):
    from datalake_worker_spark import registry

    return registry.REGISTRY[name].spark_fn(spark, SF_DIR)


# ---------------------------------------------------------------- checks
def check_a08(spark, duck):
    ap = {r.l_returnflag: r for r in _run(spark, "a08_approx_aggregates").collect()}
    ex = {
        r[0]: r
        for r in duck.execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey),"
            " MEDIAN(l_extendedprice),"
            " QUANTILE_CONT(l_extendedprice, 0.25),"
            " QUANTILE_CONT(l_extendedprice, 0.75)"
            " FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    errs = []
    for flag, r in ap.items():
        e = ex[flag]
        errs += [
            abs(r.approx_parts - e[1]) / e[1],
            abs(r.approx_median_price - float(e[2])) / float(e[2]),
            abs(r.approx_p25 - float(e[3])) / float(e[3]),
            abs(r.approx_p75 - float(e[4])) / float(e[4]),
        ]
    worst = max(errs)
    return {"signal": "max rel-error vs exact (distinct + 3 quantiles, per flag)",
            "value": round(worst, 4), "bound": 0.05, "pass": worst <= 0.05}


def check_a11(spark):
    from datalake_worker_spark.functions.text import whitespace_tokens
    from datalake_worker_spark.sources import load_table
    from pyspark.sql import functions as F

    ap = {r.lang: float(r.approx_distinct_tokens)
          for r in _run(spark, "a11_hll_distinct_rollup").collect()}
    toks = load_table(spark, SF_DIR, "documents").select(
        "lang", F.explode(whitespace_tokens("text")).alias("tok")
    )
    ex = {r.lang: int(r.n) for r in
          toks.groupBy("lang").agg(F.count_distinct("tok").alias("n")).collect()}
    ex["ALL"] = toks.agg(F.count_distinct("tok").alias("n")).collect()[0].n
    errs = [abs(ap[k] - ex.get(k, 0)) / max(ex.get(k, 1), 1) for k in ap]
    worst = max(errs)
    return {"signal": "max rel-error vs exact count_distinct (same tokenizer)",
            "value": round(worst, 4), "bound": 0.05, "pass": worst <= 0.05}


def _exact_near_pairs(docs: dict[int, str], threshold: float):
    """All-pairs exact word-3-gram SHINGLE Jaccard over one min-id
    representative per distinct text — the set the minhash estimates AND
    (since r7) the set the operator's verify step recomputes."""
    rep: dict[str, int] = {}
    for did in sorted(docs):
        rep.setdefault(docs[did], did)
    items = [(did, _shingles(text)) for text, did in rep.items()]
    truth = {}
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (ia, sa), (ib, sb) = items[i], items[j]
            jac = _jaccard(sa, sb)
            if jac >= threshold:
                truth[(min(ia, ib), max(ia, ib))] = jac
    return truth


def check_d04(spark):
    docs = _docs(spark)
    truth = _exact_near_pairs(docs, 0.6)
    got = {(int(r.id_a), int(r.id_b)): float(r.jaccard)
           for r in _run(spark, "d04_minhash_near_dups").collect()}
    recall = len(set(got) & set(truth)) / len(truth) if truth else 1.0
    bad = [p for p, j in got.items()
           if abs(j - _jaccard(_shingles(docs[p[0]]),
                               _shingles(docs[p[1]]))) > 1e-6]
    return {"signal": "LSH pair recall vs exact all-pairs shingle Jaccard>=0.6; "
                      "reported jaccard exact-recomputed",
            "value": round(recall, 4), "bound": 0.9,
            "pass": recall >= 0.9 and not bad,
            "detail": {"true_pairs": len(truth), "reported": len(got),
                       "jaccard_mismatches": len(bad)}}


def check_d05(spark):
    docs = _docs(spark)
    fp = {int(r.doc_id): int(r.simhash)
          for r in _run(spark, "d05_simhash_fingerprints").collect()}
    by_text: dict[str, list[int]] = {}
    for did, text in docs.items():
        by_text.setdefault(text, []).append(did)
    dup_groups = [g for g in by_text.values() if len(g) > 1]
    ident_ok = all(len({fp[d] for d in g}) == 1 for g in dup_groups)
    vals = np.array(list(fp.values()), dtype=np.int64).view(np.uint64)
    ham = _popcount64(vals[:200, None] ^ vals[None, :200])
    mean_sep = float(ham[np.triu_indices(len(ham), 1)].mean())
    return {"signal": "identical texts share a fingerprint; mean random-pair "
                      "Hamming separation >> near-dup radius 8",
            "value": round(mean_sep, 2), "bound": 16.0,
            "pass": ident_ok and mean_sep >= 16.0,
            "detail": {"identical_text_groups": len(dup_groups),
                       "identical_fp_ok": ident_ok}}


def check_d08(spark):
    fp = {int(r.doc_id): int(r.simhash)
          for r in _run(spark, "d05_simhash_fingerprints").collect()}
    ids = sorted(fp)
    vals = np.array([fp[i] for i in ids], dtype=np.int64).view(np.uint64)
    ham = _popcount64(vals[:, None] ^ vals[None, :])
    iu = np.triu_indices(len(ids), 1)
    truth = {(ids[a], ids[b]): int(h)
             for a, b, h in zip(iu[0], iu[1], ham[iu]) if h <= 8}
    got = {(int(r.id_a), int(r.id_b)): int(r.hamming)
           for r in _run(spark, "d08_simhash_near_dups").collect()}
    # r8: 9 uneven blocks over 64 bits — a pair within Hamming <= 8
    # differs in fewer bits than there are blocks, so some block matches
    # exactly and the equi-join surfaces it.  Recall at the advertised
    # radius is pigeonhole-GUARANTEED 1.0 (was 0.41 under the old 4x16
    # banding) — CONDITIONED on no (band, value) bucket exceeding the
    # operator's bucket_cap=4096 skew guard (review r8): a capped hot
    # bucket legitimately trades recall for bounded memory.  The check
    # measures the max bucket occupancy so the gate states which regime
    # it verified.
    widths = [8] + [7] * 8
    offsets = np.cumsum([0] + widths[:-1])
    cap = 4096
    band_vals = [
        ((vals >> np.uint64(off)) & np.uint64((1 << wd) - 1)).astype(np.int64)
        for off, wd in zip(offsets, widths)
    ]
    band_occ = [np.bincount(bv) for bv in band_vals]
    occ = max(int(bo.max()) for bo in band_occ)
    cap_binding = occ > cap
    pos = {did: k for k, did in enumerate(ids)}
    # A pair within Hamming<=8 matches exactly in >=1 of the 9 blocks
    # (pigeonhole); the operator surfaces it UNLESS every matching block's
    # (band, value) bucket is over the bucket_cap=4096 skew guard.  So the
    # unconditional guarantee is over pairs with at least one UNDER-cap
    # matching bucket — assert recall 1.0 on exactly that subset instead of
    # skipping the assertion whenever any bucket anywhere is hot (ADVICE r8:
    # the old `or cap_binding` escape made the gate vacuous in the skewed
    # regime the cap exists for).
    guaranteed = {
        p for p in truth
        if any(bv[pos[p[0]]] == bv[pos[p[1]]] and int(bo[bv[pos[p[0]]]]) <= cap
               for bv, bo in zip(band_vals, band_occ))
    }
    recall8 = len(set(got) & set(truth)) / len(truth) if truth else 1.0
    recall_g = (len(set(got) & guaranteed) / len(guaranteed)
                if guaranteed else 1.0)
    wrong = [p for p, h in got.items() if truth.get(p, -1) != h and h <= 8]
    return {"signal": "banded-candidate recall at the ADVERTISED Hamming<=8 "
                      "radius vs exact all-pairs; gate asserts 1.0 on the "
                      "pigeonhole-guaranteed subset (>=1 under-cap matching "
                      "block) even when the skew cap binds; reported "
                      "distances exact",
            "value": round(recall_g, 4), "bound": 1.0,
            "pass": recall_g >= 1.0 and not wrong,
            "detail": {"true_pairs_le8": len(truth),
                       "guaranteed_pairs": len(guaranteed),
                       "recall_all_pairs": round(recall8, 4),
                       "reported": len(got),
                       "distance_mismatches": len(wrong),
                       "max_bucket_occupancy": occ,
                       "bucket_cap_binding": cap_binding}}


def check_d11(spark):
    ids, mat = _embeddings(spark)
    idx = {int(i): k for k, i in enumerate(ids)}
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    out = _run(spark, "d11_semantic_dedup").collect()
    clusters: dict[int, dict[str, list[int]]] = {}
    for r in out:
        slot = clusters.setdefault(int(r.cluster_id), {"keep": [], "drop": []})
        slot["keep" if r.keep else "drop"].append(int(r.vec_id))
    dropped = supported = 0
    for slot in clusters.values():
        if not slot["drop"]:
            continue
        kept = unit[[idx[v] for v in slot["keep"]]]
        for v in slot["drop"]:
            dropped += 1
            if kept.size and float((kept @ unit[idx[v]]).max()) >= 0.97 - 1e-9:
                supported += 1
    frac = supported / dropped if dropped else 1.0
    return {"signal": "dropped docs with exact cosine>=0.97 to a kept "
                      "same-cluster doc",
            "value": round(frac, 4), "bound": 1.0, "pass": frac >= 1.0,
            "detail": {"dropped": dropped}}


def check_d13(spark):
    docs = _docs(spark)
    truth = _exact_near_pairs(docs, 0.6)
    out = _run(spark, "d13_near_dup_keep_list").collect()
    kept = {int(r.doc_id) for r in out if r.keep}
    dropped = {int(r.doc_id) for r in out if not r.keep}
    neighbors: dict[int, set[int]] = {}
    for a, b in truth:
        neighbors.setdefault(a, set()).add(b)
        neighbors.setdefault(b, set()).add(a)
    # identical-text copies are dropped against their representative:
    # they have Jaccard 1.0 support by construction
    by_text: dict[str, list[int]] = {}
    for did, text in docs.items():
        by_text.setdefault(text, []).append(did)
    for group in by_text.values():
        if len(group) > 1:
            for did in group:
                neighbors.setdefault(did, set()).update(set(group) - {did})
    unsupported = [d for d in dropped if d in docs and not neighbors.get(d)]
    kept_violations = [(a, b) for (a, b) in truth if a in kept and b in kept]
    return {"signal": "every dropped doc has an exact-Jaccard>=0.6 neighbor; "
                      "kept-kept pairs above threshold (LSH misses)",
            "value": len(kept_violations), "bound": 2,
            "pass": not unsupported and len(kept_violations) <= 2,
            "detail": {"dropped": len(dropped),
                       "unsupported_drops": len(unsupported),
                       "kept_violations": len(kept_violations)}}


def check_d14(spark):
    docs = _docs(spark)
    bench_grams: set[str] = set()
    for did, text in docs.items():
        if did % 20 == 0:
            bench_grams |= _shingles(text, 5)
    got = {int(r.doc_id): int(r.n_candidate)
           for r in _run(spark, "d14_bloom_decontamination").collect()}
    fn = fp_docs = 0
    for did, text in docs.items():
        if did % 20 == 0:
            continue
        true_n = len(_shingles(text, 5) & bench_grams)
        rep_n = got.get(did, 0)
        if rep_n < true_n:
            fn += 1
        if true_n == 0 and rep_n > 0:
            fp_docs += 1
    n_corpus = sum(1 for d in docs if d % 20 != 0)
    fp_rate = fp_docs / n_corpus
    return {"signal": "zero Bloom false negatives vs exact gram containment; "
                      "false-positive doc rate",
            "value": round(fp_rate, 4), "bound": 0.02,
            "pass": fn == 0 and fp_rate <= 0.02,
            "detail": {"false_negative_docs": fn, "fp_docs": fp_docs}}


def check_m06(spark):
    from datalake_worker_spark.functions.multimodal import perceptual_hash
    from datalake_worker_spark.sources import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF_DIR, "documents")
    base = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    replay = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.encode(
            F.concat(F.upper(F.substring("text", 1, 3)),
                     F.expr("substring(text, 4)")),
            "utf-8",
        ).alias("payload"),
    )
    fp = perceptual_hash(base.unionByName(replay), "doc_id", "payload").collect()
    vals = np.array([int(r.phash) for r in fp], dtype=np.int64).view(np.uint64)
    ham = _popcount64(vals[:, None] ^ vals[None, :])
    iu = np.triu_indices(len(vals), 1)
    exact_counts: dict[int, int] = {}
    for h in ham[iu]:
        if h <= 6:
            exact_counts[int(h)] = exact_counts.get(int(h), 0) + 1
    got = {int(r.hamming): int(r.n_pairs)
           for r in _run(spark, "m06_perceptual_near_dup").collect()}
    ok = got == exact_counts
    return {"signal": "per-distance pair counts EQUAL exact brute force "
                      "(7-band pigeonhole guarantees recall at <=6)",
            "value": 1.0 if ok else 0.0, "bound": 1.0, "pass": ok,
            "detail": {"exact": exact_counts, "reported": got}}


def check_t05(spark):
    docs = _docs(spark)
    a = {int(r.doc_id): (int(r.content_fp), int(r.winnow_fp))
         for r in _run(spark, "t05_fingerprint").collect()}
    b = {int(r.doc_id): (int(r.content_fp), int(r.winnow_fp))
         for r in _run(spark, "t05_fingerprint").collect()}
    deterministic = a == b
    by_fp: dict[int, set[str]] = {}
    for did, (cfp, _) in a.items():
        by_fp.setdefault(cfp, set()).add(docs[did])
    collisions = sum(1 for texts in by_fp.values() if len(texts) > 1)
    return {"signal": "two independent runs identical; distinct texts "
                      "colliding on content_fp",
            "value": collisions, "bound": 0,
            "pass": deterministic and collisions == 0,
            "detail": {"deterministic": deterministic}}


def _ann_recall(spark, name):
    exact = {}
    for r in _run(spark, "v01_exact_cosine_topk").collect():
        exact.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    got = {}
    for r in _run(spark, name).collect():
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    recs = [len(got.get(q, set()) & nb) / len(nb) for q, nb in exact.items()]
    return float(np.mean(recs))


def check_v02(spark):
    r = _ann_recall(spark, "v02_ann_lsh_topk")
    return {"signal": "recall@5 vs v01 exact top-k", "value": round(r, 4),
            "bound": 0.6, "pass": r >= 0.6}


def check_v04(spark):
    r = _ann_recall(spark, "v04_ann_ivf_topk")
    # per-round trend (VERDICT r7 item 4): r7 0.74 @ nprobe=5/iters=1
    # with bound 0.70; r8 raised nprobe to 6 and iters to 2 (measured
    # 0.91 at equal runtime) and tightened the bound to 0.80.
    return {"signal": "recall@5 vs v01 exact top-k", "value": round(r, 4),
            "bound": 0.8, "pass": r >= 0.8,
            "detail": {"trend": {"r7": 0.74, "r8_config": "nprobe=6 iters=2"}}}


def check_v09(spark):
    r = _ann_recall(spark, "v09_ann_ivfpq_topk")
    # per-round trend (VERDICT r8 item 5): r8 0.71 @ nprobe=5/refine=96/
    # iters=1 vs bound 0.60 (thin 0.11 margin); r9 widened the refine
    # stage to 256 + nprobe 6 + iters 2 (the binding constraint was
    # ADC's lossy ranking, not cell recall) — measured 0.91 at lower
    # runtime, bound raised to 0.75.
    return {"signal": "recall@5 vs v01 exact top-k (ADC + exact rerank)",
            "value": round(r, 4), "bound": 0.75, "pass": r >= 0.75,
            "detail": {"trend": {"r8": 0.71,
                                 "r9_config": "nprobe=6 refine=256 iters=2"}}}


def check_v08(spark):
    ids, mat = _embeddings(spark)
    out = {int(r.subspace): float(r.rmse)
           for r in _run(spark, "v08_pq_quantization_audit").collect()}
    sub_dim = mat.shape[1] // len(out)
    ratios = []
    for m, rmse in out.items():
        sub = mat[:, m * sub_dim : (m + 1) * sub_dim]
        base = float(np.sqrt(((sub - sub.mean(0)) ** 2).mean()))
        ratios.append(rmse / base if base else 0.0)
    worst = max(ratios)
    return {"signal": "per-subspace RMSE / 1-centroid-baseline RMSE "
                      "(codebook must beat the mean)",
            "value": round(worst, 4), "bound": 1.0, "pass": worst < 1.0}


def check_st13(spark):
    docs = _docs(spark)
    out = {int(r.epoch): r for r in _run(spark, "st13_incremental_near_dup").collect()}
    from datalake_worker_spark.sources import load_table
    from datalake_worker_spark.streaming.incdedup import run_incremental_near_dup
    from pyspark.sql import functions as F

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    replay = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" replay marker")).alias("text"),
    )
    admitted = run_incremental_near_dup(spark, [d, replay]).collect()
    e0 = min(int(r.epoch) for r in admitted)  # epoch ids are 0-based
    hist = [_shingles(docs[int(r.doc_id)]) for r in admitted if int(r.epoch) == e0]
    adm2 = [int(r.doc_id) - 1_000_000 for r in admitted if int(r.epoch) == e0 + 1]
    # margin band: minhash agreement estimates jaccard with ~1/sqrt(64)
    # noise, so only clear-cut cases count against the operator
    hi, lo = 0.65, 0.35
    bad_admit = 0
    for orig in adm2:
        s = _shingles(docs[orig] + " replay marker")
        if max((_jaccard(s, h) for h in hist), default=0.0) >= hi:
            bad_admit += 1
    rejected = [did for did in docs if did not in set(adm2)]
    bad_reject = 0
    for orig in rejected:
        s = _shingles(docs[orig] + " replay marker")
        if max((_jaccard(s, h) for h in hist), default=0.0) <= lo:
            bad_reject += 1
    ok = bad_admit == 0 and bad_reject == 0
    return {"signal": "epoch-2 admissions/rejections consistent with exact "
                      "Jaccard to admitted history (0.35/0.65 margin band)",
            "value": bad_admit + bad_reject, "bound": 0, "pass": ok,
            "detail": {"epoch_counts": {e: int(out[e].n_admitted) for e in out},
                       "bad_admissions": bad_admit, "bad_rejections": bad_reject}}


def check_st14(spark):
    ids, mat = _embeddings(spark)
    idx = {int(i): k for k, i in enumerate(ids)}
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    got = {}
    for r in _run(spark, "st14_streaming_vector_index").collect():
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    recs = []
    for q, nb in got.items():
        sims = unit @ unit[idx[q]]
        top = set(ids[np.argsort(-sims)[: len(nb)]].tolist())
        recs.append(len(nb & top) / len(top))
    recall = float(np.mean(recs))
    # per-round trend (VERDICT r8 item 5): r8 0.70 @ nprobe=5/iters=1 vs
    # bound 0.60 (thin 0.10 margin); r9 applied the v04 recipe (nprobe 6,
    # Lloyd iters 2) — measured 0.78, margin 0.18.
    return {"signal": "probe recall@5 vs exact brute-force cosine over the "
                      "fully-streamed corpus",
            "value": round(recall, 4), "bound": 0.6, "pass": recall >= 0.6,
            "detail": {"trend": {"r8": 0.70,
                                 "r9_config": "nprobe=6 iters=2"}}}


def check_a16(spark):
    from collections import Counter

    docs = _docs(spark)
    exact = Counter()
    for text in docs.values():
        # mirror whitespace_tokens EXACTLY: Java split(trim(text), '\s+')
        # where \s = [ \t\n\x0b\f\r] (ASCII only) and an empty string
        # yields one '' token — Python's bare str.split() differs on
        # both (review r8)
        exact.update(re.split(r"[ \t\n\x0b\f\r]+", text.strip()) or [""])
    out = sorted(
        _run(spark, "a16_cms_heavy_hitters").collect(), key=lambda r: r.rn
    )
    truth_top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    top_ok = [(r.tok, int(r.exact_n)) for r in out] == truth_top
    undercounts = sum(1 for r in out if int(r.cms_n) < exact[r.tok])
    n_total = sum(exact.values())
    # CMS guarantee: P[over > (e/width)*N] <= e^-depth per query;
    # check the bound itself (loose at width=1024) and record the mean
    bound = 2.718281828 / 1024 * n_total
    worst_over = max(int(r.over) for r in out)
    mean_over = sum(int(r.over) for r in out) / len(out)
    return {"signal": "CMS estimates never undercount; exact top-20 and "
                      "counts match brute force; worst overestimate within "
                      "the (e/width)*N bound",
            "value": worst_over, "bound": round(bound, 1),
            "pass": top_ok and undercounts == 0 and worst_over <= bound,
            "detail": {"top20_exact_match": top_ok,
                       "undercounts": undercounts,
                       "mean_over": round(mean_over, 2),
                       "n_total_tokens": n_total}}


def check_a17(spark):
    """a17 is ORACLE-BACKED (the sketch estimate is deterministic); this
    differential pins the sketch's ADVERTISED accuracy instead: every
    p50/p90/p99 estimate within relative error alpha=0.02 of the exact
    quantile value (DDSketch's guarantee by construction: the target
    rank's bucket representative is the bucket's relative midpoint)."""
    import duckdb

    from datalake_worker_spark.operators.wave9 import DD_ALPHA, _QS

    duck = duckdb.connect()
    vals = duck.execute(
        f"SELECT l_returnflag, l_extendedprice FROM "
        f"'{SF_DIR}/lineitem.parquet' WHERE l_extendedprice > 0"
    ).fetchall()
    by_g: dict[str, list[float]] = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(float(v))
    out = {r.g: r for r in _run(spark, "a17_ddsketch_quantiles").collect()}
    worst = 0.0
    per_q = {}
    for g, xs in by_g.items():
        xs.sort()
        for name, q in _QS:
            exact = xs[int(math.floor(q * (len(xs) - 1)))]
            est = float(getattr(out[g], name))
            rel = abs(est - exact) / exact
            worst = max(worst, rel)
            per_q[f"{g}/{name}"] = round(rel, 5)
    return {"signal": "worst relative error of p50/p90/p99 estimates vs "
                      "exact sorted quantiles (DDSketch advertised alpha)",
            "value": round(worst, 5), "bound": DD_ALPHA,
            "pass": worst <= DD_ALPHA,
            "detail": {"per_quantile_rel_err": per_q}}


def check_st20(spark):
    """SpaceSaving invariants vs exact corpus token counts: I1 every
    reported estimate >= the true count; I2 est - true <= floor; I3
    every token whose true count exceeds the floor is reported (run
    with the operator's own m so the full tracked set is inspected,
    not just the top-20 the registry query returns)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from datalake_worker_spark.sources import load_table
    from datalake_worker_spark.streaming.spacesaving import (
        run_spacesaving_topk,
    )

    docs = _docs(spark)
    exact = Counter()
    for text in docs.values():
        exact.update(re.split(r"[ \t\n\x0b\f\r]+", text.strip()) or [""])
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batches = [d.filter(F.col("doc_id") % 4 == i) for i in range(4)]

    def invariants(m):
        top, floor, _ = run_spacesaving_topk(spark, batches, m=m)
        return {
            "m": m,
            "tracked": len(top),
            "floor": floor,
            "worst_over": max((est - exact[k]) for k, est in top.items()),
            "undercounts": sum(
                1 for k, est in top.items() if est < exact[k]
            ),
            "over_past_floor": sum(
                1 for k, est in top.items() if est - exact[k] > floor
            ),
            "missing_heavy": sum(
                1 for k, c in exact.items() if c > floor and k not in top
            ),
        }

    # operator's own m (exact at toy vocab, floor 0) AND a constrained
    # m=8 run where the counter cap BINDS (floor > 0) — otherwise the
    # floor-dependent invariants I2/I3 are never exercised at this SF
    # (the d08 cap-gate lesson, ADVICE r8)
    runs = [invariants(256), invariants(8)]
    ok = all(
        r["undercounts"] == 0 and r["over_past_floor"] == 0
        and r["missing_heavy"] == 0
        for r in runs
    )
    cap_bound_run = runs[1]
    return {"signal": "SpaceSaving invariants at m=256 AND at m=8 where "
                      "the cap binds: no undercounts (I1), overestimate "
                      "<= floor (I2), every true count > floor tracked "
                      "(I3)",
            "value": cap_bound_run["worst_over"],
            "bound": cap_bound_run["floor"],
            "pass": ok and cap_bound_run["floor"] > 0,
            "detail": {"runs": runs}}


def check_a18(spark):
    """a18 is ORACLE-BACKED (the k-min summary is deterministic given
    sha256); this differential pins ACCURACY instead, twice:
      1. registry query at SF_DIR, where k=128 exceeds every source's
         distinct count — the exact branch must return EXACTLY the true
         distinct/intersection counts (zero tolerance);
      2. planted overlapping integer ranges (A=0..999, B=500..1499,
         C=1200..1699) under a BINDING k=64 — estimate errors vs exact
         set algebra within 3/sqrt(k-2) (~38%), the KMV 3-sigma bound
         (Beyer et al. SIGMOD'07 give sigma ~= 1/sqrt(k-2))."""
    import duckdb

    from pyspark.sql import functions as F

    from datalake_worker_spark.operators.wave10 import (
        kmv_kmin,
        kmv_set_estimates,
    )

    duck = duckdb.connect()
    exact_rows = duck.execute(
        f"SELECT DISTINCT event_type, user_id FROM "
        f"'{SF_DIR}/events.parquet'"
    ).fetchall()
    sets: dict[str, set] = {}
    for t, u in exact_rows:
        sets.setdefault(t, set()).add(u)
    out = _run(spark, "a18_kmv_distinct_sketch").collect()
    exact_errs = 0
    for r in out:
        a, b = sets[r.src_a], sets[r.src_b]
        for est, true in (
            (r.est_a, len(a)), (r.est_b, len(b)),
            (r.est_union, len(a | b)), (r.est_intersect, len(a & b)),
            (r.est_except_a, len(a - b)),
        ):
            if abs(est - true) > 1e-9:
                exact_errs += 1

    # planted binding run: three ranges with known algebra
    k = 64
    planted = (
        spark.range(0, 1000).select(F.lit("A").alias("s"), F.col("id"))
        .unionByName(
            spark.range(500, 1500).select(F.lit("B").alias("s"), F.col("id"))
        )
        .unionByName(
            spark.range(1200, 1700).select(F.lit("C").alias("s"), F.col("id"))
        )
    )
    P = {"A": set(range(0, 1000)), "B": set(range(500, 1500)),
         "C": set(range(1200, 1700))}
    est_rows = kmv_set_estimates(
        kmv_kmin(planted, "s", "id", k=k), k=k
    ).collect()
    bound = 3.0 / math.sqrt(k - 2)
    worst = 0.0
    detail = {}
    for r in est_rows:
        a, b = P[r.src_a], P[r.src_b]
        u = len(a | b)
        for tag, est, true in (
            ("a", r.est_a, len(a)), ("b", r.est_b, len(b)),
            ("union", r.est_union, u),
        ):
            rel = abs(est - true) / true
            worst = max(worst, rel)
            detail[f"{r.src_a}{r.src_b}/{tag}"] = round(rel, 4)
        # intersection/difference error measured relative to the UNION
        # (the estimator's sampling frame — a tiny true intersection has
        # no relative-error guarantee of its own)
        for tag, est, true in (
            ("intersect", r.est_intersect, len(a & b)),
            ("except_a", r.est_except_a, len(a - b)),
        ):
            rel = abs(est - true) / u
            worst = max(worst, rel)
            detail[f"{r.src_a}{r.src_b}/{tag}"] = round(rel, 4)
    return {"signal": "registry run exact-branch mismatches (must be 0) "
                      "+ worst planted-set estimate error under binding "
                      "k=64 vs 3/sqrt(k-2)",
            "value": round(worst, 4), "bound": round(bound, 4),
            "pass": exact_errs == 0 and worst <= bound,
            "detail": {"exact_branch_mismatches": exact_errs,
                       "planted_rel_err": detail}}


CHECKS = {
    "a08_approx_aggregates": check_a08,
    "a18_kmv_distinct_sketch": check_a18,
    "a16_cms_heavy_hitters": check_a16,
    "a17_ddsketch_quantiles": check_a17,
    "st20_spacesaving_topk": check_st20,
    "a11_hll_distinct_rollup": check_a11,
    "d04_minhash_near_dups": check_d04,
    "d05_simhash_fingerprints": check_d05,
    "d08_simhash_near_dups": check_d08,
    "d11_semantic_dedup": check_d11,
    "d13_near_dup_keep_list": check_d13,
    "d14_bloom_decontamination": check_d14,
    "m06_perceptual_near_dup": check_m06,
    "t05_fingerprint": check_t05,
    "v02_ann_lsh_topk": check_v02,
    "v04_ann_ivf_topk": check_v04,
    "v08_pq_quantization_audit": check_v08,
    "v09_ann_ivfpq_topk": check_v09,
    "st13_incremental_near_dup": check_st13,
    "st14_streaming_vector_index": check_st14,
}


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "07"
    import duckdb

    from datalake_worker_spark import registry
    from datalake_worker_spark.session import get_spark

    registry._load_all()
    spark = get_spark(
        app_name="dlw-approx-checks", cpus="16", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    duck = duckdb.connect()
    for t in ["lineitem", "documents", "embeddings"]:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out = {}
    for name, fn in CHECKS.items():
        try:
            res = fn(spark, duck) if fn is check_a08 else fn(spark)
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            res = {"signal": "ERROR", "value": None, "bound": None,
                   "pass": False, "detail": {"err": repr(exc)[:300]}}
        out[name] = res
        print(f"{name:32s} {'PASS' if res['pass'] else 'FAIL'}  "
              f"{res['signal']} = {res['value']}")
    path = f"APPROX_CHECKS_r{rnd}.json"
    with open(path, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "checks": out}, fh, indent=1)
    n_pass = sum(1 for r in out.values() if r["pass"])
    print(f"{path}: {n_pass}/{len(out)} pass")


if __name__ == "__main__":
    main()
