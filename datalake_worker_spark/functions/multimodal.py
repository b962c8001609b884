"""Multimodal column support (SURVEY.md §2.2 extensions).

Images/audio/video are opaque ``binary`` payload columns plus typed
``struct`` metadata. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode/feature/frame-sample operators, partitioning —
is real and tested; the actual codec calls are stubbed deterministically
(the image/audio libraries are not in this container, per the build
brief). Swap ``_fake_decode`` with a real decoder and nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table, spread_scan

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, n_frames int, format string"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/video decoder.

    A real implementation would call PIL/ffmpeg here (NotImplementedError
    territory in this container); the fake derives plausible metadata
    purely from the byte length so tests are reproducible.
    """
    n = len(payload)
    return {
        "width": n % 640 + 1,
        "height": (n // 640) % 480 + 1,
        "n_frames": n % 5 + 1,
        "format": "img" if n % 2 == 0 else "vid",
    }


def decode_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched decode: binary payload → typed metadata rows.

    mapInPandas streams batches through Python once — this is the pattern
    for any real multimodal feature extraction at scale (each task decodes
    its own partition; no shuffle, no collect).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in pdf[payload_col]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(decode, DECODE_SCHEMA)


@register(
    "m01_binary_payload_dedup",
    """
    SELECT sha256(text) AS payload_sha,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(MIN(strlen(text)) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY payload_sha
    """,
    category="llm-multimodal",
    doc="binary payload column + content-hash dedup (sha2 over bytes).",
)
def m01_binary_payload_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    return d.groupBy(F.sha2("payload", 256).alias("payload_sha")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keeper"),
        F.min(F.length("payload")).cast("long").alias("n_bytes"),
    )


@register(
    "m02_decode_metadata",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
           CAST((strlen(text) // 640) % 480 + 1 AS INTEGER) AS height,
           CAST(strlen(text) % 5 + 1 AS INTEGER) AS n_frames,
           CASE WHEN strlen(text) % 2 = 0 THEN 'img' ELSE 'vid' END AS format
    FROM documents
    """,
    category="llm-multimodal",
    doc="mapInPandas decode plumbing (Arrow binary batches) with deterministic stub codec.",
)
def m02_decode_metadata(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    return decode_metadata(d, "doc_id", "payload")


@register(
    "m03_frame_sample",
    """
    SELECT doc_id, CAST(unnest(range(0, strlen(text) % 5 + 1)) AS INTEGER) AS frame_idx
    FROM documents
    WHERE doc_id < 50
    """,
    category="llm-multimodal",
    doc="frame sampling plumbing: explode one row per (stubbed) video frame index.",
)
def m03_frame_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    meta = decode_metadata(
        d.withColumn("payload", F.encode("text", "utf-8")), "doc_id", "payload"
    )
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )


AUDIO_WINDOW = 32


@register(
    "m04_audio_window_energy",
    f"""
    SELECT doc_id,
           CAST(widx AS INTEGER) AS window_idx,
           CAST(least({AUDIO_WINDOW}, strlen(text) - widx * {AUDIO_WINDOW})
                AS BIGINT) AS n_samples,
           CAST(list_sum([ord(substr(text, widx * {AUDIO_WINDOW} + i, 1)) ** 2
                          FOR i IN range(1, least({AUDIO_WINDOW},
                              strlen(text) - widx * {AUDIO_WINDOW}) + 1)])
                AS BIGINT) AS sum_sq
    FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(strlen(text) / {AUDIO_WINDOW}.0) AS BIGINT)))
                   AS widx
        FROM documents WHERE doc_id < 50
    )
    """,
    category="llm-multimodal",
    doc=(
        "audio feature extraction plumbing: binary payloads stream "
        "through mapInPandas as Arrow batches, each interpreted as "
        "uint8 PCM samples and reduced to per-window energy (sum of "
        "squares over 32-sample windows — the RMS/VAD core). Output is "
        "exact integers, so the oracle replays the identical "
        "computation over the byte values. Swap the frombuffer stub "
        "for a real audio decode and the plan shape — partition-local "
        "Python, one output row per (doc, window), no shuffle — is "
        "unchanged at any scale."
    ),
)
def m04_audio_window_energy(spark, sf_dir):
    import numpy as np

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .withColumn("payload", F.encode("text", "utf-8"))
        .select("doc_id", "payload")
    )

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widxs, ns, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                for w in range(0, (len(samples) + AUDIO_WINDOW - 1) // AUDIO_WINDOW):
                    chunk = samples[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                    ids.append(doc_id)
                    widxs.append(w)
                    ns.append(len(chunk))
                    sums.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_sq": pd.Series(sums, dtype="int64"),
                }
            )

    return d.mapInPandas(
        energy, "doc_id long, window_idx int, n_samples long, sum_sq long"
    )


IMG_W = 16  # fake row-major image width (bytes per row)
PATCH = 8  # ViT-style square patch side


@register(
    "m05_image_patchify",
    f"""
    SELECT doc_id,
           CAST(pr AS INTEGER) AS patch_row,
           CAST(pc AS INTEGER) AS patch_col,
           CAST(list_sum([ord(substr(text,
                    (pr * {PATCH} + i // {PATCH}) * {IMG_W}
                        + pc * {PATCH} + (i % {PATCH}) + 1, 1))
                FOR i IN range({PATCH * PATCH})]) AS BIGINT) AS sum_px
    FROM (
        SELECT doc_id, text,
               unnest(range(0, strlen(text) // ({IMG_W} * {PATCH}))) AS pr
        FROM documents WHERE doc_id < 50
    ) CROSS JOIN LATERAL (SELECT unnest(range({IMG_W} // {PATCH})) AS pc) g
    """,
    category="llm-multimodal",
    doc=(
        "ViT-style image patchify plumbing: each binary payload is "
        "interpreted as a row-major W=16 uint8 image, cut into 8x8 "
        "patches (complete patches only), and reduced to per-patch "
        "pixel sums — the patch-embedding front half of any vision "
        "tower. mapInPandas over Arrow batches, partition-local, one "
        "output row per patch, no shuffle; swap the byte-grid stub for "
        "a real image decode and the plan is unchanged. Exact integers, "
        "so the oracle replays the identical indexing over the bytes."
    ),
)
def m05_image_patchify(spark, sf_dir):
    import numpy as np

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .withColumn("payload", F.encode("text", "utf-8"))
        .select("doc_id", "payload")
    )

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, prs, pcs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                h = len(px) // IMG_W  # complete rows only
                img = px[: h * IMG_W].reshape(h, IMG_W)
                for pr in range(h // PATCH):
                    for pc in range(IMG_W // PATCH):
                        patch = img[
                            pr * PATCH : (pr + 1) * PATCH,
                            pc * PATCH : (pc + 1) * PATCH,
                        ]
                        ids.append(doc_id)
                        prs.append(pr)
                        pcs.append(pc)
                        sums.append(int(patch.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "patch_row": pd.Series(prs, dtype="int32"),
                    "patch_col": pd.Series(pcs, dtype="int32"),
                    "sum_px": pd.Series(sums, dtype="int64"),
                }
            )

    return d.mapInPandas(
        patchify, "doc_id long, patch_row int, patch_col int, sum_px long"
    )


#: Band count for the banded candidate join. Pigeonhole: a pair whose
#: Hamming distance is <= PHASH_BANDS - 1 differs in fewer bits than
#: there are bands, so at least one band is clean (agrees exactly) and
#: the equi-join is GUARANTEED to surface the pair. With the verify
#: threshold at 6 bits, 7 bands make the guarantee cover the whole
#: accepted range — 4 x 16-bit bands (the SimHash d08 default) only
#: guarantee <= 3 bits, since 4-6 differing bits can spread 2+2+1+1
#: over all four bands (ADVICE r6). Narrower bands mean more candidate
#: collisions; that is the documented recall-vs-candidates trade, and
#: the exact bit_count verify keeps precision unaffected.
PHASH_BANDS = 7  # six 9-bit bands + one 10-bit band over the 64 bits
PHASH_HAMMING_MAX = 6
_PHASH_BAND_OFFSETS = [0, 10, 19, 28, 37, 46, 55]
_PHASH_BAND_WIDTHS = [10, 9, 9, 9, 9, 9, 9]


def perceptual_hash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """64-bit average-hash (aHash) per payload: the byte stream is
    block-averaged into an 8x8 grid and each cell compares against the
    grid mean — the classic perceptual-hash recipe over the stub
    byte-grid "decode" (swap in a real resize+grayscale and nothing
    downstream changes). Arrow-batched mapInPandas, partition-local, one
    int64 per payload."""
    import numpy as np

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                if len(b) == 0:
                    b = np.zeros(1)
                # 64 equal byte-blocks -> cell means (length-independent)
                edges = (np.arange(65) * len(b)) // 64
                cells = np.array([
                    b[edges[j]:max(edges[j + 1], edges[j] + 1)].mean()
                    for j in range(64)
                ])
                bits = cells > cells.mean()
                h = 0
                for j in range(64):
                    if bits[j]:
                        h |= 1 << j
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(int(doc_id))
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "phash": pd.array(hashes, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(ph, "doc_id long, phash long")


def phash_near_pairs(
    hashed: DataFrame,
    max_hamming: int = PHASH_HAMMING_MAX,
    bucket_cap: int = 4096,
) -> DataFrame:
    """Banded near-pair generation over perceptual hashes (the SimHash
    d08 recipe applied to the multimodal column): 7 uneven bands over
    the 64 bits. Pigeonhole guarantee: a pair within Hamming distance
    <= PHASH_BANDS - 1 = 6 differs in fewer bits than there are bands,
    so some band agrees exactly and the candidate equi-join surfaces
    the pair — guaranteed recall across the whole accepted range
    (<= PHASH_HAMMING_MAX), not just for favourable bit spreads (the
    4 x 16-bit layout's <= 3 guarantee, corrected per ADVICE r6).
    Bucket equi-join, never all-pairs; exact bit_count verify."""
    from .dedup import capped_fingerprint_band_pairs

    bands = hashed.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band_idx"),
                    F.shiftrightunsigned(
                        F.col("phash"), _PHASH_BAND_OFFSETS[k]
                    )
                    .bitwiseAND(F.lit((1 << _PHASH_BAND_WIDTHS[k]) - 1))
                    .alias("band_val"),
                )
                for k in range(PHASH_BANDS)
            ])
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_idx", "b.band_val")
    # capped in-bucket expansion (r7): 9-10-bit bands are narrow, so at
    # corpus scale a band bucket holds ~n/512 members — without the cap
    # a hot bucket (monochrome images hashing identically) expands
    # O(bucket²). Bounded-recall-under-skew is the documented trade,
    # same as d04/d08.
    pairs = capped_fingerprint_band_pairs(bands, "phash", "doc_id", bucket_cap)
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


@register(
    "m06_perceptual_near_dup",
    None,  # python-side hash stub is not SQL-expressible; rows-only + planted pytest
    category="llm-multimodal",
    doc=(
        "perceptual-hash near-duplicate detection for binary media "
        "columns: 64-bit aHash per payload (block-averaged 8x8 grid vs "
        "grid mean, Arrow mapInPandas over the stub decode), 7-band "
        "capped bucket expansion (pigeonhole-guaranteed candidate "
        "recall across the whole <= 6-bit range, never all-pairs, "
        "hot buckets bounded), exact Hamming verify at <= 6 bits. Output: per-Hamming-distance pair counts "
        "plus pair extremes. The byte-identical-dedup (m01) companion "
        "for re-encoded/perturbed media; planted near-identical and "
        "disjoint payload tests pin recall/precision in pytest."
    ),
)
def m06_perceptual_near_dup(spark, sf_dir):
    # spread_scan: the payload aHash (Arrow mapInPandas) ran as TWO
    # tasks over the single-file scan (r13 profile: 1.5 s); no-op at scale
    d = spread_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    # corpus + a perturbed re-encode of every payload (first three bytes
    # case-flipped — length-preserving, the analog of a few changed
    # pixels; ids shifted). This is the "same image, different encode"
    # case perceptual hashing exists for; byte-identical dedup (m01)
    # misses all of these by construction
    base = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    replay = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.encode(
            F.concat(
                F.upper(F.substring("text", 1, 3)),
                F.expr("substring(text, 4)"),
            ),
            "utf-8",
        ).alias("payload"),
    )
    pairs = phash_near_pairs(
        perceptual_hash(base.unionByName(replay), "doc_id", "payload")
    )
    return (
        pairs.groupBy("hamming")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.min("id_a").cast("long").alias("first_a"),
            F.max("id_b").cast("long").alias("last_b"),
        )
        .orderBy("hamming")
    )


@register(
    "m07_chunk_dedup_manifest",
    """
    WITH c AS (
        SELECT doc_id, source,
               sha256(substring(text, (i.i - 1) * 64 + 1, 64)) AS chunk_sha
        FROM documents
        CROSS JOIN LATERAL (
            -- length() (characters), NOT strlen() (bytes): the engine side
            -- chunks by F.length/substr which are character-based, and DuckDB's
            -- substring below is also character-based — a byte-based count
            -- would emit phantom empty chunks on any non-ASCII text (ADVICE r8)
            SELECT unnest(range(1, CAST(ceil(length(text) / 64.0) AS BIGINT) + 1)) AS i
        ) i
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk_sha) AS BIGINT) AS n_distinct_chunks,
           ROUND(COUNT(*) / CAST(COUNT(DISTINCT chunk_sha) AS DOUBLE), 6)
             AS dedup_ratio
    FROM c GROUP BY source
    """,
    category="llm-multimodal",
    doc=(
        "fixed-size chunk manifest + storage-level dedup audit — the "
        "reference's own data model (opaque chunks in a content store, "
        "/root/reference/src/rocksdb_storage_engine.rs:126-132) applied "
        "as a QUERY: every payload splits into 64-char chunks, each "
        "chunk content-hashed, and per source the logical/physical "
        "chunk counts give the dedup ratio a chunk store would achieve "
        "(exact-dup docs collapse fully; partial overlaps collapse the "
        "aligned prefix). Chunking is a per-row transform over a "
        "sequence (zero shuffles until the count-distinct aggregate); "
        "at 100 TB the chunk-sha distinct is the only wide stage and "
        "its key space is uniform by construction."
    ),
)
def m07_chunk_dedup_manifest(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..sources import load_table

    d = load_table(spark, sf_dir, "documents")
    nchunks = F.ceil(F.length("text") / 64.0).cast("long")
    chunk = lambda i: F.col("text").substr(  # noqa: E731
        (i - 1) * 64 + 1, F.lit(64)
    )
    # empty text => zero chunks. F.sequence(1, 0) yields a DESCENDING
    # [1, 0] (not empty!) while the oracle's range(1, 1) is empty — an
    # empty-text doc would emit two phantom '' chunks and split the
    # engines (review r8); explode of an explicit empty array drops the
    # row on both sides.
    idx = F.when(nchunks >= 1, F.sequence(F.lit(1), nchunks)).otherwise(
        F.array().cast("array<long>")
    )
    c = d.select(
        "doc_id",
        "source",
        F.explode(F.transform(idx, chunk)).alias("chunk"),
    ).select(
        "doc_id", "source", F.sha2(F.encode("chunk", "utf-8"), 256).alias("chunk_sha")
    )
    return c.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_chunks"),
        F.count_distinct("chunk_sha").cast("long").alias("n_distinct_chunks"),
        F.round(
            F.count("*") / F.count_distinct("chunk_sha").cast("double"), 6
        ).alias("dedup_ratio"),
    )


@register(
    "m08_cdc_chunking",
    r"""
    WITH w AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS words
        FROM documents
    ),
    t AS (
        SELECT doc_id, source, i.pos, words[i.pos] AS word
        FROM w CROSS JOIN LATERAL (
            SELECT unnest(range(1, len(words) + 1)) AS pos
        ) i
    ),
    c AS (
        SELECT doc_id, source, pos, word,
               CASE WHEN substr(sha256(word), 1, 1) IN ('0','1')
                    THEN 1 ELSE 0 END AS cut
        FROM t
    ),
    k AS (
        SELECT doc_id, source, pos, word,
               COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS chunk_id
        FROM c
    ),
    ch AS (
        SELECT doc_id, source, chunk_id,
               sha256(string_agg(word, ' ' ORDER BY pos)) AS chunk_sha,
               COUNT(*) AS n_words
        FROM k GROUP BY doc_id, source, chunk_id
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk_sha) AS BIGINT) AS n_distinct_chunks,
           ROUND(COUNT(*) / CAST(COUNT(DISTINCT chunk_sha) AS DOUBLE), 6)
             AS dedup_ratio,
           ROUND(SUM(n_words) / CAST(COUNT(*) AS DOUBLE), 6)
             AS avg_chunk_words
    FROM ch GROUP BY source
    """,
    category="llm-multimodal",
    doc=(
        "content-defined chunking (CDC) manifest + storage-dedup audit "
        "— the insertion-robust evolution of m07's fixed-size chunks, "
        "and the production shape of the reference's chunk store "
        "(/root/reference/src/rocksdb_storage_engine.rs:126-132): a "
        "chunk boundary falls AFTER any word whose sha256 starts with "
        "'0' or '1' (P=1/8, ~12-word average chunks), so boundaries are "
        "a pure function of LOCAL content — inserting one word shifts "
        "only the chunk containing it and resynchronizes at the next "
        "boundary, where fixed-size chunking shifts every subsequent "
        "chunk (pinned by the planted insertion test; the rsync / "
        "LBFS-style rolling-hash argument, Muthitacharoen et al. SOSP "
        "2001). sha256 is the boundary hash because it is byte-exact "
        "across engines, making the whole audit DuckDB-hash-green; a "
        "production system would use a cheaper gear/Rabin hash with "
        "min/max chunk clamps. Shape: one posexplode, per-doc windows "
        "(bounded by doc length), one (doc, chunk) rebuild groupBy, "
        "then the same distinct-sha wide stage as m07."
    ),
)
def m08_cdc_chunking(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..functions.text import whitespace_tokens
    from ..sources import load_table, spread_scan

    d = load_table(spark, sf_dir, "documents")
    w = spread_scan(d, "doc_id").select(
        "doc_id",
        "source",
        F.posexplode(whitespace_tokens("text")).alias("pos", "word"),
    )
    cut = F.when(
        F.substring(F.sha2(F.encode("word", "utf-8"), 256), 1, 1).isin("0", "1"),
        1,
    ).otherwise(0)
    prev = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    k = w.withColumn(
        "chunk_id", F.coalesce(F.sum(cut).over(prev), F.lit(0))
    )
    ch = k.groupBy("doc_id", "source", "chunk_id").agg(
        F.sha2(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "word"))
                        ),
                        lambda s: s.getField("word"),
                    ),
                    " ",
                ),
                "utf-8",
            ),
            256,
        ).alias("chunk_sha"),
        F.count("*").alias("n_words"),
    )
    return ch.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_chunks"),
        F.count_distinct("chunk_sha").cast("long").alias("n_distinct_chunks"),
        F.round(
            F.count("*") / F.count_distinct("chunk_sha").cast("double"), 6
        ).alias("dedup_ratio"),
        F.round(F.sum("n_words") / F.count("*").cast("double"), 6).alias(
            "avg_chunk_words"
        ),
    )
