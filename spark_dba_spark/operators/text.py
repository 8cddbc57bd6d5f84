"""Text-analysis operators over ``documents``: quality scoring, language ID,
token counting, fingerprinting.

All pure JVM column expressions (no Python in the hot path) with exact
integer/double arithmetic so the DuckDB oracle matches bit-for-bit. At
100 TB these are embarrassingly parallel map-only stages — no shuffle at all
(verify with .explain(): a single WholeStageCodegen over the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import catalog
from ..functions.hashing import sql_md5_long_duck, sql_md5_long_spark
from ..functions.numeric import (
    qrem_round6_duck,
    qrem_round6_spark,
    rat_round6_duck,
    rat_round6_signed_duck,
    rat_round6_signed_spark,
    rat_round6_spark,
)
from ..registry import QuerySpec

STOPWORDS = ("the", "a", "and", "of", "to")

# language → marker stopwords for the n-gram/stopword-vote language ID
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.load(spark, sf_dir, "documents")


def _spark_arr(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _duck_arr(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT load_par: one bound-once tokenize pass is cheaper than an
    # insurance shuffle of the texts (A/B: +0.17s at sf0.1).
    docs = _docs(spark, sf_dir)
    stop = _spark_arr(STOPWORDS)
    # NB: decimal-typed literals (`1.0`) would make Spark plan DECIMAL
    # arithmetic inside F.expr strings — keep every ratio explicitly DOUBLE
    # so both engines run identical IEEE arithmetic.
    #
    # All derived metrics are computed in ONE struct expression binding the
    # split result once (projection collapse would otherwise inline the
    # split into every derived column and re-tokenize each row ~6× —
    # interpreted lambdas get no CSE; see functions/texts.word_ngrams).
    q = F.expr(
        f"""transform(array(split(text, ' ')), ws -> struct(
              size(ws) as n_tokens,
              cast(size(array_distinct(ws)) as double) / size(ws) as uniq_ratio,
              cast(size(filter(ws, w -> array_contains({stop}, w))) as double)
                / size(ws) as stop_ratio,
              cast(n_chars - (size(ws) - 1) as double) / size(ws)
                as avg_token_len
            ))[0]"""
    )
    return (
        docs.withColumn("q", q)
        .select("doc_id", "q.*")
        .withColumn(
            "quality_score",
            F.expr(
                "uniq_ratio * cast(0.5 as double)"
                " + (cast(1.0 as double) - stop_ratio) * cast(0.3 as double)"
                " + least(cast(n_tokens as double) / cast(100.0 as double),"
                "          cast(1.0 as double)) * cast(0.2 as double)"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_TEXT_QUALITY = f"""
SELECT doc_id, n_tokens, uniq_ratio, stop_ratio, avg_token_len,
       uniq_ratio * CAST(0.5 AS DOUBLE)
         + (CAST(1.0 AS DOUBLE) - stop_ratio) * CAST(0.3 AS DOUBLE)
         + least(CAST(n_tokens AS DOUBLE) / CAST(100.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE)) * CAST(0.2 AS DOUBLE) AS quality_score
FROM (
  SELECT doc_id,
         len(ws) AS n_tokens,
         CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS uniq_ratio,
         CAST(len(list_filter(ws, w -> list_contains({_duck_arr(STOPWORDS)}, w)))
              AS DOUBLE) / len(ws) AS stop_ratio,
         CAST(n_chars - (len(ws) - 1) AS DOUBLE) / len(ws) AS avg_token_len
  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ws FROM documents))
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Language identification (stopword-vote heuristic)
# --------------------------------------------------------------------------

def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("ws", F.split("text", " "))
    for lang, markers in LANG_MARKERS.items():
        docs = docs.withColumn(
            f"v_{lang}",
            F.expr(f"size(filter(ws, w -> array_contains({_spark_arr(markers)}, w)))"),
        )
    # Deterministic argmax with fixed priority order en>de>fr>es; all-zero
    # votes → 'und' (undetermined).
    pred = F.expr(
        "CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0 THEN 'und' "
        "WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en' "
        "WHEN v_de >= v_fr AND v_de >= v_es THEN 'de' "
        "WHEN v_fr >= v_es THEN 'fr' ELSE 'es' END"
    )
    return (
        docs.withColumn("pred_lang", pred)
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            (F.col("lang") == F.col("pred_lang")).alias("is_match"),
        )
        .orderBy("doc_id")
    )


_duck_votes = ",\n         ".join(
    f"len(list_filter(ws, w -> list_contains({_duck_arr(m)}, w))) AS v_{lang}"
    for lang, m in LANG_MARKERS.items()
)

ORACLE_TEXT_LANG = f"""
SELECT doc_id, lang,
       CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0 THEN 'und'
            WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en'
            WHEN v_de >= v_fr AND v_de >= v_es THEN 'de'
            WHEN v_fr >= v_es THEN 'fr' ELSE 'es' END AS pred_lang,
       lang = (CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0 THEN 'und'
            WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en'
            WHEN v_de >= v_fr AND v_de >= v_es THEN 'de'
            WHEN v_fr >= v_es THEN 'fr' ELSE 'es' END) AS is_match
FROM (
  SELECT doc_id, lang,
         {_duck_votes}
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents))
ORDER BY doc_id
"""


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation matrix: labeled lang × predicted lang
    counts with per-cell share of the true-label row — the confusion
    matrix every classifier-in-the-pipeline gets judged by (which
    languages leak into which). Reuses text_lang_id's exact prediction
    and reduces to one groupBy on the (true, pred) pair — matrix-sized
    output at any corpus scale."""
    pred = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    row_tot = pred.groupBy("lang").agg(F.count("*").alias("n_lang"))
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(row_tot), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            F.round(F.col("n") / F.col("n_lang").cast("double"), 6).alias(
                "row_share"
            ),
        )
        .orderBy("lang", "pred_lang")
    )


ORACLE_LANG_CONFUSION = f"""
WITH pred AS (
  SELECT lang,
         CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0 THEN 'und'
              WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en'
              WHEN v_de >= v_fr AND v_de >= v_es THEN 'de'
              WHEN v_fr >= v_es THEN 'fr' ELSE 'es' END AS pred_lang
  FROM (
    SELECT doc_id, lang,
           {_duck_votes}
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
          FROM documents))),
tot AS (SELECT lang, COUNT(*) AS n_lang FROM pred GROUP BY 1)
SELECT lang, pred_lang, COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(MIN(n_lang) AS DOUBLE), 6) AS row_share
FROM pred JOIN tot USING (lang)
GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


# --------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# --------------------------------------------------------------------------

def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("n_alpha"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+', 0)")).alias("n_num"),
        # BPE-ish: greedy ≤4-char alpha chunks + digit runs + other symbols
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|[^a-z0-9 ]', 0)")
        ).alias("n_bpe"),
        F.size(
            F.expr("filter(split(text, ' '), w -> length(w) > 5)")
        ).alias("n_long_tokens"),
    ).orderBy("doc_id")


ORACLE_TEXT_TOKENS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+')) AS n_alpha,
       len(regexp_extract_all(text, '[0-9]+')) AS n_num,
       len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
       len(list_filter(string_split(text, ' '), w -> length(w) > 5))
         AS n_long_tokens
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------

def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of the normalized text plus a min-hash
    style rolling fingerprint (min over per-word 60-bit hashes)."""
    docs = _docs(spark, sf_dir)
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ''))"
    return docs.select(
        "doc_id",
        F.expr(f"md5({norm})").alias("fp_md5"),
        F.expr(
            f"array_min(transform(split({norm}, ' '), "
            f"w -> cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)))"
        ).alias("fp_min"),
    ).orderBy("doc_id")


ORACLE_TEXT_FP = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))) AS fp_md5,
       list_min(list_transform(
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), ' '),
         w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT))) AS fp_min
FROM documents ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Winnowing fingerprints (the MOSS selection rule)
# --------------------------------------------------------------------------

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # window: one fingerprint selected per W consecutive grams
# aggregate() seed: larger than any 60-bit md5-prefix hash, so the first
# real gram always replaces it
_WINNOW_SEED_H = 1 << 62


def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken 2003,
    the MOSS local fingerprinting algorithm): hash every character
    WINNOW_K-gram of the normalized text, slide a window of WINNOW_W
    consecutive gram hashes, and select the minimum hash per window —
    ties to the RIGHTMOST position (the paper's rule) — then keep the
    distinct (position, hash) selections. Guarantees any shared
    substring of length ≥ WINNOW_W + WINNOW_K − 1 contributes at least
    one common fingerprint, with expected density 2/(W+1) — the
    position-aware upgrade over ``text_fingerprint``'s global min-hash.

    Exactness: gram hashes are 60-bit md5 prefixes (engine-portable,
    ``functions/hashing.py``); selection is pure integer comparison; the
    left-to-right ``aggregate`` keeps a later gram on h ≤ acc.h, which
    IS rightmost-min — mirrored in SQL by ROW_NUMBER ordering
    (h ASC, p DESC). Short docs degrade exactly as both engines'
    substring/slice semantics agree: < K chars → one whole-text gram,
    < W grams → one shorter window.

    Scale posture: pure map-side higher-order expressions per document
    (O(len·W) comparisons, no Python) + one explode; output volume IS
    the fingerprint index (~2/(W+1) of corpus grams), the documented
    nature of a winnowing index build. The doc_id repartition below is
    load-bearing: the fixture corpus is one small parquet file → ONE
    input split, and the interpreted HOF evaluation is the rare
    CPU-bound-per-row map stage where a single task serializes the
    whole corpus (measured 20.1s → ~1s at sf0.1 once spread across the
    cores; SCALING_r08 found it). At 100 TB the scan has thousands of
    splits and the repartition is a no-op-sized insurance shuffle of
    raw docs. The partition count is EXPLICIT: AQE's byte-based
    coalescing sees a few MB of text and would merge the shuffle back
    into one task, re-serializing the CPU-bound stage (measured 12.9s
    vs 5.5s at sf0.1) — docs are small in bytes but heavy in compute,
    the one case byte-based coalescing misjudges."""
    docs = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )
    nrm = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ''))"
    # Bind norm AND the gram-hash array once each (nested
    # single-element-transform trick, see word_ngrams): interpreted
    # higher-order lambdas have no CSE, so inlining the gram array into
    # slice() re-hashed every gram once PER WINDOW — measured 235s →
    # 1.6s at sf0.001 for the winnow stage after binding it to `hs`.
    sel = (
        f"transform(array({nrm}), nrm -> "
        f"transform(array("
        f"  transform(sequence(1, greatest(length(nrm) - {WINNOW_K} + 1, 1)),"
        f"    i -> named_struct('p', i, 'h',"
        f"         cast(conv(substring(md5(substring(nrm, i, {WINNOW_K})), 1, 15), 16, 10) as bigint)))"
        f"), hs -> "
        f"transform("
        f"  sequence(1, greatest(size(hs) - {WINNOW_W} + 1, 1)),"
        f"  j -> aggregate(slice(hs, j, {WINNOW_W}),"
        f"    named_struct('p', 0, 'h', cast({_WINNOW_SEED_H} as bigint)),"
        f"    (acc, x) -> if(x.h <= acc.h, x, acc))))[0])[0]"
    )
    # distinct AFTER the explode, not array_distinct inside the lambda:
    # per-doc array_distinct is O(n²) interpreted struct equality (~30%
    # of the stage at sf0.1); the shuffle distinct runs on the already-
    # winnowed fingerprint stream (~2/(W+1) of gram volume) and shares
    # the presentation sort's exchange
    return (
        docs.select("doc_id", F.explode(F.expr(sel)).alias("s"))
        .select(
            "doc_id",
            F.col("s.p").alias("pos"),
            F.col("s.h").alias("fp"),
        )
        .distinct()
        .orderBy("doc_id", "pos")
    )


ORACLE_WINNOW = f"""
WITH d AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS nrm
  FROM documents),
g AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         CAST('0x' || substr(md5(substr(nrm, CAST(i AS INT), {WINNOW_K})), 1, 15)
              AS BIGINT) AS h,
         greatest(length(nrm) - {WINNOW_K} + 1, 1) AS n_g
  FROM d, LATERAL unnest(range(1, greatest(length(nrm) - {WINNOW_K} + 1, 1) + 1))
       AS t(i)),
win AS (
  SELECT s.doc_id, g.p, g.h,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id, s.p
                            ORDER BY g.h ASC, g.p DESC) AS rn
  FROM (SELECT doc_id, p FROM g
        WHERE p <= greatest(n_g - {WINNOW_W} + 1, 1)) s
  JOIN g ON g.doc_id = s.doc_id
        AND g.p BETWEEN s.p AND s.p + {WINNOW_W} - 1)
SELECT DISTINCT doc_id, p AS pos, h AS fp
FROM win WHERE rn = 1
ORDER BY doc_id, pos
"""


# --------------------------------------------------------------------------
# Composed cleaning pipeline: quality filter → exact dedup → per-lang stats
# --------------------------------------------------------------------------

MIN_TOKENS = 5
MIN_UNIQ = 0.3


def quality_gate_cond() -> F.Column:
    """The gate PREDICATE over a frame carrying ``ws = split(text, ' ')``
    — one definition shared by the filtering gate below and the
    single-pass conditional aggregate in ``corpus_funnel_stats``."""
    return (F.size("ws") >= MIN_TOKENS) & (
        F.expr("cast(size(array_distinct(ws)) as double) / size(ws)")
        >= MIN_UNIQ
    )


def corpus_quality_gate(docs: DataFrame) -> DataFrame:
    """Shared quality gate (length + lexical-diversity bounds, map-only).
    ONE definition used by both the batch pipeline and the streaming twin
    (streaming/jobs.run_clean_corpus_stream) so the oracle that gates the
    batch form transitively gates the stream's predicate."""
    docs = docs.withColumn("ws", F.split("text", " "))
    return docs.filter(quality_gate_cond())


def corpus_lang_stats(kept: DataFrame, include_first_doc: bool = True) -> DataFrame:
    """Shared per-language corpus stats over a gated+deduped frame.
    ``include_first_doc=False`` drops the only copy-SENSITIVE column, for
    consumers whose dedup keeps an arbitrary copy (streaming)."""
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(F.size("ws")).alias("total_tokens"),
        F.round(F.avg(F.size("ws").cast("double")), 4).alias("avg_tokens"),
    ]
    if include_first_doc:
        aggs.append(F.min("doc_id").alias("first_doc"))
    return kept.groupBy("lang").agg(*aggs).orderBy("lang")


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-data prep chain as ONE declarative plan:
    (1) quality gate (length + lexical-diversity bounds, map-only),
    (2) exact dedup keeping the smallest doc_id per content hash
        (single hash shuffle),
    (3) per-language corpus stats (second small shuffle).
    Catalyst pipelines 1 into the dedup shuffle's map side — filters never
    materialize an intermediate corpus."""
    gated = corpus_quality_gate(_docs(spark, sf_dir))
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return corpus_lang_stats(kept, include_first_doc=True)


ORACLE_PIPELINE = f"""
WITH gated AS (
  SELECT doc_id, lang, text, len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) >= {MIN_UNIQ}
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_docs,
       -- BIGINT cast: DuckDB SUM(BIGINT) yields HUGEINT → float64 via arrow
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(CAST(n_tokens AS DOUBLE)), 4) AS avg_tokens,
       MIN(doc_id) AS first_doc
FROM kept GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Deterministic dataset splitting (hash-mod, reproducible across engines)
# --------------------------------------------------------------------------

SPLIT_BUCKETS = 10  # md5-derived buckets: 8 train / 1 val / 1 test


def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test assignment by content-stable hash —
    reproducible on any engine/cluster (no RNG, no row order dependence),
    which is what a training pipeline actually needs from a splitter.
    Output: per (lang, split) doc counts — the split-balance report."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) "
        f"as bigint) % {SPLIT_BUCKETS}"
    )
    split = (
        F.when(bucket < SPLIT_BUCKETS - 2, "train")
        .when(bucket == SPLIT_BUCKETS - 2, "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


ORACLE_SPLIT = f"""
SELECT lang,
       CASE WHEN b < {SPLIT_BUCKETS - 2} THEN 'train'
            WHEN b = {SPLIT_BUCKETS - 2} THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM (SELECT lang,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
               % {SPLIT_BUCKETS} AS b
      FROM documents)
GROUP BY 1, 2 ORDER BY lang, split
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the HIGHEST-QUALITY copy per content hash
    (longest text, doc_id tiebreak) — the policy real corpus cleaning uses
    instead of keep-first. One hash shuffle (max_by-style aggregation)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.max(F.struct("n_chars", "doc_id")).alias("best"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "content_hash",
            "n_copies",
            F.col("best.doc_id").alias("keep_doc_id"),
            F.col("best.n_chars").alias("keep_n_chars"),
        )
        .orderBy("content_hash")
    )


ORACLE_KEEP_BEST = """
WITH ranked AS (
  SELECT md5(text) AS content_hash, doc_id, n_chars,
         COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id DESC) AS rn
  FROM documents)
SELECT content_hash, n_copies, doc_id AS keep_doc_id,
       n_chars AS keep_n_chars
FROM ranked WHERE rn = 1 AND n_copies > 1 ORDER BY content_hash
"""


# Target corpus-mixture keep thresholds out of MIX_BUCKETS hash buckets —
# integer thresholds, not float rates, so the keep predicate is exact and
# engine-independent (no 0.1*10000 ≠ 1000.0 double edge).
MIX_BUCKETS = 10_000
MIX_THRESHOLDS = {"src0": 10_000, "src1": 7_500, "src2": 5_000, "src3": 2_500}
MIX_DEFAULT_THRESHOLD = 1_000


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source downsampling to a target corpus mixture —
    how a training pipeline rebalances domains (keep all of src0, 75% of
    src1, ... 10% of the long tail). Membership is a content-stable salted
    md5 bucket of doc_id: no RNG, no row-order dependence, reproducible
    across engines and cluster sizes, and decorrelated from the
    train/val/test split hash by the salt. Map-only predicate + one small
    per-source agg — embarrassingly parallel at 100 TB."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        "cast(conv(substring(md5(concat('mix:', cast(doc_id as string))),"
        f" 1, 7), 16, 10) as bigint) % {MIX_BUCKETS}"
    )
    threshold = None
    for src, t in MIX_THRESHOLDS.items():
        cond = F.col("source") == src
        threshold = (
            F.when(cond, t) if threshold is None else threshold.when(cond, t)
        )
    threshold = threshold.otherwise(MIX_DEFAULT_THRESHOLD)
    kept = (bucket < threshold).cast("int")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_total"), F.sum(kept).alias("n_kept"))
        .orderBy("source")
    )


_DUCK_MIX_THRESHOLD = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {t}" for s, t in MIX_THRESHOLDS.items())
    + f" ELSE {MIX_DEFAULT_THRESHOLD} END"
)

ORACLE_MIX = f"""
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                          1, 7) AS BIGINT) % {MIX_BUCKETS}
                     < {_DUCK_MIX_THRESHOLD}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source ORDER BY source
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score — the boilerplate/spam signal
    quality filters cut on (a doc whose word 3-grams repeat heavily is
    template or loop output). rep_ratio = 1 − distinct/total trigrams.
    Pure map-side higher-order expressions; no shuffle."""
    docs = _docs(spark, sf_dir)
    grams = F.expr(
        """CASE WHEN size(split(text, ' ')) >= 3 THEN
             transform(sequence(1, size(split(text, ' ')) - 2), i ->
               concat_ws(' ', slice(split(text, ' '), i, 3)))
           ELSE array(text) END"""
    )
    return (
        docs.select("doc_id", grams.alias("g"))
        .select(
            "doc_id",
            F.size("g").alias("n_grams"),
            F.size(F.array_distinct("g")).alias("n_distinct"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct("g"))
                / F.size("g").cast("double")
            ).alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


ORACLE_REPETITION = """
SELECT doc_id, len(g) AS n_grams, len(list_distinct(g)) AS n_distinct,
       1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE) AS rep_ratio
FROM (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN
           list_transform(generate_series(1, len(ws) - 2), i ->
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         ELSE [text] END AS g
  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents))
ORDER BY doc_id
"""


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty: the share of a doc's distinct word trigrams that
    appear in NO other document — the self-information signal curation
    uses opposite to dedup (novel long-tail documents are kept/upweighted;
    documents whose every phrase exists elsewhere add little). Inverted-
    index shape: explode distinct (doc, trigram) pairs once, count
    document frequency per trigram (one hash shuffle with map-side
    combine), mark df==1 grams, re-aggregate per doc — no pairwise
    comparison anywhere, scales like the dedup indexes."""
    docs = _docs(spark, sf_dir)
    grams = F.expr(
        """CASE WHEN size(split(text, ' ')) >= 3 THEN
             transform(sequence(1, size(split(text, ' ')) - 2), i ->
               concat_ws(' ', slice(split(text, ' '), i, 3)))
           ELSE array(text) END"""
    )
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("g")
    )
    df_counts = pairs.groupBy("g").agg(F.count("*").alias("df"))
    return (
        pairs.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
            F.round(
                F.avg(F.when(F.col("df") == 1, 1.0).otherwise(0.0)), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


ORACLE_NOVELTY = """
WITH pairs AS (
  SELECT doc_id, unnest(list_distinct(g)) AS g
  FROM (
    SELECT doc_id,
           CASE WHEN len(ws) >= 3 THEN
             list_transform(generate_series(1, len(ws) - 2), i ->
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
           ELSE [text] END AS g
    FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
          FROM documents))),
dfc AS (SELECT g, COUNT(*) AS df FROM pairs GROUP BY g)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       ROUND(AVG(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty
FROM pairs JOIN dfc USING (g)
GROUP BY doc_id ORDER BY doc_id
"""


VOCAB_TOP_K = 20


def text_vocab_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: global top-K terms with counts and corpus
    share — the distribution report a data pipeline prints before choosing
    stopword/frequency cutoffs. Explode → one hash-shuffle count; total
    token count rides along as a single-row broadcast (no driver state)."""
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # Total token count from the post-shuffle aggregate (vocabulary-sized),
    # NOT a second scan+explode of the corpus.
    total = counts.agg(F.sum("cnt").alias("total"))
    # Global top-K via orderBy+limit → TakeOrderedAndProject: each task
    # keeps its local top-K, the driver merges K-sized heaps. The
    # unpartitioned row_number window then runs on K rows, never on the
    # full vocabulary (which at corpus scale would funnel one partition).
    top = counts.orderBy(F.desc("cnt"), F.asc("term")).limit(VOCAB_TOP_K)
    w = W.orderBy(F.desc("cnt"), F.asc("term"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "term",
            "cnt",
            (F.col("cnt") / F.col("total").cast("double")).alias("share"),
        )
        .orderBy("rank")
    )


ORACLE_VOCAB = f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT COUNT(*) AS total FROM toks)
SELECT rank, term, cnt, cnt / CAST(total AS DOUBLE) AS share
FROM (SELECT term, cnt, total,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank
      FROM counts CROSS JOIN total)
WHERE rank <= {VOCAB_TOP_K}
ORDER BY rank
"""


SAMPLE_PER_SOURCE_K = 10
# Salt fan-out for the skew-safe two-stage top-K. `source` is a
# low-cardinality power-law key: a single window partitioned by source
# funnels the dominant domain into ONE task's sort at corpus scale. With
# S salts the heavy sort runs per (source, salt) — S-way parallel — and
# the final re-rank sees at most S*K rows per source.
SAMPLE_SALTS = 8


def sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped uniform sample per source: keep at most K docs per domain,
    chosen by rank of a salted content hash — a deterministic
    without-replacement sample (no RNG, stable across engines/cluster
    sizes), the standard way to cap an over-represented domain.

    Skew-safe salt-and-re-rank, two stages:
      1. salt = pmod(hash(doc_id), S) (content-stable, any deterministic
         bucketing works — the salt never reaches the result); window
         partitioned by (source, salt) keeps each bucket's local top-K.
         The dominant domain's sort spreads over S tasks.
      2. re-rank the <= S*K survivors per source with the plain
         per-source window — bounded input, trivially one small task.
    Every row of the true per-source top-K is in its own salt bucket's
    top-K (at most K-1 rows precede it globally, hence in its bucket),
    so the union of stage-1 survivors always contains the answer and the
    result is identical to the single-window form the oracle runs."""
    docs = _docs(spark, sf_dir)
    rank_key = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    salt = F.pmod(F.hash("doc_id"), F.lit(SAMPLE_SALTS)).alias("salt")
    w_salted = W.partitionBy("source", "salt").orderBy(
        rank_key.asc(), F.col("doc_id").asc()
    )
    survivors = (
        docs.select("source", "doc_id", salt)
        .withColumn("rn_local", F.row_number().over(w_salted))
        .filter(F.col("rn_local") <= SAMPLE_PER_SOURCE_K)
    )
    w_final = W.partitionBy("source").orderBy(
        rank_key.asc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= SAMPLE_PER_SOURCE_K)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


ORACLE_SAMPLE_PER_SOURCE = f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= {SAMPLE_PER_SOURCE_K}
ORDER BY source, doc_id
"""


PACK_BIN_TOKENS = 2048
# Width of a doc_id range-shard for the skew-safe two-pass running sum.
# A running sum is inherently sequential in doc_id order, so unlike the
# sample cap it cannot be salted by an arbitrary hash — the shard must be
# a CONTIGUOUS doc_id range so that "offset of my shard" + "running sum
# within my shard" reproduces the global running sum exactly.
PACK_SHARD_SPAN = 64
# Hard bound on the offsets side that gets broadcast back (one row per
# (source, shard)). A FIXED span of 64 makes that side n_docs/64 rows —
# at 100 TB it would exceed executor memory; instead the span scales so
# there are at most this many shards, keeping the broadcast genuinely
# bounded (~PACK_MAX_SHARDS rows) at any corpus size. The span is
# invisible to the result: bin_id depends only on the exact global
# running sum, which every span reproduces bit-for-bit.
PACK_MAX_SHARDS = 4096


def pack_context_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context-window packing report: per source, documents are
    laid out in doc_id order and chunked into PACK_BIN_TOKENS-token bins
    by exclusive running token count — the concat-and-chunk packing a
    pretraining loader does (documents may straddle bin boundaries;
    boundaries are deterministic).

    Skew-safe two-pass prefix sum (a running sum is sequential, so the
    naive per-source window funnels the dominant domain into one task):
      1. shard = doc_id div SPAN — contiguous doc_id ranges, monotone in
         the packing order. Per-(source, shard) token totals are one
         small agg (rows = shards, not docs).
      2. exclusive prefix offsets over the shard totals via a per-source
         window — runs on the tiny totals table only, then broadcast-
         joins back.
      3. the per-doc exclusive running sum windows on (source, shard):
         the heavy sort/stream spreads over all shards of a domain.
    shard_offset + local running sum == global running sum, bit-exact,
    so the result (and the single-window oracle) is unchanged.

    The span adapts to corpus size (max(PACK_SHARD_SPAN, max_doc_id /
    PACK_MAX_SHARDS)) so the offsets side broadcast in step 2 is bounded
    by ~PACK_MAX_SHARDS rows at ANY scale — a fixed span would make it
    n_docs/span rows, which at 100 TB is no longer a broadcastable side.
    The bound probe is one agg over the int column (parquet column stats
    make it cheap), and the span never changes the result."""
    docs = _docs(spark, sf_dir)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] or 0
    span = max(PACK_SHARD_SPAN, -(-int(max_id) // PACK_MAX_SHARDS))
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(f"doc_id div {span}").alias("shard"),
    )
    shard_totals = toks.groupBy("source", "shard").agg(
        F.sum("n_tokens").alias("shard_tokens")
    )
    w_off = (
        W.partitionBy("source")
        .orderBy("shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = shard_totals.select(
        "source",
        "shard",
        F.coalesce(F.sum("shard_tokens").over(w_off), F.lit(0)).alias(
            "shard_offset"
        ),
    )
    w_local = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local_excl = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    return (
        toks.join(F.broadcast(offsets), ["source", "shard"])
        .withColumn("run_excl", F.col("shard_offset") + local_excl)
        .withColumn("bin_id", F.expr(f"run_excl div {PACK_BIN_TOKENS}"))
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


ORACLE_PACK_BINS = f"""
SELECT source, CAST(run_excl // {PACK_BIN_TOKENS} AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM (
  SELECT source, doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS run_excl
  FROM (SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tokens FROM documents))
GROUP BY 1, 2 ORDER BY source, bin_id
"""


# Quality-weighted sampling: p(keep) = min(1, n_chars / WSAMPLE_CAP),
# realized as an exact integer predicate over a content-stable md5 bucket
# (bucket * CAP < n_chars * BUCKETS ⇔ bucket/BUCKETS < n_chars/CAP) — no
# RNG, no floats near the boundary, reproducible on any engine/cluster.
WSAMPLE_CAP = 400


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling — longer (better-scoring)
    documents keep proportionally higher probability, the way a training
    mixture up-weights high-quality text. Deterministic: membership is a
    salted md5 bucket of doc_id compared against the per-doc weight with
    integer cross-multiplication (exact on both engines). Map-only
    predicate + one small per-source agg — embarrassingly parallel."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        "cast(conv(substring(md5(concat('wsamp:', cast(doc_id as string))),"
        f" 1, 7), 16, 10) as bigint) % {MIX_BUCKETS}"
    )
    kept = (bucket * WSAMPLE_CAP < F.col("n_chars") * MIX_BUCKETS).cast("int")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(kept).alias("n_kept"),
            F.sum(F.col("n_chars") * kept).alias("kept_chars"),
        )
        .orderBy("source")
    )


ORACLE_WEIGHTED_SAMPLE = f"""
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(k) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars * k) AS BIGINT) AS kept_chars
FROM (
  SELECT source, n_chars,
         CASE WHEN CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)),
                        1, 7) AS BIGINT) % {MIX_BUCKETS} * {WSAMPLE_CAP}
                   < n_chars * {MIX_BUCKETS}
              THEN 1 ELSE 0 END AS k
  FROM documents)
GROUP BY source ORDER BY source
"""


AES_K = 10  # exactly-K weighted sample per source


def sample_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-K weighted sampling WITHOUT replacement per source —
    Efraimidis–Spirakis A-ES: each doc draws a deterministic uniform
    u ∈ (0,1] from a salted md5 of its id, its key is ln(u)/weight
    (equivalent to ranking by u^(1/w)), and the top-{AES_K} keys per
    group are the sample. Unlike the threshold sampler
    (corpus_weighted_sample — an EXPECTED fraction), this yields a fixed
    sample SIZE — the eval-subset draw — and is one window over a
    per-group stream (single source-keyed shuffle; at heavy skew the
    salt-and-re-rank rewrite of sample_per_source applies unchanged).

    Determinism across engines: u is exact (integer hash / 2⁶⁰), but ln
    comes from each engine's libm — the key is rounded to 9 dp so a
    last-ulp ln difference cannot reorder, and doc_id breaks residual
    ties totally."""
    docs = _docs(spark, sf_dir)
    u = (
        F.expr(
            "cast(conv(substring(md5(concat('aes:', cast(doc_id as string))),"
            " 1, 15), 16, 10) as double)"
        )
        + 1.0
    ) / float((1 << 60) + 1)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    w = W.partitionBy("source").orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= AES_K)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
        .orderBy("source", "rk")
    )


ORACLE_AES = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ROUND(ln((CAST('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)),
                        1, 15) AS BIGINT) + 1.0) / {float((1 << 60) + 1)!r})
               / n_chars, 9) AS key
  FROM documents),
ranked AS (
  SELECT doc_id, source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY key DESC, doc_id ASC) AS INT) AS rk
  FROM keyed)
SELECT doc_id, source, n_chars, rk FROM ranked
WHERE rk <= {AES_K}
ORDER BY source, rk
"""


# Train/eval decontamination: n-gram width and the deterministic rule
# that carves the fixture's "benchmark" set out of `documents`. Real
# pipelines use 8-13-gram overlap against MMLU/GSM8K-style sets; the
# synthetic fixture texts only collide at 3-grams, so the WIDTH is a
# constant — the plan shape (tiny broadcast eval side) is what matters.
DECON_NGRAM = 3
DECON_EVAL_MOD = 97  # doc_id % 97 == 0 → "benchmark" docs


def _shingle_expr(width: int) -> F.Column:
    return F.expr(
        f"""CASE WHEN size(split(text, ' ')) >= {width} THEN
              transform(sequence(1, size(split(text, ' ')) - {width - 1}), i ->
                concat_ws(' ', slice(split(text, ' '), i, {width})))
            ELSE array() END"""
    )


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination — flag training documents sharing any
    word {DECON_NGRAM}-gram with the benchmark ("eval") set, the standard
    leakage check a pretraining pipeline runs before training.

    Plan shape at scale: the eval side (benchmark suites are tiny —
    thousands of rows against billions) reduces to DISTINCT shingles and
    BROADCASTS into the train side's exploded-shingle stream, so the only
    fact-sized shuffle is the per-doc groupBy on doc_id (high
    cardinality). No eval-side skew can exist: the broadcast hash join is
    map-side. Per-doc distinct shingles via array_distinct BEFORE the
    explode keeps the exploded row count minimal."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.array_distinct(_shingle_expr(DECON_NGRAM)).alias("shingles"),
    )
    ev = (
        sh.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    exploded = train.select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.explode_outer("shingles").alias("s"),
    )
    matched = (
        exploded.join(F.broadcast(ev), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        train.select("doc_id", F.size("shingles").alias("n_shingles"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


ORACLE_DECON = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(ws) >= {DECON_NGRAM} THEN
           list_transform(generate_series(1, len(ws) - {DECON_NGRAM - 1}),
             i -> array_to_string(ws[i:i+{DECON_NGRAM - 1}], ' '))
         ELSE [] END) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
ev AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh
  WHERE doc_id % {DECON_EVAL_MOD} = 0),
train AS (SELECT * FROM sh WHERE doc_id % {DECON_EVAL_MOD} <> 0),
matched AS (
  SELECT doc_id, COUNT(*) AS n_matched
  FROM (SELECT doc_id, unnest(shingles) AS s FROM train) t
  WHERE s IN (SELECT s FROM ev)
  GROUP BY doc_id)
SELECT t.doc_id, len(t.shingles) AS n_shingles,
       COALESCE(m.n_matched, 0) AS n_matched,
       COALESCE(m.n_matched, 0) > 0 AS contaminated
FROM train t LEFT JOIN matched m USING (doc_id)
ORDER BY t.doc_id
"""


BLOOM_BITS = 1 << 17  # 131072-bit filter → 2048 longs ≈ 16 KB broadcast
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 5  # probes per shingle (double hashing, Kirsch–Mitzenmacher)


def _bloom_pos_sql(i: int, col: str = "s") -> str:
    """SQL for the i-th bloom bit position of shingle column ``col`` via
    double hashing: pos_i = (h1 + i·h2) mod M with both hashes pre-reduced
    mod M so the combine cannot overflow a long under ANSI arithmetic.
    Emitted as SQL text (not Column algebra) because the membership test
    needs shiftleft with a COLUMN shift amount, which the Python API
    rejects but SQL accepts — and this keeps the whole probe in codegen."""
    m = BLOOM_BITS
    h1 = f"pmod(xxhash64({col}), {m}L)"
    h2 = f"pmod(xxhash64(concat({col}, '#bloom')), {m}L)"
    return f"pmod({h1} + {i}L * {h2}, {m}L)"


def _bloom_hit_sql(i: int, col: str = "s") -> str:
    """SQL predicate: bit pos_i(col) is set in the broadcast bloom_bits."""
    p = _bloom_pos_sql(i, col)
    word = f"element_at(bloom_bits, cast(shiftright({p}, 6) as int) + 1)"
    mask = f"shiftleft(1L, cast({p} % 64 as int))"
    return f"(({word} & {mask}) != 0)"


def build_bloom_bitset(df: DataFrame, col_sql: str = "s") -> list[int]:
    """Distributed bloom-bitset build over ``col_sql`` (a string-typed SQL
    expression on ``df``): k positions per value → distinct bit ids →
    64-bit words via BIT_OR — at most BLOOM_WORDS rows ever reach the
    driver, whatever the input size. Shared by the decontamination
    prefilter and the join-key semi-join reduction."""
    pos = df.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql(i, col_sql)) for i in range(BLOOM_K)])
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitset = [0] * BLOOM_WORDS
    for r in words:
        bitset[r["w"]] = r["bits"]
    return bitset


def bloom_pass_sql(col_sql: str = "s") -> str:
    """Conjunction of the k membership probes against a broadcast
    ``bloom_bits`` column — pure codegen (xxhash64 + bit ops)."""
    return " AND ".join(_bloom_hit_sql(i, col_sql) for i in range(BLOOM_K))


def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination with a Bloom-filter prefilter — the
    100 TB form of :func:`decontaminate_ngram`. The eval side compresses
    to a FIXED-SIZE bitset (BLOOM_BITS = 128 Ki bits ≈ 16 KB broadcast,
    independent of eval-set size, vs a shingle-set broadcast that grows
    with the benchmark suite); the train side's exploded shingle stream is
    probed against the bitset entirely in whole-stage codegen (xxhash64 +
    bit ops on a broadcast array<long>), and only bloom-surviving shingles
    reach the exact verification join.

    Correctness is a theorem, not a tolerance: Bloom filters have NO false
    negatives, and the exact semi-join removes every false positive — so
    the output is bit-identical to exact decontamination, and the oracle
    IS the exact-decontamination SQL. The bitset is built distributed
    (explode → distinct → groupBy word → BIT_OR) and the driver collects
    only the ≤{BLOOM_WORDS}-row word table. At scale the verify join can
    fall back to a shuffle join if the eval shingle set outgrows the
    broadcast threshold; the bloom prune upstream is what keeps that
    join's fact side small."""
    # Profiled for VERDICT r10 #5: the sf0.1 wall is the ONE-TIME eager
    # bitset-build job (eval shingles -> distinct -> BIT_OR -> a
    # <=BLOOM_WORDS-row collect; ~2.6s of the ~3.7s first run), not the
    # probe or the verify join — re-running the built op costs ~1.1s. An
    # upstream repartition("doc_id") was A/B-tested and is a net LOSS
    # here (+0.6s: it adds a raw-doc shuffle that every branch pays,
    # while the build is eval-slice-sized anyway). At 100 TB the build
    # cost scales with the EVAL suite, not the train corpus — inherent
    # and constant; the train-side probe is the part that scales, and it
    # is pure codegen.
    #
    # r15 optimization round: r10's rejected experiment was an
    # UNCONDITIONAL repartition; the r14 size-guarded catalog.load_par is
    # a different trade — both the bitset-build map stage and the
    # train-side probe ran single-task on the sub-split fixture scan, and
    # the guard removes the shuffle entirely at real scale (guide §2.4).
    # Gated order-balanced A/B (tools/exp_decon_bloom_r15.py): min
    # 6.62s → 4.94s at sf0.1, output identical, oracle green at 3 SFs.
    docs = catalog.load_par(spark, sf_dir, "documents", "doc_id")
    sh = docs.select(
        "doc_id",
        F.array_distinct(_shingle_expr(DECON_NGRAM)).alias("shingles"),
    )
    ev = (
        sh.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    bloom = spark.createDataFrame(
        [(build_bloom_bitset(ev),)], "bloom_bits array<long> not null"
    )

    train = sh.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    exploded = train.select("doc_id", F.explode("shingles").alias("s"))
    probed = exploded.join(F.broadcast(bloom))
    cand = probed.filter(F.expr(bloom_pass_sql())).select("doc_id", "s")
    matched = (
        cand.join(F.broadcast(ev), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    return (
        train.select("doc_id", F.size("shingles").alias("n_shingles"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# The oracle is deliberately the EXACT decontamination SQL: bloom has no
# false negatives and the semi-join strips false positives, so the bloom
# path must reproduce the exact result bit-for-bit.
ORACLE_DECON_BLOOM = ORACLE_DECON


REDACT_TOP = 5  # deny-list size: the top-N corpus tokens


def text_redact_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deny-list redaction — strip a bounded dictionary of forbidden
    tokens (boilerplate, watermark phrases, blocklisted strings) from
    every document, the scrub step a corpus pipeline runs before
    training. The deny list here is data-derived (top-{REDACT_TOP}
    corpus tokens by frequency, term-ascending tie-break) so the fixture
    exercises real hits; in production it's a supplied dictionary.

    Redaction is pure higher-order-function codegen — ``filter(ws, t ->
    NOT array_contains(deny, t))`` — no regex dialect risk, no Python.
    The deny list is a driver-bounded collect of {REDACT_TOP} rows
    folded into the plan as a literal; the redacted text is verified
    bit-for-bit via md5 of the rejoined token stream."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
    top = (
        toks.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(REDACT_TOP)
        .collect()
    )
    deny = [r["t"] for r in top]
    deny_arr = F.array(*[F.lit(t) for t in deny])
    ws = F.split("text", " ")
    kept = F.filter(ws, lambda t: ~F.array_contains(deny_arr, t))
    return docs.select(
        "doc_id",
        (F.size(ws) - F.size(kept)).cast("long").alias("n_redacted"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.md5(F.concat_ws(" ", kept)).alias("redacted_md5"),
    ).orderBy("doc_id")


ORACLE_REDACT = f"""
WITH deny AS (
  SELECT t FROM (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t ORDER BY COUNT(*) DESC, t ASC LIMIT {REDACT_TOP}),
dl AS (SELECT list(t) AS dl FROM deny),
d AS (SELECT doc_id, string_split(text, ' ') AS ws, dl.dl
      FROM documents CROSS JOIN dl),
r AS (
  SELECT doc_id, ws,
         list_filter(ws, t -> NOT list_contains(dl, t)) AS kept
  FROM d)
SELECT doc_id,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_redacted,
       CAST(len(kept) AS BIGINT) AS n_tokens_after,
       md5(array_to_string(kept, ' ')) AS redacted_md5
FROM r ORDER BY doc_id
"""


CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunking — the RAG / context-window
    segmentation step: every document becomes ⌈(n−C)/S⌉+1 chunks of
    C={CHUNK_TOKENS} tokens at stride S={CHUNK_STRIDE} (overlap C−S), so
    any C-token span is fully contained in some chunk. Map-only: the
    chunk index list is a ``sequence`` per row, ``posexplode``d, each
    chunk a ``slice`` of the token array — no shuffle at all until the
    output sort, which a production writer drops. Chunk identity is
    md5(token-joined text) so the oracle pins the exact content, not just
    counts."""
    return _chunks_of(_docs(spark, sf_dir)).orderBy("doc_id", "chunk_idx")


def _chunks_of(docs: DataFrame) -> DataFrame:
    """Chunking core over any (doc_id, text) frame — shared by the
    standalone chunker and the end-to-end training pipeline. Returns
    (doc_id, chunk_idx, start_tok, n_tok, chunk_md5), unsorted."""
    ws = F.split("text", " ")
    base = docs.select(
        "doc_id",
        ws.alias("ws"),
        (
            F.lit(1)
            + F.floor(
                (
                    F.greatest(F.size(ws) - F.lit(CHUNK_TOKENS), F.lit(0))
                    + F.lit(CHUNK_STRIDE - 1)
                )
                / F.lit(CHUNK_STRIDE)
            )
        ).cast("int").alias("n_chunks"),
    )
    ex = base.select(
        "doc_id",
        "ws",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_idx", "_k"
        ),
    )
    start = F.lit(1) + F.col("chunk_idx") * F.lit(CHUNK_STRIDE)
    chunk = F.slice("ws", start, F.lit(CHUNK_TOKENS))
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


ORACLE_CHUNK = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         1 + CAST(floor((greatest(len(string_split(text, ' ')) - {CHUNK_TOKENS}, 0)
                         + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE}) AS INT)
           AS n_chunks
  FROM documents),
ex AS (
  SELECT doc_id, ws, CAST(k AS INT) AS chunk_idx,
         1 + CAST(k AS BIGINT) * {CHUNK_STRIDE} AS start_tok
  FROM d, LATERAL unnest(generate_series(0, n_chunks - 1)) AS u(k)),
c AS (
  SELECT doc_id, chunk_idx, start_tok,
         ws[start_tok : start_tok + {CHUNK_TOKENS - 1}] AS chunk
  FROM ex)
SELECT doc_id, chunk_idx, CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(chunk) AS BIGINT) AS n_tok,
       md5(array_to_string(chunk, ' ')) AS chunk_md5
FROM c ORDER BY doc_id, chunk_idx
"""


def dedup_chunks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at TRAINING-EXAMPLE granularity — after chunking
    (text_chunk_overlap), identical chunks across documents are the rows
    a dataloader would see twice, even when their parent documents are
    not document-level duplicates (shared boilerplate, quoted passages).
    Keep policy: the (doc_id, chunk_idx)-minimal copy of each distinct
    chunk content survives; every chunk row is emitted with its verdict
    and copy count. One hash shuffle on chunk_md5 (the md5 IS the
    grouping key — content equality without re-shipping text), one
    window for the deterministic keeper."""
    chunks = text_chunk_overlap(spark, sf_dir).select(
        "doc_id", "chunk_idx", "chunk_md5"
    )
    w = W.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    return (
        chunks.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_copies", F.count("*").over(W.partitionBy("chunk_md5"))
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_md5",
            (F.col("rk") == 1).alias("keep"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


ORACLE_CHUNK_DEDUP = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         1 + CAST(floor((greatest(len(string_split(text, ' ')) - {{ct}}, 0)
                         + {{cs1}}) / {{cs}}) AS INT) AS n_chunks
  FROM documents),
ex AS (
  SELECT doc_id, ws, CAST(k AS INT) AS chunk_idx,
         1 + CAST(k AS BIGINT) * {{cs}} AS start_tok
  FROM d, LATERAL unnest(generate_series(0, n_chunks - 1)) AS u(k)),
c AS (
  SELECT doc_id, chunk_idx,
         md5(array_to_string(ws[start_tok : start_tok + {{ct1}}], ' '))
           AS chunk_md5
  FROM ex)
SELECT doc_id, chunk_idx, chunk_md5,
       ROW_NUMBER() OVER (PARTITION BY chunk_md5
                          ORDER BY doc_id, chunk_idx) = 1 AS keep,
       CAST(COUNT(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS n_copies
FROM c
ORDER BY doc_id, chunk_idx
""".format(
    ct=CHUNK_TOKENS, cs=CHUNK_STRIDE, cs1=CHUNK_STRIDE - 1, ct1=CHUNK_TOKENS - 1
)


def pipeline_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data funnel as one declarative plan — the
    end-to-end composition a pretraining team actually ships, with
    per-source attrition at every stage:

      raw docs → quality gate (map-only) → exact dedup (one hash
      shuffle) → eval-set decontamination (broadcast semi-join on
      shingles) → overlapping chunking (map-only explode) → chunk-level
      exact dedup (one hash shuffle) → per-source funnel report.

    Every stage is the SAME shared machinery its standalone
    oracle-checked query uses (corpus_quality_gate, the md5-keeper
    window, _shingle_expr, _chunks_of), so this query proves the stages
    COMPOSE — Catalyst pipelines the whole funnel into four shuffles
    (doc hash, doc_id groupBy, chunk hash, source summary) with no
    intermediate materialization."""
    docs = _docs(spark, sf_dir)
    gated = corpus_quality_gate(docs)
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    ev = (
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(
            F.explode(F.array_distinct(_shingle_expr(DECON_NGRAM))).alias("s")
        )
        .distinct()
    )
    train = deduped.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    contaminated = (
        train.select(
            "doc_id",
            F.explode(F.array_distinct(_shingle_expr(DECON_NGRAM))).alias("s"),
        )
        .join(F.broadcast(ev), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    chunks = _chunks_of(clean).join(
        clean.select("doc_id", "source"), "doc_id"
    )
    wc = W.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    chunks = chunks.withColumn("ck", F.row_number().over(wc))
    n_in = docs.groupBy("source").agg(F.count("*").alias("n_docs_in"))
    n_clean = clean.groupBy("source").agg(F.count("*").alias("n_docs_kept"))
    n_chunks = chunks.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("ck") == 1, 1).otherwise(0)).alias("n_chunks_kept"),
    )
    return (
        n_in.join(n_clean, "source", "left")
        .join(n_chunks, "source", "left")
        .select(
            "source",
            F.col("n_docs_in").cast("long").alias("n_docs_in"),
            F.coalesce("n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_chunks_kept", F.lit(0))
            .cast("long")
            .alias("n_chunks_kept"),
        )
        .orderBy("source")
    )


_PIPE_SHINGLES = f"""list_distinct(CASE WHEN len(ws) >= {DECON_NGRAM} THEN
           list_transform(generate_series(1, len(ws) - {DECON_NGRAM - 1}),
             i -> array_to_string(ws[i:i+{DECON_NGRAM - 1}], ' '))
         ELSE [] END)"""

ORACLE_PIPE_EXAMPLES = f"""
WITH gated AS (
  SELECT doc_id, source, text FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) >= {MIN_UNIQ}),
deduped AS (
  SELECT doc_id, source, text FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1),
ev AS (
  SELECT DISTINCT unnest({_PIPE_SHINGLES}) AS s
  FROM (SELECT string_split(text, ' ') AS ws FROM documents
        WHERE doc_id % {DECON_EVAL_MOD} = 0)),
train AS (SELECT * FROM deduped WHERE doc_id % {DECON_EVAL_MOD} <> 0),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_id, unnest({_PIPE_SHINGLES}) AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM train))
  WHERE s IN (SELECT s FROM ev)),
clean AS (
  SELECT * FROM train WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
cd AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws,
         1 + CAST(floor((greatest(len(string_split(text, ' ')) - {CHUNK_TOKENS}, 0)
                         + {CHUNK_STRIDE - 1}) / {CHUNK_STRIDE}) AS INT)
           AS n_chunks
  FROM clean),
chunks AS (
  SELECT doc_id, source, CAST(k AS INT) AS chunk_idx,
         md5(array_to_string(
           ws[1 + CAST(k AS BIGINT) * {CHUNK_STRIDE} :
              CAST(k AS BIGINT) * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
           AS chunk_md5
  FROM cd, LATERAL unnest(generate_series(0, n_chunks - 1)) AS u(k)),
ck AS (
  SELECT source,
         ROW_NUMBER() OVER (PARTITION BY chunk_md5
                            ORDER BY doc_id, chunk_idx) AS ck
  FROM chunks),
n_in AS (SELECT source, COUNT(*) AS n_docs_in FROM documents GROUP BY 1),
n_clean AS (SELECT source, COUNT(*) AS n_docs_kept FROM clean GROUP BY 1),
n_ch AS (
  SELECT source, COUNT(*) AS n_chunks,
         SUM(CASE WHEN ck = 1 THEN 1 ELSE 0 END) AS n_chunks_kept
  FROM ck GROUP BY 1)
SELECT i.source,
       CAST(i.n_docs_in AS BIGINT) AS n_docs_in,
       CAST(COALESCE(c.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(h.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(h.n_chunks_kept, 0) AS BIGINT) AS n_chunks_kept
FROM n_in i LEFT JOIN n_clean c USING (source) LEFT JOIN n_ch h USING (source)
ORDER BY i.source
"""


KL_TOP_V = 500  # vocabulary cap: KL computed over the corpus top-V terms


def text_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution —
    the domain-mix diagnostic: how far each source's token distribution
    sits from the blend it contributes to (high KL → distinct domain;
    near 0 → redundant with the mix). Distributions restricted to the
    corpus top-{KL_TOP_V} vocabulary (count-desc, term-asc tie-break) so
    the statistic is bounded and p_corpus > 0 wherever p_source > 0 —
    no smoothing needed.

    Shuffles: one (source, term) groupBy on the fact stream, one
    vocab-sized groupBy, top-V via TakeOrderedAndProject, then all
    remaining joins are on the ≤V-row vocabulary — broadcast, skew-free
    at any corpus size."""
    docs = _docs(spark, sf_dir)
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("c"))
    )
    vocab = (
        st.groupBy("t")
        .agg(F.sum("c").alias("cc"))
        .orderBy(F.desc("cc"), F.asc("t"))
        .limit(KL_TOP_V)
    )
    stv = st.join(F.broadcast(vocab), "t")
    # corpus totals restricted to the top-V vocab, as a 1-row broadcast
    tot_c = stv.agg(F.sum("c").cast("double").alias("tot_c"))
    per_src = stv.groupBy("source").agg(F.sum("c").cast("double").alias("tot_s"))
    j = (
        stv.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot_c))
        .select(
            "source",
            (F.col("c") / F.col("tot_s")).alias("p_s"),
            (F.col("cc") / F.col("tot_c")).alias("p_c"),
        )
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum(F.col("p_s") * F.log(F.col("p_s") / F.col("p_c"))), 6).alias(
                "kl_nats"
            ),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_KL = f"""
WITH st AS (
  SELECT source, t, COUNT(*) AS c FROM (
    SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY 1, 2),
vocab AS (
  SELECT t, SUM(c) AS cc FROM st GROUP BY t
  ORDER BY SUM(c) DESC, t ASC LIMIT {KL_TOP_V}),
stv AS (SELECT st.source, st.t, st.c, vocab.cc FROM st JOIN vocab USING (t)),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot_c FROM stv),
per_src AS (SELECT source, CAST(SUM(c) AS DOUBLE) AS tot_s
            FROM stv GROUP BY source)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(SUM((s.c / p.tot_s) * ln((s.c / p.tot_s) / (s.cc / t.tot_c))), 6)
         AS kl_nats
FROM stv s JOIN per_src p USING (source) CROSS JOIN tot t
GROUP BY s.source
ORDER BY s.source
"""


TFIDF_TOP_K = 3


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k distinguishing terms by TF-IDF — the classic
    corpus-featurization step a training pipeline runs before topic
    filtering or domain mixing.

    Plan shape at scale: tokenize map-side, ONE shuffle on (doc_id, term)
    for term frequency, one vocabulary-sized shuffle on term for document
    frequency, corpus size as a single-row broadcast (no driver collect),
    then a window on doc_id for top-k. Every stage keys on high-cardinality
    columns — no skew hotspot, no driver state; holds at 100 TB."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("ws"))
    toks = docs.select(
        "doc_id", F.size("ws").alias("n_tokens"), F.explode("ws").alias("term")
    )
    tf = toks.groupBy("doc_id", "term", "n_tokens").agg(F.count("*").alias("tc"))
    docfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    tfidf = (
        F.col("tc").cast("double") / F.col("n_tokens")
    ) * F.log(F.col("n_docs").cast("double") / F.col("df"))
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", tfidf)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


ORACLE_TFIDF = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (SELECT doc_id, len(ws) AS n_tokens, unnest(ws) AS term FROM ws),
tf AS (SELECT doc_id, term, n_tokens, COUNT(*) AS tc
       FROM toks GROUP BY doc_id, term, n_tokens),
docfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ws)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT doc_id, term,
         (CAST(tc AS DOUBLE) / n_tokens)
           * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY (CAST(tc AS DOUBLE) / n_tokens)
                      * ln(CAST(n_docs AS DOUBLE) / df) DESC, term) AS rnk
  FROM tf JOIN docfreq USING (term) CROSS JOIN n)
WHERE rnk <= {TFIDF_TOP_K} ORDER BY doc_id, rnk
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: each document's mean per-token log
    probability under the corpus's own unigram distribution — the cheap
    stand-in for KenLM-style perplexity filtering (gibberish and
    boilerplate-with-rare-tokens score low; fluent text near the corpus
    mode scores high). Two aggregation passes over one explode:
      1. global term counts (one hash shuffle; map-side combine keeps
         the exchange vocabulary-sized, not token-sized);
      2. tokens re-join their term's count on the term key — a shuffle
         join whose skew (stopwords are power-law hot) AQE splits —
         then a per-doc avg of ln(cnt/total).
    The single-row total rides along as a broadcast, never driver state.
    At 100 TB the vocab side is bounded by language vocabulary, not
    corpus size, so the join stays healthy as data grows."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total").cast("double"))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


ORACLE_UNIGRAM_LOGPROB = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT SUM(cnt) AS total FROM counts)
SELECT doc_id, COUNT(*) AS n_toks,
       ROUND(AVG(ln(cnt / CAST(total AS DOUBLE))), 6) AS avg_logprob
FROM toks JOIN counts USING (term) CROSS JOIN total
GROUP BY doc_id ORDER BY doc_id
"""


def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-LM coherence: each document's mean bigram log
    probability ln(c(w1,w2)/c(w1)) under the corpus's own bigram model —
    one notch past text_unigram_logprob (a doc of common-but-shuffled
    words scores high on unigrams, low here; word-salad detection).
    Three aggregations sharing the explode: corpus bigram counts, corpus
    head-word counts, then per-doc averaging after two keyed joins on
    the bigram/word keys (stopword-skew AQE-split, vocab-bounded sides —
    the same join posture as the unigram scorer)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("i", "w"),
    )
    # per-doc bigrams via self-join on adjacent positions — keyed by
    # (doc_id) so it rides ONE shuffle of the narrow token stream
    nxt = toks.select(
        "doc_id", (F.col("i") - 1).alias("i"), F.col("w").alias("w2")
    )
    bigrams = toks.join(nxt, ["doc_id", "i"]).select("doc_id", "w", "w2")
    bg_counts = bigrams.groupBy("w", "w2").agg(F.count("*").alias("c2"))
    w_counts = bigrams.groupBy("w").agg(F.count("*").alias("c1"))
    return (
        bigrams.join(bg_counts, ["w", "w2"])
        .join(w_counts, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("c2") / F.col("c1").cast("double"))), 6
            ).alias("avg_bigram_logprob"),
        )
        .orderBy("doc_id")
    )


ORACLE_BIGRAM = """
WITH toks AS (
  SELECT doc_id, i, ws[i] AS w, ws[i+1] AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL unnest(generate_series(1, len(ws) - 1)) AS u(i)
  WHERE len(ws) >= 2),
bg AS (SELECT w, w2, COUNT(*) AS c2 FROM toks GROUP BY 1, 2),
wc AS (SELECT w, COUNT(*) AS c1 FROM toks GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(ln(c2 / CAST(c1 AS DOUBLE))), 6) AS avg_bigram_logprob
FROM toks JOIN bg USING (w, w2) JOIN wc USING (w)
GROUP BY doc_id ORDER BY doc_id
"""


ZIPF_HEAD = 200  # head terms per source used for the log-log fit


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: regression slope of ln(freq) on
    ln(rank) over each domain's vocabulary head — natural text sits near
    −1; templated/spammy domains flatten toward 0, making the slope a
    per-domain health metric for corpus curation. The rank window runs on
    the per-source COUNTS table (vocabulary-sized — bounded by the
    language, not the corpus, so the sort doesn't grow with data), and
    regr_slope is a one-pass distributive aggregate."""
    counts = (
        _docs(spark, sf_dir)
        .select("source", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("source").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ZIPF_HEAD)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.expr("regr_slope(ln(cast(cnt as double)),"
                       " ln(cast(rank as double)))"), 4
            ).alias("zipf_slope"),
        )
        .orderBy("source")
    )


ORACLE_ZIPF = f"""
WITH counts AS (
  SELECT source, term, COUNT(*) AS cnt FROM (
    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1, 2),
ranked AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY cnt DESC, term) AS rank
  FROM counts)
SELECT source, COUNT(*) AS n_terms,
       ROUND(regr_slope(ln(CAST(cnt AS DOUBLE)),
                        ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope
FROM ranked WHERE rank <= {ZIPF_HEAD}
GROUP BY source ORDER BY source
"""



# --------------------------------------------------------------------------
# Token-budget curation (quality-greedy budget fill)
# --------------------------------------------------------------------------

BUDGET_TOKENS = 10_000
BUDGET_BUCKETS = 256  # floor on the score-histogram width
BUDGET_RESIDUAL = 1 << 20  # expected per-bucket rows cap (scales nb with n)


def corpus_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a fixed {BUDGET_TOKENS}-token training budget with the
    HIGHEST-quality documents — the curation step that turns a scored
    corpus into a training mix when compute (not data) is the binding
    constraint. Selection rule: greedy by quality_score (doc_id
    tie-break), take-while the tokens BEFORE a doc stay under budget
    (the crossing doc is included).

    Scale shape: the global "sort by quality, running-sum, cut" is
    rewritten with the same SELECTION pattern as
    ``agg_exact_global_median`` — a descending score-bucket histogram of
    TOKEN MASS locates which buckets can still fit under the budget,
    and only those buckets (≈budget-sized, not corpus-sized) run the
    in-bucket ordered prefix sum, partitioned per bucket. The bucket
    count scales as max({BUDGET_BUCKETS}, ⌈n_docs/{BUDGET_RESIDUAL}⌉)
    so each bucket's in-partition window stays ~{BUDGET_RESIDUAL} rows
    in expectation at ANY corpus size (same bounded-residual posture as
    the median's histogram; VERDICT r5 item 5). Equal scores always
    share a bucket — for EVERY bucket count — so the bucket
    decomposition reproduces the global order exactly and the count is
    a pure parallelism knob. The oracle IS the brute global-window form
    — two algorithms, one answer."""
    tq = text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    stats = tq.agg(
        F.min("quality_score").alias("lo"),
        F.max("quality_score").alias("hi"),
        F.count("*").alias("n"),
    ).select(
        "lo",
        "hi",
        F.greatest(
            F.lit(BUDGET_BUCKETS),
            F.ceil(F.col("n") / F.lit(BUDGET_RESIDUAL)),
        ).cast("long").alias("nb"),
    )
    b = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.col("nb") - 1,
            F.floor(
                (F.col("hi") - F.col("quality_score"))
                / (F.col("hi") - F.col("lo"))
                * F.col("nb")
            ),
        ),
    ).otherwise(0)
    binned = tq.crossJoin(F.broadcast(stats)).select(
        "doc_id", "n_tokens", "quality_score", b.cast("long").alias("bucket")
    )
    hist = binned.groupBy("bucket").agg(F.sum("n_tokens").alias("tok"))
    wcum = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    pref = (
        hist.withColumn("cum", F.sum("tok").over(wcum))
        .withColumn("bucket_before", F.col("cum") - F.col("tok"))
        .filter(F.col("bucket_before") < BUDGET_TOKENS)
        .select("bucket", "bucket_before")
    )
    w_in = (
        W.partitionBy("bucket")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    kept = (
        binned.join(F.broadcast(pref), "bucket")
        .withColumn(
            "tokens_before",
            (
                F.col("bucket_before")
                + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
            ).cast("long"),
        )
        .filter(F.col("tokens_before") < BUDGET_TOKENS)
    )
    return kept.select(
        "doc_id",
        F.round("quality_score", 6).alias("quality_score"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "tokens_before",
    ).orderBy("doc_id")


_SCORE_SQL = f"""
  SELECT doc_id,
         len(ws) AS n_tokens,
         CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
           * CAST(0.5 AS DOUBLE)
         + (CAST(1.0 AS DOUBLE)
            - CAST(len(list_filter(ws, w ->
                     list_contains({_duck_arr(STOPWORDS)}, w)))
                   AS DOUBLE) / len(ws)) * CAST(0.3 AS DOUBLE)
         + least(CAST(len(ws) AS DOUBLE) / CAST(100.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE)) * CAST(0.2 AS DOUBLE)
           AS quality_score
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
"""

ORACLE_BUDGET_PACK = f"""
WITH tq AS ({_SCORE_SQL}),
o AS (
  SELECT doc_id, n_tokens, quality_score,
         COALESCE(SUM(n_tokens) OVER (
             ORDER BY quality_score DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS tokens_before
  FROM tq)
SELECT doc_id,
       ROUND(quality_score, 6) AS quality_score,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tokens_before AS BIGINT) AS tokens_before
FROM o WHERE tokens_before < {BUDGET_TOKENS}
ORDER BY doc_id
"""



# --------------------------------------------------------------------------
# Prefix-boilerplate dedup (shared-header detector)
# --------------------------------------------------------------------------

PREFIX_LEN = 80


def text_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents sharing a long common PREFIX — the boilerplate-header
    detector (scraped corpora are full of pages that differ only after
    a shared banner/license block; full-hash dedup misses them, shingle
    dedup finds them late and expensively). Exact semantics: group by
    md5 of the first {PREFIX_LEN} characters, report clusters of ≥2
    with a deterministic min-doc_id exemplar and the share of the
    corpus carrying a duplicated prefix.

    Scale: map-only prefix hash → ONE keyed count — the cheapest
    near-dup screen in the family, the right first pass before shingle
    or MinHash machinery."""
    docs = _docs(spark, sf_dir)
    pref = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, PREFIX_LEN)).alias("prefix_md5"),
    )
    clusters = (
        pref.groupBy("prefix_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("exemplar_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    tot = pref.agg(F.count("*").alias("n_total"))
    return (
        clusters.crossJoin(F.broadcast(tot))
        .select(
            "prefix_md5",
            "n_docs",
            "exemplar_doc",
            # exact rational half-up on the count ratio (TIES.md B')
            F.expr(
                rat_round6_spark("n_docs", "n_total")
            ).alias("corpus_share"),
        )
        .orderBy(F.desc("n_docs"), F.asc("prefix_md5"))
    )


ORACLE_DEDUP_PREFIX = f"""
WITH pref AS (
  SELECT doc_id, md5(substring(text, 1, {PREFIX_LEN})) AS prefix_md5
  FROM documents),
clusters AS (
  SELECT prefix_md5, CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(doc_id) AS exemplar_doc
  FROM pref GROUP BY 1 HAVING COUNT(*) >= 2),
tot AS (SELECT COUNT(*) AS n_total FROM pref)
SELECT c.prefix_md5, c.n_docs, c.exemplar_doc,
       CAST(((c.n_docs) * 2000000 + (t.n_total)) // (2 * (t.n_total)) AS DOUBLE) / 1000000.0
         AS corpus_share
FROM clusters c CROSS JOIN tot t
ORDER BY n_docs DESC, prefix_md5 ASC
"""



GRID_BINS = 5


def _ntile_assign_bounded(
    spark: SparkSession, tq: DataFrame, value_col: str, k: int, out_col: str
) -> DataFrame:
    """Exact NTILE({k}) over the (value, doc_id) total order WITHOUT a
    corpus-grain global window (a plain ``ntile().over(W.orderBy(...))``
    funnels every document through one task — the unbounded-global-window
    anti-pattern the plan audit forbids). Same two-pass SELECTION shape
    as ``agg_exact_global_median``:

    1. histogram the value into max(1024, ⌈n/2^20⌉) width buckets
       (map-side combined; scales with n so every bucket stays ~2^20
       rows in expectation),
    2. locate the k−1 NTILE boundary RANKS R_b = b·⌊n/k⌋ + min(b, n mod k)
       in the cumulative histogram and extract each boundary ROW
       (value, doc_id) with a per-bucket row_number (partitioned by
       boundary index — bucket-sized sorts, never corpus-sized),
    3. assign every row 1 + |{boundaries strictly below it}| via one
       broadcast array fold — exactly NTILE's bucket, because doc_id
       makes the order total: (v,id) > boundary_b ⇔ rank > R_b.

    The DuckDB oracle keeps the plain NTILE formulation, so the rewrite
    is proven equivalent on every run. Returns (doc_id, out_col)."""
    v = F.col(value_col).cast("double")
    vid = tq.select(F.col("doc_id").alias("id"), v.alias("v"))
    stats = vid.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").alias("n"),
    ).select(
        "lo",
        "hi",
        "n",
        F.greatest(
            F.lit(1024), F.ceil(F.col("n") / F.lit(BUDGET_RESIDUAL))
        ).cast("long").alias("nb"),
    )
    b = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.col("nb") - 1,
            F.floor(
                (F.col("v") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.col("nb")
            ),
        ),
    ).otherwise(0)
    binned = vid.crossJoin(F.broadcast(stats)).select(
        "id", "v", b.cast("long").alias("bucket")
    )
    ranks = spark.range(1, k).select(F.col("id").cast("int").alias("b"))
    ks = ranks.crossJoin(F.broadcast(stats.select("n"))).select(
        "b",
        (
            F.col("b") * F.floor(F.col("n") / k)
            + F.least(F.col("b").cast("long"), F.col("n") % k)
        ).cast("long").alias("r"),
    )
    hist = binned.groupBy("bucket").agg(F.count("*").alias("c"))
    wcum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    targets = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("prev_cum", F.col("cum") - F.col("c"))
        .crossJoin(F.broadcast(ks))
        .filter((F.col("cum") >= F.col("r")) & (F.col("prev_cum") < F.col("r")))
        .select(
            "b",
            F.col("bucket").alias("tbucket"),
            (F.col("r") - F.col("prev_cum")).alias("rr"),
        )
    )
    wsel = W.partitionBy("b").orderBy("v", "id")
    bounds = (
        binned.join(F.broadcast(targets), binned.bucket == F.col("tbucket"))
        .withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") == F.col("rr"))
        .select(F.col("v").alias("bv"), F.col("id").alias("bid"))
    )
    bnds = bounds.agg(
        F.sort_array(F.collect_list(F.struct("bv", "bid"))).alias("bnds")
    )
    passed = F.aggregate(
        "bnds",
        F.lit(0),
        lambda acc, x: acc
        + F.when(
            (v > x["bv"]) | ((v == x["bv"]) & (F.col("doc_id") > x["bid"])),
            1,
        ).otherwise(0),
    )
    return (
        tq.select("doc_id", value_col)
        .crossJoin(F.broadcast(bnds))
        .withColumn(out_col, (F.lit(1) + passed).cast("int"))
        .select("doc_id", out_col)
    )


def text_length_quality_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-quintile × quality-quintile contingency grid — the
    curation diagnostic "is our quality score just measuring length?"
    (a diagonal-heavy grid means the score adds nothing beyond size; a
    flat grid means genuine signal). Quintile semantics are exactly
    NTILE over (value, doc_id) — but computed with the BOUNDED
    selection rewrite (:func:`_ntile_assign_bounded`): documents are
    the fact grain here, so a corpus-grain global NTILE window would be
    a single-task sort of the corpus at 100 TB. Counts are integers and
    the share is one division; the oracle keeps the plain NTILE SQL, so
    the two formulations are differentially verified on every run."""
    tq = text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    binned = tq.join(
        _ntile_assign_bounded(spark, tq, "n_tokens", GRID_BINS, "len_q"),
        "doc_id",
    ).join(
        _ntile_assign_bounded(
            spark, tq, "quality_score", GRID_BINS, "qual_q"
        ),
        "doc_id",
    )
    tot = tq.agg(F.count("*").alias("n_total"))
    return (
        binned.groupBy("len_q", "qual_q")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("len_q").cast("int").alias("len_q"),
            F.col("qual_q").cast("int").alias("qual_q"),
            "n_docs",
            # exact rational half-up on the count ratio (TIES.md B')
            F.expr(rat_round6_spark("n_docs", "n_total")).alias("share"),
        )
        .orderBy("len_q", "qual_q")
    )


ORACLE_LENGTH_QUALITY_GRID = f"""
WITH tq AS ({_SCORE_SQL}),
binned AS (
  SELECT doc_id,
         NTILE({GRID_BINS}) OVER (ORDER BY n_tokens, doc_id) AS len_q,
         NTILE({GRID_BINS}) OVER (ORDER BY quality_score, doc_id)
           AS qual_q
  FROM tq),
tot AS (SELECT COUNT(*) AS n_total FROM tq)
SELECT CAST(b.len_q AS INT) AS len_q,
       CAST(b.qual_q AS INT) AS qual_q,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(((COUNT(*)) * 2000000 + (t.n_total)) // (2 * (t.n_total)) AS DOUBLE) / 1000000.0
         AS share
FROM binned b CROSS JOIN tot t
GROUP BY b.len_q, b.qual_q, t.n_total
ORDER BY len_q, qual_q
"""


# --------------------------------------------------------------------------
# Vocabulary richness: bigram hapax legomena + type-token ratio per source
# --------------------------------------------------------------------------


def text_hapax_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-richness profile over word BIGRAMS: total
    bigram tokens, distinct types, hapax legomena (types occurring once)
    and the hapax/type-token ratios — the classic lexical-diversity
    signals a data-quality dashboard tracks per crawl source (a source
    whose hapax ratio collapses is template spam; one whose TTR spikes
    is OCR noise). Bigrams, not unigrams: the fixture vocabulary is ~31
    words/source, so unigram hapax is degenerate while bigram types
    (~700/source) discriminate.

    Exactness: pure integer counts; ratios via the exact-rational
    half-up (TIES.md B′ — count ratios must never go through
    round(double)). Scale: explode → one (source, bigram) hash agg →
    one source-keyed agg; map-side partials absorb the token fan-out,
    no window, no Python."""
    docs = _docs(spark, sf_dir)
    bg = docs.select(
        "source",
        F.explode(
            F.expr(
                "transform(array(split(text, ' ')), ws -> "
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat_ws(' ', slice(ws, i, 2))) "
                "ELSE array(text) END)[0]"
            )
        ).alias("b"),
    )
    bc = bg.groupBy("source", "b").agg(F.count("*").alias("c"))
    return (
        bc.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_bigrams",
            "n_types",
            "n_hapax",
            F.expr(rat_round6_spark("n_hapax", "n_types")).alias(
                "hapax_ratio"
            ),
            F.expr(rat_round6_spark("n_types", "n_bigrams")).alias("ttr"),
        )
        .orderBy("source")
    )


ORACLE_HAPAX_BIGRAMS = """
WITH d AS (SELECT source, text, string_split(text, ' ') AS ws
           FROM documents),
bg AS (
  SELECT source,
         CASE WHEN len(ws) >= 2 THEN ws[i] || ' ' || ws[i+1]
              ELSE text END AS b
  FROM d, LATERAL unnest(generate_series(1, greatest(len(ws) - 1, 1)))
       AS u(i)),
bc AS (SELECT source, b, COUNT(*) AS c FROM bg GROUP BY 1, 2)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(((SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) * 2000000 + (COUNT(*)))
            // (2 * (COUNT(*))) AS DOUBLE) / 1000000.0 AS hapax_ratio,
       CAST(((COUNT(*)) * 2000000 + (SUM(c))) // (2 * (SUM(c)))
            AS DOUBLE) / 1000000.0 AS ttr
FROM bc GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Stratified quota apportionment (largest-remainder / Hamilton method)
# --------------------------------------------------------------------------

QUOTA_TOTAL = 100  # documents to draw across sources, token-proportional


def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-proportional quota apportionment across sources by the
    largest-remainder (Hamilton) method — the dataset-MIXING primitive:
    given a global sampling budget of {QUOTA_TOTAL} docs, each source
    gets floor(tokens_i · S / Σtokens) seats and the leftover seats go
    to the largest remainders (ties → source name), so Σalloc == S
    exactly — no float weights, no drift. ``sample_exact_k`` then draws
    each source's quota; ``corpus_budget_pack`` solves the dual
    (budget-bounded packing).

    Exactness: the whole method is integer division/modulo — identical
    on both engines for the non-negative domain. Scale: ONE fact-side
    token count per source (map-side partials, one scan — the first
    draft branched the lineage into tot/extra sub-aggregates and
    Catalyst re-scanned the fact table 8×), then every remaining step
    is a window over the SOURCE-bounded frame (n_sources rows, never
    fact-sized)."""
    per = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split("text", " "))).cast("long").alias("m")
        )
    )
    wg = W.partitionBy()  # bounded: the source-dimension frame
    wr = W.orderBy(F.desc("rem"), F.asc("source"))
    return (
        per.withColumn("tot", F.sum("m").over(wg))
        .withColumn("base", F.expr(f"(m * {QUOTA_TOTAL}) div tot"))
        .withColumn("rem", F.expr(f"(m * {QUOTA_TOTAL}) % tot"))
        .withColumn(
            "extra", F.lit(QUOTA_TOTAL) - F.sum("base").over(wg)
        )
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "source",
            F.col("m").alias("n_tokens"),
            F.col("base").cast("long").alias("base_alloc"),
            (F.col("base") + F.when(F.col("rk") <= F.col("extra"), 1)
             .otherwise(0)).cast("long").alias("alloc"),
        )
        .orderBy("source")
    )


ORACLE_STRATIFIED_QUOTA = f"""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS m
  FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(m) AS BIGINT) AS tot FROM per),
j AS (SELECT source, m, (m * {QUOTA_TOTAL}) // tot AS base,
             (m * {QUOTA_TOTAL}) % tot AS rem
      FROM per, t),
x AS (SELECT CAST({QUOTA_TOTAL} - SUM(base) AS BIGINT) AS extra FROM j),
r AS (SELECT j.*, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk FROM j)
SELECT source, m AS n_tokens, CAST(base AS BIGINT) AS base_alloc,
       CAST(base + CASE WHEN rk <= x.extra THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM r, x ORDER BY source
"""


# --------------------------------------------------------------------------
# Ingest funnel: raw → quality-gated → unique, per source (+streaming twin)
# --------------------------------------------------------------------------


def corpus_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ingest funnel — the monitoring view every corpus
    pipeline fronts its dedup with: raw arrivals → quality-gate
    survivors (the SHARED ``corpus_quality_gate`` predicate, so this
    funnel measures the real pipeline's gate, not a twin) → distinct
    content hashes, plus the gated-duplicate ratio. The streaming twin
    (``streaming/jobs.run_corpus_funnel_stream``) computes the same
    contract incrementally; stream == batch is pytest-pinned, and this
    batch form carries the value-hash oracle.

    Exactness: counts + exact-rational ratio (zero-gated sources guard
    the division on both engines). Scale: ONE source-keyed hash agg
    over ONE corpus scan — the gate becomes a conditional inside the
    aggregate (count(CASE), count(DISTINCT CASE) — nulls don't count),
    so raw and gated funnel stages never branch the lineage into a
    second scan."""
    docs = _docs(spark, sf_dir).withColumn("ws", F.split("text", " "))
    gate = quality_gate_cond()
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.count(F.when(gate, 1)).cast("long").alias("n_gated"),
            F.countDistinct(F.when(gate, F.md5("text")))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "source",
            "n_raw",
            "n_gated",
            "n_unique",
            F.when(
                F.col("n_gated") > 0,
                F.expr(rat_round6_spark("n_gated - n_unique", "n_gated")),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
        .orderBy("source")
    )


ORACLE_CORPUS_FUNNEL = f"""
WITH raw AS (SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY 1),
g AS (
  SELECT source, COUNT(*) AS n_gated,
         COUNT(DISTINCT md5(text)) AS n_unique
  FROM (SELECT source, text, string_split(text, ' ') AS ws FROM documents)
  WHERE len(ws) >= {MIN_TOKENS}
    AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) >= {MIN_UNIQ}
  GROUP BY 1)
SELECT r.source,
       CAST(r.n_raw AS BIGINT) AS n_raw,
       CAST(COALESCE(g.n_gated, 0) AS BIGINT) AS n_gated,
       CAST(COALESCE(g.n_unique, 0) AS BIGINT) AS n_unique,
       CASE WHEN COALESCE(g.n_gated, 0) > 0
            THEN CAST(((g.n_gated - g.n_unique) * 2000000 + (g.n_gated))
                      // (2 * (g.n_gated)) AS DOUBLE) / 1000000.0
            ELSE 0.0 END AS dup_ratio
FROM raw r LEFT JOIN g ON r.source = g.source
ORDER BY r.source
"""


# --------------------------------------------------------------------------
# Tokenizer training: first BPE merge (top adjacent character pairs)
# --------------------------------------------------------------------------

BPE_TOP_K = 20


def text_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIRST iteration of byte-pair-encoding tokenizer training:
    corpus-wide frequency of every adjacent character pair inside words,
    ranked; the top pair is the merge a BPE trainer would apply first.
    This is the statistic-gathering step that dominates tokenizer
    training at corpus scale.

    Scale posture — the vocabulary-contraction trick: the corpus is
    first reduced to (word, count) — a hash agg whose map-side partials
    absorb the token fan-out and whose output is VOCABULARY-sized, not
    corpus-sized — and only the distinct words (tens per source here;
    ~10^5-10^6 on a real crawl) are exploded into character pairs,
    weighted by count. Exploding pairs per OCCURRENCE would be a
    corpus×word-length fan-out; per TYPE it is vocabulary×word-length.
    Final ranking is TakeOrderedAndProject over the pair-type table.

    Exactness: pure integer counts; deterministic total order
    (freq DESC, pair ASC) so the top-{BPE_TOP_K} cut is stable on both
    engines."""
    wc = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.length("w") >= 2)
    )
    pairs = wc.select(
        "c",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


ORACLE_BPE_FIRST_MERGE = f"""
WITH wc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1),
p AS (
  SELECT substr(w, i, 2) AS pair, c
  FROM wc, LATERAL unnest(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2)
SELECT pair, CAST(SUM(c) AS BIGINT) AS freq
FROM p GROUP BY pair
ORDER BY freq DESC, pair LIMIT {BPE_TOP_K}
"""


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth per source (bigram types vs docs ingested)
# --------------------------------------------------------------------------


def text_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth audit per source: how many NEW
    bigram types each quartile of the ingest sequence (docs ordered by
    doc_id) contributes. A healthy crawl keeps discovering types
    (sublinear but unbounded growth); a source whose curve flattens to
    zero is replaying templates — the point a curation pipeline stops
    paying for more of it. Bigrams, not unigrams, for the same
    degeneracy reason as ``text_hapax_bigrams``.

    Shape: each (source, bigram) type is attributed to the FIRST doc
    that contains it (min doc_id — one vocabulary-grain hash agg), the
    per-doc new-type counts are summed cumulatively along the per-source
    doc spine, and the curve is sampled at the quartile positions
    ceil(n/4), ceil(n/2), ceil(3n/4), n — integer positions via
    truncating div, identical on both engines.

    Scale: one explode → vocabulary-grain agg (map-side partials), one
    doc-grain agg, then windows PARTITIONED BY source over the doc
    spine (docs-per-source rows, never token-sized). No global window,
    no Python."""
    docs = _docs(spark, sf_dir)
    bg = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) "
                "ELSE array(text) END"
            )
        ).alias("b"),
    )
    first_doc = bg.groupBy("source", "b").agg(
        F.min("doc_id").alias("fd")
    )
    new_per_doc = first_doc.groupBy("source", F.col("fd").alias("doc_id")).agg(
        F.count("*").alias("nnew")
    )
    spine = (
        docs.select("source", "doc_id")
        .join(new_per_doc, ["source", "doc_id"], "left_outer")
        .withColumn("nnew", F.coalesce("nnew", F.lit(0)))
    )
    wo = W.partitionBy("source").orderBy("doc_id")
    wall = W.partitionBy("source")
    cum = (
        spine.withColumn("pos", F.row_number().over(wo))
        .withColumn(
            "cum",
            F.sum("nnew").over(
                wo.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .withColumn("n", F.count("*").over(wall))
    )
    q = "(n + 3) div 4", "(n + 1) div 2", "(3 * n + 3) div 4"
    return (
        cum.groupBy("source")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.max(F.when(F.expr(f"pos = {q[0]}"), F.col("cum")))
            .cast("long")
            .alias("types_q25"),
            F.max(F.when(F.expr(f"pos = {q[1]}"), F.col("cum")))
            .cast("long")
            .alias("types_q50"),
            F.max(F.when(F.expr(f"pos = {q[2]}"), F.col("cum")))
            .cast("long")
            .alias("types_q75"),
            F.max("cum").cast("long").alias("types_total"),
        )
        .orderBy("source")
    )


ORACLE_HEAPS_VOCAB = """
WITH d AS (SELECT source, doc_id, text, string_split(text, ' ') AS ws
           FROM documents),
bg AS (
  SELECT source, doc_id,
         CASE WHEN len(ws) >= 2 THEN ws[i] || ' ' || ws[i+1]
              ELSE text END AS b
  FROM d, LATERAL unnest(generate_series(1, greatest(len(ws) - 1, 1)))
       AS u(i)),
fd AS (SELECT source, b, MIN(doc_id) AS fd FROM bg GROUP BY 1, 2),
npd AS (SELECT source, fd AS doc_id, COUNT(*) AS nnew
        FROM fd GROUP BY 1, 2),
spine AS (
  SELECT d.source, d.doc_id, COALESCE(npd.nnew, 0) AS nnew
  FROM (SELECT DISTINCT source, doc_id FROM documents) d
  LEFT JOIN npd ON d.source = npd.source AND d.doc_id = npd.doc_id),
cum AS (
  SELECT source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS pos,
         CAST(SUM(nnew) OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS cum,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM spine)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN pos = (n + 3) // 4 THEN cum END)
            AS BIGINT) AS types_q25,
       CAST(MAX(CASE WHEN pos = (n + 1) // 2 THEN cum END)
            AS BIGINT) AS types_q50,
       CAST(MAX(CASE WHEN pos = (3 * n + 3) // 4 THEN cum END)
            AS BIGINT) AS types_q75,
       CAST(MAX(cum) AS BIGINT) AS types_total
FROM cum GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Temperature-flattened source mixing (UniMax/multilingual-sampling shape)
# --------------------------------------------------------------------------

TEMP_MIX_QUANT = float(1 << 20)  # sqrt-weight grid, exactly representable


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened dataset mixing at α = 0.5: each source's
    sampling weight is √tokens instead of tokens, the standard move
    (multilingual/UniMax pretraining mixes) that up-weights low-resource
    sources without letting any dominate; both the flattened and the
    proportional Hamilton allocations of the {QUOTA_TOTAL}-doc budget
    are reported with their per-source delta, so the curator sees
    exactly how many seats the temperature moved and where.

    Exactness: α = 0.5 deliberately — IEEE sqrt is a CORRECTLY-ROUNDED
    basic operation (bit-identical on any engine build), unlike pow(x,
    0.7) whose libm varies; the sqrt weight then truncates onto the
    2^-20 grid so the weight SUM is an order-independent integer and
    both apportionments run in pure integer arithmetic (the
    ``sample_stratified_quota`` machinery). Scale: one fact-side token
    count per source, then every window is confined to the
    SOURCE-bounded frame (n_sources rows, never fact-sized)."""
    per = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("m"))
        .withColumn(
            "wq",
            F.expr(
                f"cast(floor(sqrt(cast(m as double)) * {TEMP_MIX_QUANT!r}) "
                "as bigint)"
            ),
        )
    )
    wg = W.partitionBy()  # bounded: the source-dimension frame

    def hamilton(df: DataFrame, weight: str, alias: str) -> DataFrame:
        wr = W.orderBy(F.desc(f"__rem_{alias}"), F.asc("source"))
        return (
            df.withColumn(f"__tot_{alias}", F.sum(weight).over(wg))
            .withColumn(
                f"__base_{alias}",
                F.expr(f"({weight} * {QUOTA_TOTAL}) div __tot_{alias}"),
            )
            .withColumn(
                f"__rem_{alias}",
                F.expr(f"({weight} * {QUOTA_TOTAL}) % __tot_{alias}"),
            )
            .withColumn(
                f"__extra_{alias}",
                F.lit(QUOTA_TOTAL) - F.sum(f"__base_{alias}").over(wg),
            )
            .withColumn(f"__rk_{alias}", F.row_number().over(wr))
            .withColumn(
                alias,
                (
                    F.col(f"__base_{alias}")
                    + F.when(
                        F.col(f"__rk_{alias}") <= F.col(f"__extra_{alias}"), 1
                    ).otherwise(0)
                ).cast("long"),
            )
        )
    out = hamilton(hamilton(per, "m", "alloc_prop"), "wq", "alloc_temp")
    return out.select(
        "source",
        F.col("m").alias("n_tokens"),
        "wq",
        "alloc_prop",
        "alloc_temp",
        (F.col("alloc_temp") - F.col("alloc_prop"))
        .cast("long")
        .alias("delta_alloc"),
    ).orderBy("source")


ORACLE_TEMPERATURE_MIX = f"""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS m,
         CAST(FLOOR(sqrt(CAST(SUM(len(string_split(text, ' ')))
                              AS DOUBLE)) * {TEMP_MIX_QUANT!r})
              AS BIGINT) AS wq
  FROM documents GROUP BY 1),
tp AS (SELECT CAST(SUM(m) AS BIGINT) AS tot_p,
              CAST(SUM(wq) AS BIGINT) AS tot_w FROM per),
j AS (SELECT source, m, wq,
             (m * {QUOTA_TOTAL}) // tot_p AS base_p,
             (m * {QUOTA_TOTAL}) % tot_p AS rem_p,
             (wq * {QUOTA_TOTAL}) // tot_w AS base_w,
             (wq * {QUOTA_TOTAL}) % tot_w AS rem_w
      FROM per, tp),
x AS (SELECT CAST({QUOTA_TOTAL} - SUM(base_p) AS BIGINT) AS extra_p,
             CAST({QUOTA_TOTAL} - SUM(base_w) AS BIGINT) AS extra_w FROM j),
r AS (SELECT j.*,
             ROW_NUMBER() OVER (ORDER BY rem_p DESC, source) AS rk_p,
             ROW_NUMBER() OVER (ORDER BY rem_w DESC, source) AS rk_w
      FROM j),
a AS (SELECT source, m, wq,
             CAST(base_p + CASE WHEN rk_p <= x.extra_p THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_prop,
             CAST(base_w + CASE WHEN rk_w <= x.extra_w THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_temp
      FROM r, x)
SELECT source, m AS n_tokens, wq, alloc_prop, alloc_temp,
       CAST(alloc_temp - alloc_prop AS BIGINT) AS delta_alloc
FROM a ORDER BY source
"""


# --------------------------------------------------------------------------
# MATTR: moving-average type-token ratio (windowed lexical diversity)
# --------------------------------------------------------------------------

MATTR_W = 10  # window size in tokens; fixture docs are 10-100 tokens


def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MATTR (moving-average type-token ratio): the mean
    number of DISTINCT tokens in each sliding {MATTR_W}-token window —
    the length-robust lexical-diversity score (plain TTR collapses as
    documents grow; MATTR doesn't), a standard text-quality feature
    for corpus filtering next to ``text_hapax_bigrams``' global TTR.

    The naive form ("count distinct per window") is quadratic and
    un-SQL-able at scale. This uses the interval-contribution closed
    form instead: a token occurrence at position p (previous
    occurrence of the same token at q, 0 if none) is the FIRST
    occurrence of its type inside exactly the windows ending at
    w in [max(p, q+W, W), min(p+W-1, L)], so

        sum over windows of distinct_count
            = sum over occurrences of max(0, hi - lo + 1)

    — pure per-row arithmetic after ONE lag window partitioned by
    (doc_id, token). MATTR = that sum / (W * (L-W+1)), emitted as the
    exact-rational half-up (integer num/den — TIES.md B′).

    Scale: posexplode → lag over (doc_id, token) → groupBy doc_id.
    Both shuffles are keyed on corpus-cardinality keys (no global
    window, no per-window fan-out — output is one row per document)."""
    w = MATTR_W
    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.posexplode(F.split("text", " ")).alias("p0", "tok"),
        )
        .withColumn("p", F.col("p0") + 1)
    )
    lagw = W.partitionBy("doc_id", "tok").orderBy("p")
    contrib = (
        toks.withColumn("q", F.coalesce(F.lag("p").over(lagw), F.lit(0)))
        .filter(F.col("n_tokens") >= w)
        .withColumn(
            "contrib",
            F.greatest(
                F.least(F.col("p") + (w - 1), F.col("n_tokens"))
                - F.greatest(F.col("p"), F.col("q") + w, F.lit(w))
                + 1,
                F.lit(0),
            ),
        )
    )
    return (
        contrib.groupBy("doc_id", "n_tokens")
        .agg(F.sum("contrib").cast("long").alias("distinct_sum"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - (w - 1)).cast("long").alias("n_windows"),
            "distinct_sum",
            F.expr(
                rat_round6_spark(
                    "distinct_sum", f"(n_tokens - {w - 1}) * {w}"
                )
            ).alias("mattr_r6"),
        )
        .orderBy("doc_id")
    )


ORACLE_MATTR = f"""
WITH t AS (
  SELECT doc_id, len(ws) AS L, u.i AS p, ws[u.i] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL unnest(generate_series(1, len(ws))) AS u(i)),
q AS (
  SELECT doc_id, L, p,
         COALESCE(lag(p) OVER (PARTITION BY doc_id, tok ORDER BY p), 0) AS q0
  FROM t),
c AS (
  SELECT doc_id, L,
         GREATEST(LEAST(p + {MATTR_W - 1}, L)
                  - GREATEST(p, q0 + {MATTR_W}, {MATTR_W}) + 1, 0) AS contrib
  FROM q WHERE L >= {MATTR_W})
SELECT doc_id, CAST(L AS BIGINT) AS n_tokens,
       CAST(L - {MATTR_W - 1} AS BIGINT) AS n_windows,
       CAST(SUM(contrib) AS BIGINT) AS distinct_sum,
       {rat_round6_duck(
           "CAST(SUM(contrib) AS BIGINT)", f"(L - {MATTR_W - 1}) * {MATTR_W}"
       )} AS mattr_r6
FROM c
GROUP BY doc_id, L
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Substring-level dedup — duplicated token SPANS across documents
# --------------------------------------------------------------------------

SPAN_W = 12  # tokens per substring window


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup audit (the ExactSubstr family of public
    dedup literature — duplicated token SPANS across documents, the
    granularity between chunk-level ``dedup_chunks_exact`` and
    prefix-level ``text_dedup_prefix``): every {SPAN_W}-token window at
    EVERY token offset is fingerprinted, and a window is "duplicated"
    when its content appears in ≥2 DISTINCT documents. Stride 1 makes
    detection exact — any shared span of ≥{SPAN_W} tokens is caught
    regardless of alignment (a strided variant would miss phase-shifted
    copies; the suffix-array construction of the literature is the
    single-node equivalent of this hash-groupBy).

    Per-doc output: window count, duplicated-window count, and the
    duplicated share — the span-level contamination readout a curation
    pipeline thresholds on.

    Scale: the blowup is map-side (each token yields one 16-byte md5;
    ~{SPAN_W}× transient text traffic feeding a hash shuffle) and the
    only joins are the inverted-index fingerprint join (shuffle key =
    fingerprint; reused by the join-back, no second shuffle) and the
    final doc rollup — no all-pairs anywhere. The corpus is
    repartitioned by doc_id ahead of the HOF stage (the one-file-
    fixture single-task trap, PLANS r8)."""
    docs = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    base = docs.repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    ).select(
        "doc_id",
        ws.alias("ws"),
        F.greatest(F.size(ws) - F.lit(SPAN_W - 1), F.lit(0)).alias("n_win"),
    )
    wins = (
        base.filter(F.col("n_win") >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_win"))).alias("start"),
            "ws",
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice("ws", F.col("start"), SPAN_W))
            ).alias("fp"),
        )
    )
    per_fp = wins.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_doc = (
        wins.join(per_fp, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.when(F.coalesce("n_windows", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.expr(
                    rat_round6_spark(
                        "coalesce(n_dup_windows, 0)",
                        "coalesce(n_windows, 1)",
                    )
                )
            )
            .alias("dup_share_r6"),
        )
        .orderBy("doc_id")
    )


ORACLE_SUBSTRING_SPANS = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents),
w AS (
  SELECT doc_id,
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp
  FROM d, LATERAL unnest(generate_series(
           1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
pf AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM w GROUP BY 1),
pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_windows
  FROM w JOIN pf USING (fp) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN COALESCE(n_windows, 0) = 0 THEN 0.0
            ELSE {rat_round6_duck(
                "COALESCE(n_dup_windows, 0)", "COALESCE(n_windows, 1)")}
       END AS dup_share_r6
FROM d LEFT JOIN pd USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# RAKE keyword extraction (degree/frequency word scores)
# --------------------------------------------------------------------------

RAKE_STOP_K = 10  # corpus-calibrated stopword count
RAKE_TOP = 50  # emitted keywords


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scoring (Rose et al.'s Rapid Automatic Keyword
    Extraction, the classic unsupervised extractor): text splits into
    candidate phrases at stopword boundaries, each content word scores
    degree/frequency where degree sums the lengths of the phrases it
    appears in — words living in long multi-word phrases beat equally
    frequent words that stand alone. Stopwords are CORPUS-CALIBRATED
    (the top {RAKE_STOP_K} words by occurrence count, tie-broken
    lexicographically) so the operator is language-agnostic and fully
    deterministic on any corpus — no frozen English list to rot.

    Ranking is the CANONICAL Rose et al. order — score = degree/freq
    (r10, ADVICE r9: the degree-ranked cut deviated from the paper).
    The sort key is the IEEE double quotient: both operands are BIGINTs
    < 2^53, so the division is correctly rounded and bit-identical on
    both engines; rationals that collide to one double tie-break by
    (degree DESC, word ASC), also identical on both. score_r6 stays the
    exact-rational half-up readout.

    Scale: the stopword list is a {RAKE_STOP_K}-row broadcast; phrase
    islands come from a per-document running stopword count (window
    partitioned BY doc — document-length-bounded); the word rollup is
    one vocabulary-keyed groupBy and the final cut is a
    TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    # the exploded word frame feeds the stopword calibration AND the
    # flagging pass — checkpoint so the corpus explode runs ONCE
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
    ).filter(F.col("word") != "").localCheckpoint(eager=True)
    top_stop = (
        words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(RAKE_STOP_K)
        .select(F.col("word").alias("stop_word"))
    )
    flagged = words.join(
        F.broadcast(top_stop),
        words.word == F.col("stop_word"),
        "left",
    ).select(
        "doc_id",
        "pos",
        "word",
        F.col("stop_word").isNotNull().alias("is_stop"),
    )
    wi = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # content feeds the phrase-length aggregate AND the join back —
    # checkpoint so the flag+window chain runs ONCE
    content = (
        flagged.withColumn(
            "island",
            F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wi),
        )
        .filter(~F.col("is_stop"))
        .localCheckpoint(eager=True)
    )
    phrase_len = content.groupBy("doc_id", "island").agg(
        F.count("*").alias("plen")
    )
    return (
        content.join(phrase_len, ["doc_id", "island"])
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
        .select(
            "word",
            "freq",
            "degree",
            F.expr(rat_round6_spark("degree", "freq")).alias("score_r6"),
        )
        .orderBy(
            F.expr("cast(degree as double) / cast(freq as double)").desc(),
            F.desc("degree"),
            F.asc("word"),
        )
        .limit(RAKE_TOP)
    )


ORACLE_RAKE = f"""
WITH w AS (
  SELECT doc_id, CAST(p AS INT) AS pos, ws[p] AS word
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       LATERAL unnest(generate_series(1, len(ws))) AS u(p)
  WHERE ws[p] <> ''),
stop AS (
  SELECT word AS stop_word FROM w
  GROUP BY 1 ORDER BY COUNT(*) DESC, word LIMIT {RAKE_STOP_K}),
flagged AS (
  SELECT doc_id, pos, word,
         word IN (SELECT stop_word FROM stop) AS is_stop
  FROM w),
content AS (
  SELECT doc_id, word,
         SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged QUALIFY NOT is_stop),
plen AS (
  SELECT doc_id, island, COUNT(*) AS plen
  FROM content GROUP BY 1, 2)
SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(SUM(plen) AS BIGINT) AS degree,
       {rat_round6_duck("CAST(SUM(plen) AS HUGEINT)",
                        "CAST(COUNT(*) AS HUGEINT)")} AS score_r6
FROM content JOIN plen USING (doc_id, island)
GROUP BY word
ORDER BY CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) DESC,
         degree DESC, word
LIMIT {RAKE_TOP}
"""


# --------------------------------------------------------------------------
# Suffix↔prefix boundary overlap (concatenation-artifact audit)
# --------------------------------------------------------------------------

BOUNDARY_W = 3  # boundary width in tokens


def text_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation-artifact audit: document pairs where one document's
    trailing {BOUNDARY_W} tokens equal another's leading {BOUNDARY_W}
    tokens — the signature of a split-in-the-middle crawl record or a
    re-chunked corpus (doc B continues doc A). Distinct from span dedup
    (``dedup_substring_spans`` finds shared INTERIOR content; this
    aligns EDGES, which is what you need to re-stitch or drop
    fragments).

    Scale: both edge sets are one map-side md5 per document (the md5 IS
    the equality key — content never re-ships), so the pair discovery
    is a single hash equi-join on the boundary fingerprint; output is
    bounded by true boundary collisions, never all-pairs."""
    docs = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    base = docs.select("doc_id", ws.alias("ws")).filter(
        F.size("ws") >= BOUNDARY_W
    )
    suf = base.select(
        F.col("doc_id").alias("suffix_doc_id"),
        F.md5(
            F.concat_ws(
                " ", F.slice("ws", F.size("ws") - (BOUNDARY_W - 1), BOUNDARY_W)
            )
        ).alias("fp"),
    )
    pre = base.select(
        F.col("doc_id").alias("prefix_doc_id"),
        F.md5(F.concat_ws(" ", F.slice("ws", 1, BOUNDARY_W))).alias("fp"),
    )
    return (
        suf.join(pre, "fp")
        .filter(F.col("suffix_doc_id") != F.col("prefix_doc_id"))
        .select("suffix_doc_id", "prefix_doc_id", F.col("fp").alias(
            "boundary_md5"
        ))
        .orderBy("suffix_doc_id", "prefix_doc_id")
    )


ORACLE_BOUNDARY_OVERLAP = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (SELECT doc_id, ws FROM d WHERE len(ws) >= {BOUNDARY_W}),
suf AS (
  SELECT doc_id AS suffix_doc_id,
         md5(array_to_string(
           ws[len(ws) - {BOUNDARY_W - 1} : len(ws)], ' ')) AS fp
  FROM base),
pre AS (
  SELECT doc_id AS prefix_doc_id,
         md5(array_to_string(ws[1 : {BOUNDARY_W}], ' ')) AS fp
  FROM base)
SELECT suffix_doc_id, prefix_doc_id, fp AS boundary_md5
FROM suf JOIN pre USING (fp)
WHERE suffix_doc_id <> prefix_doc_id
ORDER BY suffix_doc_id, prefix_doc_id
"""


# --------------------------------------------------------------------------
# Pairwise source vocabulary Jaccard (corpus-mix similarity matrix)
# --------------------------------------------------------------------------

def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise VOCABULARY Jaccard between sources — the set-overlap
    companion to ``text_source_kl``'s distributional divergence: two
    sources can share a vocabulary yet weight it differently (KL high,
    Jaccard high) or barely overlap at all (both low); curation mix
    decisions read both. Words are lowercase space tokens (the corpus
    tokenization idiom); every number is an exact integer set size and
    the Jaccard is the exact-rational half-up of |A∩B| / |A∪B| with
    |A∪B| = |A| + |B| − |A∩B|.

    Scale: one distinct on (source, word) — vocabulary-bounded, not
    corpus-bounded — then a word-keyed self-join whose output per word
    is (#sources carrying it choose 2) ≤ S², with the source count S a
    small constant at any data scale; no document pair is ever
    joined."""
    docs = _docs(spark, sf_dir)
    # the vocabulary frame feeds sizes + BOTH join sides — checkpoint so
    # the corpus explode/distinct runs ONCE (PLANS r8 lesson 1)
    words = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = words.groupBy("source").agg(F.count("*").cast("long").alias("v"))
    a = words.select(F.col("source").alias("src_a"), "word")
    b = words.select(F.col("source").alias("src_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "src_a")
                        .withColumnRenamed("v", "va")),
            "src_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "src_b")
                        .withColumnRenamed("v", "vb")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("va").alias("vocab_a"),
            F.col("vb").alias("vocab_b"),
            "n_inter",
            F.expr(
                rat_round6_spark("n_inter", "va + vb - n_inter")
            ).alias("jaccard_r6"),
        )
        .orderBy("src_a", "src_b")
    )


ORACLE_SOURCE_VOCAB_JACCARD = f"""
WITH words AS (
  SELECT DISTINCT source, w.word
  FROM documents,
       LATERAL unnest(string_split(lower(text), ' ')) AS w(word)
  WHERE w.word <> ''),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM words GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM words a JOIN words b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2)
SELECT src_a, src_b, sa.v AS vocab_a, sb.v AS vocab_b, n_inter,
       {rat_round6_duck("n_inter", "sa.v + sb.v - n_inter")} AS jaccard_r6
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
ORDER BY src_a, src_b
"""


# --------------------------------------------------------------------------
# Longest duplicated span (ExactSubstr's span-length readout)
# --------------------------------------------------------------------------


def _dup_regions(spark: SparkSession, sf_dir: str):
    """(docs, regions) where regions = one row per maximal duplicated
    token run: (doc_id, gid, rs, re), rs/re 1-based inclusive token
    positions. A position is duplicated when covered by a {SPAN_W}-token
    stride-1 window whose content appears in >= 2 distinct docs; runs
    come from one interval-union (gaps-and-islands with a running
    max-end) over the fingerprint stream. Shared by
    :func:`dedup_longest_dup_span` (length readout) and
    :func:`text_dup_region_removal` (the cleaned-corpus artifact), so
    the two surfaces cut exactly the same boundaries."""
    docs = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    base = docs.repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    ).select(
        "doc_id",
        ws.alias("ws"),
        F.greatest(F.size(ws) - F.lit(SPAN_W - 1), F.lit(0)).alias("n_win"),
    )
    wins = (
        base.filter(F.col("n_win") >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("n_win"))).alias("start"),
            "ws",
        )
        .select(
            "doc_id",
            "start",
            F.md5(
                F.concat_ws(" ", F.slice("ws", F.col("start"), SPAN_W))
            ).alias("fp"),
        )
    )
    shared = (
        wins.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    dup = wins.join(shared, "fp").select(
        "doc_id", "start", (F.col("start") + F.lit(SPAN_W - 1)).alias("e")
    )
    # interval union: a new region starts when this window's coverage
    # [start, e] does not touch the running max end of prior coverage
    w_prev = (
        W.partitionBy("doc_id").orderBy("start")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    grp = dup.withColumn(
        "brk",
        F.when(
            F.col("start")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    ).withColumn(
        "gid", F.sum("brk").over(W.partitionBy("doc_id").orderBy("start"))
    )
    regions = grp.groupBy("doc_id", "gid").agg(
        F.min("start").alias("rs"), F.max("e").alias("re")
    )
    return docs, regions


def dedup_longest_dup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-REGION readout per document (VERDICT r9 #3a —
    upgrades ``dedup_substring_spans``' share-of-duplicated-windows to
    the span-length numbers the ExactSubstr dedup literature reports):
    a token position is *duplicated* when covered by at least one
    {SPAN_W}-token stride-1 window whose content appears in ≥2 distinct
    documents; a *region* is a maximal run of duplicated positions.
    Emits per doc the region count, the longest region (tokens), the
    total duplicated-token coverage, and its share.

    Implementation note: the binary-lifting/doubling construction the
    suffix-automaton literature uses is unnecessary for this readout —
    consecutive duplicated window STARTS already delimit the covered
    intervals, so one interval-union (gaps-and-islands with a running
    max-end, canonical SQL) over the stride-1 fingerprint stream gives
    exact region boundaries in a single window pass. The per-doc window
    is bounded by the doc's own token count, never corpus-sized.

    Scale: identical dataflow to ``dedup_substring_spans`` (map-side
    fingerprint blowup, one hash shuffle on fp, one doc rollup) plus a
    doc_id-partitioned window — no all-pairs, no global window."""
    docs, regions = _dup_regions(spark, sf_dir)
    reg = regions.select(
        "doc_id", "gid", (F.col("re") - F.col("rs") + 1).alias("span")
    )
    per_doc = reg.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_regions"),
        F.max("span").cast("long").alias("max_dup_span"),
        F.sum("span").cast("long").alias("dup_tokens"),
    )
    return (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_regions", F.lit(0))
            .cast("long")
            .alias("n_dup_regions"),
            F.coalesce("max_dup_span", F.lit(0))
            .cast("long")
            .alias("max_dup_span"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.expr(
                rat_round6_spark("coalesce(dup_tokens, 0)", "n_tokens")
            ).alias("dup_token_share_r6"),
        )
        .orderBy("doc_id")
    )


# shared duplicated-region CTE prefix (the _dup_regions twin): d = docs
# with token arrays, reg = (doc_id, gid, rs, re) maximal duplicated runs
_DUP_REGION_CTES = f"""d AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
w AS (
  SELECT doc_id, k AS start,
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp
  FROM d, LATERAL unnest(generate_series(
           1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
pf AS (SELECT fp FROM w GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2),
ds AS (SELECT doc_id, start, start + {SPAN_W - 1} AS e
       FROM w JOIN pf USING (fp)),
isl AS (
  SELECT doc_id, start, e,
         CASE WHEN start > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY start
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS brk
  FROM ds),
grps AS (
  SELECT doc_id, start, e,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY start) AS gid
  FROM isl),
reg AS MATERIALIZED (
  SELECT doc_id, gid, MIN(start) AS rs, MAX(e) AS re
  FROM grps GROUP BY 1, 2)"""


ORACLE_LONGEST_DUP_SPAN = f"""
WITH {_DUP_REGION_CTES},
spans AS (
  SELECT doc_id, gid, re - rs + 1 AS span FROM reg),
pd AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_regions,
         CAST(MAX(span) AS BIGINT) AS max_dup_span,
         CAST(SUM(span) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY 1),
nt AS (SELECT doc_id, len(ws) AS n_tokens FROM d)
SELECT nt.doc_id,
       COALESCE(n_dup_regions, 0) AS n_dup_regions,
       COALESCE(max_dup_span, 0) AS max_dup_span,
       COALESCE(dup_tokens, 0) AS dup_tokens,
       {rat_round6_duck("COALESCE(dup_tokens, 0)", "n_tokens")}
         AS dup_token_share_r6
FROM nt LEFT JOIN pd USING (doc_id)
ORDER BY doc_id
"""


def text_dup_region_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-region REMOVAL materialization (VERDICT r10 #2a — the
    artifact ExactSubstr dedup actually ships): every maximal
    duplicated token run from :func:`_dup_regions` is CUT OUT of the
    document and the surviving tokens re-joined, emitting the cleaned
    corpus plus the removal accounting. Because both ops share the
    region frame, `removed_tokens` here equals `dup_tokens` in
    ``dedup_longest_dup_span`` row-for-row.

    Implementation: the per-doc region list is folded back as an array
    column (regions per doc are bounded by n_tokens/2, usually a
    handful) and one indexed higher-order ``filter(ws, (w, i) -> ...)``
    drops covered positions — pure codegen'd JVM expression, no second
    shuffle after the region frame.

    Scale: the region computation is the dedup_longest_dup_span
    dataflow (fp hash shuffle + doc-grain window); the cut itself is
    map-side. Output is corpus-sized BY DESIGN (it IS the cleaned
    corpus) — scale walls should be measured on count(), not collect()
    (SCALING notes)."""
    docs, regions = _dup_regions(spark, sf_dir)
    regs = regions.groupBy("doc_id").agg(
        F.collect_list(F.struct("rs", "re")).alias("regions")
    )
    ws = F.split("text", " ")
    return (
        docs.join(regs, "doc_id", "left")
        .select(
            "doc_id",
            ws.alias("ws"),
            "regions",
        )
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_tokens"),
            F.expr(
                "filter(ws, (w, i) -> regions is null or not exists("
                "regions, r -> i + 1 >= r.rs and i + 1 <= r.re))"
            ).alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.size("kept"))
            .cast("long")
            .alias("removed_tokens"),
            F.array_join("kept", " ").alias("clean_text"),
        )
        .orderBy("doc_id")
    )


ORACLE_DUP_REGION_REMOVAL = f"""
WITH {_DUP_REGION_CTES},
toks AS (
  SELECT doc_id, i, ws[i] AS w
  FROM d, LATERAL unnest(generate_series(1, len(ws))) AS u(i)),
kept AS (
  SELECT t.doc_id, t.i, t.w FROM toks t
  WHERE NOT EXISTS (SELECT 1 FROM reg r
                    WHERE r.doc_id = t.doc_id
                      AND t.i BETWEEN r.rs AND r.re)),
cl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
         string_agg(w, ' ' ORDER BY i) AS clean_text
  FROM kept GROUP BY 1)
SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
       COALESCE(kept_tokens, 0) AS kept_tokens,
       CAST(len(ws) AS BIGINT) - COALESCE(kept_tokens, 0)
         AS removed_tokens,
       COALESCE(clean_text, '') AS clean_text
FROM d LEFT JOIN cl USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Span-level decontamination vs a static eval index (+ streaming twin)
# --------------------------------------------------------------------------

SPAN_EVAL_MOD = 10  # doc_id % 10 == 0 → the held-out eval/reference set


def span_window_fps(docs: DataFrame) -> DataFrame:
    """Stride-1 {SPAN_W}-token window fingerprints per doc, with an
    ``explode_outer`` so 0-window (short) docs keep one fp=NULL row —
    the rollup then counts windows as count(fp), and batch and
    streaming emit IDENTICAL per-doc rows without a corpus-side left
    join (a stream cannot left-join back to its own source). Shared by
    :func:`doc_span_decontamination` and
    streaming/jobs.run_span_decon_stream."""
    ws = F.split("text", " ")
    return (
        docs.select(
            "doc_id",
            ws.alias("ws"),
            F.greatest(F.size(ws) - F.lit(SPAN_W - 1), F.lit(0)).alias(
                "n_win"
            ),
        )
        .select(
            "doc_id",
            F.explode_outer(
                F.when(
                    F.col("n_win") >= 1,
                    F.sequence(F.lit(1), F.col("n_win")),
                )
            ).alias("start"),
            "ws",
        )
        .select(
            "doc_id",
            F.when(
                F.col("start").isNotNull(),
                F.md5(
                    F.concat_ws(
                        " ", F.slice("ws", F.col("start"), SPAN_W)
                    )
                ),
            ).alias("fp"),
        )
    )


def span_hit_rollup(joined: DataFrame) -> DataFrame:
    """Per-doc contamination rollup over (doc_id, fp, hit) rows —
    shared by the batch op and the streaming job so the DuckDB oracle
    on the batch form transitively gates the stream semantics."""
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("fp").cast("long").alias("n_windows"),
            F.sum(
                F.when(F.col("fp").isNotNull() & (F.col("hit") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_eval_hits"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_eval_hits",
            F.when(F.col("n_windows") == 0, F.lit(0.0))
            .otherwise(
                F.expr(
                    rat_round6_spark(
                        "n_eval_hits", "greatest(n_windows, 1)"
                    )
                )
            )
            .alias("eval_hit_share_r6"),
        )
    )


def doc_span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination against a static reference index
    (the ExactSubstr refinement of ``decontaminate_ngram``'s doc-level
    flag): every held-out eval doc (doc_id % {SPAN_EVAL_MOD} == 0)
    contributes its stride-1 {SPAN_W}-token fingerprints to a static
    index; every TRAINING doc reports how many of its own windows hit
    that index — the per-doc leak surface a curation pipeline uses to
    drop or scrub training examples before an eval is trusted.

    This is also the batch twin of a Structured Streaming job
    (streaming/jobs.run_span_decon_stream): training docs arrive as a
    file stream, the eval index is the static side of a stream-static
    join — the canonical continuous-ingest decontamination shape. Both
    surfaces share :func:`span_window_fps` and :func:`span_hit_rollup`,
    so the oracle here transitively gates the stream.

    Scale: the eval index is the SMALL side (distinct fps of the eval
    slice) → broadcast join against the map-side training fingerprint
    stream; one hash agg by doc_id; no all-pairs, no window."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % SPAN_EVAL_MOD != 0).repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    )
    evalset = docs.filter(F.col("doc_id") % SPAN_EVAL_MOD == 0)
    idx = (
        span_window_fps(evalset)
        .filter(F.col("fp").isNotNull())
        .select("fp")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = span_window_fps(train).join(F.broadcast(idx), "fp", "left")
    return span_hit_rollup(joined).orderBy("doc_id")


ORACLE_SPAN_DECON = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE doc_id % {SPAN_EVAL_MOD} != 0),
ev AS (
  SELECT DISTINCT
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp
  FROM (SELECT string_split(text, ' ') AS ws FROM documents
        WHERE doc_id % {SPAN_EVAL_MOD} = 0) e,
       LATERAL unnest(generate_series(
         1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
w AS (
  SELECT doc_id,
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp
  FROM d, LATERAL unnest(generate_series(
           1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
pd AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(CASE WHEN fp IN (SELECT fp FROM ev) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_eval_hits
  FROM w GROUP BY 1)
SELECT d.doc_id,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_eval_hits, 0) AS n_eval_hits,
       CASE WHEN COALESCE(n_windows, 0) = 0 THEN 0.0
            ELSE {rat_round6_duck(
                "COALESCE(n_eval_hits, 0)",
                "greatest(COALESCE(n_windows, 1), 1)")}
       END AS eval_hit_share_r6
FROM d LEFT JOIN pd USING (doc_id)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Boilerplate-prefix (template) detection
# --------------------------------------------------------------------------

HEAD_TOKS = 2  # opening-token block that defines a "template head"


def text_boilerplate_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate-opening detection (the C4/RefinedWeb cleanup
    family: pages sharing an identical opening block are template
    candidates — nav bars, license headers, scraped frontmatter).
    A doc's *head* is its first {HEAD_TOKS} tokens; a head shared by ≥2
    distinct docs corpus-wide marks all its docs as template candidates.
    Per-source readout: doc count, flagged count + share, and how many
    distinct flagged heads the source carries (1 big template vs many
    small ones — different cleanup actions).

    Scale: one map-side head projection, one hash agg on head (bounded
    by the head vocabulary), one broadcast-size join back — no windows,
    no all-pairs; short docs (< {HEAD_TOKS} tokens) hash whatever tokens
    they have, so no vacuous-pairing class (FIXTURES gotcha)."""
    docs = _docs(spark, sf_dir)
    head = F.array_join(
        F.slice(F.split("text", " "), 1, HEAD_TOKS), " "
    ).alias("head")
    d = docs.select("doc_id", "source", head)
    heads = (
        d.groupBy("head")
        .agg(F.count_distinct("doc_id").alias("nd"))
    )
    flagged = d.join(heads, "head").select(
        "source", "head", (F.col("nd") >= 2).alias("boiler")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("boiler"), 1).otherwise(0))
            .cast("long")
            .alias("n_boiler_docs"),
            F.count_distinct(
                F.when(F.col("boiler"), F.col("head"))
            ).cast("long").alias("n_boiler_heads"),
        )
        .select(
            "source",
            "n_docs",
            "n_boiler_docs",
            "n_boiler_heads",
            F.expr(rat_round6_spark("n_boiler_docs", "n_docs")).alias(
                "boiler_share_r6"
            ),
        )
        .orderBy("source")
    )


ORACLE_BOILERPLATE_HEADS = f"""
WITH d AS (
  SELECT doc_id, source,
         array_to_string((string_split(text, ' '))[1 : {HEAD_TOKS}], ' ')
           AS head
  FROM documents),
hb AS (SELECT head, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY 1),
f AS (SELECT d.source, d.head, (hb.nd >= 2) AS boiler
      FROM d JOIN hb USING (head)),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler_docs,
         CAST(COUNT(DISTINCT CASE WHEN boiler THEN head END) AS BIGINT)
           AS n_boiler_heads
  FROM f GROUP BY 1)
SELECT source, n_docs, n_boiler_docs, n_boiler_heads,
       {rat_round6_duck("n_boiler_docs", "n_docs")} AS boiler_share_r6
FROM agg ORDER BY source
"""


# --------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer OOV planning)
# --------------------------------------------------------------------------

COVERAGE_KS = (1, 2, 4, 8, 16, 32)


def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary coverage: what share of all token OCCURRENCES do
    the k most frequent word types cover, for k ∈ {COVERAGE_KS}? The
    curve a tokenizer/vocab budget is planned from (the complement is
    the OOV rate a k-word vocab would eat). Ranking is (count DESC,
    word ASC) — a total order, so every cut is deterministic.

    Scale: the word rollup is one vocabulary-keyed hash agg; the top-32
    cut is a TakeOrderedAndProject (no global window over the
    vocabulary) and the running sum runs over that ≤32-row frame."""
    wc = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    tot = wc.agg(F.sum("c").cast("long").alias("total_occurrences"))
    top = (
        wc.orderBy(F.desc("c"), F.asc("w"))
        .limit(max(COVERAGE_KS))
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.desc("c"), F.asc("w"))),
        )
    )
    run = top.withColumn(
        "covered",
        F.sum("c").over(
            W.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        run.filter(F.col("rn").isin(*COVERAGE_KS))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rn").cast("int").alias("k"),
            F.col("covered").cast("long").alias("covered_occurrences"),
            "total_occurrences",
            F.expr(
                rat_round6_spark("covered", "total_occurrences")
            ).alias("coverage_r6"),
        )
        .orderBy("k")
    )


ORACLE_VOCAB_COVERAGE = f"""
WITH wc AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_occurrences FROM wc),
r AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM wc),
run AS (
  SELECT rn, CAST(SUM(c) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS covered
  FROM r WHERE rn <= {max(COVERAGE_KS)})
SELECT CAST(rn AS INT) AS k, covered AS covered_occurrences,
       total_occurrences,
       {rat_round6_duck("covered", "total_occurrences")} AS coverage_r6
FROM run, tot
WHERE rn IN {COVERAGE_KS}
ORDER BY k
"""


# --------------------------------------------------------------------------
# Character-class profile per source
# --------------------------------------------------------------------------


def text_char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class accounting — the cheapest corpus
    health probe (encoding damage, wrong-language scrapes, and
    markup-heavy sources all move these ratios before any tokenizer
    runs): vowels (via translate-strip), whitespace, and everything
    else ("consonants" on this letters+spaces fixture; punctuation/
    digits would land here too on a raw crawl). Word count derives from
    the single-space convention (spaces + 1 per doc). Map-only integer
    sums; ratios are exact-rational half-up."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "source",
        F.length("text").alias("nc"),
        (
            F.length("text")
            - F.length(F.translate("text", "aeiou", ""))
        ).alias("nv"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
        ).alias("nsp"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
            F.sum("nv").cast("long").alias("n_vowels"),
            F.sum("nsp").cast("long").alias("n_spaces"),
        )
        .select(
            "source",
            "n_docs",
            "n_chars",
            "n_vowels",
            (F.col("n_chars") - F.col("n_vowels") - F.col("n_spaces"))
            .cast("long")
            .alias("n_consonants"),
            "n_spaces",
            F.expr(rat_round6_spark("n_vowels", "n_chars")).alias(
                "vowel_share_r6"
            ),
            F.expr(
                rat_round6_spark(
                    "n_chars - n_spaces", "n_spaces + n_docs"
                )
            ).alias("letters_per_word_r6"),
        )
        .orderBy("source")
    )


ORACLE_CHAR_CLASS_PROFILE = f"""
WITH d AS (
  SELECT source,
         len(text) AS nc,
         len(text) - len(translate(text, 'aeiou', '')) AS nv,
         len(text) - len(replace(text, ' ', '')) AS nsp
  FROM documents),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nc) AS BIGINT) AS n_chars,
         CAST(SUM(nv) AS BIGINT) AS n_vowels,
         CAST(SUM(nsp) AS BIGINT) AS n_spaces
  FROM d GROUP BY 1)
SELECT source, n_docs, n_chars, n_vowels,
       CAST(n_chars - n_vowels - n_spaces AS BIGINT) AS n_consonants,
       n_spaces,
       {rat_round6_duck("n_vowels", "n_chars")} AS vowel_share_r6,
       {rat_round6_duck("n_chars - n_spaces", "n_spaces + n_docs")}
         AS letters_per_word_r6
FROM agg ORDER BY source
"""


# --------------------------------------------------------------------------
# Consonant-run profile (OCR/gibberish heuristic)
# --------------------------------------------------------------------------

RUN_LONG = 3  # runs of >= this many consecutive consonants are "long"


def text_consonant_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consonant-run profile per document — the classic OCR-garbage /
    gibberish heuristic (natural language keeps consonant clusters
    short; mojibake and binary-pasted-as-text produce long runs).
    Splitting on the vowel+space class leaves exactly the maximal
    consonant runs; empty fragments (adjacent vowels, leading edge)
    are filtered identically on both engines. Map-only HOF pass.

    The fragment list is bound ONCE via the single-element-array
    transform trick (interpreted lambdas get no CSE — the original
    three-column form ran the regex split 3× per row; the text_quality
    precedent), and the scan goes through load_par so the pass isn't
    one task on a sub-split corpus (r14 optimization round)."""
    docs = catalog.load_par(spark, sf_dir, "documents", "doc_id")
    frags = "filter(split(text, '[aeiou ]+'), x -> x != '')"
    q = F.expr(
        f"""transform(array({frags}), f -> struct(
              cast(size(f) as bigint) as n_runs,
              cast(coalesce(array_max(transform(f, x -> length(x))), 0)
                   as bigint) as max_run,
              cast(size(filter(f, x -> length(x) >= {RUN_LONG})) as bigint)
                as n_long_runs
            ))[0]"""
    )
    return (
        docs.select("doc_id", q.alias("q"))
        .select("doc_id", "q.*")
        .orderBy("doc_id")
    )


ORACLE_CONSONANT_RUNS = f"""
SELECT doc_id,
       CAST(len(f) AS BIGINT) AS n_runs,
       CAST(COALESCE(list_max(list_transform(f, x -> len(x))), 0)
            AS BIGINT) AS max_run,
       CAST(len(list_filter(f, x -> len(x) >= {RUN_LONG})) AS BIGINT)
         AS n_long_runs
FROM (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[aeiou ]+'),
                     x -> x != '') AS f
  FROM documents)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE merge sequence (iterative tokenizer training, unrolled)
# --------------------------------------------------------------------------

BPE_MERGE_ROUNDS = 4


def text_bpe_merge_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {BPE_MERGE_ROUNDS} byte-pair-encoding merges — the
    iterative extension of ``text_bpe_first_merge`` (whose top-1 pair
    equals this op's step 1 by construction, pinned in pytest): each
    round counts adjacent SYMBOL pairs over the vocabulary (weighted by
    word count), picks the top pair (freq DESC, pair ASC — the
    deterministic trainer convention), and applies the merge greedy
    left-to-right non-overlapping — exactly what ``replace()`` does in
    BOTH engines on a delimited symbol string: a word is kept as
    ',sym,,sym,,sym,' (symbols never contain ','), so the pair pattern
    ',x,,y,' can neither match inside a multi-char symbol nor skip
    adjacent occurrences (the replaced ',xy,' re-forms the ',,'
    boundary with the next match's leading ',').

    Scale: the vocabulary-contraction trick of the first-merge op —
    everything after the (word, count) hash agg is vocabulary-sized;
    each round is one explode + hash agg + a 1-row broadcast crossJoin;
    rounds are a fixed unrolled constant and each round's vocab frame
    is localCheckpointed (it feeds both the next round and nothing
    else, but the 1-row top frame feeds output AND the merge — the
    branched-lineage rule)."""
    wc = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.length("w") >= 2)
    )
    cur = wc.select(
        F.expr(
            "concat(',', concat_ws(',,', transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1))), ',')"
        ).alias("s"),
        "c",
    ).localCheckpoint(eager=True)
    outs = []
    for step in range(1, BPE_MERGE_ROUNDS + 1):
        syms = cur.select(
            "c",
            F.expr("split(substring(s, 2, length(s) - 2), ',,')").alias(
                "y"
            ),
        ).filter(F.size("y") >= 2)
        pairs = syms.select(
            "c",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(y) - 1), i -> "
                    "struct(element_at(y, i) as x, element_at(y, i + 1) as z))"
                )
            ).alias("pr"),
        )
        top = (
            pairs.groupBy(
                F.col("pr.x").alias("x"), F.col("pr.z").alias("z")
            )
            .agg(F.sum("c").cast("long").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("x"), F.asc("z"))
            .limit(1)
            .localCheckpoint(eager=True)  # 1 row, feeds output + merge
        )
        outs.append(
            top.select(
                F.lit(step).cast("int").alias("merge_step"),
                F.col("x").alias("pair_x"),
                F.col("z").alias("pair_y"),
                "freq",
            )
        )
        cur = (
            cur.crossJoin(F.broadcast(top.select("x", "z")))
            .select(
                F.expr(
                    "replace(s, concat(',', x, ',,', z, ','),"
                    " concat(',', x, z, ','))"
                ).alias("s"),
                "c",
            )
            .localCheckpoint(eager=True)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.orderBy("merge_step")


def _bpe_merge_oracle() -> str:
    parts = [
        """wc AS MATERIALIZED (
  SELECT w, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1 HAVING len(w) >= 2),
s0 AS MATERIALIZED (
  SELECT ',' || array_to_string(
           [substr(w, i, 1) for i in generate_series(1, len(w))], ',,')
         || ',' AS s, c
  FROM wc)"""
    ]
    for k in range(1, BPE_MERGE_ROUNDS + 1):
        parts.append(
            f"""y{k} AS (
  SELECT string_split(substr(s, 2, len(s) - 2), ',,') AS y, c
  FROM s{k - 1}),
p{k} AS (
  SELECT y[i] AS x, y[i + 1] AS z, c
  FROM y{k}, LATERAL unnest(generate_series(1, len(y) - 1)) AS u(i)
  WHERE len(y) >= 2),
t{k} AS MATERIALIZED (
  SELECT x, z, CAST(SUM(c) AS BIGINT) AS freq
  FROM p{k} GROUP BY 1, 2
  ORDER BY freq DESC, x, z LIMIT 1),
s{k} AS MATERIALIZED (
  SELECT replace(s{k - 1}.s, ',' || t{k}.x || ',,' || t{k}.z || ',',
                 ',' || t{k}.x || t{k}.z || ',') AS s, c
  FROM s{k - 1}, t{k})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS merge_step, x AS pair_x, z AS pair_y,"
        f" freq FROM t{k}"
        for k in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\n{selects} ORDER BY merge_step"


ORACLE_BPE_MERGE_SEQUENCE = _bpe_merge_oracle()


# --------------------------------------------------------------------------
# Cohen's kappa between the lang label and the lang-ID heuristic
# --------------------------------------------------------------------------


def stats_cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the labeled language and the stopword-vote
    lang-ID prediction — chance-corrected agreement, the honest version
    of raw accuracy when the label distribution is skewed (this fixture
    is en-heavy, so accuracy alone flatters the classifier).

    Exact integer form: κ = (N·Σdiag − Σ_k row_k·col_k) /
    (N² − Σ_k row_k·col_k) — numerator can be negative (worse than
    chance) → signed half-up rational; the degenerate pe = 1 case
    (single category on both sides) is defined as 1.0 on perfect
    agreement else 0.0, mirrored on both engines. Bounded label
    alphabet → the marginal join is a few rows."""
    p = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    tot = p.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("lang") == F.col("pred_lang"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
    )
    rows = p.groupBy(F.col("lang").alias("cat")).agg(
        F.count("*").cast("long").alias("n_row")
    )
    cols = p.groupBy(F.col("pred_lang").alias("cat")).agg(
        F.count("*").cast("long").alias("n_col")
    )
    rc = rows.join(cols, "cat", "full").agg(
        F.sum(
            F.coalesce("n_row", F.lit(0)) * F.coalesce("n_col", F.lit(0))
        )
        .cast("long")
        .alias("sum_rc")
    )
    return tot.crossJoin(rc).select(
        "n_docs",
        "n_agree",
        "sum_rc",
        F.when(
            F.col("n_docs") * F.col("n_docs") == F.col("sum_rc"),
            F.when(
                F.col("n_agree") == F.col("n_docs"), F.lit(1.0)
            ).otherwise(F.lit(0.0)),
        )
        .otherwise(
            F.expr(
                rat_round6_signed_spark(
                    "n_docs * n_agree - sum_rc",
                    "n_docs * n_docs - sum_rc",
                )
            )
        )
        .alias("kappa_r6"),
    )


ORACLE_COHENS_KAPPA = f"""
WITH pred AS (
  SELECT lang,
         CASE WHEN v_en = 0 AND v_de = 0 AND v_fr = 0 AND v_es = 0 THEN 'und'
              WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en'
              WHEN v_de >= v_fr AND v_de >= v_es THEN 'de'
              WHEN v_fr >= v_es THEN 'fr' ELSE 'es' END AS pred_lang
  FROM (
    SELECT doc_id, lang,
           {_duck_votes}
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
          FROM documents))),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM pred),
r AS (SELECT lang AS cat, CAST(COUNT(*) AS BIGINT) AS n_row
      FROM pred GROUP BY 1),
c AS (SELECT pred_lang AS cat, CAST(COUNT(*) AS BIGINT) AS n_col
      FROM pred GROUP BY 1),
rc AS (
  SELECT CAST(SUM(COALESCE(n_row, 0) * COALESCE(n_col, 0)) AS BIGINT)
           AS sum_rc
  FROM r FULL JOIN c USING (cat))
SELECT n_docs, n_agree, sum_rc,
       CASE WHEN n_docs * n_docs = sum_rc
            THEN (CASE WHEN n_agree = n_docs THEN 1.0 ELSE 0.0 END)
            ELSE {rat_round6_signed_duck(
                "n_docs * n_agree - sum_rc", "n_docs * n_docs - sum_rc")}
       END AS kappa_r6
FROM tot, rc
"""


# --------------------------------------------------------------------------
# Bloom false-positive-rate audit (md5 double hashing, engine-portable)
# --------------------------------------------------------------------------

FPR_BLOOM_M = 8192  # bits — sized so the fixture measures a non-trivial FPR
FPR_BLOOM_K = 3
FPR_BLOOM_WORDS = FPR_BLOOM_M // 64


def _fpr_pos_spark(i: int, col: str = "s") -> str:
    h1 = f"pmod({sql_md5_long_spark(col, 1, 15)}, {FPR_BLOOM_M})"
    h2 = f"(1 + pmod({sql_md5_long_spark(col, 16, 15)}, {FPR_BLOOM_M}))"
    return f"pmod({h1} + {i} * {h2}, {FPR_BLOOM_M})"


def sketch_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured (not formulaic) Bloom false-positive rate: build a
    {FPR_BLOOM_M}-bit / k={FPR_BLOOM_K} filter over one key namespace
    ('ord:'-prefixed order custkeys) and probe it with a DISJOINT
    namespace ('cust:'-prefixed customer keys) — every probe is a true
    non-member, so every pass is a false positive. The empirical FPR
    and bit-fill are what an operator compares against the
    (1 − e^{{-kn/m}})^k design formula before trusting a bloom
    prefilter at 100 TB (the production ``decontaminate_bloom`` filter
    is exactness-transparent, so THIS op is where the FP behavior gets
    observed).

    Unlike the production filter (xxhash64, Spark-only), positions here
    are md5 double-hashing — bit-identical in DuckDB, so the oracle
    rebuilds the same filter and the whole audit carries a full
    value-hash gate. The bitset build collects ≤{FPR_BLOOM_WORDS}
    64-bit words (bounded by M, never by data); probing is one
    broadcast + codegen conjunction."""
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    members = orders.select(
        F.concat(F.lit("ord:"), F.col("o_custkey")).alias("s")
    ).distinct()
    pos = members.select(
        F.explode(
            F.array(
                *[F.expr(_fpr_pos_spark(i)) for i in range(FPR_BLOOM_K)]
            )
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()  # bounded: <= FPR_BLOOM_WORDS rows, whatever the data
    )
    bitset = [0] * FPR_BLOOM_WORDS
    for r in words:
        bitset[r["w"]] = r["bits"]
    n_bits_set = sum(bin(w & ((1 << 64) - 1)).count("1") for w in bitset)
    bloom = spark.createDataFrame(
        [(bitset,)], "bloom_bits array<long> not null"
    )
    hits = []
    for i in range(FPR_BLOOM_K):
        p = _fpr_pos_spark(i)
        word = f"element_at(bloom_bits, cast(shiftright({p}, 6) as int) + 1)"
        mask = f"shiftleft(1L, cast({p} % 64 as int))"
        hits.append(f"(({word} & {mask}) != 0)")
    pass_sql = " AND ".join(hits)
    probes = customer.select(
        F.concat(F.lit("cust:"), F.col("c_custkey")).alias("s")
    ).distinct()
    probed = probes.crossJoin(F.broadcast(bloom)).agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.when(F.expr(pass_sql), 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
    )
    return (
        members.agg(F.count("*").cast("long").alias("n_members"))
        .crossJoin(probed)
        .select(
            "n_members",
            "n_probes",
            "n_pass",
            F.expr(rat_round6_spark("n_pass", "n_probes")).alias("fpr_r6"),
            F.lit(n_bits_set).cast("long").alias("n_bits_set"),
            F.expr(
                rat_round6_spark(
                    f"cast({n_bits_set} as bigint)", str(FPR_BLOOM_M)
                )
            ).alias("fill_r6"),
        )
    )


_FPR_LANES_DUCK = (
    f"CAST({sql_md5_long_duck('s', 1, 15)} % {FPR_BLOOM_M} AS BIGINT) AS h1,"
    f" CAST(1 + {sql_md5_long_duck('s', 16, 15)} % {FPR_BLOOM_M} AS BIGINT)"
    " AS h2"
)

ORACLE_BLOOM_FPR = f"""
WITH m AS (SELECT DISTINCT 'ord:' || o_custkey AS s FROM orders),
mh AS (SELECT s, {_FPR_LANES_DUCK} FROM m),
mp AS MATERIALIZED (
  SELECT DISTINCT (h1 + i.range * h2) % {FPR_BLOOM_M} AS pos
  FROM mh, range({FPR_BLOOM_K}) i),
p AS (SELECT DISTINCT 'cust:' || c_custkey AS s FROM customer),
ph AS (SELECT s, {_FPR_LANES_DUCK} FROM p),
pp AS (SELECT s, (h1 + i.range * h2) % {FPR_BLOOM_M} AS pos
       FROM ph, range({FPR_BLOOM_K}) i),
hit AS (
  SELECT pp.s,
         SUM(CASE WHEN mp.pos IS NOT NULL THEN 1 ELSE 0 END) AS k
  FROM pp LEFT JOIN mp USING (pos) GROUP BY 1),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(CASE WHEN k = {FPR_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass
  FROM hit),
nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM m),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits FROM mp)
SELECT n_members, n_probes, n_pass,
       {rat_round6_duck("n_pass", "n_probes")} AS fpr_r6,
       nb.n_bits AS n_bits_set,
       {rat_round6_duck("nb.n_bits", str(FPR_BLOOM_M))} AS fill_r6
FROM nm, agg, nb
"""


# --------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weights (data selection)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 512  # hashed feature space (md5 low bits)
DSIR_TARGET_LANG = "en"  # target-domain proxy: the English slice


def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights for target-domain resampling
    (Data Selection via Importance Resampling, Xie et al. 2023 — the
    public hashed-ngram method; VERDICT r10 #2b): features are word
    unigrams + bigrams hashed into {DSIR_BUCKETS} md5 buckets; the
    TARGET distribution is estimated from the lang='{DSIR_TARGET_LANG}'
    slice and the RAW distribution from the whole corpus. Each doc's
    weight readout is the exact integer mass ratio
    tgt_mass / raw_mass = Σ_f t_bucket(f) / Σ_f r_bucket(f)
    (sum over the doc's feature occurrences), half-up at 6dp via the
    quotient/remainder split — the global T/R normalization is a
    rank-preserving constant left to the sampler. tgt_mass and
    raw_mass are also emitted raw (BIGINT) so a consumer can resample
    at any temperature without recomputing the corpus pass.

    Scale: two bucket tables of {DSIR_BUCKETS} rows (broadcast), one
    map-side feature explode, one doc-grain hash agg — no corpus
    self-join anywhere; raw_mass >= n_feats >= 1 so the ratio is
    always defined."""
    docs = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    base = docs.repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    ).select("doc_id", "lang", ws.alias("ws"))
    feats = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(ws, case when size(ws) >= 2 then "
                "transform(sequence(0, size(ws) - 2), "
                "i -> concat(ws[i], ' ', ws[i + 1])) "
                "else array() end)"
            )
        ).alias("feat"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            f"{sql_md5_long_spark('feat')} % {DSIR_BUCKETS}"
        ).alias("bucket"),
    )
    raw_b = feats.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    tgt_b = (
        feats.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    return (
        feats.join(F.broadcast(raw_b), "bucket")
        .join(F.broadcast(tgt_b), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum(F.coalesce("t_cnt", F.lit(0)))
            .cast("long")
            .alias("tgt_mass"),
            F.sum("r_cnt").cast("long").alias("raw_mass"),
        )
        .select(
            "doc_id",
            "n_feats",
            "tgt_mass",
            "raw_mass",
            F.expr(qrem_round6_spark("tgt_mass", "raw_mass")).alias(
                "w_ratio_r6"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_DSIR_IMPORTANCE = f"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
uni AS (
  SELECT doc_id, lang, unnest(ws) AS feat FROM d),
bi AS (
  SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS feat
  FROM d, LATERAL unnest(generate_series(1, len(ws) - 1)) AS u(i)),
feats AS MATERIALIZED (
  SELECT doc_id, lang,
         {sql_md5_long_duck('feat')} % {DSIR_BUCKETS} AS bucket
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
raw_b AS (SELECT bucket, COUNT(*) AS r_cnt FROM feats GROUP BY 1),
tgt_b AS (SELECT bucket, COUNT(*) AS t_cnt FROM feats
          WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY 1),
pd AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(COALESCE(t_cnt, 0)) AS BIGINT) AS tgt_mass,
         CAST(SUM(r_cnt) AS BIGINT) AS raw_mass
  FROM feats
  JOIN raw_b USING (bucket)
  LEFT JOIN tgt_b USING (bucket)
  GROUP BY 1)
SELECT doc_id, n_feats, tgt_mass, raw_mass,
       {qrem_round6_duck("tgt_mass", "raw_mass")} AS w_ratio_r6
FROM pd ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Tokenizer fertility / bytes-per-token audit (per source)
# --------------------------------------------------------------------------

SUBWORD_W = 4  # fixed-stride subword proxy: ceil(len(word)/4) pieces


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit by source (VERDICT r10 #2d — the
    sibling of the BPE family): fertility = subword tokens per word and
    bytes per subword token, the two numbers a tokenizer budget is
    planned from (a source with fertility 2.1 costs 2.1× the context
    of fertility 1.0 for the same words; bytes/token calibrates
    storage-to-token conversion). The subword count uses the
    deterministic fixed-stride proxy ceil(len(word)/{SUBWORD_W}) — an
    upper-bound-style stand-in for a trained BPE (which lives in the
    text_bpe_* ops); the accounting pipeline (per-doc fold, per-source
    rollup, exact rational readouts) is the production shape.

    Scale: one map-side per-doc ``aggregate`` fold (no explode row
    blow-up on the Spark side), one source-grain hash agg — partial
    aggregation makes the exchange source-bounded."""
    docs = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    per_doc = docs.select(
        "source",
        F.size(ws).alias("n_words"),
        F.expr(
            f"aggregate(split(text, ' '), 0L, (acc, w) -> "
            f"acc + (length(w) + {SUBWORD_W - 1}) div {SUBWORD_W})"
        ).alias("n_subwords"),
        F.octet_length("text").alias("n_bytes"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_subwords"),
            F.sum("n_bytes").cast("long").alias("n_bytes"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_subwords",
            "n_bytes",
            F.expr(rat_round6_spark("n_subwords", "n_words")).alias(
                "fertility_r6"
            ),
            F.expr(rat_round6_spark("n_bytes", "n_subwords")).alias(
                "bytes_per_token_r6"
            ),
        )
        .orderBy("source")
    )


ORACLE_TOKENIZER_FERTILITY = f"""
WITH d AS (
  SELECT source, string_split(text, ' ') AS ws,
         octet_length(encode(text)) AS n_bytes
  FROM documents),
w AS (SELECT source, unnest(ws) AS w FROM d),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM((len(w) + {SUBWORD_W - 1}) // {SUBWORD_W}) AS BIGINT)
           AS n_subwords
  FROM w GROUP BY 1),
b AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_bytes) AS BIGINT) AS n_bytes
  FROM d GROUP BY 1)
SELECT source, n_docs, n_words, n_subwords, n_bytes,
       {rat_round6_duck("n_subwords", "n_words")} AS fertility_r6,
       {rat_round6_duck("n_bytes", "n_subwords")} AS bytes_per_token_r6
FROM a JOIN b USING (source)
ORDER BY source
"""


# --------------------------------------------------------------------------
# Gopher-style quality rule gates (per doc)
# --------------------------------------------------------------------------

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO = 3  # mean word length bounds (chars)
GOPHER_MEAN_LEN_HI = 10
GOPHER_MIN_STOPWORDS = 2  # distinct stopwords required
GOPHER_REP_DEN = 5  # top-word share <= 1/5


def text_gopher_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rule gates (the Rae et al. 2021 filter
    bundle, adapted to the fixture's alphabetic corpus): per document,
    four independent pass/fail flags —
      r1 word count in [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}];
      r2 mean word length in [{GOPHER_MEAN_LEN_LO}, {GOPHER_MEAN_LEN_HI}]
         (cross-multiplied: lo·n <= total_chars <= hi·n, no division);
      r3 at least {GOPHER_MIN_STOPWORDS} distinct stopwords present
         (the \"real language\" heuristic);
      r4 top single-word share <= 1/{GOPHER_REP_DEN}
         ({GOPHER_REP_DEN}·max_count <= n_words — the repetition gate)
    — plus the conjunction. Every comparison is integer-exact; the
    flags are the artifact a curation pass filters on, composable with
    corpus_quality_gate's simpler length/uniqueness screen.

    Scale: pure map-side higher-order expressions per doc (the mode
    count is a distinct×occurrence fold bounded by the doc's own token
    count) — embarrassingly parallel, no shuffle. load_par because the
    r4 repetition gate is O(distinct×tokens) per doc — the heaviest
    map-only pass in this module (r14 optimization round)."""
    docs = catalog.load_par(spark, sf_dir, "documents", "doc_id")
    stop = _spark_arr(STOPWORDS)
    return (
        docs.select(
            "doc_id",
            F.expr(
                f"""named_struct(
  'n', size(split(text, ' ')),
  'chars', aggregate(split(text, ' '), 0L, (acc, w) -> acc + length(w)),
  'stops', size(array_intersect(array_distinct(split(text, ' ')), {stop})),
  'maxc', array_max(transform(array_distinct(split(text, ' ')),
            d -> size(filter(split(text, ' '), w -> w = d))))
)"""
            ).alias("m"),
        )
        .select(
            "doc_id",
            F.col("m.n").cast("long").alias("n_words"),
            (
                (F.col("m.n") >= GOPHER_MIN_WORDS)
                & (F.col("m.n") <= GOPHER_MAX_WORDS)
            ).alias("r1_wordcount"),
            (
                (F.col("m.chars") >= GOPHER_MEAN_LEN_LO * F.col("m.n"))
                & (F.col("m.chars") <= GOPHER_MEAN_LEN_HI * F.col("m.n"))
            ).alias("r2_meanlen"),
            (F.col("m.stops") >= GOPHER_MIN_STOPWORDS).alias("r3_stopwords"),
            (GOPHER_REP_DEN * F.col("m.maxc") <= F.col("m.n")).alias(
                "r4_repetition"
            ),
        )
        .withColumn(
            "pass_all",
            F.col("r1_wordcount")
            & F.col("r2_meanlen")
            & F.col("r3_stopwords")
            & F.col("r4_repetition"),
        )
        .orderBy("doc_id")
    )


ORACLE_GOPHER_GATES = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (
  SELECT doc_id,
         len(ws) AS n,
         list_sum(list_transform(ws, w -> len(w))) AS chars,
         len(list_intersect(list_distinct(ws), {_duck_arr(STOPWORDS)}))
           AS stops,
         list_max(list_transform(list_distinct(ws),
             d -> len(list_filter(ws, w -> w = d)))) AS maxc
  FROM d)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS})
         AS r1_wordcount,
       (chars >= {GOPHER_MEAN_LEN_LO} * n
        AND chars <= {GOPHER_MEAN_LEN_HI} * n) AS r2_meanlen,
       (stops >= {GOPHER_MIN_STOPWORDS}) AS r3_stopwords,
       ({GOPHER_REP_DEN} * maxc <= n) AS r4_repetition,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
        AND chars >= {GOPHER_MEAN_LEN_LO} * n
        AND chars <= {GOPHER_MEAN_LEN_HI} * n
        AND stops >= {GOPHER_MIN_STOPWORDS}
        AND {GOPHER_REP_DEN} * maxc <= n) AS pass_all
FROM m ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Document rarity profile (df-based outlier telemetry)
# --------------------------------------------------------------------------

RARE_DF = 3  # a token is "rare" when it appears in <= this many docs


def text_rarity_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rarity profile against the corpus's own document
    frequencies — the outlier telemetry that surfaces OCR noise,
    foreign-language slips and junk docs (rare-token-heavy) as well as
    boilerplate (common-token-heavy) without any external model:
    rare_share = share of token occurrences whose word appears in
    <= {RARE_DF} docs, and mean_df_bits = mean bit_length(df) (the
    integer log2 band of each token's df — low mean = rare-heavy).
    Both are exact rationals; IDF itself (a float log) never appears.

    Scale: one distinct + one vocab-grain df agg, one token->df hash
    join (vocab-bounded side), one doc rollup — the TF-IDF dataflow
    with integer readouts."""
    docs = _docs(spark, sf_dir)
    toks = docs.repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    ).select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    df = (
        toks.distinct()
        .groupBy("w")
        .agg(F.count("*").alias("df"))
    )
    return (
        toks.join(df, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("df") <= RARE_DF, 1).otherwise(0))
            .cast("long")
            .alias("rare_tokens"),
            F.sum(F.expr("length(bin(df))")).cast("long").alias("sum_df_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "rare_tokens",
            F.expr(rat_round6_spark("rare_tokens", "n_tokens")).alias(
                "rare_share_r6"
            ),
            F.expr(rat_round6_spark("sum_df_bits", "n_tokens")).alias(
                "mean_df_bits_r6"
            ),
        )
        .orderBy("doc_id")
    )


ORACLE_RARITY_OUTLIERS = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
df AS (
  SELECT w, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, w FROM toks) GROUP BY 1),
pd AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN df <= {RARE_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS rare_tokens,
         CAST(SUM(LENGTH(bin(df))) AS BIGINT) AS sum_df_bits
  FROM toks JOIN df USING (w) GROUP BY 1)
SELECT doc_id, n_tokens, rare_tokens,
       {rat_round6_duck("rare_tokens", "n_tokens")} AS rare_share_r6,
       {rat_round6_duck("sum_df_bits", "n_tokens")} AS mean_df_bits_r6
FROM pd ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Simpson lexical concentration (per source)
# --------------------------------------------------------------------------

def text_simpson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration index per source: the probability two
    token occurrences drawn without replacement are the SAME word,
    lambda = Σ c_w(c_w−1) / (n(n−1)) — the collision-rate entropy proxy
    that is exactly computable in integers (Shannon entropy's float
    logs are not), high for template/boilerplate sources and low for
    diverse prose; its reciprocal is the \"effective vocabulary\".
    Emitted with vocab size and the top-word share for the same
    repetitiveness triage.

    Scale: one (source, word) count agg + one source rollup — both
    map-side combinable; output is source-bounded."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    counts = toks.groupBy("source", "w").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("vocab"),
            F.max("c").cast("long").alias("top_count"),
            F.sum(F.expr("c * (c - 1)")).cast("long").alias("coll_num"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "top_count",
            F.expr(
                rat_round6_spark("coll_num", "n_tokens * (n_tokens - 1)")
            ).alias("simpson_r6"),
            F.expr(rat_round6_spark("top_count", "n_tokens")).alias(
                "top_share_r6"
            ),
        )
        .orderBy("source")
    )


ORACLE_SIMPSON = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
s AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(MAX(c) AS BIGINT) AS top_count,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS coll_num
  FROM c GROUP BY 1)
SELECT source, n_tokens, vocab, top_count,
       {rat_round6_duck("coll_num", "n_tokens * (n_tokens - 1)")}
         AS simpson_r6,
       {rat_round6_duck("top_count", "n_tokens")} AS top_share_r6
FROM s ORDER BY source
"""


# --------------------------------------------------------------------------
# Chi-square independence: source x length band
# --------------------------------------------------------------------------

def stats_chi_square_source_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson chi-square independence cells for source × token-length
    band (band = bit_length of the doc's token count — the log2 grid):
    per DENSE cell (zero-observed cells included, as the statistic
    requires) the observed count, marginals, expected count and the
    chi-square contribution (O−E)²/E — algebraically restated over
    integers as (O·N − rs·cs)² / (rs·cs·N) so no float appears before
    the final 6dp half-up (quotient/remainder split; numerator is
    (O·N)²-bounded ≈ 6e14 at sf0.1, BIGINT-safe through ~sf1). The
    per-cell contributions are the drill-down a drift monitor reads;
    their sum is the test statistic with (R−1)(C−1) dof.

    Scale: one doc-grain map + three bounded aggs; the dense spine is
    sources × bands (tens of rows) built from two broadcastable
    marginal frames — never a corpus-sized join."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "source",
        F.expr("length(bin(size(split(text, ' '))))").alias("band"),
    )
    # the cell frame feeds FOUR branches (marginals, total, the dense
    # left join) — checkpoint the BOUNDED (sources x bands) frame or the
    # branched lineage re-runs the corpus scan per branch
    o = (
        d.groupBy("source", "band")
        .agg(F.count("*").alias("n_obs"))
        .localCheckpoint(eager=True)
    )
    rs = o.groupBy("source").agg(F.sum("n_obs").alias("row_total"))
    cs = o.groupBy("band").agg(F.sum("n_obs").alias("col_total"))
    tot = o.agg(F.sum("n_obs").alias("n_total"))
    return (
        rs.crossJoin(F.broadcast(cs))
        .join(o, ["source", "band"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("band").cast("int").alias("band"),
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.col("row_total").cast("long").alias("row_total"),
            F.col("col_total").cast("long").alias("col_total"),
            F.expr(
                qrem_round6_spark("row_total * col_total", "n_total")
            ).alias("exp_r6"),
            F.expr(
                qrem_round6_spark(
                    "(coalesce(n_obs, 0) * n_total"
                    " - row_total * col_total) * "
                    "(coalesce(n_obs, 0) * n_total"
                    " - row_total * col_total)",
                    "row_total * col_total * n_total",
                )
            ).alias("chi2_cell_r6"),
        )
        .orderBy("source", "band")
    )


ORACLE_CHI_SQUARE = f"""
WITH d AS (
  SELECT source, LENGTH(bin(len(string_split(text, ' ')))) AS band
  FROM documents),
o AS (SELECT source, band, COUNT(*) AS n_obs FROM d GROUP BY 1, 2),
rs AS (SELECT source, CAST(SUM(n_obs) AS BIGINT) AS row_total
       FROM o GROUP BY 1),
cs AS (SELECT band, CAST(SUM(n_obs) AS BIGINT) AS col_total
       FROM o GROUP BY 1),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM o)
SELECT rs.source, CAST(cs.band AS INT) AS band,
       CAST(COALESCE(n_obs, 0) AS BIGINT) AS n_obs,
       row_total, col_total,
       {qrem_round6_duck("row_total * col_total", "n_total")} AS exp_r6,
       {qrem_round6_duck(
           "(COALESCE(n_obs, 0) * n_total - row_total * col_total)"
           " * (COALESCE(n_obs, 0) * n_total - row_total * col_total)",
           "row_total * col_total * n_total")} AS chi2_cell_r6
FROM rs CROSS JOIN cs
LEFT JOIN o ON o.source = rs.source AND o.band = cs.band
CROSS JOIN tot
ORDER BY rs.source, cs.band
"""


# --------------------------------------------------------------------------
# Contamination attribution by source (span-decon rollup at source grain)
# --------------------------------------------------------------------------

def text_contamination_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval-span contamination ATTRIBUTION: the same stride-1
    {SPAN_W}-token fingerprint match as ``doc_span_decontamination``,
    rolled up per TRAINING SOURCE instead of per doc — which corpus
    slices are leaking eval content, the number procurement actually
    acts on (drop/renegotiate a source) versus the per-doc scrub list.
    Shares :func:`span_window_fps` and the eval-index construction, so
    the two grains are guaranteed consistent: summing n_eval_hits here
    over sources equals summing it over docs there.

    Scale: identical dataflow to the doc-grain op (broadcast eval
    index, map-side window stream) with a source-bounded final agg —
    the rollup exchange is sources-sized."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % SPAN_EVAL_MOD != 0).repartition(
        max(spark.sparkContext.defaultParallelism, 16), "doc_id"
    )
    evalset = docs.filter(F.col("doc_id") % SPAN_EVAL_MOD == 0)
    idx = (
        span_window_fps(evalset)
        .filter(F.col("fp").isNotNull())
        .select("fp")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    src = train.select("doc_id", "source")
    joined = (
        span_window_fps(train)
        .join(F.broadcast(idx), "fp", "left")
        .join(src, "doc_id")
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_train_docs"),
            F.count("fp").cast("long").alias("n_windows"),
            F.sum(
                F.when(F.col("fp").isNotNull() & (F.col("hit") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_eval_hits"),
            F.count_distinct(
                F.when(F.col("hit") == 1, F.col("doc_id"))
            )
            .cast("long")
            .alias("n_contaminated_docs"),
        )
        .select(
            "source",
            "n_train_docs",
            "n_windows",
            "n_eval_hits",
            "n_contaminated_docs",
            F.expr(
                rat_round6_spark("n_eval_hits", "greatest(n_windows, 1)")
            ).alias("hit_share_r6"),
        )
        .orderBy("source")
    )


ORACLE_CONTAMINATION_BY_SOURCE = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
  WHERE doc_id % {SPAN_EVAL_MOD} != 0),
ev AS (
  SELECT DISTINCT
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp
  FROM (SELECT string_split(text, ' ') AS ws FROM documents
        WHERE doc_id % {SPAN_EVAL_MOD} = 0) e,
       LATERAL unnest(generate_series(
         1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
w AS (
  SELECT doc_id, source,
         md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' ')) AS fp,
         CASE WHEN md5(array_to_string(ws[k : k + {SPAN_W - 1}], ' '))
                   IN (SELECT fp FROM ev) THEN 1 ELSE 0 END AS hit
  FROM d, LATERAL unnest(generate_series(
           1, greatest(len(ws) - {SPAN_W - 1}, 0))) AS u(k)),
ps AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(hit) AS BIGINT) AS n_eval_hits,
         CAST(COUNT(DISTINCT CASE WHEN hit = 1 THEN doc_id END)
              AS BIGINT) AS n_contaminated_docs
  FROM w GROUP BY 1),
td AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_docs
  FROM d GROUP BY 1)
SELECT td.source, n_train_docs,
       COALESCE(n_windows, 0) AS n_windows,
       COALESCE(n_eval_hits, 0) AS n_eval_hits,
       COALESCE(n_contaminated_docs, 0) AS n_contaminated_docs,
       {rat_round6_duck(
           "COALESCE(n_eval_hits, 0)",
           "greatest(COALESCE(n_windows, 1), 1)")} AS hit_share_r6
FROM td LEFT JOIN ps USING (source)
ORDER BY td.source
"""


# --------------------------------------------------------------------------
# Vocabulary rank drift between corpus halves (footrule distance)
# --------------------------------------------------------------------------

DRIFT_TOP_K = 30  # per-half head terms entering the rank comparison


def text_vocab_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-vocabulary RANK DRIFT between the two doc_id-parity halves
    of the corpus — the Spearman-footrule companion to text_source_kl
    (KL sees mass moving; the footrule sees the LEADERBOARD reordering
    even when masses barely change). The comparison set is the union of
    each half's top-{DRIFT_TOP_K} terms by (count desc, term); both
    halves are re-ranked over that bounded set (absent terms count 0)
    and each term reports its two ranks and |shift|, the per-term drift
    an ops dashboard sorts by.

    Scale: two vocab-grain count aggs, a ≤2·{DRIFT_TOP_K}-row union
    set built by two TakeOrdered cuts, re-ranks over that bounded frame
    only — the vocabulary itself never enters a window."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    counts = (
        toks.groupBy("half", "w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # vocab-bounded; feeds cuts + ranks
    )
    top_a = (
        counts.filter(F.col("half") == 0)
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(DRIFT_TOP_K)
        .select("w")
    )
    top_b = (
        counts.filter(F.col("half") == 1)
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(DRIFT_TOP_K)
        .select("w")
    )
    union = top_a.unionByName(top_b).distinct().localCheckpoint(eager=True)
    ca = counts.filter(F.col("half") == 0).select(
        "w", F.col("c").alias("cnt_a")
    )
    cb = counts.filter(F.col("half") == 1).select(
        "w", F.col("c").alias("cnt_b")
    )
    j = (
        union.join(ca, "w", "left")
        .join(cb, "w", "left")
        .select(
            "w",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    wa = W.orderBy(F.desc("cnt_a"), F.asc("w"))
    wb = W.orderBy(F.desc("cnt_b"), F.asc("w"))
    return (
        j.withColumn("rank_a", F.row_number().over(wa))
        .withColumn("rank_b", F.row_number().over(wb))
        .select(
            F.col("w").alias("term"),
            "cnt_a",
            "cnt_b",
            F.col("rank_a").cast("int").alias("rank_a"),
            F.col("rank_b").cast("int").alias("rank_b"),
            F.abs(F.col("rank_a") - F.col("rank_b"))
            .cast("int")
            .alias("abs_shift"),
        )
        .orderBy("term")
    )


ORACLE_VOCAB_RANK_DRIFT = f"""
WITH toks AS (
  SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS w
  FROM documents),
counts AS (SELECT half, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
ta AS (SELECT w FROM counts WHERE half = 0
       ORDER BY c DESC, w LIMIT {DRIFT_TOP_K}),
tb AS (SELECT w FROM counts WHERE half = 1
       ORDER BY c DESC, w LIMIT {DRIFT_TOP_K}),
un AS (SELECT w FROM ta UNION SELECT w FROM tb),
j AS (
  SELECT un.w,
         CAST(COALESCE(a.c, 0) AS BIGINT) AS cnt_a,
         CAST(COALESCE(b.c, 0) AS BIGINT) AS cnt_b
  FROM un
  LEFT JOIN (SELECT w, c FROM counts WHERE half = 0) a USING (w)
  LEFT JOIN (SELECT w, c FROM counts WHERE half = 1) b USING (w))
SELECT w AS term, cnt_a, cnt_b,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt_a DESC, w) AS INT) AS rank_a,
       CAST(ROW_NUMBER() OVER (ORDER BY cnt_b DESC, w) AS INT) AS rank_b,
       CAST(abs(ROW_NUMBER() OVER (ORDER BY cnt_a DESC, w)
                - ROW_NUMBER() OVER (ORDER BY cnt_b DESC, w)) AS INT)
         AS abs_shift
FROM j ORDER BY term
"""


# --------------------------------------------------------------------------
# Term burstiness (Fano factor of per-doc counts) for the head vocabulary
# --------------------------------------------------------------------------

BURST_TOP_K = 20


def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of the top-{BURST_TOP_K} corpus terms:
    the population variance-to-mean ratio of the term's PER-DOCUMENT
    count (absent docs count 0) — the classic content-vs-function-word
    separator (function words are Poisson-ish, Fano ≈ 1; topical terms
    clump, Fano >> 1) and the burstiness prior behind BM25-style
    saturation. Restated over integers: with N docs, tf = Σx and
    sq = Σx², Fano = (N·sq − tf²) / (N·tf) — one exact half-up, no
    float moments.

    Scale: one (term × doc) count agg + a TakeOrdered head cut; the
    rollup is head-bounded."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # scalar: dimension of the doc universe
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count("*").alias("x"))
    )
    stats = per_doc.groupBy("w").agg(
        F.sum("x").alias("tf"),
        F.sum(F.expr("x * x")).alias("sq"),
        F.count("*").alias("df"),
    )
    return (
        stats.orderBy(F.desc("tf"), F.asc("w"))
        .limit(BURST_TOP_K)
        .select(
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.expr(
                qrem_round6_spark(
                    f"{n_docs} * sq - tf * tf", f"{n_docs} * tf"
                )
            ).alias("fano_r6"),
        )
        .orderBy("term")
    )


def _oracle_term_burstiness() -> str:
    return f"""
WITH nd AS (SELECT COUNT(*) AS n FROM documents),
pd AS (
  SELECT w, doc_id, COUNT(*) AS x FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2),
s AS (
  SELECT w, CAST(SUM(x) AS BIGINT) AS tf,
         CAST(SUM(x * x) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM pd GROUP BY 1),
top AS (SELECT * FROM s ORDER BY tf DESC, w LIMIT {BURST_TOP_K})
SELECT w AS term, tf, df, CAST(n AS BIGINT) AS n_docs,
       {qrem_round6_duck("n * sq - tf * tf", "n * tf")} AS fano_r6
FROM top, nd ORDER BY term
"""


ORACLE_TERM_BURSTINESS = _oracle_term_burstiness()


# --------------------------------------------------------------------------
# Bloom capacity sweep (fill + measured FPR at three widths)
# --------------------------------------------------------------------------

CAP_BLOOM_MS = (2048, 8192, 32768)  # swept filter widths (bits)
CAP_BLOOM_K = 3


def _cap_pos_spark(i: int, m: int, col: str = "s") -> str:
    h1 = sql_md5_long_spark(col, 1, 7)
    h2 = f"(1 + {sql_md5_long_spark(col, 9, 7)})"
    return f"(({h1} + {i} * {h2}) % {m})"


def _cap_pos_duck(i: int, m: int, col: str = "s") -> str:
    h1 = sql_md5_long_duck(col, 1, 7)
    h2 = f"(1 + {sql_md5_long_duck(col, 9, 7)})"
    return f"(({h1} + {i} * {h2}) % {m})"


def sketch_bloom_capacity_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bloom-filter CAPACITY CURVE: bit-fill and MEASURED
    false-positive rate at {CAP_BLOOM_MS} bits for the same member set
    and the same disjoint probe namespace as
    ``sketch_bloom_fpr_audit`` — the sizing table an operator reads
    before provisioning a decontamination prefilter (the single-width
    audit says what the current filter does; this says what doubling
    or halving it WOULD do, measured rather than predicted by the
    (1 − e^{{-kn/m}})^k formula). Same md5 double-hashing (k =
    {CAP_BLOOM_K}), so the whole sweep is engine-portable and carries
    a full value hash.

    Scale: membership is expressed as a (width × position) join —
    the member-position table is Σm-bounded (≤ 43k rows regardless of
    data) and broadcast; probes stream map-side through one join +
    per-probe distinct-position accounting."""
    orders = catalog.load(spark, sf_dir, "orders")
    customer = catalog.load(spark, sf_dir, "customer")
    members = orders.select(
        F.concat(F.lit("ord:"), F.col("o_custkey")).alias("s")
    ).distinct().localCheckpoint(eager=True)  # feeds all widths + count
    probes = customer.select(
        F.concat(F.lit("cust:"), F.col("c_custkey")).alias("s")
    ).distinct()

    def lanes(pos_fn, m):
        return F.array(
            *[F.expr(pos_fn(i, m)) for i in range(CAP_BLOOM_K)]
        )

    mpos_frames = []
    ppos_frames = []
    for m in CAP_BLOOM_MS:
        mpos_frames.append(
            members.select(
                F.lit(m).alias("m_bits"),
                F.explode(lanes(_cap_pos_spark, m)).alias("pos"),
            ).distinct()
        )
        ppos_frames.append(
            probes.select(
                F.lit(m).alias("m_bits"),
                "s",
                F.explode(
                    F.array_distinct(lanes(_cap_pos_spark, m))
                ).alias("pos"),
            )
        )
    mpos = mpos_frames[0]
    for fr in mpos_frames[1:]:
        mpos = mpos.unionByName(fr)
    mpos = mpos.localCheckpoint(eager=True)  # <= sum(m) rows; 2 consumers
    ppos = ppos_frames[0]
    for fr in ppos_frames[1:]:
        ppos = ppos.unionByName(fr)
    fills = mpos.groupBy("m_bits").agg(
        F.count("*").cast("long").alias("n_bits_set")
    )
    hit = (
        ppos.join(
            F.broadcast(mpos.withColumn("in_set", F.lit(1))),
            ["m_bits", "pos"],
            "left",
        )
        .groupBy("m_bits", "s")
        .agg(
            F.count("*").alias("k_pos"),
            F.sum(F.coalesce("in_set", F.lit(0))).alias("k_hit"),
        )
        .groupBy("m_bits")
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(
                F.when(F.col("k_hit") == F.col("k_pos"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
        )
    )
    nm = members.agg(F.count("*").cast("long").alias("n_members"))
    return (
        fills.join(hit, "m_bits")
        .crossJoin(F.broadcast(nm))
        .select(
            F.col("m_bits").cast("long").alias("m_bits"),
            "n_members",
            "n_bits_set",
            F.expr(rat_round6_spark("n_bits_set", "m_bits")).alias(
                "fill_r6"
            ),
            "n_probes",
            "n_false_pos",
            F.expr(rat_round6_spark("n_false_pos", "n_probes")).alias(
                "fpr_r6"
            ),
        )
        .orderBy("m_bits")
    )


def _oracle_bloom_capacity() -> str:
    m_parts = []
    p_parts = []
    for m in CAP_BLOOM_MS:
        lanes = ", ".join(
            _cap_pos_duck(i, m) for i in range(CAP_BLOOM_K)
        )
        m_parts.append(
            f"SELECT DISTINCT {m} AS m_bits, unnest([{lanes}]) AS pos "
            f"FROM members"
        )
        p_parts.append(
            f"SELECT {m} AS m_bits, s, "
            f"unnest(list_distinct([{lanes}])) AS pos FROM probes"
        )
    return f"""
WITH members AS (
  SELECT DISTINCT 'ord:' || o_custkey AS s FROM orders),
probes AS (
  SELECT DISTINCT 'cust:' || c_custkey AS s FROM customer),
mpos AS MATERIALIZED ({" UNION ALL ".join(m_parts)}),
ppos AS ({" UNION ALL ".join(p_parts)}),
fills AS (
  SELECT m_bits, CAST(COUNT(*) AS BIGINT) AS n_bits_set
  FROM mpos GROUP BY 1),
per_probe AS (
  SELECT p.m_bits, p.s, COUNT(*) AS k_pos,
         SUM(CASE WHEN mp.pos IS NOT NULL THEN 1 ELSE 0 END) AS k_hit
  FROM ppos p LEFT JOIN mpos mp
    ON p.m_bits = mp.m_bits AND p.pos = mp.pos
  GROUP BY 1, 2),
hit AS (
  SELECT m_bits, CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(CASE WHEN k_hit = k_pos THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
  FROM per_probe GROUP BY 1),
nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM members)
SELECT CAST(m_bits AS BIGINT) AS m_bits, n_members, n_bits_set,
       {rat_round6_duck("n_bits_set", "m_bits")} AS fill_r6,
       n_probes, n_false_pos,
       {rat_round6_duck("n_false_pos", "n_probes")} AS fpr_r6
FROM fills JOIN hit USING (m_bits) CROSS JOIN nm
ORDER BY m_bits
"""


ORACLE_BLOOM_CAPACITY = _oracle_bloom_capacity()


SPECS = [
    QuerySpec("sketch_bloom_capacity_sweep", sketch_bloom_capacity_sweep,
              ORACLE_BLOOM_CAPACITY, ("sketch", "audit"),
              doc="bloom fill + measured FPR at three widths (the "
                  "sizing curve; md5 double-hashing, width-position "
                  "join membership)"),
    QuerySpec("text_vocab_rank_drift", text_vocab_rank_drift,
              ORACLE_VOCAB_RANK_DRIFT, ("text", "drift", "stats"),
              doc="head-vocab Spearman-footrule rank drift between "
                  "doc-parity halves (bounded union-of-top-K re-rank)"),
    QuerySpec("text_term_burstiness", text_term_burstiness,
              ORACLE_TERM_BURSTINESS, ("text", "stats"),
              doc="Fano factor of per-doc counts for the head terms "
                  "(integer variance-to-mean; content-word separator)"),
    QuerySpec("text_quality", text_quality, ORACLE_TEXT_QUALITY,
              ("text",), bench=True),
    QuerySpec("text_vocab_coverage_curve", text_vocab_coverage_curve,
              ORACLE_VOCAB_COVERAGE, ("text", "tokenizer", "curation"),
              doc="top-k vocabulary occurrence coverage (OOV-rate "
                  "planning curve; TakeOrdered cut + 32-row running "
                  "sum)"),
    QuerySpec("text_char_class_profile", text_char_class_profile,
              ORACLE_CHAR_CLASS_PROFILE, ("text", "quality", "stats"),
              doc="per-source character-class accounting (vowel/"
                  "consonant/space counts, exact ratio shares)"),
    QuerySpec("text_consonant_runs", text_consonant_runs,
              ORACLE_CONSONANT_RUNS, ("text", "quality"),
              doc="consonant-run profile per doc (OCR/gibberish "
                  "heuristic; vowel-class regex split, HOF counts)"),
    QuerySpec("text_bpe_merge_sequence", text_bpe_merge_sequence,
              ORACLE_BPE_MERGE_SEQUENCE, ("text", "tokenizer", "iterative"),
              doc="first 4 BPE merges, vocabulary-contracted, greedy "
                  "left-to-right merge application via delimited-symbol "
                  "replace (identical semantics on both engines)"),
    QuerySpec("stats_cohens_kappa_langid", stats_cohens_kappa_langid,
              ORACLE_COHENS_KAPPA, ("text", "stats", "eval"),
              doc="Cohen's kappa (chance-corrected agreement) between "
                  "lang label and the stopword-vote lang-ID, signed "
                  "exact-rational"),
    QuerySpec("sketch_bloom_fpr_audit", sketch_bloom_fpr_audit,
              ORACLE_BLOOM_FPR, ("sketch", "audit"),
              doc="measured Bloom FPR + bit-fill on a disjoint probe "
                  "namespace (md5 double hashing, engine-portable; "
                  "bounded word-table collect)"),
    QuerySpec("dedup_longest_dup_span", dedup_longest_dup_span,
              ORACLE_LONGEST_DUP_SPAN, ("text", "dedup", "curation"),
              doc="ExactSubstr span-length readout: maximal duplicated "
                  "regions per doc via interval-union islands over the "
                  "stride-1 fingerprint stream"),
    QuerySpec("text_contamination_by_source", text_contamination_by_source,
              ORACLE_CONTAMINATION_BY_SOURCE,
              ("text", "curation", "decontamination"),
              doc="eval-span contamination attribution per training "
                  "source (broadcast fingerprint index, source-grain "
                  "rollup consistent with doc_span_decontamination)"),
    QuerySpec("stats_chi_square_source_length",
              stats_chi_square_source_length,
              ORACLE_CHI_SQUARE, ("text", "stats", "drift"),
              doc="Pearson chi-square independence cells (source x "
                  "token-length band), integer-exact contributions on "
                  "a dense marginal spine"),
    QuerySpec("text_simpson_concentration", text_simpson_concentration,
              ORACLE_SIMPSON, ("text", "stats", "quality"),
              doc="Simpson collision index per source (integer entropy "
                  "proxy): lexical concentration + top-word share"),
    QuerySpec("text_rarity_outliers", text_rarity_outliers,
              ORACLE_RARITY_OUTLIERS, ("text", "quality", "stats"),
              doc="per-doc rarity profile: rare-df token share + mean "
                  "df-bit band (integer IDF proxy) for outlier triage"),
    QuerySpec("text_gopher_gates", text_gopher_gates,
              ORACLE_GOPHER_GATES, ("text", "quality", "curation"),
              doc="Gopher quality rule bundle per doc (word count, mean "
                  "word length, stopword presence, repetition cap) — "
                  "integer-exact pass/fail flags + conjunction"),
    QuerySpec("text_tokenizer_fertility", text_tokenizer_fertility,
              ORACLE_TOKENIZER_FERTILITY, ("text", "tokenizer", "audit"),
              doc="tokenizer fertility (subwords/word) + bytes-per-token "
                  "budget audit by source, exact rational readouts"),
    QuerySpec("text_dsir_importance", text_dsir_importance,
              ORACLE_DSIR_IMPORTANCE, ("text", "curation", "sampling"),
              doc="DSIR hashed-ngram importance weights (uni+bigram md5 "
                  "buckets, target = lang slice): exact integer mass "
                  "ratio per doc for importance resampling"),
    QuerySpec("text_dup_region_removal", text_dup_region_removal,
              ORACLE_DUP_REGION_REMOVAL, ("text", "dedup", "curation"),
              doc="ExactSubstr dup-region REMOVAL: the cleaned corpus "
                  "with every maximal duplicated run cut out (shares "
                  "the region frame with dedup_longest_dup_span; "
                  "indexed HOF filter, map-side cut)"),
    QuerySpec("text_boilerplate_heads", text_boilerplate_heads,
              ORACLE_BOILERPLATE_HEADS, ("text", "dedup", "quality"),
              doc="template/boilerplate opening-block detection per "
                  "source (shared-head hash agg, C4-style cleanup "
                  "signal)"),
    QuerySpec("doc_span_decontamination", doc_span_decontamination,
              ORACLE_SPAN_DECON, ("text", "dedup", "streaming-twin"),
              doc="span-level decontamination of training docs vs a "
                  "static eval fingerprint index (broadcast stream-"
                  "static join shape; batch twin of streaming/jobs."
                  "run_span_decon_stream)"),
    QuerySpec("text_source_vocab_jaccard", text_source_vocab_jaccard,
              ORACLE_SOURCE_VOCAB_JACCARD, ("text", "stats", "mix"),
              doc="pairwise source vocabulary Jaccard (word-keyed "
                  "inverted-index join, exact set sizes + rational "
                  "overlap)"),
    QuerySpec("text_boundary_overlap", text_boundary_overlap,
              ORACLE_BOUNDARY_OVERLAP, ("text", "dedup", "audit"),
              doc="suffix-prefix boundary overlap pairs (concatenation-"
                  "artifact audit; md5 edge fingerprints, one hash "
                  "equi-join)"),
    QuerySpec("text_rake_keywords", text_rake_keywords, ORACLE_RAKE,
              ("text", "keywords"),
              doc="RAKE keyword extraction: corpus-calibrated stopwords, "
                  "phrase islands via running stopword count, exact "
                  "degree/frequency rational scores, top-50"),
    QuerySpec("text_lang_id", text_lang_id, ORACLE_TEXT_LANG, ("text",)),
    QuerySpec("text_token_count", text_token_count, ORACLE_TEXT_TOKENS,
              ("text",)),
    QuerySpec("text_fingerprint", text_fingerprint, ORACLE_TEXT_FP, ("text",)),
    QuerySpec("text_winnow_fingerprint", text_winnow_fingerprint,
              ORACLE_WINNOW, ("text", "fingerprint"),
              doc="winnowing (MOSS) positional fingerprints: rightmost-min "
                  "k-gram hash per sliding window, map-only + explode"),
    QuerySpec("text_mattr_diversity", text_mattr_diversity, ORACLE_MATTR,
              ("text", "quality", "diversity"),
              doc="per-doc MATTR windowed lexical diversity via the "
                  "interval-contribution closed form (one lag window, "
                  "no per-window fan-out; exact rational readout)"),
    QuerySpec("pipeline_clean_corpus", pipeline_clean_corpus, ORACLE_PIPELINE,
              ("text", "pipeline", "dedup"),
              doc="quality filter → exact dedup → per-lang stats, one plan"),
    QuerySpec("dataset_split_hash", dataset_split_hash, ORACLE_SPLIT,
              ("text", "pipeline", "split"),
              doc="deterministic stratified train/val/test hash split"),
    QuerySpec("dedup_keep_best", dedup_keep_best, ORACLE_KEEP_BEST,
              ("dedup", "pipeline"),
              doc="exact dedup keeping the highest-quality copy"),
    QuerySpec("corpus_weighted_sample", corpus_weighted_sample,
              ORACLE_WEIGHTED_SAMPLE, ("text", "pipeline"),
              doc="deterministic quality-weighted sampling (integer "
                  "cross-multiplied hash threshold)"),
    QuerySpec("decontaminate_ngram", decontaminate_ngram, ORACLE_DECON,
              ("text", "pipeline", "dedup"),
              doc="train/eval n-gram-overlap decontamination, broadcast "
                  "eval side"),
    QuerySpec("decontaminate_bloom", decontaminate_bloom, ORACLE_DECON_BLOOM,
              ("text", "pipeline", "dedup", "bloom"),
              doc="bloom-prefiltered decontamination (fixed 16 KB eval "
                  "bitset + exact verify == exact result, by theorem)"),
    QuerySpec("text_redact_denylist", text_redact_denylist, ORACLE_REDACT,
              ("text", "pipeline", "scrub"),
              doc="deny-list token redaction (boilerplate/blocklist "
                  "scrub), HOF codegen, md5-verified text"),
    QuerySpec("text_chunk_overlap", text_chunk_overlap, ORACLE_CHUNK,
              ("text", "pipeline", "rag"),
              doc="overlapping token chunking (RAG/context segmentation), "
                  "map-only, md5-pinned chunk content"),
    QuerySpec("pipeline_training_examples", pipeline_training_examples,
              ORACLE_PIPE_EXAMPLES, ("text", "pipeline", "dedup", "rag"),
              doc="end-to-end training funnel: quality -> dedup -> "
                  "decontaminate -> chunk -> chunk-dedup, per-source "
                  "attrition report in one plan"),
    QuerySpec("dedup_chunks_exact", dedup_chunks_exact, ORACLE_CHUNK_DEDUP,
              ("text", "dedup", "pipeline", "rag"),
              doc="training-example (chunk-level) exact dedup: content-"
                  "hash grouping + deterministic keeper"),
    QuerySpec("dedup_substring_spans", dedup_substring_spans,
              ORACLE_SUBSTRING_SPANS, ("text", "dedup", "pipeline"),
              doc="substring-level dedup audit (ExactSubstr family): "
                  "stride-1 12-token window fingerprints, inverted-index "
                  "cross-doc duplication share per doc"),
    QuerySpec("text_source_kl", text_source_kl, ORACLE_SOURCE_KL,
              ("text", "stats", "mix"),
              doc="per-source KL divergence from the corpus unigram mix "
                  "over the top-V vocabulary"),
    QuerySpec("sample_weighted_exact_k", sample_weighted_exact_k,
              ORACLE_AES, ("text", "pipeline", "sample"),
              doc="exactly-K weighted sample per source without "
                  "replacement (Efraimidis-Spirakis A-ES keys)"),
    QuerySpec("text_tfidf", text_tfidf, ORACLE_TFIDF, ("text", "pipeline"),
              doc="per-document top-k terms by TF-IDF"),
    QuerySpec("corpus_mix_sample", corpus_mix_sample, ORACLE_MIX,
              ("text", "pipeline", "split"),
              doc="deterministic hash-based corpus-mixture downsampling"),
    QuerySpec("sample_per_source", sample_per_source,
              ORACLE_SAMPLE_PER_SOURCE, ("text", "pipeline", "split"),
              doc="deterministic capped per-domain sample (hash rank)"),
    QuerySpec("pack_context_bins", pack_context_bins, ORACLE_PACK_BINS,
              ("text", "pipeline"),
              doc="sequential context-window packing report"),
    QuerySpec("text_repetition", text_repetition, ORACLE_REPETITION,
              ("text", "pipeline"),
              doc="within-doc trigram repetition score (boilerplate signal)"),
    QuerySpec("text_vocab_top", text_vocab_top, ORACLE_VOCAB,
              ("text", "pipeline"),
              doc="global top-K vocabulary with corpus share"),
    QuerySpec("text_unigram_logprob", text_unigram_logprob,
              ORACLE_UNIGRAM_LOGPROB, ("text", "pipeline", "quality"),
              doc="per-doc mean unigram log-prob (perplexity-style "
                  "quality score under the corpus's own LM)"),
    QuerySpec("text_zipf_slope", text_zipf_slope, ORACLE_ZIPF,
              ("text", "pipeline", "quality"),
              doc="per-source Zipf slope (log-log head fit) — domain "
                  "health metric"),
    QuerySpec("text_ngram_novelty", text_ngram_novelty, ORACLE_NOVELTY,
              ("text", "pipeline", "quality"),
              doc="share of corpus-unique trigrams per doc "
                  "(self-information / long-tail signal)"),
    QuerySpec("text_bigram_coherence", text_bigram_coherence,
              ORACLE_BIGRAM, ("text", "pipeline", "quality"),
              doc="per-doc mean bigram conditional log-prob "
                  "(word-salad detection)"),
    QuerySpec("text_lang_confusion", text_lang_confusion,
              ORACLE_LANG_CONFUSION, ("text", "pipeline", "eval"),
              doc="language-ID confusion matrix (true × predicted, row "
                  "shares)"),
    QuerySpec("corpus_budget_pack", corpus_budget_pack,
              ORACLE_BUDGET_PACK, ("text", "pipeline", "curation"),
              doc="token-budget curation: quality-greedy budget fill "
                  "via the bucket-selection rewrite (only budget-sized "
                  "buckets ever window) == brute global-sort oracle"),
    QuerySpec("text_dedup_prefix", text_dedup_prefix,
              ORACLE_DEDUP_PREFIX, ("text", "dedup", "boilerplate"),
              doc="shared-prefix boilerplate detector (map-only prefix "
                  "md5 + one keyed count — the cheapest near-dup "
                  "screen)"),
    QuerySpec("text_length_quality_grid", text_length_quality_grid,
              ORACLE_LENGTH_QUALITY_GRID, ("text", "stats", "curation"),
              doc="length-quintile x quality-quintile contingency grid "
                  "(is the quality score just length? — dimension-"
                  "bounded NTILEs)"),
    QuerySpec("text_hapax_bigrams", text_hapax_bigrams,
              ORACLE_HAPAX_BIGRAMS, ("text", "stats", "quality"),
              doc="per-source bigram hapax-legomena + type-token "
                  "lexical-diversity profile (template-spam / OCR-noise "
                  "drift signal)"),
    QuerySpec("sample_stratified_quota", sample_stratified_quota,
              ORACLE_STRATIFIED_QUOTA, ("text", "sampling", "curation"),
              doc="largest-remainder (Hamilton) token-proportional quota "
                  "apportionment across sources — integer-exact dataset "
                  "mixing, sum(alloc) == budget"),
    QuerySpec("corpus_funnel_stats", corpus_funnel_stats,
              ORACLE_CORPUS_FUNNEL, ("text", "pipeline", "streaming-twin"),
              doc="per-source ingest funnel raw -> gated -> unique with "
                  "dup ratio; batch twin of streaming/jobs."
                  "run_corpus_funnel_stream (shared gate predicate)"),
    QuerySpec("text_bpe_first_merge", text_bpe_first_merge,
              ORACLE_BPE_FIRST_MERGE, ("text", "tokenizer"),
              doc="first BPE merge iteration: top adjacent char-pair "
                  "frequencies via the vocabulary-contraction trick "
                  "(explode pairs per word TYPE, weight by count)"),
    QuerySpec("text_heaps_vocab_growth", text_heaps_vocab_growth,
              ORACLE_HEAPS_VOCAB, ("text", "quality", "curation"),
              doc="Heaps'-law bigram vocabulary-growth curve per source "
                  "sampled at ingest-sequence quartiles (template-replay "
                  "saturation signal)"),
    QuerySpec("corpus_temperature_mix", corpus_temperature_mix,
              ORACLE_TEMPERATURE_MIX, ("text", "sampling", "curation"),
              doc="alpha=0.5 temperature-flattened source mixing: sqrt "
                  "weights (IEEE-exact) on the integer grid, dual "
                  "Hamilton allocations + per-source seat delta"),
]
