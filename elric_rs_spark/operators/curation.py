"""End-to-end corpus curation: the composed training-data pipeline.

Every stage exists as its own graded operator (text.py quality metrics,
dedup.py exact + MinHash near-dup, sampling.py deterministic sampling);
this module composes them the way a real 100 TB curation run does —
cheap filters first, each stage shrinking the data the next one touches:

    quality gate  ->  exact dedup  ->  [near-dup clusters]  ->  sample

`q_curation_pipeline` is the fully SQL-expressible composition (quality +
exact dedup + hash sample), one declarative plan the DuckDB oracle
re-derives end to end — proving stage COMPOSITION, not just stages.
`q_curation_full` adds MinHash near-dup cluster removal (iterative, so
rows-only) — survivors are cluster representatives plus un-clustered docs.

Scale notes: the whole oracle-checked pipeline is ONE job with two
shuffles (the dedup groupBy and the final report groupBy). The quality
gate and sample predicate are pure row-local expressions that Catalyst
evaluates in the scan stage, so the expensive dedup shuffle only ever
sees pre-filtered survivors. Stage order is the cost model: at 100 TB
the quality gate drops ~half the corpus before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from elric_rs_spark.operators.dedup import labels_for, q_dedup_minhash
from elric_rs_spark.operators.sampling import HASH_EXPR
from elric_rs_spark.registry import query
from elric_rs_spark.tables import load_table

# quality gate: word-count band + mean-word-length band (Gopher §A1.1
# subset, matching text.py's q_quality_gopher thresholds)
_QUALITY_SQL = (
    "len(string_split(trim(text), ' ')) BETWEEN 20 AND 100000"
    " AND n_chars / len(string_split(trim(text), ' ')) BETWEEN 3 AND 10"
)


def _quality_keep() -> F.Column:
    toks = F.split(F.trim(F.col("text")), " ")
    n = F.size(toks)
    mean_wl = F.col("n_chars").cast("double") / n
    return n.between(20, 100_000) & mean_wl.between(3, 10)


@query(
    "q_curation_pipeline",
    oracle=f"""
WITH quality AS (
  SELECT * FROM documents
  WHERE {_QUALITY_SQL}
),
deduped AS (
  SELECT min(doc_id) AS doc_id,
         min_by(lang, doc_id) AS lang,
         min_by(source, doc_id) AS source,
         min_by(n_chars, doc_id) AS n_chars
  FROM quality
  GROUP BY md5(text)
),
sampled AS (
  SELECT * FROM deduped
  WHERE {HASH_EXPR} < 500
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM sampled
GROUP BY lang, source
""",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate -> exact dedup (keep min doc_id) -> 50% deterministic
    sample -> per-(lang, source) report, as ONE declarative plan.

    The dedup keeps the minimum-doc_id row per content hash with its
    attributes carried via min_by — deterministic survivor selection, so
    the sample predicate (hashed doc_id) sees identical survivors on any
    engine. The report aggregates only survivors.
    """
    d = load_table(spark, sf_dir, "documents").filter(_quality_keep())
    deduped = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
    )
    sampled = deduped.filter(F.expr(HASH_EXPR) < 500)
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query("q_curation_full")  # rows-only: near-dup clustering is iterative
def q_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pipeline including near-dup removal: after the
    quality gate and exact dedup, MinHash near-dup clusters collapse to
    their representative (cluster-minimum doc_id) — a doc survives iff it
    is un-clustered or IS its cluster's rep. Output: per-(lang, source)
    kept counts plus how many docs each stage removed, the numbers a
    curation run reports.

    The cluster label table holds one row per doc that had a near-dup
    candidate — corpus-PROPORTIONAL at a realistic web dup rate (30%+),
    so the join is left un-hinted: AQE broadcasts it while small and
    falls back to a shuffle join at scale (the round-10 sweep removed
    the forced F.broadcast here; VERDICT r9 #3's per-doc-broadcast
    audit — same class as the embed-LSH norm-broadcast cliff)."""
    d = load_table(spark, sf_dir, "documents").filter(_quality_keep())
    deduped = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
    )
    pairs = q_dedup_minhash(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels = labels_for(spark, sf_dir, "kernel", pairs)
    # Survivor selection happens AMONG the upstream survivors, not the
    # raw corpus: the cluster label keys the group, and the minimum doc
    # still present after the quality gate + exact dedup is kept. Using
    # the raw-corpus representative would erase a whole cluster whenever
    # its rep was already quality-filtered out — every cluster with any
    # surviving member must keep exactly one document.
    keyed = deduped.join(labels, "doc_id", "left").withColumn(
        "cluster", F.coalesce("rep", "doc_id")
    )
    survivors = (
        keyed.groupBy("cluster")
        .agg(
            F.min(
                F.struct(
                    F.col("doc_id"), F.col("lang"), F.col("source"), F.col("n_chars")
                )
            ).alias("s")
        )
        .select("s.doc_id", "s.lang", "s.source", "s.n_chars")
    )
    return (
        survivors.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q_decontaminate",
    oracle="""
WITH grams AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+3], ' ')
                        FOR i IN range(1, len(toks) - 2)])) AS g
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
        FROM documents)
  WHERE len(toks) >= 4
),
bench AS (SELECT DISTINCT doc_id AS bench_id, g FROM grams WHERE doc_id % 97 = 0),
cand AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 != 0)
SELECT cand.doc_id,
       count(DISTINCT cand.g) AS n_shared_grams,
       count(DISTINCT bench.bench_id) AS n_benchmarks
FROM cand JOIN bench ON cand.g = bench.g
GROUP BY cand.doc_id
ORDER BY doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word-4-gram with a held-out benchmark set (the GPT-3 appendix-C /
    FineWeb decontamination shape, at 4-gram granularity because the
    synthetic corpus tops out at ~100 tokens/doc).

    The benchmark set is the deterministic pseudo-benchmark
    ``doc_id % 97 == 0`` (~1% of the corpus); flagged docs report how
    many distinct grams and how many distinct benchmark docs they hit.

    Scale shape: benchmark suites are MBs against a 100 TB corpus, so
    the distinct benchmark gram set is BROADCAST and the candidate side
    needs no shuffle at all for the probe — one explode, one broadcast
    hash join, then a single groupBy keyed by doc_id (uniform key). The
    explode never materializes grams as corpus-wide state; only grams
    that hit the benchmark survive the join. At 100 TB swap the string
    grams for xxhash64 of the gram (functions/hashing.py) to shrink the
    broadcast and the shuffle rows — semantics unchanged modulo hash
    collisions, which a verify-on-match pass removes.
    """
    from elric_rs_spark.functions.hashing import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 4))).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bench_id"), "g")
        .distinct()
    )
    cand = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        cand.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_benchmarks"),
        )
        .orderBy("doc_id")
    )


DOMAIN_CAP = 50


@query(
    "q_domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT lang, source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY {HASH_EXPR}, doc_id) AS rn
  FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM ranked
GROUP BY lang, source
""",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the FineWeb/CCNet "no domain dominates"
    curation step): within each (lang, source) stratum keep at most
    DOMAIN_CAP documents, selected in deterministic hash order (the same
    multiplicative hash as q_sample_hash, doc_id tie-break) so the kept
    set is random-like yet reproducible across engines, partitionings,
    and reruns — a row_number on arrival order would silently change
    under retries.

    Scale shape: one window sort keyed by (lang, source); the report
    aggregate reuses that partitioning. At 100 TB with millions of
    domains the stratum key is high-cardinality, so the window
    parallelizes; a skewed mega-domain splits under AQE only for the
    aggregate — the window sort of a hot domain is the known cost, and
    the cap means only its first CAP rows survive to downstream stages."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(F.expr(HASH_EXPR), "doc_id")
    ranked = d.select(
        "lang", "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    kept = F.col("rn") <= DOMAIN_CAP
    return ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


# target corpus composition for the rebalance operator (share per lang,
# thousandths — sums to 1000)
MIX_TARGET_SQL = "(VALUES ('en', 400), ('de', 150), ('es', 150), ('fr', 150), ('zh', 150)) AS mix(lang, share_thousandths)"
MIX_TARGET = {"en": 400, "de": 150, "es": 150, "fr": 150, "zh": 150}


@query(
    "q_mix_rebalance",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
total AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
rates AS (
  SELECT c.lang, c.n,
         -- keep-rate in thousandths: min(1000, target_share * total / n)
         -- `//` not `/`: DuckDB `/` is float division and CAST rounds,
         -- while Spark `div` floors — `//` floors on both
         CAST(least(1000, (mix.share_thousandths * t.t) // c.n) AS BIGINT)
           AS keep_permille
  FROM counts c
  JOIN {MIX_TARGET_SQL} ON c.lang = mix.lang
  CROSS JOIN total t
),
kept AS (
  SELECT d.lang,
         CASE WHEN ((d.doc_id % 1000003) * 2654435761 + 12345)
                   % 4294967296 % 1000 < r.keep_permille
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN rates r ON d.lang = r.lang
)
SELECT k.lang, r.n AS n_before, r.keep_permille,
       CAST(sum(k.keep) AS BIGINT) AS n_kept
FROM kept k JOIN rates r ON k.lang = r.lang
GROUP BY k.lang, r.n, r.keep_permille
""",
)
def q_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mix rebalancing (the data-mixing step that hits a target
    language/domain composition before training): measure the actual
    per-language counts, derive each language's keep-rate as
    min(1, target_share x total / actual), then down-sample
    DETERMINISTICALLY with the same hash-slot rule as q_sample_hash —
    so the kept set is reproducible and the rate math is exact integer
    arithmetic (permille, floor division) on both engines.

    Scale shape: the counts aggregate is tiny (one row per language)
    and broadcast back; the keep decision is row-local (no second
    shuffle over the corpus); the report groupBy keys on lang. The
    identical plan rebalances a 100 TB corpus: its only wide operation
    is the one count aggregate."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    mix = spark.createDataFrame(
        list(MIX_TARGET.items()), "lang string, share_thousandths long"
    )
    rates = (
        counts.join(F.broadcast(mix), "lang")
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n",
            F.least(
                F.lit(1000),
                F.expr("(share_thousandths * t) div n"),
            ).cast("long").alias("keep_permille"),
        )
    )
    slot = F.expr(
        "((doc_id % 1000003) * 2654435761 + 12345) % 4294967296 % 1000"
    )
    kept = d.join(F.broadcast(rates), "lang").select(
        "lang",
        "n",
        "keep_permille",
        F.when(slot < F.col("keep_permille"), 1).otherwise(0).alias("keep"),
    )
    return kept.groupBy("lang", F.col("n").alias("n_before"), "keep_permille").agg(
        F.sum("keep").alias("n_kept")
    )


# PII pattern subset shared verbatim by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded quantifiers, \b word boundaries —
# no lookaround, no backreferences (RE2 has neither).
PII_EMAIL = r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@query(
    "q_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@mail-' || source || '.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{PII_IP}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
             '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IP}', '<IP>', 'g')) AS scrubbed_md5
FROM aug
WHERE len(regexp_extract_all(text, '{PII_EMAIL}'))
      + len(regexp_extract_all(text, '{PII_PHONE}'))
      + len(regexp_extract_all(text, '{PII_IP}')) > 0
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the pre-training scrub every corpus
    pipeline runs before anything else): emails, phone numbers, and
    IPv4 addresses are counted and replaced with typed placeholder
    tokens. The fixture corpus carries no PII, so each engine first
    plants it DETERMINISTICALLY (doc_id-derived emails/phones/IPs on
    residue-class subsets, leaving true negatives) and the oracle then
    verifies both the detection counts and the exact redacted output
    (md5 of the scrubbed text) bit-for-bit.

    The patterns stay inside the Java-regex ∩ RE2 common subset (no
    lookaround/backrefs) so the same strings drive both engines; on a
    real corpus only the augmentation CTE disappears. Plan: pure
    row-local projection — no shuffle, no UDF, whole-stage codegen;
    regexp_replace/regexp_count run JVM-side. At 100 TB this is
    scan-bandwidth work that pipelines with ingest."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail-"),
                F.col("source"),
                F.lit(".com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" host 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.lit("")),
    )
    t = d.select("doc_id", aug.alias("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IP,
        "<IP>",
    )
    counted = t.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(PII_IP)).cast("long").alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )
    return counted.filter(
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")) > 0
    )


def normalize_url(url):
    """Canonical form of a URL column: scheme/host lowercased, www. and
    default ports stripped, trailing slash removed, fragment dropped,
    utm_* tracking params removed, surviving params sorted. Shared by
    q_url_dedup and its fixed-point property test — one copy of the
    rules. All expressions sit in the Java-regex ∩ RE2 subset."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1)),
            r"^www\.",
            "",
        ),
        r":(443|80)$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1), r"/$", ""
    )
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    qn = F.array_join(
        F.array_sort(
            F.filter(
                F.split(q, "&"),
                lambda p: (~p.startswith("utm_")) & (p != ""),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )


@query(
    "q_url_dedup",
    oracle="""
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.' || source || '.Com:443/Path/'
         || CAST(doc_id % 50 AS VARCHAR)
         || '/?utm_source=feed&b=2&a=' || CAST(doc_id % 3 AS VARCHAR)
         || '&utm_campaign=x#sec' || CAST(doc_id % 4 AS VARCHAR) AS url
  FROM documents
),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_replace(
           regexp_replace(
             lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
             '^www\\.', ''),
           ':(443|80)$', '') AS host,
         regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM raw
),
cleaned AS (
  SELECT doc_id, scheme, host, path,
         array_to_string(
           list_sort(list_filter(string_split(q, '&'),
                                 p -> NOT starts_with(p, 'utm_') AND p <> '')),
           '&') AS qn
  FROM parts
),
urls AS (
  SELECT doc_id,
         scheme || '://' || host || path
         || CASE WHEN qn <> '' THEN '?' || qn ELSE '' END AS norm_url
  FROM cleaned
)
SELECT norm_url, count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM urls GROUP BY norm_url
""",
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (the first pass of every web-corpus
    pipeline): scheme/host lowercased, www. and default ports stripped,
    trailing slash removed, fragment dropped, tracking (utm_*) params
    removed, surviving params SORTED — then documents group by the
    canonical URL and the lowest doc_id becomes the cluster canonical.
    The fixture has no URL column, so both engines synthesize the same
    messy URLs deterministically from (source, doc_id); on a real crawl
    only the synthesis CTE disappears.

    All normalization is regex/split/sort built-ins in the Java-regex ∩
    RE2 subset (the q_pii_scrub discipline), entirely row-local; the
    only shuffle is the final canonical-URL groupBy (map-side combined,
    uniform keys). The oracle replays every step bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Com:443/Path/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=feed&b=2&a="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&utm_campaign=x#sec"),
        (F.col("doc_id") % 4).cast("string"),
    )
    raw = d.select("doc_id", url.alias("url"))
    urls = raw.select(
        "doc_id", normalize_url(F.col("url")).alias("norm_url")
    )
    return urls.groupBy("norm_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("long").alias("canonical_doc"),
    )


# DSIR-lite hashed-importance buckets: 256 buckets keyed by the first
# two hex chars of md5(token) — engine-portable (md5 is bit-identical in
# Spark and DuckDB), uniform by construction, and small enough that the
# per-bucket log-ratio table broadcasts anywhere.
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


@query(
    "q_importance_weight",
    oracle=f"""
WITH toks AS (
  SELECT lang, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
),
bucketed AS (
  SELECT substr(md5(tok), 1, 2) AS bucket,
         CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END AS is_tgt
  FROM toks
),
counts AS (
  SELECT bucket,
         CAST(sum(is_tgt) AS BIGINT) AS target_cnt,
         CAST(count(*) AS BIGINT) AS raw_cnt
  FROM bucketed GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(target_cnt) AS BIGINT) AS t_total,
         CAST(sum(raw_cnt) AS BIGINT) AS r_total
  FROM counts
)
SELECT bucket, target_cnt, raw_cnt,
       CAST(round(1000 * ln(
         (CAST(target_cnt + 1 AS DOUBLE) * (r_total + {DSIR_BUCKETS}))
         / (CAST(raw_cnt + 1 AS DOUBLE) * (t_total + {DSIR_BUCKETS}))
       )) AS BIGINT) AS weight_mnat
FROM counts, totals
""",
)
def q_importance_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style hashed importance weights (Xie et al. 2023,
    arXiv:2302.03169 — public method): token mass is hashed into 256
    buckets; each bucket's importance is the add-1-smoothed log-ratio of
    its probability under the TARGET distribution (here lang='en' docs)
    vs the RAW corpus, in milli-nats. The 256-row table is the artifact
    a data-selection pass broadcasts to score every document with
    sum(count_b * weight_b).

    Cross-engine determinism: the bucket key is substr(md5(token),1,2)
    (bit-identical in both engines); the ratio is assembled from exact
    integer counts with ONE double division and one ln(), then rounded
    to integer milli-nats — the same float-risk envelope q_lm_score
    already carries (a flip needs the true value within ~1e-16 of a
    0.0005 boundary).

    Scale shape: one map-side-combinable groupBy on 256 uniform keys,
    one single-row total, zero joins against the corpus. The weight
    table is O(1); applying it to documents later is a broadcast."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    counts = (
        toks.select(
            F.substring(F.md5("tok"), 1, 2).alias("bucket"),
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0).alias("is_tgt"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_tgt").cast("long").alias("target_cnt"),
            F.count(F.lit(1)).alias("raw_cnt"),
        )
    )
    totals = counts.agg(
        F.sum("target_cnt").alias("t_total"), F.sum("raw_cnt").alias("r_total")
    )
    ratio = (
        (F.col("target_cnt") + 1).cast("double")
        * (F.col("r_total") + DSIR_BUCKETS)
    ) / (
        (F.col("raw_cnt") + 1).cast("double")
        * (F.col("t_total") + DSIR_BUCKETS)
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "target_cnt",
        "raw_cnt",
        F.round(1000 * F.log(ratio)).cast("long").alias("weight_mnat"),
    )


@query(
    "q_c4_filter",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CASE WHEN right(text, 1) IN ('.', '!', '?', '"') THEN 1 ELSE 0 END
         AS r_terminal_punct,
       CASE WHEN len(string_split(trim(text), ' ')) >= 5 THEN 1 ELSE 0 END
         AS r_min_words,
       CASE WHEN contains(text, 'lorem ipsum') THEN 0 ELSE 1 END
         AS r_no_lorem,
       CASE WHEN contains(text, '{') THEN 0 ELSE 1 END AS r_no_brace,
       CASE WHEN right(text, 1) IN ('.', '!', '?', '"')
             AND len(string_split(trim(text), ' ')) >= 5
             AND NOT contains(text, 'lorem ipsum')
             AND NOT contains(text, '{')
            THEN 1 ELSE 0 END AS c4_keep
FROM aug
""",
)
def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style heuristic page filters (Raffel et al. 2020,
    arXiv:1910.10683 §2.2 — public method), the deterministic subset:
    terminal-punctuation rule, minimum word count, 'lorem ipsum'
    placeholder-text rule, curly-brace (code leakage) rule, and the
    composed keep decision. The synthetic corpus carries none of these
    markers, so — the q_pii_scrub synthesis pattern — the fixture is
    augmented deterministically from doc_id residue classes inside the
    query on BOTH engines, making every rule fire on a known subset.

    Scale shape: zero shuffles — four row-local string predicates
    evaluated in the scan stage, the canonical cheap first gate of a
    100 TB curation run (drops before anything pays a shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" lorem ipsum")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" {")).otherwise(F.lit("")),
        ).alias("text"),
    )
    terminal = F.expr("right(text, 1)").isin(".", "!", "?", '"')
    min_words = F.size(F.split(F.trim(F.col("text")), " ")) >= 5
    no_lorem = ~F.contains(F.col("text"), F.lit("lorem ipsum"))
    no_brace = ~F.contains(F.col("text"), F.lit("{"))
    as_int = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return aug.select(
        "doc_id",
        as_int(terminal).alias("r_terminal_punct"),
        as_int(min_words).alias("r_min_words"),
        as_int(no_lorem).alias("r_no_lorem"),
        as_int(no_brace).alias("r_no_brace"),
        as_int(terminal & min_words & no_lorem & no_brace).alias("c4_keep"),
    )


# q_curation_v2 trim threshold: drop docs with >= 50% of tokens inside
# corpus-duplicated 13-token spans (the ExactSubstr cut applied at doc
# granularity).
V2_TRIM_COVERAGE = 0.5


def _v2_oracle() -> str:
    from elric_rs_spark.operators.dedup import (
        _portable_pair_ctes,
        _substring_cov_ctes,
    )

    return f"""
WITH {_substring_cov_ctes("documents")},
surv AS (
  SELECT d.* FROM documents d
  LEFT JOIN cov ON cov.doc_id = d.doc_id
  WHERE cov.doc_id IS NULL OR cov.coverage_ratio < {V2_TRIM_COVERAGE}
),
{_portable_pair_ctes("surv")},
drops AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
kept AS (
  SELECT s.* FROM surv s
  LEFT JOIN drops ON drops.doc_id = s.doc_id
  WHERE drops.doc_id IS NULL
),
i AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_in FROM documents GROUP BY lang),
t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_trim FROM surv GROUP BY lang),
k AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens_kept
      FROM kept GROUP BY lang)
SELECT i.lang, i.n_in,
       CAST(coalesce(t.n_trim, 0) AS BIGINT) AS n_trim,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
FROM i
LEFT JOIN t ON t.lang = i.lang
LEFT JOIN k ON k.lang = i.lang
"""


@query("q_curation_v2", oracle=_v2_oracle())
def q_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 curation cascade, composed in ONE plan (the Lee et al.
    2021 recipe: exact-substring dedup, THEN near-dup dedup): documents
    whose duplicated-13-token-span coverage reaches 50% are trimmed
    out; the SURVIVORS (composition matters — candidates are generated
    after the trim) run the md5-portable MinHash banding, and every
    doc that near-duplicates a lower-id survivor drops. The report is
    the per-language funnel: docs in, after trim, after near-dup, and
    kept token mass — the numbers a 100 TB curation run publishes per
    stage.

    Scale shape: composition of independently-graded parts
    (q_substring_dedup's window-frequency pass, q_dedup_minhash's
    bucket-banding pass) with cheap stages first — the span trim
    shrinks the doc set before any signature work, exactly the stage
    ordering q_curation_pipeline documents; no stage adds a shuffle
    class the parts don't already carry."""
    from elric_rs_spark.functions.hashing import word_ngrams as _wng
    from elric_rs_spark.operators.dedup import (
        portable_pairs,
        substring_coverage,
    )

    d = load_table(spark, sf_dir, "documents")
    cov = substring_coverage(d).select("doc_id", "coverage_ratio")
    surv = (
        d.join(cov, "doc_id", "left")
        .filter(
            F.col("coverage_ratio").isNull()
            | (F.col("coverage_ratio") < V2_TRIM_COVERAGE)
        )
        .select(d.columns)
        # surv feeds FIVE branches (candidate chain, both pair sides,
        # the trim count, the kept rollup); without materialization the
        # substring-coverage subtree (13x window explode + corpus
        # window-frequency groupBy) re-executes per branch
        .localCheckpoint()
    )
    grams = surv.select(
        "doc_id", F.array_distinct(_wng(F.col("text"), 3)).alias("g")
    ).filter(F.size("g") > 0)
    drops = (
        portable_pairs(spark, grams)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = surv.join(drops, "doc_id", "left_anti")
    n_tok = F.size(F.split(F.trim(F.col("text")), " "))
    i = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in"))
    t = surv.groupBy("lang").agg(F.count(F.lit(1)).alias("n_trim"))
    k = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(n_tok).alias("tokens_kept"),
    )
    return (
        i.join(t, "lang", "left")
        .join(k, "lang", "left")
        .select(
            "lang",
            "n_in",
            F.coalesce("n_trim", F.lit(0)).cast("long").alias("n_trim"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
        )
    )


# --- hashed linear quality classifier (round 5) ------------------------
# The modern curation stack filters on MODEL scores, not just heuristics
# (FineWeb-Edu / DCLM-style classifier filtering: a cheap linear model
# over hashed features scores every page; public method — Penedo et al.
# 2024, arXiv:2406.17557; Li et al. 2024, arXiv:2406.11794). This is
# that APPLY stage with an engine-portable stand-in model: 256 hashed
# token buckets (the q_importance_weight feature space) with md5-derived
# integer milli-nat weights. Training happens offline; what a 100 TB
# pass needs from the engine is exactly this shape — broadcast a small
# weight table, score every document in one map-side-combinable pass.
QLOGIT_BUCKETS = 256
QLOGIT_SPAN = 2001  # weights uniform in [-1000, 1000] milli-nats


def _qlogit_hex13(expr: str) -> str:
    from elric_rs_spark.operators.similarity import _hex13_sql

    return _hex13_sql(expr)


@query(
    "q_quality_logit",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
),
w AS (
  SELECT printf('%02x', i) AS bucket,
         ({_qlogit_hex13("md5('w' || printf('%02x', i))")}) % {QLOGIT_SPAN}
           - 1000 AS w_mnat
  FROM range(0, {QLOGIT_BUCKETS}) t(i)
),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w.w_mnat) AS BIGINT) AS logit_sum
  FROM toks t JOIN w ON w.bucket = substr(md5(t.tok), 1, 2)
  GROUP BY t.doc_id
)
SELECT doc_id, n_toks,
       (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks)) // n_toks
         AS mean_logit_mnat,
       CASE WHEN (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks))
                 // n_toks >= 0
            THEN 1 ELSE 0 END AS keep
FROM scored
""",
)
def q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter APPLY stage: every document scored by
    a hashed linear classifier — mean milli-nat weight of its tokens
    under a broadcast 256-bucket weight table, kept when the mean logit
    is non-negative. Weights are md5-derived integers, so the whole
    score (sum, pmod-floor-divided mean, keep decision) is exact BIGINT
    arithmetic, bit-identical in the oracle — no float anywhere.

    Scale shape: token explode (row-local), ONE broadcast join against
    the O(1) weight table, one map-side-combinable groupBy(doc_id).
    Swapping the stand-in weights for a trained model's real
    coefficients changes numbers, not the plan — at 100 TB this is the
    same single-pass scan FineWeb-style classifier filtering runs."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    w = spark.range(QLOGIT_BUCKETS).select(
        F.lpad(F.lower(F.hex(F.col("id"))), 2, "0").alias("bucket")
    ).select(
        "bucket",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w"), F.col("bucket"))), 1, 13),
                16, 10,
            ).cast("long") % QLOGIT_SPAN - 1000
        ).alias("w_mnat"),
    )
    scored = (
        toks.select("doc_id", F.substring(F.md5("tok"), 1, 2).alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("w_mnat").alias("logit_sum"),
        )
    )
    mean = F.expr("(logit_sum - pmod(logit_sum, n_toks)) div n_toks")
    return scored.select(
        "doc_id",
        "n_toks",
        mean.alias("mean_logit_mnat"),
        F.when(mean >= 0, 1).otherwise(0).cast("int").alias("keep"),
    )


# --- classifier calibration curve (round 5) ----------------------------
# Before a model-score threshold ships to a 100 TB filter pass, you
# check CALIBRATION: bucket the classifier score, measure an independent
# quality signal per bucket, and look for monotone agreement (the
# FineWeb-Edu recipe publishes exactly this curve before choosing its
# keep threshold, Penedo et al. 2024, arXiv:2406.17557). The engine op
# is a one-pass score + bucket + rate rollup; the "label" here is the
# cheap independent heuristic (length + distinct-token ratio), which is
# what you'd have at curation time before human evals exist.
CALIB_BUCKETS = 10
CALIB_WIDTH = 200  # mean logit in [-1000, 1000] -> 10 buckets of 200


@query(
    "q_quality_calibration",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
),
w AS (
  SELECT printf('%02x', i) AS bucket,
         ({_qlogit_hex13("md5('w' || printf('%02x', i))")}) % {QLOGIT_SPAN}
           - 1000 AS w_mnat
  FROM range(0, {QLOGIT_BUCKETS}) t(i)
),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(count(DISTINCT t.tok) AS BIGINT) AS n_distinct,
         CAST(sum(w.w_mnat) AS BIGINT) AS logit_sum
  FROM toks t JOIN w ON w.bucket = substr(md5(t.tok), 1, 2)
  GROUP BY t.doc_id
),
feat AS (
  SELECT doc_id, n_toks, n_distinct,
         (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks)) // n_toks
           AS mean_logit,
         CASE WHEN n_toks >= 10 AND 2 * n_distinct >= n_toks
              THEN 1 ELSE 0 END AS label
  FROM scored
)
SELECT
  CAST(least(greatest((mean_logit + 1000) // {CALIB_WIDTH}, 0),
             {CALIB_BUCKETS - 1}) AS BIGINT) AS score_bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(label) AS BIGINT) AS n_pos,
  CAST((1000 * sum(label)) // count(*) AS BIGINT) AS pos_permille
FROM feat
GROUP BY 1
""",
)
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the hashed linear classifier
    (q_quality_logit) against an independent cheap heuristic label
    (>= 10 tokens and distinct-token ratio >= 1/2): per score decile,
    document count and label-positive rate in permille. A monotone
    curve justifies thresholding the score; a flat one says the model
    adds nothing over the heuristic — the decision this table feeds.

    All-integer: md5-derived weights, pmod-floor mean logit, permille
    rates by plain non-negative division. Scale shape: the q_quality_logit
    single pass (explode -> broadcast weight join -> map-side-combinable
    groupBy(doc_id) carrying an extra count(DISTINCT tok)) followed by a
    10-row rollup — nothing new shuffles at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    w = spark.range(QLOGIT_BUCKETS).select(
        F.lpad(F.lower(F.hex(F.col("id"))), 2, "0").alias("bucket")
    ).select(
        "bucket",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w"), F.col("bucket"))), 1, 13),
                16, 10,
            ).cast("long") % QLOGIT_SPAN - 1000
        ).alias("w_mnat"),
    )
    scored = (
        toks.select(
            "doc_id", "tok", F.substring(F.md5("tok"), 1, 2).alias("bucket")
        )
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.countDistinct("tok").alias("n_distinct"),
            F.sum("w_mnat").alias("logit_sum"),
        )
    )
    feat = scored.select(
        F.expr("(logit_sum - pmod(logit_sum, n_toks)) div n_toks").alias(
            "mean_logit"
        ),
        F.when(
            (F.col("n_toks") >= 10)
            & (2 * F.col("n_distinct") >= F.col("n_toks")),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    bucket = F.least(
        F.greatest(
            F.expr(f"(mean_logit + 1000) div {CALIB_WIDTH}"), F.lit(0)
        ),
        F.lit(CALIB_BUCKETS - 1),
    ).cast("long")
    return (
        feat.groupBy(bucket.alias("score_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("label").alias("n_pos"),
        )
        .select(
            "score_bucket",
            "n_docs",
            "n_pos",
            F.expr("(1000 * n_pos) div n_docs").alias("pos_permille"),
        )
    )


# --- dedup-aware token-budget mix accounting (round 5) -----------------
# The step between curation and training: given a token budget, how many
# epochs of each source does the mix imply once exact duplicates stop
# contributing new tokens? (The Gopher/Chinchilla-style mixing tables
# and the data-constrained scaling analysis of Muennighoff et al. 2023,
# arXiv:2305.16264, both consume exactly this per-source accounting.)
MIX_TOKEN_BUDGET = 4_000_000


@query(
    "q_token_budget_mix",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
  FROM documents
),
per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS total_tokens
  FROM docs GROUP BY source
),
uniq AS (
  SELECT source, md5(text) AS h, min(n_toks) AS n_toks
  FROM docs GROUP BY source, md5(text)
),
eff AS (
  SELECT source, CAST(sum(n_toks) AS BIGINT) AS effective_tokens
  FROM uniq GROUP BY source
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM per_source)
SELECT p.source, p.n_docs, p.total_tokens, e.effective_tokens,
       CAST({MIX_TOKEN_BUDGET} // ns.n_sources AS BIGINT) AS quota,
       CAST((1000 * ({MIX_TOKEN_BUDGET} // ns.n_sources))
            // e.effective_tokens AS BIGINT) AS epochs_permille
FROM per_source p JOIN eff e USING (source), ns
""",
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware token-budget mix accounting: per source, raw token
    mass, EFFECTIVE token mass (exact-duplicate texts counted once —
    repeated epochs of a duplicate add no new tokens), the per-source
    quota under an even split of MIX_TOKEN_BUDGET, and the implied
    epochs over the effective tokens in permille (1000 = one full
    pass; 4000 = the 4-epoch repetition ceiling the data-constrained
    scaling literature flags).

    Scale shape: two map-side-combinable aggregations over one scan
    (per-source totals; per-(source, md5) exact-dedup collapse feeding
    the effective rollup) and a one-row source-count aggregate
    broadcast back. All integer arithmetic; no windows, no self-joins —
    the same plan prices a 100 TB mix."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "source",
        F.md5("text").alias("h"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_toks"),
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
    )
    eff = (
        docs.groupBy("source", "h")
        .agg(F.min("n_toks").alias("n_toks"))
        .groupBy("source")
        .agg(F.sum("n_toks").alias("effective_tokens"))
    )
    ns = per_source.agg(F.count(F.lit(1)).alias("n_sources"))
    return (
        per_source.join(eff, "source")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "effective_tokens",
            F.expr(f"{MIX_TOKEN_BUDGET} div n_sources").alias("quota"),
            F.expr(
                f"(1000 * ({MIX_TOKEN_BUDGET} div n_sources))"
                " div effective_tokens"
            ).alias("epochs_permille"),
        )
    )


# --- curation v3: classifier -> dedup -> shard accounting (round 5) ----
# The composition proof for the MODEL-era pipeline: where q_curation_v2
# chains heuristic trim -> near-dup, v3 chains the classifier keep
# (q_quality_logit), exact-duplicate collapse (keep-lowest-id), and the
# per-source token/shard report a training run consumes — ONE Spark
# plan, one oracle, demonstrating the operators compose without
# materialization boundaries.
V3_SHARD_TOKENS = 4000


@query(
    "q_curation_v3",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
),
w AS (
  SELECT printf('%02x', i) AS bucket,
         ({_qlogit_hex13("md5('w' || printf('%02x', i))")}) % {QLOGIT_SPAN}
           - 1000 AS w_mnat
  FROM range(0, {QLOGIT_BUCKETS}) t(i)
),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w.w_mnat) AS BIGINT) AS logit_sum
  FROM toks t JOIN w ON w.bucket = substr(md5(t.tok), 1, 2)
  GROUP BY t.doc_id
),
keep AS (
  SELECT doc_id, n_toks FROM scored
  WHERE (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks)) // n_toks >= 0
),
kept AS (
  SELECT d.doc_id, d.source, md5(d.text) AS h, k.n_toks
  FROM documents d JOIN keep k USING (doc_id)
),
uniq AS (
  SELECT source, h, min(doc_id) AS keep_id, min(n_toks) AS n_toks
  FROM kept GROUP BY source, h
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST((sum(n_toks) + {V3_SHARD_TOKENS - 1}) // {V3_SHARD_TOKENS}
            AS BIGINT) AS n_shards,
       CAST(sum(keep_id) AS BIGINT) AS keep_id_sum
FROM uniq
GROUP BY source
""",
)
def q_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-era curation pipeline in ONE plan: hashed-classifier keep
    (mean logit >= 0, the q_quality_logit rule), exact-duplicate
    collapse per source (md5(text), keep-lowest-id survivor), then the
    per-source training-shard report (docs, tokens, ceil-divided 4k
    shard count, survivor-id checksum). The composition q_curation_v2
    proves for heuristic filters, proved here for the classifier stage
    — no materialization boundary anywhere; Catalyst sees the whole
    DAG.

    Scale shape: the classifier stage is the q_quality_logit single
    pass (explode -> broadcast weight join -> map-side-combinable
    groupBy); the keep-join is doc-grain; dedup collapse and the
    source rollup are two more map-side-combinable groupBys. All
    integer arithmetic; no windows, no self-joins."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    w = spark.range(QLOGIT_BUCKETS).select(
        F.lpad(F.lower(F.hex(F.col("id"))), 2, "0").alias("bucket")
    ).select(
        "bucket",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w"), F.col("bucket"))), 1, 13),
                16, 10,
            ).cast("long") % QLOGIT_SPAN - 1000
        ).alias("w_mnat"),
    )
    scored = (
        toks.select("doc_id", F.substring(F.md5("tok"), 1, 2).alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("w_mnat").alias("logit_sum"),
        )
    )
    keep = scored.filter(
        F.expr("(logit_sum - pmod(logit_sum, n_toks)) div n_toks") >= 0
    ).select("doc_id", "n_toks")
    kept = d.select("doc_id", "source", F.md5("text").alias("h")).join(
        keep, "doc_id"
    )
    uniq = kept.groupBy("source", "h").agg(
        F.min("doc_id").alias("keep_id"), F.min("n_toks").alias("n_toks")
    )
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.expr(
            f"(sum(n_toks) + {V3_SHARD_TOKENS - 1}) div {V3_SHARD_TOKENS}"
        ).alias("n_shards"),
        F.sum("keep_id").alias("keep_id_sum"),
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) curation: per source, spend a TOKEN budget on the
# highest-quality documents — the budget-constrained greedy selection a
# fixed-compute pretraining run makes (cf. the top-p/nucleus cutoff of
# Holtzman 2020, applied to corpus curation instead of sampling). Distinct
# from q_domain_cap (count cap in hash order) and q_mix_rebalance (rate
# per stratum): here the cut is a CUMULATIVE-mass threshold in quality
# order, so high-quality strata keep few long documents and noisy strata
# keep many short ones.
NUCLEUS_PERMILLE = 600  # keep docs while the PRIOR cumulative mass < 60%


@query(
    "q_nucleus_curation",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         (1000 * len(list_distinct(string_split(lower(trim(text)), ' '))))
           // len(string_split(lower(trim(text)), ' ')) AS quality_permille
  FROM documents
),
ranked AS (
  SELECT doc_id, source, n_chars, quality_permille,
         CAST(sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY quality_permille DESC, doc_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_chars,
         CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS tot_chars
  FROM scored
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       CAST(min(tot_chars) AS BIGINT) AS total_chars,
       CAST((1000 * sum(n_chars)) // min(tot_chars) AS BIGINT)
         AS kept_permille,
       CAST(min(quality_permille) AS BIGINT) AS cutoff_quality
FROM ranked
WHERE 1000 * (cum_chars - n_chars) < {NUCLEUS_PERMILLE} * tot_chars
GROUP BY source
""",
)
def q_nucleus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) curation: within each source, rank documents by
    an integer lexical-diversity quality score and keep the prefix that
    spends {NUCLEUS_PERMILLE}/1000 of the source's character budget —
    the boundary document that crosses the threshold is kept (prior
    cumulative mass strictly under the cut), so every stratum keeps at
    least its best document. Reports the per-source budget accounting
    and the quality cutoff the budget implies.

    Scale shape: scoring is row-local scan arithmetic; ONE window sort
    per source key does both the cumulative mass and (implicitly) the
    ranking; the stratum total rides the same partitioning; the final
    report reuses the source key — one shuffle class end to end, same
    cost envelope as q_domain_cap. Exact integers throughout, so the
    budget boundary replays bit-for-bit."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            "(1000 * size(array_distinct(split(lower(trim(text)), ' '))))"
            " div size(split(lower(trim(text)), ' '))"
        ).alias("quality_permille"),
    )
    wq = (
        Window.partitionBy("source")
        .orderBy(F.col("quality_permille").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "n_chars",
        "quality_permille",
        F.sum("n_chars").over(wq).cast("long").alias("cum_chars"),
        F.sum("n_chars").over(wt).cast("long").alias("tot_chars"),
    )
    kept = ranked.filter(
        1000 * (F.col("cum_chars") - F.col("n_chars"))
        < NUCLEUS_PERMILLE * F.col("tot_chars")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.min("tot_chars").alias("total_chars"),
        F.expr("(1000 * sum(n_chars)) div min(tot_chars)").alias("kept_permille"),
        F.min("quality_permille").alias("cutoff_quality"),
    )


# ---------------------------------------------------------------------------
# curation v4 (round 8): the VERDICT r07 #5 end-to-end dry-run DAG —
# v3's classifier-keep + exact-dedup composition EXTENDED with the two
# stages a real pretraining pipeline runs between dedup and shard
# write-out: benchmark decontamination (q_decontaminate's broadcast
# 4-gram probe) and token-budget shard packing (q_pack_shards'
# parallel bucketed cumsum). One Catalyst DAG, no materialization
# boundary, exact integers end to end.
V4_PACK_BUCKET_SPAN = 1_000  # doc_ids per cumsum bucket (parallel unit)


@query(
    "q_curation_v4",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
  FROM documents
),
w AS (
  SELECT printf('%02x', i) AS bucket,
         ({_qlogit_hex13("md5('w' || printf('%02x', i))")}) % {QLOGIT_SPAN}
           - 1000 AS w_mnat
  FROM range(0, {QLOGIT_BUCKETS}) t(i)
),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w.w_mnat) AS BIGINT) AS logit_sum
  FROM toks t JOIN w ON w.bucket = substr(md5(t.tok), 1, 2)
  GROUP BY t.doc_id
),
keep AS (
  SELECT doc_id, n_toks FROM scored
  WHERE (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks)) // n_toks >= 0
),
kept AS (
  SELECT d.doc_id, d.source, md5(d.text) AS h, k.n_toks
  FROM documents d JOIN keep k USING (doc_id)
),
uniq AS (
  SELECT source, h, min(doc_id) AS doc_id, min(n_toks) AS n_toks
  FROM kept GROUP BY source, h
),
grams AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+3], ' ')
                        FOR i IN range(1, len(t) - 2)])) AS g
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
flagged AS (
  SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench USING (g)
  WHERE gr.doc_id % 97 != 0
),
clean AS (
  SELECT u.doc_id, u.source, u.n_toks FROM uniq u
  WHERE u.doc_id % 97 != 0
    AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = u.doc_id)
),
packed AS (
  SELECT doc_id, source, n_toks,
         CAST((sum(n_toks) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_toks) // {V3_SHARD_TOKENS}
           AS BIGINT) AS shard_id
  FROM clean
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM packed
GROUP BY shard_id
""",
)
def q_curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation v4 in ONE plan: hashed-classifier keep (mean
    logit >= 0, the q_quality_logit rule) -> exact-duplicate collapse
    per source (md5(text), keep-lowest-id survivor) -> benchmark
    decontamination (drop survivors sharing ANY word-4-gram with the
    ``doc_id % 97 == 0`` pseudo-benchmark; benchmark docs themselves
    are excluded from the training set) -> greedy token-budget shard
    packing in doc_id order -> per-shard manifest (docs, tokens, doc-id
    range, source spread). This is the composition a pretraining data
    run executes between raw corpus and training shards; v3 proved the
    first two stages compose, v4 proves all four do (VERDICT r07 #5).

    Scale shape: classifier = explode -> broadcast weight join ->
    map-side-combinable groupBy (q_quality_logit's single pass); dedup
    collapse = one doc-grain groupBy; decontamination = broadcast hash
    join against the MB-scale benchmark gram set + one distinct — no
    corpus shuffle (q_decontaminate's shape); packing = per-bucket
    cumsum windows (parallel) with only the |docs|/1000-row bucket
    offset table paying a global window, broadcast back
    (q_pack_shards' shape). The four stages chain without an action in
    between, so Catalyst prunes documents.text out of every branch
    that only needs token counts."""
    return curation_v4_frames(spark, sf_dir)["manifest"]


def curation_v4_frames(
    spark: SparkSession, sf_dir: str, packing: bool = True
) -> dict:
    """The v4 DAG's stage-boundary frames, for per-stage cost
    accounting (tools/curation_dryrun.py, VERDICT r07 #5): 'keep'
    (classifier survivors), 'uniq' (after exact-dedup collapse),
    'clean' (after decontamination), 'manifest' (packed shard report —
    what q_curation_v4 returns). Production materializes only the
    manifest plan; the intermediate frames exist so a dry run can
    measure each stage boundary's wall and shuffle volume.

    packing=False stops after 'clean' (no 'manifest' key): the packing
    stage carries a localCheckpoint whose RDD creation executes the
    survivor pipeline under AQE, so consumers that only need an
    upstream frame (q_curation_v5 reuses 'uniq') must not build it —
    measured +1.5 s per v5 run when they did (r12)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    # stage 1: hashed-classifier keep (v3's scored/keep, verbatim shape)
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("tok"),
    )
    w = spark.range(QLOGIT_BUCKETS).select(
        F.lpad(F.lower(F.hex(F.col("id"))), 2, "0").alias("bucket")
    ).select(
        "bucket",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("w"), F.col("bucket"))), 1, 13),
                16, 10,
            ).cast("long") % QLOGIT_SPAN - 1000
        ).alias("w_mnat"),
    )
    scored = (
        toks.select("doc_id", F.substring(F.md5("tok"), 1, 2).alias("bucket"))
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("w_mnat").alias("logit_sum"),
        )
    )
    keep = scored.filter(
        F.expr("(logit_sum - pmod(logit_sum, n_toks)) div n_toks") >= 0
    ).select("doc_id", "n_toks")
    # stage 2: exact-dup collapse per source, keep-lowest-id survivor
    kept = d.select("doc_id", "source", F.md5("text").alias("h")).join(
        keep, "doc_id"
    )
    uniq = kept.groupBy("source", "h").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_toks").alias("n_toks")
    ).select("doc_id", "source", "n_toks")
    # stage 3: benchmark decontamination (broadcast gram-set probe)
    from elric_rs_spark.functions.hashing import word_ngrams

    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 4))).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    flagged = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = uniq.filter(F.col("doc_id") % 97 != 0).join(
        flagged, "doc_id", "left_anti"
    )
    if not packing:
        return {"keep": keep, "uniq": uniq, "clean": clean}
    # stage 4: greedy token-budget packing (q_pack_shards' parallel form:
    # per-bucket exclusive cumsum + broadcast bucket-offset table).
    # r12 (VERDICT r11 #9, applied to v4 and v5): `bucketed` feeds BOTH
    # the per-bucket cumsum AND the bucket-offset aggregate, so Catalyst
    # cloned the entire stage-1..3 pipeline into each branch (the v4
    # finalized plan held two full survivor builds). The DISK_ONLY
    # localCheckpoint makes both branches read the SAME RDD, so the
    # survivor set is computed once per manifest run. (Note: under AQE
    # even eager=False executes the upstream stages at RDD creation —
    # that is why the `packing` gate above exists.) Survivor rows are
    # narrow (ids + counts, never text).
    bucketed = clean.withColumn(
        "bucket", F.expr(f"doc_id div {V4_PACK_BUCKET_SPAN}")
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "local_excl", F.sum("n_toks").over(wloc) - F.col("n_toks")
    )
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("n_toks").alias("bucket_tokens"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_tokens").over(woff), F.lit(0))
        )
        .select("bucket", "offset")
    )
    packed = local.join(F.broadcast(offsets), "bucket").withColumn(
        "shard_id",
        F.expr(f"(offset + local_excl) div {V3_SHARD_TOKENS}").cast("long"),
    )
    # stage 5: per-shard manifest
    manifest = packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.countDistinct("source").alias("n_sources"),
    )
    return {"keep": keep, "uniq": uniq, "clean": clean, "manifest": manifest}


# ---------------------------------------------------------------------------
# Leakage-safe dataset split (round 8): train/val/test assignment where
# near-duplicate documents NEVER straddle splits. A plain per-doc hash
# split leaks evaluation data into training whenever a val/test doc has
# a near-dup twin in train (the contamination the GPT-3 appendix-C and
# every serious data card audits for); the fix is to split at the
# CLUSTER grain — connected components over the verified near-dup pair
# graph — so a whole duplicate family lands in one split. The split
# hash is md5-portable, so DuckDB replays the assignment bit-for-bit.
SPLIT_TRAIN_PCT = 80  # [0, 80) train, [80, 90) val, [90, 100) test
SPLIT_VAL_PCT = 90


def _split_oracle() -> str:
    from elric_rs_spark.operators.dedup import _PORTABLE_PAIR_CTES
    from elric_rs_spark.operators.similarity import _hex13_sql

    hex13 = _hex13_sql("md5('split:' || CAST(rep AS VARCHAR))")
    return f"""
WITH RECURSIVE {_PORTABLE_PAIR_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
labels AS (
  SELECT u AS doc_id, least(u, min(v)) AS rep FROM reach GROUP BY u
),
assigned AS (
  SELECT d.doc_id, d.n_chars, COALESCE(l.rep, d.doc_id) AS rep
  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
),
bucketed AS (
  SELECT doc_id, n_chars, rep,
         ({hex13}) % 100 AS b
  FROM assigned
),
split_of AS (
  SELECT doc_id, n_chars, rep,
         CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN b < {SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM bucketed
),
audit AS (
  SELECT CAST(count(*) AS BIGINT) AS cross_split_pairs
  FROM pairs p
  JOIN split_of sa ON sa.doc_id = p.doc_a
  JOIN split_of sb ON sb.doc_id = p.doc_b
  WHERE sa.split != sb.split
)
SELECT s.split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT s.rep) AS BIGINT) AS n_clusters,
       CAST(sum(s.n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(s.doc_id) AS BIGINT) AS doc_id_sum,
       a.cross_split_pairs
FROM split_of s CROSS JOIN audit a
GROUP BY s.split, a.cross_split_pairs
"""


@query("q_split_leakage_safe", oracle=_split_oracle())
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: connected components over the
    verified portable-MinHash near-dup pair graph define duplicate
    clusters; every cluster (and every singleton doc) is assigned by
    the md5-portable hash of its REPRESENTATIVE — 80/10/10 — so
    near-dup twins can never straddle a split boundary. The result row
    set carries its own audit: `cross_split_pairs` counts verified
    near-dup pairs whose endpoints landed in different splits, and is
    ZERO by construction (the column exists so a pipeline change that
    breaks the invariant fails the value oracle loudly, not silently).

    Scale shape: rides the memoized session pair build
    (portable_pairs_for) + edge-set-sized large-star/small-star
    components; singleton assignment is a doc-grain left-anti join; the
    audit is two pair-grain joins against the broadcast-sized label
    table... at 100 TB labels outgrow a broadcast and the audit becomes
    two shuffle joins on doc_id — still pair-bounded on one side. The
    report is a 3-row groupBy. Reference semantics anchor: split
    assignment must be deterministic and replayable (the reference's
    cursor-replay discipline, loader.rs:111-125, applied to dataset
    manifests)."""
    from elric_rs_spark.operators.dedup import (
        labels_for,
        portable_pairs_for,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = portable_pairs_for(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    labels = labels_for(spark, sf_dir, "portable", edges)  # (doc_id, rep)
    assigned = d.select("doc_id", "n_chars").join(labels, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("rep"), F.col("doc_id")).alias("rep"),
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("rep").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    split_of = assigned.withColumn("split", split)
    sa = split_of.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = split_of.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    audit = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .agg(F.count(F.lit(1)).alias("cross_split_pairs"))
    )
    return (
        split_of.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rep").alias("n_clusters"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .crossJoin(F.broadcast(audit))
    )


# ---------------------------------------------------------------------------
# curation v5 (round 9, VERDICT r08 #3): the COMPLETE pretraining data
# pipeline as ONE plan — v4's four stages EXTENDED with the two
# cluster-grain stages a shippable data card cites: portable near-dup
# CLUSTER drop (connected components over the verified MinHash pair
# graph; keep the lowest-id survivor per duplicate family) and
# leakage-safe train/val/test split assignment at the SAME cluster
# grain (q_split_leakage_safe's rule), so packing happens per split and
# the manifest carries its own zero-cross-split audit column.
#
#   classifier keep -> exact dedup -> near-dup cluster drop ->
#   decontaminate -> leakage-safe split -> per-split shard packing
#
# Stage ORDER is part of the contract (near-dup drop runs BEFORE
# decontamination, so the cluster minimum is taken over exact-dedup
# survivors, not post-decon survivors); both engines implement the same
# order, so the oracle replays bit-for-bit.


def _curation_v5_oracle() -> str:
    from elric_rs_spark.operators.dedup import _PORTABLE_PAIR_CTES
    from elric_rs_spark.operators.similarity import _hex13_sql

    split_md5 = "md5('split:' || CAST(rep AS VARCHAR))"
    split_b = f"({_hex13_sql(split_md5)}) % 100"
    split_case = f"""CASE WHEN {split_b} < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {split_b} < {SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END"""
    return f"""
WITH RECURSIVE {_PORTABLE_PAIR_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
labels AS (
  SELECT u AS doc_id, least(u, min(v)) AS rep FROM reach GROUP BY u
),
qtoks AS (SELECT doc_id, unnest(t) AS tok FROM toks),
w AS (
  SELECT printf('%02x', i) AS bucket,
         ({_qlogit_hex13("md5('w' || printf('%02x', i))")}) % {QLOGIT_SPAN}
           - 1000 AS w_mnat
  FROM range(0, {QLOGIT_BUCKETS}) t(i)
),
scored AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(w.w_mnat) AS BIGINT) AS logit_sum
  FROM qtoks t JOIN w ON w.bucket = substr(md5(t.tok), 1, 2)
  GROUP BY t.doc_id
),
keep AS (
  SELECT doc_id, n_toks FROM scored
  WHERE (logit_sum - ((logit_sum % n_toks + n_toks) % n_toks)) // n_toks >= 0
),
kept AS (
  SELECT d.doc_id, d.source, md5(d.text) AS h, k.n_toks
  FROM documents d JOIN keep k USING (doc_id)
),
uniq AS (
  SELECT source, h, min(doc_id) AS doc_id, min(n_toks) AS n_toks
  FROM kept GROUP BY source, h
),
u2 AS (
  SELECT u.doc_id, u.source, u.n_toks, COALESCE(l.rep, u.doc_id) AS rep
  FROM uniq u LEFT JOIN labels l ON l.doc_id = u.doc_id
),
nodup AS (
  SELECT doc_id, source, n_toks, rep FROM (
    SELECT u2.*, min(doc_id) OVER (PARTITION BY rep) AS keep_min FROM u2
  ) WHERE doc_id = keep_min
),
dgrams AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+3], ' ')
                        FOR i IN range(1, len(t) - 2)])) AS g4
  FROM toks WHERE len(t) >= 4
),
bench AS (SELECT DISTINCT g4 FROM dgrams WHERE doc_id % 97 = 0),
flagged AS (
  SELECT DISTINCT gr.doc_id FROM dgrams gr JOIN bench USING (g4)
  WHERE gr.doc_id % 97 != 0
),
clean AS (
  SELECT n.doc_id, n.source, n.n_toks, n.rep FROM nodup n
  WHERE n.doc_id % 97 != 0
    AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = n.doc_id)
),
split_of AS (
  SELECT doc_id, source, n_toks, {split_case} AS split FROM clean
),
packed AS (
  SELECT doc_id, source, n_toks, split,
         CAST((sum(n_toks) OVER (PARTITION BY split ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - n_toks) // {V3_SHARD_TOKENS}
           AS BIGINT) AS shard_id
  FROM split_of
),
lsplit AS (SELECT doc_id, {split_case} AS split FROM labels),
audit AS (
  SELECT CAST(count(*) AS BIGINT) AS cross_split_pairs
  FROM pairs p
  JOIN lsplit sa ON sa.doc_id = p.doc_a
  JOIN lsplit sb ON sb.doc_id = p.doc_b
  WHERE sa.split != sb.split
)
SELECT p.split, p.shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       a.cross_split_pairs
FROM packed p CROSS JOIN audit a
GROUP BY p.split, p.shard_id, a.cross_split_pairs
"""


@query("q_curation_v5", oracle=_curation_v5_oracle())
def q_curation_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pretraining-data pipeline in ONE Catalyst plan:
    hashed-classifier keep (mean logit >= 0) -> exact-duplicate collapse
    per source (md5(text), keep-lowest-id) -> NEAR-DUP CLUSTER DROP
    (connected components over the verified portable-MinHash pair graph;
    only the lowest-id exact-dedup survivor of each duplicate family
    survives) -> benchmark decontamination (word-4-gram probe against
    the ``doc_id % 97 == 0`` pseudo-benchmark) -> LEAKAGE-SAFE SPLIT
    (train/val/test hashed at the cluster-representative grain, 80/10/10
    — near-dup twins can never straddle a split) -> greedy token-budget
    shard packing PER SPLIT in doc_id order -> per-(split, shard)
    manifest carrying the zero-cross-split audit column. This is the
    artifact a data card cites end-to-end (VERDICT r08 #3).

    Scale shape: stages 1-4 are v4's shapes (broadcast weight join +
    one doc-grain groupBy; broadcast benchmark gram probe — no corpus
    shuffle); the cluster stages ride the memoized session pair build
    (portable_pairs_for) + edge-set-sized star contraction; the
    cluster-min filter is ONE window over the pair-bounded rep key; the
    split column is pure row arithmetic; packing reuses v4's
    per-bucket parallel cumsum with the offset table partitioned by
    split (3x |docs|/1000 rows, broadcast back). Exact integers and
    md5-portable hashes end to end, so DuckDB replays the whole DAG
    bit-for-bit.

    Reference semantics anchor: deterministic, replayable manifests —
    the reference's cursor-replay discipline (loader.rs:111-125)
    applied to the dataset-card artifact."""
    return curation_v5_frames(spark, sf_dir)["manifest"]


def curation_v5_frames(spark: SparkSession, sf_dir: str) -> dict:
    """The v5 DAG's stage-boundary frames for per-stage cost accounting
    (tools/curation_dryrun.py --v5): 'uniq' (after v4 stages 1-2),
    'nodup' (after near-dup cluster drop), 'clean' (after
    decontamination), 'manifest' (per-(split, shard) report — what
    q_curation_v5 returns). Production materializes only the manifest
    plan."""
    from pyspark.sql import Window

    from elric_rs_spark.functions.hashing import word_ngrams
    from elric_rs_spark.operators.dedup import (
        labels_for,
        portable_pairs_for,
    )

    d = load_table(spark, sf_dir, "documents")
    # stages 1-2 (classifier keep + exact-dedup collapse): v4's frames
    uniq = curation_v4_frames(spark, sf_dir, packing=False)["uniq"]
    # stage 3: near-dup cluster drop at the exact-dedup-survivor grain
    pairs = portable_pairs_for(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    labels = labels_for(spark, sf_dir, "portable", edges)  # (doc_id, rep)
    u2 = (
        uniq.join(labels, "doc_id", "left")
        .withColumn("rep", F.coalesce(F.col("rep"), F.col("doc_id")))
    )
    wmin = Window.partitionBy("rep")
    nodup = (
        u2.withColumn("keep_min", F.min("doc_id").over(wmin))
        .filter(F.col("doc_id") == F.col("keep_min"))
        .drop("keep_min")
    )
    # stage 4: benchmark decontamination (v4's broadcast gram probe)
    grams4 = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 4))).alias("g4"),
    )
    bench = grams4.filter(F.col("doc_id") % 97 == 0).select("g4").distinct()
    flagged = (
        grams4.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g4")
        .select("doc_id")
        .distinct()
    )
    clean = nodup.filter(F.col("doc_id") % 97 != 0).join(
        flagged, "doc_id", "left_anti"
    )

    # stage 5: leakage-safe split at the cluster-representative grain
    def _split_col(rep_col):
        b = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), rep_col.cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        return (
            F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
            .when(b < SPLIT_VAL_PCT, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    split_of = clean.withColumn("split", _split_col(F.col("rep"))).drop("rep")
    # stage 6: per-split token-budget packing (v4's parallel bucketed
    # cumsum, partitioned by split). Lazy DISK_ONLY pin: `bucketed`
    # feeds both the cumsum and the offset aggregate, and without the
    # pin Catalyst cloned the entire stage-1..5 survivor pipeline into
    # each branch (r12, VERDICT r11 #9 — see curation_v4_frames).
    bucketed = split_of.withColumn(
        "bucket", F.expr(f"doc_id div {V4_PACK_BUCKET_SPAN}")
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    wloc = (
        Window.partitionBy("split", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "local_excl", F.sum("n_toks").over(wloc) - F.col("n_toks")
    )
    woff = (
        Window.partitionBy("split")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("split", "bucket")
        .agg(F.sum("n_toks").alias("bucket_tokens"))
        .withColumn(
            "offset", F.coalesce(F.sum("bucket_tokens").over(woff), F.lit(0))
        )
        .select("split", "bucket", "offset")
    )
    packed = local.join(F.broadcast(offsets), ["split", "bucket"]).withColumn(
        "shard_id",
        F.expr(f"(offset + local_excl) div {V3_SHARD_TOKENS}").cast("long"),
    )
    # the in-manifest leakage audit: every verified pair's endpoints
    # share a rep, hence a split — zero by construction, loud if broken
    lsplit = labels.withColumn("split", _split_col(F.col("rep")))
    audit = (
        pairs.join(
            lsplit.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            lsplit.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).alias("cross_split_pairs"))
    )
    manifest = (
        packed.groupBy("split", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.countDistinct("source").alias("n_sources"),
        )
        .crossJoin(F.broadcast(audit))
    )
    return {
        "uniq": uniq,
        "nodup": nodup.select("doc_id", "source", "n_toks"),
        "clean": clean.select("doc_id", "source", "n_toks"),
        "manifest": manifest,
    }
