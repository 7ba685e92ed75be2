"""Text-analysis operator family over `documents` (training-data-
pipeline extensions; reference analogs: detect_code_language
python/cocoindex/ops/text.py:20, splitters ops/text.py:40-155,
fingerprints connectorkits/fingerprint.py).

All scoring is integer/IEEE-double arithmetic over token counts, so
the DuckDB oracle is value-identical. No Python UDFs — tokenization,
chunking and hashing run as built-in array expressions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.operators.scrub import (
    pii_counts,
    redact_pii,
    sql_pii_count,
    sql_redact,
)
from cocoindex_spark.operators.text_ops import sql_token_hash16, token_hash16
from cocoindex_spark.queries.registry import register, table

STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "la", "y", "los", "de", "un", "es"),
}


# --- q40: token counting (whitespace tokenizer; per-doc stats)
@register(
    "q40_token_stats",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
)
SELECT doc_id, len(w) AS n_tokens,
  len(list_distinct(w)) AS n_unique,
  CAST(list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / len(w) AS avg_token_len
FROM toks
""",
)
def q40_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    total_len = F.aggregate(
        F.transform(w, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique"),
        (total_len.cast("double") / F.size(w)).alias("avg_token_len"),
    )


# --- q41: quality scoring (length / stopword-ratio / uniqueness mix)
_EN_STOPS = STOPWORDS["en"]
_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in _EN_STOPS) + "]"


@register(
    "q41_quality_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars, string_split(trim(text), ' ') AS w FROM documents
), m AS (
  SELECT doc_id, lang, n_chars, len(w) AS n_tokens,
    len(list_filter(w, t -> list_contains({_STOP_LIST_SQL}, t))) AS n_stop,
    len(list_distinct(w)) AS n_unique
  FROM toks
)
SELECT doc_id, lang, n_tokens, n_stop,
  (CAST(n_stop AS DOUBLE) / n_tokens) AS stop_ratio,
  (CAST(n_unique AS DOUBLE) / n_tokens) AS uniq_ratio,
  (CAST(n_unique AS DOUBLE) / n_tokens) * 0.5
    + (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 0.2 ELSE 0.0 END) AS quality
FROM m
""",
)
def q41_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    stops = F.array(*[F.lit(s) for s in _EN_STOPS])
    m = d.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_tokens"),
        F.size(F.filter(w, lambda t: F.array_contains(stops, t))).alias("n_stop"),
        F.size(F.array_distinct(w)).alias("n_unique"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    uniq_ratio = F.col("n_unique").cast("double") / F.col("n_tokens")
    quality = (
        uniq_ratio * 0.5
        + F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 0.3).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.2).otherwise(0.0)
    )
    return m.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_stop",
        stop_ratio.alias("stop_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        quality.alias("quality"),
    )


# --- q42: language ID (stopword-profile + non-ASCII heuristic) scored
#     as a confusion matrix against the ground-truth `lang` column
def _sql_count_in(words_list: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{s}'" for s in words_list) + "]"
    return f"len(list_filter(w, t -> list_contains({lst}, t)))"


@register(
    "q42_langid_confusion",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, text, string_split(trim(text), ' ') AS w FROM documents
), scored AS (
  SELECT doc_id, lang,
    length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS n_nonascii,
    length(text) AS n_chars_raw,
    {_sql_count_in(STOPWORDS["en"])} AS s_en,
    {_sql_count_in(STOPWORDS["de"])} AS s_de,
    {_sql_count_in(STOPWORDS["fr"])} AS s_fr,
    {_sql_count_in(STOPWORDS["es"])} AS s_es
  FROM toks
), pred AS (
  SELECT doc_id, lang,
    CASE
      WHEN CAST(n_nonascii AS DOUBLE) / n_chars_raw > 0.3 THEN 'zh'
      WHEN s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
      WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
      WHEN s_es > s_en THEN 'es'
      ELSE 'en'
    END AS predicted
  FROM scored
)
SELECT lang, predicted, COUNT(*) AS n
FROM pred GROUP BY lang, predicted
""",
)
def q42_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")

    def count_in(lang: str):
        stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        return F.size(F.filter(w, lambda t: F.array_contains(stops, t)))

    scored = d.select(
        "doc_id",
        "lang",
        F.length(F.regexp_replace(F.col("text"), r"[\x00-\x7F]", "")).alias("n_nonascii"),
        F.length("text").alias("n_chars_raw"),
        count_in("en").alias("s_en"),
        count_in("de").alias("s_de"),
        count_in("fr").alias("s_fr"),
        count_in("es").alias("s_es"),
    )
    predicted = (
        F.when(F.col("n_nonascii").cast("double") / F.col("n_chars_raw") > 0.3, "zh")
        .when(
            (F.col("s_de") > F.col("s_en"))
            & (F.col("s_de") >= F.col("s_fr"))
            & (F.col("s_de") >= F.col("s_es")),
            "de",
        )
        .when((F.col("s_fr") > F.col("s_en")) & (F.col("s_fr") >= F.col("s_es")), "fr")
        .when(F.col("s_es") > F.col("s_en"), "es")
        .otherwise("en")
    )
    return (
        scored.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


# --- q43: document fingerprinting (position-weighted rolling hash over
#     token hashes — resources/id.py:31's deterministic-id idea applied
#     to content)
_POW31 = [31**k for k in range(8)]


@register(
    "q43_doc_fingerprint",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
)
SELECT doc_id,
  CAST(list_sum(list_transform(range(1, len(w)+1),
    i -> (CAST({sql_token_hash16("w[i]")} AS BIGINT) *
          (CASE ((i-1) % 8) {" ".join(f"WHEN {k} THEN {p}" for k, p in enumerate(_POW31))} END)
         ) % 1000000007
  )) % 1000000007 AS BIGINT) AS fingerprint
FROM toks
""",
)
def q43_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("pos", "tok"))
    weight = F.element_at(
        F.array(*[F.lit(p) for p in _POW31]), (F.col("pos") % 8) + 1
    ).cast("long")
    # Per-term mod keeps every term < 1e9, so the int64 partial sums can
    # never wrap (the sum of N terms is < N*1e9); DuckDB's int128
    # list_sum and Spark's int64 sum therefore agree exactly.  The max
    # single term is 65535 * 31^7 ≈ 1.8e15, still inside int64 before
    # the mod.
    term = (token_hash16(F.col("tok")).cast("long") * weight) % F.lit(1000000007)
    return (
        toks.withColumn("term", term)
        .groupBy("doc_id")
        .agg((F.sum("term") % F.lit(1000000007)).alias("fingerprint"))
    )


# --- q44: fixed-size overlapping word-window chunking (SeparatorSplitter/
#     RecursiveSplitter semantics restated windowed: chunk_size=32 words,
#     stride=24 → overlap 8; rust/ops_text/src/split/recursive.rs:591)
_CHUNK = 32
_STRIDE = 24


@register(
    "q44_chunk_documents",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
), chunks AS (
  SELECT doc_id, i AS chunk_idx,
    array_to_string(w[({_STRIDE}*i + 1):({_STRIDE}*i + {_CHUNK})], ' ') AS chunk_text,
    least({_CHUNK}, len(w) - {_STRIDE}*i) AS n_words,
    {_STRIDE}*i + 1 AS start_word
  FROM toks CROSS JOIN UNNEST(range(0, 1 + CAST(floor(greatest(len(w) - {_CHUNK}, 0) * 1.0 / {_STRIDE}) AS BIGINT) +
      (CASE WHEN (greatest(len(w) - {_CHUNK}, 0)) % {_STRIDE} > 0 THEN 1 ELSE 0 END))) AS t(i)
  WHERE {_STRIDE}*i < len(w)
)
SELECT doc_id, chunk_idx, chunk_text, n_words, start_word FROM chunks
""",
)
def q44_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    n = F.size(w)
    # number of chunks: ceil(max(n - CHUNK, 0) / STRIDE) + 1, but never
    # starting at/after n
    extra = F.greatest(n - F.lit(_CHUNK), F.lit(0))
    n_chunks = (
        F.floor(extra.cast("double") / F.lit(_STRIDE)).cast("long")
        + F.when(extra % _STRIDE > 0, 1).otherwise(0)
        + 1
    )
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    F.concat_ws(" ", F.slice(w, i * _STRIDE + 1, _CHUNK)).alias("chunk_text"),
                    F.least(F.lit(_CHUNK), n - i * _STRIDE).alias("n_words"),
                    (i * _STRIDE + 1).alias("start_word"),
                ),
            )
        ).alias("chunk_idx", "ch"),
    ).filter(F.col("ch.n_words") > 0)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.col("ch.n_words").cast("long").alias("n_words"),
        F.col("ch.start_word").cast("long").alias("start_word"),
    )


# --- q45: deterministic id generation (resources/id.py:31,61 —
#     stable across runs, NOT monotonically_increasing_id)
@register(
    "q45_deterministic_ids",
    oracle="""
SELECT doc_id,
  md5('doc:' || CAST(doc_id AS VARCHAR)) AS content_key,
  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 8) || '-' ||
  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 9, 4) || '-' ||
  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 13, 4) || '-' ||
  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 17, 4) || '-' ||
  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 21, 12) AS stable_uuid,
  ROW_NUMBER() OVER (ORDER BY doc_id) AS ordinal
FROM documents
""",
)
def q45_deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    key = F.md5(F.encode(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")), "UTF-8"))
    uuid = F.concat_ws(
        "-",
        F.substring(key, 1, 8),
        F.substring(key, 9, 4),
        F.substring(key, 13, 4),
        F.substring(key, 17, 4),
        F.substring(key, 21, 12),
    )
    from cocoindex_spark.operators.rank import global_row_number

    # Two-phase distributed rank — a bare Window.orderBy would funnel
    # the whole table through one task (single-partition Exchange).
    withkeys = d.select("doc_id", key.alias("content_key"), uuid.alias("stable_uuid"))
    return global_row_number(withkeys, [F.asc("doc_id")], "ordinal").select(
        "doc_id", "content_key", "stable_uuid", "ordinal"
    )


# --- q35: repetition detection (repeated-trigram fraction — the
#     standard "excessive repetition" quality filter in LLM
#     training-data pipelines; all JVM array expressions)
@register(
    "q35_repetition_ngrams",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
), tri AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [] END AS t
  FROM toks
)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_trigrams,
  CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_trigrams,
  CASE WHEN len(t) > 0
       THEN CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t)
       ELSE 0.0 END AS rep_ratio
FROM tri
""",
)
def q35_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.text_ops import kgrams

    d = table(spark, sf_dir, "documents")
    tri = kgrams(F.split(F.trim(F.col("text")), " "), 3)
    m = d.select(
        "doc_id",
        F.size(tri).cast("long").alias("n_trigrams"),
        F.size(F.array_distinct(tri)).cast("long").alias("n_unique_trigrams"),
    )
    rep = F.when(
        F.col("n_trigrams") > 0,
        (F.col("n_trigrams") - F.col("n_unique_trigrams")).cast("double")
        / F.col("n_trigrams"),
    ).otherwise(F.lit(0.0))
    return m.withColumn("rep_ratio", rep)


# --- q36: PII scrub (regex redaction — URL/email/phone/IPv4 counts and
#     the redacted-content hash; operators/scrub.py; patterns restricted
#     to the Java-regex ∩ RE2 subset so both engines agree byte-for-byte)
@register(
    "q36_pii_scrub",
    oracle=f"""
SELECT doc_id,
  {sql_pii_count("url", "text")} AS n_url,
  {sql_pii_count("email", "text")} AS n_email,
  {sql_pii_count("phone", "text")} AS n_phone,
  {sql_pii_count("ipv4", "text")} AS n_ipv4,
  md5({sql_redact("text")}) AS redacted_md5
FROM documents
""",
)
def q36_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    counts = pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        counts["url"].alias("n_url"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(F.encode(redact_pii(F.col("text")), "UTF-8")).alias("redacted_md5"),
    )


# --- q38: BPE-ish regex token estimate (task brief: "token counting
#     (whitespace + a BPE-ish regex)"; whitespace path is q40).
#     Whitespace spelled explicitly: Java's \s includes \x0B, RE2's
#     does not (see operators/scrub.py WS_CLASS).
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


@register(
    "q38_bpe_token_estimate",
    oracle=f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
  n_chars,
  CASE WHEN len(regexp_extract_all(text, '{_BPE_RE}')) > 0
       THEN CAST(n_chars AS DOUBLE) / len(regexp_extract_all(text, '{_BPE_RE}'))
       ELSE 0.0 END AS chars_per_token
FROM documents
""",
)
def q38_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_bpe = F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("long")
    m = d.select("doc_id", n_bpe.alias("n_bpe_tokens"), "n_chars")
    cpt = F.when(
        F.col("n_bpe_tokens") > 0,
        F.col("n_chars").cast("double") / F.col("n_bpe_tokens"),
    ).otherwise(F.lit(0.0))
    return m.withColumn("chars_per_token", cpt)


# --- q56: stemmed vocabulary compression (lexical normalization — the
#     light suffix stemmer's effect on per-language vocabulary size;
#     ONE CASE-chain spelling serves both engines verbatim)
from cocoindex_spark.operators.text_ops import sql_stem_lite  # noqa: E402

_STEM = sql_stem_lite("tok")


@register(
    "q56_stemmed_vocab",
    oracle=f"""
WITH toks AS (
  SELECT lang, UNNEST(string_split(trim(text), ' ')) AS tok FROM documents
)
SELECT lang,
  COUNT(*) AS n_tokens,
  COUNT(DISTINCT tok) AS vocab_raw,
  COUNT(DISTINCT ({_STEM})) AS vocab_stemmed,
  CAST(COUNT(DISTINCT ({_STEM})) AS DOUBLE) / COUNT(DISTINCT tok) AS compression
FROM toks GROUP BY lang
""",
)
def q56_stemmed_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    ).withColumn("stem", F.expr(_STEM))
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("vocab_raw"),
        F.countDistinct("stem").alias("vocab_stemmed"),
        (F.countDistinct("stem").cast("double") / F.countDistinct("tok")).alias(
            "compression"
        ),
    )


# --- q97: shared-SQL parity over the DOCUMENTS corpus — ONE ANSI string
#     executed VERBATIM by both engines (spark.sql here, DuckDB as the
#     oracle), the text-domain twin of q96's TPC-H proof. Pins the
#     shared dialect subset for text analytics: length/replace/lower,
#     LIKE, CASE, GROUP BY + ORDER BY, explicit BIGINT casts (the
#     cross-engine sum-type discipline). Plan: one scan + one hash agg
#     on `source` — partial aggregation map-side, ~20 groups shuffle.
_SHARED_DOC_SQL = """
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
  CAST(MIN(length(text)) AS BIGINT) AS min_len,
  CAST(MAX(length(text)) AS BIGINT) AS max_len,
  CAST(SUM(length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_spaces,
  CAST(SUM(CASE WHEN lower(text) LIKE '%the%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_the
FROM documents
GROUP BY source
ORDER BY source
""".strip()


@register("q97_shared_sql_doc_quality", oracle=_SHARED_DOC_SQL)
def q97_shared_sql_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SHARED_DOC_SQL)


# --- q101: per-source distinguishing terms — integer-exact TF-IDF.
#     The corpus-analysis operator a curation run uses to characterize
#     sources. idf uses the same transcendental-free discipline as the
#     BM25 index (operators/fts.py): an integer odds ratio
#     ((2(N−df)+1)·2^20) div (2df+1) — BIGINT arithmetic is
#     bit-identical in both engines, no log(). Plan: one token explode,
#     two hash aggs (tf keyed on (source,tok), df keyed on tok), the
#     source count as a broadcast 1-row side, a tok-keyed equi-join,
#     and a per-source top-5 window — every stage keyed, no global
#     window, no cross product beyond the scalar broadcast.
@register(
    "q101_tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT source, UNNEST(string_split(trim(text), ' ')) AS tok FROM documents
),
tf AS (SELECT source, tok, COUNT(*) AS tf FROM toks GROUP BY source, tok),
df AS (SELECT tok, COUNT(DISTINCT source) AS df FROM toks GROUP BY tok),
n AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT tf.source, tf.tok,
         CAST(tf.tf * (((2 * (n.n - df.df) + 1) * 1048576) // (2 * df.df + 1))
              AS BIGINT) AS score
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT source, tok, score FROM (
  SELECT source, tok, score,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, tok) AS rk
  FROM scored
) WHERE rk <= 5
""",
)
def q101_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("tok").agg(F.countDistinct("source").alias("df"))
    n = d.agg(F.countDistinct("source").alias("n"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))  # 1-row scalar side, intentional
        .select(
            "source",
            "tok",
            (
                F.col("tf")
                * F.expr("((2 * (n - df) + 1) * 1048576) div (2 * df + 1)")
            ).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "tok", "score")
    )


# --- q139: Gopher-style quality rules (Rae et al. 2021, "Scaling
#     Language Models: ... Gopher", arXiv:2112.11446 Table A1) — the
#     word-level subset applicable to a whitespace corpus, each rule a
#     separate integer-exact flag plus the conjunction `keep`:
#       R1 word count within [50, 100_000]
#       R2 mean word length within [3, 10]   (3n ≤ total_chars ≤ 10n)
#       R3 ≥ 80% of words contain an alphabetic character (5a ≥ 4n)
#       R4 ≥ 2 DISTINCT stop words present (the/and/of/to/a/in/is)
#       R5 symbolic tokens ('#' or '...') under 10% of words (10s < n)
#       R6 repetition: the char mass of the heaviest word (count·len,
#          a MAX aggregate — deterministic without an argmax
#          tiebreak) is ≤ 20% of total chars (5·m ≤ total)
#     Every comparison is integer-only, so the flags are bit-exact
#     cross-engine. Scale shape: R1-R5 are per-row array expressions
#     (no shuffle); R6 is one explode + (doc,tok) partial-aggregated
#     groupBy + per-doc MAX — the only shuffle, keyed by doc_id.
_GOPHER_STOPS = STOPWORDS["en"]
_G_STOPS_SQL = "[" + ", ".join(f"'{s}'" for s in _GOPHER_STOPS) + "]"


@register(
    "q139_gopher_rules",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
),
m AS (
  SELECT doc_id, w, len(w) AS n,
    CAST(list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS BIGINT) AS total_chars,
    len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha,
    len(list_distinct(list_filter(w, t -> list_contains({_G_STOPS_SQL}, t)))) AS n_stop_kinds,
    len(list_filter(w, t -> contains(t, '#') OR contains(t, '...'))) AS n_sym
  FROM toks
),
heavy AS (
  SELECT doc_id, MAX(cnt * CAST(length(tok) AS BIGINT)) AS max_word_chars
  FROM (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT doc_id, UNNEST(w) AS tok FROM toks)
    GROUP BY doc_id, tok
  )
  GROUP BY doc_id
)
SELECT m.doc_id,
  (m.n >= 50 AND m.n <= 100000) AS r1_word_count,
  (3 * m.n <= m.total_chars AND m.total_chars <= 10 * m.n) AS r2_mean_len,
  (5 * m.n_alpha >= 4 * m.n) AS r3_alpha,
  (m.n_stop_kinds >= 2) AS r4_stops,
  (10 * m.n_sym < m.n) AS r5_symbols,
  (5 * h.max_word_chars <= m.total_chars) AS r6_repetition,
  ((m.n >= 50 AND m.n <= 100000)
   AND (3 * m.n <= m.total_chars AND m.total_chars <= 10 * m.n)
   AND (5 * m.n_alpha >= 4 * m.n)
   AND (m.n_stop_kinds >= 2)
   AND (10 * m.n_sym < m.n)
   AND (5 * h.max_word_chars <= m.total_chars)) AS keep
FROM m JOIN heavy h ON m.doc_id = h.doc_id
""",
)
def q139_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    total_chars = F.aggregate(
        F.transform(w, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    m = d.select(
        "doc_id",
        F.size(w).cast("long").alias("n"),
        total_chars.alias("total_chars"),
        F.size(F.filter(w, lambda t: t.rlike("[A-Za-z]"))).cast("long").alias("n_alpha"),
        F.size(
            F.array_distinct(F.filter(w, lambda t: F.array_contains(stops, t)))
        ).cast("long").alias("n_stop_kinds"),
        F.size(
            F.filter(w, lambda t: t.contains("#") | t.contains("..."))
        ).cast("long").alias("n_sym"),
    )
    heavy = (
        d.select("doc_id", F.explode(w).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.col("cnt") * F.length("tok").cast("long")).alias("max_word_chars"))
    )
    j = m.join(heavy, "doc_id")
    r1 = (F.col("n") >= 50) & (F.col("n") <= 100000)
    r2 = (3 * F.col("n") <= F.col("total_chars")) & (
        F.col("total_chars") <= 10 * F.col("n")
    )
    r3 = 5 * F.col("n_alpha") >= 4 * F.col("n")
    r4 = F.col("n_stop_kinds") >= 2
    r5 = 10 * F.col("n_sym") < F.col("n")
    r6 = 5 * F.col("max_word_chars") <= F.col("total_chars")
    return j.select(
        "doc_id",
        r1.alias("r1_word_count"),
        r2.alias("r2_mean_len"),
        r3.alias("r3_alpha"),
        r4.alias("r4_stops"),
        r5.alias("r5_symbols"),
        r6.alias("r6_repetition"),
        (r1 & r2 & r3 & r4 & r5 & r6).alias("keep"),
    )


# --- q140: unigram-surprisal quality signal — the perplexity-filter
#     stage of CCNet/Gopher-style curation (Wenzek et al. 2019,
#     arXiv:1911.00359 score docs by LM perplexity; docs far from the
#     corpus distribution are dropped or bucketed), restated
#     TRANSCENDENTAL-FREE so the scores are value-oracled: surprisal of
#     a token ≈ ilog2(N) − ilog2(cnt) in whole bits, where ilog2(x) =
#     bit_length(x) − 1 is exact integer math in both engines. Per doc:
#     total and mean (milli-bits, integer division) surprisal; output =
#     the 5 most surprising docs per source (keyed window, never a
#     global one). Scale shape: one (tok) count agg, one tok equi-join
#     back, one per-doc agg, one per-source top-k window.
@register(
    "q140_unigram_surprisal",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, UNNEST(string_split(trim(text), ' ')) AS tok
  FROM documents
),
cnt AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt),
scored AS (
  SELECT t.doc_id, t.source,
    CAST(length(bin(n)) - length(bin(c)) AS BIGINT) AS bits
  FROM toks t JOIN cnt ON t.tok = cnt.tok, tot
),
per_doc AS (
  SELECT doc_id, source,
    CAST(COUNT(*) AS BIGINT) AS n_tok,
    CAST(SUM(bits) AS BIGINT) AS total_bits,
    CAST(SUM(bits) * 1000 AS BIGINT) // COUNT(*) AS milli_bits_per_tok
  FROM scored GROUP BY doc_id, source
)
SELECT doc_id, source, n_tok, total_bits, milli_bits_per_tok
FROM per_doc
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY milli_bits_per_tok DESC, doc_id ASC
) <= 5
""",
)
def q140_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("n"))
    # ilog2(x) + 1 = length(bin(x)) — bin() emits no leading zeros in
    # either engine, so the whole-bit surprisal is the same integer
    # expression on both sides.
    bits = (F.length(F.bin(F.col("n"))) - F.length(F.bin(F.col("c")))).cast("long")
    scored = (
        toks.join(cnt, "tok")
        .crossJoin(F.broadcast(tot))  # 1-row scalar side, intentional
        .select("doc_id", "source", bits.alias("bits"))
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("sum(bits) * 1000 div count(1)").cast("long").alias("milli_bits_per_tok"),
    )
    w = W.partitionBy("source").orderBy(
        F.desc("milli_bits_per_tok"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", "n_tok", "total_bits", "milli_bits_per_tok")
    )


# --- q147: content-defined chunking + cross-corpus chunk dedup — the
#     CDC stage of large-scale dedup pipelines (FastCDC/LBFS lineage:
#     boundaries are decided by LOCAL content, so an insertion early in
#     a document shifts no later chunk identity — the property that
#     makes chunk-hash dedup work at 100 TB). Word-gear variant kept
#     engine-exact: a boundary falls after word i when the md5 of the
#     adjacent word pair (w_i, w_{i+1}) ≡ 0 (mod 8); chunk fingerprints
#     are md5 over the space-joined chunk words. The whole pipeline is
#     per-row ARRAY expressions (no per-doc window, no Python) + one
#     hash agg over exploded chunk hashes; output = the 20 most
#     duplicated chunks across the corpus.
@register(
    "q147_cdc_chunk_dedup",
    oracle="""
WITH ws AS (
  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
  WHERE length(trim(text)) > 0
),
marks AS (
  SELECT doc_id, w,
    list_prepend(CAST(0 AS BIGINT),
      list_filter(range(1, len(w)),
        i -> CAST(concat('0x', substr(md5(w[i] || ' ' || w[i+1]), 1, 12)) AS BIGINT) % 8 = 0)) AS bs
  FROM ws
),
chunks AS (
  SELECT doc_id,
    UNNEST(list_transform(range(1, len(bs)+1),
      j -> md5(array_to_string(
             w[CAST(bs[j]+1 AS BIGINT):
               CAST((CASE WHEN j = len(bs) THEN len(w) ELSE bs[j+1] END) AS BIGINT)],
             ' ')))) AS ch
  FROM marks
)
SELECT ch AS chunk_hash,
  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY ch
ORDER BY n_occurrences DESC, chunk_hash ASC
LIMIT 20
""",
)
def q147_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chunk computation is the shared operator (operators/cdc.py) so
    # the SAME per-row plan feeds the live path
    # (streaming/sketch_stream.cdc_chunk_stream) — parity pinned in
    # tests/test_stateful_streaming.py.
    from cocoindex_spark.operators.cdc import cdc_chunk_hashes

    chunks = cdc_chunk_hashes(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("chunk_hash"))
        .limit(20)
    )


# --- q148: bigram-surprisal quality signal — q140's unigram LM
#     upgraded to the conditional bigram model that perplexity filters
#     actually use (CCNet, arXiv:1911.00359): surprisal of a pair
#     (prev, tok) is ilog2(c_prev) − ilog2(c_pair) whole bits (exact
#     integer math, bin() has no leading zeros in either engine).
#     Scale shape: adjacent pairs come from one per-row array zip (no
#     window), then ONE pair-count agg, ONE prev-count agg, equi-joins
#     back, a per-doc agg, and a per-source top-5 keyed window.
@register(
    "q148_bigram_surprisal",
    oracle="""
WITH ws AS (
  SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents
  WHERE len(string_split(trim(text), ' ')) >= 2
),
pairs AS (
  SELECT doc_id, source, w[CAST(i AS BIGINT)] AS prev, w[CAST(i+1 AS BIGINT)] AS tok
  FROM ws, UNNEST(range(1, len(w))) AS t(i)
),
pc AS (SELECT prev, tok, CAST(COUNT(*) AS BIGINT) AS cp FROM pairs GROUP BY prev, tok),
uc AS (SELECT prev, CAST(SUM(cp) AS BIGINT) AS cu FROM pc GROUP BY prev),
scored AS (
  SELECT p.doc_id, p.source,
    CAST(length(bin(uc.cu)) - length(bin(pc.cp)) AS BIGINT) AS bits
  FROM pairs p JOIN pc ON p.prev = pc.prev AND p.tok = pc.tok
  JOIN uc ON p.prev = uc.prev
),
per_doc AS (
  SELECT doc_id, source,
    CAST(COUNT(*) AS BIGINT) AS n_pairs,
    CAST(SUM(bits) AS BIGINT) AS total_bits,
    CAST(SUM(bits) * 1000 AS BIGINT) // COUNT(*) AS milli_bits_per_pair
  FROM scored GROUP BY doc_id, source
)
SELECT doc_id, source, n_pairs, total_bits, milli_bits_per_pair
FROM per_doc
QUALIFY row_number() OVER (
  PARTITION BY source ORDER BY milli_bits_per_pair DESC, doc_id ASC
) <= 5
""",
)
def q148_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    pairs = (
        d.select("doc_id", "source", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1), "
                    "i -> struct(element_at(w, CAST(i AS INT)) AS prev, "
                    "element_at(w, CAST(i AS INT) + 1) AS tok))"
                )
            ).alias("p"),
        )
        .select("doc_id", "source", F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
    )
    pc = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).cast("long").alias("cp"))
    uc = pc.groupBy("prev").agg(F.sum("cp").cast("long").alias("cu"))
    bits = (F.length(F.bin(F.col("cu"))) - F.length(F.bin(F.col("cp")))).cast("long")
    scored = pairs.join(pc, ["prev", "tok"]).join(uc, "prev").select(
        "doc_id", "source", bits.alias("bits")
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("(sum(bits) * 1000) div count(1)").alias("milli_bits_per_pair"),
    )
    return (
        per_doc.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(
                    F.desc("milli_bits_per_pair"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", "n_pairs", "total_bits", "milli_bits_per_pair")
    )


# --- q150: tokenizer-vocab coverage — the OOV-rate gate a training
#     pipeline runs before committing to a tokenizer/vocab (high OOV →
#     the vocab underfits that source; reference analog: the corpus
#     token statistics its text ops feed curation with). vocab = the
#     corpus's top-1000 tokens (deterministic tiebreak), per-source
#     OOV milli-rate over it. Scale shape: one token-count agg, the
#     top-1000 cut via TakeOrdered (never a global window), the
#     bounded vocab BROADCAST back onto the token stream, one
#     per-source agg.
_VOCAB_K = 1000


@register(
    "q150_oov_rate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, UNNEST(string_split(trim(text), ' ')) AS tok
  FROM documents
),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
vocab AS (
  SELECT tok FROM cnt
  QUALIFY row_number() OVER (ORDER BY c DESC, tok ASC) <= {_VOCAB_K}
)
SELECT t.source,
  CAST(COUNT(*) AS BIGINT) AS n_tok,
  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  (CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
    // COUNT(*) AS oov_milli
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.source
""",
)
def q150_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # top-k cut via orderBy+limit → TakeOrderedAndProject (per-partition
    # local top-k, driver merge of k·parts rows) — never a global window
    vocab = cnt.orderBy(F.desc("c"), F.asc("tok")).limit(_VOCAB_K).select("tok")
    joined = toks.join(
        F.broadcast(vocab.withColumn("__in_v", F.lit(1))), "tok", "left"
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.expr(
            "(sum(CASE WHEN __in_v IS NULL THEN 1 ELSE 0 END) * 1000) div count(1)"
        ).alias("oov_milli"),
    )
