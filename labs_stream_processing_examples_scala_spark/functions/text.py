"""Text analysis operators — north-star extension (SURVEY §7 step 7).

All pure Catalyst expressions over ``documents.text`` (no Python in the
hot path): token statistics, BPE-ish regex token counting, quality
scoring, stopword-ratio language ID, and rolling-hash fingerprinting.
Each has an exact DuckDB oracle because every step is deterministic
string/integer arithmetic shared via functions/hashing.py.

At 100 TB these are the map-side of a corpus-filter pipeline: narrow
projections + a final filter, no shuffles at all; Catalyst pipelines
them into one codegen stage per scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labs_stream_processing_examples_scala_spark.functions import hashing as H
from labs_stream_processing_examples_scala_spark.sources.batch import load_table

# tiny deterministic stopword lists (heuristic language ID; real lists
# would be config, the operator shape is what matters)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}
SUBTOKEN_RE = "[a-z]+|[A-Z][a-z]*|[0-9]+"  # BPE-ish: runs of letters/digits


def _tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda w: w != "")


def _stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda w: w.isin(*words)))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count, subtoken (regex) count, char stats.

    Zero-token docs: ``x / 0`` is NULL in both Spark and DuckDB, so
    avg_token_len is NULL on both sides of the oracle — aligned by
    construction (same for the quality_score ratios below)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens("text")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(SUBTOKEN_RE), 0)).alias("n_subtokens"),
        F.round(
            (F.length(F.regexp_replace("text", " ", "")) / F.size(toks)), 6
        ).alias("avg_token_len"),
    )


def _quality_parts() -> tuple[Column, Column, Column, Column]:
    """(n_tokens, stop_ratio, distinct_ratio, score) column expressions —
    shared by quality_score and quality_filter so the arithmetic (and
    therefore the cross-engine hash) can't drift between them."""
    toks = _tokens("text")
    n = F.size(toks)
    stop_ratio = _stopword_hits(toks, "en") / n
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    len_ok = F.when((F.length("text") >= 100) & (F.length("text") <= 5000), 1.0).otherwise(0.0)
    score = F.round(
        0.4 * len_ok + 0.3 * F.least(stop_ratio * 5, F.lit(1.0)) + 0.3 * distinct_ratio, 6
    )
    return n, stop_ratio, distinct_ratio, score


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality: length band + stopword ratio + repetition.

    score = 0.4·len_ok + 0.3·stop_ratio_clipped + 0.3·distinct_ratio —
    a standard web-corpus filter shape (C4/Gopher-style rules reduced
    to deterministic arithmetic).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens("text")
    n, stop_ratio, distinct_ratio, score = _quality_parts()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        score.alias("quality"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio argmax language guess ('und' if no evidence).

    Ties break in fixed order en>de>fr>es (strictly-greater chain)."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens("text")
    hits = {lang: _stopword_hits(toks, lang) for lang in STOPWORDS}
    best = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]) & (hits["de"] > 0), F.lit("de"))
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] > 0), F.lit("fr"))
        .when(hits["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return d.select(
        "doc_id",
        best.alias("lang_guess"),
        *[hits[lang].alias(f"hits_{lang}") for lang in STOPWORDS],
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling hash of normalized text (lowercase,
    whitespace collapsed) — the exact-dedup key that survives trivial
    formatting differences."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), " +", " "))
    return d.select(
        "doc_id",
        H.rolling_hash(normalized).alias("fp"),
        F.md5(normalized).alias("fp_md5"),
    )


# characteristic char-trigrams per language (tiny deterministic sets —
# real signatures would be config; the operator shape is what matters).
# Shared with the DuckDB oracle renderer (oracles.text_langid_ngram).
LANG_TRIGRAMS = {
    "en": ["the", "ing", "and", "ion"],
    "de": ["der", "die", "und", "sch"],
    "fr": ["les", "des", "ent", "que"],
    "es": ["que", "los", "ción", "ado"],
}


def _trigram_count(lowered: Column, tri: str) -> Column:
    # occurrences of `tri` = (len(text) - len(remove(text, tri))) / len(tri)
    return (F.length(lowered) - F.length(F.replace(lowered, F.lit(tri)))) / len(tri)


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-n-gram language ID: score each language by summed
    occurrence counts of its signature trigrams in the lowercased text;
    argmax with fixed tie order en>de>fr>es, 'und' on zero evidence.
    Pure substring arithmetic — one narrow projection, no shuffle, and
    bit-identical in the DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    scores = {
        lang: sum((_trigram_count(lowered, t) for t in tris), F.lit(0.0)).cast("long")
        for lang, tris in LANG_TRIGRAMS.items()
    }
    best = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]) & (scores["en"] >= scores["es"]) & (scores["en"] > 0),
            F.lit("en"),
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]) & (scores["de"] > 0), F.lit("de"))
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] > 0), F.lit("fr"))
        .when(scores["es"] > 0, F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return d.select(
        "doc_id",
        best.alias("lang_guess"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_TRIGRAMS],
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-token fraction and duplicate
    bigram fraction per document. High values flag boilerplate/spam.

    Row-local HOFs only (the per-distinct-token count is O(distinct·n)
    within one row — bounded by document length, not corpus size, so
    the operator stays a narrow projection at any SF). Zero-token docs
    yield NULL ratios on both engines (x/0 → NULL in Spark and DuckDB).
    The scan is spread first (dedup._spread, a no-op on already-parallel
    input): this is the costliest per-row fold in the text family and a
    single-file fixture scan serialized it through one core (measured
    1.5 s single-core vs ~0.2 s spread at sf0.1).
    """
    from labs_stream_processing_examples_scala_spark.operators.dedup import _spread

    d = _spread(load_table(spark, sf_dir, "documents"), spark)
    toks = _tokens("text")
    n = F.size(toks)
    counts = F.transform(
        F.array_distinct(toks),
        lambda w: F.size(F.filter(toks, lambda x: x == w)),
    )
    top_ratio = F.array_max(counts) / n
    # zip_with pads the shorter (shifted) side with null; mapping the
    # padded slot to null and filtering leaves exactly the n-1 bigrams
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, 1 << 30),
            lambda a, b: F.when(b.isNotNull(), F.concat(a, F.lit(" "), b)),
        ),
        lambda s: s.isNotNull(),
    )
    dup_bigram_ratio = 1 - F.size(F.array_distinct(bigrams)) / F.size(bigrams)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(top_ratio, 6).alias("top_token_ratio"),
        F.round(dup_bigram_ratio, 6).alias("dup_bigram_ratio"),
    )


def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quality filter: keep the top half of documents by
    quality within every (lang, source) shard — the percentile-based
    corpus pruning step (C4-style "keep the best X%").

    percent_rank's underlying ranks are integers over a deterministic
    order (quality, doc_id — quality is engine-rounded to 6 so the sort
    key is identical cross-engine), which makes the filter exactly
    reproducible in the DuckDB oracle.

    Scale: ONE shuffle on (lang, source). Partitioning by lang alone
    would serialize each language through one task at 100 TB; the
    source dimension fans the window out (and a real pipeline would
    fan further with a hash-bucket column — same shape).
    """
    from labs_stream_processing_examples_scala_spark.operators.corpus import quality_rerank

    d = load_table(spark, sf_dir, "documents")
    _, _, _, score = _quality_parts()
    scored = d.select("doc_id", "lang", "source", score.alias("quality"))
    # the cut itself is operators/corpus.py quality_rerank — the same
    # job the streaming ingest defers to offline; this oracled entry is
    # therefore the exact-SQL proof of that code path
    return quality_rerank(scored, cut=0.5)


# RE2-safe patterns (no backrefs / lookaround) so Spark's Java regex and
# DuckDB's RE2 agree on every match. Rendered into the oracle SQL.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _with_pii(doc_id: Column, text: Column) -> Column:
    """Deterministically synthesize PII into the fixture text (the word-
    soup fixtures contain none) so the redaction path actually fires;
    the DuckDB oracle builds the identical string."""
    return F.concat(
        text,
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com call 555-"),
        F.lpad(F.pmod(doc_id, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        F.pmod(doc_id, F.lit(256)).cast("string"),
        F.lit(".7"),
    )


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless PII scrub of ANY DataFrame — batch or streaming (a pure
    projection is trivially streaming-legal): adds match counts and the
    redacted text.

    Pure Catalyst regexp chain (email → phone → ip, in that order so a
    redacted email's digits can't later match the phone pattern) — a
    narrow projection that whole-stage-codegens with the scan; zero
    shuffle at any scale.
    """
    s = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(s, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return (
        df.withColumn("n_email", F.size(F.regexp_extract_all(s, F.lit(EMAIL_RE), 0)))
        .withColumn("n_phone", F.size(F.regexp_extract_all(s, F.lit(PHONE_RE), 0)))
        .withColumn("n_ip", F.size(F.regexp_extract_all(s, F.lit(IP_RE), 0)))
        .withColumn("redacted", redacted)
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the documents table (oracle-checked form of
    :func:`redact_pii`): synthesized PII, per-doc match counts, md5 of
    the redacted text."""
    d = load_table(spark, sf_dir, "documents")
    out = redact_pii(
        d.withColumn("text", _with_pii(F.col("doc_id"), F.col("text")))
    )
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ip",
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


VOCAB_TOP_K = 100


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = VOCAB_TOP_K) -> DataFrame:
    """Corpus vocabulary: the k most frequent tokens with term frequency
    and document frequency — the tokenizer-training / vocab-audit query.

    explode → partial+final hash agg (map-side combine absorbs the
    token explosion before the ONE shuffle on token) → global top-k as
    TakeOrderedAndProject (no full sort). Ties break on the token
    string so the cut is deterministic cross-engine.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df_docs"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(k)
    )


TFIDF_TOP_TERMS = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str, top: int = TFIDF_TOP_TERMS) -> DataFrame:
    """TF-IDF: the ``top`` most characteristic terms per document —
    tf(t,d)/|d| · ln(N/df(t)) with deterministic (score desc, token)
    tie-break. The retrieval-weighting counterpart of vocab_topk.

    Plan: explode → groupBy (doc, token) with map-side combine, a
    corpus-wide df agg on token, a shuffle join on token, then the
    per-doc top-k window on doc_id. Every wide edge keys on token or
    doc_id — the standard inverted-index build, linear in corpus size.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar, one job — the corpus size constant
    toks = d.select("doc_id", F.size(_tokens("text")).alias("n_toks"),
                    F.explode(_tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "n_toks", "token").agg(F.count("*").alias("cnt"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df_docs"))
    scored = tf.join(df_, "token").withColumn(
        "tfidf",
        F.round((F.col("cnt") / F.col("n_toks")) * F.log(F.lit(float(n_docs)) / F.col("df_docs")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .select("doc_id", "token", "tfidf", F.col("rn").cast("int").alias("rank"))
    )
