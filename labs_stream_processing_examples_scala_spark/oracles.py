"""DuckDB oracle SQL for the extension operators.

Each builder renders SQL that computes *exactly* what the corresponding
Spark operator computes — same tokenization, same shingles, same hash
constants (functions/hashing.py renders its literals into both sides).
Used by ``__spark_entry__.oracle_sql()``; kept here so the constants
can't drift from the Spark expressions.
"""

from __future__ import annotations

from labs_stream_processing_examples_scala_spark.functions import hashing as H
from labs_stream_processing_examples_scala_spark.functions.text import STOPWORDS, SUBTOKEN_RE

# shared CTE fragments ---------------------------------------------------

TOKS = "list_filter(string_split(text, ' '), w -> w <> '')"

# Distinct 3-word shingle *hashes* per doc, composed from per-word
# rolling hashes — mirrors operators.dedup.shingle_hashes exactly.
_COMPOSE = H.compose_hashes_sql(["wh[i]", "wh[i+1]", "wh[i+2]"])

SHINGLES_CTE = f"""
    toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    whs AS (SELECT doc_id, list_transform(t, w -> {H.rolling_hash_sql('w')}) AS wh FROM toks),
    shl AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(wh) - 2),
                                            i -> {_COMPOSE})) AS shs
        FROM whs WHERE len(wh) >= 3
    ),
    sh AS (SELECT doc_id, unnest(shs) AS h FROM shl)
"""


def _sig_cols() -> str:
    return ",\n               ".join(
        f"min({H.minhash_slot_sql('h', i)}) AS m{i:02d}" for i in range(H.NUM_PERMS)
    )


SIG_CTE = f"""
    sig AS (
        SELECT doc_id,
               {_sig_cols()}
        FROM sh GROUP BY doc_id
    )
"""


def _banded_cte() -> str:
    arms = []
    for b in range(H.BANDS):
        slots = [f"m{b * H.ROWS_PER_BAND + r:02d}" for r in range(H.ROWS_PER_BAND)]
        arms.append(
            f"SELECT doc_id, {b} AS band, {H.band_hash_sql(slots)} AS bucket FROM sig"
        )
    return "banded AS (\n        " + "\n        UNION ALL ".join(arms) + "\n    )"


def dedup_exact() -> str:
    return """
        SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """


def dedup_minhash_signatures() -> str:
    return f"WITH {SHINGLES_CTE}, {SIG_CTE} SELECT * FROM sig"


def dedup_lsh_pairs(threshold: float = 0.5) -> str:
    return f"""
        WITH {SHINGLES_CTE}, {SIG_CTE},
        {_banded_cte()},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b,
               i.n_inter / (za.sz + zb.sz - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= {threshold}
    """


def dedup_ngram_pairs(threshold: float = 0.5) -> str:
    return f"""
        WITH {SHINGLES_CTE},
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT i.doc_a, i.doc_b,
               i.n_inter / (za.sz + zb.sz - i.n_inter) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= {threshold}
    """


def dedup_simhash() -> str:
    wh = H.word_hash32_sql("w")
    return f"""
        WITH words AS (
            SELECT doc_id, unnest({TOKS}) AS w FROM documents
        ),
        wh AS (SELECT doc_id, {wh} AS wh FROM words),
        bits AS (
            SELECT doc_id, s.b,
                   sum(CASE WHEN (wh >> s.b) & 1 = 1 THEN 1 ELSE -1 END) AS tally
            FROM wh, (SELECT unnest(generate_series(0, 31)) AS b) s
            GROUP BY doc_id, s.b
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN tally > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
    """


# similarity -------------------------------------------------------------

_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, {n}), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)


def _dot(a: str, b: str, n: int = 64) -> str:
    return _DOT.format(a=a, b=b, n=n)


def _cos(a: str, b: str, n: int = 64) -> str:
    return f"({_dot(a, b, n)} / (sqrt({_dot(a, a, n)}) * sqrt({_dot(b, b, n)})))"


def sim_bruteforce_topk(query_id: int = 0, k: int = 10) -> str:
    return f"""
        WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {query_id})
        SELECT vec_id, round({_cos('embedding', 'qvec')}, 6) AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> {query_id}
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
    """


def sim_neardup_pairs(threshold: float = 0.9) -> str:
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round({_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round({_cos('a.embedding', 'b.embedding')}, 6) >= {threshold}
    """


# text analysis ----------------------------------------------------------


def _stop_hits(lang: str, toks: str = "t") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks}, w -> w IN ({words})))"


def text_stats() -> str:
    return f"""
        WITH toks AS (SELECT doc_id, text, {TOKS} AS t FROM documents)
        SELECT doc_id,
               length(text) AS n_chars_,
               len(t) AS n_tokens,
               len(regexp_extract_all(text, '{SUBTOKEN_RE}')) AS n_subtokens,
               round(length(replace(text, ' ', '')) / len(t), 6) AS avg_token_len
        FROM toks
    """


def text_quality() -> str:
    return f"""
        WITH toks AS (SELECT doc_id, text, {TOKS} AS t FROM documents)
        SELECT doc_id,
               len(t) AS n_tokens,
               round({_stop_hits('en')} / len(t), 6) AS stop_ratio,
               round(len(list_distinct(t)) / len(t), 6) AS distinct_ratio,
               round(0.4 * (CASE WHEN length(text) >= 100 AND length(text) <= 5000 THEN 1.0 ELSE 0.0 END)
                     + 0.3 * least(({_stop_hits('en')} / len(t)) * 5, 1.0)
                     + 0.3 * (len(list_distinct(t)) / len(t)), 6) AS quality
        FROM toks
    """


def text_langid() -> str:
    h = {lang: _stop_hits(lang) for lang in STOPWORDS}
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents)
        SELECT doc_id,
               CASE
                 WHEN {h['en']} >= {h['de']} AND {h['en']} >= {h['fr']} AND {h['en']} >= {h['es']} AND {h['en']} > 0 THEN 'en'
                 WHEN {h['de']} >= {h['fr']} AND {h['de']} >= {h['es']} AND {h['de']} > 0 THEN 'de'
                 WHEN {h['fr']} >= {h['es']} AND {h['fr']} > 0 THEN 'fr'
                 WHEN {h['es']} > 0 THEN 'es'
                 ELSE 'und'
               END AS lang_guess,
               {h['en']} AS hits_en, {h['de']} AS hits_de,
               {h['fr']} AS hits_fr, {h['es']} AS hits_es
        FROM toks
    """


def text_fingerprint() -> str:
    norm = "trim(regexp_replace(lower(text), ' +', ' ', 'g'))"
    return f"""
        SELECT doc_id,
               {H.rolling_hash_sql(norm)} AS fp,
               md5({norm}) AS fp_md5
        FROM documents
    """


# multimodal ---------------------------------------------------------------


def multimodal_meta() -> str:
    return """
        SELECT doc_id, 'text' AS modality,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """


def dedup_lsh_components(threshold: float = 0.5) -> str:
    """Connected components over the LSH near-dup pair graph via a
    recursive CTE: rep_id = min doc_id reachable in the undirected
    graph — the oracle for the engine's iterative min-label
    propagation (operators.dedup.lsh_dedup_groups)."""
    return f"""
        WITH RECURSIVE {SHINGLES_CTE}, {SIG_CTE},
        {_banded_cte()},
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
            GROUP BY c.doc_a, c.doc_b
        ),
        pairs AS (
            SELECT i.doc_a, i.doc_b
            FROM inter i
            JOIN sizes za ON za.doc_id = i.doc_a
            JOIN sizes zb ON zb.doc_id = i.doc_b
            WHERE i.n_inter / (za.sz + zb.sz - i.n_inter) >= {threshold}
        ),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT s AS id FROM edges),
        reach(id, r) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.id
        )
        SELECT id AS doc_id, min(r) AS rep_id FROM reach GROUP BY id
    """


def text_langid_ngram() -> str:
    """Char-trigram language ID — rendered from the same LANG_TRIGRAMS
    constants as functions.text.lang_id_ngram."""
    from labs_stream_processing_examples_scala_spark.functions.text import LANG_TRIGRAMS

    def score(lang: str) -> str:
        terms = " + ".join(
            f"(length(lt) - length(replace(lt, '{t}', ''))) / {len(t)}"
            for t in LANG_TRIGRAMS[lang]
        )
        return f"CAST({terms} AS BIGINT)"

    s = {lang: score(lang) for lang in LANG_TRIGRAMS}
    cols = ",\n               ".join(f"{s[l]} AS score_{l}" for l in LANG_TRIGRAMS)
    return f"""
        WITH lt_cte AS (SELECT doc_id, lower(text) AS lt FROM documents)
        SELECT doc_id,
               CASE
                 WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} >= {s['es']} AND {s['en']} > 0 THEN 'en'
                 WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']} AND {s['de']} > 0 THEN 'de'
                 WHEN {s['fr']} >= {s['es']} AND {s['fr']} > 0 THEN 'fr'
                 WHEN {s['es']} > 0 THEN 'es'
                 ELSE 'und'
               END AS lang_guess,
               {cols}
        FROM lt_cte
    """


def sampling_hash_split(train_pct: int = 80, valid_pct: int = 10) -> str:
    from labs_stream_processing_examples_scala_spark.operators.sampling import SPLIT_SALT

    b = f"({rolling_hash_sql_key(SPLIT_SALT)} % 100)"
    return f"""
        SELECT doc_id,
               CAST({b} AS INT) AS bucket,
               CASE WHEN {b} < {train_pct} THEN 'train'
                    WHEN {b} < {train_pct + valid_pct} THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    """


def rolling_hash_sql_key(salt: str = "") -> str:
    # salt mirrors sampling._bucket's per-sampler decorrelation
    # (round-12 self-review: shared unsalted buckets correlated every
    # composed sampler)
    key = f"'{salt}' || CAST(doc_id AS VARCHAR)" if salt else "CAST(doc_id AS VARCHAR)"
    return H.rolling_hash_sql(key)


def sampling_reservoir(k: int | None = None) -> str:
    from labs_stream_processing_examples_scala_spark.operators.sampling import (
        RESERVOIR_K,
        RESERVOIR_SALT,
    )

    k = RESERVOIR_K if k is None else k

    h = H.rolling_hash_sql(f"'{RESERVOIR_SALT}' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH ranked AS (
            SELECT doc_id, lang, {h} AS rhash,
                   CAST(row_number() OVER (PARTITION BY lang
                                           ORDER BY {h}, doc_id) AS INT) AS rn
            FROM documents
        )
        SELECT * FROM ranked WHERE rn <= {k}
    """


def sampling_stratified(fractions: dict[str, int] | None = None) -> str:
    from labs_stream_processing_examples_scala_spark.operators.sampling import STRAT_SALT

    fractions = fractions or {"en": 50, "de": 100, "fr": 100, "es": 100}
    b = f"({rolling_hash_sql_key(STRAT_SALT)} % 100)"
    arms = " ".join(f"WHEN '{lang}' THEN {p}" for lang, p in sorted(fractions.items()))
    return f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE (CASE lang {arms} END) IS NOT NULL
          AND {b} < (CASE lang {arms} END)
    """


def dedup_simhash_neardup_pairs(max_hamming: int = 3) -> str:
    """Quadratic all-pairs hamming filter over the simhash oracle — the
    engine's banded form is provably complete for hamming < n_bands
    (pigeonhole), so exact agreement is required, not approximate."""
    return f"""
        WITH sims AS ({dedup_simhash()})
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# corpus assembly --------------------------------------------------------


def pack_sequences(budget: int = 512, n_shards: int = 32) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, doc_id % {n_shards} AS shard,
                   len({TOKS}) AS n_tokens
            FROM documents
        )
        SELECT doc_id, shard, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                           - n_tokens) / {budget}) AS BIGINT) AS seq_id
        FROM toks
    """


def pack_stats(budget: int = 512, n_shards: int = 32) -> str:
    return f"""
        WITH packed AS ({pack_sequences(budget, n_shards)})
        SELECT shard, seq_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(sum(n_tokens) / {budget}, 6) AS fill_ratio
        FROM packed GROUP BY shard, seq_id
    """


def contamination_report(n_benchmark: int = 20) -> str:
    return f"""
        WITH {SHINGLES_CTE},
        bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < {n_benchmark})
        SELECT doc_id, count(*) AS n_shared
        FROM sh JOIN bench USING (h)
        WHERE doc_id >= {n_benchmark}
        GROUP BY doc_id
    """


def decontaminate(n_benchmark: int = 20) -> str:
    return f"""
        WITH {SHINGLES_CTE},
        bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < {n_benchmark}),
        dirty AS (
            SELECT DISTINCT doc_id FROM sh JOIN bench USING (h)
            WHERE doc_id >= {n_benchmark}
        )
        SELECT doc_id, lang, source, n_chars
        FROM documents d
        WHERE doc_id >= {n_benchmark}
          AND NOT EXISTS (SELECT 1 FROM dirty WHERE dirty.doc_id = d.doc_id)
    """


def embed_normalize() -> str:
    return """
        WITH dbl AS (
            SELECT vec_id, len(embedding) AS dim,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        )
        SELECT vec_id, dim,
               round(sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS l2_norm,
               round(e[1] / sqrt(list_sum(list_transform(e, x -> x * x))), 6) AS u0
        FROM dbl
    """


def text_repetition() -> str:
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        bi AS (
            SELECT doc_id, t,
                   list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1]) AS bgs
            FROM toks
        )
        SELECT doc_id, len(t) AS n_tokens,
               round(list_max(list_transform(list_distinct(t),
                              w -> len(list_filter(t, x -> x = w)))) / len(t), 6)
                   AS top_token_ratio,
               round(1 - len(list_distinct(bgs)) / len(bgs), 6) AS dup_bigram_ratio
        FROM bi
    """


def text_quality_filter() -> str:
    # the quality expression is copied verbatim from text_quality() (same
    # parenthesization — FP evaluation order must be identical)
    return f"""
        WITH toks AS (SELECT doc_id, lang, source, text, {TOKS} AS t FROM documents),
        q AS (
            SELECT doc_id, lang, source,
                   round(0.4 * (CASE WHEN length(text) >= 100 AND length(text) <= 5000 THEN 1.0 ELSE 0.0 END)
                         + 0.3 * least(({_stop_hits('en')} / len(t)) * 5, 1.0)
                         + 0.3 * (len(list_distinct(t)) / len(t)), 6) AS quality
            FROM toks
        ),
        r AS (
            SELECT doc_id, lang, source, quality,
                   round(percent_rank() OVER (PARTITION BY lang, source
                                              ORDER BY quality, doc_id), 6) AS pr
            FROM q
        )
        SELECT * FROM r WHERE pr >= 0.5
    """


def text_pii_redact() -> str:
    from labs_stream_processing_examples_scala_spark.functions.text import EMAIL_RE, IP_RE, PHONE_RE

    s = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    )
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({s}, '{EMAIL_RE}', '<EMAIL>', 'g'),"
        f" '{PHONE_RE}', '<PHONE>', 'g'), '{IP_RE}', '<IP>', 'g')"
    )
    return f"""
        SELECT doc_id,
               len(regexp_extract_all({s}, '{EMAIL_RE}')) AS n_email,
               len(regexp_extract_all({s}, '{PHONE_RE}')) AS n_phone,
               len(regexp_extract_all({s}, '{IP_RE}')) AS n_ip,
               md5({red}) AS redacted_md5
        FROM documents
    """


def text_vocab_topk(k: int = 100) -> str:
    return f"""
        SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df_docs
        FROM (SELECT doc_id, unnest({TOKS}) AS token FROM documents)
        GROUP BY token
        ORDER BY tf DESC, token
        LIMIT {k}
    """


def sampling_importance_resample() -> str:
    from labs_stream_processing_examples_scala_spark.operators.sampling import (
        RESAMPLE_BANDS,
        RESAMPLE_SALT,
    )

    arms = " ".join(
        f"WHEN n_chars >= {lo} THEN {pct}" for lo, pct in RESAMPLE_BANDS[:-1]
    )
    w = f"CASE {arms} ELSE {RESAMPLE_BANDS[-1][1]} END"
    b = f"{rolling_hash_sql_key(RESAMPLE_SALT)} % 100"
    return f"""
        SELECT doc_id, n_chars, {w} AS keep_pct, CAST({b} AS INT) AS bucket
        FROM documents
        WHERE {b} < {w}
    """


def sampling_mixture(
    temperature: float | None = None, budget_pct: int | None = None
) -> str:
    from labs_stream_processing_examples_scala_spark.operators.sampling import (
        MIX_SALT,
        MIXTURE_BUDGET_PCT,
        MIXTURE_TEMPERATURE,
    )

    temperature = MIXTURE_TEMPERATURE if temperature is None else float(temperature)
    budget_pct = MIXTURE_BUDGET_PCT if budget_pct is None else budget_pct

    b = f"{rolling_hash_sql_key(MIX_SALT)} % 100"
    w = f"pow(CAST(n_s AS DOUBLE), {temperature})"
    expected = f"({w} / SUM({w}) OVER ()) * (SUM(n_s) OVER () * {budget_pct} / 100.0)"
    return f"""
        WITH counts AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
        rates AS (
            SELECT source,
                   CAST(LEAST(100.0, FLOOR(100.0 * {expected} / n_s + 1e-9)) AS INT) AS keep_pct
            FROM counts
        )
        SELECT d.doc_id, d.source, r.keep_pct, CAST({b} AS INT) AS bucket
        FROM documents d JOIN rates r USING (source)
        WHERE {b} < r.keep_pct
    """


def corpus_chunks(chunk: int = 64, stride: int = 48) -> str:
    rh = H.rolling_hash_sql(f"array_to_string(list_slice(t, s, s + {chunk - 1}), ' ')")
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        starts AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t), {stride})) AS s
            FROM toks WHERE len(t) >= 1
        )
        SELECT doc_id,
               CAST((s - 1) // {stride} AS BIGINT) AS chunk_id,
               len(list_slice(t, s, s + {chunk - 1})) AS n_chunk_tokens,
               {rh} AS chunk_hash
        FROM starts
    """


def dedup_span_stats(k: int = 8) -> str:
    c1 = H.compose_hashes_sql([f"w1[i + {j}]" for j in range(k)])
    c2 = "w2[i + 0]"
    for j in range(1, k):
        c2 = f"(({c2}) * 37 + (w2[i + {j}])) % {H.P2}"
    combined = H.combine_hashes_sql(c1, c2)
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        whs AS (SELECT doc_id,
                       list_transform(t, w -> {H.rolling_hash_sql('w')}) AS w1,
                       list_transform(t, w -> {H.rolling_hash2_sql('w')}) AS w2
                FROM toks),
        g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(w1) - {k - 1}), i -> {combined}) AS g8
            FROM whs WHERE len(w1) >= {k}
        ),
        per AS (
            SELECT doc_id, h, count(*) AS cnt
            FROM (SELECT doc_id, unnest(g8) AS h FROM g)
            GROUP BY doc_id, h
        ),
        tot AS (SELECT doc_id, len(g8) AS n_grams FROM g),
        gcount AS (SELECT h, count(*) AS n_docs FROM per GROUP BY h)
        SELECT t.doc_id, t.n_grams,
               CAST(COALESCE(sum(CASE WHEN n_docs >= 2 THEN cnt ELSE 0 END), 0) AS BIGINT) AS n_dup_pos,
               round(COALESCE(sum(CASE WHEN n_docs >= 2 THEN cnt ELSE 0 END), 0) / t.n_grams, 6) AS dup_frac
        FROM tot t
        JOIN per p USING (doc_id)
        JOIN gcount gc USING (h)
        GROUP BY t.doc_id, t.n_grams
    """


def dedup_span_removal(k: int = 8) -> str:
    """Exact oracle for operators/dedup.py remove_dup_spans: same
    positional-gram construction as :func:`dedup_span_stats`, then
    keep-first-by-(doc_id, pos) per gram hash, covered positions =
    union of removed [pos, pos+k-1] intervals, and a row-local
    list_filter rebuild (1-based DuckDB indices ≡ Spark's 0-based
    posexplode under the same ordering)."""
    c1 = H.compose_hashes_sql([f"w1[i + {j}]" for j in range(k)])
    c2 = "w2[i + 0]"
    for j in range(1, k):
        c2 = f"(({c2}) * 37 + (w2[i + {j}])) % {H.P2}"
    combined = H.combine_hashes_sql(c1, c2)
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        whs AS (SELECT doc_id,
                       list_transform(t, w -> {H.rolling_hash_sql('w')}) AS w1,
                       list_transform(t, w -> {H.rolling_hash2_sql('w')}) AS w2
                FROM toks),
        g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(w1) - {k - 1}), i -> {combined}) AS g8
            FROM whs WHERE len(w1) >= {k}
        ),
        occ AS (
            SELECT doc_id, unnest(generate_series(1, len(g8))) AS pos, g8
            FROM g
        ),
        ranked AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY g8[pos] ORDER BY doc_id, pos) AS rn,
                   count(*) OVER (PARTITION BY g8[pos]) AS n_occ
            FROM occ
        ),
        cov AS (
            SELECT DISTINCT doc_id, cp FROM (
                SELECT doc_id, unnest(generate_series(pos, pos + {k - 1})) AS cp
                FROM ranked WHERE n_occ >= 2 AND rn >= 2
            )
        ),
        covl AS (SELECT doc_id, list(cp) AS cps, count(*) AS n_cov FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(COALESCE(n_cov, 0) AS BIGINT) AS n_removed_tokens,
               COALESCE(array_to_string(
                   list_filter(t, (x, i) -> NOT list_contains(COALESCE(cps, CAST([] AS BIGINT[])), i)),
                   ' '
               ), '') AS text
        FROM toks t LEFT JOIN covl USING (doc_id)
    """


def decontaminate_spans(n_benchmark: int = 20, k: int = 8) -> str:
    """Exact oracle for corpus.decontaminate_spans: benchmark gram set
    = distinct positional-gram hashes of doc_id < n; corpus positions
    matching it are excised through the same list_filter rebuild as
    :func:`dedup_span_removal`."""
    c1 = H.compose_hashes_sql([f"w1[i + {j}]" for j in range(k)])
    c2 = "w2[i + 0]"
    for j in range(1, k):
        c2 = f"(({c2}) * 37 + (w2[i + {j}])) % {H.P2}"
    combined = H.combine_hashes_sql(c1, c2)
    return f"""
        WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
        whs AS (SELECT doc_id,
                       list_transform(t, w -> {H.rolling_hash_sql('w')}) AS w1,
                       list_transform(t, w -> {H.rolling_hash2_sql('w')}) AS w2
                FROM toks),
        g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(w1) - {k - 1}), i -> {combined}) AS g8
            FROM whs WHERE len(w1) >= {k}
        ),
        occ AS (
            SELECT doc_id, unnest(generate_series(1, len(g8))) AS pos, g8
            FROM g
        ),
        bench AS (
            SELECT DISTINCT g8[pos] AS h FROM occ WHERE doc_id < {n_benchmark}
        ),
        cov AS (
            SELECT DISTINCT doc_id, cp FROM (
                SELECT o.doc_id, unnest(generate_series(o.pos, o.pos + {k - 1})) AS cp
                FROM occ o JOIN bench b ON g8[o.pos] = b.h
                WHERE o.doc_id >= {n_benchmark}
            )
        ),
        covl AS (SELECT doc_id, list(cp) AS cps, count(*) AS n_cov FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(COALESCE(n_cov, 0) AS BIGINT) AS n_removed_tokens,
               COALESCE(array_to_string(
                   list_filter(t, (x, i) -> NOT list_contains(COALESCE(cps, CAST([] AS BIGINT[])), i)),
                   ' '
               ), '') AS text
        FROM toks t LEFT JOIN covl USING (doc_id)
        WHERE t.doc_id >= {n_benchmark}
    """


def corpus_pipeline(n_benchmark: int = 20) -> str:
    """End-to-end corpus assembly: decontaminate → exact dedup →
    quality filter → length-band resample — each stage's SQL copied
    verbatim from its standalone oracle so the chain cannot drift."""
    from labs_stream_processing_examples_scala_spark.operators.sampling import (
        RESAMPLE_BANDS,
        RESAMPLE_SALT,
    )

    arms = " ".join(f"WHEN n_chars >= {lo} THEN {pct}" for lo, pct in RESAMPLE_BANDS[:-1])
    w = f"CASE {arms} ELSE {RESAMPLE_BANDS[-1][1]} END"
    b = f"{rolling_hash_sql_key(RESAMPLE_SALT)} % 100"
    return f"""
        WITH {SHINGLES_CTE},
        bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < {n_benchmark}),
        dirty AS (
            SELECT DISTINCT doc_id FROM sh JOIN bench USING (h)
            WHERE doc_id >= {n_benchmark}
        ),
        s1 AS (
            SELECT * FROM documents d
            WHERE doc_id >= {n_benchmark}
              AND NOT EXISTS (SELECT 1 FROM dirty WHERE dirty.doc_id = d.doc_id)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM s1
        ),
        s2 AS (SELECT * EXCLUDE (rn) FROM ranked WHERE rn = 1),
        stoks AS (SELECT doc_id, lang, source, n_chars, text, {TOKS} AS t FROM s2),
        q AS (
            SELECT doc_id, lang, source, n_chars,
                   round(0.4 * (CASE WHEN length(text) >= 100 AND length(text) <= 5000 THEN 1.0 ELSE 0.0 END)
                         + 0.3 * least(({_stop_hits('en')} / len(t)) * 5, 1.0)
                         + 0.3 * (len(list_distinct(t)) / len(t)), 6) AS quality
            FROM stoks
        ),
        r AS (
            SELECT doc_id, lang, source, n_chars, quality,
                   round(percent_rank() OVER (PARTITION BY lang, source
                                              ORDER BY quality, doc_id), 6) AS pr
            FROM q
        ),
        s3 AS (SELECT * FROM r WHERE pr >= 0.5)
        SELECT doc_id, lang, source, quality, pr
        FROM s3 WHERE {b} < {w}
    """


def sim_kmeans_step(n_cells: int = 16, dim: int = 64) -> str:
    return f"""
        WITH cents AS (
            SELECT vec_id AS cell, embedding AS cvec
            FROM embeddings ORDER BY vec_id LIMIT {n_cells}
        ),
        sims AS (
            SELECT e.vec_id, c.cell, {_cos('e.embedding', 'c.cvec')} AS sim
            FROM embeddings e CROSS JOIN cents c
        ),
        assigned AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
                FROM sims
            ) WHERE rn = 1
        ),
        per AS (
            SELECT a.cell, i.pos, CAST(e.embedding[i.pos] AS DOUBLE) AS val
            FROM assigned a
            JOIN embeddings e USING (vec_id)
            CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS pos) i
        ),
        upd AS (SELECT cell, pos, avg(val) AS m FROM per GROUP BY cell, pos),
        counts AS (SELECT cell, count(*) AS n_members FROM assigned GROUP BY cell)
        SELECT c.cell, c.n_members,
               round(sqrt(sum(m * m)), 6) AS new_norm,
               round(max(CASE WHEN pos = 1 THEN m END), 6) AS c0
        FROM upd u JOIN counts c USING (cell)
        GROUP BY c.cell, c.n_members
    """


def text_tfidf(top: int = 3) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, len({TOKS}) AS n_toks, unnest({TOKS}) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, n_toks, token, count(*) AS cnt
            FROM toks GROUP BY doc_id, n_toks, token
        ),
        dfreq AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY token),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.cnt, tf.n_toks, dfreq.df_docs,
                   round((tf.cnt / tf.n_toks)
                         * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / dfreq.df_docs), 6) AS tfidf
            FROM tf JOIN dfreq USING (token)
        )
        SELECT doc_id, token, tfidf, CAST(rn AS INT) AS rank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
            FROM scored
        ) WHERE rn <= {top}
    """


def funnel() -> str:
    return """
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(ts) AS t_click
            FROM events e JOIN v USING (user_id)
            WHERE event_type = 'click' AND ts > t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(ts) AS t_purchase
            FROM events e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND ts > t_click
            GROUP BY e.user_id
        )
        SELECT v.user_id,
               strftime(t_view, '%Y-%m-%d %H:%M:%S') AS t_view_s,
               strftime(t_click, '%Y-%m-%d %H:%M:%S') AS t_click_s,
               strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase_s,
               CASE WHEN t_purchase IS NOT NULL THEN 3
                    WHEN t_click IS NOT NULL THEN 2
                    ELSE 1 END AS stage
        FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """


def cohort(epoch: str = "2024-01-01") -> str:
    return f"""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(floor(datediff('day', DATE '{epoch}', CAST(ts AS DATE)) / 7) AS BIGINT) AS week_idx
            FROM events
        ),
        coh AS (SELECT user_id, min(week_idx) AS cohort_week FROM uw GROUP BY user_id)
        SELECT cohort_week, week_idx - cohort_week AS week_offset,
               count(DISTINCT user_id) AS n_users
        FROM uw JOIN coh USING (user_id)
        GROUP BY cohort_week, week_idx - cohort_week
    """
