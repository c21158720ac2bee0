"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All JVM-side
expressions (split/filter/aggregate higher-order functions) — no Python UDFs,
so they run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.hashing import stable_hash64
from calp_cva_tracking_pipeline_spark.operators.partitioning import (
    spread_small_input,
)
from calp_cva_tracking_pipeline_spark.functions.text import (
    ASCII_PUNCT_CLASS,
    token_count,
    tokens,
)

# Minimal function-word lists for the n-gram/stopword language heuristic.
# Real deployments swap in fastText or CLD3 via mapInPandas (see
# operators/multimodal.py for the UDF plumbing pattern).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def lang_id_heuristic(text: Column, threshold: float = 0.05) -> Column:
    """Stopword-ratio language ID: 'en' if English function words exceed
    ``threshold`` of tokens, else 'unk'. Deterministic, oracle-expressible."""
    return F.when(
        stopword_ratio(text, EN_STOPWORDS) > threshold, F.lit("en")
    ).otherwise(F.lit("unk"))


# Most-frequent character trigrams per language (standard public frequency
# tables; space-padded entries capture word boundaries). Deliberately tiny —
# real deployments swap in fastText/CLD3 via the mapInPandas pattern.
CHAR_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": ["the", "he ", " th", "ing", "and", " an", "nd ", " of", "of ",
           "ed ", " to", "to ", "er ", " in", "ion"],
    "fr": ["es ", " de", "de ", "le ", " le", "ent", "nt ", "et ", " et",
           "la ", " la", "ion", "re ", " co", "que"],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "as ", "ión",
           "es ", " en", "en ", "ent", " qu", "que"],
}


def char_trigrams(text: Column) -> Column:
    """Distinct character trigrams of the lowercased text — pure JVM
    (sequence + transform + substring), no UDF."""
    t = F.lower(text)
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(t) - 2, F.lit(1))
            ),
            lambda i: t.substr(i, F.lit(3)),
        )
    )


def lang_id_char_ngram(
    text: Column,
    profiles: dict[str, list[str]] | None = None,
    min_hits: int = 2,
) -> Column:
    """Character-n-gram language ID: the language whose trigram profile
    overlaps the document's trigram set most wins; below ``min_hits``
    overlap → 'unk'. All array intrinsics — runs at scan speed; ties break
    by language code order for determinism."""
    profiles = profiles or CHAR_TRIGRAM_PROFILES
    grams = char_trigrams(text)
    scores = {
        lang: F.size(
            F.array_intersect(grams, F.array(*[F.lit(g) for g in prof]))
        )
        for lang, prof in sorted(profiles.items())
    }
    best_score = F.greatest(*scores.values()) if len(scores) > 1 else next(
        iter(scores.values())
    )
    pick = F.lit("unk")
    for lang in sorted(scores, reverse=True):
        pick = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pick)
    return F.when(best_score >= min_hits, pick).otherwise(F.lit("unk"))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, ASCII_PUNCT_CLASS, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.greatest(
        F.length(text), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]: length band + low punct +
    sane stopword ratio. The standard pre-training heuristic-filter shape
    (cf. C4/Gopher rules); weights are engine policy, not reference parity.
    """
    n_tok = token_count(text)
    length_ok = (n_tok >= 10) & (n_tok <= 10000)
    sw = stopword_ratio(text, EN_STOPWORDS)
    score = (
        F.when(length_ok, 0.4).otherwise(0.0)
        + F.when(punct_ratio(text) < 0.1, 0.3).otherwise(0.0)
        + F.when(sw > 0.01, 0.3).otherwise(0.0)
    )
    return F.round(score, 6)


# PII redaction patterns — deliberately lookaround-free so the SAME
# pattern strings run under Java regex (Spark) and RE2-style engines
# (DuckDB oracle, ripgrep audits). Order matters: emails first (an
# address contains digit runs a phone pattern could eat), then IPv4,
# then phone-shaped digit runs.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}",
        "<PHONE>",
    ),
]


def pii_redact(text: Column) -> Column:
    """Replace emails / IPv4 addresses / phone-shaped digit runs with
    typed placeholder tokens — the standard pre-training scrub pass.
    Chained ``regexp_replace`` intrinsics: scan speed, no UDF. Patterns
    are a heuristic floor (a real deployment layers NER on top via the
    mapInPandas plumbing); placeholders are single tokens so downstream
    token counts stay sane."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def repetition_stats(text: Column) -> tuple[Column, Column]:
    """(dup_line_frac, dup_word_frac) — Gopher-style repetition signals:
    the fraction of lines (split on newline) and of word tokens that are
    duplicates of an earlier one. Boilerplate-heavy and template-spam
    pages score high on either; both are pure array intrinsics."""
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    dup_lines = F.round(
        (n_lines - F.size(F.array_distinct(lines))).cast("double")
        / F.greatest(n_lines, F.lit(1)),
        6,
    )
    toks = tokens(text)
    n_toks = F.size(toks)
    dup_words = F.round(
        (n_toks - F.size(F.array_distinct(toks))).cast("double")
        / F.greatest(n_toks, F.lit(1)),
        6,
    )
    return dup_lines, dup_words


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    embedding-pipeline front end (a doc longer than the encoder's window
    becomes ceil(n/step) chunks with ``overlap`` tokens of context
    carried across boundaries).

    Output: (id, chunk_id, chunk_tokens, chunk_text), one row per chunk,
    chunk_id dense from 0 in document order. Every doc yields ≥1 chunk
    (an empty doc produces one empty chunk: no row is ever dropped, so a
    chunk-count audit reconciles against the doc count). Pure array
    intrinsics over a materialized token array — narrow, scan-speed, no
    shuffle; the explode multiplies rows ~n/step, the same factor the
    downstream encoder must process anyway.
    """
    if max_tokens <= 0 or overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens: {overlap}/{max_tokens}"
        )
    step = max_tokens - overlap
    pre = spread_small_input(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    # last start index: a chunk is emitted only if it contributes tokens
    # BEYOND the carried overlap (start + overlap < n) — otherwise the
    # tail chunk would be fully contained in its predecessor
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor((n - overlap - 1) / F.lit(step)).cast("int"),
            F.lit(0),
        ),
    )
    chunks = pre.select(
        id_col,
        F.posexplode(starts).alias("chunk_id", "__s"),
        F.col("__toks"),
    ).select(
        id_col,
        "chunk_id",
        F.slice(
            F.col("__toks"), F.col("__s") * step + 1, max_tokens
        ).alias("__c"),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.size("__c").alias("chunk_tokens"),
        F.array_join("__c", " ").alias("chunk_text"),
    )


def document_fingerprint(text: Column, modulus: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over word hashes:
    fp = fold(acc * 31 + h(w)) mod M. Stable across engines (md5-derived
    word hashes) and sessions; narrow projection."""
    hs = F.transform(tokens(text), lambda w: stable_hash64(w))
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(modulus),
    )


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus health summary for training-data monitoring:
    doc count, approximate distinct fingerprints (duplication signal),
    token-count quantiles, mean quality. Sketch-based aggregates
    (approx_count_distinct = HLL++, percentile_approx = KLL-style) keep
    this a single scan with O(1) state per partition at 100 TB — the
    multi-dimension reporting surface SURVEY §2.5 promises beyond the
    reference."""
    feats = add_text_features(df, text_col)
    return feats.agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct("fingerprint").alias("approx_distinct_docs"),
        F.percentile_approx("n_tokens", [0.5, 0.95]).alias("token_quantiles"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(F.avg("punct_ratio"), 6).alias("mean_punct_ratio"),
    )


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection adding the full text-analysis feature set.

    Spread-guarded: the tokenize/filter/aggregate expressions are per-row
    CPU, so a single-split input would otherwise serialize on one core
    (operators.partitioning — no-op at scale)."""
    df = spread_small_input(df)
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "lang_pred": lang_id_heuristic(t),
            "punct_ratio": F.round(punct_ratio(t), 6),
            "stopword_ratio": F.round(stopword_ratio(t, EN_STOPWORDS), 6),
            "quality": quality_score(t),
            "fingerprint": document_fingerprint(t),
        }
    )


def vocab_frequencies(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    top_k: int = 200,
) -> DataFrame:
    """Corpus token-frequency table → (token, tf, df): the front end of
    BPE/vocab induction and the standard corpus-health report (a vocab
    whose head is boilerplate markup flags extraction bugs before any
    training run).

    Tokens are lowercased whitespace words; ``tf`` is total occurrences,
    ``df`` the number of distinct documents containing the token. Top
    ``top_k`` by (tf desc, token asc) — a total order, so the cut is
    deterministic on both engines.

    Scale shape: explode → groupBy(token) is the canonical map-side-
    combine aggregation (partial counts before the shuffle); the df
    count shuffles distinct (token, id) pairs — narrow rows, never text.
    The final top-k is a TakeOrderedAndProject over the aggregated vocab
    (vocab cardinality, not corpus cardinality). Null texts explode to
    zero rows; empty strings are filtered before grouping.
    """
    toks = (
        spread_small_input(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct(F.col("__id")).alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(top_k)
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Lexical retrieval: BM25 top-k documents for a term query → (id,
    score) — the sparse half of a RAG stack next to the ANN tier, and the
    standard quality baseline any embedding retriever is judged against.

    Okapi BM25: Σ_t ln(1 + (N - df + .5)/(df + .5)) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), lowercased whitespace terms.

    Scale shape (r15): the document length is size() of the filtered
    token ARRAY — a pure projection, so neither dl nor the dl⋈tf join
    of the pre-r15 form exists; dl rides every exploded query-term row
    into the one (id, dl, term) exchange (a constant per doc — it
    changes no grouping), and corpus stats aggregate the projection
    without an explode. df derives from the tf table (one row per
    (doc, term) ⇒ COUNT(*) ≡ COUNT(DISTINCT doc)), so the corpus is
    tokenized TWICE (stats + query-term explode) instead of three
    times, with zero corpus-sized exchanges (r15 A/B: 1.11s → 0.80s at
    sf0.1, rows identical — the (id, term) full-vocab pre-aggregation
    variant measured SLOWER, 1.28s → 1.52s: a vocab-sized hash build
    costs more than the cheap re-scan it saves). df and corpus stats
    broadcast back; the cut is TakeOrderedAndProject. Scores round to
    6 dp and the ordering ties break on (rounded score, id) so the
    top-k CUT is deterministic cross-engine — ordering by the raw
    float would let a 1-ulp sum difference swap documents across the
    boundary.
    """
    if not query_terms:
        raise ValueError("bm25_topk: empty query")
    terms = sorted({t.lower() for t in query_terms})
    base = spread_small_input(df).select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), "\\s+"),
            lambda x: x != "",
        ).alias("__toks"),
    )
    dl = base.select("__id", F.size("__toks").alias("dl")).filter(
        F.col("dl") > 0
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qt = base.select(
        "__id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = qt.groupBy("__id", "dl", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    return (
        scored.select(F.col("__id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


def lm_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Statistical-LM quality scoring: train an add-α-smoothed bigram
    model on the corpus itself, then score every document by mean
    negative log-likelihood → (id, n_bigrams, avg_nll). The classic
    perplexity-proxy quality gate (CCNet/Gopher-style): boilerplate and
    head-distribution text scores low, lexical garbage scores high —
    threshold or bucket ``avg_nll`` to route documents.

    p(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V), with c(w1·) the bigram-
    context count and V the corpus unigram vocabulary. Documents with
    fewer than 2 tokens have no bigrams and are omitted.

    Scale shape: the corpus is tokenized exactly ONCE. The posexplode
    keeps doc-final tokens as (w1, w2=NULL) rows instead of filtering
    them out, so the unigram vocabulary V is COUNT(DISTINCT w1) over the
    vocab-sized pair-count table — every corpus token appears as w1 at
    its own position, which removes the separate corpus-wide vocabulary
    pass the pre-r15 form paid (r15 A/B: 1.58s → 1.24s at sf0.1). The
    pair stream collapses to per-doc pair counts behind a single
    (id, w1, w2) exchange; every downstream consumer (the global c2
    table, the c1 context table derived from c2 by summing over w2, the
    vocabulary count, and the scoring join) hangs off that one exchange,
    so Spark plans a ReusedExchange instead of re-tokenizing (the
    self-join-replans-upstream trap, see dedup.minhash_lsh_candidates).
    Count tables are vocab-sized; the scoring joins carry narrow
    token-pair rows, never text; AQE broadcasts the count sides when the
    vocab is small. Token arrays materialize once per document
    (posexplode + element_at — never a split() inside a HOF lambda, the
    interpreted O(words²) trap).

    Determinism: each bigram's nll rounds to 6 dp then scales to integer
    micro-nats; per-doc aggregation SUMS LONGS (order-independent —
    float addition order cannot differ cross-engine), and only the final
    mean divides back to double. The NULL-w2 rows change no count: c2/c1
    and the scoring join filter them out, and V counts distinct w1 only.
    (A vocab-sized (w1,w2)→nll rate table broadcast-joined to db instead
    of the 3-join chain measured SLOWER both pre-r15 [3.48s vs 2.14s,
    round-7 probe] and on this one-pass layout [1.38s vs 1.18s, r15] —
    the rate subtree breaks the AQE broadcast shape; keep db⋈c2⋈c1.)
    """
    base = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        ).alias("__toks"),
    )
    ex = base.select(
        F.col(id_col), "__toks", F.posexplode("__toks").alias("__i", "w1")
    ).select(
        F.col(id_col),
        "w1",
        F.when(
            F.col("__i") < F.size("__toks") - 1,
            F.element_at("__toks", F.col("__i") + F.lit(2)),
        ).alias("w2"),
    )
    # per-doc pair counts (incl. the NULL-w2 doc-final rows): the ONE
    # corpus-sized exchange — c2, c1, V and the scoring join all reuse it.
    dbp = ex.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("__tfd"))
    c2p = dbp.groupBy("w1", "w2").agg(F.sum("__tfd").alias("__c2"))
    # corpus unigram vocabulary: every token is some row's w1, so V is a
    # distinct count over the VOCAB-sized c2p — no extra corpus pass.
    vocab = c2p.agg(F.count_distinct("w1").alias("__V"))
    db = dbp.filter(F.col("w2").isNotNull())
    c2 = c2p.filter(F.col("w2").isNotNull())
    # context count c(w1·) ≡ Σ_w2 c(w1,w2): derived from the vocab-sized
    # c2, never from another corpus pass.
    c1 = c2.groupBy("w1").agg(F.sum("__c2").alias("__c1"))
    a = F.lit(float(alpha))
    nll = -F.log(
        (F.col("__c2") + a) / (F.col("__c1") + a * F.col("__V"))
    )
    micro = F.round(F.round(nll, 6) * 1e6, 0).cast("long")
    return (
        db.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("__tfd"),
            (F.col("__tfd") * micro).alias("__micro"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__tfd").alias("n_bigrams"),
            F.sum("__micro").alias("__s"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            F.round(
                F.col("__s") / (F.col("n_bigrams") * F.lit(1e6)), 6
            ).alias("avg_nll"),
        )
    )


def quality_gate(text: Column) -> Column:
    """Ordered C4/Gopher-style keep/drop verdict → struct(keep boolean,
    reason string): the first failed rule names the drop reason
    ('short' | 'long' | 'punct' | 'stopword' | 'repetition'), else
    'ok'. One scan-speed projection composing the length band, punct
    ratio, stopword floor and Gopher dup-line/word caps — the gate
    stage of a curation pipeline as a single auditable column (the
    reason histogram IS the curation report). Rule order is part of the
    contract: a doc failing several rules reports the FIRST, so reason
    counts are stable as thresholds move."""
    n_tok = token_count(text)
    dup_lines, dup_words = repetition_stats(text)
    reason = (
        F.when(n_tok < 10, "short")
        .when(n_tok > 10000, "long")
        .when(punct_ratio(text) >= 0.1, "punct")
        .when(stopword_ratio(text, EN_STOPWORDS) <= 0.01, "stopword")
        .when((dup_lines >= 0.3) | (dup_words >= 0.3), "repetition")
        .otherwise("ok")
    )
    return F.struct(
        (reason == "ok").alias("keep"), reason.alias("reason")
    )


def char_entropy(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon character entropy → (id, n_chars, entropy)
    in nats: H = -Σ_c p_c·ln p_c over the raw character distribution.
    The compression-proxy quality signal — lexical garbage and
    single-char spam sit at the extremes (high ≈ uniform bytes,
    near-zero ≈ one repeated character); natural text occupies a stable
    band, so both tails are drop candidates.

    Scale shape: the char explode is the honest cost of the metric
    (n_chars rows, narrow), collapsed immediately by a map-side-combined
    (id, char) count; per-doc totals come from a window over the
    CHARACTER-CLASS rows (≤ alphabet-size rows per doc, not n_chars).
    Determinism: each class's -p·ln p rounds to 9 dp then sums as
    integer nano-nats (order-exact cross-engine); empty/null texts are
    omitted (no characters → no distribution).
    """
    from pyspark.sql import Window

    counts = (
        spread_small_input(df)
        .select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "")).alias("__c"),
        )
        .groupBy(id_col, "__c")
        .agg(F.count("*").alias("__cnt"))
    )
    w = Window.partitionBy(id_col)
    p = F.col("__cnt") / F.sum("__cnt").over(w)
    nano = F.round(F.round(-p * F.log(p), 9) * 1e9, 0).cast("long")
    return (
        counts.select(
            F.col(id_col),
            F.col("__cnt"),
            nano.alias("__nano"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_chars"),
            F.round(F.sum("__nano") / F.lit(1e9), 6).alias("entropy"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` keywords by smoothed TF-IDF — the standard
    unsupervised tagger (index summaries, dedup-cluster labels, topic
    drift probes). Same lowercased-whitespace tokens as
    ``vocab_frequencies``; idf = ln((N+1)/(df+1)) + 1 (sklearn's
    smoothing — never negative, never divides by zero), score rounded
    to 6 dp, deterministic (score desc, token) cut per document.

    Scale shape: explode → (doc, token) map-side-combined counts; the
    document-frequency table derives from THOSE counts (already
    distinct doc-token pairs — no second pass over text); the tf×idf
    join shuffles on token (vocabulary-sized rows; deliberately NOT a
    broadcast — a web-scale vocab is GBs), the corpus size enters as a
    broadcast 1-row aggregate, and the per-doc top-k is a window over
    (doc, token) rows, never text."""
    toks = (
        spread_small_input(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("__dft"))
    n_docs = df.agg(F.count("*").alias("__nd"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "token", "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__nd") + 1)
                        / (F.col("__dft") + 1).cast("double")
                    )
                    + 1
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "score", "rank")
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 3
) -> DataFrame:
    """First-occurrence n-gram novelty: for every document, the fraction
    of its distinct k-word shingles whose FIRST corpus occurrence (min
    ``id_col`` — any total order works; ingestion ids make it temporal)
    is this document. The dataset-curation signal between exact dedup
    and near-dedup: boilerplate-heavy or templated documents score near
    0 (everything they say was said before), genuinely new material
    scores near 1 — threshold ``novel_frac`` to debias a crawl toward
    fresh content, or trend it over ingestion batches to detect a source
    going stale.

    Scale shape: distinct (doc, shingle) pairs off one scan (tokens
    materialized once — never split() inside a HOF lambda); the
    first-occurrence table is a shingle-keyed MIN aggregation with full
    map-side combine; attributing pairs back is one shingle-keyed join
    deliberately NOT broadcast (the shingle table scales with corpus
    content — same reasoning as TF-IDF's vocab join, T71); the per-doc
    collapse is doc-sized. Hot shingles ("the end of") spread like any
    aggregation key — MIN partial-combines, and the join fans a hot
    shingle's row out to its occurrences, which is output-volume, not
    skew amplification. Crucially, AQE REUSES the pairs exchange for
    both the aggregation and the join probe, so shingling (the dominant
    CPU) runs ONCE.

    Two rewrites were measured and REJECTED (round-8 interleaved A/B at
    sf0.1, cached corpus, warm median-of-3 — SCALE.md): (a) dissolving
    the join via doc-local size() + a count over the firsts winners —
    2.6s vs 1.0s (the two consumers share no exchange, so shingling runs
    twice and dwarfs the join it saves); (b) a forced repartition("__s")
    feeding both aggregations join-free — 3.5s (the raw-pair exchange
    costs more than the join it replaces). The join formulation also
    scales: 1.39s at 8× data (1.3×; the round-7 probe's 2.5× was
    scan-inclusive — the plan's own growth is output volume).

    Output: (id, n_shingles, n_novel, novel_frac 6dp).
    """
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        shingles_from_tokens,
        word_tokens,
    )

    toks = df.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    )
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("__toks"), k))
        ).alias("__s"),
    )
    firsts = pairs.groupBy("__s").agg(F.min(id_col).alias("__first"))
    novel = (F.col("__first") == F.col(id_col)).cast("int")
    return (
        pairs.join(firsts, "__s")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            ).alias("novel_frac"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-K bigram collocations by pointwise mutual information —
    corpus-level association mining (Church & Hanks 1990): which word
    pairs co-occur far above chance. The vocabulary-building companion
    to BPE (multi-word expressions worth a single token) and a cheap
    domain fingerprint for corpus comparison.

    PMI = ln(p(w1,w2) / (p(w1)·p(w2))) computed as
    ln(c2·T² / (B·c1(w1)·c1(w2))) — one double expression over EXACT
    integer counts (ln is the only libm call; rounded to 6 dp, the same
    cross-engine discipline as the bigram-LM nll). ``min_count`` floors
    the bigram count (PMI is notoriously singleton-biased — a pair seen
    once between two hapaxes maxes the statistic); ties break on
    (pmi desc, w1, w2) so the top-K cut is total.

    Scale shape: the same two tokenizations as the bigram LM (unigram
    counts + bigram counts, both map-side-combined token exchanges);
    the count-attach joins carry vocabulary rows, never text; the final
    top-K is a TakeOrdered over the floored bigram table.
    """
    base = df.select(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        ).alias("__toks")
    )
    uni = (
        base.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    tot = uni.agg(
        F.sum("__c1").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    bi_all = (
        base.select(
            "__toks", F.posexplode("__toks").alias("__i", "w1")
        )
        .filter(F.col("__i") < F.size("__toks") - 1)
        .select(
            "w1",
            F.element_at("__toks", F.col("__i") + F.lit(2)).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c2"))
    )
    # B must be the UNFILTERED bigram total: p(w1,w2) = c2/B is a corpus
    # probability, so the min_count floor (an output filter) must not
    # shrink its denominator — otherwise every PMI is uniformly inflated
    # by ln(B_all/B_filtered) vs the Church & Hanks definition.
    btot = bi_all.agg(F.sum("__c2").alias("__B"))
    bi = bi_all.filter(F.col("__c2") >= min_count)
    joined = (
        bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("__c1", "__ca"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("__c1", "__cb"), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    ratio = (
        F.col("__c2").cast("double")
        * F.col("__T").cast("double")
        * F.col("__T").cast("double")
        / (
            F.col("__B").cast("double")
            * F.col("__ca").cast("double")
            * F.col("__cb").cast("double")
        )
    )
    return (
        joined.select(
            "w1",
            "w2",
            F.col("__c2").alias("n"),
            F.round(F.log(ratio), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
    )


def sentence_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-document sentence segmentation statistics: sentence count,
    mean sentence length in whitespace tokens (6 dp), and the longest
    sentence's token count — the document-structure profile the
    chunking tier (``chunk_documents`` splits by token budget) is blind
    to: a 4000-token doc of 12-token sentences and one of three
    run-on sentences chunk identically but train very differently.

    Segmentation is the deterministic regex convention shared by both
    engines: split on one-or-more terminators ([.!?]) plus following
    whitespace; empty segments (leading/trailing/consecutive
    terminators) are not sentences. Token counts split the same \\s+
    way as every text operator here. All per-sentence work happens
    JVM-side on the exploded segment array in one scan-speed
    projection + one doc-keyed map-side aggregation.

    Output: (id, n_sentences, mean_sentence_tokens, max_sentence_tokens);
    docs with NULL/empty text or no terminator content emit n=0 rows
    with NULL means. Engine addition.
    """
    segs = df.select(
        F.col(id_col),
        F.expr(
            f"filter(transform(split(coalesce({text_col}, ''),"
            " '[.!?]+\\\\s*'), s -> trim(s)), s -> s <> '')"
        ).alias("__segs"),
    )
    toks = segs.select(
        id_col,
        F.expr(
            "transform(__segs, s -> size(filter(split(s, '\\\\s+'),"
            " t -> t <> '')))"
        ).alias("__n"),
    )
    n = F.size("__n")
    total = F.expr("aggregate(__n, 0L, (acc, x) -> acc + x)")
    return toks.select(
        id_col,
        n.cast("bigint").alias("n_sentences"),
        F.when(
            n > 0, F.round(total.cast("double") / n.cast("double"), 6)
        ).alias("mean_sentence_tokens"),
        F.when(n > 0, F.expr("array_max(__n)").cast("bigint")).alias(
            "max_sentence_tokens"
        ),
    )


CODE_KEYWORDS = [
    "def", "class", "return", "import", "void", "int", "function",
    "var", "const", "if", "else", "for", "while",
]


def code_detect(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    symbol_threshold: float = 0.05,
    min_keyword_hits: int = 2,
) -> DataFrame:
    """Code-vs-prose heuristic per document — the filter a text-corpus
    build runs to route source code OUT of the prose mixture (or into a
    code lane): symbol-character ratio, indented-line count and
    programming-keyword hits, combined into an ``is_code`` flag. All
    scan-speed JVM expressions (regexp counts over one projection); the
    flag is a coarse router, not a classifier — route-then-verify, like
    the CC4 manual-review pattern.

    is_code = symbol_ratio > ``symbol_threshold`` OR
    (keyword_hits ≥ ``min_keyword_hits`` AND indent_lines ≥ 1).
    Ratios round to 6 dp; NULL text scores 0 everywhere, not-code.

    Output: (id, symbol_ratio, indent_lines, keyword_hits, is_code).
    Engine addition; no reference counterpart.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_sym = n_chars - F.length(
        F.regexp_replace(t, "[{}();=<>\\[\\]]", "")
    )
    indent = F.size(
        F.filter(
            F.split(t, "\n"),
            lambda ln: ln.rlike("^(  +|\\t)"),
        )
    )
    kw = "|".join(CODE_KEYWORDS)
    hits = F.size(
        F.filter(
            F.split(F.lower(t), "\\s+"),
            lambda w: w.rlike(f"^({kw})$"),
        )
    )
    ratio = F.when(
        n_chars > 0,
        F.round(n_sym.cast("double") / n_chars.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        ratio.alias("symbol_ratio"),
        indent.cast("bigint").alias("indent_lines"),
        hits.cast("bigint").alias("keyword_hits"),
        (
            (ratio > symbol_threshold)
            | (
                (hits >= min_keyword_hits)
                & (indent >= 1)
            )
        ).alias("is_code"),
    )


LN2 = 0.6931471805599453  # shared literal — both engines use the same constant


def corpus_js_divergence(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence of each group's token unigram
    distribution vs the REST of the corpus — the composition-drift audit
    (which source/shard/day reads "different"?) that PSI/KS cover for
    numeric columns but not for open-vocabulary text. JSD(P‖Q) =
    ½Σp·ln(p/m) + ½Σq·ln(q/m), m=(p+q)/2, in nats ∈ [0, ln2].

    Scale shape: ONE tokenize→explode pass → (group × token) counts
    (map-side combined; exchange bounded by group×vocab, never token
    occurrences), global token counts derived FROM that table (second
    small groupBy, no re-scan), totals broadcast. Tokens absent from a
    group contribute to the rest-side sum in closed form — each such
    token has p=0 so q·ln(q/m)=q·ln2, and their total mass is
    1 − Σ_{t∈group} q_t, an integer-exact ratio — so the per-token pass
    touches only tokens the group actually contains. Per-token terms
    pin to integer NANO-units before the keyed sum (order-independent,
    engine-exact; resolution 5e-10·vocab documented), count products
    evaluate as exact doubles below 2^53. Output: (group, n_tokens,
    n_rest_tokens, jsd) 6 dp, ordered by group; groups owning the whole
    corpus (empty rest) emit NULL jsd. Engine addition; no reference
    counterpart.
    """
    return jsd_from_token_counts(
        jsd_token_cells(df, group_col, text_col), group_col
    )


def jsd_token_cells(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-batch (group, token, cnt) unigram cells — the map half of the
    streaming JSD resident: token counts fold ADDITIVELY across
    micro-batches (append per-batch cells, sum per cell), and
    ``jsd_from_token_counts`` over the folded ledger equals the one-shot
    ``corpus_js_divergence`` — the psi/ks/kappa/cusum foreachBatch
    discipline (tests/test_streaming.py)."""
    # NULL group keys drop up front: the downstream join would push an
    # isnotnull(group) predicate into SOME branches of the shared count
    # lineage but not others, making the subplans non-identical and
    # defeating exchange reuse — the tokenize+explode would execute once
    # per branch instead of once (measured: 2x at 4 consumers).
    return (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def jsd_from_token_counts(cells: DataFrame, group_col: str) -> DataFrame:
    """JSD readout from a PRE-AGGREGATED (group, token, cnt) ledger —
    the streaming-foldable half of ``corpus_js_divergence`` (see its
    docstring for the math and scale shape). Re-aggregates per cell
    first, so an appended multi-batch ledger and a one-shot cell table
    read identically; the re-aggregation rides the cells' existing
    (group, token) hash partitioning — no extra exchange in the
    one-shot path."""
    cnt = (
        cells.select(
            F.col(group_col).alias("__g"),
            F.col("token").alias("__t"),
            F.col("cnt").cast("bigint").alias("__c"),
        )
        .groupBy("__g", "__t")
        .agg(F.sum("__c").cast("bigint").alias("__c"))
    )
    glob = cnt.groupBy("__t").agg(F.sum("__c").cast("bigint").alias("__gt"))
    per_g = cnt.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__tg"))
    total = cnt.agg(F.sum("__c").cast("bigint").alias("__tt"))
    j = (
        cnt.join(glob, "__t")
        .join(F.broadcast(per_g), "__g")
        .crossJoin(F.broadcast(total))
    )
    c = F.col("__c").cast("double")
    r = (F.col("__gt") - F.col("__c")).cast("double")
    ts_ = F.col("__tg").cast("double")
    rt = (F.col("__tt") - F.col("__tg")).cast("double")
    den = c * rt + r * ts_
    p = c / ts_
    # rt = 0 (group owns the whole corpus) zeroes every term and the
    # final jsd is NULL-guarded; ANSI mode makes the guard mandatory —
    # an unused q = r/0 branch would still throw.
    contrib = F.when(
        rt > 0,
        p * F.log(F.lit(2.0) * c * rt / den)
        + F.when(
            r > 0, (r / rt) * F.log(F.lit(2.0) * r * ts_ / den)
        ).otherwise(F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    pinned = F.round(contrib * F.lit(1e9)).cast("bigint")
    agg = j.groupBy("__g").agg(
        F.first("__tg").alias("n_tokens"),
        F.first(F.col("__tt") - F.col("__tg")).alias("n_rest_tokens"),
        F.sum(pinned).alias("__s1"),
        F.sum(F.col("__gt") - F.col("__c")).cast("bigint").alias("__rcov"),
    )
    miss = (
        F.col("n_rest_tokens") - F.col("__rcov")
    ).cast("double") / F.col("n_rest_tokens").cast("double")
    jsd = F.when(
        F.col("n_rest_tokens") > 0,
        (
            F.col("__s1").cast("double") / F.lit(1e9)
            + F.lit(LN2) * miss
        )
        / F.lit(2.0),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_rest_tokens").cast("bigint").alias("n_rest_tokens"),
        F.round(jsd, 6).alias("jsd"),
    ).orderBy(group_col)


def oov_rate(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    vocab_size: int = 256,
) -> DataFrame:
    """Tokenizer-coverage audit: each group's out-of-vocabulary token
    rate against the corpus' own top-``vocab_size`` vocabulary — the
    "which shard will this tokenizer serve worst" readout run before
    committing a vocab (new sources/languages surface as OOV spikes
    long before perplexity does).

    The vocabulary is DERIVED, deterministic, and driver-bounded: top-V
    global tokens by (count desc, token asc) — a total order, so the
    cut is stable — taken with sort+limit (TakeOrderedAndProject) and
    broadcast back. One tokenize→explode feeds both the (group × token)
    counts and, via the reused exchange, the global counts (the
    corpus_js_divergence lineage discipline — NULL groups drop up
    front). OOV mass is integer counts end to end; the rate is one
    exact division, 6 dp. Output per group: (n_tokens, n_oov_tokens,
    oov_rate, n_distinct_oov), ordered by group. Engine addition; no
    reference counterpart.
    """
    toks = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    cnt = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    vocab = (
        cnt.groupBy("__t")
        .agg(F.sum("__c").cast("bigint").alias("__gt"))
        .orderBy(F.col("__gt").desc(), F.col("__t").asc())
        .limit(int(vocab_size))
        .select("__t", F.lit(1).alias("__iv"))
    )
    j = cnt.join(F.broadcast(vocab), "__t", "left")
    agg = j.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("__iv").isNull(), F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_oov_tokens"),
        F.sum(F.when(F.col("__iv").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_distinct_oov"),
    )
    rate = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.col("n_oov_tokens").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_tokens",
        "n_oov_tokens",
        rate.alias("oov_rate"),
        "n_distinct_oov",
    ).orderBy(group_col)


def zipf_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """Zipf-law fit per group: OLS slope of ln(frequency) on ln(rank)
    over the top-``top_n`` tokens — natural language sits near slope
    ≈ −1; templated/boilerplate shards flatten, ID-soup shards steepen.
    The corpus-LAW companion to pf_tail_index (which fits value tails;
    this fits the rank law itself).

    Determinism: ranks come from the total (count desc, token asc)
    order; ln(rank) and ln(count) pin to integer MICRO-units per ranked
    token BEFORE the OLS sums, so Σx, Σy, Σxy, Σx² aggregate as exact
    64-bit integers (products of micro-pinned logs stay well inside
    2^53 — the pinning scale is chosen for that) and the slope/r²
    derive in a fixed double order. One tokenize→count pass; the
    rank cut is a per-group window top-N (WindowGroupLimit), so the
    fit table is group×top_n-bounded. Groups with fewer than 3 ranked
    tokens emit NULL slope. Output: (group, n_ranked, slope, r2) 6 dp,
    ordered. Engine addition; no reference counterpart.
    """
    toks = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    cnt = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("__c").desc(), F.col("__t").asc()
    )
    ranked = cnt.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= top_n
    )
    x = F.round(F.log(F.col("__r").cast("double")) * F.lit(1e6)).cast(
        "bigint"
    )
    y = F.round(F.log(F.col("__c").cast("double")) * F.lit(1e6)).cast(
        "bigint"
    )
    pts = ranked.select("__g", x.alias("__x"), y.alias("__y"))
    agg = pts.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        F.sum("__x").cast("bigint").alias("__sx"),
        F.sum("__y").cast("bigint").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("bigint").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("bigint").alias("__syy"),
    )
    nD = F.col("n_ranked").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    den = nD * sxx - sx * sx
    slope = (nD * sxy - sx * sy) / den
    r2_den = (nD * sxx - sx * sx) * (nD * syy - sy * sy)
    r2 = F.when(
        r2_den > 0,
        (nD * sxy - sx * sy) * (nD * sxy - sx * sy) / r2_den,
    )
    ok = (F.col("n_ranked") >= 3) & (den > 0)
    return agg.select(
        F.col("__g").alias(group_col),
        "n_ranked",
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round(r2, 6)).alias("r2"),
    ).orderBy(group_col)


def boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """C4-style span-level boilerplate audit: split every document into
    NON-OVERLAPPING ``k``-token spans, flag spans appearing in ≥
    ``min_docs`` distinct documents CORPUS-WIDE as boilerplate (the
    headers/footers/navigation chrome a web-crawl curation pass strips
    before training — C4 removed repeated three-sentence spans; token
    spans are the tokenizer-neutral form; chrome is typically shared
    ACROSS sites, so document frequency is global), and report the
    boilerplate mass per ``group_col`` (source/domain).

    Output one row per group: (group, n_docs, n_span_instances,
    n_distinct_spans, n_boiler_spans, boiler_instances, affected_docs,
    boiler_ratio 6dp). ``n_docs`` counts documents contributing ≥ 1
    span (docs shorter than ``k`` tokens contribute none); the tail
    < k tokens of each document is dropped (deterministic, mirrored by
    the oracle); ``n_distinct_spans``/``n_boiler_spans`` count the
    spans OCCURRING in the group (a span shared by two groups counts
    in both).

    Scale shape — single lineage, no self-joins: tokens materialize
    once (the interpreted-HOF discipline), spans explode to md5 digests
    (16-byte shuffle keys, never span text), one (span, doc) pre-
    aggregation with map-side combine, the global span document-
    frequency rides a window over that same span exchange, the
    per-group first-occurrence marker one (group, span) window more,
    and one group-cardinality aggregation reads everything off. A
    per-span join formulation would reference the exploded corpus
    twice; groupBy-derived frames never fire exchange reuse (SCALE.md).
    """
    toks = (
        spread_small_input(
            df.filter(F.col(text_col).isNotNull()).select(
                F.col(id_col).alias("__id"),
                F.col(group_col).alias("__grp"),
                F.col(text_col).alias("__text"),
            )
        )
        .select("__id", "__grp", tokens(F.col("__text")).alias("__toks"))
        .filter(F.size("__toks") >= k)
    )
    spans = toks.select(
        "__id",
        "__grp",
        F.explode(
            F.expr(
                f"transform(sequence(0, int(size(__toks) div {k}) - 1),"
                f" i -> md5(array_join(slice(__toks, i * {k} + 1, {k}),"
                f" ' ')))"
            )
        ).alias("__sp"),
    )
    # a doc has exactly one group, so (span, doc) determines __grp and
    # the pre-aggregation leaves one row per (span, doc)
    pds = spans.groupBy("__sp", "__id", "__grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w = Window.partitionBy("__sp")  # GLOBAL document frequency
    wr = Window.partitionBy("__grp", "__sp").orderBy("__id")
    flagged = pds.withColumn("__ndocs", F.count(F.lit(1)).over(w)).withColumn(
        "__rn", F.row_number().over(wr)
    )
    is_boiler = F.col("__ndocs") >= min_docs
    first_of_span = F.col("__rn") == 1
    agg = flagged.groupBy("__grp").agg(
        F.countDistinct("__id").cast("bigint").alias("n_docs"),
        F.sum("__c").cast("bigint").alias("n_span_instances"),
        F.sum(F.when(first_of_span, 1).otherwise(0))
        .cast("bigint")
        .alias("n_distinct_spans"),
        F.sum(F.when(first_of_span & is_boiler, 1).otherwise(0))
        .cast("bigint")
        .alias("n_boiler_spans"),
        F.sum(F.when(is_boiler, F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("boiler_instances"),
        F.countDistinct(F.when(is_boiler, F.col("__id")))
        .cast("bigint")
        .alias("affected_docs"),
    )
    ratio = F.when(
        F.col("n_span_instances") > 0,
        F.round(
            F.col("boiler_instances").cast("double")
            / F.col("n_span_instances").cast("double"),
            6,
        ),
    )
    return agg.select(
        F.col("__grp").alias(group_col),
        "n_docs",
        "n_span_instances",
        "n_distinct_spans",
        "n_boiler_spans",
        "boiler_instances",
        "affected_docs",
        ratio.alias("boiler_ratio"),
    ).orderBy(group_col)


def lexical_diversity(
    df: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group lexical diversity: type-token ratio and hapax share —
    the vocabulary-health readout next to the frequency views (tx_vocab
    ranks tokens, tx_oov scores against a reference, tx_zipf fits the
    law; this says how REPETITIVE each source's language is — synthetic
    or templated text collapses TTR long before a human reads it).

    Output per group: (group, n_tokens, n_types, ttr 6dp,
    hapax_types, hapax_ratio 6dp = hapax_types / n_types). Tokens
    case-fold (a capitalized sentence-starter is not a new type).

    Shape: one tokenize + explode pass → one (group, token)
    pre-aggregation with map-side combine (the exchange carries
    distinct types per group, not token instances) → one
    group-cardinality readout. Join-free single lineage.
    """
    toks = (
        spread_small_input(
            df.filter(F.col(text_col).isNotNull()).select(
                F.col(group_col).alias("__grp"),
                F.col(text_col).alias("__text"),
            )
        )
        .select(
            "__grp",
            F.explode(tokens(F.lower(F.col("__text")))).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
    )
    per_type = toks.groupBy("__grp", "__tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("__tf")
    )
    agg = per_type.groupBy(F.col("__grp").alias(group_col)).agg(
        F.sum("__tf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("__tf") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_types"),
    )
    ttr = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ),
    )
    hapax = F.when(
        F.col("n_types") > 0,
        F.round(
            F.col("hapax_types").cast("double")
            / F.col("n_types").cast("double"),
            6,
        ),
    )
    return agg.select(
        group_col,
        "n_tokens",
        "n_types",
        ttr.alias("ttr"),
        "hapax_types",
        hapax.alias("hapax_ratio"),
    ).orderBy(group_col)


def format_markers(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Instruction/chat-format audit per group — the pre-training vs
    post-training routing readout: how much of each source already
    carries Q&A scaffolding ("Q:"/"A:" lines), chat role tags
    (USER:/ASSISTANT:/SYSTEM: or <|...|> special tokens), fenced code
    blocks (```), or markdown headings (# ...). Formatted text leaking
    into a pre-training mix teaches the base model to emit scaffolding;
    unformatted text in an SFT mix dilutes the signal — either way the
    mix needs this census before the split.

    Pure scan-speed JVM regex flags (one boolean per marker family per
    doc) summed per group; NULL texts count in ``n_docs`` only. Output:
    (group, n_docs, qa_docs, chat_docs, code_fence_docs, heading_docs,
    any_marker_docs, any_marker_ppm) with ppm = 1e6·any div n_docs,
    integer-exact, ordered by group.
    """
    qa = F.col(text_col).rlike(r"(?m)^\s*[QA]\s*:")
    chat = F.col(text_col).rlike(
        r"(?m)(^\s*(USER|ASSISTANT|SYSTEM)\s*:)|(<\|[a-z_]+\|>)"
    )
    fence = F.col(text_col).rlike("```")
    heading = F.col(text_col).rlike(r"(?m)^#{1,6} ")
    flags = df.select(
        F.col(group_col).alias("grp"),
        qa.cast("int").alias("__qa"),
        chat.cast("int").alias("__chat"),
        fence.cast("int").alias("__fence"),
        heading.cast("int").alias("__head"),
    ).withColumn(
        "__any",
        F.greatest("__qa", "__chat", "__fence", "__head"),
    )
    return (
        flags.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("__qa"), F.lit(0))
            .cast("bigint")
            .alias("qa_docs"),
            F.coalesce(F.sum("__chat"), F.lit(0))
            .cast("bigint")
            .alias("chat_docs"),
            F.coalesce(F.sum("__fence"), F.lit(0))
            .cast("bigint")
            .alias("code_fence_docs"),
            F.coalesce(F.sum("__head"), F.lit(0))
            .cast("bigint")
            .alias("heading_docs"),
            F.coalesce(F.sum("__any"), F.lit(0))
            .cast("bigint")
            .alias("any_marker_docs"),
        )
        .withColumn(
            "any_marker_ppm",
            F.expr(
                "CAST(1000000 * any_marker_docs div n_docs AS BIGINT)"
            ),
        )
        .orderBy("grp")
    )


def readability_profile(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group readability profile — Flesch-style reading-ease signal
    for corpus routing (children's-book prose and legal boilerplate both
    pass length filters; reading-ease separates them). Counts are the
    classic public heuristics: words = ``[A-Za-z0-9']+`` runs, sentences
    = ``[.!?]+`` runs floored at 1 per doc, syllables ≈ vowel-group runs
    (``[aeiouy]+`` over the lowercased text) — all scan-speed JVM regex,
    no tokenizer state. Published in exact integer millis so the DuckDB
    twin agrees bit-for-bit: wps_milli = 1000·words // sentences over
    the GROUP totals (not a mean of per-doc ratios — totals are the
    length-unbiased estimator), spw_milli likewise, and flesch_milli =
    206835 − 1015·wps_milli//1000 − 84600·spw_milli//1000 (the
    Flesch 206.835/1.015/84.6 constants in millis). NULL/empty/wordless
    docs are excluded by contract. One group-keyed aggregation is the
    only exchange.
    """
    t = F.col(text_col)
    per = (
        docs.filter(t.isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.regexp_count(t, F.lit(r"[A-Za-z0-9']+")).alias("w"),
            F.greatest(
                F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
            ).alias("s"),
            F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).alias("y"),
        )
        .filter(F.col("w") > 0)
    )
    return (
        per.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("s").cast("bigint").alias("n_sentences"),
            F.sum("y").cast("bigint").alias("n_syllables"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.expr(
                "CAST(1000 * n_words div n_sentences AS BIGINT)"
            ).alias("wps_milli"),
            F.expr(
                "CAST(1000 * n_syllables div n_words AS BIGINT)"
            ).alias("spw_milli"),
        )
        .withColumn(
            "flesch_milli",
            F.expr(
                "CAST(206835 - (1015 * wps_milli) div 1000 "
                "- (84600 * spw_milli) div 1000 AS BIGINT)"
            ),
        )
        .orderBy(group_col)
    )


def line_boilerplate_census(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    source_col: str = "source",
    min_df: int = 10,
) -> DataFrame:
    """C4-style LINE-level boilerplate census — the line-grain sibling
    of the token-window span auditor (T154): C4's cleaning famously
    dedups at the line level because nav menus, cookie banners and
    copyright footers repeat VERBATIM as lines across pages while
    never forming long shared token windows inside prose. A line
    (split on \\n, trimmed, empties dropped) is boilerplate when it
    appears in ≥ ``min_df`` distinct documents; the census reports,
    per source, the line mass that rule would remove — the
    measurement a cleaning pass reads before rewriting a corpus.

    Scale shape: one explode to (doc, source, line-md5) — 16-byte
    digests, never line text, cross the wire — then a digest-keyed
    census (line-vocab-bounded exchange) whose ≥min_df survivors join
    back onto the line stream (boilerplate vocab ≤ total_lines/min_df
    by definition), and one source-bounded reduce. Output: (source,
    n_lines, n_boiler_lines, boiler_ppm, n_distinct_boiler), ordered
    by source.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2: {min_df}")
    lines = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(source_col).alias("__src"),
            F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
        )
        .select(
            "__id",
            "__src",
            F.md5(F.trim(F.col("__line"))).alias("__lh"),
            F.trim(F.col("__line")).alias("__lt"),
        )
        .filter(F.col("__lt") != "")
        .drop("__lt")
    )
    census = (
        lines.groupBy("__lh")
        .agg(F.countDistinct("__id").alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("__lh", F.lit(1).alias("__boiler"))
    )
    lab = lines.join(census, ["__lh"], "left")
    return (
        lab.groupBy(F.col("__src").alias(source_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.coalesce(F.sum("__boiler"), F.lit(0))
            .cast("bigint")
            .alias("n_boiler_lines"),
            F.countDistinct(
                F.when(F.col("__boiler") == 1, F.col("__lh"))
            )
            .cast("bigint")
            .alias("n_distinct_boiler"),
        )
        .select(
            source_col,
            "n_lines",
            "n_boiler_lines",
            F.expr(
                "CAST((1000000 * n_boiler_lines) div n_lines AS BIGINT)"
            ).alias("boiler_ppm"),
            "n_distinct_boiler",
        )
        .orderBy(source_col)
    )


def ltr_features(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    pool_k: int = 25,
) -> DataFrame:
    """Learning-to-rank FEATURE EXTRACTION over the BM25 candidate pool
    — the table a reranker trains/scoreses on: retrieval stacks don't
    feed raw text to the ranker, they feed per-(query, doc) features,
    and this emits the classic lexical set per pooled candidate: the
    6-dp BM25 score itself, doc length, total and max query-term tf,
    matched-term count, integer-ppm query coverage, and the matched
    idf mass (6 dp). Same tokenizer/scoring expressions as
    ``bm25_topk`` (the oracle shares its CTE text), same deterministic
    (score desc, id) pool cut.

    Scale shape: identical to the T30 retrieval pass — the tf exchange
    carries only query-term rows, df/stats broadcast back, the pool
    cut is rank-bounded; the feature aggregates ride the SAME per-doc
    groupBy that computes the score, so features are free at the
    margin. Output: (doc_id, rank, bm25, dl, tf_sum, max_tf,
    n_terms_matched, coverage_ppm, idf_sum), rank ascending.
    """
    if not query_terms:
        raise ValueError("ltr_features: empty query")
    terms = sorted({t.lower() for t in query_terms})
    n_q = len(terms)
    toks = (
        spread_small_input(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dl = toks.groupBy("__id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtoks = toks.filter(F.col("term").isin(terms))
    df_t = qtoks.groupBy("term").agg(
        F.count_distinct("__id").alias("df")
    )
    tf = qtoks.groupBy("__id", "term").agg(F.count("*").alias("tf"))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.max("dl").cast("bigint").alias("dl"),
            F.sum("tf").cast("bigint").alias("tf_sum"),
            F.max("tf").cast("bigint").alias("max_tf"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.round(F.sum(idf), 6).alias("idf_sum"),
        )
    )
    # pool cut FIRST via TakeOrderedAndProject (per-partition top-k +
    # tiny merge — never a global window over every matched doc), then
    # the rank window runs on pool_k rows only
    pool = scored.orderBy(F.col("bm25").desc(), F.col("__id")).limit(
        pool_k
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("__id"))
    return (
        pool.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            F.col("__id").alias(id_col),
            "rank",
            "bm25",
            "dl",
            "tf_sum",
            "max_tf",
            "n_terms_matched",
            F.expr(
                f"CAST((1000000 * n_terms_matched) div {n_q} AS BIGINT)"
            ).alias("coverage_ppm"),
            "idf_sum",
        )
        .orderBy("rank")
    )


GATE_SWEEP_THRESHOLDS = [0.0, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 1.0]


def gate_threshold_sweep(
    df: DataFrame,
    text_col: str = "text",
    thresholds: list[float] | None = None,
    min_tokens: int = 5,
) -> DataFrame:
    """Quality-gate OPERATING CURVE — the dd_lsh_tuner discipline
    applied to the heuristic filter: per candidate ``min_quality``
    threshold, how much corpus survives (docs, ppm, token mass). The
    before-you-commit readout for choosing a gate: a pretraining team
    picks the threshold off this curve instead of re-running the
    pipeline per guess. Same quality/length semantics as
    ``curate_corpus``'s gate (quality_score + min_tokens, NULL text
    passes no threshold).

    Scale shape: ONE text-feature scan reduced to (quality, length-ok)
    cells — quality_score takes ≤ 8 distinct values by construction,
    so the cell table is ≤ 16 rows — then the |thresholds|×cells cross
    join and the per-threshold reduce run on literals. The corpus is
    scanned once regardless of how many thresholds are swept.

    Output: (min_quality, n_total, n_kept, kept_ppm, kept_tokens),
    ordered by min_quality. Engine addition; no reference counterpart.
    """
    ths = thresholds if thresholds is not None else GATE_SWEEP_THRESHOLDS
    if not ths:
        raise ValueError("gate_threshold_sweep: no thresholds given")
    t = F.col(text_col)
    cells = (
        spread_small_input(df)
        .select(
            F.coalesce(quality_score(t), F.lit(-1.0)).alias("__q"),
            F.coalesce(token_count(t), F.lit(0)).alias("__nt"),
        )
        .select(
            "__q",
            (F.col("__nt") >= min_tokens).alias("__len_ok"),
            F.col("__nt"),
        )
        .groupBy("__q", "__len_ok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum("__nt").cast("bigint").alias("__tok"),
        )
    )
    spark = df.sparkSession
    ths_df = spark.createDataFrame(
        [(float(x),) for x in sorted(set(ths))], "min_quality double"
    )
    kept = (F.col("__q") >= F.col("min_quality")) & F.col("__len_ok")
    return (
        cells.crossJoin(F.broadcast(ths_df))
        .groupBy("min_quality")
        .agg(
            F.sum("__n").cast("bigint").alias("n_total"),
            F.coalesce(F.sum(F.when(kept, F.col("__n"))), F.lit(0))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("__tok"))), F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select(
            "min_quality",
            "n_total",
            "n_kept",
            F.expr("CAST((1000000 * n_kept) div n_total AS BIGINT)").alias(
                "kept_ppm"
            ),
            "kept_tokens",
        )
        .orderBy("min_quality")
    )


SCRIPT_MIX_PPM = 200_000


def script_mix_census(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    mix_ppm: int = SCRIPT_MIX_PPM,
) -> DataFrame:
    """Per-source Unicode SCRIPT-MIX census — the multilingual-corpus
    hygiene audit beside lang-id: per document, Latin / Cyrillic / Han
    letter counts (regex script classes, scan-speed JVM), the dominant
    script, whether the doc is MIXED (minor-script letters ≥ mix_ppm of
    all letters — code-switching, encoding damage, or boilerplate
    stitching), and the HOMOGLYPH flag (Latin-dominant text containing
    ANY Cyrillic — the classic spoofing/SEO-spam signature: visually
    identical 'а'/'е' smuggled into ASCII words defeats exact dedup and
    keyword filters, exactly what dedup_normalized(unicode=True) folds
    away).

    Engine-exactness: counts are integer regex-class lengths; the mix
    test is pure integer arithmetic (minor·1e6 ≥ mix_ppm·letters — no
    float ratio); the script classes are spelled \\p{IsX} (Java) /
    \\p{X} (RE2) for the SAME Unicode script property, so both engines
    classify identically. One scan, one sources-bounded aggregation.
    Output per source: (source, n_docs, n_latin_dom, n_cyrillic_dom,
    n_han_dom, n_noscript, n_mixed, mixed_ppm, n_homoglyph), ordered.
    Engine addition; no reference counterpart.
    """
    t = F.col(text_col)

    def script_count(cls: str) -> Column:
        return F.when(t.isNull(), F.lit(0)).otherwise(
            F.length(F.regexp_replace(t, f"[^\\p{{Is{cls}}}]", ""))
        ).cast("bigint")

    lat, cyr, han = (
        script_count("Latin"),
        script_count("Cyrillic"),
        script_count("Han"),
    )
    base = df.select(
        F.col(source_col).alias("source"),
        lat.alias("__lat"),
        cyr.alias("__cyr"),
        han.alias("__han"),
    ).select(
        "source",
        "__lat",
        "__cyr",
        "__han",
        (F.col("__lat") + F.col("__cyr") + F.col("__han")).alias("__all"),
        F.greatest("__lat", "__cyr", "__han").alias("__top"),
    )
    dom = (
        F.when(F.col("__all") == 0, F.lit("none"))
        .when(
            (F.col("__lat") >= F.col("__cyr"))
            & (F.col("__lat") >= F.col("__han")),
            F.lit("latin"),
        )
        .when(F.col("__cyr") >= F.col("__han"), F.lit("cyrillic"))
        .otherwise(F.lit("han"))
    )
    mixed = (F.col("__all") > 0) & (
        (F.col("__all") - F.col("__top")) * 1_000_000
        >= F.lit(mix_ppm) * F.col("__all")
    )
    lab = base.select(
        "source",
        dom.alias("__dom"),
        mixed.cast("int").alias("__mixed"),
        ((dom == "latin") & (F.col("__cyr") > 0))
        .cast("int")
        .alias("__homo"),
    )
    return (
        lab.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("__dom") == "latin").cast("int"))
            .cast("bigint")
            .alias("n_latin_dom"),
            F.sum((F.col("__dom") == "cyrillic").cast("int"))
            .cast("bigint")
            .alias("n_cyrillic_dom"),
            F.sum((F.col("__dom") == "han").cast("int"))
            .cast("bigint")
            .alias("n_han_dom"),
            F.sum((F.col("__dom") == "none").cast("int"))
            .cast("bigint")
            .alias("n_noscript"),
            F.sum("__mixed").cast("bigint").alias("n_mixed"),
            F.sum("__homo").cast("bigint").alias("n_homoglyph"),
        )
        .select(
            "source",
            "n_docs",
            "n_latin_dom",
            "n_cyrillic_dom",
            "n_han_dom",
            "n_noscript",
            "n_mixed",
            F.expr("CAST((1000000 * n_mixed) div n_docs AS BIGINT)").alias(
                "mixed_ppm"
            ),
            "n_homoglyph",
        )
        .orderBy("source")
    )


def template_census(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    source_col: str = "source",
    min_docs: int = 2,
) -> DataFrame:
    """Form-letter / TEMPLATE census: documents that are the same text
    with only numbers swapped (order confirmations, log lines, receipt
    spam — the near-dup class that floods a crawl corpus while evading
    exact dedup and sitting BELOW shingle-Jaccard thresholds when the
    numbers are dense). The mask canonicalizes case, collapses every
    digit run to '0' and every whitespace run to one space, then groups
    by the 16-byte digest of the masked text — dedup_normalized's
    machinery with a numeric mask instead of a punctuation strip.

    Scale shape: one scan-speed masking projection, one digest-keyed
    count exchange (16-byte keys, map-side combined), a broadcast-safe
    min-id exemplar pick inside the same aggregation. Output: one row
    per template with ≥ min_docs members — (template_digest, n_docs,
    n_sources, exemplar_id), ordered by (n_docs desc, template_digest)
    with a deterministic total order. Engine addition; no reference
    counterpart.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2: {min_docs}")
    return template_census_from_cells(
        template_cells(df, id_col, text_col, source_col),
        min_docs=min_docs,
    )


def template_cells(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-batch (template_digest, source, n, min_id) cells — the map
    half of the streaming template-census resident. The digest is a
    pure per-row function of the text (no cross-batch state), counts
    fold additively and min_id by min, so a foreachBatch ledger +
    ``template_census_from_cells`` ≡ the one-shot ``template_census``
    (which composes these same halves); batch≡stream pinned in
    tests/test_streaming.py."""
    masked = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[0-9]+", "0"),
        "\\s+",
        " ",
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(source_col).alias("__src"),
            F.md5(masked).alias("template_digest"),
        )
        .groupBy("template_digest", "__src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__id").alias("min_id"),
        )
    )


def template_census_from_cells(
    cells: DataFrame, min_docs: int = 2
) -> DataFrame:
    """Template-census readout from a PRE-AGGREGATED (digest, source,
    n, min_id) ledger: re-collapse the append ledger (counts sum,
    min_id by min), then per digest n_docs = Σn, n_sources = the
    non-null distinct sources (the (digest, source) grain makes that a
    plain count), exemplar = global min id — keeping the id column's
    NATIVE type (a bigint cast silently NULLed string ids; ADVICE
    r14)."""
    folded = cells.groupBy("template_digest", "__src").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.min("min_id").alias("min_id"),
    )
    return (
        folded.groupBy("template_digest")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("__src").cast("bigint").alias("n_sources"),
            F.min("min_id").alias("exemplar_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "template_digest")
    )
