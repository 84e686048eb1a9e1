"""Document/text-analysis functions for training-data pipelines: language
ID (stopword-marker heuristic), quality scoring, token counting,
fingerprinting.  Pure Catalyst expressions — no UDFs."""

from __future__ import annotations

import pyspark.sql.functions as F

EN_MARKERS = ("a", "the", "of", "and", "to", "is")
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text: F.Column) -> F.Column:
    return F.split(text, " ")


def lang_id(text: F.Column, threshold: float = 0.02) -> F.Column:
    """N-gram/stopword-marker language heuristic: fraction of tokens in the
    English marker set -> 'en' when above threshold, else 'other'."""
    words = _words(F.lower(text))
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_MARKERS)))
    ratio = hits / F.size(words)
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("other"))


def stopword_ratio(text: F.Column) -> F.Column:
    words = _words(F.lower(text))
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_MARKERS)))
    return F.round(hits / F.size(words), 6)


def quality_features(df, text_col: str = "text"):
    """Length / punctuation / stopword quality features + composite score."""
    t = F.col(text_col)
    words = _words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn(
            "avg_word_len",
            F.round((n_chars - (n_words - 1)) / n_words, 6),
        )
        .withColumn("punct_ratio", F.round(punct / n_chars, 6))
        .withColumn("stop_ratio", stopword_ratio(t))
        .withColumn(
            "quality_score",
            F.round(
                F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.5
                + (1 - F.least(F.col("punct_ratio") * 10, F.lit(1.0))) * 0.3
                + F.least(F.col("stop_ratio") * 10, F.lit(1.0)) * 0.2,
                6,
            ),
        )
    )


def token_counts(df, text_col: str = "text"):
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    ws = F.size(_words(t))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    return df.withColumn("ws_tokens", ws.cast("long")).withColumn(
        "re_tokens", bpe.cast("long")
    ).withColumn(
        "chars_per_token", F.round(F.length(t) / bpe, 6)
    )


def fingerprint(df, text_col: str = "text", gram: int = 8, stride: int = 4):
    """Rolling-hash document fingerprint (winnowing-lite): min md5 over
    character ``gram``-grams sampled every ``stride`` chars, plus the
    distinct shingle count."""
    t = F.col(text_col)
    n = F.greatest(
        F.floor((F.length(t) - gram) / stride).cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), n)
    shingles = F.transform(idx, lambda i: F.substring(t, i * stride + 1, gram))
    hashes = F.transform(shingles, F.md5)
    return df.withColumn("fingerprint", F.array_min(hashes)).withColumn(
        "n_distinct_shingles", F.size(F.array_distinct(shingles)).cast("long")
    )


def repetition_features(df, text_col: str = "text"):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    the published repetition filters used for large LM corpora), adapted to
    single-line documents: duplicate-word fraction, duplicate-2-gram
    fraction, and the share of 2-grams taken by the most frequent 2-gram.
    High values mark degenerate/boilerplate documents that dedup misses.

    Pure Catalyst array expressions, never a shuffle.  The top-2-gram
    count is a longest-equal-run scan over the SORTED bigram array —
    O(n log n) per row, so a pathological 10^5-word document costs ~10^6
    comparisons, not the 10^10 of the naive distinct x filter form.  (The
    DuckDB oracle keeps the quadratic form: it only referees small-scale
    parity, and identical results prove the rewrite.)"""
    t = F.col(text_col)
    words = _words(t)
    n_w = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(n_w - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n_w - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_bg = F.size(bigrams)

    def _run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_bg = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        _run_step,
        lambda acc: acc["best"],
    )
    return (
        df.withColumn("n_words", n_w.cast("long"))
        .withColumn(
            "dup_word_frac",
            F.round(1 - F.size(F.array_distinct(words)) / n_w, 6),
        )
        .withColumn(
            "dup_2gram_frac",
            F.when(
                n_bg > 0,
                F.round(1 - F.size(F.array_distinct(bigrams)) / n_bg, 6),
            ),
        )
        .withColumn(
            "top_2gram_share",
            F.when(n_bg > 0, F.round(top_bg / n_bg, 6)),
        )
    )


# PII masking: the redaction pass every published LM data pipeline runs
# before training.  Patterns are the RE2/Java-regex common subset so Spark
# and DuckDB agree byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\b\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b"


def pii_mask(df, text_col: str = "text"):
    """Mask emails, IPv4 addresses, and phone-shaped numbers with typed
    placeholder tokens; report per-document match counts.  Order matters:
    emails first (an address can contain digits), then IPs, then phones.
    Pure Catalyst regexp expressions — JVM-side, no UDFs."""
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    masked1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(masked1, F.lit(PII_IPV4_RE), 0))
    masked2 = F.regexp_replace(masked1, PII_IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(masked2, F.lit(PII_PHONE_RE), 0))
    masked3 = F.regexp_replace(masked2, PII_PHONE_RE, "<PHONE>")
    return (
        df.withColumn("masked_text", masked3)
        .withColumn("n_emails", n_email.cast("long"))
        .withColumn("n_ips", n_ip.cast("long"))
        .withColumn("n_phones", n_phone.cast("long"))
    )


def bm25_top_terms(
    df, k: int = 3, k1: float = 1.2, b: float = 0.75, text_col: str = "text"
):
    """Top-``k`` BM25-weighted terms per document (Robertson/Sparck Jones
    Okapi BM25 — the standard retrieval/quality-weighting score LM data
    pipelines use to rank salient terms and score doc-query relevance).

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), with the
    LINEAR idf variant idf = (N - df + 0.5) / (df + 0.5) instead of its
    log for the same reason as :func:`tfidf_top_terms`: ``ln`` is not
    correctly rounded and the last ulp differs between JVM Math.log and
    DuckDB libm; linear idf is monotone in df so per-doc ranking is
    unchanged.  avgdl is an exact integer sum over doc lengths divided
    once, so both engines compute the identical double.

    Scale: tf is a map-side-combinable (doc, word) count; dl aggregates
    the same exploded stream per doc; df aggregates the tf table; the
    (N, avgdl) stats are a broadcast single row.  The df join shuffles on
    word (vocabulary-sized, NOT forced broadcast); the per-doc top-k
    window has small groups.  Same plan skeleton as tf-idf plus one
    doc-length join on doc_id."""
    from pyspark.sql import Window

    words = df.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfc = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_tot")
    )
    scored = (
        tf.join(dfc, on="word")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bm25",
            F.round(
                (F.col("_n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b * F.col("dl") / (F.col("_tot") / F.col("_n"))
                    )
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tf", "dl", "df", "bm25", "rank")
    )


def tfidf_top_terms(df, k: int = 3, text_col: str = "text"):
    """Top-``k`` rarity-weighted terms per document.

    Score = tf * (N + 1) / (df + 1), rounded to 6 dp — the linear-idf
    variant (production tf-idf swaps in ln((N+1)/(df+1)); kept linear here
    because ``ln`` is not correctly-rounded in IEEE and the last ulp
    differs between JVM Math.log and DuckDB libm, which would break
    bit-parity with the oracle; ranking order is identical since ln is
    monotone).  Ties rank deterministically by term ascending.

    Scale: tf is a map-side-combinable (doc, word) count; df aggregates
    the tf table (already one row per (doc, word)); N joins in as a
    broadcast single row.  The df join shuffles on word — vocabulary-
    sized, NOT forced broadcast (web-scale vocabularies exceed executor
    memory).  The per-doc top-k window partitions by doc_id with small
    groups.
    """
    from pyspark.sql import Window

    words = df.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfc, on="word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.col("_n") + 1) / (F.col("df") + 1), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", "tf", "df", "tfidf", "rank")
    )


# URL/domain filtering: the blocklist pass web-corpus pipelines (C4, CCNet,
# RefinedWeb) run before anything else.  RE2/Java common-subset pattern so
# Spark and DuckDB extract identical spans.
URL_RE = r"https?://[A-Za-z0-9.-]+[A-Za-z0-9./_%-]*"
HOST_RE = r"https?://([A-Za-z0-9.-]+)"


def url_host_filter(df, blocklist, text_col: str = "text"):
    """Per-document URL census + blocklist decision: extract every URL,
    derive its lowercased host, flag hosts present in ``blocklist`` (a
    (host:string) dim — tiny, broadcast), and aggregate to one row per
    document with ``n_urls``, ``n_blocked``, and the keep decision
    (``n_blocked = 0``).  Documents with no URLs survive with zero counts
    (explode_outer).  Pure Catalyst regexps + a broadcast left join + a
    map-side-combinable count — one corpus scan, no corpus shuffle beyond
    the per-doc aggregation."""
    urls = df.select(
        "doc_id",
        F.explode_outer(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
        ).alias("url"),
    ).withColumn("host", F.lower(F.regexp_extract("url", HOST_RE, 1)))
    flagged = urls.join(
        F.broadcast(blocklist.withColumn("_blocked", F.lit(1))),
        on="host",
        how="left",
    )
    return flagged.groupBy("doc_id").agg(
        F.count("url").cast("long").alias("n_urls"),
        F.count("_blocked").cast("long").alias("n_blocked"),
        (F.count("_blocked") == 0).alias("keep"),
    )


def oov_rate(df, vocab_size: int = 100, text_col: str = "text"):
    """Out-of-vocabulary rate per document against a corpus-derived vocab:
    the top ``vocab_size`` words by (frequency desc, word asc).  The OOV
    rate is the standard tokenizer-coverage diagnostic run before training
    (and before committing to a vocab).

    Scale: word counts are one map-side-combinable shuffle on word
    (vocabulary-sized output, NOT corpus-sized); the top-k is a bounded
    TakeOrdered over that vocab table; the resulting ``vocab_size``-row
    dim broadcasts back onto the exploded token stream, and the per-doc
    aggregation map-side combines.  No corpus-sized sort anywhere."""
    words = df.select(
        "doc_id", F.explode(_words(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("_wc"))
        .orderBy(F.desc("_wc"), F.asc("word"))
        .limit(vocab_size)
        .select("word", F.lit(1).alias("_in_vocab"))
    )
    tagged = words.join(F.broadcast(vocab), on="word", how="left")
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (F.count(F.lit(1)) - F.count("_in_vocab")).cast("long").alias("n_oov"),
        F.round(
            (F.count(F.lit(1)) - F.count("_in_vocab")) / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


def lm_score(df, text_col: str = "text"):
    """Corpus-bigram language-model fluency score per document — the
    perplexity-style quality filter of CCNet (Wenzek et al. 2020) /
    Gopher (Rae et al. 2021), which rank documents by how predictable
    their text is under a corpus LM and drop the tails.

    Determinism contract: no ``ln``/``exp`` (not correctly rounded; JVM
    Math.log and DuckDB libm disagree in the last ulp — same reasoning as
    the linear-idf tfidf/bm25 variants above).  Instead of log-perplexity
    we report two rational statistics that are monotone in the same
    per-bigram conditional probabilities p(w2|w1):

    - ``mean_inv_prob``  = avg over bigrams of (c1 + V) / (c2 + 1)
      (add-one-smoothed inverse conditional probability; the arithmetic
      mean of 1/p upper-bounds perplexity by the AM-GM inequality, so
      ranking/thresholding behaves like a perplexity filter), and
    - ``mean_cond_prob`` = avg of c2 / c1 (unsmoothed MLE fluency; c2 ≥ 1
      because the doc's own bigrams are in the corpus counts).

    where c2 = corpus count of bigram (w1, w2), c1 = corpus count of w1
    as a bigram prefix (= Σ_w c2(w1, w)), and V = |{distinct w2}|.

    Scale: the bigram stream is one explode of the token array (no self
    join); c2/c1 are map-side-combinable groupBys whose outputs are
    vocabulary²- and vocabulary-bounded dims, far smaller than the corpus;
    V is a broadcast scalar.  Scoring joins the bigram stream to c2/c1 by
    shuffle on the bigram/prefix key — stop-word bigrams are the skewed
    keys and AQE's skew-join split handles them (same shape as the
    ngram-Jaccard inverted index in operators/dedup.py).  The final
    per-doc avg map-side combines.  Documents with < 2 tokens have no
    bigrams and are excluded (matches the oracle's inner join).
    """
    # Project the token array ONCE, then pair consecutive tokens by zipping
    # two slices (the bleu_precisions pattern): building pairs with
    # element_at(toks, i) inside a transform lambda re-evaluates the whole
    # tokenization per element access (no CSE inside higher-order-function
    # lambdas) — measured 7x slower at sf0.1.  slice length 0 also handles
    # token-poor docs without a sequence(1, 0) guard (which counts DOWN).
    toks = F.filter(_words(F.lower(F.col(text_col))), lambda w: w != "")
    tok_df = df.select("doc_id", toks.alias("_toks"))
    n = F.size("_toks")
    lead = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("_toks", 1, lead),
        F.slice("_toks", 2, lead),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = tok_df.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # Reduce to per-doc bigram COUNTS first: the scoring join then moves
    # |distinct (doc, bigram)| rows instead of every corpus position, and
    # all corpus statistics derive from the same aggregate, so Catalyst
    # reuses one exchange for the c2/c1/V branches instead of re-running
    # the explode per branch (the naive form cost 4 full token scans).
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k")
    )
    c2 = doc_bg.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    v = c2.agg(F.count_distinct("w2").alias("v"))
    # enrich the vocabulary²-sized dim with c1 BEFORE touching the big
    # per-doc stream: doc_bg is then shuffled exactly once, on (w1, w2) —
    # joining c1 afterwards would reshuffle the whole stream again on w1.
    # c1 = sum of c2 over the prefix word as a WINDOW on the c2 table (one
    # pass, vocabulary-bounded groups), not a groupBy + self-join — the
    # join form re-evaluated the whole corpus->c2 chain a second time.
    from pyspark.sql import Window

    dim = c2.withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    scored = doc_bg.join(dim, on=["w1", "w2"]).crossJoin(F.broadcast(v))
    k = F.col("k")
    return scored.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(k * (F.col("c1") + F.col("v")).cast("double") / (F.col("c2") + 1))
            / F.sum("k"),
            6,
        ).alias("mean_inv_prob"),
        F.round(
            F.sum(k * F.col("c2").cast("double") / F.col("c1")) / F.sum("k"),
            6,
        ).alias("mean_cond_prob"),
    )
