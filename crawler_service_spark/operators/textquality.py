"""Text-analysis operators for a training-data pipeline over ``documents``.

Everything here is JVM-side built-ins (whole-stage codegen) — no Python in the
hot path. Outputs are integers or integer-scaled scores (``1000*a DIV b``)
rather than float ratios, so the DuckDB oracle twin in ``__spark_entry__``
matches bit-for-bit (float round-tripping differs between engines; integer
arithmetic does not).

Cross-engine hash contract: ``h32(s) = int(md5(s)[:8], 16)`` — Spark
``conv(substring(md5(s),1,8),16,10)`` == DuckDB ``('0x'||substr(md5(s),1,8))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.partitioning import widen

TOKEN_SPLIT = r"[^a-z0-9]+"

# marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "que", "y"],
}


def h32(col: Column | str) -> Column:
    """32-bit md5-prefix hash, reproducible in DuckDB (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_py(s: str) -> int:
    """Driver-side twin of h32 — used to derive deterministic constants
    (minhash affine coefficients, integer LSH planes) embedded as literals
    in BOTH engines' plans."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def tokens_col(text: Column | str) -> Column:
    """Lowercased word tokens (empty strings filtered)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), TOKEN_SPLIT), lambda x: x != "")


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def _count_occurrences(text: Column, word: str) -> Column:
    """Exact count of ``word`` among the document's tokens (array filter —
    JVM higher-order function, same lambda exists in DuckDB)."""
    return F.size(F.filter(tokens_col(text), lambda x: x == F.lit(word))).cast("long")


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality counters: length, tokens, punctuation, stopwords,
    and an integer-scaled stopword score (per-mille). Mirrors the heuristics a
    web-text quality filter runs before training-data selection."""
    t = F.col(text_col)
    stop = sum(
        (_count_occurrences(t, w) for w in LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    toks = token_count_col(t)
    return widen(docs).select(
        "doc_id",
        F.length(t).cast("long").alias("char_count"),
        toks.cast("long").alias("token_count"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", "")))
        .cast("long")
        .alias("punct_count"),
        stop.alias("stopword_count"),
        F.expr(
            "CASE WHEN length({t}) = 0 THEN 0 ELSE div(1000 * ("
            "length({t}) - length(regexp_replace({t}, '[.,;:!?]', ''))"
            "), length({t})) END".format(t=text_col)
        ).alias("punct_permille"),
    )


def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by marker hits per token,
    pick the argmax (deterministic tie-break: en > de > fr > es > und)."""
    t = F.col(text_col)
    scores = {
        lang: sum(
            (_count_occurrences(t, w) for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }
    pred = F.lit("und")
    best = F.lit(0).cast("long")
    for lang in ["es", "fr", "de", "en"]:  # reverse priority; later wins ties
        pred = F.when(scores[lang] >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    sel = [F.col("doc_id")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    sel.append(pred.alias("pred_lang"))
    return widen(docs).select(*sel)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: sum over tokens of
    ``(pos+1) * h32(token) mod 2^31`` — a rolling-hash-style signature that
    changes when tokens reorder, computed entirely with explode + sum (scales
    as a plain aggregation; no UDF).

    Each term is reduced mod 2^31 BEFORE the sum (the residue sum is
    congruent to the raw sum, so values are unchanged where both are
    defined): the raw ``(pos+1) * h32`` products grow as n * 2^31 and their
    sum as n^2 * 2^30, which wraps int64 silently (non-ANSI) at ~65k-token
    docs — inside the Gopher 100k-word bound. With per-term residues the
    running sum stays < n * 2^31: int64-exact to ~4.3e9 tokens per doc."""
    toks = widen(docs).select("doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "tok"))
    term = F.pmod((F.col("pos") + 1) * h32("tok"), F.lit(2147483648))
    return toks.groupBy("doc_id").agg(
        F.pmod(F.sum(term), F.lit(2147483648)).alias("fingerprint")
    )


def gopher_quality(
    docs: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Gopher-rules-style quality gates (the standard webtext pre-training
    filter family): word count bounds, mean word length, alphabetic-word
    ratio, stopword presence — all integer-scaled JVM built-ins so the DuckDB
    oracle matches bit-for-bit. ``gopher_pass`` applies the canonical
    thresholds (50 <= words <= 100k, 3 <= mean word len <= 10 in millis,
    >=80% alphabetic words, >=2 stopword hits).

    ``keep`` threads extra input columns (e.g. grouping keys) through to the
    output so rollups over the gate don't need a corpus-scale self-join back
    onto the input."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("long")
    # ratio exprs resolve against the projected counters below
    mean_word_len_millis = F.when(
        F.col("nw") > 0, F.expr("div(1000 * swl, nw)")
    ).otherwise(F.lit(0).cast("long"))
    alpha_permille = F.when(
        F.col("nw") > 0, F.expr("div(1000 * aw, nw)")
    ).otherwise(F.lit(0).cast("long"))
    stop = sum(
        (_count_occurrences(t, w) for w in LANG_MARKERS["en"]),
        F.lit(0).cast("long"),
    )
    base = docs.select(
        "doc_id", *keep, n_words.alias("nw"), sum_len.alias("swl"),
        alpha_words.alias("aw"), stop.alias("stopword_hits"),
    )
    out = base.select(
        "doc_id",
        *keep,
        F.col("nw").alias("word_count"),
        mean_word_len_millis.alias("mean_word_len_millis"),
        alpha_permille.alias("alpha_word_permille"),
        "stopword_hits",
    )
    gopher_pass = (
        (F.col("word_count") >= 50) & (F.col("word_count") <= 100_000)
        & (F.col("mean_word_len_millis") >= 3000) & (F.col("mean_word_len_millis") <= 10_000)
        & (F.col("alpha_word_permille") >= 800)
        & (F.col("stopword_hits") >= 2)
    )
    return out.withColumn("gopher_pass", gopher_pass)


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher repetition signals: share of word occurrences consumed by the
    single most frequent token and by the most frequent word-bigram
    (integer permille; high values flag boilerplate/spam)."""
    toks = widen(docs).select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    uni = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    uni_stats = uni.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_tok")
    )
    top_unigram = uni_stats.select(
        "doc_id",
        F.expr("div(1000 * top_c, n_tok)").alias("top_unigram_permille"),
    )
    ta = tokens_col(text_col)
    bigrams = F.when(
        F.size(ta) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ta) - 1),
            lambda i: F.concat_ws(" ", F.slice(ta, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = widen(docs).select("doc_id", F.explode(bigrams).alias("bg"))
    bg_counts = big.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bg_stats = bg_counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    ).select("doc_id", F.expr("div(1000 * top_c, n_bg)").alias("top_bigram_permille"))
    return top_unigram.join(bg_stats, "doc_id", "left").select(
        "doc_id", "top_unigram_permille",
        F.coalesce("top_bigram_permille", F.lit(0)).alias("top_bigram_permille"),
    )


def keyword_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1_millis: int = 1200,
    b_millis: int = 750,
    text_col: str = "text",
) -> DataFrame:
    """BM25-shaped keyword top-k over the corpus, in exact integer arithmetic.

    Classic BM25 with two deliberate integer substitutions so the score is
    bit-identical in any engine (the cross-engine contract of this module —
    float ln/div round-trips differ between Spark and DuckDB):

    - idf surrogate: ``idf_millis = div(10^3 * (N - df + 1), df + 1)`` — the
      rational core of the Robertson idf, monotone-decreasing in df, no log;
    - millis-scaled length norm and saturation:
      ``norm_millis  = (1000 - b) + div(b * dl * 1000, avgdl_millis)``
      ``denom_millis = 1000*tf + div(k1 * norm_millis, 1000)``
      ``tf_part_micros = div(10^6 * tf * (1000 + k1), denom_millis)``
      ``score = sum_t div(idf_millis_t * tf_part_micros_t, 10^3)``
      with k1/b carried in millis (defaults 1.2 / 0.75).

    The idf surrogate is carried in MILLIS, not micros, so the score product
    stays inside int64: ``tf_part_micros`` <= ~2.2e6 and ``idf_millis`` <=
    10^3*(N+1), so the per-term product is < 2^63 for corpora up to
    **N ≈ 4.1e9 documents** (an idf in micros overflowed — and under ANSI
    mode threw — once N exceeded ~4e6 with a rare term). Beyond ~4e9 docs,
    rescale idf to centis and the bound becomes ~4e10.

    Scale shape: two corpus scans (one tiny global agg: N, avgdl, per-term
    df — a single broadcast row), map-side scoring, TakeOrderedAndProject
    top-k. No shuffle of the corpus, no per-row Python. Term tf/df use the
    same token array as every other operator here, computed once per row.
    """
    t = F.col(text_col)
    toks = tokens_col(t)
    per_doc = widen(docs).select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            _count_occurrences(t, term).alias(f"tf_{i}")
            for i, term in enumerate(query_terms)
        ],
    )
    glob = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    ).select(
        "n_docs",
        F.expr("div(1000 * sum_dl, n_docs)").alias("avgdl_millis"),
        *[F.col(f"df_{i}") for i in range(len(query_terms))],
    )
    scored = per_doc.crossJoin(F.broadcast(glob))
    score = F.lit(0).cast("long")
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}")
        term_score = F.when(
            tf > 0,
            F.expr(
                f"div(div(1000000 * tf_{i} * {1000 + k1_millis}, "
                f"1000 * tf_{i} + div({k1_millis} * ((1000 - {b_millis}) + div({b_millis} * dl * 1000, avgdl_millis)), 1000))"
                f" * div(1000 * (n_docs - df_{i} + 1), df_{i} + 1), 1000)"
            ),
        ).otherwise(F.lit(0).cast("long"))
        score = score + term_score
    return (
        scored.select("doc_id", score.alias("score_micros"))
        .filter(F.col("score_micros") > 0)
        .orderBy(F.col("score_micros").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def lm_bigram_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained bigram-LM fluency score per document — the CCNet-shaped
    quality signal (score each doc by how well an n-gram LM fit on the corpus
    predicts it; unusually low scores flag gibberish/boilerplate, unusually
    high ones flag templated text). Ref behavior modeled on the quality-gate
    role of the reference's extension/skip heuristics (crawler-service has no
    text LM; this is the training-pipeline extension the brief asks for).

    Integer contract (cross-engine exact, no floats/logs): the LM is the
    conditional probability table p(w2|w1) in millis —
    ``(1000 * count(w1,w2)) DIV count(w1)`` with counts over the corpus's own
    bigrams, so every doc bigram has count >= 1 and no smoothing is needed.
    A doc's score is the mean conditional probability of its bigrams in
    millis (``sum_millis DIV n_bigrams``). Docs with < 2 tokens have no
    bigrams and drop out.

    Scale shape: the (w1,w2)-count frame is a vocab-bounded map-side-
    combinable aggregation; the (w1) denominators are DERIVED from it (sum
    over w2), not a second corpus pass, and the two vocab frames join first —
    so the corpus is tokenized/exploded exactly twice (once to build the LM
    counts, once as the scoring probe side) and shuffled at corpus scale
    exactly once (the probe join), then one rollup shuffle on the doc id.
    Hot stopword-pair keys are one-row build-side entries (AQE skew split
    handles the probe side)."""
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    n1 = F.size("t") - 1
    bg = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("t", 1, n1),
                F.slice("t", 2, n1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # c(w1,w2) PINNED (localCheckpoint, round 6): it is read once to derive
    # the c(w1) denominators and once as the join's other side, and unpinned
    # each consumer re-ran the corpus tokenize+explode+aggregate (the
    # before-plan scanned documents 4x here and every consumer of the score
    # frame multiplied that). Vocab-bounded, so the pin is cheap at any
    # corpus size.
    c_bg = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bg"))
        .localCheckpoint()
    )
    # c(w1) = sum over w2 of c(w1,w2): derived from the vocab-bounded c_bg
    # frame instead of a second corpus-scale tokenize+explode pass
    c_w1 = c_bg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    lm = c_bg.join(c_w1, "w1").select(
        "w1", "w2", F.expr("div(1000 * c_bg, c_w1)").alias("m")
    )
    return (
        bg.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("m").alias("sum_millis"))
        .select(
            id_col,
            "n_bigrams",
            "sum_millis",
            F.expr("div(sum_millis, n_bigrams)").alias("lm_millis"),
        )
    )


def lm_perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail corpus split by LM fluency, per language
    — the bucketing CCNet applies before choosing which perplexity band to
    train on. Docs are bucketed by VALUE cutoffs (the lm_millis of the
    ceil(n/3)- and ceil(2n/3)-ranked doc per language, ties share a bucket),
    not by row-number terciles, so the assignment is order-free and
    cross-engine exact.

    Scale shape: ``lm_millis`` is bounded in [0, 1000], so the per-(lang,
    value) distribution frame has <= 1001 rows per language — the cumulative
    window and the cutoff rollup run on that tiny frame, and the cutoffs
    broadcast back to the corpus. No corpus-scale sort anywhere (a
    row-number ntile would globally sort every language partition — the
    exact shuffle this formulation avoids at 10^10 docs). Docs with < 2
    tokens have no bigrams and are out of scope, as in lm_bigram_score.

    Output: one row per (lang, bucket): n_docs, tot_bigrams,
    min/max lm_millis."""
    from pyspark.sql.window import Window

    # the scored frame feeds the distribution rollup AND the final bucketing
    # join; pinned (round 6) so the whole bigram-LM pipeline runs once — the
    # before-plan re-executed it per consumer (24 documents scans in one
    # query). |docs| x 5 narrow columns: at 10^10 docs this materialization
    # is exactly the intermediate a real CCNet build would persist between
    # its scoring and bucketing passes.
    scored = (
        lm_bigram_score(docs, id_col=id_col, text_col=text_col)
        .join(docs.select(id_col, lang_col), id_col)
        .localCheckpoint()
    )
    dist = scored.groupBy(lang_col, "lm_millis").agg(F.count("*").alias("c"))
    cum_w = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("lm_millis").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-language total as a full-partition window over the SAME bounded
    # dist frame (shares dist's one exchange) instead of a separate
    # groupBy branch that re-aggregated the corpus
    tot_w = Window.partitionBy(lang_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = dist.withColumn("cum", F.sum("c").over(cum_w)).withColumn(
        "n", F.sum("c").over(tot_w)
    )
    cuts = (
        cum
        .groupBy(lang_col)
        .agg(
            F.max(
                F.when(F.col("cum") >= F.expr("div(n + 2, 3)"), F.col("lm_millis"))
            ).alias("head_cut"),
            F.max(
                F.when(F.col("cum") >= F.expr("div(2 * n + 2, 3)"), F.col("lm_millis"))
            ).alias("mid_cut"),
        )
    )
    bucketed = scored.join(F.broadcast(cuts), lang_col).withColumn(
        "bucket",
        F.when(F.col("lm_millis") >= F.col("head_cut"), F.lit("head"))
        .when(F.col("lm_millis") >= F.col("mid_cut"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return bucketed.groupBy(lang_col, "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("tot_bigrams"),
        F.min("lm_millis").cast("long").alias("min_lm_millis"),
        F.max("lm_millis").cast("long").alias("max_lm_millis"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    MOSS algorithm): hash every word k-gram, slide a window of w consecutive
    hashes, keep each window's minimum — the guarantee is that any shared
    run of >= w+k-1 words between two docs shares at least one fingerprint,
    while storing ~2/(w+1) of the k-gram hashes. The copy-detection sketch
    between exact hashing (stores everything) and minhash (loses locality).

    Output: DISTINCT (doc_id, fingerprint) rows, h32-hashed (cross-engine
    md5-prefix contract). Docs with < k tokens have no k-grams and drop out.

    Scale shape: k-gram hashing and the window minima are per-row array
    HOFs inside whole-stage codegen — zero shuffles until the final
    explode+distinct, which is one hash aggregation on (doc_id, fp) whose
    output is the ~2/(w+1)-compressed sketch, not the token stream."""
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= k)
    m = F.size("t") - (k - 1)  # number of k-grams
    gram_hashes = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: h32(F.array_join(F.slice("t", i, k), " ")),
    )
    with_h = toks.select(id_col, gram_hashes.alias("h"))
    n_win = F.size("h") - (w - 1)
    mins = F.when(
        n_win >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
            lambda i: F.array_min(F.slice("h", i, w)),
        ),
        # fewer than w k-grams: a single window over all of them (standard
        # winnowing edge case — every doc keeps >= 1 fingerprint)
    ).otherwise(F.array(F.array_min("h")))
    return (
        with_h.select(id_col, F.explode(mins).alias("fingerprint"))
        .distinct()
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global vocabulary top-k — the term-frequency table a tokenizer build
    or corpus audit starts from: per token, total occurrences and the number
    of distinct docs containing it, top-k by (occurrences DESC, token ASC —
    a total order, so the cut is deterministic).

    Scale shape: the occurrence count is a map-side-combinable groupBy on
    the token; the distinct-doc count aggregates the DISTINCT (token, doc)
    frame the same way — both shuffle vocab-sized frames, never the corpus;
    the final top-k is TakeOrderedAndProject (no global sort). Stopword-hot
    tokens are single reduce keys with pre-combined partials, not skew."""
    # two-level rollup from ONE token explode (round 6, guide §2.3): the
    # (token, doc) partial counts aggregate map-side, then one vocab-keyed
    # shuffle derives both totals — the old plan exploded the corpus twice
    # and paid a third full (token, doc) DISTINCT exchange plus a join to
    # produce the same two numbers
    tok = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    per_dt = tok.groupBy("token", F.col(id_col)).agg(F.count("*").alias("c"))
    return (
        per_dt.groupBy("token")
        .agg(
            F.sum("c").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-n-gram coverage — the RefinedWeb-style diagnostic
    for how much of each document is word-for-word shared with the rest of
    the corpus (the signal behind ExactSubstr-class dedup decisions):
    of a doc's DISTINCT word n-grams, how many appear in at least one other
    doc, as a permille. Docs with < n tokens have no n-grams and drop out.

    Scale shape: DISTINCT (doc, ngram) -> per-ngram doc-frequency is one
    shuffle on the n-gram (map-side combinable), the coverage rollup is one
    shuffle back on the doc id; boilerplate mega-n-grams are single reduce
    keys with pre-combined partials. No pairwise joins anywhere — this is
    the linear-cost census, not the quadratic pair enumeration."""
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= n)
    m = F.size("t") - (n - 1)
    # per-doc DISTINCT n-grams dedupe MAP-SIDE (array_distinct before the
    # explode — per-doc set semantics equals the old global (doc, ngram)
    # DISTINCT because the key includes the doc id), and doc-frequency is a
    # count() OVER (PARTITION BY ngram) window on those rows instead of a
    # groupBy branch + join that re-evaluated the gram subtree (round 6,
    # guide §2.4: 3 corpus-scale exchanges -> 2).
    grams = toks.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda i: F.array_join(F.slice("t", i, n), " "),
                )
            )
        ).alias("ngram"),
    )
    g = grams.withColumn(
        "df", F.count("*").over(Window.partitionBy("ngram")).cast("long")
    )
    return (
        g.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).cast("long").alias("n_dup_ngrams"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup_ngrams",
            F.expr("div(1000 * n_dup_ngrams, n_ngrams)").alias("dup_permille"),
        )
    )


def dup_span_scrub(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove corpus-duplicated token spans from every document — the
    transform counterpart of ``dup_ngram_coverage``'s census, i.e. the
    ExactSubstr-class dedup step (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): a token position is scrubbed iff it is
    covered by at least one word n-gram that also appears in another doc.
    Overlapping duplicated n-grams merge naturally (position-set union), so
    a long shared passage is removed once, end to end. Docs shorter than
    ``n`` tokens have no n-grams and are kept whole.

    Output per doc: token counts before/after, kept permille, and the md5
    of the scrubbed text (kept tokens joined in original order; md5('')
    for fully-boilerplate docs).

    Scale shape (round 6, guide §2.3/§2.4/§8): n-gram doc-frequency is a
    window on the ONE ngram-keyed exchange over per-doc-distinct grams;
    each doc's set of globally-duplicated grams rolls up to ONE array row
    (bounded by the doc's own gram count), joins back on the uniform doc
    key, and the position-set union + scrub verdict run entirely MAP-SIDE
    as array ops over the token array. The old plan exploded every
    duplicated gram occurrence n ways and shuffled/distinct-ed/joined at
    (doc, pos) grain — token-level exchanges that dwarfed the corpus; now
    no exchange ever carries more than one row per (doc, gram). Still no
    pairwise joins anywhere.
    """
    from pyspark.sql.window import Window

    toks = (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= 1)
    )
    m = F.size("t") - (n - 1)
    gram_arr = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice("t", i, n), " "),
    )
    dist = toks.filter(F.size("t") >= n).select(
        "doc_id", F.explode(F.array_distinct(gram_arr)).alias("ngram")
    )
    dup_sets = (
        dist.withColumn("df", F.count("*").over(Window.partitionBy("ngram")))
        .filter(F.col("df") > 1)
        .groupBy("doc_id")
        .agg(F.collect_set("ngram").alias("dups"))
    )
    j = toks.join(dup_sets, "doc_id", "left")
    flagged = j.select(
        "doc_id",
        "t",
        F.when(
            (F.size("t") >= n) & F.col("dups").isNotNull(),
            F.transform(gram_arr, lambda g: F.array_contains(F.col("dups"), g)),
        ).otherwise(F.array().cast("array<boolean>")).alias("flags"),
    )
    # a token at position p (1-based) is scrubbed iff some flagged gram
    # START lies in [p-n+1, p] — the same sliding-window union the old
    # position explode materialized row-wise
    p_lo = lambda p: F.greatest(F.lit(1), p - (n - 1))  # noqa: E731
    p_hi = lambda p: F.least(p, F.size("flags"))  # noqa: E731
    kept_col = F.filter(
        "t",
        lambda tok, i: ~F.coalesce(
            F.exists(
                F.slice(
                    "flags",
                    p_lo(i + 1),
                    F.greatest(p_hi(i + 1) - p_lo(i + 1) + 1, F.lit(0)),
                ),
                lambda f: f,
            ),
            F.lit(False),
        ),
    )
    staged = flagged.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        kept_col.alias("kept"),
        # second `flags` reference on purpose: CollapseProject inlines a
        # single-use alias, and an inlined flag array would be re-evaluated
        # once per token inside the filter lambda above
        F.size("flags").alias("__flags_guard"),
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        F.size("kept").cast("long").alias("n_kept"),
        F.expr("div(1000 * size(kept), n_tokens)").alias("kept_permille"),
        F.md5(F.concat_ws(" ", F.col("kept"))).alias("scrubbed_md5"),
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k salient terms by integer tf·idf — the keyword /
    doc-tagging table a search index or topic-routing stage reads (the
    reference crawls into a metadata store keyed for retrieval; this is the
    per-doc salience feature next to it). Same log-free Robertson idf
    surrogate as :func:`keyword_topk` (``idf_millis = div(1000*(N-df+1),
    df+1)``, monotone in df, bit-identical in any engine), scored as
    ``tfidf_millis = tf * idf_millis``; int64-safe for corpora to ~4e9 docs
    at 10^6-token documents. Rank ties break (tfidf DESC, tf DESC, term
    ASC) for a total order.

    Scale shape: tf is one groupBy on the exploded (doc, token) pair; df is
    one vocab-bounded rollup of that same frame (no second corpus scan);
    the tf⋈idf join keys on the uniform token hash — the vocab frame is NOT
    broadcast because web-corpus vocab is itself corpus-scale; N is the
    only broadcast (one row). The final per-doc top-k is a row_number
    window partitioned by doc_id. Three shuffles total — (doc,token),
    token, doc — all on uniform keys, linear end-to-end; output bounded at
    k·|docs|.
    """
    from pyspark.sql.window import Window

    toks = (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t"))
        .filter(F.size("t") > 0)
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # df = count() OVER (PARTITION BY term) on the tf frame itself (round 6,
    # guide §2.4): the old groupBy-term branch + tf⋈idf join re-evaluated the
    # tf subtree and paid an extra term-keyed exchange to attach a number
    # that is a plain window over the same rows. A stopword-hot term is one
    # window partition with pre-sorted spill, same as its reduce key before.
    n_docs = toks.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("term")).cast("long")
        )
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * F.expr("div(1000 * (n_docs - df + 1), df + 1)")
            ).alias("tfidf_millis"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_millis").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            "doc_id",
            F.col("term_rank").cast("long").alias("term_rank"),
            "term",
            "tf",
            F.col("tfidf_millis").cast("long").alias("tfidf_millis"),
        )
    )


def build_postings(
    docs: DataFrame,
    head_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index build — the search-index artifact a crawl corpus
    feeds (the reference commits extraction metadata to a store keyed for
    retrieval; this is the term→postings table next to it). Per term:
    document frequency, collection frequency, the first ``head_k`` posting
    doc_ids (ascending), and an md5 over the FULL delta-encoded postings
    string (``"Δdoc:tf,Δdoc:tf,..."`` — the standard d-gap encoding an
    index compressor applies), so the whole list is verified without
    unbounded output.

    Scale shape: one (doc, token) groupBy for tf (map-side combine), one
    term-key rollup that sorts each term's postings inside the aggregated
    array (array_sort on collected structs — per-group work, no global
    sort). Output is vocab-bounded. Hot terms concentrate their postings
    list on one reducer, exactly like a real index-build shard; at 10^10
    docs the standing fix is partitioning the term space (hash-bucketed
    writes, the layout `plans/bucketing.py` provides) — the per-term list
    itself is the artifact, not an intermediate.
    """
    toks = (
        widen(docs)
        .select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("t"))
        .filter(F.size("t") > 0)
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("p"),
    )
    # d-gap encode the doc_id sequence: "delta:tf" joined by ','
    enc = F.expr(
        "transform(sequence(1, size(p)), i -> concat("
        "cast(element_at(p, i).doc_id"
        " - if(i = 1, 0L, element_at(p, i - 1).doc_id) as string),"
        " ':', cast(element_at(p, i).tf as string)))"
    )
    return agg.select(
        "term",
        "df",
        "cf",
        F.slice(F.expr("transform(p, x -> x.doc_id)"), 1, head_k).alias("head_docs"),
        F.md5(F.array_join(enc, ",")).alias("postings_md5"),
    )


NB_SCALE = 1_000_000  # per-token evidence weights in micros


def nb_classify(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer Naive-Bayes-style classifier trained on the corpus itself —
    the shape of CCNet's fastText language-ID / the GPT-3 quality
    classifier: learn per-(token, label) evidence from labeled rows, score
    every doc, emit the argmax label with a margin for threshold-gating.
    Additive integer evidence (Laplace-smoothed conditional frequency in
    micros, truncating div) rather than log-probabilities, so the DuckDB
    twin is bit-exact — the decision boundary is the same family, the
    arithmetic is reproducible.

    Per token t and label l: ``w(t,l) = div(NB_SCALE*(c(t,l)+1), c(l)+V)``
    (c = token occurrences under the label, V = vocab size); a doc's score
    under l sums w over its tokens plus the label prior
    ``div(NB_SCALE*docs_l, docs)``. Tokens unseen under l contribute the
    label's zero-count weight ``w0(l) = div(NB_SCALE, c(l)+V)``.

    Scale shape: the trained model is the SPARSE (token, label, w) frame —
    vocab-bounded, never corpus-bounded; zero-count evidence is added
    analytically as ``(n_tokens - matched) * w0(l)`` so no dense
    vocab × labels cross join ever materializes. Scoring is one join of the
    exploded token stream against the weight frame on the (uniform) token
    key, one (doc, label) rollup, a tiny broadcast of the per-label
    constants, and an argmax window partitioned by doc — all shuffles keyed
    on doc or token, linear end-to-end.
    """
    from pyspark.sql.window import Window

    toks = (
        widen(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("label"),
            tokens_col(F.col(text_col)).alias("t"),
        )
        .filter(F.size("t") > 0)
    )
    tok_stream = toks.select(
        "doc_id", "label", F.explode("t").alias("token")
    )
    # per-doc metadata: |docs| rows x 3 narrow columns, pinned ONCE — priors
    # (docs per label + corpus total) and the scoring pass's doc lengths all
    # derive from it, and each used to re-run the full corpus
    # tokenize+explode subtree instead (round 6, guide §5: 5 corpus tokenize
    # passes per invocation -> 3). At 10^10 docs this is a ~24-byte/doc
    # side table versus two extra full text passes.
    doc_meta = toks.select(
        "doc_id", "label", F.size("t").cast("long").alias("n_tokens")
    ).localCheckpoint()
    # model: sparse (token, label) counts, per-label token totals, vocab size.
    # tl is PINNED (localCheckpoint): it seeds l_tot, vocab AND weights, and
    # without the pin every downstream branch re-executed the corpus
    # tokenize+explode+aggregate — the before-plan re-scanned the documents
    # parquet 22 times for one query (round 6, guide §5: materialize a
    # reused, vocab-bounded intermediate once). Same at 10^10 docs: tl is
    # |vocab x labels|, the cheapest thing in the plan to pin.
    tl = (
        tok_stream.groupBy("token", F.col("label").alias("l"))
        .agg(F.count("*").cast("long").alias("c_tl"))
        .localCheckpoint()
    )
    l_tot = tl.groupBy("l").agg(F.sum("c_tl").cast("long").alias("c_l"))
    vocab = tl.select("token").distinct().agg(
        F.count("*").cast("long").alias("v")
    )
    priors = (
        doc_meta.groupBy(F.col("label").alias("l"))
        .agg(F.count("*").cast("long").alias("docs_l"))
        .join(F.broadcast(doc_meta.agg(F.count("*").cast("long").alias("docs_all"))))
    )
    # |labels|-row frame consumed by weights AND the scoring join: pinned so
    # its priors branch (two corpus scans) does not re-run per consumer.
    # Locally the pin measures within noise of lazy; at corpus scale it is
    # the difference between 2 and 4 extra full passes, so the pin stays.
    label_consts = (
        l_tot.join(F.broadcast(vocab))
        .join(priors, "l")
        .select(
            "l",
            F.expr(f"div({NB_SCALE}, c_l + v)").alias("w0"),
            F.expr(f"div({NB_SCALE} * docs_l, docs_all)").alias("prior"),
            (F.col("c_l") + F.col("v")).alias("denom"),
        )
        .localCheckpoint()
    )
    weights = tl.join(F.broadcast(label_consts.select("l", "denom")), "l").select(
        "token",
        "l",
        F.expr(f"div({NB_SCALE} * (c_tl + 1), denom)").alias("w"),
    )
    # matched evidence per (doc, candidate label)
    matched = (
        tok_stream.join(weights, "token")
        .groupBy("doc_id", "l")
        .agg(
            F.sum("w").cast("long").alias("w_sum"),
            F.count("*").cast("long").alias("n_matched"),
        )
    )
    doc_len = doc_meta.select("doc_id", "n_tokens")
    scored = (
        doc_len.join(F.broadcast(label_consts.select("l", "w0", "prior")))
        .join(matched, ["doc_id", "l"], "left")
        .select(
            "doc_id",
            "l",
            (
                F.coalesce(F.col("w_sum"), F.lit(0))
                + (F.col("n_tokens") - F.coalesce(F.col("n_matched"), F.lit(0)))
                * F.col("w0")
                + F.col("prior")
            ).alias("score_micros"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micros").desc(), F.col("l").asc()
    )
    ranked = scored.select(
        "doc_id",
        "l",
        "score_micros",
        F.row_number().over(w).alias("rn"),
        F.lead("score_micros").over(w).alias("runner_up"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("l").alias("pred_label"),
        F.col("score_micros").cast("long").alias("score_micros"),
        (F.col("score_micros") - F.coalesce("runner_up", "score_micros"))
        .cast("long")
        .alias("margin_micros"),
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically: character classes, bounded/unbounded repeats, \b —
# no lookaround, no backreferences. Scrub ORDER matters (emails first so the
# ip/phone patterns never see address-local digits); both engines apply the
# same sequence.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9][0-9 -]{7,14}[0-9]"


def pii_redact_cols(col: Column) -> tuple[Column, Column, Column, Column]:
    """(n_emails, n_ips, n_phones, redacted_text) column bundle for a text
    column — the per-row core of ``pii_scrub``, exposed so streaming ingest
    can apply the identical redaction sequence to a stream."""
    n_emails = F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), F.lit(0)))
    t1 = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4_RE), F.lit(0)))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), F.lit(0)))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return n_emails, n_ips, n_phones, t3


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for a training corpus — the scrubbing pass (emails,
    IPv4 addresses, international-format phone numbers) every public-web
    corpus build runs before training, with per-doc match counts and the
    md5 of the redacted text as the verifiable contract.

    All three patterns count via ``regexp_extract_all`` and redact via
    ``regexp_replace`` — JVM whole-stage codegen, zero shuffles, one
    projection over the corpus scan; at 100 TB this is a pure map stage
    that pipelines with whatever runs next."""
    n_emails, n_ips, n_phones, t3 = pii_redact_cols(F.col(text_col))
    return docs.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(t3).alias("scrubbed_md5"),
        F.length(t3).cast("long").alias("scrubbed_len"),
    )


def corpus_domain_stats(
    docs: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-(source, lang) corpus diagnostics rollup — the C4/Gopher-paper
    reporting table a corpus build publishes alongside the mix: doc counts,
    exact-dup counts (docs minus distinct text-md5), token totals/means, and
    Gopher-gate pass counts. One corpus scan (the gate threads the grouping
    keys through ``keep``, no self-join), one map-side-combinable rollup
    shuffle on the low-cardinality group keys; count_distinct is Spark's
    standard two-phase partial-distinct expansion."""
    g = gopher_quality(docs, text_col=text_col, keep=(*group_cols, text_col))
    agg = g.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.md5(text_col)).alias("n_unique"),
        F.sum("word_count").alias("total_tokens"),
        F.sum(F.col("gopher_pass").cast("long")).alias("n_gopher_pass"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_exact_dups"),
        "total_tokens",
        F.expr("div(total_tokens, n_docs)").alias("mean_tokens"),
        "n_gopher_pass",
    )


def length_percentiles(
    docs: DataFrame,
    percentiles: tuple[int, ...] = (50, 90, 99),
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-language token-length percentiles — the corpus length
    report (sequence-length planning, truncation budgets, outlier gates)
    published next to the training mix. Percentile definition is the exact
    order statistic: ``p_k = min{ L : #(docs with n_tokens <= L) >=
    ceil(k*n/100) }`` — integer-exact, tie-free, identical in any engine
    (no interpolation, which differs between engines).

    Scale shape: the same bounded-distribution-frame trick as
    :func:`lm_perplexity_buckets` — lengths aggregate to a per-(lang,
    n_tokens) frame bounded by |langs| x max_doc_len rows, the cumulative
    window and the percentile picks run on THAT frame, and the corpus is
    touched exactly once (one map + one groupBy). Never a corpus-scale
    sort or ntile: at 10^10 docs a row-number percentile would globally
    sort every language partition; a value-distribution rollup shuffles
    only the bounded frame.
    """
    from pyspark.sql.window import Window

    lens = (
        widen(docs)
        .select(
            F.col(lang_col).alias("lang"),
            token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    dist = lens.groupBy("lang", "n_tokens").agg(F.count("*").cast("long").alias("c"))
    cum_w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_tokens").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.withColumn("cum", F.sum("c").over(cum_w))
    totals = dist.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"div({int(p)} * n + 99, 100)"),
                F.col("n_tokens"),
            )
        )
        .cast("long")
        .alias(f"p{int(p)}")
        for p in percentiles
    ]
    return (
        cum.join(totals, "lang")
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            *picks,
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )
