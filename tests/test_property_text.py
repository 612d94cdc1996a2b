"""Property tests: new text/session operators vs pure-Python references."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_service_spark.operators import sessions, textquality

WORDS = ["spark", "window", "merge", "data", "row", "x1", "x2"]


def _py_keyword_scores(docs, terms, k1=1200, b=750):
    """Pure-Python twin of textquality.keyword_topk's integer formula."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    n = len(docs)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = (1000 * sum_dl) // n
    out = {}
    for d, _ in docs:
        dl = len(toks[d])
        score = 0
        for term in terms:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            df = sum(1 for dd, _ in docs if term in toks[dd])
            norm = (1000 - b) + (b * dl * 1000) // avgdl
            tf_part = (1000000 * tf * (1000 + k1)) // (1000 * tf + (k1 * norm) // 1000)
            idf_millis = (1000 * (n - df + 1)) // (df + 1)
            score += (tf_part * idf_millis) // 1000
        if score > 0:
            out[d] = score
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
        min_size=2, max_size=8,
    )
)
def test_keyword_topk_matches_python_reference(spark, doc_words):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score_micros"]
        for r in textquality.keyword_topk(df, ["spark", "merge"], k=100).collect()
    }
    assert got == _py_keyword_scores(docs, ["spark", "merge"])


def _py_sessions(events, gap):
    """(user, session_id) -> [epochs]; sessions split on gap > ``gap``."""
    out = {}
    by_user = {}
    for u, _e, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        sid = 0
        prev = None
        for t in sorted(ts):
            if prev is None or t - prev > gap:
                sid += 1
            out.setdefault((u, sid), []).append(t)
            prev = t
    return {
        k: (len(v), min(v), max(v), max(v) - min(v)) for k, v in out.items()
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_session_rollup_matches_python_reference(spark, user_times):
    base = dt.datetime(2026, 1, 1)
    events = [
        (u, i, off) for i, (u, off) in enumerate(user_times)
    ]
    rows = [(u, e, base + dt.timedelta(seconds=off)) for u, e, off in events]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["start_epoch"], r["end_epoch"], r["duration_s"]
        )
        for r in sessions.session_rollup(df, gap_seconds=300).collect()
    }
    base_epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    want = {
        k: (n, base_epoch + lo, base_epoch + hi, d)
        for k, (n, lo, hi, d) in _py_sessions(events, 300).items()
    }
    assert got == want


def _py_lm_scores(docs):
    """Pure-Python twin of textquality.lm_bigram_score's integer formula."""
    import re

    toks = {d: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for d, t in docs}
    c_bg: dict[tuple[str, str], int] = {}
    c_w1: dict[str, int] = {}
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            c_bg[(a, b)] = c_bg.get((a, b), 0) + 1
            c_w1[a] = c_w1.get(a, 0) + 1
    out = {}
    for d, _ in docs:
        ws = toks[d]
        if len(ws) < 2:
            continue
        ms = [(1000 * c_bg[(a, b)]) // c_w1[a] for a, b in zip(ws, ws[1:])]
        out[d] = (len(ms), sum(ms), sum(ms) // len(ms))
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
        min_size=2, max_size=8,
    )
)
def test_lm_bigram_score_matches_python_reference(spark, doc_words):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_millis"], r["lm_millis"])
        for r in textquality.lm_bigram_score(df).collect()
    }
    assert got == _py_lm_scores(docs)


def test_lm_bigram_score_partition_invariant(spark):
    docs = [(i, f"the quick fox {i % 3} jumps the fox") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, textquality.lm_bigram_score(df).collect()))
    b = sorted(map(tuple, textquality.lm_bigram_score(df.repartition(7)).collect()))
    assert a == b and len(a) == 40


def test_lm_buckets_value_cutoffs_match_python_reference(spark):
    """Bucket assignment == pure-Python value-cutoff terciles (cutoff = the
    lm_millis of the ceil(n/3)/ceil(2n/3)-ranked doc per language, ties
    share a bucket), buckets partition the scored docs, and the result is
    partition-invariant."""
    docs = [
        (i, f"the quick fox {i % 5} jumps over the lazy dog {i % 7} again",
         ["en", "de"][i % 2])
        for i in range(60)
    ] + [(100, "solo", "fr")]  # 1 token -> no bigrams -> out of scope
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")

    scores = _py_lm_scores([(d, t) for d, t, _ in docs])
    lang_of = {d: lg for d, _, lg in docs}
    by_lang: dict[str, list[int]] = {}
    for d, (_, _, lm) in scores.items():
        by_lang.setdefault(lang_of[d], []).append(lm)
    want: dict[tuple[str, str], list[int]] = {}
    for lg, vals in by_lang.items():
        ordered = sorted(vals, reverse=True)
        n = len(ordered)
        head_cut = ordered[(n + 2) // 3 - 1]
        mid_cut = ordered[(2 * n + 2) // 3 - 1]
        for v in vals:
            b = "head" if v >= head_cut else ("middle" if v >= mid_cut else "tail")
            want.setdefault((lg, b), []).append(v)

    for probe in (df, df.repartition(7)):
        got = {
            (r["lang"], r["bucket"]): (r["n_docs"], r["min_lm_millis"], r["max_lm_millis"])
            for r in textquality.lm_perplexity_buckets(probe).collect()
        }
        assert got == {
            k: (len(v), min(v), max(v)) for k, v in want.items()
        }
        assert sum(n for n, _, _ in got.values()) == len(scores)
        assert not any(lg == "fr" for lg, _ in got)  # no-bigram doc dropped


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=10),
        min_size=2, max_size=8,
    )
)
def test_dup_ngram_coverage_matches_python_reference(spark, doc_words):
    """Random small corpora: distinct-3-gram doc frequency and per-doc dup
    coverage == a pure-Python census."""
    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    per_doc = {}
    for d, t in docs:
        ws = [w for w in t.split() if w]
        if len(ws) >= 3:
            per_doc[d] = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
    df_count: dict[str, int] = {}
    for grams in per_doc.values():
        for g in grams:
            df_count[g] = df_count.get(g, 0) + 1
    want = {
        d: (
            len(grams),
            sum(1 for g in grams if df_count[g] > 1),
            (1000 * sum(1 for g in grams if df_count[g] > 1)) // len(grams),
        )
        for d, grams in per_doc.items()
    }
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_dup_ngrams"], r["dup_permille"])
        for r in textquality.dup_ngram_coverage(sdf, n=3).collect()
    }
    assert got == want


def test_vocab_topk_counts_and_deterministic_cut(spark):
    """Occurrence totals, distinct-doc counts, and the (count DESC, token
    ASC) tie-break at the k-cut all match a Python reference."""
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry date"),
        (3, "apple elderberry elderberry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["token"], r["n_occurrences"], r["n_docs"])
        for r in textquality.vocab_topk(df, k=4).collect()
    ]
    # occurrences: apple 3, banana 2, cherry 2, elderberry 2, date 1
    # ties at 2 break token-ASC: banana, cherry, elderberry -> k=4 cuts date
    assert got == [
        ("apple", 3, 2),
        ("banana", 2, 2),
        ("cherry", 2, 2),
        ("elderberry", 2, 1),
    ]


def test_dup_ngram_coverage_counts_shared_spans(spark):
    """Distinct-n-gram coverage: the shared 3-gram counts once per doc,
    within-doc repeats collapse, short docs drop out."""
    rows = [
        (1, "a b c d e"),        # 3-grams: 'a b c', 'b c d', 'c d e'
        (2, "a b c x y"),        # shares 'a b c' with doc 1
        (3, "z z z z"),          # 'z z z' twice -> 1 distinct, unshared
        (4, "p q"),              # < 3 tokens -> out of scope
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_dup_ngrams"], r["dup_permille"])
        for r in textquality.dup_ngram_coverage(df, n=3).collect()
    }
    assert got == {1: (3, 1, 333), 2: (3, 1, 333), 3: (1, 0, 0)}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=14),
        min_size=1, max_size=6,
    )
)
def test_winnow_fingerprints_matches_python_on_random_docs(spark, doc_words):
    """Random corpora incl. the short-doc edge cases (< k tokens -> no
    fingerprints; k <= tokens < k+w-1 -> single window): Spark == Python."""
    import hashlib
    import re as _re

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def py_winnow(text, k=3, w=2):
        ws = [x for x in _re.split(r"[^a-z0-9]+", text.lower()) if x]
        if len(ws) < k:
            return set()
        hs = [h32(" ".join(ws[i:i + k])) for i in range(len(ws) - k + 1)]
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    docs = [(i, " ".join(ws)) for i, ws in enumerate(doc_words)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in textquality.winnow_fingerprints(df, k=3, w=2).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    want = {d: py_winnow(t) for d, t in docs if py_winnow(t)}
    assert got == want


def test_winnow_fingerprints_guarantee_and_python_twin(spark):
    """Pure-Python winnow twin (k=4 word-grams, w=4 windows, h32 hashes)
    matches exactly; any shared run of >= w+k-1 = 7 words yields a shared
    fingerprint; a doc with fewer than w k-grams still keeps one."""
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def py_winnow(text, k=4, w=4):
        ws = [x for x in __import__("re").split(r"[^a-z0-9]+", text.lower()) if x]
        if len(ws) < k:
            return set()
        hs = [h32(" ".join(ws[i:i + k])) for i in range(len(ws) - k + 1)]
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    shared = "one two three four five six seven"  # 7 words = w+k-1
    rows = [
        (1, "alpha beta " + shared + " gamma delta epsilon"),
        (2, shared + " zeta eta theta iota kappa"),
        (3, "tiny little four words more"),   # 5 tokens -> 2 k-grams < w
        (4, "abc def"),                       # < k tokens -> no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set] = {}
    for r in textquality.winnow_fingerprints(df, k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for d, t in rows:
        assert got.get(d, set()) == py_winnow(t), d
    assert got[1] & got[2], "shared 7-word run must share a fingerprint"
    assert len(got[3]) == 1


def test_pii_scrub_counts_and_redacts(spark):
    """Crafted cases: multiple matches per doc, the email->ip->phone order
    (an address's digits are gone before the ip/phone passes), near-misses
    (3-octet dotted number, short digit runs) left untouched, and the
    scrubbed md5 == md5 of the expected redacted text."""
    import hashlib

    rows = [
        (1, "write a@b.io or c.d+e@f-g.co today"),          # 2 emails
        (2, "server 10.0.0.1 and 192.168.255.254 down"),    # 2 ips
        (3, "call +1 555-0138 or +44 20 7946 0958 now"),    # 2 phones
        (4, "version 1.2.3 build 7 plus 12345 units"),      # near-misses only
        (5, "x9@10.0.0.5.net then 10.0.0.5 rang +1 555-0100"),  # order matters
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textquality.pii_scrub(df).collect()}

    want_text = {
        1: "write <EMAIL> or <EMAIL> today",
        2: "server <IP> and <IP> down",
        3: "call <PHONE> or <PHONE> now",
        4: "version 1.2.3 build 7 plus 12345 units",
        # the email pattern eats 'x9@10.0.0.5.net' whole, so only the bare
        # ip remains for the ip pass and the phone pass sees no address
        5: "<EMAIL> then <IP> rang <PHONE>",
    }
    want_counts = {1: (2, 0, 0), 2: (0, 2, 0), 3: (0, 0, 2), 4: (0, 0, 0), 5: (1, 1, 1)}
    for d, (ne, ni, np_) in want_counts.items():
        assert (got[d]["n_emails"], got[d]["n_ips"], got[d]["n_phones"]) == (ne, ni, np_), d
        assert got[d]["scrubbed_md5"] == hashlib.md5(want_text[d].encode()).hexdigest(), d
        assert got[d]["scrubbed_len"] == len(want_text[d]), d


def test_source_exemplars_rank_and_tiebreak(spark):
    """Grouped top-k: per source, top-3 by token count with ties broken by
    smaller doc_id; groups smaller than k emit all members."""
    import __spark_entry__ as entrymod

    rows = [
        (1, "a b c d e", "s1"),   # 5 tokens
        (2, "a b c d e", "s1"),   # tie with 1 -> doc 1 ranks first
        (3, "a b", "s1"),
        (4, "a", "s1"),           # rank 4 -> cut
        (5, "x y z", "s2"),       # lone doc in s2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    from pyspark.sql import functions as F

    from crawler_service_spark.operators import textquality

    scored = df.select(
        "doc_id", "source", F.lit("en").alias("lang"),
        F.size(textquality.tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    got = {
        (r["source"], r["rank"]): r["doc_id"]
        for r in scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= entrymod.EXEMPLARS_PER_SOURCE)
        .collect()
    }
    assert got == {("s1", 1): 1, ("s1", 2): 2, ("s1", 3): 3, ("s2", 1): 5}


def test_corpus_domain_stats_matches_python_reference(spark):
    import hashlib
    import re

    rows = []
    for i in range(30):
        src = ["web", "wiki"][i % 2]
        lang = ["en", "de", "fr"][i % 3]
        # make some exact dups within a group and a mix of gopher pass/fail
        text = ("the and of to a " * 12) if i % 4 else "tiny"
        if i % 5 == 0:
            text = text + f" unique{i}"
        rows.append((i, text, lang, src))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")

    def words(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    exp: dict[tuple[str, str], list] = {}
    for _i, text, lang, src in rows:
        ws = words(text)
        nw = len(ws)
        mwl = (1000 * sum(len(w) for w in ws)) // nw if nw else 0
        alpha = (1000 * sum(1 for w in ws if re.search("[a-z]", w))) // nw if nw else 0
        stop = sum(ws.count(w) for w in ["the", "and", "of", "to", "a"])
        gp = 50 <= nw <= 100_000 and 3000 <= mwl <= 10_000 and alpha >= 800 and stop >= 2
        e = exp.setdefault((src, lang), [0, set(), 0, 0])
        e[0] += 1
        e[1].add(hashlib.md5(text.encode()).hexdigest())
        e[2] += nw
        e[3] += int(gp)
    got = {
        (r["source"], r["lang"]): (
            r["n_docs"], r["n_unique"], r["n_exact_dups"], r["total_tokens"],
            r["mean_tokens"], r["n_gopher_pass"],
        )
        for r in textquality.corpus_domain_stats(df).collect()
    }
    assert got == {
        k: (n, len(h), n - len(h), tt, tt // n, gp)
        for k, (n, h, tt, gp) in exp.items()
    }


def test_fingerprint_int64_exact_on_long_docs(spark):
    """The order-sensitive fingerprint must stay int64-exact on long docs:
    the raw sum of (pos+1)*h32 grows as n^2 * 2^30 and silently wraps int64
    (non-ANSI) at ~10^5 tokens — inside the Gopher 100k-word bound. With the
    per-term mod-2^31 residue the running sum is bounded by n * 2^31; the
    value is unchanged (residue sum ≡ raw sum mod 2^31). Verified against an
    arbitrary-precision Python twin at a length where the raw formula
    provably overflows."""
    n = 200_000
    tokens = [f"w{i}" for i in range(n)]
    text = " ".join(tokens)
    # the RAW formula would overflow: prove the guard is exercised
    raw = sum((i + 1) * textquality.h32_py(t) for i, t in enumerate(tokens))
    assert raw > 2**63 - 1
    want = raw % 2**31
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = textquality.fingerprint(docs).collect()
    assert len(got) == 1
    assert got[0]["fingerprint"] == want
