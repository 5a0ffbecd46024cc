"""Text-analysis operators: language ID, quality scoring, token
statistics (north-star surface; the reference's text handling stops at
upper/lower/trim/split, ``Operators.java:159-167``).

Everything is built-in-function based (split/regexp/array HOFs) so the
whole module runs inside whole-stage codegen — tokenizing 100 TB is a
scan-speed map with no shuffle until the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import normalize_ws, tokenize
from ..functions.lineage import lineage_cut

# Tiny per-language function-word lexicons (public knowledge).  'zh' is
# charset-detected rather than lexicon-detected, so it has no entry.
LANG_LEXICON: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with", "that"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von", "zu"),
    "es": ("el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "para"),
}

#: English stopwords used by quality scoring (matches queries.py q12).
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

#: BPE-ish token pattern: runs of alphanumerics, or single punctuation.
BPE_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Lexicon-overlap language ID: argmax over languages of
    function-word hits; ties broken lexicographically; no hits -> 'und'.

    The lexicon lives in the plan as literal arrays (a broadcast by
    construction); scoring is an array-intersection per row, no shuffle.
    A char-n-gram profile model drops in behind the same column contract
    when real corpora replace the synthetic fixture."""
    clash = {f"_s_{lang}" for lang in LANG_LEXICON} & set(df.columns)
    if clash:
        raise ValueError(
            f"lang_id helper columns {sorted(clash)} already exist on "
            "the input frame; rename them first (a silent duplicate "
            "would make the tie-break reference ambiguous)"
        )
    toks = tokenize(text_col)
    scores = [
        F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words]))).alias(f"_s_{lang}")
        for lang, words in sorted(LANG_LEXICON.items())
    ]
    # hit-count per language; greatest() then first language reaching it
    df = df.select("*", *scores)
    score_cols = [f"_s_{lang}" for lang in sorted(LANG_LEXICON)]
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    # reverse order so earlier languages win ties
    for lang in sorted(LANG_LEXICON, reverse=True):
        pred = F.when(F.col(f"_s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return df.withColumn(out, pred).drop(*score_cols)


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic quality features + composite score in [0, 1]:

    - n_tokens      : whitespace tokens
    - punct_ratio   : sentence-punctuation chars / total chars
    - stop_ratio    : stopword tokens / tokens
    - quality       : length-saturation x (1 - punct) x stopword prior
    """
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", ""))
    punct_ratio = n_punct / F.greatest(F.length(text_col), F.lit(1))
    # NOT array_intersect (it dedups): count hits with filter for an
    # honest ratio over token occurrences
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        * (1 - punct_ratio)
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    )
    return df.select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_stats_by_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language corpus token statistics: whitespace tokens and a
    BPE-ish regex token count (both scan-side maps; one tiny aggregate
    shuffle keyed on lang)."""
    ws = F.size(tokenize(text_col))
    bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_PATTERN), 0))
    per_doc = df.select("lang", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("sum_ws_tokens"),
        F.round(F.avg("ws_tokens"), 6).alias("avg_ws_tokens"),
        F.sum("bpe_tokens").cast("long").alias("sum_bpe_tokens"),
        F.round(F.avg("bpe_tokens"), 6).alias("avg_bpe_tokens"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every character k-gram, slide a window of w hashes, keep each
    window's minimum — the classic local-sampling fingerprint whose
    guarantee is that any match of length >= k + w - 1 shares a
    fingerprint.

    Everything runs inside ONE scan-side projection built from
    higher-order functions (no explode, no shuffle): the k-gram hashes,
    the per-window minima, and the distinct-minima digest are all
    array expressions in whole-stage codegen.  Output per doc:
    ``n_fingerprints`` (selected minima count) and ``fp_digest`` (md5
    over the sorted distinct minima — a stable content signature whose
    equality means fingerprint-set equality).  md5 stands in for the
    production rolling hash so the oracle reproduces it; a Rabin
    polynomial drops in without changing any plan shape.

    DOCS SHORTER THAN k+w-1 CHARS (after whitespace normalization) are
    DROPPED from the output, not given an empty fingerprint set — they
    have no full window, so no winnowing guarantee exists for them.
    Callers joining on fp_digest must route short docs through exact
    dedup (q11's fingerprint) instead of assuming every doc has a
    row here."""
    t = normalize_ws(text_col)
    grams = f"transform(sequence(1, length(_t) - {k - 1}), i -> md5(substr(_t, i, {k})))"
    mins = (
        f"transform(sequence(1, size(_hs) - {w - 1}), j -> array_min(slice(_hs, j, {w})))"
    )
    return (
        df.select(id_col, t.alias("_t"))
        .filter(F.length("_t") >= k + w - 1)
        .withColumn("_hs", F.expr(grams))
        .withColumn("_fps", F.array_sort(F.array_distinct(F.expr(mins))))
        .select(
            id_col,
            F.size("_fps").cast("long").alias("n_fingerprints"),
            F.md5(F.concat_ws("", "_fps")).alias("fp_digest"),
        )
    )


#: Standard PII patterns (public formats; RE2- and Java-regex
#: compatible: no lookaround, no backrefs — so the same pattern runs in
#: Spark and any RE2-based oracle/engine).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def blocklist_pattern(terms: list[str]) -> str:
    """Whole-word alternation for a term blocklist.  Terms are
    regex-escaped so ``c++`` or ``a.b`` match literally instead of
    breaking (or silently widening) the compiled pattern, and each
    term gets a ``\\b`` only on edges that are word characters — a
    ``\\b`` after a trailing ``+`` sits between two non-word chars and
    can never match, which would silently drop the term."""
    import re as _re

    if not terms:
        raise ValueError("blocklist needs at least one term")
    empties = [t for t in terms if not t.strip()]
    if empties:
        # an empty term compiles to an alternation branch matching at
        # EVERY position — regex_redact would then insert the label
        # between every character of every document
        raise ValueError(
            f"blocklist terms must be non-empty/non-whitespace; got {empties!r}"
        )

    def bound(t: str) -> str:
        pre = r"\b" if _re.match(r"\w", t) else ""
        suf = r"\b" if _re.search(r"\w$", t) else ""
        return pre + _re.escape(t) + suf

    return "(?:" + "|".join(bound(t) for t in terms) + ")"


def regex_redact(
    df: DataFrame,
    patterns: dict[str, str],
    text_col: str = "text",
    out: str = "redacted",
) -> DataFrame:
    """PII / blocklist scrubbing: count and mask each labeled pattern
    (``label -> [LABEL]``), emitting per-label hit counts ``n_<label>``
    plus the scrubbed text — the redaction stage every pre-training
    pipeline runs before a corpus ships.

    Patterns apply SEQUENTIALLY in dict order, each counting against
    the text as already redacted by earlier labels — so overlapping
    patterns never double-count (an email's host can't also be scrubbed
    as a hostname pattern) and ``n_<label>`` is exactly the number of
    masks written for that label, the audit ledger a compliance review
    wants.  Shape for 100 TB: ONE scan-side projection — regexp_count /
    regexp_replace are codegen built-ins, no shuffle, no UDF; the whole
    operator rides along with whatever scan is already happening."""
    taken = set(df.columns)
    clashes = [c for c in [*(f"n_{l}" for l in patterns), out] if c in taken]
    if clashes:
        raise ValueError(f"output column(s) {clashes} already exist in the input")
    cur = F.col(text_col)
    cols = [F.col(c) for c in df.columns]
    counts = []
    for label, pat in patterns.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{label}"))
        # the replacement string is a Java Matcher template: a literal
        # $ or \ in the label would be read as a group reference and
        # throw (or splice matched text into the "redacted" output) —
        # escape both (r7 review)
        mask = "[" + label.upper().replace("\\", "\\\\").replace("$", "\\$") + "]"
        cur = F.regexp_replace(cur, pat, mask)
    return df.select(*cols, *counts, cur.alias(out))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexical relevance ranking: top-k documents for a bag-of-words
    query by BM25 — the keyword-search counterpart to the embedding
    search family (q13/q28/q46: same retrieval surface, different
    signal).

    Shape for 100 TB: the scan-side term filter keeps ONLY postings for
    query terms (|query| is tiny, so the explode's surviving rows are a
    sliver of the corpus); document frequencies and the corpus stats
    (N, avgdl) are one-row/tiny aggregates broadcast back onto the
    postings, so the only real exchange carries one (doc, term) counter
    per posting; the final top-k is a TakeOrdered, never a global sort.
    With a pre-built inverted index (term-bucketed postings table) the
    scan itself prunes to the query terms; this form is the index-free
    baseline.  Scores round to 6dp; ties break by ascending id.
    Duplicate (and case-duplicate) query terms are DEDUPED — a term
    contributes once, identically in the indexed path (repeated keys
    would otherwise crash the literal df map under Spark's
    duplicate-map-key policy; r5 review catch)."""
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(id_col, tokenize(text_col).alias("_toks"))
    dl = toks.select(id_col, F.size("_toks").alias("dl"), F.col("_toks"))
    # ONE corpus stats pass (no explode): N, avgdl, and every query
    # term's document frequency as conditional sums — a deriving-dfreq-
    # from-the-postings formulation re-tokenizes the corpus a 3rd time
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    tf = (
        dl.select(id_col, "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    from itertools import chain

    df_map = F.create_map(
        *chain.from_iterable((F.lit(t), F.col(f"_df_{i}")) for i, t in enumerate(terms))
    )
    return _bm25_score_topk(
        tf.crossJoin(F.broadcast(stats)),
        F.element_at(df_map, F.col("term")),
        k1, b, id_col, k,
    )


def _bm25_score_topk(tf_frame: DataFrame, df_t, k1: float, b: float,
                     id_col: str, k: int) -> DataFrame:
    """Shared BM25 scoring tail of :func:`bm25_topk` and
    :func:`bm25_topk_indexed` (they were verbatim copies — factored r7
    so a formula/tie-break fix cannot reach one and silently miss the
    other, which would make the indexed path diverge from its
    index-free oracle twin).  ``tf_frame`` carries (id_col, tf, dl,
    n_docs, avgdl); ``df_t`` is the per-term document-frequency column
    expression (map lookup in the index-free form, joined column in
    the indexed form)."""
    idf = F.log((F.col("n_docs") - df_t + 0.5) / (df_t + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf_frame.groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def _term_shard_py(term: str, n_shards: int, seed: str) -> int:
    """Driver-side twin of ``sampling.shard_col`` (md5(seed|term),
    first 7 hex digits mod n) — the probe must compute the same shard
    the index writer did."""
    import hashlib

    h = hashlib.md5(f"{seed}|{term}".encode()).hexdigest()[:7]
    return int(h, 16) % n_shards


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document's token stream into overlapping context
    windows: chunk ``i`` covers tokens ``[i*stride, i*stride+chunk)``
    (1 <= stride <= chunk; chunk - stride tokens of overlap so no
    boundary context is lost) — the standard corpus->training-window
    prep stage.  Zero-token docs emit no chunks.  Every emitted chunk
    contributes at least one NEW token: a final window that would be a
    strict subset of the previous one is not produced (the old
    floor((n-1)/stride)+1 count emitted e.g. [48,64) after [0,64) at
    n=64 — duplicated suffix tokens feeding the q61 packer; r5 review
    catch).

    Scale shape: tokenize + a ``transform(sequence(...))`` explode in
    ONE scan-side projection — no shuffle, no UDF; chunking 100 TB is
    one pass at scan speed.  Output rows carry the token array of each
    chunk; callers project/hash/pack downstream (q61's packer takes
    these directly)."""
    if not (1 <= stride <= chunk):
        raise ValueError(f"need 1 <= stride <= chunk, got {stride=} {chunk=}")
    toks = tokenize(text_col)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk)).cast("double") / stride) + 1).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(toks, i * stride + 1, chunk).alias("toks"),
        ),
    )
    return (
        df.filter(n > 0)
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.toks").alias("chunk_toks"),
        )
    )


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    seed: str = "bm25shard",
    force: bool = False,
    source_path: str | None = None,
) -> None:
    """Materialize the inverted index q59 documents as its scale path:
    a postings table (term, doc_id, tf, dl) written
    ``partitionBy(term-shard)``, per-term document frequencies in the
    same layout, and the one-row corpus stats (N, avgdl).

    The shard is the md5 draw of the TERM, so a query's terms map to a
    handful of shard directories and a probe prunes every other shard
    at the source — the build pays one explode + shuffle ONCE and every
    subsequent query reads only its terms' partitions (the same
    build-once/probe-many trade as the IVF index, ``similarity.
    build_ivf_index``).  dfreq AND the corpus stats derive from
    re-reading the written postings, so the corpus is tokenized exactly
    once; the only other touch is a column-pruned doc count (docs with
    zero tokens have no postings but still belong in N and avgdl).  At
    100 TB: more shards (production: 1024) and a bucketed sort within
    shards; the layout and probe are unchanged.

    IDEMPOTENT: a completed build with the same parameters at ``path``
    is reused (manifest check, :mod:`.indexing`) — build-once/
    probe-many.  A parameter change rebuilds automatically; a corpus
    change is detected from ``source_path``'s metadata fingerprint when
    given (else the caller's ``force=True``)."""
    from .indexing import (
        invalidate_manifest,
        manifest_matches,
        params_fingerprint,
        source_params,
        write_manifest,
    )
    from .sampling import shard_col

    spark = docs.sparkSession
    fp = params_fingerprint(
        {"id": id_col, "text": text_col, "n_shards": n_shards, "seed": seed, "v": 1}
        | source_params(spark, source_path)
    )
    if not force and manifest_matches(spark, path, fp):
        return
    # invalidate FIRST: this index's components live in SUBDIRECTORIES
    # (postings/dfreq/stats/probe_params), so overwriting them does not
    # remove {path}/_manifest the way the whole-dir IVF/layout builders
    # do — a crash mid-rebuild would leave the old manifest validating
    # a mixed-generation index (r7 review)
    invalidate_manifest(spark, path)

    toks = docs.select(id_col, tokenize(text_col).alias("_toks"))
    dl = toks.select(id_col, F.size("_toks").alias("dl"), F.col("_toks"))
    post = (
        dl.select(id_col, "dl", F.explode("_toks").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("shard", shard_col("term", n_shards, seed=seed))
    )
    # repartition on shard first: each shard directory gets ONE file
    # per write instead of one per upstream task — listing/probing a
    # shard stays O(files-per-shard), not O(write parallelism)
    post.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/postings"
    )
    written = spark.read.parquet(f"{path}/postings")
    written.groupBy("shard", "term").agg(F.count("*").alias("df_t")).repartition(
        "shard"
    ).write.mode("overwrite").partitionBy("shard").parquet(f"{path}/dfreq")
    n_docs = docs.select(id_col).count()
    sum_dl = (
        written.select(id_col, "dl").distinct().agg(F.sum("dl")).collect()[0][0] or 0
    )
    spark.createDataFrame(
        [(n_docs, sum_dl / n_docs if n_docs else 0.0)], "n_docs: bigint, avgdl: double"
    ).write.mode("overwrite").parquet(f"{path}/stats")
    # self-describing sharding: the probe reads (n_shards, seed) from
    # here instead of trusting its caller to repeat the build's values
    spark.createDataFrame(
        [(n_shards, seed)], "n_shards: int, seed: string"
    ).write.mode("overwrite").parquet(f"{path}/probe_params")
    # commit marker LAST: a crash above leaves no manifest -> full rebuild
    write_manifest(spark, path, fp)


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "bm25shard",
) -> DataFrame:
    """Probe the materialized inverted index: same score, same ties,
    same oracle as ``bm25_topk`` — what changes is WHERE the term
    filter runs.  The probe computes the query terms' shards
    driver-side and reads ONLY those partitions (partition pruning at
    the source listing), then row-filters to the exact terms; stats
    and dfreq broadcast onto the postings and the top-k is a
    TakeOrdered.  Cost is O(postings of the query's terms), not
    O(corpus).  Duplicate query terms dedup exactly as in
    :func:`bm25_topk`.

    The index is SELF-DESCRIBING: the build writes its (n_shards,
    seed) beside the postings and the probe reads them from there — a
    probe computing shard ids under a different modulus than the build
    would prune the partitions that actually hold the query terms and
    return silently wrong top-k (r5 review catch).  The ``n_shards``/
    ``seed`` arguments are only the fallback for legacy indexes
    without the sidecar."""
    from pyspark.errors import AnalysisException

    terms = sorted({t.lower() for t in query_terms})
    try:
        pp = spark.read.parquet(f"{path}/probe_params").head()
        # head() is None when the sidecar directory exists but holds no
        # rows (e.g. an interrupted write) — fall back to the legacy
        # arguments exactly as for a missing sidecar (r5 advice).
        if pp is not None:
            n_shards, seed = int(pp.n_shards), str(pp.seed)
    except AnalysisException:  # legacy index without the sidecar
        pass
    shards = sorted({_term_shard_py(t, n_shards, seed) for t in terms})
    post = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("shard").isin(shards) & F.col("term").isin(terms))
    )
    dfreq = (
        spark.read.parquet(f"{path}/dfreq")
        .filter(F.col("shard").isin(shards) & F.col("term").isin(terms))
        .select("term", "df_t")
    )
    stats = spark.read.parquet(f"{path}/stats")
    return _bm25_score_topk(
        post.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats)),
        F.col("df_t"),
        k1, b, id_col, k,
    )


def term_frequencies_from_postings(spark, path: str) -> DataFrame:
    """(term, ctf) corpus term frequencies read from the materialized
    BM25 postings (:func:`build_bm25_index`) — ZERO corpus scans.

    This table IS the unigram language model: build the index once,
    derive the LM from it, and score any batch of documents against it
    (:func:`unigram_logprob` with ``freq_table=``) without ever
    re-tokenizing the corpus."""
    return (
        spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
    )


def unigram_logprob(
    docs: DataFrame,
    freq_table: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_ctf: float | None = None,
) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap perplexity
    proxy for corpus quality filtering (q68).  Zero-token docs drop.

    OOV POLICY: with a frozen external ``freq_table``, tokens absent
    from it are — by default — DROPPED by the inner probe join, which
    INFLATES a garbage doc's score (90% invented tokens -> scored on
    the clean 10%) and makes ``n_tokens`` the matched count, not the
    doc's (a 100%-OOV doc vanishes).  That default matches the SQL
    oracles and is harmless in the self-derived case (every token is
    in its own corpus table, OOV cannot occur), but a quality-filter
    deployment scoring NEW batches should set ``oov_ctf`` (e.g. 0.5, a
    sub-singleton pseudo-count): unknown tokens then score
    log(oov_ctf/N) — heavily penalized instead of ignored — and
    ``n_tokens`` counts every token (r5 review catch).

    ``freq_table`` — a prebuilt (term, ctf) corpus distribution, e.g.
    :func:`term_frequencies_from_postings` — is the DEFAULT POSTURE AT
    SCALE: the docs being scored are tokenized once and probe the
    table, so scoring a new batch costs O(batch), not O(corpus), and
    the probability model stays frozen while batches stream through
    (what a production pipeline wants: new docs are scored against the
    corpus LM, not against themselves).  Without it, the distribution
    is derived in-query from ``docs`` itself (three scans of the text —
    the self-contained demonstration form; see also q74, which computes
    scores for the WHOLE corpus purely from the index)."""
    toks = docs.select(id_col, F.explode(tokenize(text_col)).alias("term"))
    if freq_table is None:
        # self-derived distribution: toks feeds the frequency table,
        # its total AND the probe join, each shuffled by a different
        # key, so exchange reuse cannot share the tokenize pass — one
        # lazy lineage cut makes it run once instead of 3x (r12 opt,
        # the r6 single-upstream-pass rule; the frozen-freq_table
        # deployment path has a single consumer and needs no cut).
        # local by default, reliable under
        # $SPARK_GRAFT_CHECKPOINT_DIR (functions.lineage)
        toks = lineage_cut(toks)
        freq_table = toks.groupBy("term").agg(F.count("*").alias("ctf"))
    tot = freq_table.agg(F.sum("ctf").alias("n"))
    if oov_ctf is None:
        probed = toks.join(freq_table, "term")
    else:
        probed = toks.join(freq_table, "term", "left").withColumn(
            "ctf", F.coalesce(F.col("ctf").cast("double"), F.lit(float(oov_ctf)))
        )
    return (
        probed.crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("ctf") / F.col("n"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 50,
    min_sim: float = 0.2,
) -> DataFrame:
    """Doc-doc cosine similarity in tf-idf space — the weighted
    bag-of-words near-dup/duplicate-topic detector sitting between
    exact token Jaccard (set overlap, unweighted) and embedding cosine
    (q18; needs a model).  Paraphrases that share rare vocabulary
    score high here even when shingle overlap is low.

    The declared space is RARE terms only: document frequency <=
    ``max_df``.  That is both the semantics (stop-terms carry no
    topical identity; tf-idf's own idf already asymptotes them to 0)
    and the scale bound — pairs come from the inverted-index join on
    shared terms, so work is Σ df² <= |postings| x max_df, never
    |docs|² (the df cap is the mega-bucket cap, modeled exactly by the
    SQL oracle).  Norms are computed over the same capped vocabulary,
    so cosine stays a true cosine in the truncated space.

    idf = ln(N/df) with N = docs holding >= 1 token; weights
    w = tf x idf.  One token-explode scan feeds tf, df, norms, and the
    pair join; everything is built-in (codegen) with partial aggs
    before every shuffle.  Output: (doc_a, doc_b, cos_sim ROUND 6)
    with cos_sim >= ``min_sim``."""
    tf = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.explode(tokenize(text_col)).alias("_w"),
        )
        .groupBy("_id", "_w")
        .agg(F.count("*").alias("_tf"))
        # the (doc, term, tf) frame feeds N, df, weights, norms AND both
        # pair-join legs: one lazy lineage cut instead of re-running the
        # scan + explode + aggregate per consumer (the r6 single-
        # upstream-pass rule); local by default, reliable under
        # $SPARK_GRAFT_CHECKPOINT_DIR (functions.lineage)
    )
    tf = lineage_cut(tf)
    n = tf.agg(F.countDistinct("_id").cast("double").alias("_n"))
    dfreq = tf.groupBy("_w").agg(F.count("*").alias("_df")).filter(
        F.col("_df") <= max_df
    )
    w = (
        tf.join(dfreq, "_w")
        .crossJoin(F.broadcast(n))
        .select(
            "_id", "_w", (F.col("_tf") * F.log(F.col("_n") / F.col("_df"))).alias("_wt")
        )
    )
    # a doc whose every surviving term has df == N carries weight 0
    # everywhere: zero norm, cosine undefined — excluded (the inner
    # joins below drop its pairs; a bare /0 errors under ANSI mode)
    norm = (
        w.groupBy("_id")
        .agg(F.sqrt(F.sum(F.col("_wt") * F.col("_wt"))).alias("_nrm"))
        .filter(F.col("_nrm") > 0.0)
    )
    a = w.select(F.col("_w"), F.col("_id").alias("_ia"), F.col("_wt").alias("_wa"))
    b = w.select(F.col("_w"), F.col("_id").alias("_ib"), F.col("_wt").alias("_wb"))
    dot = (
        a.join(b, "_w")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    na = norm.select(F.col("_id").alias("_ia"), F.col("_nrm").alias("_na"))
    nb = norm.select(F.col("_id").alias("_ib"), F.col("_nrm").alias("_nb"))
    return (
        dot.join(na, "_ia")
        .join(nb, "_ib")
        .select(
            F.col("_ia").alias("doc_a"),
            F.col("_ib").alias("doc_b"),
            F.round(F.col("_dot") / (F.col("_na") * F.col("_nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_sim)
    )
