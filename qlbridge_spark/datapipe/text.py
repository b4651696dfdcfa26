"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Every operator is a pure Column expression (regexp_count / split /
higher-order functions) so it runs inside whole-stage codegen. Each has an
exactly-matching ANSI-SQL oracle form (see __spark_entry__.py) — the
formulas are deliberately engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic mini stopword lists for n-gram/stopword language ID.
# (A real pipeline ships full frequency tables; the *operator shape* —
# per-language whole-word regexp counts + argmax — is the same.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "los", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "dans", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def _marker_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def lang_counts(text: Column) -> dict[str, Column]:
    """Per-language whole-word marker hit counts (one bounded regex scan
    per language; measured faster than a shared tokenize-and-intersect
    at this marker-set size — the real dp04 cost was the argmax chain,
    see lang_id)."""
    t = F.lower(text)
    return {lang: F.regexp_count(t, F.lit(_marker_pattern(words))) for lang, words in LANG_MARKERS.items()}


def lang_id(text: Column, min_hits: int = 1) -> Column:
    """Stopword-marker language ID: per-language whole-word hit counts,
    argmax with deterministic tiebreak (alphabetically first language
    wins ties); 'unknown' when no language reaches ``min_hits``.

    The argmax is ONE ``array_max`` over (count, priority, lang) structs
    — struct comparison is lexicographic, so max = highest count, ties
    broken by priority (earlier alphabetical = higher). The previous
    folded when-chain re-embedded every count subexpression in each
    later branch (≈2^k blow-up for k languages: 1.5 s for 5k docs at
    sf0.1; this form is ~15× faster at identical output)."""
    counts = lang_counts(text)
    langs = sorted(counts)
    entries = [
        F.struct(
            counts[lang].alias("n"),
            F.lit(len(langs) - i).alias("pri"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    # 'unknown' rides along as a sentinel at n = min_hits-1 with top
    # priority: it wins exactly when no language reaches min_hits, and
    # the result is a SINGLE field access (each count evaluated once —
    # a separate when(best.n >= min_hits) guard would rebuild the array)
    entries.append(
        F.struct(
            F.lit(min_hits - 1).cast("int").alias("n"),
            F.lit(len(langs) + 1).alias("pri"),
            F.lit("unknown").alias("lang"),
        )
    )
    return F.array_max(F.array(*entries))["lang"]


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' (split on runs of whitespace) or 'bpe'
    (BPE-ish: letter runs, digit runs, single punctuation marks — the
    pre-tokenization regex family used by GPT-style BPE tokenizers)."""
    if mode == "whitespace":
        return F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")))
    if mode == "bpe":
        return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    raise ValueError(f"unknown token_count mode {mode!r}")


def quality_score(text: Column, n_chars: Column | None = None) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4·length_score + 0.3·diversity + 0.3·(1 − punct_density).

    - length_score: min(n_chars/500, 1) — favors non-trivial docs
    - diversity: distinct_tokens / tokens — penalizes boilerplate repetition
    - punct_density: punctuation chars / chars — penalizes markup/garbage
    """
    nc = (n_chars if n_chars is not None else F.char_length(text)).cast("double")
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit(""))
    n_toks = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    # punctuation-char count: single-char-class regexp_count. The
    # translate()-length-difference form was A/B'd same-JVM and is ~20%
    # SLOWER (translate allocates a translated copy of the whole text per
    # row; the regex is a single scan with no allocation).
    punct = F.regexp_count(text, F.lit(r"[.,;:!?()\[\]{}<>/\\|@#$%^&*~`]")).cast("double")
    length_score = F.least(nc / F.lit(500.0), F.lit(1.0))
    diversity = F.when(n_toks > 0, n_distinct / n_toks).otherwise(F.lit(0.0))
    punct_density = F.when(nc > 0, punct / nc).otherwise(F.lit(1.0))
    return F.lit(0.4) * length_score + F.lit(0.3) * diversity + F.lit(0.3) * (F.lit(1.0) - punct_density)


def fingerprint(text: Column, mode: str = "sorted_tokens") -> Column:
    """Document fingerprint for clustering/dedup:
    - 'sorted_tokens': md5 of the sorted distinct lowercase token set
      (OpenRefine-style key collision fingerprint)
    - 'rolling': xxhash64 of whitespace-normalized lowercase text
      (cheap rolling-hash-equivalent content key)
    """
    if mode == "sorted_tokens":
        toks = F.array_sort(F.array_distinct(F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit(""))))
        return F.md5(F.array_join(toks, " "))
    if mode == "rolling":
        norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
        return F.xxhash64(norm).cast("string")
    raise ValueError(f"unknown fingerprint mode {mode!r}")


def tfidf_top_terms(
    df,
    id_col: str,
    text_col: str,
    k: int = 3,
    idf_scale: int = 1000,
):
    """Top-``k`` characteristic terms per document by tf·idf — keyword
    extraction for corpus exploration/curation.

    Integer-exact scoring for cross-engine determinism: instead of
    tf·ln(N/df) (whose last-ulp differences between libm implementations
    can flip ranks), score = tf · floor(idf_scale·N / df) — same ordering
    family, exact 64-bit integer arithmetic everywhere. Ties break by term
    (ascending), then deterministic.

    Scale shape: explode terms → per-(doc,term) counts (map-side partial
    agg) → doc-frequency per term (second small agg) → broadcast-joinable
    DF table → per-doc top-k window (per-doc cardinality is tiny).
    Returns (id, term, tf, df, score, rank).
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\W+"), lambda t: t != F.lit(""))).alias("term"),
    )
    tf = terms.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.floor(F.lit(idf_scale) * F.col("__n") / F.col("df")).cast("long"))
        .drop("__n")
    )
    w = Window.partitionBy("__id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__id").alias(id_col), "term", "tf", "df", "score", "rank")
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
):
    """Explode documents into fixed-size token windows with overlap — the
    standard LLM training-data pre-processing step (context-window
    packing happens downstream; this is the per-document split).

    Pure Column expressions end to end: tokenize once, compute the chunk
    count arithmetically, slice windows with ``transform`` over a
    ``sequence``, ``posexplode`` to one row per chunk — no UDF, stays in
    whole-stage codegen, embarrassingly parallel (no shuffle at all: the
    explode happens in the scan stage).

    Chunk layout: chunk i covers tokens ``[i·stride, i·stride +
    chunk_tokens)`` with ``stride = chunk_tokens - overlap``; the last
    chunk may be short. A document with ``n`` tokens yields
    ``max(1, ceil((n - overlap) / stride))`` chunks; empty documents
    yield none (a training pipeline drops them).

    Returns (id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap ({overlap}) must be smaller than chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    n = F.size(toks)
    n_chunks = F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, chunk_tokens), " "),
    )
    return (
        df.where(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .select(
            id_col,
            "chunk_idx",
            F.size(F.filter(F.split(F.col("chunk_text"), r"\s+"), lambda t: t != F.lit(""))).alias("n_chunk_tokens"),
            "chunk_text",
        )
    )


#: redaction patterns — order matters (URLs before bare hostnames would
#: matter if hostnames were scrubbed; emails before URLs so the @ form
#: wins). Public, conservative regexes: better to under-redact than to
#: eat surrounding prose.
SCRUB_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"(?i)\bhttps?://[^\s<>\"']+", "<URL>"),
    ("ipv4", r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def scrub_text(text: Column, kinds: tuple[str, ...] = ("email", "url", "ipv4")) -> Column:
    """Redact PII-ish spans (emails, URLs, IPv4s, optionally phone-like
    digit runs) with typed placeholder tokens — the privacy-scrub step of
    a corpus pipeline. A chain of JVM ``regexp_replace`` calls: no UDF,
    no shuffle, linear scan work.
    """
    by_name = {k: (p, r) for k, p, r in SCRUB_PATTERNS}
    out = text
    for k in kinds:
        if k not in by_name:
            raise ValueError(f"unknown scrub kind {k!r}; have {sorted(by_name)}")
        pat, repl = by_name[k]
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_stats(text: Column, kinds: tuple[str, ...] = ("email", "url", "ipv4")) -> Column:
    """Per-row count of redactable spans by kind, as a map<string,int> —
    the audit side of ``scrub_text`` (a curation report wants 'how much
    PII did we remove per source', not just the cleaned text)."""
    by_name = {k: p for k, p, _ in SCRUB_PATTERNS}
    pairs = []
    for k in kinds:
        if k not in by_name:
            raise ValueError(f"unknown scrub kind {k!r}; have {sorted(by_name)}")
        pairs.extend([F.lit(k), F.regexp_count(text, F.lit(by_name[k]))])
    return F.create_map(*pairs)


def pack_sequences(
    chunks_df,
    id_cols: list[str],
    token_col: str,
    window_tokens: int = 2048,
    buckets: int = 1024,
    salt: str = "",
) -> "DataFrame":
    """Assign chunks to fixed-size context-window bins — the packing step
    between chunking and batching in an LLM data pipeline.

    Distributed greedy streaming packing: chunks hash into ``buckets``
    independent streams (salted md5 of the id tuple — deterministic and
    engine-portable), each bucket orders its chunks by id and fills
    windows by running token cumsum, ``bin = floor(exclusive_cumsum /
    window_tokens)``. A bin may overflow by at most one chunk — the
    standard streaming-packing trade-off; training loaders truncate or
    spill the tail token run. Exact first-fit packing is inherently
    sequential; bucketing recovers parallelism while keeping every
    decision a pure function of the data (reruns pack identically).

    One shuffle (the per-bucket window). Returns the input plus
    ``pack_bucket``, ``pack_bin``, ``bin_fill`` (inclusive running
    tokens in the bin).
    """
    from pyspark.sql import Window

    key = F.concat_ws("§", *[F.col(c).cast("string") for c in id_cols], F.lit(salt))
    bucket = F.pmod(F.xxhash64(key), F.lit(buckets))
    df = chunks_df.withColumn("pack_bucket", bucket)
    w = Window.partitionBy("pack_bucket").orderBy(*[F.col(c) for c in id_cols])
    cum = F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    excl = cum - F.col(token_col)
    df = df.withColumn("pack_bin", F.floor(excl / F.lit(window_tokens)).cast("long"))
    # fill within the bin: inclusive cumsum minus the bin's starting offset
    wbin = Window.partitionBy("pack_bucket", "pack_bin").orderBy(*[F.col(c) for c in id_cols])
    df = df.withColumn("bin_fill", F.sum(F.col(token_col)).over(wbin.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return df


def _ngram_rep_stats(df, carry: list, text_col: Column, n: int):
    """Zero-shuffle core of :func:`ngram_repetition`: append ``__st``
    (the run-scan fold state ``(prev, run, best, best_g)``) and ``__tot``
    (total n-gram occurrences) to ``carry``, entirely within the row.

    The per-doc top n-gram is a MODE over the doc's own grams, so it
    never needs to leave the row: sort the gram array (equal grams become
    adjacent) and fold once, tracking the longest run. Updating on
    ``run >= best`` makes the winner the LAST maximal run in ascending
    order — i.e. the lexicographically largest gram among count ties,
    exactly ``max_by(g, struct(count, g))``, both orders being Spark's
    binary UTF8 comparison. This replaces the explode + two string-keyed
    aggregations of the r16 shape (guide §2.3/§2.4: the shuffles carried
    (doc, bigram-string) rows; the mode decision needs none of them).

    ``__toks`` is materialized in its own projection: the token array is
    referenced from inside HOF lambdas, where an inlined expression
    re-evaluates per element (see the dedup ``_minhash_sigs`` note);
    multi-referenced non-cheap aliases survive CollapseProject.
    """
    toks = F.filter(F.split(F.lower(F.trim(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(*carry, toks.alias("__toks"))
    k = F.size(F.col("__toks")) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(F.col("__toks"), i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("best_g"),
    )

    def step(acc, g):
        run = F.when(g.eqNullSafe(acc["prev"]), acc["run"] + F.lit(1)).otherwise(
            F.lit(1).cast("long")
        )
        better = run >= acc["best"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, g).otherwise(acc["best_g"]).alias("best_g"),
        )

    st = F.aggregate(F.array_sort(grams), zero, step)
    total = F.when(k > 0, k).otherwise(F.lit(0)).cast("long")
    # __st is referenced several times by every consumer, so it must land
    # in its own projection (one fold per row); carry columns ride through
    # by the names their aliases gave them in ``base``
    carried = [F.col(f.name) for f in base.schema.fields[:-1]]
    return base.select(*carried, st.alias("__st"), total.alias("__tot"))


def ngram_repetition(df, id_col: str, text_col: str, n: int = 2):
    """Per-document n-gram REPETITION: the fraction of all n-gram
    occurrences taken by the single most frequent n-gram — the
    top-n-gram-coverage family of quality filters (heavily repeated
    bigrams mark boilerplate/spam; published pipelines drop documents
    above a coverage threshold).

    Counted n-grams include repeats (occurrence counting, not the
    distinct-shingle sets dedup uses). Computed WITHIN the row (sorted
    gram array + one run-scan fold, see ``_ngram_rep_stats``): zero
    exchanges, where the r16 shape exploded every occurrence and
    shuffled (doc, bigram-string) rows through two aggregations.
    Documents with fewer than n tokens report 0 occurrences and a NULL
    fraction. Returns (id, top_ngram, top_n, total_n, top_frac)."""
    stats = _ngram_rep_stats(df, [F.col(id_col).alias("__id")], F.col(text_col), n)
    return stats.select(
        F.col("__id").alias(id_col),
        F.when(F.col("__st.best") > 0, F.col("__st.best_g")).alias("top_ngram"),
        F.col("__st.best").alias("top_n"),
        F.col("__tot").alias("total_n"),
        # ANSI-safe: guard the 0-occurrence case instead of 0/0
        F.when(F.col("__tot") > 0, F.col("__st.best") / F.col("__tot")).alias("top_frac"),
    )


def export_jsonl(df, path: str, mode: str = "overwrite") -> None:
    """Write a frame as JSON-lines — the standard training-data handoff
    format. One to_json(struct(*)) projection + text write: all JVM-side,
    no driver collection, scales with partitions (one .jsonl part per
    partition; coalesce/repartition upstream to control file counts)."""
    from pyspark.sql import functions as F

    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(mode).text(path)


def read_jsonl(spark, path: str, schema=None):
    """Read JSON-lines back (schema optional; inferred when omitted)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
