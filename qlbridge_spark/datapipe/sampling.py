"""Deterministic sampling for training-data curation.

``hash_sample`` keeps a row iff a salted md5 of its key falls under the
stratum's rate threshold. Properties that matter for corpus curation:

- **deterministic & portable**: the keep/drop decision is a pure function
  of (key, salt) — reruns, backfills, and other engines (the DuckDB
  oracle compares the md5 hex prefix lexicographically, exactly as we do)
  select the identical row set. ``df.sample()`` can't do any of that.
- **stratified**: per-stratum rates (e.g. downsample English, keep all
  low-resource languages) via a rate map compiled to one CASE column.
- **shuffle-free**: a scan + filter, no exchange at any scale.

The threshold compares the first 8 hex chars of md5 against
``format(rate * 2^32, '08x')`` — an exact integer comparison done
lexicographically on hex text, so float-rounding differences between
engines cannot flip a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_threshold_hex(rate: float) -> str:
    """Exact threshold for a [0,1] sampling rate, compared lexicographically
    against the first 8 hex chars of md5. rate=1.0 returns "g" — every hex
    string sorts below it, so "keep all" keeps ALL rows (a 'ffffffff'
    threshold with strict < would drop 1-in-2^32 keys)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * (1 << 32)), "08x")


def sample_mask(key: Column, rate: float | Column, salt: str = "") -> Column:
    """Boolean keep-mask: salted-md5 uniform draw < rate (portable)."""
    bucket = F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8)
    if isinstance(rate, Column):
        return bucket < rate
    return bucket < F.lit(rate_threshold_hex(rate))


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float | dict[str, float],
    strata_col: str | None = None,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic (optionally stratified) sample.

    ``rate`` is a single float, or a {stratum_value: rate} map applied via
    ``strata_col`` (unlisted strata fall back to ``default_rate``).
    """
    if isinstance(rate, dict):
        if not strata_col:
            raise ValueError("a rate map requires strata_col")
        thresh: Column = F.lit(rate_threshold_hex(default_rate))
        for value, r in sorted(rate.items()):
            thresh = F.when(F.col(strata_col) == value, F.lit(rate_threshold_hex(r))).otherwise(thresh)
        return df.filter(sample_mask(F.col(key_col), thresh, salt))
    return df.filter(sample_mask(F.col(key_col), float(rate), salt))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list[Column] | None = None,
    key_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the domain-quota step of
    corpus curation (cap documents per domain/source so one crawl host
    cannot dominate the mixture).

    Selection is DETERMINISTIC: rows rank by ``order_by`` (e.g. a quality
    score, best first) or, when omitted, by the salted-md5 draw of
    ``key_col`` (an unbiased uniform sample of each group, portable
    across engines like ``hash_sample``). One shuffle on the group column
    — the same exchange any per-group operator needs; the window itself
    is a single pass.
    """
    from pyspark.sql import Window

    if order_by is None:
        if key_col is None:
            raise ValueError("cap_per_group needs order_by or key_col")
        order_by = [
            F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))), 1, 8).asc(),
            F.col(key_col).asc(),
        ]
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return df.withColumn("__rank", F.row_number().over(w)).where(F.col("__rank") <= cap).drop("__rank")


def epoch_sample(df: DataFrame, key_col: str, epochs: float, salt: str = "") -> DataFrame:
    """Deterministic FRACTIONAL-EPOCH resampling — the up/downsampling
    primitive of training-mixture construction (e.g. "2.7 epochs of
    Wikipedia, 0.3 epochs of CommonCrawl").

    ``epochs`` < 1 is a plain hash_sample; ``epochs`` = k + f replicates
    every row k times (distinct ``__epoch`` tag so downstream global
    shuffles spread the copies) and adds one hash-sampled f-fraction pass
    with its own salt — so the fractional copy is an unbiased, portable,
    rerun-stable subset, never "the first f of the file".

    Scale: unions of narrow scans + filters — zero shuffles added. The
    output carries an ``__epoch`` LONG column (0-based copy index) callers
    may drop or keep for mixing diagnostics.
    """
    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    whole = int(epochs)
    frac = epochs - whole
    parts = [df.withColumn("__epoch", F.lit(i).cast("long")) for i in range(whole)]
    if frac > 0:
        parts.append(
            hash_sample(df, key_col, frac, salt=f"{salt}:epoch{whole}").withColumn(
                "__epoch", F.lit(whole).cast("long")
            )
        )
    if not parts:
        return df.withColumn("__epoch", F.lit(0).cast("long")).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    salt: str = "",
    source_col: str = "__source",
) -> DataFrame:
    """Weighted training-mixture union: ``{name: (frame, epochs)}`` →
    one frame where each source contributes ``epochs`` deterministic
    passes (fractional epochs hash-sampled per ``epoch_sample``), tagged
    with ``source_col`` for downstream per-source diagnostics.

    Frames must share the mixing schema (select the common columns
    first). The result is an unordered bag — follow with a global
    hash-shuffle (e.g. repartition by md5 of the key) when training-order
    randomization matters; that is the single shuffle of the whole
    pipeline.
    """
    if not sources:
        raise ValueError("mix_corpora needs at least one source")
    out = None
    for name in sorted(sources):
        frame, epochs = sources[name]
        part = epoch_sample(frame, key_col, epochs, salt=f"{salt}:{name}").withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    return out
