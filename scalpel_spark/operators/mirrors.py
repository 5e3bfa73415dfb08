"""Mirror-host detection: find host pairs serving (nearly) the same
content set, the classic crawl-economy signal (Bharat & Broder, WWW
1999 "Mirror, mirror on the Web"): once two hosts are known mirrors,
one of them can be dropped from the frontier entirely — at web scale
whole-site mirrors are one of the biggest sources of wasted fetches
after URL-level aliases (see ``operators/dust``, the within-host
counterpart).

A host's profile is its set of DISTINCT content signatures (the
engine's span-sequence fingerprint, ``spans.span_signature_col``, is
the natural key). Overlap is containment in the SMALLER host:

    overlap_ppm(a, b) = |sig(a) ∩ sig(b)| · 10^6 div min(|sig(a)|, |sig(b)|)

so a small site fully absorbed by a larger one still scores 10^6 — the
asymmetric-mirror case a Jaccard score would dilute.

Scale shape (all JVM column algebra): candidate pairs come ONLY from
shared signatures — one (sig, host) distinct, a df-capped self-join per
signature, one groupBy(host_a, host_b) — never host × host. The df cap
drops signatures served by more than ``df_cap`` hosts (site-chrome
boilerplate that would otherwise produce quadratic candidates);
profile sizes are counted over the SAME capped universe so the ratio
stays internally consistent. Blind spot, documented like the dedup
cap: content shared by more than ``df_cap`` hosts contributes nothing,
so 'mirror farms' wider than the cap need the cap raised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def mirror_pairs(docs: DataFrame, host_col: str = 'host',
                 sig_col: str = 'sig', min_overlap_ppm: int = 500_000,
                 df_cap: int = 100) -> DataFrame:
    """Host pairs whose capped signature profiles overlap by at least
    ``min_overlap_ppm`` of the smaller profile. Returns
    (host_a, host_b, shared, size_a, size_b, overlap_ppm) with
    host_a < host_b lexicographically.
    """
    prof = docs.select(F.col(host_col).alias('host'),
                       F.col(sig_col).alias('sig')).distinct()
    narrow_sigs = (
        prof.groupBy('sig').agg(F.count('*').alias('_df'))
        .filter(F.col('_df') <= df_cap)
        .select('sig')
    )
    capped = prof.join(narrow_sigs, 'sig')  # never materializes host lists
    sizes = capped.groupBy('host').agg(F.count('*').alias('n_sigs'))
    pairs = (
        capped.select('sig', F.col('host').alias('host_a'))
        .join(capped.select('sig', F.col('host').alias('host_b')), 'sig')
        .filter(F.col('host_a') < F.col('host_b'))
        .groupBy('host_a', 'host_b').agg(F.count('*').alias('shared'))
    )
    return (
        pairs
        .join(sizes.select(F.col('host').alias('host_a'),
                           F.col('n_sigs').alias('size_a')), 'host_a')
        .join(sizes.select(F.col('host').alias('host_b'),
                           F.col('n_sigs').alias('size_b')), 'host_b')
        .withColumn('overlap_ppm', F.expr(
            f'(shared * {PPM}) div least(size_a, size_b)'))
        .filter(F.col('overlap_ppm') >= min_overlap_ppm)
        .select('host_a', 'host_b', 'shared', 'size_a', 'size_b',
                'overlap_ppm')
    )
