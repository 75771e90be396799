"""Dense-bucket fallback for the SimHash dedup engine (VERDICT r09 watch
#1): per-bucket caps bound the candidate join on a pathologically
clustering corpus, the overflow census quantifies the recall risk taken,
and on the crafted dense fixture — where every qualifying pair also
matches in a non-overflowing band — the capped result is VALUE-IDENTICAL
to the uncapped banding and to the quadratic definition."""

from __future__ import annotations

from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
    simhash_band_stats,
    simhash_near_pairs,
    simhash_near_pairs_capped,
)

# Crafted dense fixture: every fingerprint shares the LOW 27 bits — the
# whole of band 0 under the production 2-band/27-bit scheme, so band 0 is
# ONE bucket of n docs (the quadratic regime the cap exists for).  The
# band-1 bits carry 10 groups at pairwise Hamming distance 4 (group g
# sets bit pair (2g, 2g+1): any two groups' XOR has popcount 4), with 3
# IDENTICAL members per group.  Qualifying pairs are therefore exactly
# the within-group dist-0 pairs, and each ties in BOTH bands — so when
# the cap drops band 0's mega-bucket, band 1 (3-doc buckets) still
# carries every pair: capped == uncapped == quadratic.
BASE = (1 << 20) | 12345  # shared low-27-bit pattern


def _fixture(spark):
    rows = []
    doc = 0
    for g in range(10):
        h = ((0b11 << (2 * g)) << 27) | BASE
        for _ in range(3):
            rows.append((doc, h))
            doc += 1
    return spark.createDataFrame(rows, "doc_id long, simhash long")


def _pairs(df):
    return sorted(
        (r["doc_id_1"], r["doc_id_2"], r["dist"]) for r in df.collect()
    )


def _quadratic(rows):
    out = []
    for i, (id1, h1) in enumerate(rows):
        for id2, h2 in rows[i + 1:]:
            d = bin(h1 ^ h2).count("1")
            if d <= 1:
                out.append((min(id1, id2), max(id1, id2), d))
    return sorted(out)


def test_capped_parity_on_dense_fixture(spark):
    fp = _fixture(spark)
    raw = [(r["doc_id"], r["simhash"]) for r in fp.collect()]
    want = _quadratic(raw)
    assert len(want) == 30  # 10 groups x C(3,2) within-group pairs

    uncapped = _pairs(simhash_near_pairs(fp, max_dist=1))
    assert uncapped == want  # the banding itself is miss-free

    # the dense premise: band 0 is one 30-doc bucket under the 2-band
    # scheme — far over the cap; band 1 buckets stay at 3
    stats = {
        r["band_idx"]: (r["max_bucket"], r["candidate_pairs"])
        for r in simhash_band_stats(fp, n_bands=2).collect()
    }
    assert stats[0] == (30, 435)
    assert stats[1] == (3, 30)

    capped, overflow = simhash_near_pairs_capped(
        fp, max_dist=1, bucket_cap=10
    )
    # band 0's mega-bucket is reported, not silently joined
    ov = {(r["band"], r["bucket_size"]) for r in overflow.collect()}
    assert ov == {(0, 30)}
    # and the capped result is value-identical: every qualifying pair
    # also ties in band 1, which stays under the cap
    assert _pairs(capped) == want


def test_cap_larger_than_every_bucket_changes_nothing(spark):
    fp = _fixture(spark)
    capped, overflow = simhash_near_pairs_capped(
        fp, max_dist=1, bucket_cap=10_000
    )
    assert overflow.count() == 0
    assert _pairs(capped) == _pairs(simhash_near_pairs(fp, max_dist=1))


def test_overflow_census_quantifies_recall_loss(spark):
    # the honest failure mode: a pair whose ONLY matching band overflows
    # is missed, and the census is what says so.  Docs 0 and 1 differ in
    # one BAND-1 bit, so they match only via band 0; cap band 0 away and
    # the pair disappears — with the overflow row as the audit trail.
    rows = [
        (0, BASE | (0b11 << 27)),
        (1, BASE | (0b10 << 27)),  # one band-1 bit flip: dist 1
        # filler sharing band 0 (pairwise-distant band-1 values) to
        # overflow band 0 past the cap
        *[
            (i, BASE | ((0b11 << (2 * i)) << 27))
            for i in range(2, 13)
        ],
    ]
    fp = spark.createDataFrame(rows, "doc_id long, simhash long")
    assert _pairs(simhash_near_pairs(fp, max_dist=1)) == [(0, 1, 1)]
    capped, overflow = simhash_near_pairs_capped(
        fp, max_dist=1, bucket_cap=4
    )
    assert _pairs(capped) == []  # the recall loss...
    ov = {(r["band"], r["bucket_size"]) for r in overflow.collect()}
    assert (0, 13) in ov  # ...is exactly what the census reports
