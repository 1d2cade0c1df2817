# DRAFT: collapse-first capped LSH (to be merged into operators/dedup.py)
# Replaces the uncommitted "split + exhausted-cluster" capped path.
#
# Design:
#   1. Collapse identical full signatures to one representative row
#      (rep = min id, cnt = cluster size) BEFORE banding — duplicates
#      never inflate bucket counts, so the recursive split sees only
#      genuinely distinct signatures, and at full-signature depth every
#      bucket has exactly one distinct signature (<= cap trivially):
#      the "signature-exhausted" branch disappears.
#   2. Band + recursive split over the rep frame (existing machinery).
#   3. Verify rep-pairs (sig_matches via band-permuted arrays).
#   4. Expand back to member pairs:
#        - within-cluster all-pairs (sig_matches = k, true dups by
#          construction — output-bound),
#        - cross-cluster rep-pairs joined to members on each side
#          (LEFT join to the multi-member table + coalesce keeps
#          singleton clusters join-free in data volume terms).
#      Expansion of UNVERIFIED rep-pairs between two large clusters is
#      the one unbounded-emission hole -> `verify_min` gates expansion.
#
# Recall property vs the split-only design: members of a large
# identical-signature cluster now DO pair with outside near-dups
# (the rep participates in banding with multiplicity 1, so outside
# docs' buckets are not blown over the cap by the cluster).


def lsh_candidate_pairs_capped(signatures, id_col, k, bands, max_bucket,
                               carry, emit_sig_matches, verify_min):
    rows_per_band = k // bands
    levels = k - rows_per_band
    # members: every row + its cluster rep/size (one window pass)
    fsig = F.array(*[F.col(f"mh{i}") for i in range(k)])
    wsig = Window.partitionBy("__fsig")
    members = (
        signatures.select(F.col(id_col), *carry, fsig.alias("__fsig"))
        .withColumn("__rep", F.min(id_col).over(wsig))
        .withColumn("__cnt", F.count(F.lit(1)).over(wsig))
    )
    # reps: one row per distinct signature; keep mh cols for banding.
    # Use the row whose id == rep so carried cols belong to the rep
    # (needed for singleton expansion).
    reps = members.filter(F.col(id_col) == F.col("__rep"))

    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.array(*[F.element_at("__fsig", i + 1) for i in lsh_band_order(k, bands, b)]).alias("skey"),
        )
        for b in range(bands)
    ]
    banded = reps.select(
        F.col(id_col).alias("rid"), F.explode(F.array(*band_structs)).alias("band")
    ).select("rid", "band.band_id", "band.skey")

    chain = [F.col("band_id")]
    counts = []
    for l in range(levels + 1):
        chain = chain + [F.slice(F.col("skey"), 1, rows_per_band + l)]
        counts.append(F.count(F.lit(1)).over(Window.partitionBy(*chain)))
    # level = first l with count <= cap; full depth (l = levels) always
    # has count == 1 (distinct signatures) so lvl is always defined
    # ... BUT only if max_bucket >= 1; guard cap >= 1.
    lvl = F.lit(levels)
    for l in reversed(range(levels)):
        lvl = F.when(counts[l] <= max_bucket, F.lit(l)).otherwise(lvl)
    keyed = banded.select(
        "rid", "band_id", lvl.alias("__lvl"),
        F.slice(F.col("skey"), F.lit(1), F.lit(rows_per_band) + lvl).alias("__eff"),
        F.col("skey").alias("__sig"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    zip_matches = F.size(F.filter(
        F.zip_with(F.col("a.__sig"), F.col("b.__sig"), lambda x, y: x == y),
        lambda m: m))
    rep_pairs = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.__lvl") == F.col("b.__lvl"))
               & (F.col("a.__eff") == F.col("b.__eff"))
               & (F.col("a.rid") < F.col("b.rid")))
        .select(F.col("a.rid").alias("ra"), F.col("b.rid").alias("rb"),
                zip_matches.cast("long").alias("sig_matches"))
        .distinct()
    )
    if verify_min is not None:
        rep_pairs = rep_pairs.filter(F.col("sig_matches") >= verify_min)

    multi = members.filter(F.col("__cnt") > 1)  # non-singleton members
    # cross-cluster: expand each side independently via LEFT join
    ma = multi.select(F.col("__rep").alias("ra"), F.col(id_col).alias("xa"),
                      *[F.col(c).alias(f"xa_{c}") for c in carry])
    mb = multi.select(F.col("__rep").alias("rb"), F.col(id_col).alias("xb"),
                      *[F.col(c).alias(f"xb_{c}") for c in carry])
    # reps carry their own carry cols for the singleton side:
    # rep_pairs needs (ra -> rep carry) ... handled by joining reps?
    # Simpler: expand via members including singletons? members is
    # corpus-sized; join of rep_pairs (bounded) with members on rep is
    # a fine keyed join; avoid the left-join special case entirely.
    # -> expansion joins on __rep using the FULL members table.
    # cost: two shuffles of members (corpus-cardinality) — same class
    # as the band shuffle; acceptable, simplest, exact.
    pass
