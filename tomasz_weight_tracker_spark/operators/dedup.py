"""Deduplication operators (exact + near-dup families).

Extensions beyond the reference surface for training-data pipelines:

- exact dedup: hash-groupBy on a normalized fingerprint;
- MinHash signatures + LSH banding for near-dup candidate generation;
- SimHash (frequency-weighted bitwise majority);
- n-gram / token-set Jaccard verification of candidate pairs.

Hashing uses the md5-derived 60-bit integers from
``functions.md5_long`` so every signature is bit-identical to the
DuckDB oracle (Spark's xxhash64/hash have no DuckDB twin).

Scale posture:
- signatures are per-row narrow projections (no shuffle);
- LSH banding shuffles once on the band key — band width trades
  recall vs. the size of each bucket's candidate cross-product;
- the pair join uses the band key as join key, so skewed buckets are
  handled by AQE skew-join splitting;
- Jaccard verification is a per-pair map over two token arrays
  (no further shuffle after the candidate join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import md5_long, md5_long_sql, tokens


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[Column]
) -> DataFrame:
    """A6: keep the last row per key in the given order
    (utils/20251223-csv-to-separate-sensors.py:75 drop_duplicates
    keep='last'), distributed via row_number instead of a sort+scan."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_hash_pairs(token_arr: Column) -> Column:
    """Per-token (h1, h2) hash pairs for the double-hashing MinHash
    family (Kirsch-Mitzenmacher): ONE md5 per distinct token, from
    which every salt's hash is a cheap integer mix ``h1 + i*h2``.

    h1 = first 60 bits of md5 (15 hex chars -> BIGINT), h2 = next
    60 bits shifted right 4 (56 bits), so ``h1 + i*h2`` stays inside
    a signed 64-bit integer for i < 60.  Bit-identical in DuckDB:
    ``('0x'||substr(md5(t),1,15))::BIGINT`` etc.
    """
    return F.transform(
        F.array_distinct(token_arr),
        lambda t: F.struct(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long").alias("h1"),
            F.shiftright(
                F.conv(F.substring(F.md5(t), 16, 15), 16, 10).cast("long"), 4
            ).alias("h2"),
        ),
    )


def minhash_from_pairs(pairs_col: Column, salt: int) -> Column:
    """MinHash value for one salt over a materialized (h1,h2) array."""
    return F.array_min(
        F.transform(pairs_col, lambda s: s["h1"] + F.lit(salt) * s["h2"])
    )


def minhash_expr(token_arr: Column, salt: int) -> Column:
    """One MinHash value: min over the distinct token set of the
    ``h1 + salt*h2`` double hash.  k salts -> k-wide signature.

    Prefer :func:`minhash_signature` for multi-salt use — it
    materializes the md5 work once across all salts."""
    return minhash_from_pairs(minhash_hash_pairs(token_arr), salt)


def sql_minhash_pairs(tokens_expr: str) -> str:
    """DuckDB twin of :func:`minhash_hash_pairs` (use in a CTE)."""
    return (
        f"list_transform(list_distinct({tokens_expr}), "
        "t -> {'h1': ('0x' || substr(md5(t),1,15))::BIGINT, "
        "'h2': (('0x' || substr(md5(t),16,15))::BIGINT >> 4)})"
    )


def sql_minhash_from_pairs(pairs_expr: str, salt: int) -> str:
    return f"list_min(list_transform({pairs_expr}, s -> s.h1 + {salt} * s.h2))"


def sql_minhash(tokens_expr: str, salt: int) -> str:
    return sql_minhash_from_pairs(sql_minhash_pairs(tokens_expr), salt)


def minhash_signature(df: DataFrame, text_col: str, k: int = 8) -> DataFrame:
    """Attach mh0..mh{k-1} MinHash columns computed from the whitespace
    token set of ``text_col``.

    The md5 hash-pair array is materialized in its own projection and
    referenced k times; CollapseProject keeps the expensive transform
    un-inlined, so each token is md5-hashed exactly once regardless of
    signature width (vs. one md5 per token PER SALT previously — the
    round-1 bench's 5x hot spot)."""
    toks = tokens(F.lower(F.col(text_col)))
    df = df.withColumn("__mh_pairs", minhash_hash_pairs(toks))
    for i in range(k):
        df = df.withColumn(f"mh{i}", minhash_from_pairs(F.col("__mh_pairs"), i))
    return df.drop("__mh_pairs")


def lsh_band_order(k: int, bands: int, band: int) -> list[int]:
    """Signature positions for band ``band`` in split order: the band's
    own ``k//bands`` positions first, then every other position in
    cyclic order starting just after the band.  ``skey = [mh[i] for i
    in order]`` makes every split level a PREFIX of one array, and the
    cyclic start means a pair disagreeing on one hash only risks the
    bands whose split path reaches that hash early."""
    rpb = k // bands
    base = [band * rpb + j for j in range(rpb)]
    extra = [(rpb * (band + 1) + j) % k for j in range(k - rpb)]
    return base + extra


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = 64,
    carry: Sequence[str] = (),
    emit_sig_matches: bool = False,
) -> DataFrame:
    """LSH banding: split the k-wide signature into ``bands`` bands of
    k/bands rows each; docs sharing any full band become a candidate
    pair.  Returns distinct (id_a, id_b) with id_a < id_b.

    ``max_bucket`` bounds FALSE-candidate emission by recursive bucket
    *splitting* (round-8 fix — the round-7 rule dropped over-cap
    buckets wholesale, which the repo's own lsh_recall_audit measured
    at 0.45% recall vs 90.8% uncapped on a dense corpus):

    - a band bucket with more than ``max_bucket`` members is split by
      appending one more signature position to its key (the cyclic
      order of :func:`lsh_band_order`), recursively, until every
      sub-bucket fits under the cap — so a bucket of B docs never
      emits more than ``max_bucket``-choose-2 pairs unless its members
      agree on the FULL signature;
    - a bucket still over the cap at full-signature depth is a set of
      documents with IDENTICAL k-wide signatures: every pair in it
      passes any ``sig_matches >= t`` verify by construction, so its
      quadratic pair set is the query's own OUTPUT, not candidate
      waste, and is emitted in full, once — computed directly as the
      identical-signature clusters larger than the cap (one window
      over the full signature; band-independent, hence no cross-band
      duplication and no distinct).  Total emission is therefore
      O(true_output + buckets * cap^2): the floor for a
      pair-enumeration query.  Callers that only need cluster-level
      dedup (keep one representative) should collapse these
      identical-signature clusters to a representative instead of
      enumerating pairs — see plans.round8's star-edge query.

    Shuffle posture: the banded frame is exchanged ONCE on
    (band_id, 4-position prefix); every finer split count is a window
    whose partition keys include the full chain of coarser prefixes,
    so Catalyst proves the existing hash partitioning satisfies each
    window's required distribution and inserts sorts, not exchanges.
    The self-joins are equi-joins on (band_id, level, prefix-array) so
    AQE splits skewed buckets.

    ``carry`` lists signature columns to thread THROUGH the band join,
    emitted as ``a_<col>`` / ``b_<col>`` on each pair.  This is how a
    verify stage (Jaccard, metadata screens) gets both sides' data
    without a second join back to the signature table — which at
    corpus scale would either shuffle the whole signature table twice
    more or (worse) broadcast a corpus-cardinality frame.  Carried
    values are functionally dependent on the id, so the pair-level
    ``distinct`` stays exact.

    ``emit_sig_matches`` adds a ``sig_matches`` column — the count of
    agreeing signature positions — computed from the band-shuffled
    signature array itself (position-permuted per band, which leaves
    the agreement COUNT invariant), so full-signature verify needs no
    ``carry`` at all: the shuffle stays k longs per doc-band instead
    of 2k.
    """
    rows_per_band = k // bands
    if max_bucket is None:
        # Uncapped path: plain banding, no split machinery.
        band_structs = []
        for b in range(bands):
            cols = [
                F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)
            ]
            band_structs.append(
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws("_", *cols).alias("band_key"),
                )
            )
        sig_cols = (
            [F.array(*[F.col(f"mh{i}") for i in range(k)]).alias("__sig")]
            if emit_sig_matches
            else []
        )
        banded = signatures.select(
            F.col(id_col),
            *carry,
            *sig_cols,
            F.explode(F.array(*band_structs)).alias("band"),
        ).select(
            id_col,
            *carry,
            *(["__sig"] if emit_sig_matches else []),
            "band.band_id",
            "band.band_key",
        )
        a = banded.alias("a")
        b = banded.alias("b")
        extra_out = (
            [
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("a.__sig"), F.col("b.__sig"), lambda x, y: x == y
                        ),
                        lambda m: m,
                    )
                )
                .cast("long")
                .alias("sig_matches")
            ]
            if emit_sig_matches
            else []
        )
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                *extra_out,
                *[F.col(f"a.{c}").alias(f"a_{c}") for c in carry],
                *[F.col(f"b.{c}").alias(f"b_{c}") for c in carry],
            )
            .distinct()
        )

    levels = k - rows_per_band  # split depths beyond the band itself
    star_lvl = levels + 1  # over-cap at full-signature depth
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.array(
                *[F.col(f"mh{i}") for i in lsh_band_order(k, bands, b)]
            ).alias("skey"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), *carry, F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, *carry, "band.band_id", "band.skey")

    # Nested bucket counts: window l partitions by the CHAIN of prefix
    # slices up to length rows_per_band+l.  The chain (not just the
    # finest slice) is what lets every window after the first reuse the
    # level-0 exchange — HashPartitioning(band_id, slice4) is a subset
    # of each finer window's partition expressions.
    chain: list[Column] = [F.col("band_id")]
    counts: list[Column] = []
    for l in range(levels + 1):
        chain = chain + [F.slice(F.col("skey"), 1, rows_per_band + l)]
        counts.append(F.count(F.lit(1)).over(Window.partitionBy(*chain)))
    lvl = F.lit(star_lvl)
    for l in reversed(range(levels + 1)):
        lvl = F.when(counts[l] <= max_bucket, F.lit(l)).otherwise(lvl)
    keyed = banded.select(
        F.col(id_col),
        *carry,
        "band_id",
        lvl.alias("__lvl"),
        F.slice(
            F.col("skey"),
            F.lit(1),
            F.lit(rows_per_band) + F.least(lvl, F.lit(levels)),
        ).alias("__eff"),
        # Full signature in band order, for the verify column: both
        # join sides share a band, hence the same position permutation,
        # so the zip_with agreement COUNT equals agreement over mh0..k.
        *([F.col("skey").alias("__sig")] if emit_sig_matches else []),
    )

    def pair_select(a, b, matched: Column):
        extra_out = (
            [matched.cast("long").alias("sig_matches")] if emit_sig_matches else []
        )
        return [
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *extra_out,
            *[F.col(f"a.{c}").alias(f"a_{c}") for c in carry],
            *[F.col(f"b.{c}").alias(f"b_{c}") for c in carry],
        ]

    zip_matches = F.size(
        F.filter(
            F.zip_with(F.col("a.__sig"), F.col("b.__sig"), lambda x, y: x == y),
            lambda m: m,
        )
    )

    # Sub-cap buckets: all pairs, deduped across bands.
    sub = keyed.filter(F.col("__lvl") < star_lvl)
    a, b = sub.alias("a"), sub.alias("b")
    sub_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.__lvl") == F.col("b.__lvl"))
            & (F.col("a.__eff") == F.col("b.__eff"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(*pair_select(a, b, zip_matches))
        .distinct()
    )

    # Signature-exhausted buckets: a bucket still over the cap at
    # full-signature depth is exactly an identical-full-signature
    # cluster larger than the cap (every prefix bucket contains it, so
    # every split path exhausts) — computed directly with ONE window
    # over the full signature instead of filtering the split stack.
    # Every pair in such a cluster agrees on all k positions, so this
    # branch's emission is the query's own output, not candidate
    # waste.  No distinct needed: one bucket per cluster, and none of
    # these pairs can also appear in the sub-cap branch (any bucket
    # holding both endpoints contains the whole over-cap cluster).
    fsig = F.array(*[F.col(f"mh{i}") for i in range(k)])
    clus = (
        signatures.select(F.col(id_col), *carry, fsig.alias("__fsig"))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("__fsig"))
        )
        .filter(F.col("__n") > max_bucket)
        .drop("__n")
    )
    ea, eb = clus.alias("a"), clus.alias("b")
    exh_pairs = ea.join(
        eb,
        (F.col("a.__fsig") == F.col("b.__fsig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(*pair_select(ea, eb, F.lit(k)))
    return sub_pairs.unionByName(exh_pairs)


def sql_lsh_banded(k: int, bands: int, sig_cte: str = "sig") -> str:
    """DuckDB twin of the banded frame: one row per (doc, band) with
    ``skey`` = the full signature as a list in :func:`lsh_band_order`
    split order (band positions first)."""
    selects = []
    for b in range(bands):
        arr = "[" + ", ".join(f"mh{i}" for i in lsh_band_order(k, bands, b)) + "]"
        selects.append(
            f"      SELECT doc_id, {b} AS band_id, {arr} AS skey FROM {sig_cte}"
        )
    return "\n      UNION ALL\n".join(selects)


def sql_lsh_candidates(k: int, bands: int, cap: int) -> str:
    """DuckDB twin of the capped split semantics of
    :func:`lsh_candidate_pairs`: CTE fragments (``lv``, ``keyed``,
    ``cand``) to splice after a ``banded0(doc_id, band_id, skey)`` CTE.
    ``cand`` holds the distinct (id_a, id_b) candidate pairs —
    sub-cap split buckets all-pairs, identical-signature clusters
    over the cap all-pairs once.  Expects a ``sig`` CTE with
    mh0..mh{{k-1}} columns (for the exhausted-cluster branch)."""
    rpb = k // bands
    levels = k - rpb
    whens = "\n           ".join(
        f"WHEN count(*) OVER (PARTITION BY band_id, "
        f"list_slice(skey, 1, {rpb + l})) <= {cap} THEN {l}"
        for l in range(levels + 1)
    )
    fsig = "[" + ", ".join(f"mh{i}" for i in range(k)) + "]"
    return f"""
    lv AS (
      SELECT doc_id, band_id, skey,
           CASE {whens}
           ELSE {levels + 1} END AS lvl
      FROM banded0),
    keyed AS (
      SELECT doc_id, band_id, lvl,
             list_slice(skey, 1, {rpb} + least(lvl, {levels})) AS eff
      FROM lv
      WHERE lvl < {levels + 1}),
    fullsig AS (
      SELECT doc_id, {fsig} AS fsig,
             count(*) OVER (PARTITION BY {fsig}) AS n
      FROM sig),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a JOIN keyed b
        ON a.band_id = b.band_id AND a.lvl = b.lvl AND a.eff = b.eff
       AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id
      FROM fullsig a JOIN fullsig b
        ON a.fsig = b.fsig AND a.doc_id < b.doc_id
      WHERE a.n > {cap})"""


def simhash_exprs(token_arr: Column, bits: int = 16) -> Column:
    """SimHash over the token multiset (frequency-weighted): bit j of the
    output is the sign of sum over tokens of (2*bit_j(hash(token)) - 1).

    Built as a fold over the token array — per-row, no shuffle.
    """
    def bit_merge(j: int):
        # F.aggregate introspects the lambda arity, so the bit index must
        # be captured by closure, not by a default argument.
        def merge(acc, t):
            sign = F.shiftright(md5_long(t), j).bitwiseAND(F.lit(1)) * 2 - 1
            return acc + sign.cast("int")

        return merge

    bit_sums = [F.aggregate(token_arr, F.lit(0), bit_merge(j)) for j in range(bits)]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return out


def sql_simhash(tokens_expr: str, bits: int = 16) -> str:
    h = md5_long_sql("t")
    terms = []
    for j in range(bits):
        s = (
            f"list_sum(list_transform({tokens_expr}, "
            f"t -> ((({h} >> {j}) & 1) * 2 - 1)))"
        )
        terms.append(f"CASE WHEN {s} > 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(terms) + ")::BIGINT"


def jaccard_exprs(tokens_a: Column, tokens_b: Column) -> Column:
    """Token-set Jaccard similarity as explicit distinct/contains ops so
    Spark and DuckDB agree on set semantics exactly."""
    da = F.array_distinct(tokens_a)
    db = F.array_distinct(tokens_b)
    common = F.size(F.filter(da, lambda t: F.array_contains(db, t)))
    union = F.size(da) + F.size(db) - common
    return F.when(union > 0, common.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


def sql_jaccard(ta: str, tb: str) -> str:
    da = f"list_distinct({ta})"
    db = f"list_distinct({tb})"
    common = f"len(list_filter({da}, t -> list_contains({db}, t)))"
    union = f"(len({da}) + len({db}) - {common})"
    return (
        f"CASE WHEN {union} > 0 THEN {common}::DOUBLE / {union}::DOUBLE ELSE 0.0 END"
    )
