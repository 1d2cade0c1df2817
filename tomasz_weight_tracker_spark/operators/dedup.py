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


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = 64,
    carry: Sequence[str] = (),
) -> DataFrame:
    """LSH banding: split the k-wide signature into ``bands`` bands of
    k/bands rows each; docs sharing any full band become a candidate
    pair.  Returns distinct (id_a, id_b) with id_a < id_b.

    One shuffle on (band_id, band_key); the self-join is an equi-join
    on the band key so Catalyst plans a shuffled hash join and AQE
    splits skewed buckets.

    ``max_bucket`` is the hot-bucket cap: any band bucket with more
    than this many members is dropped entirely before the self-join
    (a bucket of B docs emits B*(B-1)/2 pairs, so one hot bucket goes
    quadratic — round 1 recorded 4.6M candidate pairs from 5k docs
    with no cap).  Dropping a hot bucket costs recall only for pairs
    not ALSO caught by one of the other bands, and a bucket that hot
    is band-key degeneracy (near-constant tokens), not near-duplicate
    signal.  The window count shares the band-key hash partitioning
    with the join that follows, so the cap adds no extra shuffle.

    ``carry`` lists signature columns to thread THROUGH the band join,
    emitted as ``a_<col>`` / ``b_<col>`` on each pair.  This is how a
    verify stage (full-signature agreement, Jaccard, etc.) gets both
    sides' data without a second join back to the signature table —
    which at corpus scale would either shuffle the whole signature
    table twice more or (worse) broadcast a corpus-cardinality frame.
    Cost: the band shuffle carries ``bands`` copies of the carried
    columns per doc; for k=16 longs that is ~0.5 KB/doc, far cheaper
    than re-joining at 100 TB.  Carried values are functionally
    dependent on the id, so the pair-level ``distinct`` stays exact.
    """
    rows_per_band = k // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), F.concat_ws("_", *cols).alias("band_key"))
        )
    banded = signatures.select(
        F.col(id_col), *carry, F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, *carry, "band.band_id", "band.band_key")
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key")
        banded = (
            banded.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.{c}").alias(f"a_{c}") for c in carry],
            *[F.col(f"b.{c}").alias(f"b_{c}") for c in carry],
        )
        .distinct()
    )
    return pairs


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
