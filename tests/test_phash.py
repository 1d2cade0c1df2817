"""Perceptual-hash (dHash) image near-dup: hash stability across
codecs, locality of pixel edits in hash space, and the banded pair
discovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from tomasz_weight_tracker_spark.operators import codecs
from tomasz_weight_tracker_spark.operators.phash import (
    PHASH_BITS,
    dhash62,
    phash_media,
    phash_near_dup_pairs,
)


def _gray_bmp(w, h, fn):
    return codecs.make_bmp(w, h, lambda x, y: (fn(x, y),) * 3)


def _gray_gif(w, h, fn):
    return codecs.make_gif(w, h, fn, [(j, j, j) for j in range(256)])


def _ramp(x, y):
    return (x * 31 + y * 17) % 256


class TestDhash:
    def test_same_image_same_hash_across_codecs(self, spark):
        # The hash must depend on PIXELS, not the container: the same
        # gray ramp serialized as BMP and as GIF (through the real
        # LZW round-trip) hashes identically.
        hb = dhash62(codecs.parse_bmp(_gray_bmp(12, 10, _ramp)))
        hg = dhash62(codecs.parse_gif(_gray_gif(12, 10, _ramp)))
        assert hb == hg
        assert hb is not None and 0 <= hb < (1 << PHASH_BITS)

    def test_local_edit_flips_few_bits(self):
        # A 2x2 top-left perturbation flips only the grid-local dHash
        # bits (<= 6 of 62), all inside Hamming band 0 — the locality
        # the banding exploits.
        def pert(x, y):
            v = _ramp(x, y)
            return (v + 128) % 256 if x < 2 and y < 2 else v

        h0 = dhash62(codecs.parse_bmp(_gray_bmp(12, 10, _ramp)))
        h1 = dhash62(codecs.parse_bmp(_gray_bmp(12, 10, pert)))
        d = bin(h0 ^ h1).count("1")
        assert 1 <= d <= 6
        assert (h0 ^ h1) < (1 << 16)  # all flips inside band 0

    def test_header_only_decode_yields_none(self):
        # An interlaced GIF decodes header-only -> no pixels -> None.
        raw = bytearray(_gray_gif(4, 4, lambda x, y: 0))
        raw[13 + 3 * 256 + 8] |= 0x40  # set the interlace flag
        dec = codecs.parse_gif(bytes(raw))
        assert dec is not None and dec.get("pixels") is None
        assert dhash62(dec) is None


class TestPhashPairs:
    def test_near_identical_pair_found_far_pair_not(self, spark):
        def pert(x, y):
            v = _ramp(x, y)
            return (v + 128) % 256 if x < 2 and y < 2 else v

        rows = [
            (0, _gray_bmp(12, 10, _ramp)),
            (1, _gray_gif(12, 10, pert)),  # near-dup of 0, other codec
            (2, _gray_bmp(12, 10, lambda x, y: (x * 151 + y * 73) % 256)),
        ]
        media = spark.createDataFrame(rows, "media_id long, content binary")
        hashes = phash_media(media)
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in phash_near_dup_pairs(hashes).collect()
        }
        assert (0, 1) in got and got[(0, 1)] <= 6
        assert all(2 not in pair for pair in got)

    def test_duplicated_images_do_not_blow_the_band_cap(self, spark):
        # The 10x-soak regression: mass-duplicated images (a crawl's
        # dominant case) once pushed every member-level band bucket
        # over the cap and the output collapsed to ZERO.  Collapse-
        # first semantics: 40 copies of one image + 1 near-variant,
        # cap 8 -> the 40-cluster collapses to one rep, the variant
        # still pairs with it, and the within-cluster dup pairs all
        # emit at hamming 0.
        def pert(x, y):
            v = _ramp(x, y)
            return (v + 128) % 256 if x < 2 and y < 2 else v

        rows = [(i, _gray_bmp(12, 10, _ramp)) for i in range(40)]
        rows.append((100, _gray_bmp(12, 10, pert)))
        media = spark.createDataFrame(rows, "media_id long, content binary")
        out = phash_near_dup_pairs(phash_media(media), max_bucket=8).collect()
        pairs = {(r.id_a, r.id_b): r.hamming for r in out}
        assert len([p for p in pairs if p[1] < 100]) == 40 * 39 // 2
        assert all(h == 0 for (a, b), h in pairs.items() if b < 100)
        # the near-variant pairs with every cluster member via the rep
        assert {(a, b) for (a, b) in pairs if b == 100} == {
            (i, 100) for i in range(40)
        }
