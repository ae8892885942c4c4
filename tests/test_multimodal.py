import struct
import zlib

import pytest

from mergeextractor_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    encode_fake_image,
    header_image_codec,
    image_metadata,
    sample_frames,
)


def make_png(width: int, height: int) -> bytes:
    """A complete, valid grayscale PNG built with stdlib only."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 — enough of a JPEG for any header parser."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0_body = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof0_body)) + sof0_body
    return b"\xff\xd8" + app0 + sof0


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_fake_image(64, 48), "mime": "image/fake"},
        {"media_id": 2, "kind": "image", "payload": encode_fake_image(8, 8, fill=7), "mime": "image/fake"},
        {"media_id": 3, "kind": "image", "payload": b"garbage", "mime": "image/fake"},
        {"media_id": 4, "kind": "video", "payload": bytes(range(200)), "mime": "video/fake"},
        {"media_id": 5, "kind": "audio", "payload": b"\x00" * 32, "mime": "audio/fake"},
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_default_codec_parses_real_containers():
    assert decode_image(make_png(320, 200)) == (320, 200)
    assert decode_image(make_gif(13, 7)) == (13, 7)
    assert decode_image(make_jpeg(640, 480)) == (640, 480)
    assert header_image_codec(encode_fake_image(5, 6)) == (5, 6)  # fallback
    with pytest.raises(ValueError):
        decode_image(b"not an image at all")


def test_image_metadata_on_real_images(spark):
    rows = [
        {"media_id": 10, "kind": "image", "payload": make_png(320, 200), "mime": "image/png"},
        {"media_id": 11, "kind": "image", "payload": make_gif(13, 7), "mime": "image/gif"},
        {"media_id": 12, "kind": "image", "payload": make_jpeg(640, 480), "mime": "image/jpeg"},
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: (r.width, r.height) for r in image_metadata(df).collect()}
    assert out == {10: (320, 200), 11: (13, 7), 12: (640, 480)}


def test_image_metadata(media_df):
    out = {r.media_id: r for r in image_metadata(media_df).collect()}
    assert set(out) == {1, 2, 3}  # only kind == image
    assert (out[1].width, out[1].height) == (64, 48)
    assert (out[2].width, out[2].height) == (8, 8)
    assert (out[3].width, out[3].height) == (-1, -1)  # undecodable → sentinel
    assert out[1].n_bytes == len(encode_fake_image(64, 48))


def test_frame_sampling_fanout(media_df):
    frames = sample_frames(media_df, every_n_bytes=64).collect()
    assert {f.media_id for f in frames} == {4}
    assert [f.frame_idx for f in sorted(frames, key=lambda f: f.frame_idx)] == [0, 1, 2, 3]
    assert sum(len(f.frame) for f in frames) == 200


def test_wav_header_codec_roundtrip():
    from mergeextractor_spark.operators.multimodal import (
        encode_fake_audio,
        encode_wav,
        wav_header_codec,
    )

    ch, rate, bits, n = wav_header_codec(encode_wav(4000, sample_rate=16000, channels=2))
    assert (ch, rate, bits, n) == (2, 16000, 16, 4000)
    assert wav_header_codec(encode_fake_audio(1, 44100, 16, 44100)) == (1, 44100, 16, 44100)
    with pytest.raises(ValueError):
        wav_header_codec(b"definitely not audio")


def test_audio_metadata(spark):
    from mergeextractor_spark.operators.multimodal import (
        audio_metadata,
        encode_wav,
        encode_fake_audio,
    )

    rows = [
        {"media_id": 20, "kind": "audio", "payload": encode_wav(8000, 8000, 1), "mime": "audio/wav"},
        {"media_id": 21, "kind": "audio", "payload": encode_fake_audio(2, 44100, 16, 22050), "mime": "audio/fake"},
        {"media_id": 22, "kind": "audio", "payload": b"garbage", "mime": "audio/?"},
        {"media_id": 23, "kind": "image", "payload": b"skip me", "mime": "image/png"},
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in audio_metadata(df).collect()}
    assert set(out) == {20, 21, 22}  # only kind == audio
    assert (out[20].channels, out[20].sample_rate, out[20].duration_ms) == (1, 8000, 1000)
    assert (out[21].channels, out[21].sample_rate, out[21].duration_ms) == (2, 44100, 500)
    assert out[22].channels == -1 and out[22].duration_ms == -1  # undecodable sentinel


def test_mp4_box_codec_roundtrip():
    from mergeextractor_spark.operators.multimodal import encode_mp4, mp4_box_codec

    payload = encode_mp4(2500, timescale=600, n_tracks=2, mdat_size=100)
    dur, ts, nt, mb = mp4_box_codec(payload)
    assert (dur, ts, nt, mb) == (2500, 600, 2, 100)
    with pytest.raises(ValueError):
        mp4_box_codec(b"\x00" * 32)  # no ftyp


def test_video_metadata_real_and_fake(spark):
    from mergeextractor_spark.operators.multimodal import _media_df, video_metadata

    out = {r.media_id: r for r in video_metadata(_media_df(spark)).collect()}
    # 500-series are real MP4s: duration (i+1)s at timescale 600
    for i in range(8):
        r = out[500 + i]
        assert r.duration_ms == 1000 * (i + 1)
        assert r.timescale == 600
        assert r.n_tracks == 1 + i % 3
        assert r.mdat_bytes == 64 + 16 * i
    # 200-series byte-stream fakes fail the box walk -> -1 rows
    for i in range(8):
        assert out[200 + i].duration_ms == -1


def test_dhash_resize_and_perturbation_invariance(spark):
    """The dHash battery in the media fixture: base gradient (600), its
    sparse perturbation (601) and its 2x re-render (602) must cluster;
    checkerboard (603) and inverted gradient (604) must stay distinct."""
    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _media_df,
        dedup_image_phash_frame,
        image_phash,
    )

    sig = {r.media_id: r.phash for r in image_phash(_media_df(spark)).collect()}
    assert sig[600] is not None

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(600, 601) <= PHASH_HAMMING_MAX, ham(600, 601)
    assert ham(600, 602) <= PHASH_HAMMING_MAX, ham(600, 602)
    assert ham(600, 603) > PHASH_HAMMING_MAX, ham(600, 603)
    assert ham(600, 604) > PHASH_HAMMING_MAX, ham(600, 604)

    out = {r.media_id: r for r in dedup_image_phash_frame(_media_df(spark)).collect()}
    assert out[601].rep_id == 600 and out[601].is_dup
    assert out[602].rep_id == 600 and out[602].is_dup
    assert out[600].rep_id == 600 and not out[600].is_dup
    assert not out[603].is_dup and out[603].rep_id == 603
    assert not out[604].is_dup and out[604].rep_id == 604
    # uniform images (flat PNGs + FAKEIMG) all hash to 0 and collapse to
    # the smallest uniform media_id — identical blank frames ARE dups
    uniform = [m for m in out if m < 600]
    rep0 = min(uniform)
    assert all(out[m].rep_id == rep0 for m in uniform), {
        m: out[m].rep_id for m in uniform
    }


def test_stdlib_pixel_codec_decodes_own_png(spark):
    from mergeextractor_spark.operators.multimodal import (
        encode_png,
        stdlib_pixel_codec,
    )

    px = stdlib_pixel_codec(encode_png(5, 3, pixel_fn=lambda x, y: x * 10 + y))
    assert len(px) == 3 and len(px[0]) == 5
    assert px[2][4] == 42
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        stdlib_pixel_codec(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)  # wrong depth


def test_audio_fingerprint_invariance_and_dedup(spark):
    """Audio battery: base envelope (700), half-amplitude (701) and
    2x-duration (702) re-renders cluster; inverted envelope (703) stays
    distinct. Flat-tone WAVs (300+) all hash to zero and collapse to
    one rep; FAKEAUD payloads (no samples) yield NULL signatures."""
    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _media_df,
        audio_fingerprint,
        dedup_audio_fingerprint_frame,
    )

    sig = {r.media_id: r.phash for r in audio_fingerprint(_media_df(spark)).collect()}
    assert all(sig[m] is None for m in sig if 400 <= m < 500)  # FAKEAUD
    assert sig[700] is not None

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(700, 701) <= PHASH_HAMMING_MAX, ham(700, 701)
    assert ham(700, 702) <= PHASH_HAMMING_MAX, ham(700, 702)
    assert ham(700, 703) > PHASH_HAMMING_MAX, ham(700, 703)

    out = {r.media_id: r for r in dedup_audio_fingerprint_frame(_media_df(spark)).collect()}
    assert out[701].rep_id == 700 and out[701].is_dup
    assert out[702].rep_id == 700 and out[702].is_dup
    assert out[700].rep_id == 700 and not out[700].is_dup
    assert out[703].rep_id == 703 and not out[703].is_dup
    flat = [m for m in out if 300 <= m < 400]
    assert flat and all(out[m].rep_id == min(flat) for m in flat)


def test_pcm_codec_roundtrip():
    from mergeextractor_spark.operators.multimodal import (
        encode_wav,
        stdlib_pcm_codec,
    )

    samples = stdlib_pcm_codec(encode_wav(100, sample_fn=lambda i, n: i * 10 - 500))
    assert len(samples) == 100
    assert samples[0] == -500 and samples[99] == 490
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        stdlib_pcm_codec(b"FAKEAUD\x00\x00")


def test_video_fingerprint_invariance_and_dedup(spark):
    """Video battery: base byte-stream envelope (800) and its 2x-duration
    re-render (801) cluster; the inverted envelope (802) stays distinct."""
    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _media_df,
        dedup_video_fingerprint_frame,
        video_fingerprint,
    )

    sig = {r.media_id: r.phash for r in video_fingerprint(_media_df(spark)).collect()}
    assert sig[800] is not None

    def ham(a, b):
        return bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")

    assert ham(800, 801) <= PHASH_HAMMING_MAX, ham(800, 801)
    assert ham(800, 802) > PHASH_HAMMING_MAX, ham(800, 802)

    out = {r.media_id: r for r in dedup_video_fingerprint_frame(_media_df(spark)).collect()}
    assert out[801].rep_id == 800 and out[801].is_dup
    assert out[800].rep_id == 800 and not out[800].is_dup
    assert out[802].rep_id == 802 and not out[802].is_dup


def test_banded_dedup_matches_allpairs_within_pigeonhole(spark):
    """On ARBITRARY flip sets up to hamming 6 — spanning any of the 7
    bands and 8 blocks — the banded pipeline must agree EXACTLY with
    brute-force all-pairs hamming <= 6 (double-pigeonhole recall is
    guaranteed, not probabilistic; ADVICE r6 medium)."""
    from pyspark.sql import functions as F

    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _banded_hamming_dedup,
    )

    # 900 uniques + 100 near-dups: flip f = id % 7 bits (0..6) at
    # positions (id*7 + i*13) % 64 — i*13 mod 64 are distinct for i < 7,
    # so exactly f bits flip, anywhere in the 64-bit word (the old
    # 4x16-band layout missed pairs whose flips spanned all 4 bands)
    flips = " ^ ".join(
        f"(CASE WHEN id % 7 > {i} THEN shiftleft(1L, cast((id * 7 + {i * 13}) % 64 as int)) ELSE 0L END)"
        for i in range(6)
    )
    df = spark.range(1000).select(
        F.col("id").alias("media_id"),
        F.when(
            F.col("id") < 900, F.xxhash64("id")
        ).otherwise(
            F.expr(f"xxhash64(id % 900) ^ ({flips})")
        ).alias("phash"),
    )
    banded = {r.media_id: r.rep_id for r in _banded_hamming_dedup(df).collect()}

    sig = df.collect()
    vals = {r.media_id: r.phash for r in sig}
    ids = sorted(vals)
    brute = {}
    for i in ids:
        rep = i
        for j in ids:
            if j >= i:
                break
            if bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1") <= PHASH_HAMMING_MAX:
                rep = j
                break
        brute[i] = rep
    assert banded == brute


def test_banded_dedup_matches_allpairs_on_seeded_random_corpus(spark):
    """Randomized complement to the structured-flip test: 300 signatures
    drawn from a seeded generator mixing uniform randoms, low-entropy
    clusters and exact duplicates — the banded pipeline must agree with
    brute force EXACTLY, whatever hamming structure the draw produces."""
    import random

    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _banded_hamming_dedup,
    )

    rng = random.Random(0xB4D5EED)
    sigs = {}
    mid = 0
    for _ in range(40):  # cluster seeds
        base = rng.getrandbits(64)
        for _ in range(rng.randint(1, 12)):
            flips = rng.randint(0, 9)  # 0..9 bits — straddles the threshold
            mask = 0
            for pos in rng.sample(range(64), flips):
                mask |= 1 << pos
            sigs[mid] = (base ^ mask) - (1 << 63)  # signed-long domain
            mid += 1
        if mid >= 300:
            break

    df = spark.createDataFrame(
        [(k, v) for k, v in sigs.items()], "media_id long, phash long"
    )
    banded = {r.media_id: r.rep_id for r in _banded_hamming_dedup(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    brute = {}
    for i in sorted(sigs):
        rep = i
        for j in sorted(sigs):
            if j >= i:
                break
            if ham(sigs[i], sigs[j]) <= PHASH_HAMMING_MAX:
                rep = j
                break
        brute[i] = rep
    assert banded == brute


def test_banded_dedup_width_schemes_equivalent(spark):
    """VERDICT r7 item 6: the 196-key (band, block-pair) construction —
    the documented 10⁸⁺-signature escape hatch — must produce EXACTLY
    the same dedup assignment as the 56-key default and as brute force:
    both schemes guarantee full recall at hamming <= 6, and the verify
    stage makes precision exact, so the outputs are identical, not
    merely both-correct."""
    import random

    from mergeextractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _band_blockpair_entries,
        _banded_hamming_dedup,
    )

    rng = random.Random(0x196BEEF)
    sigs = {}
    mid = 0
    for _ in range(40):
        base = rng.getrandbits(64)
        for _ in range(rng.randint(1, 12)):
            flips = rng.randint(0, 9)
            mask = 0
            for pos in rng.sample(range(64), flips):
                mask |= 1 << pos
            sigs[mid] = (base ^ mask) - (1 << 63)
            mid += 1
        if mid >= 300:
            break

    df = spark.createDataFrame(
        [(k, v) for k, v in sigs.items()], "media_id long, phash long"
    )
    narrow = {r.media_id: r.rep_id for r in _banded_hamming_dedup(df).collect()}
    wide = {
        r.media_id: r.rep_id
        for r in _banded_hamming_dedup(
            df, entries_builder=_band_blockpair_entries
        ).collect()
    }
    assert narrow == wide

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    brute = {}
    for i in sorted(sigs):
        rep = i
        for j in sorted(sigs):
            if j >= i:
                break
            if ham(sigs[i], sigs[j]) <= PHASH_HAMMING_MAX:
                rep = j
                break
        brute[i] = rep
    assert narrow == brute
