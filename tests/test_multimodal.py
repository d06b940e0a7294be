"""Multimodal plumbing: binary payloads + typed metadata through mapInPandas.
The codec layer is stubbed (no pillow/ffmpeg in the container); the Spark
plumbing — schemas, Arrow binary transfer, batch shapes, row explosion,
error routing — is real and tested here."""
import pytest

from newsspark.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    embed_media,
    frame_sample,
    make_audio,
    make_image,
    make_video,
    media_df,
    resize_plan,
    _decode_one,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    df = media_df(spark, SF)
    df.cache().count()
    return df


def test_media_table_shape(media):
    rows = media.limit(50).collect()
    assert {r["kind"] for r in rows} <= {"image", "audio", "video"}
    assert all(isinstance(bytes(r["payload"]), bytes) for r in rows)


def test_decode_parses_fake_containers(spark, media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    imgs = [r for r in out.values() if r["kind"] == "image" and r["error"] is None]
    auds = [r for r in out.values() if r["kind"] == "audio" and r["error"] is None]
    vids = [r for r in out.values() if r["kind"] == "video" and r["error"] is None]
    assert imgs and auds and vids
    # sel==0 (PPM), sel==2 (DC-only JPEG), sel==5 (zlib+unfilter PNG)
    # and sel==8 (LZW GIF) are small FULLY-decoded images with real
    # pixel means; the rest (fake FIMG containers) keep big dims and
    # stubbed pixels
    ppms = [r for r in imgs if r["media_id"] % 9 == 0]
    jpgs = [r for r in imgs if r["media_id"] % 9 == 2]
    pngs = [r for r in imgs if r["media_id"] % 9 == 5]
    gifs = [r for r in imgs if r["media_id"] % 9 == 8]
    rest = [r for r in imgs if r["media_id"] % 9 not in (0, 2, 5, 8)]
    assert ppms and jpgs and pngs and gifs and rest
    assert all(24 <= r["width"] <= 56 and 16 <= r["height"] <= 36
               and r["mean_pixel"] is not None for r in ppms)
    assert all(24 <= r["width"] <= 56 and 16 <= r["height"] <= 32
               and r["mean_pixel"] is not None for r in jpgs)
    assert all(22 <= r["width"] <= 54 and 15 <= r["height"] <= 35
               and r["mean_pixel"] is not None for r in pngs)
    assert all(20 <= r["width"] <= 52 and 14 <= r["height"] <= 34
               and r["mean_pixel"] is not None for r in gifs)
    assert all(r["width"] >= 320 and r["height"] >= 240
               and r["mean_pixel"] is None for r in rest)
    assert all(r["sample_rate"] == 16000 for r in auds)
    # FVID fakes carry frame counts; real mp4s carry box-walk duration
    fvids = [r for r in vids if r["media_id"] % 5 != 2]
    mp4s = [r for r in vids if r["media_id"] % 5 == 2]
    assert fvids and mp4s
    assert all(r["n_frames"] > 0 for r in fvids)
    assert all(r["duration_ms"] > 0 and r["n_frames"] is None for r in mp4s)
    assert all(0 <= r["byte_entropy"] <= 8 for r in imgs)
    # corrupt rows (~2%) land in the error column, never kill the job
    errs = [r for r in out.values() if r["error"] is not None]
    assert errs


def test_real_format_headers_parsed_without_codecs():
    from newsspark.multimodal import (
        make_real_gif, make_real_jpeg, make_real_png, make_real_wav,
    )

    jpeg = _decode_one(make_real_jpeg(1, 640, 480))
    assert (jpeg["width"], jpeg["height"], jpeg["error"]) == (640, 480, None)
    png = _decode_one(make_real_png(2, 800, 600))
    assert (png["width"], png["height"], png["error"]) == (800, 600, None)
    gif = _decode_one(make_real_gif(3, 320, 200))
    assert (gif["width"], gif["height"], gif["error"]) == (320, 200, None)
    wav = _decode_one(make_real_wav(4, 44100, 1000))
    assert (wav["sample_rate"], wav["error"]) == (44100, None)


def test_real_formats_without_parser_stubbed_not_crashed():
    # malformed real headers error per-row, never raise: an ftyp with no
    # moov box is a truncated container, not a crash
    mp4 = _decode_one(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)
    assert mp4["error"] is not None and "no moov box" in mp4["error"]
    bad_jpeg = _decode_one(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    assert bad_jpeg["error"] is not None and "jpeg" in bad_jpeg["error"]


def test_planted_real_headers_decode_in_media_table(spark, media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    jpeg_ids = [
        m for m, r in out.items()
        if r["kind"] == "image" and m % 9 == 2 and r["error"] is None
    ]
    assert jpeg_ids, "corpus must plant real-jpeg rows"
    for m in jpeg_ids:
        assert out[m]["width"] == 8 * (3 + m % 5)
        assert out[m]["height"] == 8 * (2 + m % 3)
    wav_ids = [
        m for m, r in out.items()
        if r["kind"] == "audio" and m % 8 == 1 and r["error"] is None
    ]
    assert wav_ids and all(out[m]["sample_rate"] == 16000 for m in wav_ids)
    mp4s = [
        r for m, r in out.items()
        if r["kind"] == "video" and m % 5 == 2 and m % 50 != 7
    ]
    assert mp4s, "corpus must plant real-mp4 rows"
    for r in mp4s:
        assert r["error"] is None
        assert (r["width"], r["height"]) == (640, 360)
        assert r["duration_ms"] == 1000 * (1 + r["media_id"] % 8)


def test_decode_deterministic():
    a = _decode_one(make_image(7, 320, 240))
    b = _decode_one(make_image(7, 320, 240))
    assert a == b
    c = _decode_one(make_image(8, 320, 240))
    assert a["mean_byte"] != c["mean_byte"]


def test_resize_plan_letterbox(spark, media):
    out = [r for r in resize_plan(media, 224, 224).collect() if r["error"] is None]
    assert out
    for r in out:
        assert max(r["fit_w"], r["fit_h"]) <= 224
        assert r["pad_x"] >= 0 and r["pad_y"] >= 0
        assert r["fit_w"] + 2 * r["pad_x"] in (223, 224)  # integer floor slack


def test_frame_sample_explodes_rows(spark, media):
    out = frame_sample(media, every_ms=1000).collect()
    ok = [r for r in out if r["error"] is None]
    assert len(ok) > 0
    by_media = {}
    for r in ok:
        by_media.setdefault(r["media_id"], []).append(r)
    fvid = next(rows for m, rows in by_media.items() if m % 5 != 2)
    idxs = sorted(r["frame_idx"] for r in fvid)
    assert idxs[0] == 0
    diffs = {b - a for a, b in zip(idxs, idxs[1:])}
    assert len(diffs) <= 1  # uniform stride
    # real mp4 rows: TIME-based sampling over the demuxed duration
    mp4 = next((m, rows) for m, rows in by_media.items() if m % 5 == 2)
    m, rows = mp4
    assert all(r["frame_idx"] is None for r in rows)
    assert sorted(r["ts_ms"] for r in rows) == list(
        range(0, 1000 * (1 + m % 8), 1000)
    )


def test_embeddings_normalized_and_ann_compatible(spark, media):
    emb = embed_media(media)
    rows = [r for r in emb.collect() if r["error"] is None]
    assert rows
    import math

    for r in rows[:20]:
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(norm - 1.0) < 1e-3
        assert len(r["embedding"]) == 64
    # feeds the ANN operator from textops directly
    from newsspark import textops

    vecs = emb.where("error is null").selectExpr(
        "media_id as vec_id", "embedding"
    )
    top = textops.ann_bruteforce_topk(vecs, n_queries=3, k=2).collect()
    assert len(top) == 6


def test_embed_media_matches_frozen_fixture(spark, media):
    """The media_embed_ann driver oracle recomputes top-k from
    tests/fixtures/golden/media_embeddings.jsonl; this pins the LIVE
    embed_media output to that fixture so any embedding drift is caught
    before the driver gate.  Deliberate spec moves re-freeze via
    scripts/freeze_media_embeddings.py."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "golden", "media_embeddings.jsonl",
    )
    frozen = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            frozen[r["vec_id"]] = r["embedding"]
    live = {
        r["media_id"]: [float(v) for v in r["embedding"]]
        for r in embed_media(media).where("error is null").collect()
    }
    assert set(live) == set(frozen)
    assert live == frozen  # exact float32-widened doubles, no tolerance


def test_ppm_pixel_decode_is_real():
    """VERDICT r3 #6: the PPM path decodes actual pixels (not a stub) —
    header parse, full (h, w, 3) plane, gradient mean matching the
    closed-form cycle sum the DuckDB oracle replays; truncation and
    malformed maxval raise ValueError into the error column."""
    from newsspark.multimodal import _ppm_pixels, make_real_ppm

    seed, w, h = 207, 30, 18
    payload = make_real_ppm(seed, w, h)
    px = _ppm_pixels(payload)
    assert px.shape == (h, w, 3)
    n, s = w * h * 3, seed % 256

    def F(t):
        r = t % 256
        return (t // 256) * 32640 + r * (r - 1) // 2

    assert float(px.mean()) == (F(s + n) - F(s)) / n

    d = _decode_one(payload)
    assert (d["width"], d["height"], d["error"]) == (w, h, None)
    assert d["mean_pixel"] == (F(s + n) - F(s)) / n

    trunc = _decode_one(payload[:6])
    assert trunc["error"].startswith("ValueError")
    cut = _decode_one(payload[:-5])
    assert "truncated pixel data" in cut["error"]

    bad_maxval = payload.replace(b"255\n", b"65535\n", 1)
    assert "unsupported maxval" in _decode_one(bad_maxval)["error"]


def test_ppm_embed_uses_pixels(spark):
    """embed_media must embed PPM rows over the DECODED pixel plane, so
    two PPMs with identical pixels but different header spellings embed
    identically (a raw-bytes embed would differ), and a truncated PPM
    errors instead of embedding garbage container bytes."""
    import numpy as np

    from newsspark.multimodal import _ppm_pixels, make_real_ppm

    a = make_real_ppm(42, 20, 12)
    # same pixels, whitespace-padded header: P6 allows any whitespace runs
    b = a.replace(b"P6\n20 12\n255\n", b"P6\n20  12\n255\n", 1)
    assert a != b and np.array_equal(_ppm_pixels(a), _ppm_pixels(b))
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, a[:40])], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in embed_media(df).collect()}
    assert out[0]["error"] is None and out[1]["error"] is None
    assert list(out[0]["embedding"]) == list(out[1]["embedding"])
    assert out[2]["embedding"] is None and "ppm" in out[2]["error"]


def test_wav_sample_decode_is_real():
    """The audio twin of the PPM test: make_real_wav's 16-bit PCM data
    chunk decodes to the full int16 gradient sample array, its mean
    matches the closed-form cycle sum the oracle replays, and short
    payloads still parse sample_rate without a data chunk."""
    from newsspark.multimodal import WAV_MAX_SAMPLES, _wav_chunks, make_real_wav

    seed, sr = 1201, 16000
    payload = make_real_wav(seed, sr, 50000)
    got_sr, samples = _wav_chunks(payload)
    n, s = WAV_MAX_SAMPLES, seed % 256
    assert got_sr == sr and len(samples) == n

    def F(t):
        r = t % 256
        return (t // 256) * 32640 + r * (r - 1) // 2

    expect = (F(s + n) - F(s) - 128 * n) / n
    assert float(samples.mean()) == expect

    d = _decode_one(payload)
    assert d["sample_rate"] == sr and d["mean_sample"] == expect
    assert d["error"] is None

    # fewer samples than the cap: decode follows the data chunk length
    small = make_real_wav(3, 8000, 7)
    _, s7 = _wav_chunks(small)
    assert len(s7) == 7

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a WAVE"):
        _wav_chunks(b"RIFF\x00\x00\x00\x00JUNK")


def test_wav_embed_uses_samples(spark):
    """embed_media embeds WAV rows over decoded PCM samples: two WAVs with
    identical samples but different chunk padding embed identically."""
    import struct as _struct

    from newsspark.multimodal import make_real_wav

    a = make_real_wav(9, 16000, 100)
    # inject a junk chunk between fmt and data: same decoded samples
    i = a.index(b"data")  # safe here: first occurrence is the chunk id
    junk = b"LIST" + _struct.pack("<I", 4) + b"INFO"
    b = a[:i] + junk + a[i:]
    df = spark.createDataFrame(
        [(0, a), (1, b)], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in embed_media(df).collect()}
    assert out[0]["error"] is None and out[1]["error"] is None
    assert list(out[0]["embedding"]) == list(out[1]["embedding"])


def test_mp4_box_walk_demux_is_real():
    """The mp4 path walks actual ISO-BMFF boxes (not a magic-string stub):
    ftyp detection at any box size, mvhd timescale/duration, tkhd 16.16
    dims; bad box sizes and missing moov/mvhd raise ValueError into the
    error column."""
    from newsspark.multimodal import _mp4_meta, make_real_mp4

    payload = make_real_mp4(3, 1280, 720, 5500, timescale=600)
    meta = _mp4_meta(payload)
    assert (meta["width"], meta["height"]) == (1280, 720)
    # duration round-trips through the timescale: 5500ms * 600/1000 = 3300
    # ticks -> 3300 * 1000 // 600 = 5500ms
    assert meta["duration_ms"] == 5500

    d = _decode_one(payload)
    assert d["error"] is None and d["duration_ms"] == 5500
    assert (d["width"], d["height"]) == (1280, 720)

    cut = _decode_one(payload[: len(payload) - 20])
    assert cut["error"] is not None  # moov box truncated -> bad box size
    assert "mp4" in cut["error"]


def test_frame_sample_zero_duration_mp4_yields_error_row(spark):
    """Per-row totality: a real-world zero-length mp4 container must still
    produce one (error) row, not silently vanish (range(0, 0, every_ms)
    is empty) — ADVICE r4."""
    from newsspark.multimodal import make_real_mp4

    media = spark.createDataFrame(
        [(1, 1, "video", make_real_mp4(1, 640, 360, duration_ms=0), 640,
          360, 0),
         (2, 2, "video", make_real_mp4(2, 640, 360, duration_ms=2000), 640,
          360, 2000)],
        MEDIA_SCHEMA,
    )
    out = frame_sample(media).collect()
    zero = [r for r in out if r["media_id"] == 1]
    assert len(zero) == 1
    assert zero[0]["error"] == "mp4: zero duration"
    assert zero[0]["ts_ms"] is None and zero[0]["frame_idx"] is None
    ok = [r for r in out if r["media_id"] == 2]
    assert len(ok) == 2 and all(r["error"] is None for r in ok)


def test_gif_lzw_codec_is_real():
    """From-scratch GIF LZW both directions: round-trip across dictionary-
    heavy, random, and constant streams (constant runs exercise the KwKwK
    just-assigned-code case and width growth to 12 bits); the full-file
    decode recovers the exact gradient pixels with the closed-form mean;
    corrupt streams raise (routed to the error column by callers)."""
    import numpy as np

    from newsspark.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
        _gif_pixels,
        make_real_gif,
    )

    rng = np.random.default_rng(7)
    for data in [
        bytes(((np.arange(5000) + 13) % 256).astype(np.uint8)),
        rng.integers(0, 256, 9000, dtype=np.uint8).tobytes(),
        b"\x00" * 7000,          # max dictionary growth + KwKwK
        bytes(range(256)) * 20,
        b"a",
        b"",
    ]:
        assert _gif_lzw_decode(8, _gif_lzw_encode(data)) == data

    seed, w, h = 107, 52, 34
    px = _gif_pixels(make_real_gif(seed, w, h))
    assert px.shape == (h, w, 3)
    n = w * h

    def cum(t):
        return (t // 256) * 32640 + (t % 256) * ((t % 256) - 1) // 2

    s = seed % 256
    assert float(px.mean()) == (cum(s + n) - cum(s)) / n

    # corrupt LZW stream and truncated file both raise, never hang
    with pytest.raises(ValueError):
        _gif_lzw_decode(8, b"\xff\xff\xff\xff")
    with pytest.raises(ValueError):
        _gif_pixels(make_real_gif(1, 10, 10)[:40])


def test_gif_embed_uses_pixels(spark):
    """GIF embeddings must run over the DECODED palette-mapped pixels:
    two gifs with identical pixel content but different container byte
    layout (extension block injected) embed identically."""
    import numpy as np

    from newsspark.multimodal import make_real_gif

    base = make_real_gif(5, 30, 20)
    # splice a no-op comment extension between the color table and the
    # image descriptor: container bytes differ, pixels identical
    cut = 13 + 768  # header + screen descriptor + 256-entry GCT
    spliced = base[:cut] + b"\x21\xfe\x03abc\x00" + base[cut:]
    assert spliced != base
    media = spark.createDataFrame(
        [(1, 1, "image", base, 30, 20, 0),
         (2, 2, "image", spliced, 30, 20, 0)],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in embed_media(media).collect()}
    assert rows[1]["error"] is None and rows[2]["error"] is None
    assert np.allclose(rows[1]["embedding"], rows[2]["embedding"], atol=0)


def test_png_inflate_unfilter_is_real():
    """From-scratch PNG decode: zlib IDAT inflate + full scanline
    unfiltering.  The generator cycles ALL FIVE filter types by row, so
    a single round-trip exercises None/Sub/Up/Average/Paeth; decoded
    pixels equal the exact gradient with the closed-form mean; truncated
    and non-truecolor payloads error cleanly."""
    import numpy as np

    from newsspark.multimodal import _png_pixels, make_real_png

    for seed, w, h in [(5, 22, 15), (107, 54, 35), (0, 3, 7)]:
        px = _png_pixels(make_real_png(seed, w, h))
        n = w * h * 3
        want = ((np.arange(n, dtype=np.int64) + seed) % 256).astype(
            np.uint8
        ).reshape(h, w, 3)
        assert np.array_equal(px, want)

    def cum(t):
        return (t // 256) * 32640 + (t % 256) * ((t % 256) - 1) // 2

    seed, w, h = 9, 22, 15
    n = w * h * 3
    px = _png_pixels(make_real_png(seed, w, h))
    assert float(px.mean()) == (cum(seed + n) - cum(seed)) / n

    with pytest.raises(ValueError):
        _png_pixels(make_real_png(1, 10, 10)[:20])
    # grayscale IHDR (color type 0) routes to NotImplementedError
    import struct as _s

    bad = bytearray(make_real_png(1, 4, 4))
    bad[25] = 0  # color type
    # fix the IHDR crc so the chunk walk is not the failure we hit
    import zlib as _z

    crc = _z.crc32(b"IHDR" + bytes(bad[16:29])) & 0xFFFFFFFF
    bad[29:33] = _s.pack(">I", crc)
    with pytest.raises(NotImplementedError):
        _png_pixels(bytes(bad))


def test_animated_gif_demux_and_frame_sample(spark):
    """Animated GIF is the one video-like format with REAL decoded frame
    payloads: the demux recovers every frame's pixels + GCE delay;
    decode reports the true frame count and duration; frame_sample
    emits the first frame at or after each grid point with its true
    display time."""
    import numpy as np

    from newsspark.multimodal import _gif_frames, make_real_gif

    g = make_real_gif(14, 20, 15, n_frames=8, delay_ms=250)
    frames = _gif_frames(g)
    assert len(frames) == 8 and all(d == 250 for d, _ in frames)
    n = 20 * 15
    for f, (_d, px) in enumerate(frames):
        want = ((np.arange(n, dtype=np.int64) + 14 + f) % 256).astype(
            np.uint8
        )
        assert np.array_equal(px.reshape(-1)[::3], want)

    d = _decode_one(g)
    assert (d["n_frames"], d["duration_ms"], d["error"]) == (8, 2000, None)

    media = spark.createDataFrame(
        [(1, 1, "video", g, 20, 15, 2000),
         (2, 2, "video", make_real_gif(3, 20, 15), 20, 15, 0)],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(media).collect()
    anim = sorted(
        ((r["frame_idx"], r["ts_ms"]) for r in rows if r["media_id"] == 1)
    )
    assert anim == [(0, 0), (4, 1000)]  # true display times, stride 4
    still = [r for r in rows if r["media_id"] == 2]
    assert len(still) == 1 and still[0]["error"] == "gif: not animated"


def test_jpeg_dc_only_decode_is_real():
    """From-scratch baseline-JPEG entropy decode: Annex-K canonical
    Huffman tables, bit-level DC category + sign extension, byte
    unstuffing, AC run-length grammar, dequantization, and the EXACT
    flat IDCT of DC-only blocks.  Blocks with AC energy degrade to
    header-only metadata (never a wrong pixel); malformed streams
    raise ValueError."""
    import numpy as np

    from newsspark.multimodal import _jpeg_pixels, make_real_jpeg

    for seed, w, h in [(7, 24, 16), (200, 56, 32), (0, 8, 8)]:
        px = _jpeg_pixels(make_real_jpeg(seed, w, h))
        assert px.shape == (h, w)
        nb = (w // 8) * (h // 8)
        want = ((np.arange(nb, dtype=np.int64) + seed) % 256)
        got = px.reshape(h // 8, 8, w // 8, 8)[:, 0, :, 0].reshape(-1)
        assert np.array_equal(got, want)
        assert (px.reshape(h // 8, 8, w // 8, 8).std(axis=(1, 3)) == 0).all()

    def cum(t):
        return (t // 256) * 32640 + (t % 256) * ((t % 256) - 1) // 2

    seed, w, h = 9, 32, 24
    nb = (w // 8) * (h // 8)
    px = _jpeg_pixels(make_real_jpeg(seed, w, h))
    assert float(px.mean()) == (cum(seed + nb) - cum(seed)) / nb

    # metadata path carries the decoded mean; truncation stays ValueError
    d = _decode_one(make_real_jpeg(9, 32, 24))
    assert (d["width"], d["height"], d["error"]) == (32, 24, None)
    assert d["mean_pixel"] == float(px.mean())
    with pytest.raises(ValueError):
        _jpeg_pixels(make_real_jpeg(1, 16, 16)[:40])


def test_corrupt_payloads_route_to_error_rows_everywhere(spark):
    """Per-row totality on arbitrary corrupt bytes (ADVICE r5): truncated
    GIF/PNG/JPEG soup raised IndexError out of frame_sample/embed_media's
    narrow except clauses and killed the task; every decode surface must
    instead emit an error (or degraded-metadata) row per input row."""
    from newsspark.multimodal import decode_media, embed_media, frame_sample

    evil = [
        (1, 1, "image", b"GIF89a" + b"\x05\x00\x05\x00\x91", 5, 5, 0),
        (2, 2, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"IHDR\xff", 5,
         5, 0),
        (3, 3, "image", b"\xff\xd8\xff\xe0" + b"\x00\x10JFIF\x00", 5, 5, 0),
        (4, 4, "video", b"GIF89a\x05\x00", 5, 5, 0),
        (5, 5, "audio", b"RIFF\x04\x00\x00\x00WAVE", 0, 0, 0),
        (6, 6, "video", b"FVID\x00\x00", 5, 5, 0),
        (7, 7, "video", b"xxxxftypisom", 5, 5, 0),
    ]
    media = spark.createDataFrame(evil, MEDIA_SCHEMA)
    dec = decode_media(media).collect()
    assert len(dec) == len(evil)  # one row per input, no task death
    # frame_sample only consumes kind == "video"
    fs = frame_sample(media).collect()
    assert {r["media_id"] for r in fs} == {4, 6, 7}
    assert all(r["error"] is not None for r in fs)
    emb = embed_media(media).collect()
    assert len(emb) == len(evil)
    for r in emb:
        assert r["embedding"] is not None or r["error"] is not None
