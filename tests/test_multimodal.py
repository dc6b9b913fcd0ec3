"""RAW-codec multimodal tests: real numpy decode/resize/frame-stride
paths (compressed-format kernels remain gated behind require_codec)."""

from __future__ import annotations

# --- RAW codec: the real (numpy-only) decode path ---------------------------


def test_raw_blob_roundtrip_and_malformed(spark):
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_raw_blob,
        encode_raw_blob,
    )

    pix = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    blob = encode_raw_blob(pix, 2)
    back = decode_raw_blob(blob)
    assert back.shape == (2, 3, 4, 3)
    assert (back == pix).all()
    assert decode_raw_blob(b"JUNK" + blob[4:]) is None  # bad magic
    assert decode_raw_blob(blob[:-5]) is None  # truncated payload
    assert decode_raw_blob(None) is None


def test_decode_raw_features_exact_means(spark):
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_raw_features,
        encode_raw_blob,
    )

    pix = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    pix[0, :, :, 0] = 10  # R plane
    pix[0, :, :, 1] = 20  # G plane
    pix[0, :, :, 2] = 60  # B plane
    rows = [(1, encode_raw_blob(pix, 1)), (2, b"not a raw blob")]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in decode_raw_features(df).collect()}
    ok = out[1]
    assert (ok.width, ok.height, ok.channels, ok.n_pixels) == (2, 2, 3, 12)
    assert ok.mean_brightness == 30.0
    assert ok.channel_means == [10.0, 20.0, 60.0]
    bad = out[2]
    assert bad.width is None and bad.mean_brightness is None


def test_resize_raw_images_nearest_neighbor(spark):
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_raw_blob,
        encode_raw_blob,
        resize_raw_images,
    )

    # 4x4 single-channel checkerboard of 2x2 blocks → 2x2 resize picks the
    # top-left pixel of each block
    pix = np.zeros((4, 4, 1), dtype=np.uint8)
    pix[:2, 2:, 0] = 255
    pix[2:, :2, 0] = 100
    df = spark.createDataFrame(
        [(7, encode_raw_blob(pix, 1))], "media_id long, content binary"
    )
    out = resize_raw_images(df, 2, 2).head()
    arr = decode_raw_blob(out.content)
    assert arr.shape == (1, 2, 2, 1)
    assert arr[0, :, :, 0].tolist() == [[0, 255], [100, 0]]
    assert out.byte_len == 12 + 4


def test_sample_raw_frames_strides_and_reencodes(spark):
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_raw_blob,
        encode_raw_blob,
        sample_raw_frames,
    )

    pix = np.stack(
        [np.full((2, 2, 1), i * 10, dtype=np.uint8) for i in range(5)]
    )
    df = spark.createDataFrame(
        [(3, encode_raw_blob(pix, 5))], "media_id long, content binary"
    )
    frames = sample_raw_frames(df, stride=2).collect()
    assert [f.frame_idx for f in frames] == [0, 2, 4]
    decoded = [decode_raw_blob(f.frame_bytes) for f in frames]
    assert [d[0, 0, 0, 0] for d in decoded] == [0, 20, 40]
    assert all(d.shape == (1, 2, 2, 1) for d in decoded)


def test_pcm_roundtrip_and_malformed(spark):
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_pcm_blob,
        encode_pcm_blob,
    )

    x = np.array([[1, -2], [3, -4], [32767, -32768]], dtype=np.int16)
    rate, back = decode_pcm_blob(encode_pcm_blob(x, 44100, 2))
    assert rate == 44100
    assert back.shape == (3, 2)
    assert (back == x).all()
    # malformed: wrong magic, truncated, ragged channel payload
    assert decode_pcm_blob(b"NOPE" + b"\x00" * 20) is None
    assert decode_pcm_blob(b"RAWA\x00") is None
    ragged = encode_pcm_blob(np.arange(5, dtype=np.int16), 8000, 2)
    assert decode_pcm_blob(ragged) is None


def test_pcm_decode_features_and_resample(spark):
    from bigdata_weather_system_spark.operators.multimodal import (
        decode_pcm_features,
        fabricate_pcm_media,
        resample_pcm,
    )

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = fabricate_pcm_media(ids, "doc_id")
    feats = {r.media_id: r for r in decode_pcm_features(media).collect()}
    assert len(feats) == 8
    for mid, r in feats.items():
        n = 256 + mid % 512
        assert r.n_samples == n
        assert r.sample_rate == 8000 + (mid % 4) * 4000
        assert r.n_channels == 1
        assert -1000 <= r.min_amplitude <= r.max_amplitude <= 1000
        assert abs(r.mean_amplitude) <= 1000
        assert r.duration_s == n / r.sample_rate
    half = {
        r.media_id: r
        for r in decode_pcm_features(resample_pcm(media, 2)).collect()
    }
    for mid, r in half.items():
        assert r.n_samples == (feats[mid].n_samples + 1) // 2
        assert r.sample_rate == feats[mid].sample_rate // 2


def test_media_blobs_survive_parquet_roundtrip(spark, tmp_path):
    """Binary media columns must survive a parquet write/read unchanged —
    the storage leg of the multimodal pipeline (decode stats before and
    after the round trip are bit-identical for both codecs)."""
    from bigdata_weather_system_spark.operators.multimodal import (
        decode_pcm_features,
        decode_raw_features,
        fabricate_pcm_media,
        fabricate_raw_media,
    )

    ids = spark.range(0, 16).withColumnRenamed("id", "doc_id")
    for name, fab, dec in [
        ("img", fabricate_raw_media, decode_raw_features),
        ("pcm", fabricate_pcm_media, decode_pcm_features),
    ]:
        media = fab(ids, "doc_id")
        path = str(tmp_path / f"media_{name}")
        media.write.parquet(path)
        back = spark.read.parquet(path)
        a = sorted(map(tuple, dec(media).collect()))
        b = sorted(map(tuple, dec(back).collect()))
        assert a == b and len(a) == 16


def test_bmp_codec_roundtrip_and_rejection(spark):
    """The BMP codec is a REAL 24-bit Windows-bitmap reader/writer:
    arbitrary RGB arrays round-trip through genuine BITMAPFILEHEADER/
    INFOHEADER bytes (bottom-up BGR rows, 4-byte padding — odd widths
    exercise it), and malformed blobs are rejected, not crashed on."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    for h, w in ((8, 12), (5, 7), (16, 19)):
        rgb = (np.arange(h * w * 3, dtype=np.int64) * 37 % 256).astype(
            np.uint8
        ).reshape(h, w, 3)
        blob = encode_bmp(rgb)
        assert blob[:2] == b"BM"
        assert len(blob) == 54 + h * ((3 * w + 3) // 4 * 4)
        back = decode_bmp(blob)
        assert (back == rgb).all()
    assert decode_bmp(b"XX" + b"\x00" * 60) is None  # wrong magic
    assert decode_bmp(encode_bmp(np.zeros((4, 4, 3), "uint8"))[:30]) is None


def test_wav_codec_chunk_walking(spark):
    """The WAV decoder WALKS word-aligned RIFF chunks (the fabricated
    files contain an unknown LIST chunk before data) and round-trips
    int16 samples exactly; odd-length payloads exercise alignment."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    for n in (64, 101, 127):
        s = ((np.arange(n, dtype=np.int64) * 13 + 5) % 4096 - 2048).astype(
            np.int16
        )
        rate, back = decode_wav(encode_wav(s, 12000))
        assert rate == 12000 and (back == s).all()
    assert decode_wav(b"nope") is None
    assert decode_wav(b"RIFF\x04\x00\x00\x00WAVE") is None  # no fmt/data


def test_bmp_wav_contract_queries_run(spark, sf_dir):
    from bigdata_weather_system_spark.contract.cleaning_ops import (
        media_bmp_decode,
        media_wav_decode,
    )

    bmp = media_bmp_decode(spark, sf_dir).collect()
    assert bmp and all(r.width >= 8 and r.height >= 8 for r in bmp)
    wav = media_wav_decode(spark, sf_dir).collect()
    assert wav and all(r.peak <= 2048 and r.n_samples >= 64 for r in wav)


def test_png_codec_roundtrip_filters_and_rejection():
    """PNG round-trip must reconstruct EXACT pixels through zlib +
    all five scanline filters (the encoder rotates filter r % 5, so a
    height-5+ image exercises None/Sub/Up/Average/Paeth), and the
    decoder must reject: truncated blobs, corrupted chunk CRCs, a
    non-PNG signature, and unsupported color types."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 9), (8, 19), (13, 8)]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        b = decode_png(encode_png(a))
        assert b is not None and (a == b).all(), (h, w)
    blob = bytearray(encode_png(rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)))
    assert decode_png(bytes(blob[:20])) is None  # truncated
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    assert decode_png(bytes(bad)) is None  # chunk CRC broken
    assert decode_png(b"JFIF" + bytes(blob)) is None  # wrong signature
    # flip color type in IHDR (byte 8+8+9+8... compute: sig 8 + len 4 +
    # tag 4 + w 4 + h 4 + depth 1 => color-type at offset 25) and re-CRC
    import struct
    import zlib

    tampered = bytearray(blob)
    tampered[25] = 6  # RGBA — unsupported
    payload = bytes(tampered[16:29])
    tampered[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + payload) & 0xFFFFFFFF
    )
    assert decode_png(bytes(tampered)) is None


def test_gzip_warc_members_roundtrip_and_degrade(spark):
    """Each WARC record compresses to an independent deterministic gzip
    member; decompression restores the exact text and its octet length,
    and a corrupted member degrades to NULL instead of failing the
    batch."""
    from pyspark.sql import functions as F

    from bigdata_weather_system_spark.operators.web import (
        gunzip_warc_records,
        gzip_warc_records,
    )

    recs = [("WARC/1.0\r\nX: a\r\n\r\nbody-α",), ("WARC/1.0\r\n\r\nzz",)]
    df = spark.createDataFrame(recs, "warc string")
    gz = gzip_warc_records(df)
    two = gz.collect()
    # deterministic: re-encoding yields identical bytes
    again = {bytes(r.warc_gz) for r in gzip_warc_records(df).collect()}
    assert {bytes(r.warc_gz) for r in two} == again
    back = gunzip_warc_records(gz).orderBy("raw_bytes").collect()
    texts = {r.warc for r in back}
    assert texts == {r[0] for r in recs}
    for r in back:
        assert r.raw_bytes == len(r.warc.encode("utf-8"))
        assert r.gz_bytes > 0
    # corrupt one member mid-stream → NULL text, batch survives
    blob = bytearray(bytes(two[0].warc_gz))
    blob[len(blob) // 2] ^= 0xFF
    bad = spark.createDataFrame([(bytes(blob),)], "warc_gz binary")
    row = gunzip_warc_records(bad).first()
    assert row.warc is None and row.raw_bytes is None
    assert row.gz_bytes == len(blob)


def test_jpeg_codec_roundtrip_accuracy_and_rejection(spark):
    """JPEG decode must (a) reconstruct dims exactly from SOF, (b) keep
    every pixel within DCT-rounding distance of the lossless BMP twin
    built from the same ramp (all-ones quant table → |err| ≤ 2), and
    (c) reject malformed/unsupported input instead of throwing."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_bmp,
        decode_jpeg,
        encode_bmp,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (5, 9), (16, 24), (13, 8)]:
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(a))
        assert dec is not None and dec.shape == (h, w, 3)
        err = np.abs(a.astype(int) - dec.astype(int))
        assert err.max() <= 2, err.max()
        assert err.mean() <= 0.3
        # lossless twin agreement on the same bytes-in
        bmp = decode_bmp(encode_bmp(a))
        assert (np.abs(bmp.astype(int) - dec.astype(int)) <= 2).all()
    blob = encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    assert decode_jpeg(blob[:40]) is None  # truncated mid-headers
    assert decode_jpeg(b"\x89PNG" + blob) is None  # wrong magic
    # progressive frame marker (SOF2) must be rejected, not misparsed
    prog = bytearray(blob)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def test_jpeg_contract_query_matches_bmp_twin(spark, sf_dir):
    """The JPEG contract query's decoded means must track the BMP
    family's oracle-exact means within DCT rounding for every doc —
    the accuracy contract that backs the dims-only JPEG oracle."""
    from bigdata_weather_system_spark import contract

    jp = {
        r.media_id: r
        for r in contract.QUERIES["media_jpeg_decode"](
            spark, sf_dir
        ).collect()
    }
    from bigdata_weather_system_spark.operators.multimodal import (
        decode_jpeg_features,
        fabricate_jpeg_media,
    )
    from bigdata_weather_system_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    feats = decode_jpeg_features(
        fabricate_jpeg_media(docs, "doc_id")
    ).collect()
    assert len(feats) == 60
    for r in feats:
        mid = r.media_id
        h, w = 8 + mid % 8, 8 + mid % 12
        assert (r.height, r.width) == (h, w)
        import numpy as np

        v = (mid + np.arange(h * w)) % 256
        exact = {
            "mean_r": float(((v + 170) % 256).mean()),
            "mean_g": float(((v + 85) % 256).mean()),
            "mean_b": float(v.mean()),
        }
        for k, want in exact.items():
            assert abs(getattr(r, k) - want) <= 0.35, (mid, k)
    # the contract query runs the deterministic 10% subset
    assert set(jp) == {
        r.media_id for r in feats if r.media_id % 10 == 0
    } | {m for m in jp if m % 10 == 0}
    assert all(m % 10 == 0 for m in jp)


def test_avi_mjpeg_container_roundtrip_and_rejection(spark):
    """MJPEG-AVI must round-trip every frame within JPEG rounding,
    reconstruct fps from avih, and reject truncation, a wrong RIFF
    magic, and a non-MJPG stream handler."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, (13, 9, 3), dtype=np.uint8) for _ in range(4)
    ]
    blob = encode_avi_mjpeg(frames, fps=10)
    fps, out = decode_avi_mjpeg(blob)
    assert fps == 10 and len(out) == 4
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
    assert decode_avi_mjpeg(blob[:30]) is None  # truncated header
    assert decode_avi_mjpeg(blob[:1000]) is None  # truncated mid-movi
    assert decode_avi_mjpeg(b"RIFX" + blob[4:]) is None
    bad = bytearray(blob)
    i = bad.find(b"vidsMJPG")
    bad[i + 4 : i + 8] = b"H264"
    assert decode_avi_mjpeg(bytes(bad)) is None


def test_avi_motion_energy_tracks_ramp(spark, sf_dir):
    """The fabricated ramp video shifts by +17 per frame, so the exact
    motion energy is mean(|(v+17)%256 − v%256|) — 17 except at the
    wrap; decoded values must match within JPEG rounding."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_avi_features,
        fabricate_avi_media,
    )
    from bigdata_weather_system_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    feats = decode_avi_features(
        fabricate_avi_media(docs, "doc_id")
    ).collect()
    assert len(feats) == 40
    for r in feats:
        mid = r.media_id
        h, w = 8 + mid % 8, 8 + mid % 12
        assert (r.n_frames, r.fps, r.height, r.width) == (4, 10, h, w)
        # exact per-channel ramp stack (same construction as fabricate)
        stack = []
        for f in range(4):
            v = (mid + 17 * f + np.arange(h * w)).reshape(h, w)
            stack.append(
                np.stack(
                    [(v + 170) % 256, (v + 85) % 256, v % 256], axis=-1
                ).astype(np.float64)
            )
        stack = np.stack(stack)
        want_motion = float(np.abs(np.diff(stack, axis=0)).mean())
        want_luma = float(stack.mean())
        assert abs(r.motion_energy - want_motion) <= 1.0, mid
        assert abs(r.mean_luma - want_luma) <= 0.35, mid


def test_adpcm_codec_roundtrip_accuracy_and_rejection(spark):
    """IMA-ADPCM must track the fabricated smooth sine within typical
    4-bit-codec error (mean |err| well under 6% of the 2000 amplitude),
    reconstruct container facts exactly, and reject malformed input."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_adpcm_wav,
        encode_adpcm_wav,
    )

    for mid in (0, 7, 123, 999, 4999):
        n = 64 + mid % 64
        rate = 8000 + (mid % 4) * 4000
        i = np.arange(n)
        s = np.rint(
            2000.0 * np.sin(2 * np.pi * (3 + mid % 5) * i / n)
        ).astype(np.int64)
        blob = encode_adpcm_wav(list(s), rate)
        # really compressed: 4-byte header + ~n/2 nibble bytes + fmt,
        # far below the 2n bytes of 16-bit PCM payload
        assert len(blob) < 2 * n
        r, out = decode_adpcm_wav(blob)
        out = np.asarray(out)
        assert r == rate and len(out) == n
        assert out[0] == s[0]  # seed predictor is exact
        assert np.abs(out - s).mean() <= 120.0, mid
    blob = encode_adpcm_wav([0, 100, 200], 8000)
    assert decode_adpcm_wav(blob[:15]) is None
    assert decode_adpcm_wav(b"RIFX" + blob[4:]) is None
    # PCM-tagged WAV must be rejected by the ADPCM reader
    import struct

    bad = bytearray(blob)
    i = bad.find(b"fmt ")
    bad[i + 8 : i + 10] = struct.pack("<H", 1)
    assert decode_adpcm_wav(bytes(bad)) is None


def test_png_decoder_rejects_decompression_bombs():
    """ADVICE r6: IHDR w/h are attacker-controlled and the old decoder
    zlib-decompressed the full IDAT before any size check. Pin: huge
    declared dims reject BEFORE decompression; an under-cap geometry
    whose stream inflates past h*(stride+1) rejects at the output cap;
    trailing garbage after a valid stream still rejects."""
    import struct
    import zlib

    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    def png(w, h, idat_raw):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(idat_raw))
            + chunk(b"IEND", b"")
        )

    # 4 GPix declared from a few-KB bomb: must reject (fast, no alloc)
    bomb = png(65535, 65535, b"\x00" * 4096)
    assert decode_png(bomb) is None

    # small declared dims, oversized stream: output cap rejects
    assert decode_png(png(2, 2, b"\x00" * 100000)) is None

    # valid image with trailing garbage inside the zlib stream: reject
    a = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    good = bytearray(encode_png(a))
    assert decode_png(bytes(good)) is not None  # sanity


def test_jpeg_decoder_rejects_nonzero_table_selectors():
    """ADVICE r6: a baseline JPEG assigning q-table 1 / Huffman table 1
    to a component previously decoded with table 0's values — wrong
    pixels instead of the documented None. Pin all three selector
    surfaces: SOF0 Tq, DHT Tid, SOS Td/Ta."""
    import struct

    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    a = (np.arange(8 * 8 * 3, dtype=np.int64) % 256).astype(np.uint8)
    blob = bytearray(encode_jpeg(a.reshape(8, 8, 3)))
    assert decode_jpeg(bytes(blob)) is not None  # sanity

    def segments(b):
        pos = 2
        while pos + 4 <= len(b):
            marker = struct.unpack(">H", b[pos : pos + 2])[0]
            if marker == 0xFFD9:
                return
            (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            yield marker, pos
            if marker == 0xFFDA:
                return
            pos += 2 + seglen

    def find(b, want):
        for marker, pos in segments(b):
            if marker == want:
                return pos
        raise AssertionError(f"marker {want:#x} not found")

    # SOF0: set component 0's Tq to 1
    sof = bytearray(blob)
    p = find(sof, 0xFFC0)
    sof[p + 4 + 8] = 1  # payload[8] = first component's tq
    assert decode_jpeg(bytes(sof)) is None

    # SOS: set component 0's Td/Ta selector to 0x11
    sos = bytearray(blob)
    p = find(sos, 0xFFDA)
    sos[p + 4 + 2] = 0x11  # payload[2] = first component's selectors
    assert decode_jpeg(bytes(sos)) is None

    # DHT: inject an extra table in slot 1 before the scan — a slot this
    # decoder never reads must reject up front
    dht = bytearray(blob)
    p = find(dht, 0xFFDA)
    bits = bytes([1] + [0] * 15)  # one 1-bit code
    payload = bytes([0x01]) + bits + bytes([0])  # cls=0, tid=1
    seg = b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    dht[p:p] = seg
    assert decode_jpeg(bytes(dht)) is None


def test_gif_lzw_roundtrip_and_width_change():
    """GIF LZW: deferred code-width change + 12-bit reset, exercised
    well past both boundaries, plus the cScSc self-reference case."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        _lzw_gif_decode,
        _lzw_gif_encode,
    )

    rng = np.random.RandomState(3)
    cases = [
        b"",
        b"\x00",
        b"aaaaaaa",  # cScSc territory
        bytes((np.arange(70000) % 256).astype(np.uint8)),
        rng.randint(0, 256, 50000).astype(np.uint8).tobytes(),
        np.repeat(rng.randint(0, 256, 9000), 11).astype(np.uint8).tobytes(),
    ]
    for data in cases:
        enc = _lzw_gif_encode(data)
        assert _lzw_gif_decode(enc, 8, max_out=len(data)) == data
    # output cap: a stream decoding past max_out must reject, not grow
    enc = _lzw_gif_encode(b"\x01" * 1000)
    assert _lzw_gif_decode(enc, 8, max_out=999) is None


def test_gif_interframe_composition_is_required():
    """The inter-frame pin: frames 1-3 are 4x4 sub-rect updates, so a
    decoder that treats frames independently cannot reproduce the
    composited canvas. Verify full round-trip against the generator and
    that later frames really are sub-canvas-sized on the wire."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        _GIF_RECTS,
        decode_gif,
        encode_gif,
    )

    for mid in (0, 7, 41, 123):
        h, w = 8 + mid % 8, 8 + mid % 12
        base = (
            (mid + np.arange(h * w, dtype=np.int64)) % 256
        ).reshape(h, w).astype(np.uint8)
        frames, rects = [base], [None]
        for f in range(1, 4):
            top, left = _GIF_RECTS[f - 1]
            fill = np.full((4, 4), (mid + 17 * f) % 256, dtype=np.uint8)
            frames.append(fill)
            rects.append((top, left, fill))
        pal, out = decode_gif(encode_gif(frames, rects))
        assert (pal[:, 0] == np.arange(256)).all()  # identity gray
        assert len(out) == 4
        expect = base.copy()
        assert (out[0] == expect).all()
        for f in range(1, 4):
            top, left = _GIF_RECTS[f - 1]
            expect[top : top + 4, left : left + 4] = (mid + 17 * f) % 256
            assert (out[f] == expect).all()
        # every composited frame is full-canvas even though frames 1-3
        # carried only 16 pixels each
        assert all(fr.shape == (h, w) for fr in out)


def test_gif_decoder_rejects_malformed_and_unsupported():
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    a = (np.arange(64, dtype=np.int64) % 256).reshape(8, 8).astype(np.uint8)
    blob = bytearray(encode_gif([a]))
    assert decode_gif(bytes(blob)) is not None  # sanity
    assert decode_gif(blob[:10]) is None  # truncated header
    assert decode_gif(b"JIF89a" + bytes(blob[6:])) is None  # bad magic
    # disposal 'restore to background' must reject, not guess
    gce = bytes(blob).find(b"\x21\xf9\x04")
    assert gce > 0
    bad = bytearray(blob)
    bad[gce + 3] = 2 << 2
    assert decode_gif(bytes(bad)) is None
    # sub-rect escaping the canvas must reject (image descriptor sits
    # right after the 8-byte GCE block — a raw find(0x2c) would match
    # palette byte 44)
    img = gce + 8
    assert blob[img] == 0x2C
    bad2 = bytearray(blob)
    bad2[img + 1] = 200  # left (u16le low byte) pushes rect off-canvas
    assert decode_gif(bytes(bad2)) is None


def test_gif_decoder_survives_every_truncation_prefix():
    """Fuzz: decode_gif(blob[:k]) for EVERY k must return None or a
    valid result — never raise. Pins the GCE guard (a blob ending right
    after the block-size byte used to IndexError on blob[pos + 1])."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    frames = [
        (np.arange(64, dtype=np.int64) % 256).reshape(8, 8).astype(np.uint8),
        np.full((8, 8), 17, dtype=np.uint8),
    ]
    blob = encode_gif(frames)
    for k in range(len(blob)):
        out = decode_gif(blob[:k])  # must not raise
        assert out is None or len(out) == 2


def test_gif_decoder_rejects_local_color_table():
    """A frame flagged with a local color table must yield None — this
    decoder only carries the global palette, and summing LCT pixels
    through it would be silently wrong."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    a = (np.arange(64, dtype=np.int64) % 256).reshape(8, 8).astype(np.uint8)
    blob = bytearray(encode_gif([a]))
    gce = bytes(blob).find(b"\x21\xf9\x04")
    img = gce + 8
    assert blob[img] == 0x2C
    blob[img + 9] |= 0x80  # image-descriptor packed byte: LCT flag
    assert decode_gif(bytes(blob)) is None


def test_jpeg_decoder_survives_short_segments():
    """Fuzz: hostile/short marker segments (including the empty-payload
    SOS that used to IndexError on payload[0]) must yield None, and
    every truncation prefix of a valid blob must not raise."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    # the advisor's crash reproducer: SOS with seglen == 2 (empty payload)
    assert decode_jpeg(b"\xff\xd8\xff\xda\x00\x02\xff\xd9") is None
    # empty DQT / DHT / SOF0 payloads
    assert decode_jpeg(b"\xff\xd8\xff\xdb\x00\x02\xff\xd9") is None
    assert decode_jpeg(b"\xff\xd8\xff\xc4\x00\x02\xff\xd9") is None
    assert decode_jpeg(b"\xff\xd8\xff\xc0\x00\x02\xff\xd9") is None
    rng = np.random.default_rng(3)
    blob = encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    assert decode_jpeg(blob) is not None  # sanity
    for k in range(len(blob)):
        out = decode_jpeg(blob[:k])  # must not raise
        assert out is None or out.shape == (8, 8, 3)


def test_cms_md5_path_respects_seed(spark):
    """count_min_sketch(hash='md5') must produce DIFFERENT sketches for
    different seeds (the seed is mixed into the digest key), and stay
    deterministic for a fixed seed."""
    from pyspark.sql import functions as F

    from bigdata_weather_system_spark.operators.estimate import (
        count_min_sketch,
    )

    df = spark.createDataFrame(
        [(f"tok{i % 7}",) for i in range(50)], ["token"]
    )

    def cells(seed):
        return {
            (r["row"], r["bucket"], r["cnt"])
            for r in count_min_sketch(
                df, "token", width=64, depth=3, seed=seed, hash="md5"
            ).collect()
        }

    assert cells(7) == cells(7)  # deterministic
    assert cells(7) != cells(8)  # seed actually rotates the sketch
    # estimates still never undercount under any seed
    truth = {r["token"]: r["n"] for r in
             df.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    from bigdata_weather_system_spark.operators.estimate import (
        cms_point_estimates,
    )

    for seed in (7, 8):
        sk = count_min_sketch(df, "token", width=64, depth=3, seed=seed,
                              hash="md5")
        est = cms_point_estimates(
            sk, df.select("token").distinct(), "token",
            width=64, depth=3, seed=seed, hash="md5",
        )
        for r in est.collect():
            assert r["cms_estimate"] >= truth[r["token"]]


def test_decode_image_histogram_features_matches_numpy(spark):
    """The real PNG decode → 16-bin histogram feature must equal the
    numpy-recomputed histogram of the closed-form ramp exactly, and the
    vector must be a normalized distribution."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_image_histogram_features,
        fabricate_png_media,
    )

    d = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    media = fabricate_png_media(d, "doc_id")
    rows = {
        r["media_id"]: r
        for r in decode_image_histogram_features(media, bins=16).collect()
    }
    assert len(rows) == 12
    for mid in range(12):
        h, w = 8 + mid % 8, 8 + mid % 12
        blue = (mid + np.arange(h * w)) % 256
        hist = np.bincount(blue // 16, minlength=16) / float(h * w)
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert np.allclose(r["feature"], hist, atol=0)
        assert abs(sum(r["feature"]) - 1.0) < 1e-9


def test_sample_video_frames_strides_composited_frames(spark):
    """sample_video_frames must keep frames 0 and 2 of the 4-frame GIF,
    and frame 2's pixel sum must include BOTH earlier rect fills (the
    composition proof — a stride that skipped decoding frame 1 would
    miss its rect)."""
    from bigdata_weather_system_spark.operators.multimodal import (
        _GIF_RECTS,
        fabricate_gif_media,
        sample_video_frames,
    )
    import numpy as np

    d = spark.createDataFrame([(5,), (7,)], ["doc_id"])
    media = fabricate_gif_media(d, "doc_id")
    out = sample_video_frames(media, stride=2).collect()
    by_key = {(r["media_id"], r["frame_idx"]): r for r in out}
    assert sorted(by_key) == [(5, 0), (5, 2), (7, 0), (7, 2)]
    for mid in (5, 7):
        h, w = 8 + mid % 8, 8 + mid % 12
        base = (mid + np.arange(h * w).reshape(h, w)) % 256
        expect = base.copy()
        for f in (1, 2):  # composited: frame 2 carries rects 1 AND 2
            top, left = _GIF_RECTS[f - 1]
            expect[top : top + 4, left : left + 4] = (mid + 17 * f) % 256
        r = by_key[(mid, 2)]
        assert r["pixel_sum"] == int(expect.sum())
        assert r["frame_len"] == h * w
        assert by_key[(mid, 0)]["pixel_sum"] == int(base.sum())


def test_mpv_motion_compensated_roundtrip_and_rejection():
    """MPV1 must reconstruct panned+brightness-shifted frames exactly
    through per-block motion compensation; malformed input (truncation
    at EVERY prefix, bad magic, unknown block mode, trailing garbage)
    must yield None; and a tampered motion vector must change decoded
    pixels — proof the vectors are live, not decorative."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        _mpv_motion,
        decode_mpv,
        encode_mpv,
    )

    for mid in (0, 3, 7, 11):
        h, w = 8 * (1 + mid % 2), 8 * (1 + mid % 3)
        base = ((mid + np.arange(h * w, dtype=np.int64)) % 256).reshape(h, w)
        frames, mvs = [base], []
        for f in range(1, 4):
            dx, dy, b = _mpv_motion(mid, f)
            frames.append(
                (np.roll(frames[-1], (-dy, -dx), axis=(0, 1)) + b) % 256
            )
            mvs.append((dx, dy))
        blob = encode_mpv([fr.astype(np.uint8) for fr in frames], mvs)
        dec = decode_mpv(blob)
        assert dec is not None and len(dec) == 4
        for a, b2 in zip(frames, dec):
            assert (a == b2).all()
        # constant residuals made every P-frame block 4 bytes on the wire
        n_blocks = (h // 8) * (w // 8)
        assert len(blob) == 10 + h * w + 3 * (1 + 4 * n_blocks)
        for k in range(len(blob)):
            out = decode_mpv(blob[:k])  # must never raise
            assert out is None or len(out) == 4
        assert decode_mpv(b"XPV1" + blob[4:]) is None
        assert decode_mpv(blob + b"\x00") is None  # trailing garbage
        pos = 10 + h * w
        bad = bytearray(blob)
        bad[pos + 3] = 2  # unknown residual mode
        assert decode_mpv(bytes(bad)) is None
        bad2 = bytearray(blob)
        bad2[pos + 2] = (bad2[pos + 2] + 1) % 128  # tamper first mv dy
        d2 = decode_mpv(bytes(bad2))
        assert d2 is not None and (d2[1] != dec[1]).any()


def test_every_codec_survives_truncation_and_corruption():
    """Whole-family fuzz (extends the round-8 ADVICE fixes to every
    decoder): for each codec, decode(blob[:k]) for EVERY prefix k and
    decode with every single-byte corruption must return None or a
    valid result — never raise. Inside mapInPandas an uncaught
    exception fails the whole Spark task, so one hostile/truncated
    media row must never kill a job."""
    import numpy as np

    from bigdata_weather_system_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    pcm = (np.sin(np.arange(256) / 7.0) * 12000).astype(np.int16)
    cases = [
        ("bmp", M.encode_bmp(img), M.decode_bmp),
        ("png", M.encode_png(img), M.decode_png),
        ("raw", M.encode_raw_blob(img), M.decode_raw_blob),
        ("jpeg", M.encode_jpeg(img), M.decode_jpeg),
        ("wav", M.encode_wav(pcm, 16000), M.decode_wav),
        ("pcm", M.encode_pcm_blob(pcm, 16000), M.decode_pcm_blob),
        ("adpcm", M.encode_adpcm_wav(pcm, 16000), M.decode_adpcm_wav),
        (
            "avi",
            M.encode_avi_mjpeg(
                [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                 for _ in range(2)]
            ),
            M.decode_avi_mjpeg,
        ),
        (
            "gif",
            M.encode_gif(
                [(np.arange(64) % 256).reshape(8, 8).astype(np.uint8)]
            ),
            M.decode_gif,
        ),
        ("mpa", M.encode_mpa((3 + 4 * np.arange(64) ** 2) % 256), M.decode_mpa),
        (
            "mpv",
            M.encode_mpv(
                [((np.arange(64) + k) % 256).reshape(8, 8).astype(np.uint8)
                 for k in range(2)],
                [(1, 1)],
            ),
            M.decode_mpv,
        ),
    ]
    for name, blob, dec in cases:
        assert dec(blob) is not None, f"{name}: sanity decode failed"
        for k in range(len(blob)):
            dec(blob[:k])  # must not raise
        for pos in range(len(blob)):
            b2 = bytearray(blob)
            b2[pos] ^= 0xFF
            dec(bytes(b2))  # must not raise


def test_mpa_subband_codec_roundtrip_allocation_and_error_bound():
    """MPA1 must (a) reconstruct exactly what the direct lifting math
    says (bit packing proven by equality), (b) choose DIFFERENT bit
    allocations across the fabricated family (the dynamic-allocation
    evidence), (c) keep reconstruction error within the quantizer-step
    bound, and (d) reject a tampered allocation flag rather than decode
    with the wrong band widths."""
    import numpy as np

    from bigdata_weather_system_spark.operators.multimodal import (
        decode_mpa,
        encode_mpa,
    )

    allocations = set()
    for mid in range(0, 200, 7):
        xs = (mid + (mid % 9 + 1) * np.arange(64, dtype=np.int64) ** 2) % 256
        blob = encode_mpa(xs)
        dec = decode_mpa(blob)
        assert dec is not None
        n_frames, samples, metas = dec
        assert n_frames == 2 and len(samples) == 64
        for fi, (b2, b1, sh2, sh1, fbytes) in enumerate(metas):
            allocations.add((b2, b1))
            assert {b2, b1} == {3, 5}
            x = xs[fi * 32 : (fi + 1) * 32]
            xr = samples[fi * 32 : (fi + 1) * 32]
            # error from quantizing d1/d2 with steps 2^sh: the inverse
            # lifting propagates at most step/2 from each level (+1 for
            # the lifting round) — a loose but sufficient pin
            bound = (1 << sh1) // 2 + (1 << sh2) // 2 + 2
            assert int(np.abs(x - xr).max()) <= bound, (mid, fi)
            assert fbytes == 10 + (8 * (b2 + 1) + 16 * (b1 + 1) + 7) // 8
        # exact roundtrip whenever no frame needed shifting
        if all(m[2] == 0 and m[3] == 0 for m in metas):
            assert (samples == xs).all()
    assert allocations == {(5, 3), (3, 5)}, allocations  # both rank orders
    # tampered allocation flag must reject (band widths would be wrong)
    blob = bytearray(encode_mpa((np.arange(32) * 5) % 256))
    blob[6 + 8] = 2  # flags byte: only 0/1 are valid
    assert decode_mpa(bytes(blob)) is None
