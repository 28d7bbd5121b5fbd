"""Multimodal stage plumbing tests: schema, actor-pool signature,
deterministic fake decode, error sentinels, frame sampling, dedup."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from deduplicator_go_ray.stages.multimodal import (
    FEATURE_DIM, FrameSampleStage, MEDIA_SCHEMA, MediaFeatureStage,
    media_dedup_by_feature)


def _media_table(n: int = 20) -> pa.Table:
    rows = {k: [] for k in
            ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    for i in range(n):
        payload = hashlib.sha256(f"media{i // 2}".encode()).digest() * 200
        rows["media_id"].append(f"m{i:04d}")
        rows["kind"].append(["image", "audio", "video"][i % 3])
        # two ids share each payload → planted exact-dup pairs
        rows["payload"].append(payload if i % 7 else b"")  # every 7th: empty → error
        rows["mime"].append("application/octet-stream")
        rows["width"].append(64 if i % 3 == 0 else -1)
        rows["height"].append(64 if i % 3 == 0 else -1)
        rows["duration_ms"].append(9000 if i % 3 == 2 else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def test_feature_stage_contract(ray_session):
    ds = ray.data.from_arrow(_media_table())
    out = ds.map_batches(MediaFeatureStage, concurrency=2, batch_size=8,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 20
    assert "payload" not in out.columns          # wide column dropped
    feats = np.array(out["features"].tolist())
    assert feats.shape == (20, FEATURE_DIM)
    # empty payloads → in-band DECODE_ERROR, zero features
    errs = out[out["error"].notna()]
    assert len(errs) == 3                        # ids 0, 7, 14
    assert (np.array(errs["features"].tolist()) == 0).all()


def test_feature_stage_deterministic(ray_session):
    ds = ray.data.from_arrow(_media_table())
    a = ds.map_batches(MediaFeatureStage, concurrency=2, batch_size=4,
                       batch_format="pyarrow").to_pandas().sort_values("media_id")
    b = ds.repartition(5).map_batches(
        MediaFeatureStage, concurrency=1, batch_size=16,
        batch_format="pyarrow").to_pandas().sort_values("media_id")
    assert np.array_equal(np.array(a["features"].tolist()),
                          np.array(b["features"].tolist()))


def test_png_codec_roundtrip_and_filters():
    # stdlib PNG codec: encode->decode identity for every supported
    # layout, and the unfilter path (Sub/Up/Average/Paeth) reconstructs
    # a manually-filtered stream exactly
    import struct
    import zlib

    from deduplicator_go_ray.functions.image import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 9, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)

    # hand-filter an RGB image with one scanline per filter type
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8).astype(np.int32)
    ch, stride = 3, 18
    lines = []
    prev = np.zeros(stride, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y].reshape(-1)
        a = np.r_[np.zeros(ch, np.int32), cur[:-ch]]
        c = np.r_[np.zeros(ch, np.int32), prev[:-ch]]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - a
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((a + prev) >> 1)
        else:
            pr = a + prev - c
            pred = np.where(
                (abs(pr - a) <= abs(pr - prev)) & (abs(pr - a) <= abs(pr - c)),
                a, np.where(abs(pr - prev) <= abs(pr - c), prev, c))
            filt = cur - pred
        lines.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = zlib.compress(b"".join(lines))

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), img.astype(np.uint8).reshape(5, 6, 3))


def test_luma_features_accept_2d_grayscale():
    # a (H, W) array without a channel axis must behave like the same
    # pixels with an explicit single channel (regression: the 2-D branch
    # computed ch=1 but still indexed img[:, :, 0])
    from deduplicator_go_ray.functions.image import luma_grid_features

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(20, 17), dtype=np.uint8)
    f2d = luma_grid_features(gray)
    f3d = luma_grid_features(gray[:, :, None])
    assert np.array_equal(f2d, f3d)
    assert f2d.shape == (64,) and f2d.dtype == np.float32


def test_real_decoder_png_features(ray_session):
    # the real decoder decodes actual PNG pixels; non-PNG payloads are
    # in-band DECODE_ERROR rows, never exceptions
    from deduplicator_go_ray.functions.image import encode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    tbl = pa.table({
        "media_id": pa.array(["png0", "junk"], pa.string()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([encode_png(img), b"not a png"], pa.binary()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(MediaFeatureStage, concurrency=1, batch_size=8,
                        fn_constructor_kwargs={"decoder": "real"},
                        batch_format="pyarrow")
           .to_pandas().set_index("media_id"))
    assert out.loc["junk", "error"] == "DECODE_ERROR"
    assert out.loc["png0", "error"] is None
    f = np.array(out.loc["png0", "features"])
    assert f.shape == (FEATURE_DIM,)
    assert np.abs(f).max() <= 1.0 and np.abs(f).sum() > 0


def test_media_dedup_pairs_on_real_decoder(ray_session):
    # media_dedup_by_feature green on BOTH decoders (VERDICT r2 #7):
    # identical and near-identical PNGs pair up under real pixels,
    # distinct patterns stay apart
    from deduplicator_go_ray.functions.image import encode_png
    from deduplicator_go_ray.stages.multimodal import media_dedup_by_feature

    g = np.linspace(0, 255, 24, dtype=np.uint8)
    grad = np.repeat(g[None, :], 24, 0)[:, :, None].repeat(3, 2)
    near = grad.copy()
    near[0, 0, 0] = min(254, int(near[0, 0, 0]) + 1)   # one-pixel nudge
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    rows = {
        "a_dup1": encode_png(grad), "a_dup2": encode_png(grad),
        "a_near": encode_png(near), "b_noise": encode_png(noise),
    }
    tbl = pa.table({
        "media_id": pa.array(sorted(rows), pa.string()),
        "kind": pa.array(["image"] * len(rows), pa.string()),
        "payload": pa.array([rows[k] for k in sorted(rows)], pa.binary()),
    })
    for method in ("exact", "lsh"):
        pairs = media_dedup_by_feature(
            ray.data.from_arrow(tbl), threshold=0.98, method=method,
            decoder="real").to_pandas()
        got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
        assert ("a_dup1", "a_dup2") in got
        assert ("a_dup1", "a_near") in got and ("a_dup2", "a_near") in got
        assert not any("b_noise" in p for p in got)


def test_frame_sampling(ray_session):
    tbl = _media_table()
    vids = tbl.filter(pa.compute.equal(tbl["kind"], "video"))
    ds = ray.data.from_arrow(vids)
    out = ds.map_batches(FrameSampleStage, concurrency=1, batch_size=8,
                         batch_format="pyarrow").to_pandas()
    nonempty = len([p for p in vids["payload"].to_pylist() if p])
    assert len(out) == nonempty * 4              # 4 frames per decodable video
    # offsets deterministic and within duration
    assert set(out["frame_offset_ms"]) == {0, 2250, 4500, 6750}


def test_media_dedup_pairs(ray_session):
    ds = ray.data.from_arrow(_media_table())
    pairs = media_dedup_by_feature(ds, threshold=0.999).to_pandas()
    got = {tuple(p) for p in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # payload shared by (2k, 2k+1) except error rows → those exact pairs
    expect = set()
    for k in range(10):
        a, b = f"m{2 * k:04d}", f"m{2 * k + 1:04d}"
        if 2 * k % 7 and (2 * k + 1) % 7:
            expect.add((a, b))
    assert expect <= got
    # no cross-payload false positives at this threshold
    assert got == expect


def test_media_dedup_lsh_equals_exact(ray_session):
    """The bucketed (LSH-shuffle) media dedup finds the same pairs as
    the all-pairs exact path on the planted fixture — and never builds
    a driver-side feature matrix."""
    ds = ray.data.from_arrow(_media_table(40))
    exact = (media_dedup_by_feature(ds, threshold=0.999, method="exact")
             .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    lsh = (media_dedup_by_feature(ds, threshold=0.999, method="lsh")
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert exact.equals(lsh)
    assert len(lsh) >= 1


def test_extract_timeout_sentinel(ray_session):
    """≙ the 60 s hash watchdog (files/files.go:33-71): a pathological
    row times out in-band, the batch survives, later rows still run."""
    import time

    import pyarrow as pa

    from deduplicator_go_ray.stages.extract import ExtractStage

    def slow_extract(html):
        if b"HANG" in html:
            time.sleep(5)
        return html.decode()[:10], None

    stage = ExtractStage(timeout_s=0.5, extract_fn=slow_extract)
    batch = pa.table({
        "url": ["a", "b", "c"],
        "html": [b"fine-one", b"HANG-forever", b"fine-two"],
    })
    out = stage(batch)
    errs = out["error"].to_pylist()
    texts = out["text"].to_pylist()
    assert errs == [None, "TIMEOUT_ERROR", None]
    assert texts[0] == "fine-one"[:10] and texts[2] == "fine-two"[:10]


def test_wav_codec_roundtrip():
    # stdlib WAV codec: encode->decode identity (16-bit quantization
    # tolerance) across layouts, plus hand-built float32 / 8-bit /
    # 24-bit streams and in-band rejection of non-WAV payloads
    import struct

    from deduplicator_go_ray.functions.audio import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    mono = rng.uniform(-1, 1, 480)
    wave, rate = decode_wav(encode_wav(mono, sample_rate=8000))
    assert rate == 8000
    assert np.abs(wave - mono).max() < 1.5 / 32768

    stereo = rng.uniform(-1, 1, (240, 2))
    wave, _ = decode_wav(encode_wav(stereo, sample_rate=44100))
    assert np.abs(wave - stereo.mean(axis=1)).max() < 1.5 / 32768

    def riff(fmt_body: bytes, data: bytes) -> bytes:
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt_body)) + fmt_body
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # float32 stream decodes exactly
    f32 = rng.uniform(-1, 1, 100).astype(np.float32)
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    wave, _ = decode_wav(riff(fmt, f32.tobytes()))
    assert np.array_equal(wave, f32.astype(np.float64))

    # 8-bit unsigned: 128 decodes to exactly zero
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8)
    wave, _ = decode_wav(riff(fmt, bytes([128, 0, 255])))
    assert wave[0] == 0.0 and wave[1] == -1.0 and 0.99 <= wave[2] <= 1.0

    # 24-bit signed little-endian
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24)
    data = (0x400000).to_bytes(3, "little") + (0xFFFFFF).to_bytes(3, "little")
    wave, _ = decode_wav(riff(fmt, data))
    assert np.allclose(wave, [0.5, -1.0 / (1 << 23)])

    for bad in (b"", b"RIFF\x00\x00\x00\x00JUNK", b"not audio at all",
                riff(struct.pack("<HHIIHH", 2, 1, 16000, 16000, 1, 8), b"\x00")):
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_energy_envelope_features():
    from deduplicator_go_ray.functions.audio import energy_envelope_features

    # constant amplitude a → every block RMS = a → feature 2a-1
    f = energy_envelope_features(np.full(6400, 0.5), out_dim=64)
    assert f.shape == (64,) and f.dtype == np.float32
    assert np.allclose(f, 0.0, atol=1e-6)
    # loud first half / silent second half → split envelope
    x = np.r_[np.full(3200, 0.8), np.zeros(3200)]
    f = energy_envelope_features(x, out_dim=64)
    assert np.allclose(f[:32], 0.6, atol=1e-6)
    assert np.allclose(f[32:], -1.0, atol=1e-6)
    # shorter than out_dim: edge-padded, still well-formed
    f = energy_envelope_features(np.full(5, 0.25), out_dim=64)
    assert f.shape == (64,) and np.allclose(f, -0.5, atol=1e-6)


def test_real_decoder_wav_features(ray_session):
    # the real decoder dispatches by payload signature: WAV samples and
    # PNG pixels in ONE batch, junk → in-band DECODE_ERROR
    from deduplicator_go_ray.functions.audio import (encode_wav,
                                                     energy_envelope_features)
    from deduplicator_go_ray.functions.image import encode_png

    rng = np.random.default_rng(13)
    x = rng.uniform(-0.9, 0.9, 4000)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    tbl = pa.table({
        "media_id": pa.array(["wav0", "png0", "junk"], pa.string()),
        "kind": pa.array(["audio", "image", "audio"], pa.string()),
        "payload": pa.array([encode_wav(x), encode_png(img), b"RIFFxxxx"],
                            pa.binary()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(MediaFeatureStage, concurrency=1, batch_size=8,
                        fn_constructor_kwargs={"decoder": "real"},
                        batch_format="pyarrow")
           .to_pandas().set_index("media_id"))
    assert out.loc["junk", "error"] == "DECODE_ERROR"
    assert out.loc["wav0", "error"] is None
    assert out.loc["png0", "error"] is None
    got = np.array(out.loc["wav0", "features"], dtype=np.float32)
    # quantize through the 16-bit writer like the stage does
    from deduplicator_go_ray.functions.audio import decode_wav
    want = energy_envelope_features(decode_wav(encode_wav(x))[0],
                                    out_dim=FEATURE_DIM)
    assert np.array_equal(got, want)


def test_media_dedup_pairs_on_real_wav(ray_session):
    # audio near-dups under the real decoder: identical + lightly-noised
    # waveforms pair, an anti-phase envelope stays apart
    from deduplicator_go_ray.functions.audio import encode_wav
    from deduplicator_go_ray.stages.multimodal import media_dedup_by_feature

    rng = np.random.default_rng(17)
    n = 12800
    block = n // FEATURE_DIM
    gate = (np.arange(n) // block % 2 == 0)       # on/off envelope
    carrier = rng.uniform(-1, 1, n)
    a = 0.8 * carrier * gate
    near = np.clip(a + rng.normal(0, 0.004, n), -1, 1)
    b = 0.8 * carrier * ~gate                     # anti-phase envelope
    rows = {
        "a_dup1": encode_wav(a), "a_dup2": encode_wav(a),
        "a_near": encode_wav(near), "b_anti": encode_wav(b),
    }
    tbl = pa.table({
        "media_id": pa.array(sorted(rows), pa.string()),
        "kind": pa.array(["audio"] * len(rows), pa.string()),
        "payload": pa.array([rows[k] for k in sorted(rows)], pa.binary()),
    })
    for method in ("exact", "lsh"):
        pairs = media_dedup_by_feature(
            ray.data.from_arrow(tbl), threshold=0.98, method=method,
            decoder="real").to_pandas()
        got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
        assert ("a_dup1", "a_dup2") in got
        assert ("a_dup1", "a_near") in got and ("a_dup2", "a_near") in got
        assert not any("b_anti" in p for p in got)


# ---------------------------------------------------------------------------
# real video path: pure-stdlib animated-GIF codec (functions/video.py)
# ---------------------------------------------------------------------------

def test_gif_codec_roundtrip():
    # full-frame opaque animation: decoded composites == encoded frames,
    # durations survive (centisecond granularity), LZW clear-code runs
    # exercised by a frame bigger than one max_run
    from deduplicator_go_ray.functions.video import decode_gif, encode_gif

    rng = np.random.default_rng(23)
    frames = rng.integers(0, 6, (3, 20, 30), dtype=np.uint8) * 40
    frames = np.stack([np.stack([f, f // 2, 255 - f], axis=-1)
                       for f in frames])
    data = encode_gif(frames, [100, 250, 30])
    got, durs = decode_gif(data)
    assert got.shape == frames.shape
    np.testing.assert_array_equal(got, frames)
    assert durs.tolist() == [100, 250, 30]


def test_gif_interlace_roundtrip():
    from deduplicator_go_ray.functions.video import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    img = rng.integers(0, 4, (13, 9, 3), dtype=np.uint8) * 60
    got, _ = decode_gif(encode_gif([img], interlace=True))
    np.testing.assert_array_equal(got[0], img)


def test_gif_transparency_offsets_and_disposal():
    from deduplicator_go_ray.functions.video import decode_gif, encode_gif

    RED, BLUE, GREEN = (255, 0, 0), (0, 0, 255), (0, 255, 0)
    base = np.zeros((8, 8, 3), np.uint8)
    base[:, :] = RED
    patch = np.zeros((4, 4, 3), np.uint8)                 # blue/green checker
    patch[:, :] = BLUE
    patch[::2, ::2] = GREEN                               # green → transparent
    tail = np.zeros((2, 2, 3), np.uint8)                  # tiny last frame

    data = encode_gif(
        [base, patch, tail],
        [50, 50, 50],
        offsets=[(0, 0), (2, 2), (6, 6)],
        transparent=[None, GREEN, None],
        disposals=[1, 3, 1],                              # 3: restore previous
        canvas_size=(8, 8),
    )
    frames, _ = decode_gif(data)
    # frame 1: red canvas, blue checker at (2,2), red shows through green
    exp1 = base.copy()
    reg = exp1[2:6, 2:6]
    mask = np.ones((4, 4), bool)
    mask[::2, ::2] = False                                # transparent cells
    reg[mask] = BLUE
    np.testing.assert_array_equal(frames[1], exp1)
    # frame 2: disposal 3 on the patch restored the red canvas first
    exp2 = base.copy()
    exp2[6:8, 6:8] = 0
    np.testing.assert_array_equal(frames[2], exp2)


def test_gif_disposal_background():
    from deduplicator_go_ray.functions.video import decode_gif, encode_gif

    A = (10, 20, 30)
    B = (200, 100, 0)
    f0 = np.zeros((4, 4, 3), np.uint8)
    f0[:, :] = A
    f1 = np.zeros((2, 2, 3), np.uint8)
    f1[:, :] = B
    data = encode_gif([f0, f1, f1], [10, 10, 10],
                      offsets=[(0, 0), (1, 1), (0, 0)],
                      disposals=[1, 2, 1], canvas_size=(4, 4))
    frames, _ = decode_gif(data)
    # disposal 2 restored frame 1's region to the background (palette
    # entry 0 = lexicographically-smallest color = A here)
    assert tuple(frames[2][2, 2]) == A
    assert tuple(frames[2][0, 0]) == B


def test_frame_sampling_real_gif(ray_session):
    # the real frame sampler reads ACTUAL frames and ACTUAL delays;
    # non-GIF payloads surface as one in-band DECODE_ERROR row
    from deduplicator_go_ray.functions.image import luma_grid_features
    from deduplicator_go_ray.functions.video import encode_gif

    levels = [0, 36, 72, 108, 144, 180, 216, 252]
    frames = np.stack([np.full((16, 16, 3), v, np.uint8) for v in levels])
    gif = encode_gif(frames, [100] * 8)
    tbl = pa.table({
        "media_id": pa.array(["vid0", "junk"], pa.string()),
        "kind": pa.array(["video", "video"], pa.string()),
        "payload": pa.array([gif, b"not a gif"], pa.binary()),
        "duration_ms": pa.array([800, 800], pa.int32()),
    })
    out = (ray.data.from_arrow(tbl)
           .map_batches(FrameSampleStage, concurrency=1, batch_size=8,
                        fn_constructor_kwargs={"decoder": "real"},
                        batch_format="pyarrow")
           .to_pandas())
    bad = out[out["media_id"] == "junk"]
    assert list(bad["error"]) == ["DECODE_ERROR"]
    assert list(bad["frame_offset_ms"]) == [-1]
    good = out[out["media_id"] == "vid0"].sort_values("frame_offset_ms")
    # picks = frames 0,2,4,6 of 8 → cumulative-delay offsets
    assert list(good["frame_offset_ms"]) == [0, 200, 400, 600]
    for off, feat in zip(good["frame_offset_ms"], good["features"]):
        expect = luma_grid_features(frames[off // 100], grid=8)
        np.testing.assert_allclose(np.array(feat), expect, atol=1e-6)


def test_media_dedup_pairs_on_real_gif(ray_session):
    # video near-dups under the real decoder: identical + one-frame-
    # nudged animations pair, a reversed animation stays apart
    from deduplicator_go_ray.functions.video import encode_gif
    from deduplicator_go_ray.stages.multimodal import media_dedup_by_feature

    rng = np.random.default_rng(29)
    frames = rng.integers(0, 5, (4, 24, 24), dtype=np.uint8) * 50
    frames = np.stack([np.stack([f, f, f], axis=-1) for f in frames])
    near = frames.copy()
    near[0, 0, 0] = np.minimum(near[0, 0, 0] + 10, 250)   # one-cell nudge
    anti = 250 - frames                                   # inverted luma
    rows = {
        "v_dup1": encode_gif(frames), "v_dup2": encode_gif(frames),
        "v_near": encode_gif(near), "w_anti": encode_gif(anti),
    }
    tbl = pa.table({
        "media_id": pa.array(sorted(rows), pa.string()),
        "kind": pa.array(["video"] * len(rows), pa.string()),
        "payload": pa.array([rows[k] for k in sorted(rows)], pa.binary()),
    })
    for method in ("exact", "lsh"):
        pairs = media_dedup_by_feature(
            ray.data.from_arrow(tbl), threshold=0.98, method=method,
            decoder="real").to_pandas()
        got = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
        assert ("v_dup1", "v_dup2") in got
        assert ("v_dup1", "v_near") in got and ("v_dup2", "v_near") in got
        assert not any("w_anti" in p for p in got)


def _lzw_encode_full(min_code_size, pixels):
    """Proper GIF LZW encoder (growing table, growing width, KwK
    cases) — the fixture encoder's clear-early trick never exercises
    multi-byte table entries, so the decoder's span-table paths need a
    real code stream."""
    from deduplicator_go_ray.functions.video import _BitWriter

    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, code_size)
    cur = b""
    for p in pixels:
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        bw.write(table[cur], code_size)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            bw.write(clear, code_size)
            code_size = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        cur = bytes([p])
    if cur:
        bw.write(table[cur], code_size)
    bw.write(eoi, code_size)
    return bw.done()


def _lzw_decode_reference(min_code_size, data, n_pixels):
    """The round-3 bytes-table decoder, kept as a differential twin for
    the span-table rewrite (VERDICT r3 #6)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        i = bitpos >> 3
        word = int.from_bytes(data[i:i + 4], "little")
        code = (word >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("short stream")
    return bytes(out[:n_pixels])


def test_lzw_span_table_matches_bytes_table():
    """The preallocated span-table LZW decoder is bit-identical to the
    r3 bytes-table decoder on real (growing-width) code streams,
    including immediate-KwK runs and table-full clears."""
    import numpy as np

    from deduplicator_go_ray.functions.video import _lzw_decode

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(1, 5000))
        nsym = int(rng.choice([2, 4, 16, 128, 256]))
        mcs = max(2, int(np.ceil(np.log2(nsym))))
        px = rng.integers(0, nsym, n).astype(np.uint8)
        if trial % 2:  # long runs → KwK codes and deep chains
            px = np.repeat(px, int(rng.integers(2, 9)))[:n]
        data = _lzw_encode_full(mcs, px.tolist())
        want = _lzw_decode_reference(mcs, data, n)
        got = _lzw_decode(mcs, data, n)
        assert got == want == px.tobytes()
    # aaaa... forces code == next_code on the very first extension
    data = _lzw_encode_full(2, [1] * 64)
    assert _lzw_decode(2, data, 64) == bytes([1] * 64)


def test_png_adaptive_filters_differential():
    """Average/Paeth unfilter (the int-loop rewrite) against a
    straightforward per-pixel reference encode: filters 0-4 mixed per
    row must reconstruct the exact source image."""
    import struct
    import zlib

    import numpy as np

    from deduplicator_go_ray.functions.image import decode_png

    rng = np.random.default_rng(3)
    for ch, color in ((1, 0), (3, 2), (4, 6)):
        h, w = 23, 31
        img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        stride = w * ch
        rows = []
        prev = np.zeros(stride, np.int64)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int64)
            f = int(rng.integers(0, 5))
            enc = np.zeros(stride, np.int64)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = (a if pa_ <= pb_ and pa_ <= pc_
                            else (b if pb_ <= pc_ else c))
                enc[i] = (int(cur[i]) - pred) & 0xFF
            rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
            prev = cur
        raw = b"".join(rows)

        def chunk(ctype, body):
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", crc))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw, 6))
               + chunk(b"IEND", b""))
        got = decode_png(png)
        assert (got == img).all(), f"color type {color} mismatch"


def test_user_injected_decoder_factory(ray_session):
    """The worked native-decoder example (multimodal module docstring,
    VERDICT r4 next #6): a user (name, factory) decoder builds ONCE
    PER ACTOR on the actor pool, its features flow through the stage
    contract, and per-payload failures still surface as in-band
    DECODE_ERROR rows.  The stub stands in for a native lib import."""
    import numpy as np
    import pyarrow as pa

    from deduplicator_go_ray.stages.multimodal import (FEATURE_DIM,
                                                       MediaFeatureStage)

    def native_stub_factory():
        # "import the native lib / load weights" — once per actor
        table = np.arange(FEATURE_DIM, dtype=np.float32)

        def decode(payload: bytes) -> np.ndarray:
            if payload[:3] == b"BAD":
                raise ValueError("unsupported payload")
            return table + (payload[0] if payload else 0)
        return decode

    ds = ray.data.from_arrow(pa.table({
        "media_id": [f"m{i}" for i in range(6)],
        "payload": [b"BAD-bytes" if i == 3 else bytes([i * 10]) * 4
                    for i in range(6)],
    }))
    out = ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={
            "decoder": ("native-stub", native_stub_factory)},
        concurrency=2, batch_size=3, batch_format="pyarrow",
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 6
    assert out.loc[3, "error"] == "DECODE_ERROR"        # in-band failure
    ok = out[out.error.isna()]
    assert (ok.features.map(len) == FEATURE_DIM).all()
    # feature content came from the injected decoder, not the fake
    f0 = np.asarray(out.loc[0, "features"], dtype=np.float32)
    assert np.allclose(f0, np.arange(FEATURE_DIM, dtype=np.float32))


def test_user_injected_frame_sampler(ray_session):
    """FrameSampleStage honors the same (name, factory) slot: the user
    sampler controls frame count and offsets."""
    import numpy as np
    import pyarrow as pa

    from deduplicator_go_ray.stages.multimodal import (FEATURE_DIM,
                                                       FrameSampleStage)

    def sampler_factory():
        def sample(payload: bytes):
            offs = [0, 500]
            return offs, [np.full(FEATURE_DIM, float(payload[0]),
                                  dtype=np.float32) for _ in offs]
        return sample

    ds = ray.data.from_arrow(pa.table({
        "media_id": ["v1", "v2"],
        "payload": [bytes([7]) * 8, bytes([9]) * 8],
        "duration_ms": pa.array([1000, 2000], pa.int32()),
    }))
    out = ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"decoder": ("stub-sampler", sampler_factory)},
        concurrency=2, batch_size=2, batch_format="pyarrow",
    ).to_pandas().sort_values(["media_id", "frame_offset_ms"]).reset_index(drop=True)
    assert len(out) == 4                       # 2 media × 2 frames
    assert out.frame_offset_ms.tolist() == [0, 500, 0, 500]
    assert np.allclose(np.asarray(out.loc[0, "features"]), 7.0)
