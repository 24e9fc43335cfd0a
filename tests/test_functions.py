"""Training-data ops: dedup family, similarity search, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup of 0
        "the quick brown fox jumped over the lazy dogs",        # near dup of 0
        "completely different content about ray data pipelines",
        "el rapido zorro marron salta sobre el perro perezoso y los gatos",
        "short",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return rd.from_pandas(df), df


def test_exact_dedup(docs_ds):
    from tsfeatures_ray.functions import exact_dedup

    ds, df = docs_ds
    out = exact_dedup(ds).to_pandas().sort_values("keep_id").reset_index(drop=True)
    assert len(out) == 5  # 6 docs, one exact dup
    assert out[out.keep_id == 0]["n_copies"].iloc[0] == 2


def test_minhash_near_dups(docs_ds, ray_session):
    import ray

    from tsfeatures_ray.functions import minhash_near_dups
    from tsfeatures_ray.functions.dedup import ngram_jaccard

    ds, df = docs_ds
    texts = dict(zip(df.doc_id, df.text))
    ref = ray.put(texts)
    pairs = minhash_near_dups(ds, ref, threshold=0.5).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got  # exact dup pair must survive
    assert (0, 2) in got or (1, 2) in got  # near-dup pair found
    assert (0, 3) not in got  # unrelated docs not paired
    # reported jaccard equals the exact n-gram jaccard
    row = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert row["jaccard"].iloc[0] == pytest.approx(1.0)
    assert ngram_jaccard(texts[0], texts[2]) > 0.5


def test_simhash_similar_docs_close(docs_ds):
    from tsfeatures_ray.functions import simhash_signatures

    ds, df = docs_ds
    out = simhash_signatures(ds).to_pandas().set_index("doc_id")
    h = out["simhash"].astype(np.uint64)
    assert h.loc[0] == h.loc[1]  # identical docs -> identical simhash
    hamming_near = bin(int(h.loc[0]) ^ int(h.loc[2])).count("1")
    hamming_far = bin(int(h.loc[0]) ^ int(h.loc[3])).count("1")
    assert hamming_near < hamming_far


def test_language_id(docs_ds):
    from tsfeatures_ray.functions import language_id

    ds, df = docs_ds
    out = language_id(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[4, "lang_pred"] == "es"


def test_fingerprint_deterministic(docs_ds):
    from tsfeatures_ray.functions import fingerprint

    ds, df = docs_ds
    a = fingerprint(ds).to_pandas().set_index("doc_id")["doc_hash"]
    b = fingerprint(ds).to_pandas().set_index("doc_id")["doc_hash"]
    pd.testing.assert_series_equal(a, b)
    assert a.loc[0] == a.loc[1]
    assert a.loc[0] != a.loc[3]


def test_brute_knn_exact(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions import brute_knn

    rng = np.random.RandomState(0)
    emb = rng.randn(200, 16)
    df = pd.DataFrame({"vec_id": range(200), "embedding": list(emb)})
    ds = rd.from_pandas(df)
    queries = emb[:2]
    out = brute_knn(ds, queries, k=5)
    # oracle: numpy full cosine
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = en @ qn.T
    for qi in range(2):
        want = set(np.argsort(-sims[:, qi])[:5].tolist())
        got = set(out[out.query_id == qi]["vec_id"].tolist())
        assert got == want
        assert out[(out.query_id == qi) & (out["rank"] == 1)]["vec_id"].iloc[0] == qi


def test_lsh_knn_contains_self(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions import lsh_bucketed_knn

    rng = np.random.RandomState(1)
    emb = rng.randn(300, 16)
    df = pd.DataFrame({"vec_id": range(300), "embedding": list(emb)})
    out = lsh_bucketed_knn(rd.from_pandas(df), emb[:3], k=5, bits=3)
    for qi in range(3):
        sub = out[out.query_id == qi]
        assert len(sub) > 0
        assert sub[sub["rank"] == 1]["vec_id"].iloc[0] == qi  # self in own bucket


def test_media_features_plumbing(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.multimodal import (
        media_features,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(32))
    out = media_features(ds, batch_size=8).to_pandas()
    assert len(out) == 32
    assert all(len(v) == 64 for v in out["features"])
    # deterministic decode: same payload -> same features
    out2 = media_features(rd.from_arrow(synth_media_table(32)), batch_size=8).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_text_metrics_counts(docs_ds):
    from tsfeatures_ray.functions import text_metrics

    ds, df = docs_ds
    out = text_metrics(ds).to_pandas().set_index("doc_id")
    s = df.loc[0, "text"]
    assert out.loc[0, "n_chars_m"] == len(s)
    assert out.loc[0, "n_ws_tokens"] == len(s.split())
    assert out.loc[5, "n_ws_tokens"] == 1


def test_sessionize(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.windows import sessionize

    base = pd.Timestamp("2026-01-01")
    rows = []
    # user 1: two sessions separated by a 2h gap
    for i, mins in enumerate([0, 5, 10, 130, 135]):
        rows.append(("u-ignore", i, base + pd.Timedelta(minutes=mins), 1.0))
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    out = sessionize(
        rd.from_pandas(df), key="user_id", gap_us=30 * 60 * 1_000_000
    ).to_pandas().sort_values("session_idx")
    assert len(out) == 2
    assert out.iloc[0]["n_events"] == 3 and out.iloc[1]["n_events"] == 2
    assert out.iloc[0]["value_sum"] == 3.0


def test_broadcast_join_semi_anti(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.join import broadcast_join

    big = pd.DataFrame({"k": [1, 2, 3, 4, 5, 6], "v": list("abcdef")})
    small = pd.DataFrame({"key": [2, 4], "dim": ["x", "y"]})
    ds = rd.from_pandas(big)
    semi = broadcast_join(ds, small, "k", "key", how="semi").to_pandas()
    anti = broadcast_join(ds, small, "k", "key", how="anti").to_pandas()
    inner = broadcast_join(ds, small, "k", "key", how="inner").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3, 5, 6]
    assert sorted(inner["dim"]) == ["x", "y"]
    assert len(semi) + len(anti) == len(big)


def test_partitioned_join_matches_pandas(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.join import partitioned_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {"k": rng.randint(0, 40, 200), "lv": rng.randn(200)}
    )
    right = pd.DataFrame(
        {"rk": np.arange(0, 50, 2), "rv": np.arange(25) * 10}
    )
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    for how in ("inner", "left", "semi", "anti"):
        got = partitioned_join(
            lds, rds, left_on="k", right_on="rk", how=how, num_parts=7
        ).to_pandas()
        if how in ("semi", "anti"):
            mask = left["k"].isin(set(right["rk"]))
            want = left[mask if how == "semi" else ~mask]
            got = got.sort_values(["k", "lv"]).reset_index(drop=True)
            want = want.sort_values(["k", "lv"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want)
        else:
            want = left.merge(
                right, left_on="k", right_on="rk", how=how
            ).drop(columns=["rk"])
            got = got.sort_values(["k", "lv"]).reset_index(drop=True)
            want = want.sort_values(["k", "lv"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got[want.columns], want)


def test_partitioned_join_rejects_column_overlap(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.join import partitioned_join

    a = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
    b = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2.0]}))
    with pytest.raises(ValueError, match="overlapping"):
        partitioned_join(a, b, left_on="k")


def test_minhash_near_dups_distributed_equals_broadcast(docs_ds, ray_session):
    """The de-drivered near-dup path (hash-partitioned text joins) must
    produce the exact pair set + jaccard values of the broadcast-lookup
    path."""
    import ray

    from tsfeatures_ray.functions import (
        minhash_near_dups,
        minhash_near_dups_distributed,
    )

    ds, df = docs_ds
    ref = ray.put(dict(zip(df.doc_id, df.text)))
    old = minhash_near_dups(ds, ref, threshold=0.5).to_pandas()
    new = minhash_near_dups_distributed(ds, threshold=0.5).to_pandas()
    key = ["id_a", "id_b"]
    old = old.sort_values(key).reset_index(drop=True)
    new = new.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(new[["id_a", "id_b", "jaccard"]],
                                  old[["id_a", "id_b", "jaccard"]])


def test_dedup_purge_distributed(docs_ds, ray_session):
    from tsfeatures_ray.functions import dedup_purge

    ds, df = docs_ds
    kept = dedup_purge(ds, ds).to_pandas()
    # one representative (min id) per distinct text
    assert sorted(kept["doc_id"]) == [0, 2, 3, 4, 5]


def test_ann_recall_floor_and_monotonicity(ray_session):
    """Multi-table multi-probe LSH must reach the pinned recall floor on
    the synthetic embeddings, and widening the probe must not hurt."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from tsfeatures_ray.functions import ann_recall

    path = "/root/testdata/sf0.01/embeddings.parquet"
    t = pq.read_table(path).to_pandas().sort_values("vec_id").head(6)
    queries = np.stack([np.asarray(v, float) for v in t["embedding"]])
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    wide = ann_recall(ds, queries, k=10)  # default bits=8 tables=8 radius=2
    assert wide["recall_at_k"].mean() >= 0.85
    narrow = ann_recall(ds, queries, k=10, bits=8, tables=8, radius=0)
    assert wide["recall_at_k"].mean() >= narrow["recall_at_k"].mean()


def test_media_codecs_roundtrip():
    """Real codec round-trips: PPM and the VID0 container are exact;
    WAV PCM16 is exact at 16-bit quantization."""
    from tsfeatures_ray.functions.multimodal import (
        decode_media,
        decode_ppm,
        decode_video,
        decode_wav,
        encode_ppm,
        encode_video,
        encode_wav,
        resize_nearest,
        sample_frames,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(13, 9, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)

    frames = rng.randint(0, 256, size=(4, 6, 7, 3)).astype(np.uint8)
    np.testing.assert_array_equal(decode_video(encode_video(frames)), frames)

    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / 8000.0)
    dec, rate = decode_wav(encode_wav(sig, 8000))
    assert rate == 8000
    assert np.abs(dec - sig).max() < 1.0 / 32000  # 16-bit quantization

    # unsupported codecs fail loudly, not silently
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG....", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3....", "audio")

    # transforms are real
    r = resize_nearest(img, 4, 4)
    assert r.shape == (4, 4, 3)
    s = sample_frames(frames, 2)
    assert s.shape[0] == 2 and s[0].shape == frames[0].shape


def test_avi_mjpeg_roundtrip():
    """RIFF AVI/MJPG: a real container whose frames run through the
    in-repo baseline JPEG codec. Smooth frames round-trip within JPEG's
    lossy tolerance; structure (n, h, w, 3) is exact; a non-MJPG
    handler raises at the documented seam."""
    from tsfeatures_ray.functions.multimodal import (
        decode_video,
        encode_avi_mjpeg,
    )

    y, x = np.mgrid[0:21, 0:17]
    frames = np.stack(
        [
            np.clip(
                np.stack(
                    [
                        100 + 40 * np.sin(y / 5 + t),
                        120 + 30 * np.cos(x / 6),
                        90 + 20 * np.sin((x + y) / 7),
                    ],
                    axis=2,
                ),
                0,
                255,
            ).astype(np.uint8)
            for t in range(3)
        ]
    )
    payload = encode_avi_mjpeg(frames)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    dec = decode_video(payload)
    assert dec.shape == frames.shape
    err = np.abs(dec.astype(float) - frames.astype(float))
    assert err.max() <= 12 and err.mean() <= 3.0

    # non-MJPG vids handler -> seam error, not a bogus decode
    broken = bytearray(payload)
    j = broken.find(b"vidsMJPG")
    broken[j + 4 : j + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_video(bytes(broken))

    # feature kernels accept the new container end-to-end
    from tsfeatures_ray.functions.multimodal import FEATURE_DIM, extract_features

    feats = extract_features(payload, "video")
    assert feats.shape == (FEATURE_DIM,) and np.isfinite(feats).all()


def test_mp4_mjpeg_roundtrip():
    """ISO-BMFF/'jpeg' codec: a real MP4 whose samples run through the
    in-repo baseline JPEG codec. Smooth frames round-trip within JPEG's
    lossy tolerance; structure is exact; a compressed-codec sample
    entry raises at the documented seam naming the codec; a hand-muxed
    multi-chunk stsc/stco layout demuxes to the same samples (the
    demuxer walks the general sample table, not just the one the
    encoder writes)."""
    import struct

    from tsfeatures_ray.functions.multimodal import (
        _mp4_video_samples,
        decode_video,
        encode_mp4_mjpeg,
        probe_media,
    )

    y, x = np.mgrid[0:21, 0:17]
    frames = np.stack(
        [
            np.clip(
                np.stack(
                    [
                        100 + 40 * np.sin(y / 5 + t),
                        120 + 30 * np.cos(x / 6),
                        90 + 20 * np.sin((x + y) / 7),
                    ],
                    axis=2,
                ),
                0,
                255,
            ).astype(np.uint8)
            for t in range(5)
        ]
    )
    payload = encode_mp4_mjpeg(frames, fps=5)
    assert payload[4:8] == b"ftyp"
    meta = probe_media(payload)
    assert (meta["format"], meta["codec"], meta["n_frames"], meta["width"],
            meta["height"], meta["duration_s"]) == (
        "mp4", "jpeg", 5, 17, 21, 1.0)
    dec = decode_video(payload)
    assert dec.shape == frames.shape
    err = np.abs(dec.astype(float) - frames.astype(float))
    assert err.max() <= 12 and err.mean() <= 3.0

    # compressed-codec sample entry -> seam error naming the codec
    broken = bytearray(payload)
    j = bytes(broken).find(b"jpeg", 40)  # stsd sample-entry fourcc
    broken[j : j + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_video(bytes(broken))

    # multi-chunk stsc/stco: re-mux samples 0-2 / 3-4 into two chunks
    codec, samples = _mp4_video_samples(payload)
    sizes = [len(s) for s in samples]

    def full(t, b, fl=0):
        return struct.pack(">I", 12 + len(b)) + t + struct.pack(">I", fl) + b

    mdat_body = payload.find(b"mdat") + 4
    new_stsc = full(b"stsc", struct.pack(">I", 2)
                    + struct.pack(">III", 1, 3, 1)
                    + struct.pack(">III", 2, 2, 1))
    new_stco = full(b"stco", struct.pack(">I", 2)
                    + struct.pack(">II", mdat_body,
                                  mdat_body + sum(sizes[:3])))
    out = payload
    for four, new in ((b"stco", new_stco), (b"stsc", new_stsc)):
        at = out.find(four) - 4
        (old_len,) = struct.unpack(">I", out[at : at + 4])
        out = out[:at] + new + out[at + old_len :]
    delta = len(out) - len(payload)
    buf = bytearray(out)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = bytes(buf).find(name) - 4
        (sz,) = struct.unpack(">I", bytes(buf[at : at + 4]))
        buf[at : at + 4] = struct.pack(">I", sz + delta)
    codec2, samples2 = _mp4_video_samples(bytes(buf))
    assert codec2 == codec and samples2 == samples
    assert decode_video(bytes(buf)).shape == frames.shape

    # feature kernels accept the container end-to-end
    from tsfeatures_ray.functions.multimodal import FEATURE_DIM, extract_features

    feats = extract_features(payload, "video")
    assert feats.shape == (FEATURE_DIM,) and np.isfinite(feats).all()


def _tiny_mp4(w=64, h=48, codec=b"avc1", n=30):
    """Minimal spec-shaped ISO-BMFF: ftyp + moov(mvhd, trak(tkhd,
    mdia(hdlr, minf(stbl(stsd, stsz))))) + mdat."""
    import struct

    def box(t, b):
        return struct.pack(">I", 8 + len(b)) + t + b

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mvhd = box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
               + struct.pack(">II", 600, 1800) + b"\x00" * 80)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
               + struct.pack(">II", w << 16, h << 16))
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1)
               + struct.pack(">I", 86) + codec + b"\x00" * 78)
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n))
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov + box(b"mdat", b"\x00" * 16)


def test_probe_media_formats():
    """probe_media: header-only metadata for every container the repo
    writes, plus real ISO-BMFF parsing (seam narrowed: decode_video on
    MP4 now names the actual codec)."""
    from tsfeatures_ray.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from tsfeatures_ray.functions.multimodal import (
        decode_video,
        encode_avi_mjpeg,
        encode_png,
        encode_ppm,
        encode_video,
        encode_wav,
        probe_media,
    )

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(12, 17, 3)).astype(np.uint8)
    p = probe_media(encode_png(img))
    assert p == {"format": "png", "width": 17, "height": 12, "depth": 8,
                 "color_type": 2, "interlaced": False}
    j = probe_media(encode_jpeg(img))
    assert (j["format"], j["width"], j["height"], j["channels"],
            j["mode"]) == ("jpeg", 17, 12, 3, "baseline")
    assert probe_media(encode_jpeg_progressive(img))["mode"] == "progressive"
    assert probe_media(encode_ppm(img)) == {"format": "ppm", "width": 17,
                                            "height": 12}
    wv = probe_media(encode_wav(np.zeros(800), 8000))
    assert (wv["format"], wv["sample_rate"], wv["n_samples"]) == (
        "wav", 8000, 800)
    frames = np.zeros((3, 8, 9, 3), np.uint8)
    v = probe_media(encode_video(frames))
    assert (v["format"], v["n_frames"], v["width"], v["height"]) == (
        "vid0", 3, 9, 8)
    a = probe_media(encode_avi_mjpeg(frames))
    assert (a["format"], a["codec"], a["n_frames"], a["width"],
            a["height"]) == ("avi", "MJPG", 3, 9, 8)

    mp4 = _tiny_mp4()
    m = probe_media(mp4)
    assert (m["format"], m["brand"], m["duration_s"], m["codec"],
            m["width"], m["height"], m["n_frames"], m["n_tracks"]) == (
        "mp4", "isom", 3.0, "avc1", 64, 48, 30, 1)
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_video(mp4)
    assert probe_media(b"\x00garbage")["format"] == "unknown"


def test_media_metadata_stage(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.multimodal import (
        media_metadata,
        synth_media_table,
    )

    out = media_metadata(rd.from_arrow(synth_media_table(24))).to_pandas()
    assert len(out) == 24
    assert set(out["format"]) <= {"png", "jpeg", "ppm", "wav", "vid0",
                                  "avi", "mp4"}
    assert (out.loc[out["format"] == "wav", "sample_rate"] == 8000).all()
    assert (out.loc[out["format"] == "avi", "codec"] == "MJPG").all()
    assert (out.loc[out["format"] == "mp4", "codec"] == "jpeg").all()


def test_media_features_discriminate():
    """Audio features must reflect actual signal content: a 200 Hz tone
    and a 3 kHz tone at the same rate get clearly different spectral
    centroids (feature index 2)."""
    from tsfeatures_ray.functions.multimodal import encode_wav, extract_features

    t = np.arange(4000) / 8000.0
    low = extract_features(encode_wav(np.sin(2 * np.pi * 200 * t), 8000), "audio")
    high = extract_features(encode_wav(np.sin(2 * np.pi * 3000 * t), 8000), "audio")
    assert high[2] > low[2] + 0.3


def test_hopping_window_matches_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.windows import hopping_window

    rng = np.random.RandomState(2)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 7, n),
            "ts": pd.to_datetime(
                1_700_000_000_000_000 + rng.randint(0, 86_400_000_000, n), unit="us"
            ),
            "value": rng.randn(n).round(3),
        }
    )
    W, H = 3_600_000_000, 1_800_000_000
    got = (
        hopping_window(rd.from_pandas(df), window_us=W, hop_us=H)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    # brute force: for each (user, window) check membership directly
    eus = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    rows = []
    for u in sorted(df["user_id"].unique()):
        m = df["user_id"].to_numpy() == u
        t, v = eus[m], df["value"].to_numpy()[m]
        starts = np.unique(
            np.concatenate([(t // H) * H, (t // H) * H - H])
        )
        for ws in starts:
            sel = (t >= ws) & (t < ws + W)
            if sel.any():
                rows.append((u, ws, int(sel.sum()), v[sel].sum(),
                             v[sel].min(), v[sel].max()))
    want = pd.DataFrame(
        rows, columns=["user_id", "ws", "n_events", "v_sum", "v_min", "v_max"]
    ).sort_values(["user_id", "ws"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert np.allclose(got["v_sum"], want["v_sum"])
    assert np.allclose(got["v_min"], want["v_min"])
    assert (got["window_start"].astype("datetime64[us]").astype("int64").to_numpy()
            == want["ws"].to_numpy()).all()


def test_hll_error_bound_and_merge():
    from tsfeatures_ray.functions.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    rng = np.random.RandomState(9)
    for true_n in (100, 5000, 100_000):
        vals = rng.randint(0, 10**12, true_n * 2)[:true_n]  # may contain dups
        true = len(set(vals.tolist()))
        est = hll_estimate(hll_build(vals))
        assert abs(est - true) / true < 0.05, (true_n, est, true)
        # mergeability: sketch(union) == merge(sketch(a), sketch(b))
        a, b = vals[: true_n // 2], vals[true_n // 2 :]
        merged = hll_merge(hll_build(a), hll_build(b))
        np.testing.assert_array_equal(merged, hll_build(vals))


def test_hll_distinct_grouped(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import hll_distinct

    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 5, 60_000),
            "v": rng.randint(0, 8000, 60_000),
        }
    )
    got = hll_distinct(rd.from_pandas(df), "v", group_col="g").to_pandas()
    truth = df.groupby("g")["v"].nunique()
    for _, row in got.iterrows():
        t = truth[row["group"]]
        assert abs(row["approx_distinct"] - t) / t < 0.05


def test_ivf_knn_recall_and_self(ray_session):
    """IVF coarse-quantizer ANN: self is always retrieved (its own cell
    is the nearest probe), and recall@10 vs brute force meets the pinned
    floor at nprobe/nlist = 0.5 on the clusterless synthetic vectors."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from tsfeatures_ray.functions.similarity import ann_recall, ivf_knn

    path = "/root/testdata/sf0.01/embeddings.parquet"
    t = pq.read_table(path).to_pandas().sort_values("vec_id").head(5)
    queries = np.stack([np.asarray(v, float) for v in t["embedding"]])
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    out = ivf_knn(ds, queries, k=10, nlist=32, nprobe=16)
    qids = t["vec_id"].to_numpy()
    for qi in range(len(queries)):
        sub = out[out.query_id == qi]
        assert sub[sub["rank"] == 1]["vec_id"].iloc[0] == qids[qi]
    rec = ann_recall(ds, queries, k=10, method="ivf", nlist=32, nprobe=16)
    assert rec["recall_at_k"].mean() >= 0.7


def test_lsh_bucket_cap_star_linkage(ray_session):
    """A degenerate bucket (hundreds of identical docs) must produce
    linear star pairs, not O(n^2) all-pairs."""
    import ray.data as rd

    from tsfeatures_ray.functions import minhash_lsh_candidates

    n = 300
    df = pd.DataFrame({"doc_id": range(n), "text": ["same text here"] * n})
    cand = minhash_lsh_candidates(
        rd.from_pandas(df), max_bucket=100
    ).to_pandas().drop_duplicates()
    # star: every doc paired with min id exactly once
    assert len(cand) == n - 1
    assert (cand["id_a"] == 0).all()
    assert sorted(cand["id_b"]) == list(range(1, n))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(-5, 15), st.integers(0, 99)),
             min_size=0, max_size=60),
    st.lists(st.integers(-5, 15), min_size=0, max_size=25, unique=True),
    st.sampled_from(["inner", "left", "semi", "anti"]),
)
def test_partitioned_join_property(ray_session, lrows, rkeys, how):
    """Hypothesis: partitioned_join == pandas merge for arbitrary key
    multisets (dup keys, missing keys, empty sides) and every how."""
    import ray.data as rd

    from tsfeatures_ray.functions.join import partitioned_join

    left = pd.DataFrame(lrows or [(0, 0)], columns=["k", "lv"])
    right = pd.DataFrame({"rk": rkeys or [99], "rv": [f"v{x}" for x in (rkeys or [99])]})
    got = partitioned_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="k", right_on="rk", how=how, num_parts=5,
    ).to_pandas()
    if len(got) == 0 and len(got.columns) == 0:
        # Ray drops all-empty blocks -> schemaless empty frame
        got = pd.DataFrame(columns=["k", "lv", "rv"])
    if how in ("semi", "anti"):
        m = left["k"].isin(set(right["rk"]))
        want = left[m if how == "semi" else ~m]
        cols = ["k", "lv"]
    else:
        want = left.merge(right, left_on="k", right_on="rk", how=how).drop(
            columns=["rk"]
        )
        cols = ["k", "lv", "rv"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    want["rv"] = want.get("rv", pd.Series(dtype=object))
    assert len(got) == len(want)
    for c in cols:
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        ok = (gv == wv) | (pd.isna(gv) & pd.isna(wv))
        assert ok.all(), (how, c)


def test_quality_score_filter(docs_ds):
    from tsfeatures_ray.functions.text import quality_score

    ds, df = docs_ds
    out = quality_score(ds).to_pandas().set_index("doc_id")
    # long english sentences pass; "short" fails the length gate
    assert bool(out.loc[0, "keep"])
    assert not bool(out.loc[5, "keep"])
    assert (out["quality_score"] >= 0).all() and (out["quality_score"] <= 1).all()
    assert out.loc[0, "quality_score"] > out.loc[5, "quality_score"]


def test_top_tokens_exact(ray_session):
    """Distributed heavy-hitters equals a pandas brute count, with
    deterministic (count DESC, token ASC) tie-breaks, at any partition
    count."""
    import re

    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.text import top_tokens

    texts = [
        "The cat and the dog", "a A aa b é-cat", "", "zz zz zz cat",
        "dog DOG dog!", "cat9dog",  # digit is a separator
    ] * 7
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    brute = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            brute[w] = brute.get(w, 0) + 1
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for parts in (2, 7):
        got = top_tokens(ds, k=5, num_parts=parts)
        assert list(zip(got["token"], got["cnt"])) == want


def test_tfidf_stats_matches_brute(ray_session):
    """tfidf_stats (2-pass: partial+merge DF, broadcast IDF, stateless
    scoring) equals a pandas brute-force TF-IDF on the same tokenizer,
    at any partition count; docs with no [a-z] tokens drop on both
    sides; null text is empty."""
    import math
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.text import tfidf_stats

    texts = [
        "The cat and the dog", "a A aa b é-cat", "", "zz zz zz cat",
        "dog DOG dog!", "cat9dog", "42 77 --", None, "unique solo words",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    n = len(df)
    docs = {
        i: re.findall(r"[a-z]+", (t or "").lower())
        for i, t in zip(df["doc_id"], df["text"])
    }
    dfreq: dict = {}
    for toks in docs.values():
        for w in set(toks):
            dfreq[w] = dfreq.get(w, 0) + 1
    want = []
    for i, toks in docs.items():
        if not toks:
            continue
        tf = pd.Series(toks).value_counts()
        w = sum(
            c * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)
            for t, c in tf.items()
        )
        want.append((i, len(toks), len(tf), int(tf.max()),
                     np.floor((w + 1e-7) * 1e6 + 0.5) / 1e6))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "n_tokens", "n_distinct", "max_tf",
                       "tfidf_sum"]
    ).sort_values("doc_id").reset_index(drop=True)
    for parts in (2, 7):
        got = tfidf_stats(
            rd.from_pandas(df), num_parts=parts
        ).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"doc_id": "int64"}), want_df.astype(
                {"doc_id": "int64", "n_tokens": "int64",
                 "n_distinct": "int64", "max_tf": "int64"}
            )
        )


def test_exact_distinct_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import exact_distinct

    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {"g": rng.randint(0, 9, 5000), "v": rng.randint(0, 120, 5000)}
    )
    got = (
        exact_distinct(rd.from_pandas(df), value_col="v", group_col="g")
        .to_pandas()
        .sort_values("group")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("g")["v"].nunique().reset_index()
        .rename(columns={"g": "group", "v": "n_distinct"})
    )
    want["n_distinct"] = want["n_distinct"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_histogram_quantiles_error_bound_and_merge(ray_session):
    """Histogram quantile sketch: value error <= bin width vs the exact
    quantile (rank definition: smallest v with #(x <= v) >= ceil(q n)),
    and the result is invariant to how rows are batched/partitioned
    (merge-by-addition is exact)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import histogram_quantiles

    rng = np.random.RandomState(4)
    vals = np.concatenate([
        rng.exponential(50, 30000), rng.normal(300, 20, 20000)
    ]).clip(0, 511.9)
    df = pd.DataFrame({"g": rng.randint(0, 5, len(vals)), "v": vals})
    lo, hi, nbins = 0.0, 512.0, 1024
    w = (hi - lo) / nbins
    for parts in (1, 8):
        ds = rd.from_pandas(df).repartition(parts)
        got = (
            histogram_quantiles(ds, "v", "g", lo=lo, hi=hi, nbins=nbins,
                                qs=(0.5, 0.95, 0.99))
            .to_pandas().sort_values("group").reset_index(drop=True)
        )
        for _, row in got.iterrows():
            x = np.sort(df.loc[df["g"] == row["group"], "v"].to_numpy())
            for q, col in ((0.5, "q5"), (0.95, "q95"), (0.99, "q99")):
                exact = x[int(np.ceil(q * len(x))) - 1]
                assert abs(row[col] - exact) <= w + 1e-12, (q, row[col], exact)
        if parts == 1:
            base = got
    pd.testing.assert_frame_equal(base, got)


def test_pricing_summary_cutoff_and_join(ray_session):
    """Analytics pipelines vs pandas brute: Q1-style with a shipdate
    cutoff, and the pre-aggregated join revenue."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from tsfeatures_ray.pipelines.analytics import (
        pricing_summary,
        revenue_by_priority,
    )

    li = pq.read_table("/root/testdata/sf0.001/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp("1995-06-17").value // 1000
    got = pricing_summary(
        rd.from_pandas(li).repartition(5), cutoff_us=cutoff
    )
    sub = li[li["l_shipdate"].astype("datetime64[us]").astype("int64") <= cutoff]
    want = (
        sub.groupby(["l_returnflag", "l_linestatus"])
        .agg(sum_qty=("l_quantity", "sum"), count_order=("l_quantity", "size"))
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert list(got["count_order"]) == list(want["count_order"])
    assert np.allclose(got["sum_qty"], want["sum_qty"])

    orders = pq.read_table("/root/testdata/sf0.001/orders.parquet").to_pandas()
    got_r = revenue_by_priority(
        rd.from_pandas(li).repartition(4), rd.from_pandas(orders), num_parts=6
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    want_r = (
        j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
        .groupby("o_orderpriority")["rev"].sum()
        .reset_index(name="revenue")
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert list(got_r["o_orderpriority"]) == list(want_r["o_orderpriority"])
    assert np.allclose(got_r["revenue"], want_r["revenue"])


def test_extract_json_int(ray_session):
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.text import extract_json_int

    rows = ['{"k": 5}', '{"k": -12, "x": 1}', '{"x": 3}', "{}", None,
            '{"k":  42}']
    ds = rd.from_pandas(pd.DataFrame({"props": rows}))
    got = extract_json_int(ds, "props", "k").to_pandas()["k"]
    assert list(got.fillna(-999)) == [5, -12, -999, -999, -999, 42]


def test_histogram_quantiles_global(ray_session):
    """group_col=None computes one global quantile row."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import histogram_quantiles

    rng = np.random.RandomState(6)
    v = rng.uniform(0, 100, 20000)
    got = histogram_quantiles(
        rd.from_pandas(pd.DataFrame({"v": v})), "v", None,
        lo=0.0, hi=100.0, nbins=1000, qs=(0.5, 0.99),
    ).to_pandas()
    assert len(got) == 1
    x = np.sort(v)
    for q, col in ((0.5, "q5"), (0.99, "q99")):
        exact = x[int(np.ceil(q * len(x))) - 1]
        assert abs(got[col].iloc[0] - exact) <= 0.1 + 1e-9


def test_trigram_logppl_matches_brute(ray_session):
    """trigram_logppl (2-pass: partial+merge counts, broadcast log-prob
    table, stateless scoring) equals a pure-Python corpus-LM
    re-derivation, at two partition/concurrency shapes; byte-level
    semantics on multi-byte utf-8; docs under 3 bytes emit 0/NaN."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.text import trigram_logppl

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "zzzzzz",
        "ab",            # < 3 bytes: no trigrams
        "héllo héllo",   # multi-byte utf-8: trigrams are BYTE windows
        "the the the the",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    # brute corpus model over byte trigrams
    enc = [t.encode("utf-8") for t in texts]
    all_tris: dict = {}
    per_doc = []
    for e in enc:
        tris = [e[i:i + 3] for i in range(len(e) - 2)]
        per_doc.append(tris)
        for tr in tris:
            all_tris[tr] = all_tris.get(tr, 0) + 1
    total = sum(all_tris.values())
    want = {}
    for i, tris in enumerate(per_doc):
        if not tris:
            want[i] = (0, float("nan"))
        else:
            s = sum(-(math.log(all_tris[tr]) - math.log(total)) for tr in tris)
            want[i] = (len(tris), s / len(tris))

    for parts in (1, 5):
        got = (
            trigram_logppl(rd.from_pandas(df).repartition(parts),
                           round6=False, num_parts=3)
            .to_pandas().set_index("doc_id")
        )
        for i, (n, avg) in want.items():
            assert got.loc[i, "n_trigrams"] == n, (parts, i)
            if math.isnan(avg):
                assert math.isnan(got.loc[i, "neg_logp_avg"])
            else:
                np.testing.assert_allclose(
                    got.loc[i, "neg_logp_avg"], avg, rtol=1e-12
                )


def test_kmeans_cluster_recovers_blobs(ray_session):
    """kmeans_cluster on 3 well-separated spherical blobs must recover
    the planted partition exactly (every blob maps to exactly one
    cluster label), be bit-identical across partition counts, keep
    every vector's sim in [-1, 1], and place each vector closer to its
    own centroid than vectors of other blobs are on average."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.similarity import kmeans_cluster

    rng = np.random.default_rng(5)
    centers = np.eye(3)  # orthogonal unit centers: maximally separated
    vecs, blob = [], []
    for c in range(3):
        for _ in range(60):
            v = centers[c] + rng.normal(0, 0.05, 3)
            vecs.append((v / np.linalg.norm(v)).tolist())
            blob.append(c)
    df = pd.DataFrame({
        "vec_id": np.arange(len(vecs)), "embedding": vecs, "blob": blob,
    })
    outs = []
    for parts in (1, 6):
        got = (
            kmeans_cluster(
                rd.from_pandas(df[["vec_id", "embedding"]]).repartition(parts),
                k=3, refine_iters=2,
            )
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])  # partition-count invariance, bitwise
    got = outs[0].merge(df[["vec_id", "blob"]], on="vec_id")
    # planted partition recovered: blob <-> cluster is a bijection
    tab = got.groupby(["blob", "cluster"]).size().reset_index()
    assert len(tab) == 3 and tab["cluster"].nunique() == 3
    assert got["sim"].between(-1.0, 1.0 + 1e-12).all()
    assert got["sim"].min() > 0.9  # tight blobs: high self-similarity


class TestDecontaminate:
    def test_matches_python_in(self, ray_session):
        """decontaminate equals a brute Python substring check: n_hit
        counts DISTINCT patterns present, repeats inside one doc count
        once, and the text column is pruned from the output."""
        import ray.data as rd

        from tsfeatures_ray.functions import decontaminate

        pats = ["ab c", "zzz", "c ab"]
        texts = [
            "ab c ab c ab c",      # pattern 0 thrice -> n_hit 1
            "xx c ab yy",          # pattern 2
            "nothing here",        # clean
            "ab czzz more c ab",   # patterns 0, 1, 2
            "",                    # empty text
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (
            decontaminate(rd.from_pandas(df).repartition(2), pats)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got.columns) == ["doc_id", "n_hit", "contaminated"]
        want_hits = [sum(p in t for p in pats) for t in texts]
        assert got["n_hit"].tolist() == want_hits
        assert got["contaminated"].tolist() == [h > 0 for h in want_hits]
        assert got["n_hit"].dtype == np.int64

    def test_rejects_empty_patterns(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import decontaminate

        with pytest.raises(ValueError):
            decontaminate(
                rd.from_items([{"doc_id": 1, "text": "x"}]), [])


class TestRepetitionScore:
    def test_matches_python_counter(self, ray_session):
        """repetition_score equals a brute per-doc Counter over byte
        trigrams, incl. short texts (NaN ratios), a fully repetitive
        doc, multi-byte UTF-8 (byte semantics), and empty text."""
        from collections import Counter

        import ray.data as rd

        from tsfeatures_ray.functions import repetition_score

        texts = [
            "abcabcabc",        # repetitive
            "ab",               # too short
            "",                 # empty
            "aaaaaa",           # single trigram repeated
            "the quick brown fox jumps",
            "héllo héllo",      # multi-byte utf-8 -> byte trigrams
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (
            repetition_score(rd.from_pandas(df).repartition(2))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        for j, s in enumerate(texts):
            b = s.encode("utf-8")
            grams = [b[i:i + 3] for i in range(max(len(b) - 2, 0))]
            cnt = Counter(grams)
            assert got.loc[j, "n_grams"] == len(grams)
            assert got.loc[j, "n_distinct"] == len(cnt)
            if grams:
                np.testing.assert_allclose(
                    got.loc[j, "distinct_ratio"], len(cnt) / len(grams),
                    rtol=1e-12)
                np.testing.assert_allclose(
                    got.loc[j, "top_frac"],
                    max(cnt.values()) / len(grams), rtol=1e-12)
            else:
                assert np.isnan(got.loc[j, "distinct_ratio"])
                assert np.isnan(got.loc[j, "top_frac"])

    def test_repetitive_scores_low(self, ray_session):
        """The Gopher signal direction: a repetitive doc has a lower
        distinct ratio and higher top fraction than natural text."""
        import ray.data as rd

        from tsfeatures_ray.functions import repetition_score

        df = pd.DataFrame({
            "doc_id": [0, 1],
            "text": ["spam spam spam spam spam spam",
                     "a varied sentence with many different words"],
        })
        got = (repetition_score(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got.loc[0, "distinct_ratio"] < got.loc[1, "distinct_ratio"]
        assert got.loc[0, "top_frac"] > got.loc[1, "top_frac"]


class TestFunnelCohort:
    def _events(self):
        # hand-built log exercising: full conversion (u1), stall at
        # click (u2), purchase BEFORE view so it must not count (u3),
        # equal-timestamp view/click (strictly-after excludes, u4),
        # never enters the funnel (u5)
        rows = [
            (1, "2024-01-01 00:00", "view"),
            (1, "2024-01-01 01:00", "click"),
            (1, "2024-01-01 00:30", "click"),   # after view -> earliest
            (1, "2024-01-01 02:00", "purchase"),
            (2, "2024-01-02 00:00", "view"),
            (2, "2024-01-02 00:10", "click"),
            (3, "2024-01-03 00:00", "purchase"),
            (3, "2024-01-03 01:00", "view"),
            (3, "2024-01-03 02:00", "click"),
            (4, "2024-01-04 00:00", "view"),
            (4, "2024-01-04 00:00", "click"),   # same instant: excluded
            (5, "2024-01-05 00:00", "error"),
        ]
        return pd.DataFrame({
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"),
            "event_type": [r[2] for r in rows],
        })

    def test_funnel_first_match_semantics(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import funnel_conversion

        got = (
            funnel_conversion(
                rd.from_pandas(self._events()).repartition(3),
                steps=("view", "click", "purchase"))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 2, 3, 4, 5]
        assert got["steps_completed"].tolist() == [3, 2, 2, 1, 0]
        ts = pd.Timestamp
        assert got.loc[0, "t_click"] == ts("2024-01-01 00:30")
        assert got.loc[0, "t_purchase"] == ts("2024-01-01 02:00")
        # u3's pre-view purchase must not satisfy step 3
        assert pd.isna(got.loc[2, "t_purchase"])
        # u4's same-instant click is NOT strictly after the view
        assert pd.isna(got.loc[3, "t_click"])
        assert pd.isna(got.loc[4, "t_view"])

    def test_funnel_partition_invariance(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import funnel_conversion

        df = self._events()
        a = (funnel_conversion(rd.from_pandas(df), num_parts=4)
             .to_pandas().sort_values("user_id").reset_index(drop=True))
        b = (funnel_conversion(rd.from_pandas(df).repartition(5),
                               num_parts=11)
             .to_pandas().sort_values("user_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)

    def test_cohort_matches_brute(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import cohort_retention

        rng = np.random.default_rng(7)
        n = 500
        df = pd.DataFrame({
            "user_id": rng.integers(0, 40, n),
            "ts": (pd.Timestamp("2024-03-01").value // 1000
                   + rng.integers(0, 20 * 86_400_000_000, n)).astype(
                       "datetime64[us]"),
        })
        got = (
            cohort_retention(rd.from_pandas(df).repartition(3),
                             num_parts=7)
            .to_pandas()
            .sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
        )
        b = df.copy()
        b["day"] = b["ts"].astype("int64") // 86_400_000_000
        b["d0"] = b.groupby("user_id")["day"].transform("min")
        brute = (
            b.drop_duplicates(["user_id", "day"])
            .assign(off=lambda x: x["day"] - x["d0"])
            .groupby(["d0", "off"]).size().reset_index(name="n_users")
        )
        brute["cohort_day"] = (
            brute["d0"].to_numpy() * 86_400_000_000
        ).view("datetime64[us]")
        brute = (
            brute.rename(columns={"off": "day_offset"})
            [["cohort_day", "day_offset", "n_users"]]
            .astype({"day_offset": "int64", "n_users": "int64"})
            .sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, brute)


class TestDecontaminateNgrams:
    def test_matches_brute_ngrams(self, ray_session):
        """decontaminate_ngrams equals brute per-doc distinct token
        n-gram intersection, incl. tokenizer normalization (case,
        punctuation), short docs, and cross-doc window masking."""
        import re

        import ray.data as rd

        from tsfeatures_ray.functions import decontaminate_ngrams

        evals = ["alpha beta gamma delta", "x y z w v"]
        texts = [
            "alpha beta gamma unrelated words here",   # shares 1 trigram
            "ALPHA, beta; GAMMA delta!",               # 2 after lowering
            "beta gamma",                              # too short for n=3
            "",                                        # empty
            "gamma delta alpha beta gamma",            # 2 distinct shared
            "nothing shared at all",
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (
            decontaminate_ngrams(
                rd.from_pandas(df).repartition(2), evals, n=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

        def grams(s, n=3):
            t = re.findall(r"[a-z]+", s.lower())
            return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

        eg = set().union(*(grams(e) for e in evals))
        for j, s in enumerate(texts):
            want = len(grams(s) & eg)
            assert got.loc[j, "n_shared"] == want, (j, s)
            assert bool(got.loc[j, "contaminated"]) == (want > 0)

    def test_no_cross_document_grams(self, ray_session):
        """A trigram assembled from the END of one doc and the START of
        the next must never match (boundary windows are masked)."""
        import ray.data as rd

        from tsfeatures_ray.functions import decontaminate_ngrams

        df = pd.DataFrame({
            "doc_id": [0, 1],
            "text": ["one two", "three four five"],
        })
        got = (
            decontaminate_ngrams(
                rd.from_pandas(df), ["two three four"], n=3)
            .to_pandas()
        )
        assert got["n_shared"].sum() == 0

    def test_empty_evals_raise(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import decontaminate_ngrams

        with pytest.raises(ValueError):
            decontaminate_ngrams(
                rd.from_items([{"doc_id": 1, "text": "x"}]), [])


class TestBM25:
    def _corpus(self):
        return pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spark spark join table",
                "join merge window",
                "table value row",          # no query term
                "spark spark join table",   # identical to doc 0 -> tie
            ],
        })

    def test_matches_hand_formula(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import bm25_score

        df = self._corpus()
        got = (bm25_score(rd.from_pandas(df).repartition(2),
                          "spark join")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # hand stats: N=4, dls=[4,3,3,4], avgdl=14/4
        n, avgdl, k1, b = 4.0, 14.0 / 4.0, 1.2, 0.75
        import math

        def idf(dfreq):
            return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

        def part(tf, dl, dfreq):
            return idf(dfreq) * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl))

        want = {
            0: part(2, 4, 2) + part(1, 4, 3),   # spark df=2, join df=3
            1: part(1, 3, 3),
            3: part(2, 4, 2) + part(1, 4, 3),
        }
        assert got["doc_id"].tolist() == [0, 1, 3]
        for j, d in enumerate(got["doc_id"]):
            np.testing.assert_allclose(
                got.loc[j, "bm25"], want[int(d)], rtol=1e-12)

    def test_topk_rank_and_tiebreak(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import bm25_score

        got = bm25_score(
            rd.from_pandas(self._corpus()).repartition(3),
            "spark join", k=2).to_pandas()
        # docs 0 and 3 tie exactly; doc_id ascending breaks the tie
        assert got["doc_id"].tolist() == [0, 3]
        assert got["rank"].tolist() == [1, 2]

    def test_unknown_term_contributes_nothing(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import bm25_score

        df = self._corpus()
        a = (bm25_score(rd.from_pandas(df), "spark join")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        bm = (bm25_score(rd.from_pandas(df), "spark join zzzmissing")
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, bm)

    def test_empty_query_raises(self, ray_session):
        import ray.data as rd

        from tsfeatures_ray.functions import bm25_score

        with pytest.raises(ValueError):
            bm25_score(rd.from_items([{"doc_id": 1, "text": "x"}]), "123 !")


def test_grouped_mode(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.grouped import grouped_mode

    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2, 2, 2, 2, 3],
            "t": ["b", "a", "b", "x", "y", "y", "x", "solo"],
        }
    )
    got = (
        grouped_mode(rd.from_pandas(df).repartition(4), "u", "t")
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # u=1: b wins 2-1; u=2: tie 2-2 -> lexicographically smallest 'x';
    # u=3: singleton
    assert list(got["mode"]) == ["b", "x", "solo"]
    assert list(got["mode_count"]) == [2, 2, 1]
    assert got["mode_count"].dtype == np.int64


def test_grouped_pct_rank(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.grouped import grouped_pct_rank

    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"],
            "v": [1.0, 2.0, 2.0, 4.0, 9.0],
            "o": [0, 1, 2, 3, 0],
        }
    )
    got = (
        grouped_pct_rank(rd.from_pandas(df).repartition(3), "k", "v",
                         order_col="o")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    # DuckDB-probed: ties share min rank; singleton -> 0.0
    assert list(got["pct_rank"]) == [0.0, 1 / 3, 1 / 3, 1.0, 0.0]


def test_theil_sen_robust_to_outlier(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.windows import theil_sen

    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = base + np.arange(20) * np.timedelta64(60, "s")
    y = 3.0 * np.arange(20) + 5.0
    y_out = y.copy()
    y_out[10] = 1e5  # one wild point
    df = pd.concat(
        [
            pd.DataFrame({"conv_id": "clean", "bucket": t, "token_len_sum": y}),
            pd.DataFrame({"conv_id": "dirty", "bucket": t, "token_len_sum": y_out}),
            pd.DataFrame({"conv_id": "solo", "bucket": t[:1],
                          "token_len_sum": [7.0]}),
        ],
        ignore_index=True,
    )
    got = (
        theil_sen(rd.from_pandas(df), x_scale=60.0)
        .to_pandas()
        .set_index("conv_id")
    )
    # exact slope 3/min on the clean ramp; the outlier barely moves it
    assert abs(got.loc["clean", "ts_slope"] - 3.0) < 1e-12
    assert abs(got.loc["dirty", "ts_slope"] - 3.0) < 0.5
    assert got.loc["solo", "n"] == 1 and np.isnan(got.loc["solo", "ts_slope"])


def test_bigram_pmi_matches_brute(ray_session):
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.collocations import bigram_pmi

    rng = np.random.RandomState(4)
    vocab = ["new", "york", "machine", "learning", "the", "of", "data"]
    texts = []
    for _ in range(60):
        ws = list(rng.choice(vocab, size=rng.randint(3, 25)))
        # plant a strong collocation
        if rng.rand() < 0.7:
            k = rng.randint(0, len(ws) - 1)
            ws[k : k + 2] = ["new", "york"]
        texts.append(" ".join(ws))
    df = pd.DataFrame({"text": texts})
    got = (
        bigram_pmi(rd.from_pandas(df).repartition(5), min_count=3)
        .to_pandas()
        .set_index(["w1", "w2"])
    )
    uni, bi, t_bi = Counter(), Counter(), 0
    for t in texts:
        ws = re.findall(r"[a-z]+", t.lower())
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
        t_bi += max(0, len(ws) - 1)
    t_uni = sum(uni.values())
    for (a, b), c in bi.items():
        if c < 3:
            assert (a, b) not in got.index
            continue
        want = np.log((c / t_bi) / ((uni[a] / t_uni) * (uni[b] / t_uni)))
        want = np.sign(want + 1e-7) * np.floor(abs(want + 1e-7) * 1e6 + 0.5) / 1e6
        r = got.loc[(a, b)]
        assert r["pair_count"] == c
        assert abs(r["pmi"] - want) < 1e-12, (a, b)
    # the planted collocation scores highest
    assert got["pmi"].idxmax() == ("new", "york")


def test_partitioned_join_right_and_full_outer(ray_session):
    import ray.data as rd

    from tsfeatures_ray.functions.join import partitioned_join

    # asymmetric unmatched rows on BOTH sides
    left = pd.DataFrame({"k": [1, 2, 2, 3], "lv": [10.0, 20.0, 21.0, 30.0]})
    right = pd.DataFrame({"k": [2, 4, 4], "rv": [200.0, 400.0, 401.0]})
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    for how, pandas_how in (("right", "right"), ("full", "outer")):
        got = (
            partitioned_join(lds, rds, left_on="k", how=how, num_parts=5)
            .to_pandas()
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how=pandas_how)
            .sort_values(["k", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # full outer keeps BOTH unmatched sides: key 1,3 (left-only), 4 (right-only)
    full = partitioned_join(lds, rds, left_on="k", how="full").to_pandas()
    assert set(full["k"]) == {1, 2, 3, 4}


def test_rolling_distinct_wau(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import rolling_distinct

    rng = np.random.RandomState(8)
    base = np.datetime64("2024-03-01", "us")
    days = rng.randint(0, 20, size=600)
    # day 30: isolated activity -> its 7-day window [24, 30] must NOT
    # include any day<=19 user (gap > window)
    days = np.r_[days, [30, 30]]
    users = np.r_[rng.randint(0, 40, size=600), [1, 2]]
    df = pd.DataFrame(
        {
            "ts": base + days * np.timedelta64(1, "D")
            + np.timedelta64(3, "h"),
            "user_id": users.astype(np.int64),
        }
    )
    got = (
        rolling_distinct(rd.from_pandas(df).repartition(6), "user_id",
                         window_days=7)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # brute reference
    p = pd.DataFrame(
        {"day": days, "user": users}
    ).drop_duplicates()
    want = {}
    for d in sorted(p["day"].unique()):
        want[d] = p[(p["day"] >= d - 6) & (p["day"] <= d)]["user"].nunique()
    got_map = {
        int((b.to_datetime64() - base) / np.timedelta64(1, "D")): n
        for b, n in zip(got["bucket"], got["n_distinct"])
    }
    assert got_map == want
    assert got_map[30] == 2  # the isolated day sees only its own users


def test_bloom_semi_join_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.join import bloom_semi_join

    rng = np.random.RandomState(12)
    left = pd.DataFrame(
        {"k": rng.randint(0, 500, 400).astype(np.int64), "lv": rng.randn(400)}
    )
    right = pd.DataFrame({"k": np.arange(0, 500, 7).astype(np.int64)})
    lds, rds = rd.from_pandas(left).repartition(5), rd.from_pandas(right)
    member = left["k"].isin(set(right["k"]))
    # tiny filter (256 bits, 2 hashes) -> high false-positive rate, so
    # the exact-verify stage is genuinely exercised
    for how, want_mask in (("semi", member), ("anti", ~member)):
        got = bloom_semi_join(
            lds, rds, left_on="k", how=how, num_bits=256, num_hashes=2
        ).to_pandas()
        want = left[want_mask]
        assert sorted(zip(got["k"], got["lv"])) == sorted(
            zip(want["k"], want["lv"])
        ), how
    # no-verify semi: superset of the true semi (false positives only)
    loose = bloom_semi_join(
        lds, rds, left_on="k", how="semi", num_bits=256, num_hashes=2,
        exact_verify=False,
    ).to_pandas()
    assert set(zip(left[member]["k"], left[member]["lv"])) <= set(
        zip(loose["k"], loose["lv"])
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="anti without exact_verify"):
        bloom_semi_join(lds, rds, left_on="k", how="anti", exact_verify=False)


def test_theil_sen_giant_path_equals_cohort_path(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.windows import theil_sen

    rng = np.random.RandomState(31)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    n = 2500  # above the GIANT=2048 routing threshold
    t = base + np.arange(n) * np.timedelta64(60, "s")
    y = 0.7 * np.arange(n) + rng.randn(n) * 5
    df = pd.DataFrame({"conv_id": "g", "bucket": t, "token_len_sum": y})
    got = theil_sen(rd.from_pandas(df), x_scale=60.0).to_pandas()
    # brute full-pair median with np.quantile's interpolation
    iu, ju = np.triu_indices(n, k=1)
    x_us = t.astype("int64")
    sl = (y[ju] - y[iu]) / ((x_us[ju] - x_us[iu]) / 1e6 / 60.0)
    want = float(np.quantile(sl, 0.5))
    assert got.loc[0, "n"] == n
    assert got.loc[0, "ts_slope"] == want


def test_top_event_paths(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.events import top_event_paths

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    # user 1: a b c a b c  -> paths abc, bca, cab, abc
    for i, t in enumerate(["a", "b", "c", "a", "b", "c"]):
        rows.append((1, t, base + np.timedelta64(i, "m"), i))
    # user 2: a b c       -> abc
    for i, t in enumerate(["a", "b", "c"]):
        rows.append((2, t, base + np.timedelta64(i, "m"), 10 + i))
    # user 3: single event -> no paths, and no cross-user leakage
    rows.append((3, "z", base, 20))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    got = top_event_paths(
        rd.from_pandas(df).repartition(3), k=10
    ).to_pandas()
    got_map = {
        (r["t1"], r["t2"], r["t3"]): r["n"] for _, r in got.iterrows()
    }
    assert got_map == {
        ("a", "b", "c"): 3,
        ("b", "c", "a"): 1,
        ("c", "a", "b"): 1,
    }
    # deterministic order: count DESC then lexicographic
    assert list(got.iloc[0][["t1", "t2", "t3"]]) == ["a", "b", "c"]


def test_hybrid_rrf(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.similarity import hybrid_rrf

    # 6 docs; lexical relevance favors 0,1; vector favors 2,3 (and 1)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "spark join merge window spark join",   # strong lexical
                "spark join other words here",          # medium lexical
                "nothing relevant at all",
                "completely unrelated text",
                "merge window",                         # weak lexical
                "filler filler filler",
            ],
        }
    )
    qv = np.array([1.0, 0.0, 0.0])
    vecs = [
        [0.0, 1.0, 0.0],   # 0: orthogonal
        [0.7, 0.7, 0.0],   # 1: medium
        [1.0, 0.0, 0.0],   # 2: perfect
        [0.9, 0.1, 0.0],   # 3: high
        [0.0, 0.0, 1.0],   # 4: orthogonal
        [-1.0, 0.0, 0.0],  # 5: opposite
    ]
    emb = pd.DataFrame({"vec_id": np.arange(6, dtype=np.int64),
                        "embedding": vecs})
    got = hybrid_rrf(
        rd.from_pandas(docs), rd.from_pandas(emb),
        "spark join merge window", qv, k_lists=3, k_out=6,
    ).to_pandas()
    # brute reference
    # BM25 length normalization puts the 2-token doc 4 above the
    # 5-token doc 1 (same tf/idf, shorter doc wins)
    bm_rank = {0: 1, 4: 2, 1: 3}       # lexical top-3
    vec_rank = {2: 1, 3: 2, 1: 3}      # cosine top-3
    want = {}
    for d in set(bm_rank) | set(vec_rank):
        want[d] = (1 / (60 + bm_rank[d]) if d in bm_rank else 0) + (
            1 / (60 + vec_rank[d]) if d in vec_rank else 0
        )
    got_map = dict(zip(got["doc_id"], got["rrf"]))
    assert set(got_map) == set(want)
    for d, v in want.items():
        v = np.sign(v + 1e-7) * np.floor(abs(v + 1e-7) * 1e6 + 0.5) / 1e6
        assert abs(got_map[d] - v) < 1e-12, d
    # doc 1 appears in BOTH lists (rank 3 + rank 3) -> fused above the
    # lexical-only doc 4 at rank 2
    assert got_map[1] > got_map[4]


def test_count_min_sketch_bounds_and_merge(ray_session):
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.sketches import cms_estimate, count_min_sketch

    rng = np.random.RandomState(14)
    vocab = [f"w{i:03d}" for i in range(300)]
    probs = 1.0 / np.arange(1, 301)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(5, 60), p=probs))
        for _ in range(120)
    ]
    df = pd.DataFrame({"text": texts})
    # the engine tokenizer is [a-z]+ (splits w007 into 'w'); build the
    # truth with the same tokenizer
    true = Counter()
    for t in texts:
        true.update(re.findall(r"[a-z]+", t.lower()))
    N = sum(true.values())

    # deliberately undersized sketch -> collisions happen, bounds hold
    sk = count_min_sketch(rd.from_pandas(df).repartition(5), width=64, depth=4)
    toks = list(true)
    est = cms_estimate(sk, toks)
    tv = np.array([true[t] for t in toks])
    # one-sided: NEVER undercounts
    assert (est >= tv).all()
    # epsilon bound est - true <= 2N/width holds w.p. 1-(1/16) per token;
    # assert the failure fraction stays far below a generous 20%
    eps = 2 * N / 64
    assert (est - tv > eps).mean() < 0.2
    # every row's total equals N (counter conservation)
    assert (sk.sum(axis=1) == N).all()

    # mergeable by addition: sketch(full) == sketch(half1) + sketch(half2)
    sk1 = count_min_sketch(rd.from_pandas(df.iloc[:60]), width=64, depth=4)
    sk2 = count_min_sketch(rd.from_pandas(df.iloc[60:]), width=64, depth=4)
    assert (sk == sk1 + sk2).all()


def test_session_cooccurrence_lift(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.events import session_cooccurrence

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    # user 1, session 1: {a, b}; session 2 (after 2h gap): {a}
    for i, t in enumerate(["a", "b", "a"]):
        rows.append((1, t, base + np.timedelta64(i, "m"), i))
    rows.append((1, "a", base + np.timedelta64(3, "h"), 9))
    # user 2, one session: {a, b, c} (b appears twice -> still one set)
    for i, t in enumerate(["a", "b", "c", "b"]):
        rows.append((2, t, base + np.timedelta64(i, "m"), 20 + i))
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    got = (
        session_cooccurrence(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index(["type_a", "type_b"])
    )
    # 3 sessions total; a in 3, b in 2, c in 1; ab in 2, ac in 1, bc in 1
    n = 3
    assert got.loc[("a", "b"), "n_sessions_ab"] == 2
    assert abs(got.loc[("a", "b"), "lift"] - (2 / n) / ((3 / n) * (2 / n))) < 1e-12
    assert got.loc[("a", "c"), "n_sessions_ab"] == 1
    assert abs(got.loc[("b", "c"), "lift"] - (1 / n) / ((2 / n) * (1 / n))) < 1e-12


def test_sq8_quantized_knn_recall(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.similarity import (
        brute_knn,
        sq8_dequantize,
        sq8_knn,
        sq8_quantize,
        sq8_train,
    )

    rng = np.random.RandomState(19)
    n, d = 400, 16
    vecs = rng.randn(n, d) * rng.uniform(0.5, 3, size=d)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
    )
    ds = rd.from_pandas(df).repartition(4)
    mins, maxs = sq8_train(ds)
    # codebook == exact per-dim extrema
    assert np.allclose(mins, vecs.min(axis=0))
    assert np.allclose(maxs, vecs.max(axis=0))
    # quantization round-trip error bounded by half a step per dim
    codes = sq8_quantize(vecs, mins, maxs)
    assert codes.dtype == np.uint8
    deq = sq8_dequantize(codes, mins, maxs)
    step = (maxs - mins) / 255.0
    assert (np.abs(deq - vecs) <= step / 2 + 1e-12).all()

    queries = vecs[:5]
    approx = sq8_knn(ds, queries, mins, maxs, k=10)
    exact = brute_knn(ds, queries, k=10)
    recalls = []
    for qi in range(5):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        recalls.append(len(a & e) / len(e))
    # int8 quantization at 16 dims keeps recall@10 high
    assert np.mean(recalls) >= 0.9, recalls
    # constant dimension doesn't blow up (span==0 guard)
    vc = vecs.copy()
    vc[:, 3] = 7.0
    m2, x2 = vc.min(axis=0), vc.max(axis=0)
    c2 = sq8_quantize(vc, m2, x2)
    assert (sq8_dequantize(c2, m2, x2)[:, 3] == 7.0).all()


def test_skew_join_matches_plain_join(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.join import skew_join

    rng = np.random.RandomState(23)
    # key 7 holds half the rows -> hot; everything else cold
    keys = np.r_[np.full(300, 7), rng.randint(100, 140, size=300)]
    left = pd.DataFrame(
        {"k": keys.astype(np.int64), "lv": rng.randn(len(keys))}
    )
    right = pd.DataFrame(
        {"k": np.arange(0, 150, 3).astype(np.int64),
         "rv": np.arange(50) * 1.5}
    )
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right)
    for how in ("inner", "left", "semi", "anti"):
        got = skew_join(
            lds, rds, left_on="k", how=how, hot_threshold=100
        ).to_pandas()
        if how in ("semi", "anti"):
            mask = left["k"].isin(set(right["k"]))
            want = left[mask if how == "semi" else ~mask]
            assert sorted(zip(got["k"], got["lv"])) == sorted(
                zip(want["k"], want["lv"])
            ), how
        else:
            want = left.merge(right, on="k", how=how)
            assert sorted(
                zip(got["k"], got["lv"], got["rv"].fillna(-1))
            ) == sorted(
                zip(want["k"], want["lv"], want["rv"].fillna(-1))
            ), how
    # threshold higher than any count -> pure partitioned path, same rows
    got = skew_join(lds, rds, left_on="k", how="inner",
                    hot_threshold=10_000).to_pandas()
    want = left.merge(right, on="k", how="inner")
    assert len(got) == len(want)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="hot keys"):
        skew_join(lds, rds, left_on="k", hot_threshold=2, max_hot_keys=3)


def test_upsert_merge(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tsfeatures_ray.functions.join import upsert_merge

    base = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0],
         "version": np.int64(0)}
    )
    updates = pd.DataFrame(
        {
            "k": [2, 3, 3, 5],
            "v": [21.0, 31.0, 32.0, 50.0],
            "version": np.array([1, 2, 1, 1], dtype=np.int64),
        }
    )
    got = (
        upsert_merge(
            rd.from_pandas(base).repartition(3), rd.from_pandas(updates),
            key="k", version_col="version", num_parts=3,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1,4 keep base; k=2 -> v1 update; k=3 -> HIGHEST version (v2, 31.0);
    # k=5 is a pure insert
    assert list(got["k"]) == [1, 2, 3, 4, 5]
    assert list(got["v"]) == [10.0, 21.0, 31.0, 40.0, 50.0]
    assert list(got["version"]) == [0, 1, 2, 0, 1]

    # version TIE prefers the update side
    b2 = pd.DataFrame({"k": [9], "v": [1.0], "version": np.int64(5)})
    u2 = pd.DataFrame({"k": [9], "v": [2.0], "version": np.int64(5)})
    got2 = upsert_merge(
        rd.from_pandas(b2), rd.from_pandas(u2), key="k", version_col="version"
    ).to_pandas()
    assert list(got2["v"]) == [2.0]
